"""Test fixture: run all tests on a virtual 8-device CPU mesh.

Real TPU hardware in this environment is a single chip reached through the
axon PJRT plugin, which a sitecustomize hook registers in every interpreter
and pins via ``jax_platforms="axon,cpu"`` — plain env vars are NOT enough to
escape it (the hook runs before pytest).  Multi-device sharding is validated
via XLA's host-platform device virtualization instead (SURVEY.md §4), by
overriding the jax config before any backend initializes.
"""

import os

# For any subprocesses tests may spawn: skip axon registration entirely.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# Backends are lazy; at conftest-import time none is initialized yet, so these
# take effect even though sitecustomize already imported jax.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Deterministic f32 math for parity tests: the DEFAULT matmul/conv precision
# runs a reduced-precision (bf16-style) pass on the TPU backend (~1% error vs
# torch). HIGHEST matches torch f32 to ~3e-5 and costs little on CPU.
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_collection_modifyitems(config, items):
    """Everything not explicitly @pytest.mark.slow is part of the fast tier
    (`pytest -m fast`, <5 min on 1 vCPU) so drivers/reviewers can verify the
    whole subsystem surface inside a timeout; the slow tier adds full-model
    compiles and large-shape parity runs."""
    import pytest

    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)
