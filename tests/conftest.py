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
    """Three tiers so drivers/reviewers can verify inside a timeout
    (measured 2026-08-19 on this 1-vCPU sandbox):

    - fast  = everything not marked slow/heavy (`pytest -m fast`, ~4.5 min)
    - slow  = full-model compiles / large-shape parity (`-m slow`, ~9 min)
    - heavy = the multi-minute integration monsters (`-m heavy`, ~6 min):
      fused-CBG UNet A/B, overfit-trajectory golden, sharded pallas e2e,
      train-CLI main

    Each tier fits a 10-minute timeout on its own; `-m "not fast"` runs
    slow+heavy together (~15 min)."""
    import pytest

    for item in items:
        if "slow" not in item.keywords and "heavy" not in item.keywords:
            item.add_marker(pytest.mark.fast)
