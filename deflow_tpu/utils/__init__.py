from .timer import StageTimer
from .logger import MetricLogger


def enable_compile_cache(path: str | None = None) -> None:
    """Point JAX at a persistent XLA compile cache (idempotent).

    Full train-step graphs take minutes to compile on TPU (the SSL step's
    multi-operand sorts alone are ~4 min through a remote-compile tunnel);
    the cache makes every later run start hot.  ``JAX_CACHE_DIR`` overrides.
    """
    import os

    import jax

    cache = path or os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except OSError as e:
        # Never block training over the cache — but say so: a silent miss
        # costs a 5-15 min recompile on every run through the tunnel.
        import warnings

        warnings.warn(f"compile cache disabled ({cache}): {e}")
