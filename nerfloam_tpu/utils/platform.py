"""Platform selection shim.

This image pre-imports jax at interpreter startup (sitecustomize registers
the TPU PJRT plugin), so ``JAX_PLATFORMS=cpu`` set in the environment can
arrive too late to take effect. Call :func:`honor_jax_platforms_env` before
any backend use to re-assert the requested platform through ``jax.config``
(same workaround as conftest.py / __graft_entry__.py). Keeps ad-hoc script
runs off the real chip while a chip job queue is running.
"""

import os


def honor_jax_platforms_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    _enable_persistent_compile_cache()


def _enable_persistent_compile_cache() -> None:
    """Point every entry point (scripts, bench, tests) at the repo-local
    persistent XLA compile cache. The repo survives container restarts;
    /tmp does not — an uncached 1-core CPU megastep compile is minutes,
    and round-5 lost a full calibration run to exactly that."""
    import jax

    cache_dir = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
