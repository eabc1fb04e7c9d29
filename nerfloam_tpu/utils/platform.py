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
