"""Pytest root conftest: force CPU JAX with 8 virtual devices.

Tests exercise the full framework (including multi-chip sharding) on the CPU
backend; the real TPU is reserved for bench.py and production runs.

Note: this image pre-imports jax at interpreter startup (sitecustomize
registers the TPU PJRT plugin), so setting JAX_PLATFORMS via os.environ is
too late — we must go through jax.config before the first backend use.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeated suite runs skip identical XLA compiles
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running gate (set NERFLOAM_RUN_SLOW=1 to include)",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("NERFLOAM_RUN_SLOW"):
        return
    import pytest

    skip = pytest.mark.skip(reason="slow gate; set NERFLOAM_RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
