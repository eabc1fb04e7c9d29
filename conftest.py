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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
