"""Pytest root conftest: force CPU JAX with 8 virtual devices.

Tests exercise the full framework (including multi-chip sharding) on the CPU
backend; the real TPU is reserved for bench.py and production runs.
Must run before the first jax import.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
