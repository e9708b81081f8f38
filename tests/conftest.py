"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (DP/SP/EP) is exercised on CPU via
``--xla_force_host_platform_device_count``; real-TPU behavior is covered by the
driver's bench/compile checks.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: amortizes XLA compile time across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
