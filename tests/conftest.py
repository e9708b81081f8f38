"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (DP/SP/EP) is exercised on CPU via
``--xla_force_host_platform_device_count``; real-TPU behavior is covered by
the driver's bench/compile checks.

NOTE: the environment may pre-set ``JAX_PLATFORMS`` (e.g. to the ``axon`` TPU
tunnel) and installed pytest plugins (jaxtyping) import jax before this
conftest runs, so setting the env var alone is NOT enough — we also force the
platform through ``jax.config``, which wins as long as no backend has been
initialized yet.
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

import jax

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, not the TPU tunnel; "
    f"got {jax.devices()[0].platform}"
)
