"""Test harness: force JAX onto CPU with 8 virtual devices.

Multi-chip sharding is validated on a simulated mesh (survey §4) — real TPU
runs happen in bench.py only.

The shell presets ``JAX_PLATFORMS=axon`` (remote TPU tunnel) and a pytest
entry-point plugin imports jax before this conftest runs, so we cannot rely
on env vars alone: the backend is still uninitialized at this point, so
``jax.config.update`` takes effect.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite is compile-dominated (~20 min
# cold); cached reruns cut that to minutes.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.devices()[0].platform == "cpu", (
    "tests must run on CPU; got %s" % jax.devices()[0].platform)
assert jax.device_count() == 8, "expected 8 virtual CPU devices"
