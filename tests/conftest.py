"""Test configuration: force an 8-device virtual CPU mesh before jax initialises.

This is the standard way to exercise jax.sharding/Mesh code without TPU
hardware (SURVEY.md §4): XLA_FLAGS=--xla_force_host_platform_device_count=8
with JAX_PLATFORMS=cpu.
"""
import os
import sys

# NOTE: the environment pre-sets JAX_PLATFORMS=axon (the tunneled TPU) and the
# axon plugin ignores the env var, so the override must go through jax.config
# (below) — otherwise every test op round-trips through the TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compile cache: the CI box has one CPU core; recompiling the
# UNets on every pytest run dominates wall-clock otherwise
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/noisediff_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "all")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402  (must come after the env setup above)

jax.config.update("jax_platforms", "cpu")
# NOTE on the cache env vars above: they do NOT reach jax.config on this
# jax version (config stays None), so the CPU suite runs cold compiles.
# That is deliberate — reloading XLA:CPU AOT results trips a
# machine-feature mismatch ("could lead to ... SIGILL"); the programmatic
# persistent cache (utils/compilation_cache.enable) is TPU-only.
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for mesh tests"
