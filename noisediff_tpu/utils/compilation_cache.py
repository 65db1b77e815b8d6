"""Persistent XLA compilation cache, enabled programmatically.

On this runtime the `JAX_COMPILATION_CACHE_DIR` environment variable does
NOT reach `jax.config.jax_compilation_cache_dir` (measured: config stays
None with the env var set before import), so every process used to pay
the full remote compile — ~10-15 min for a crop-512 train step through
the tunneled TPU, and the bulk of the CPU test tier's 12 minutes. Set via
`jax.config.update` the cache works across processes on both backends
(measured cross-process hit: 1.30s compile -> 0.09s reload).

TPU-only by design: reloading XLA:CPU AOT results trips a machine-feature
mismatch check (pseudo-features like +prefer-no-scatter; the loader warns
"could lead to execution errors such as SIGILL"), so CPU runs — the test
tier, the virtual-mesh dryrun — deliberately keep cold compiles.

`enable()` is idempotent, import-pure (jax.config.update does not
initialise a backend), and respects an explicit user configuration.
"""
import os
import tempfile

import jax


def _default_dir() -> str:
    """Per-user default so a shared /tmp on a multi-user host never has
    one user's cache entries (or directory ownership) shadow another's.
    An explicit XDG_CACHE_HOME is honored unconditionally (jax makedirs
    the path itself); else ~/.cache, else a uid-suffixed tempdir path."""
    xdg = os.environ.get("XDG_CACHE_HOME")
    if xdg:
        return os.path.join(xdg, "noisediff", "xla")
    home = os.path.expanduser("~")
    if home and home != "~":
        return os.path.join(home, ".cache", "noisediff", "xla")
    uid = os.getuid() if hasattr(os, "getuid") else "u"
    return os.path.join(tempfile.gettempdir(), f"noisediff_xla_cache_{uid}")


def enable(cache_dir: str | None = None, min_compile_secs: float = 1.0) -> str:
    """Point jax's persistent compilation cache at `cache_dir` and return
    the directory in use. NOISEDIFF_COMPILE_CACHE overrides the default;
    set it to '0' or 'off' to disable entirely. No-op on CPU-forced
    processes (see module docstring) — decided from the platform config,
    not jax.default_backend(), to stay import-pure."""
    env = os.environ.get("NOISEDIFF_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "none"):
        return ""
    # CPU-intent detection is awkward on this runtime: the axon plugin
    # force-sets jax.config.jax_platforms to "axon,cpu" REGARDLESS of
    # JAX_PLATFORMS (measured), while CPU-forcing code paths set either
    # the env var (dryrun_multichip) or the config (tests/conftest).
    # Skip when the PRIMARY platform of either source is cpu.
    def _primary(v):
        return (v or "").lower().split(",")[0].strip()

    if "cpu" in (_primary(jax.config.jax_platforms),
                 _primary(os.environ.get("JAX_PLATFORMS"))):
        return ""
    path = cache_dir or env or _default_dir()
    if jax.config.jax_compilation_cache_dir:  # user already configured it
        return jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return path
