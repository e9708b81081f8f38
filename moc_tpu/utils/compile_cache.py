"""Persistent XLA compilation cache shared by every entry point.

The fused episode programs compile for minutes cold on the TPU tunnel
(BENCH_NOTES "CLI sweep end-to-end": 61-780 s first invocations). JAX can
persist compiled executables to disk and reload them across processes, so
every CLI, ``bench.py`` and ``__graft_entry__.py`` call
``enable_compilation_cache()`` before building programs: first process pays
the compile, every later process (re-runs, resumed sweeps, the driver's
bench) loads from disk in seconds.

Default location ``~/.cache/moc_tpu/xla`` (durable across /tmp cleanups).
Precedence: ``MOC_TPU_CACHE_DIR=0|off|none`` force-DISABLES caching (the
strongest signal of intent — it clears ``jax_compilation_cache_dir`` even
when a ``JAX_COMPILATION_CACHE_DIR`` env var lingers from an earlier run);
otherwise an explicitly-set ``JAX_COMPILATION_CACHE_DIR`` wins over
``MOC_TPU_CACHE_DIR``, which wins over the default.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "moc_tpu", "xla")
_enabled = False


def cache_dir() -> str | None:
    """Resolved cache directory, or None when disabled."""
    override = os.environ.get("MOC_TPU_CACHE_DIR")
    if override is not None and override.lower() in ("0", "off", "none"):
        return None
    return os.environ.get("JAX_COMPILATION_CACHE_DIR") or override or _DEFAULT


def enable_compilation_cache() -> str | None:
    """Point JAX's persistent compilation cache at a durable directory.

    Idempotent; safe to call before or after backend initialization (the
    cache config keys are dynamic). Returns the directory in use (or None).
    """
    global _enabled
    d = cache_dir()
    if d is None:
        # MOC_TPU_CACHE_DIR=0 must actually disable: JAX reads a lingering
        # JAX_COMPILATION_CACHE_DIR env var natively at startup, so clear
        # the config too (review finding r3)
        try:
            import jax

            jax.config.update("jax_compilation_cache_dir", None)
        except Exception:
            pass
        return None
    if _enabled:
        return d
    try:
        os.makedirs(d, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", d)
        # cache everything: the small programs are many and the tunnel makes
        # even sub-second compiles worth skipping
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    except Exception:  # a read-only home etc. must never break an entry point
        return None
    return d
