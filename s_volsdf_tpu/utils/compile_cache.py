"""Persistent XLA compilation cache.

The reference (PyTorch eager) pays no compile cost, so every restart is
"free"; under JAX every fresh process re-traces and re-compiles the
train/render programs before the first step. On the axon TPU backend
that costs ~25-35 s per program (RUNLOG_100K.md measured 25.8 s of
recompile on a mid-run resume). JAX's persistent compilation cache
removes that: compiled executables are keyed by (HLO, compile options,
backend version) and reloaded from disk by later processes.

Measured on the axon v5e chip (fresh process each time): a 12-layer
512x512 grad program compiled in 35.6 s cold and 0.86 s warm from this
cache — a 41x restart-latency win with zero effect on steady-state
step time (the cache is only consulted at compile time).

Enabled by default at package import. Control via the
``S_VOLSDF_COMPILE_CACHE`` environment variable:

  * unset / ``1`` / ``on``  — cache under ``$XDG_CACHE_HOME/s_volsdf_tpu/xla``
    (``~/.cache/s_volsdf_tpu/xla`` by default);
  * any other path          — cache under that directory;
  * ``0`` / ``off`` / ``false`` / ``none`` — disabled.

Concurrent processes may share one cache directory: JAX writes entries
via atomic renames, so readers never observe partial files.

Entries live under a per-host CPU-feature fingerprint subdirectory:
CPU-backend cache entries are AOT-compiled native code, and JAX's cache
key does NOT include host ISA features — loading an entry compiled on a
machine with, say, avx512 onto one without it risks SIGILL (JAX warns
but loads anyway). Fingerprinting keeps a cache directory shared across
heterogeneous machines (NFS homes, mixed fleets) safe while identical
hosts/containers still share warm entries.
"""

from __future__ import annotations

import os
from typing import Optional

_DISABLE_VALUES = ("0", "off", "false", "none", "no")
_ENABLE_VALUES = ("", "1", "on", "true", "yes")

_enabled: Optional[tuple] = None  # (dir, min_compile_seconds)


def default_cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    return os.path.join(base, "s_volsdf_tpu", "xla")


def _host_fingerprint() -> str:
    """Arch + CPU-feature digest identifying hosts that may safely
    share AOT-compiled cache entries (see module docstring)."""
    import hashlib
    import platform as _platform
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # x86 exposes 'flags', arm64 'Features'.
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    digest = hashlib.sha256(feats.encode()).hexdigest()[:8]
    return f"{_platform.machine()}-{digest}"


def enable_compilation_cache(cache_dir: Optional[str] = None,
                             *,
                             min_compile_seconds: float = 1.0,
                             ) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Respects ``S_VOLSDF_COMPILE_CACHE`` (see module docstring) when
    ``cache_dir`` is not given. Idempotent; safe to call before or
    after backend initialization (the flags are read at compile time).
    ``min_compile_seconds`` skips persisting sub-second kernels so the
    directory holds the handful of expensive programs, not thousands
    of trivial ones. Returns the active cache directory, or None when
    disabled.
    """
    global _enabled
    if cache_dir is None:
        env = os.environ.get("S_VOLSDF_COMPILE_CACHE", "")
        if env.strip().lower() in _DISABLE_VALUES:
            return None
        if env.strip().lower() not in _ENABLE_VALUES:
            cache_dir = env  # an explicit directory
        else:
            cache_dir = default_cache_dir()
    cache_dir = os.path.join(cache_dir, _host_fingerprint())
    if _enabled == (cache_dir, min_compile_seconds):
        return cache_dir

    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_seconds))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except (OSError, AttributeError):
        # Unwritable cache location or a jax build without the flags:
        # run uncached rather than fail.
        return None
    _enabled = (cache_dir, min_compile_seconds)
    return cache_dir
