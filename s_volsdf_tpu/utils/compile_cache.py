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

Entries live under a per-host compile-target fingerprint subdirectory:
CPU-backend cache entries are AOT-compiled native code, and JAX's cache
key does NOT include the CPU compile-target config — loading an entry
compiled on a machine with, say, avx512 onto one without it risks
SIGILL, and even ISA-identical hosts can differ in LLVM's per-model
*tuning* features (``+prefer-no-gather``/``+prefer-no-scatter`` are
chosen from the CPU model, not the flag list), which XLA's AOT loader
reports as a machine-feature mismatch (JAX warns but loads anyway —
round 3's MULTICHIP log tail). The fingerprint therefore hashes, for
any platform set that can resolve to CPU: the requested JAX platforms,
the CPU model names and the union of feature flags across all cores,
the jaxlib version, and ``XLA_FLAGS``. Pure-accelerator platform sets
(``tpu``/``axon``/``cuda`` without ``cpu``) skip the CPU-specific
parts so hosts with different CPUs driving identical accelerators
still share warm entries.

Known XLA false positive (measured, round 4): reloading an entry on
the SAME host that wrote it still logs cpu_aot_loader mismatches for
``+prefer-no-gather``/``+prefer-no-scatter`` — LLVM tuning preferences
present in the compile-time feature string but absent from XLA's
load-time host-capability enumeration. These are harmless (codegen
merely avoids gather/scatter instructions) and unavoidable by
namespacing; the driver dryrun filters exactly these and fails on any
real ISA mismatch (__graft_entry__._fail_on_aot_loader_errors).
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


def _host_fingerprint(platforms: Optional[str] = None,
                      cpuinfo_path: str = "/proc/cpuinfo") -> str:
    """Compile-target digest identifying processes that may safely
    share AOT-compiled cache entries (see module docstring).

    `platforms`/`cpuinfo_path` exist for tests; live callers read the
    active `jax.config.jax_platforms` and the real cpuinfo.
    """
    import hashlib
    import platform as _platform
    if platforms is None:
        try:
            import jax
            platforms = jax.config.jax_platforms or ""
        except Exception:
            platforms = ""
    plat = platforms.strip().lower() or "auto"
    # An empty/auto platform set may resolve to the CPU backend, so it
    # must be treated as CPU-capable; only an explicit accelerator-only
    # set skips the CPU compile-target parts.
    cpu_capable = plat == "auto" or "cpu" in plat.split(",")
    parts = [_platform.machine(), plat]
    if cpu_capable:
        models, feats = set(), set()
        try:
            with open(cpuinfo_path) as f:
                for line in f:
                    # x86 exposes 'flags'/'model name'; arm64
                    # 'Features'/'CPU part'. Union over ALL cores:
                    # heterogeneous-core hosts (big.LITTLE) report
                    # per-core feature sets in enumeration order.
                    if line.startswith(("flags", "Features")):
                        feats.update(line.split(":", 1)[1].split())
                    elif line.startswith(("model name", "CPU part")):
                        models.add(line.split(":", 1)[1].strip())
        except OSError:
            pass
        try:
            import jaxlib
            jl_version = jaxlib.__version__
        except Exception:
            jl_version = "unknown"
        parts += [",".join(sorted(models)), " ".join(sorted(feats)),
                  jl_version, os.environ.get("XLA_FLAGS", "")]
    digest = hashlib.sha256("\x1f".join(parts).encode()).hexdigest()[:10]
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
