"""Build-on-first-use helper for the native C++ cores.

The reference ships no native code; our fusion / marching-tetrahedra /
radius-downsample hot paths are C++ (see native/*.cpp) compiled lazily
with g++ the first time they are needed. This module centralises the
build so every loader gets the same semantics:

  * the compiled .so lands next to the source when the package
    directory is writable (dev checkouts), otherwise in a per-user
    cache dir (``$S_VOLSDF_TPU_CACHE_DIR`` or
    ``~/.cache/s_volsdf_tpu/native``) — a root-installed site-packages
    must not break unprivileged users;
  * the build is atomic (compile to a pid-unique temp name, then
    ``os.replace``), so two processes racing on a stale .so can never
    load a half-written file;
  * staleness is mtime-based against the shipped source.

Callers catch exceptions and fall back to their numpy paths.
"""

from __future__ import annotations

import os
import subprocess
from typing import List, Optional

NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))


def _candidate_dirs() -> List[str]:
    dirs = [NATIVE_DIR]
    env = os.environ.get("S_VOLSDF_TPU_CACHE_DIR")
    if env:
        dirs.append(os.path.join(env, "native"))
    dirs.append(os.path.join(
        os.path.expanduser("~"), ".cache", "s_volsdf_tpu", "native"))
    return dirs


def build_native(so_name: str, src_name: str,
                 extra_flags: Optional[List[str]] = None,
                 fallback_flags: Optional[List[str]] = None) -> str:
    """Return the path of an up-to-date compiled ``so_name``.

    Tries each candidate directory in order; a directory is used if it
    already holds a fresh .so or if a build into it succeeds. If
    ``extra_flags`` fails to compile (e.g. no -fopenmp runtime) and
    ``fallback_flags`` is given, the build is retried with those.
    Raises the last error if every candidate fails.
    """
    src = os.path.join(NATIVE_DIR, src_name)
    src_mtime = os.path.getmtime(src)
    last_err: Optional[Exception] = None
    for d in _candidate_dirs():
        so_path = os.path.join(d, so_name)
        try:
            if (os.path.exists(so_path)
                    and os.path.getmtime(so_path) >= src_mtime):
                return so_path
            os.makedirs(d, exist_ok=True)
            tmp = f"{so_path}.tmp.{os.getpid()}"
            base = ["g++", "-O3", "-shared", "-fPIC"]
            try:
                subprocess.run(base + (extra_flags or []) + [src, "-o", tmp],
                               check=True, capture_output=True)
            except subprocess.CalledProcessError:
                if fallback_flags is None:
                    raise
                subprocess.run(base + fallback_flags + [src, "-o", tmp],
                               check=True, capture_output=True)
            os.replace(tmp, so_path)
            return so_path
        except Exception as e:  # unwritable dir, missing g++, ...
            last_err = e
            continue
    raise RuntimeError(f"could not build {so_name}: {last_err}")
