"""Persistent XLA compilation cache (utils/compile_cache.py).

The cache flags are process-global jax config, so each scenario runs
in a subprocess: entries are written on first compile, a fresh process
reuses them (observable via JAX's cache-hit logging), and the env
kill-switch disables the whole mechanism.
"""

import os
import subprocess
import sys

SCRIPT = r"""
import os, sys
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from s_volsdf_tpu.utils.compile_cache import enable_compilation_cache
d = enable_compilation_cache(min_compile_seconds=0.0)
print("CACHE_DIR", d)
import logging
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
h = logging.StreamHandler(sys.stdout)
logging.getLogger("jax._src.compilation_cache").addHandler(h)

@jax.jit
def f(x):
    return jnp.tanh(x @ x).sum()

print("RESULT", float(f(jnp.eye(64))))
"""


def _run(env_extra, cwd):
    env = dict(os.environ, **env_extra)
    env.setdefault("PYTHONPATH", "")
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env["PYTHONPATH"]
    return subprocess.run(
        [sys.executable, "-c", SCRIPT], env=env, cwd=cwd,
        capture_output=True, text=True, timeout=300)


def test_cache_roundtrip_across_processes(tmp_path):
    cache = tmp_path / "xla"
    env = {"S_VOLSDF_COMPILE_CACHE": str(cache), "JAX_PLATFORMS": "cpu"}

    r1 = _run(env, tmp_path)
    assert r1.returncode == 0, r1.stderr
    # Entries land in a per-host CPU-fingerprint subdir of the given
    # root (cross-machine AOT-reuse safety).
    assert f"CACHE_DIR {cache}" in r1.stdout
    entries = [p for p in cache.rglob("*") if p.is_file()]
    assert entries, "first process wrote no cache entries"

    r2 = _run(env, tmp_path)
    assert r2.returncode == 0, r2.stderr
    # JAX logs 'Getting file: <key>' (or similar retrieval message) on
    # a persistent-cache hit; a recompile would log 'Writing' again
    # for the same key. Assert no *new* entries were written.
    entries2 = [p for p in cache.rglob("*") if p.is_file()]
    assert len(entries2) == len(entries), (
        "second process recompiled instead of hitting the cache")
    assert "RESULT" in r2.stdout


def test_host_fingerprint_stable():
    """Same host -> same fingerprint (warm restarts share entries);
    the fingerprint names the arch so foreign-ISA AOT code can never
    be replayed from a shared cache root."""
    import platform
    from s_volsdf_tpu.utils.compile_cache import _host_fingerprint
    a, b = _host_fingerprint(), _host_fingerprint()
    assert a == b
    assert a.startswith(platform.machine() + "-")


def test_env_kill_switch(tmp_path):
    env = {"S_VOLSDF_COMPILE_CACHE": "off", "JAX_PLATFORMS": "cpu"}
    r = _run(env, tmp_path)
    assert r.returncode == 0, r.stderr
    assert "CACHE_DIR None" in r.stdout


def test_explicit_dir_beats_env(tmp_path):
    from s_volsdf_tpu.utils import compile_cache as cc
    # direct call with an explicit dir ignores the env kill-switch
    old = os.environ.get("S_VOLSDF_COMPILE_CACHE")
    os.environ["S_VOLSDF_COMPILE_CACHE"] = "off"
    try:
        cc._enabled = None
        d = cc.enable_compilation_cache(str(tmp_path / "explicit"))
        # Resolved dir = <explicit>/<host fingerprint> (AOT safety).
        assert d == os.path.join(str(tmp_path / "explicit"),
                                 cc._host_fingerprint())
        assert os.path.isdir(d)
    finally:
        cc._enabled = None
        if old is None:
            os.environ.pop("S_VOLSDF_COMPILE_CACHE", None)
        else:
            os.environ["S_VOLSDF_COMPILE_CACHE"] = old
