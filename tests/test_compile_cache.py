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


def test_fingerprint_covers_compile_target_config(tmp_path, monkeypatch):
    """A CPU-capable process must never share a namespace with entries
    written under a different CPU compile-target config — even when the
    ISA flag lists are identical (LLVM tuning features like
    +prefer-no-gather derive from the CPU *model*), and even when only
    the requested platform set or XLA flags differ (round-3 MULTICHIP
    tail: dryrun replayed foreign-target AOT entries)."""
    from s_volsdf_tpu.utils.compile_cache import _host_fingerprint

    flags = "flags\t\t: fpu sse sse2 avx avx2\n"
    a = tmp_path / "a.cpuinfo"
    b = tmp_path / "b.cpuinfo"
    a.write_text("model name\t: Intel(R) Xeon(R) @ 2.10GHz\n" + flags)
    b.write_text("model name\t: AMD EPYC 7B12\n" + flags)

    monkeypatch.delenv("XLA_FLAGS", raising=False)
    fa = _host_fingerprint("cpu", str(a))
    fb = _host_fingerprint("cpu", str(b))
    assert fa != fb, "same ISA flags, different model must segregate"

    # Platform set segregates: a cpu-forced dryrun never reads entries
    # written by a production 'axon,cpu' process on the same host.
    assert _host_fingerprint("cpu", str(a)) != \
        _host_fingerprint("axon,cpu", str(a))

    # XLA flags steer the compile-target config for CPU AOT code.
    monkeypatch.setenv("XLA_FLAGS",
                       "--xla_force_host_platform_device_count=8")
    assert _host_fingerprint("cpu", str(a)) != fa

    # Accelerator-only platform sets skip the CPU-specific parts so
    # hosts with different CPUs share accelerator entries.
    monkeypatch.delenv("XLA_FLAGS", raising=False)
    assert _host_fingerprint("axon", str(a)) == \
        _host_fingerprint("axon", str(b))
    # ... but 'auto' may resolve to CPU, so it stays CPU-fingerprinted.
    assert _host_fingerprint("", str(a)) != _host_fingerprint("", str(b))


def test_fingerprint_unions_heterogeneous_cores(tmp_path):
    """big.LITTLE hosts report per-core feature lines; the digest must
    not depend on core enumeration order (advisor r3)."""
    from s_volsdf_tpu.utils.compile_cache import _host_fingerprint
    a = tmp_path / "a.cpuinfo"
    b = tmp_path / "b.cpuinfo"
    a.write_text("Features\t: fp asimd\nFeatures\t: fp asimd sve\n")
    b.write_text("Features\t: fp asimd sve\nFeatures\t: fp asimd\n")
    assert _host_fingerprint("cpu", str(a)) == _host_fingerprint("cpu", str(b))


def test_dryrun_fails_on_aot_loader_errors():
    """The dryrun belt: an XLA cpu_aot_loader REAL ISA-mismatch line on
    stderr raises; the two same-host tuning-preference false positives
    (prefer-no-gather/scatter — reproduced here with a fresh cache and
    two identical same-host processes) are filtered, not fatal."""
    import sys
    sys.path.insert(0, "/root/repo")
    try:
        from __graft_entry__ import _fail_on_aot_loader_errors
    finally:
        sys.path.pop(0)
    import os
    import pytest
    real = (b"E0000 00:00 cpu_aot_loader.cc:210] Loading XLA:CPU AOT "
            b"result. Target machine feature +avx512f is not  supported "
            b"on the host machine. ... could lead to execution errors "
            b"such as SIGILL\n")
    with pytest.raises(RuntimeError, match="different\\s+target config"):
        with _fail_on_aot_loader_errors():
            os.write(2, real)

    tuning = (b"E0000 00:00 cpu_aot_loader.cc:210] Loading XLA:CPU AOT "
              b"result. Target machine feature +prefer-no-gather is not "
              b" supported on the host machine. ... could lead to "
              b"execution errors such as SIGILL\n")
    # Tuning-only lines: no raise, and NOT replayed to stderr (the
    # driver's MULTICHIP tail must come out clean).
    r_fd, w_fd = os.pipe()
    saved = os.dup(2)
    os.dup2(w_fd, 2)
    try:
        with _fail_on_aot_loader_errors():
            os.write(2, tuning)
            os.write(2, b"I0000 ordinary log line\n")
    finally:
        os.dup2(saved, 2)
        os.close(saved)
        os.close(w_fd)
    out = os.read(r_fd, 65536).decode()
    os.close(r_fd)
    assert "ordinary log line" in out
    assert "cpu_aot_loader" not in out
    assert "filtered 1 same-host" in out


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
