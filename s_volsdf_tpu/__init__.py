"""s_volsdf_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of S-VolSDF.

S-VolSDF (ICCV 2023) reconstructs 3D surfaces from 3 input views by
interleaving a frozen multi-view-stereo network (cascade cost volumes)
with a per-scene VolSDF optimization regularized by the MVS probability
volume. Reference behavior documented in SURVEY.md; original repo:
cvlab-stonybrook/s-volsdf (PyTorch/CUDA).

This package is a ground-up JAX design:
  - pure functions + pytree params (no stateful modules),
  - one jit-compiled train step (rays = leading sharded axis),
  - static shapes everywhere (error-bound sampler runs a fixed
    iteration schedule with masked convergence),
  - `shard_map` over a device Mesh for multi-chip ray parallelism,
  - Pallas kernels for gather-heavy hot ops.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache (utils/compile_cache.py): saves the
# ~25-35 s per-program compile on every process restart/resume. On by
# default; S_VOLSDF_COMPILE_CACHE=off disables. Deferred import so the
# package stays importable without jax installed (pure-IO consumers).
def _enable_compile_cache():
    try:
        from s_volsdf_tpu.utils.compile_cache import enable_compilation_cache
        enable_compilation_cache()
    except Exception:  # pragma: no cover - never block import on cache setup
        pass


_enable_compile_cache()
