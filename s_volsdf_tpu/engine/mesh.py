"""Mesh extraction: SDF -> triangle mesh (eval path).

Rebuild of /root/reference/volsdf/utils/plots.py:70-287
(get_surface_trace / get_surface_high_res_mesh / get_surface_by_grid)
without skimage/trimesh:
  * isosurface extraction runs in the native C++ marching-tetrahedra
    core (s_volsdf_tpu/native/mc.cpp), auto-compiled with g++ at first
    use, with a vectorized numpy fallback;
  * connected components, surface sampling and box slicing are
    implemented here in numpy;
  * SDF evaluation is the jitted chunked grid evaluator.
"""

from __future__ import annotations

import ctypes
import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from s_volsdf_tpu.utils.logging import get_logger

logger = get_logger()

_LIB = None
_LIB_FAILED = False


class _MCResult(ctypes.Structure):
    _fields_ = [("verts", ctypes.POINTER(ctypes.c_float)),
                ("n_verts", ctypes.c_int64),
                ("tris", ctypes.POINTER(ctypes.c_int64)),
                ("n_tris", ctypes.c_int64)]


def _load_native():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    try:
        from s_volsdf_tpu.native.build import build_native
        lib = ctypes.CDLL(build_native("libmc.so", "mc.cpp"))
        lib.mc_run.restype = ctypes.POINTER(_MCResult)
        lib.mc_run.argtypes = [ctypes.POINTER(ctypes.c_float),
                               ctypes.c_int64, ctypes.c_int64,
                               ctypes.c_int64, ctypes.c_float]
        lib.mc_free.argtypes = [ctypes.POINTER(_MCResult)]
        _LIB = lib
    except Exception as e:  # pragma: no cover - env without g++
        logger.warning(f"native mc unavailable ({e}); using numpy fallback")
        _LIB_FAILED = True
    return _LIB


def marching_cubes(volume: np.ndarray, level: float = 0.0,
                   spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0)
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the `level` isosurface of `volume` (nx, ny, nz).

    Returns (verts (N, 3) in volume coords * spacing, faces (M, 3)).
    Marching tetrahedra (6-tet split) — same surface location as MC up
    to in-cell triangulation; vertex positions linearly interpolated.
    """
    vol = np.ascontiguousarray(volume, dtype=np.float32)
    lib = _load_native()
    if lib is not None:
        ptr = vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        res = lib.mc_run(ptr, *vol.shape, float(level))
        try:
            nv = res.contents.n_verts
            nt = res.contents.n_tris
            verts = np.ctypeslib.as_array(res.contents.verts,
                                          shape=(nv, 3)).copy()
            faces = np.ctypeslib.as_array(res.contents.tris,
                                          shape=(nt, 3)).copy()
        finally:
            lib.mc_free(res)
    else:
        verts, faces = _marching_tetrahedra_numpy(vol, level)
    verts = verts * np.asarray(spacing, dtype=np.float32)
    return verts.astype(np.float32), faces.astype(np.int64)


# --------------------------------------------------------------------------
# numpy fallback (same 6-tet decomposition, vectorized)
# --------------------------------------------------------------------------

_TETS = np.array([[0, 5, 1, 3], [0, 5, 3, 7], [0, 5, 7, 4],
                  [0, 3, 2, 7], [0, 2, 6, 7], [0, 4, 7, 6]])
_CASES = {
    1: [(0, 1), (0, 2), (0, 3)], 2: [(1, 0), (1, 3), (1, 2)],
    4: [(2, 0), (2, 1), (2, 3)], 8: [(3, 0), (3, 2), (3, 1)],
    14: [(0, 1), (0, 3), (0, 2)], 13: [(1, 0), (1, 2), (1, 3)],
    11: [(2, 0), (2, 3), (2, 1)], 7: [(3, 0), (3, 1), (3, 2)],
    3: [(0, 2), (0, 3), (1, 2), (1, 2), (0, 3), (1, 3)],
    12: [(0, 2), (1, 2), (0, 3), (1, 2), (1, 3), (0, 3)],
    5: [(0, 1), (2, 1), (0, 3), (2, 1), (2, 3), (0, 3)],
    10: [(0, 1), (0, 3), (2, 1), (2, 1), (0, 3), (2, 3)],
    6: [(1, 0), (2, 0), (1, 3), (2, 0), (2, 3), (1, 3)],
    9: [(1, 0), (1, 3), (2, 0), (2, 0), (1, 3), (2, 3)],
}


def _marching_tetrahedra_numpy(vol: np.ndarray, level: float):
    nx, ny, nz = vol.shape
    corners = np.array([[(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1]
                        for c in range(8)])
    xs, ys, zs = np.meshgrid(np.arange(nx - 1), np.arange(ny - 1),
                             np.arange(nz - 1), indexing="ij")
    base = np.stack([xs, ys, zs], axis=-1).reshape(-1, 3)   # (C, 3)
    cvals = np.stack(
        [vol[base[:, 0] + dx, base[:, 1] + dy, base[:, 2] + dz]
         for dx, dy, dz in corners], axis=-1)               # (C, 8)

    tri_pts = []
    for tet in _TETS:
        tv = cvals[:, tet]                                  # (C, 4)
        inside = ((tv < level) * [1, 2, 4, 8]).sum(-1)      # (C,)
        for case, edges in _CASES.items():
            sel = np.nonzero(inside == case)[0]
            if sel.size == 0:
                continue
            pts = []
            for (a, b) in edges:
                pa = base[sel] + corners[tet[a]]
                pb = base[sel] + corners[tet[b]]
                va = tv[sel, a]
                vb = tv[sel, b]
                t = np.where(vb != va, (level - va) /
                             np.where(vb != va, vb - va, 1.0), 0.5)
                t = np.clip(t, 0, 1)[:, None]
                pts.append(pa + t * (pb - pa))
            pts = np.stack(pts, axis=1)                     # (S, 3k, 3)
            tri_pts.append(pts.reshape(-1, 3, 3))
    if not tri_pts:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
    tris = np.concatenate(tri_pts, axis=0)                  # (T, 3, 3)
    flat = tris.reshape(-1, 3)
    uniq, inv = np.unique(np.round(flat, 6), axis=0, return_inverse=True)
    faces = inv.reshape(-1, 3)
    keep = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) \
        & (faces[:, 0] != faces[:, 2])
    return uniq.astype(np.float32), faces[keep]


# --------------------------------------------------------------------------
# Mesh utilities (replacing trimesh usage in plots.py:130-137, 283-287)
# --------------------------------------------------------------------------

def triangle_areas(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    a = verts[faces[:, 1]] - verts[faces[:, 0]]
    b = verts[faces[:, 2]] - verts[faces[:, 0]]
    return 0.5 * np.linalg.norm(np.cross(a, b), axis=1)


def largest_component(verts: np.ndarray, faces: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Keep the connected component with the largest surface area
    (plots.py:131-134: biggest-component selection)."""
    if faces.shape[0] == 0:
        return verts, faces
    parent = np.arange(verts.shape[0])

    def find(i):
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:
            parent[i], i = root, parent[i]
        return root

    for f in faces:
        ra, rb, rc = find(f[0]), find(f[1]), find(f[2])
        parent[rb] = ra
        parent[rc] = ra
    roots = np.array([find(i) for i in range(verts.shape[0])])
    areas = triangle_areas(verts, faces)
    face_root = roots[faces[:, 0]]
    best = max(set(face_root.tolist()),
               key=lambda r: areas[face_root == r].sum())
    keep_faces = faces[face_root == best]
    used = np.unique(keep_faces)
    remap = -np.ones(verts.shape[0], np.int64)
    remap[used] = np.arange(used.size)
    return verts[used], remap[keep_faces]


def sample_surface(verts: np.ndarray, faces: np.ndarray, n: int,
                   rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Area-weighted uniform surface sampling (trimesh.sample
    equivalent, plots.py:136)."""
    rng = rng or np.random.default_rng(0)
    areas = triangle_areas(verts, faces)
    probs = areas / areas.sum()
    idx = rng.choice(faces.shape[0], size=n, p=probs)
    u = rng.random((n, 1))
    v = rng.random((n, 1))
    flip = (u + v) > 1
    u = np.where(flip, 1 - u, u)
    v = np.where(flip, 1 - v, v)
    tri = verts[faces[idx]]
    return tri[:, 0] + u * (tri[:, 1] - tri[:, 0]) \
        + v * (tri[:, 2] - tri[:, 0])


def slice_box(verts: np.ndarray, faces: np.ndarray, box_min, box_max):
    """Drop faces with any vertex outside the box (approximation of
    trimesh.slice_plane cutting, plots.py:281-287)."""
    inside = np.all((verts >= box_min) & (verts <= box_max), axis=1)
    keep = inside[faces].all(axis=1)
    faces = faces[keep]
    used = np.unique(faces) if faces.size else np.zeros(0, np.int64)
    remap = -np.ones(verts.shape[0], np.int64)
    remap[used] = np.arange(used.size)
    return verts[used], remap[faces]


# --------------------------------------------------------------------------
# SDF grid evaluation + the two reference mesh pipelines
# --------------------------------------------------------------------------

_SDF_JIT_CACHE: tuple = (None, None)  # single slot: (sdf_fn, jitted)


def _jit_sdf_fn(sdf_fn: Callable):
    """One jit wrapper per sdf_fn object: extract_mesh_high_res calls
    eval_sdf_grid twice (low + high pass) with the same closure, and
    a fresh jax.jit each call would recompile both times.

    Single-slot cache on purpose: the only reuse pattern is repeated
    calls with the same closure within one mesh export. A map keyed on
    the closures themselves (even weakly — jax.jit keeps its target
    alive, so weak keys never die) would pin every scene's parameter
    pytree and compiled executable for the process lifetime in a
    multi-scene pipeline."""
    global _SDF_JIT_CACHE
    if _SDF_JIT_CACHE[0] is not sdf_fn:
        _SDF_JIT_CACHE = (sdf_fn, jax.jit(sdf_fn))
    return _SDF_JIT_CACHE[1]


def eval_sdf_grid(sdf_fn: Callable, points: np.ndarray,
                  chunk: int = 100_000, mesh=None) -> np.ndarray:
    """Chunked SDF evaluation on host-provided points (plots.py:74-77).

    The reference evaluates eagerly; here every chunk is padded to one
    fixed size so ALL chunks share a single jitted program, and every
    chunk is dispatched before any result is fetched (the per-chunk
    host fetch would otherwise serialize compute behind transfers —
    same pattern as engine/render.py). With `mesh`, each chunk's point
    axis shards over the mesh's first axis (pure data parallelism,
    zero collectives)."""
    jitted = _jit_sdf_fn(sdf_fn)
    place = lambda x: jnp.asarray(x)
    if mesh is not None and np.prod(list(mesh.shape.values())) > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        axis = mesh.axis_names[0]
        if chunk % mesh.shape[axis] == 0:
            shard = NamedSharding(mesh, P(axis))
            place = lambda x: jax.device_put(x, shard)
    n = points.shape[0]
    outs = []
    for i in range(0, n, chunk):
        block = points[i:i + chunk]
        if block.shape[0] != chunk:
            # Pad only the tail chunk — padding by copying the whole
            # grid would double peak host memory (~1.6 GB at the
            # 512^3 high-res export) to append <chunk zero rows.
            block = np.concatenate(
                [block, np.zeros((chunk - block.shape[0], 3),
                                 points.dtype)], axis=0)
        outs.append(jitted(place(block)))
    return np.concatenate([np.asarray(o) for o in outs], axis=0)[:n]


def _grid_from_bounds(bmin, bmax, resolution):
    xs = np.linspace(bmin[0], bmax[0], resolution)
    ys = np.linspace(bmin[1], bmax[1], resolution)
    zs = np.linspace(bmin[2], bmax[2], resolution)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    pts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3).astype(np.float32)
    return pts, (xs, ys, zs)


def extract_mesh_uniform(sdf_fn: Callable, resolution: int = 100,
                         grid_boundary=(-2.0, 2.0), level: float = 0.0,
                         mesh=None):
    """Uniform-grid extraction (get_surface_trace, plots.py:70-106)."""
    b0, b1 = grid_boundary
    pts, (xs, ys, zs) = _grid_from_bounds([b0] * 3, [b1] * 3, resolution)
    z = eval_sdf_grid(sdf_fn, pts, mesh=mesh).reshape(resolution, resolution,
                                                      resolution)
    if z.min() > level or z.max() < level:
        return None
    spacing = (xs[1] - xs[0], ys[1] - ys[0], zs[1] - zs[0])
    verts, faces = marching_cubes(z, level, spacing)
    verts = verts + np.array([xs[0], ys[0], zs[0]], np.float32)
    return verts, faces


def extract_mesh_high_res(sdf_fn: Callable, resolution: int = 512,
                          grid_boundary=(-2.0, 2.0), level: float = 0.0,
                          take_components: bool = True, mesh=None):
    """Two-pass PCA-aligned extraction
    (get_surface_high_res_mesh, plots.py:108-186)."""
    low = extract_mesh_uniform(sdf_fn, 100, grid_boundary, level, mesh=mesh)
    if low is None:
        return None
    verts, faces = low
    if take_components:
        verts, faces = largest_component(verts, faces)
    pc = sample_surface(verts, faces, 10000)

    mean = pc.mean(axis=0)
    cov = (pc - mean).T @ (pc - mean)
    eigvals, eigvecs = np.linalg.eigh(cov)
    vecs = eigvecs.T[::-1].copy()  # descending eigenvalue order
    if np.linalg.det(vecs) < 0:
        vecs = np.array([[1, 0, 0], [0, 0, 1], [0, 1, 0]],
                        np.float32) @ vecs
    helper = (pc - mean) @ vecs.T

    eps = 0.1
    bmin = helper.min(axis=0) - eps
    bmax = helper.max(axis=0) + eps
    pts_aligned, (xs, ys, zs) = _grid_from_bounds(bmin, bmax, resolution)
    pts_world = pts_aligned @ vecs + mean

    z = eval_sdf_grid(sdf_fn, pts_world.astype(np.float32),
                      mesh=mesh).reshape(resolution, resolution, resolution)
    if z.min() > level or z.max() < level:
        return None
    spacing = (xs[1] - xs[0], ys[1] - ys[0], zs[1] - zs[0])
    mverts, mfaces = marching_cubes(z, level, spacing)
    mverts = mverts + np.array([xs[0], ys[0], zs[0]], np.float32)
    mverts = mverts @ vecs + mean
    return mverts.astype(np.float32), mfaces


def extract_mesh_by_grid(grid_params: np.ndarray, sdf_fn: Callable,
                         resolution: int = 100, level: float = 0.0,
                         higher_res: bool = False, mesh=None):
    """Per-scan bounding-box extraction
    (get_surface_by_grid, plots.py:188-287). grid_params: (2, 3)
    [min; max] box, scaled by [1.5, 1.0] like the reference."""
    grid_params = grid_params * np.array([[1.5], [1.0]])
    bmin, bmax = grid_params[0], grid_params[1]

    if not higher_res:
        pts, (xs, ys, zs) = _grid_from_bounds(bmin, bmax, resolution)
        z = eval_sdf_grid(sdf_fn, pts, mesh=mesh).reshape(
            resolution, resolution, resolution)
        if z.min() > level or z.max() < level:
            return None
        spacing = (xs[1] - xs[0], ys[1] - ys[0], zs[1] - zs[0])
        verts, faces = marching_cubes(z, level, spacing)
        verts = verts + np.array([xs[0], ys[0], zs[0]], np.float32)
        return verts, faces

    out = extract_mesh_high_res(sdf_fn, resolution,
                                (float(bmin.min()), float(bmax.max())),
                                level, mesh=mesh)
    if out is None:
        return None
    verts, faces = out
    return slice_box(verts, faces, bmin, bmax)
