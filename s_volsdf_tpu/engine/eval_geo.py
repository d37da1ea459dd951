"""Chamfer-distance geometry evaluation (DTU / BlendedMVS protocol).

Rebuild of /root/reference/evals/eval_dtu.py and eval_bmvs.py using
scipy cKDTree (the reference uses sklearn KD-trees + open3d IO; neither
changes the numbers):
  * greedy 0.2 mm radius downsampling of the prediction,
  * optional DTU ObsMask / bounding-box / ground-plane crops from the
    official .mat files,
  * acc = mean pred->GT NN distance, comp = mean GT->pred, both with
    outliers above 20 mm dropped, overall = (acc + comp) / 2,
  * BMVS: both clouds divided by the per-scan `relative_scale` to land
    in DTU-comparable millimeter units (eval_bmvs.py:115-116, 190-197).
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, Optional, Tuple

import numpy as np
from scipy.spatial import cKDTree

from s_volsdf_tpu.utils.logging import get_logger

logger = get_logger()

_DS_LIB = None
_DS_FAILED = False


def _load_native_downsample():
    global _DS_LIB, _DS_FAILED
    if _DS_LIB is not None or _DS_FAILED:
        return _DS_LIB
    try:
        from s_volsdf_tpu.native.build import build_native
        lib = ctypes.CDLL(build_native("libdownsample.so", "downsample.cpp"))
        lib.radius_downsample.restype = None
        lib.radius_downsample.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_double, ctypes.POINTER(ctypes.c_uint8)]
        _DS_LIB = lib
    except Exception as e:  # pragma: no cover - env without g++
        logger.warning(f"native downsample unavailable ({e}); "
                       "scipy fallback")
        _DS_FAILED = True
    return _DS_LIB

# eval_bmvs.py:115
BMVS_RELATIVE_SCALE = {
    1: 0.0010051393651899145, 2: 0.0015733906993148704,
    3: 0.0012326845045689896, 4: 0.0015294108512811993,
    5: 0.007349738091050388, 6: 0.01192223325424887,
    7: 0.001284409757598681, 8: 0.0014762879597404273,
    9: 0.022978406132555827,
}


def downsample_radius(points: np.ndarray, radius: float = 0.2,
                      rng: Optional[np.random.Generator] = None,
                      chunk: int = 200_000,
                      native: bool = True) -> np.ndarray:
    """Greedy radius downsampling (eval_dtu.py:100-116): shuffle, then
    keep a point iff no already-kept point lies within `radius`.

    Hot path is native C++ with a uniform grid hash
    (native/downsample.cpp) — the greedy recurrence over a real
    ~10M-point DTU cloud takes minutes through python neighbor lists
    and seconds through the grid (same mask bit-for-bit; gated by
    test_eval.py::test_downsample_native_matches_python).

    The scipy fallback streams neighbor queries in `chunk`-sized
    blocks so the neighbor lists never materialize at once (identical
    result to the one-shot query — the greedy loop only consumes
    neighbors in index order)."""
    rng = rng or np.random.default_rng(0)
    # permutation(n) consumes the same Fisher-Yates draws as
    # shuffle(pts, axis=0) (bit-identical order), but the fancy-index
    # gather is ~10x faster than numpy's buffered row swaps at 10M rows.
    pts = points[rng.permutation(points.shape[0])]
    n = pts.shape[0]

    lib = _load_native_downsample() if native else None
    if lib is not None and n > 0:
        # float64, like cKDTree's internal promotion — identical
        # distance rounding for every input dtype.
        pts64 = np.ascontiguousarray(pts, dtype=np.float64)
        keep = np.zeros(n, dtype=np.uint8)
        lib.radius_downsample(
            pts64.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int64(n), ctypes.c_double(radius),
            keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return pts[keep.astype(bool)]

    tree = cKDTree(pts)
    mask = np.ones(n, dtype=bool)
    for start in range(0, n, chunk):
        neighbors = tree.query_ball_point(pts[start:start + chunk],
                                          r=radius, workers=-1)
        for j, idxs in enumerate(neighbors):
            cur = start + j
            if mask[cur]:
                mask[idxs] = False
                mask[cur] = True
    return pts[mask]


def apply_dtu_crops(points: np.ndarray, obsmask_file: str, patch: float = 60
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Official DTU ObsMask + bounding box crop (eval_dtu.py:119-132).

    Returns (kept points, bbox-cropped points, indices of the kept
    points into `points` — the chain eval_dtu.py:180 uses for error
    visualization)."""
    from scipy.io import loadmat
    m = loadmat(obsmask_file)
    ObsMask, BB, Res = m["ObsMask"], m["BB"].astype(np.float32), m["Res"]
    inbound = (((points >= BB[:1] - patch)
                & (points < BB[1:] + patch * 2)).sum(-1) == 3)
    data_in = points[inbound]
    grid = np.around((data_in - BB[:1]) / Res).astype(np.int32)
    grid_in = (((grid >= 0)
                & (grid < np.expand_dims(ObsMask.shape, 0))).sum(-1) == 3)
    gi = grid[grid_in]
    in_obs = ObsMask[gi[:, 0], gi[:, 1], gi[:, 2]].astype(bool)
    kept_idx = np.where(inbound)[0][grid_in][in_obs]
    return data_in[grid_in][in_obs], data_in, kept_idx


def crop_above_plane(points: np.ndarray, plane_file: str
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Keep GT points above the ground plane (eval_dtu.py:149-166).
    Returns (kept points, their indices into `points`)."""
    from scipy.io import loadmat
    P = loadmat(plane_file)["P"]
    hom = np.concatenate([points, np.ones_like(points[:, :1])], -1)
    above = (P.reshape(1, 4) * hom).sum(-1) > 0
    return points[above], np.where(above)[0]


def chamfer(data_pcd: np.ndarray, stl_pcd: np.ndarray, *,
            max_dist: float = 20.0, downsample: float = 0.2,
            patch_size: float = 60.0,
            obsmask_file: Optional[str] = None,
            plane_file: Optional[str] = None,
            want_detail: bool = False) -> Dict:
    """Chamfer (mm): acc = pred->GT, comp = GT->pred, 20 mm clip.

    With `want_detail`, the result carries a "detail" dict with the
    clouds, the evaluated-subset indices, and the raw NN distances —
    what `write_error_clouds` needs (eval_dtu.py:169-187)."""
    if downsample > 0:
        data_pcd = downsample_radius(data_pcd, downsample)

    if obsmask_file is not None and os.path.exists(obsmask_file):
        data_in_obs, data_in, data_idx = apply_dtu_crops(
            data_pcd, obsmask_file, patch=patch_size)
    else:
        data_in_obs = data_in = data_pcd
        data_idx = np.arange(data_pcd.shape[0])

    stl_eval = stl_pcd
    stl_idx = np.arange(stl_pcd.shape[0])
    if plane_file is not None and os.path.exists(plane_file):
        stl_eval, stl_idx = crop_above_plane(stl_pcd, plane_file)

    tree_stl = cKDTree(stl_pcd)
    d2s, _ = tree_stl.query(data_in_obs, k=1, workers=-1)
    acc = float(d2s[d2s < max_dist].mean()) if d2s.size else float("inf")

    tree_data = cKDTree(data_in)
    s2d, _ = tree_data.query(stl_eval, k=1, workers=-1)
    comp = float(s2d[s2d < max_dist].mean()) if s2d.size else float("inf")

    res = {"acc": acc, "comp": comp, "overall": (acc + comp) / 2.0}
    if want_detail:
        res["detail"] = {"data_pcd": data_pcd, "data_idx": data_idx,
                         "d2s": d2s, "stl_pcd": stl_pcd,
                         "stl_idx": stl_idx, "s2d": s2d,
                         "max_dist": max_dist}
    return res


def write_error_clouds(detail: Dict, d2s_path: str, s2d_path: str,
                       vis_dist: float = 10.0) -> None:
    """Error-colored point clouds (eval_dtu.py:169-187,
    eval_bmvs.py:226-246): evaluated points fade white->red with NN
    distance (clipped at `vis_dist`), points beyond max_dist are green,
    points excluded from the statistics stay blue."""
    from s_volsdf_tpu.data.io import save_ply

    def colorize(cloud, idx, dist):
        R, G, W = (np.array([c], np.float64) for c in
                   ([1, 0, 0], [0, 1, 0], [1, 1, 1]))
        color = np.tile(np.array([[0, 0, 1.0]]), (cloud.shape[0], 1))
        alpha = (dist.clip(max=vis_dist) / vis_dist)[:, None]
        color[idx] = R * alpha + W * (1 - alpha)
        color[idx[dist >= detail["max_dist"]]] = G
        return (color * 255).astype(np.uint8)

    save_ply(d2s_path, detail["data_pcd"].astype(np.float32),
             rgb=colorize(detail["data_pcd"], detail["data_idx"],
                          detail["d2s"]))
    save_ply(s2d_path, detail["stl_pcd"].astype(np.float32),
             rgb=colorize(detail["stl_pcd"], detail["stl_idx"],
                          detail["s2d"]))
    logger.info(f"error clouds -> {d2s_path}, {s2d_path}")


def mesh_to_pcd(ply_path: str, target_density: float = 0.2,
                max_points: int = 10_000_000) -> np.ndarray:
    """Sample a predicted MESH into a point cloud for Chamfer eval
    (reference eval_dtu.py --mode mesh, :62-88: vertices + per-triangle
    area-proportional samples). target_density ~ downsample radius so
    sampling matches the later 0.2 mm thinning."""
    from s_volsdf_tpu.data.io import load_ply
    from s_volsdf_tpu.engine.mesh import sample_surface, triangle_areas
    verts, faces = _load_mesh(ply_path)
    if faces is None or faces.shape[0] == 0:
        return verts
    area = triangle_areas(verts, faces).sum()
    n = int(min(max_points, max(area / (target_density ** 2), 1)))
    pts = sample_surface(verts, faces, n)
    return np.concatenate([verts, pts.astype(np.float32)], axis=0)


def _load_mesh(ply_path: str):
    """Read verts (+faces if present) from a binary-little-endian PLY
    written by save_ply."""
    import re
    with open(ply_path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        n_verts = int(re.search(rb"element vertex (\d+)", header).group(1))
        m_face = re.search(rb"element face (\d+)", header)
        has_rgb = b"uchar red" in header
        vdt = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
        if has_rgb:
            vdt += [("r", "u1"), ("g", "u1"), ("b", "u1")]
        rec = np.fromfile(f, dtype=np.dtype(vdt), count=n_verts)
        verts = np.stack([rec["x"], rec["y"], rec["z"]], -1)
        faces = None
        if m_face:
            nf = int(m_face.group(1))
            frec = np.fromfile(f, dtype=np.dtype(
                [("n", "u1"), ("a", "<i4"), ("b", "<i4"), ("c", "<i4")]),
                count=nf)
            faces = np.stack([frec["a"], frec["b"], frec["c"]], -1)
    return verts.astype(np.float32), faces


def eval_dtu_scan(pred_ply: str, scan: int, dataset_dir: str,
                  mode: str = "pcd", visualize_error: bool = False,
                  visualize_threshold: float = 10.0,
                  vis_dir: Optional[str] = None, **kwargs
                  ) -> Dict[str, float]:
    """Official DTU protocol for one scan (eval_dtu.py:92-197).
    dataset_dir must hold ObsMask/ObsMask{scan}_10.mat,
    ObsMask/Plane{scan}.mat, Points/stl/stl{scan:03}_total.ply.
    mode 'mesh' samples the predicted mesh first (eval_dtu.py:62-88).
    visualize_error writes vis_{scan:03}_{d2s,s2d}.ply error clouds
    into vis_dir (eval_dtu.py:169-187)."""
    from s_volsdf_tpu.data.io import load_ply
    if mode == "mesh":
        data_pcd = mesh_to_pcd(pred_ply)
    else:
        data_pcd, _ = load_ply(pred_ply)
    stl, _ = load_ply(os.path.join(dataset_dir, "Points", "stl",
                                   f"stl{scan:03d}_total.ply"))
    obsmask = os.path.join(dataset_dir, "ObsMask", f"ObsMask{scan}_10.mat")
    plane_scan = 83 if scan == 82 else scan  # eval_dtu.py:149-152
    plane = os.path.join(dataset_dir, "ObsMask", f"Plane{plane_scan}.mat")
    res = chamfer(data_pcd, stl, obsmask_file=obsmask, plane_file=plane,
                  want_detail=visualize_error, **kwargs)
    if visualize_error:
        out = vis_dir or os.path.join(os.path.dirname(pred_ply), "result")
        os.makedirs(out, exist_ok=True)
        write_error_clouds(res.pop("detail"),
                           os.path.join(out, f"vis_{scan:03d}_d2s.ply"),
                           os.path.join(out, f"vis_{scan:03d}_s2d.ply"),
                           vis_dist=visualize_threshold)
    logger.info(f"scan{scan:03d} acc={res['acc']:.2f} "
                f"comp={res['comp']:.2f} overall={res['overall']:.2f}")
    return res


def save_bmvs_gt(scan: int, dataset_dir: str, data_dir_root: str,
                 n_samples: int = 100000,
                 crop_min_z: Optional[float] = None,
                 rng: Optional[np.random.Generator] = None) -> str:
    """Generate the BMVS GT point cloud from textured meshes
    (reference eval_bmvs.py:139-181, `--save_gt`): merge every .obj
    under dataset_dir/<scan-hash>/textured_mesh/, sample `n_samples`
    points uniformly by area, write BlendedMVS/stl/scan{n}.ply.

    With `crop_min_z`, additionally writes scan{n}_crop.ply keeping
    only points above that ground plane (the released *_crop.ply files
    crop above the ground plane + object masks; the reference repo
    ships them precomputed and contains no generator, so the plane is
    an explicit argument here).
    Returns the path of the (cropped if requested) cloud.
    """
    import glob as _glob
    from s_volsdf_tpu.data.io import read_obj, save_ply
    from s_volsdf_tpu.data.splits import scan2hash
    from s_volsdf_tpu.engine.mesh import sample_surface

    gt_dir = os.path.join(dataset_dir, scan2hash(f"scan{scan}"),
                          "textured_mesh")
    obj_files = sorted(_glob.glob(os.path.join(gt_dir, "*.obj")))
    if not obj_files:
        raise FileNotFoundError(f"no .obj meshes under {gt_dir}")
    verts_l, faces_l, off = [], [], 0
    for f in obj_files:
        v, t = read_obj(f)
        verts_l.append(v)
        faces_l.append(t + off)
        off += v.shape[0]
    verts = np.concatenate(verts_l, axis=0)
    faces = np.concatenate(faces_l, axis=0)

    pts = sample_surface(verts, faces, n_samples,
                         rng=rng or np.random.default_rng(0))
    stl_dir = os.path.join(data_dir_root, "BlendedMVS", "stl")
    out = os.path.join(stl_dir, f"scan{scan}.ply")
    save_ply(out, pts.astype(np.float32))
    logger.info(f"bmvs scan{scan}: GT cloud {pts.shape[0]} pts -> {out}")
    if crop_min_z is not None:
        kept = pts[pts[:, 2] >= crop_min_z]
        out = os.path.join(stl_dir, f"scan{scan}_crop.ply")
        save_ply(out, kept.astype(np.float32))
        logger.info(f"bmvs scan{scan}: cropped z>={crop_min_z} "
                    f"{kept.shape[0]} pts -> {out}")
    return out


def eval_bmvs_scan(pred_ply: str, scan: int, data_dir_root: str,
                   no_crop: bool = False, visualize_error: bool = False,
                   vis_dir: Optional[str] = None, **kwargs
                   ) -> Dict[str, float]:
    """BMVS protocol (eval_bmvs.py:121-251): rescale both clouds by
    relative_scale, scan-5 scale_mat fix, same chamfer constants.

    Unlike DTU, the BMVS protocol does NOT thin the prediction — the
    0.2 'radius' at eval_bmvs.py:192 only parameterizes the sklearn NN
    engine; there is no greedy downsampling loop — so `downsample`
    defaults to 0 here. visualize_error writes {scan}_{d2s,s2d}.ply
    with the reference's fixed vis_dist=10 (eval_bmvs.py:232)."""
    from s_volsdf_tpu.data.io import load_ply
    data_pcd, _ = load_ply(pred_ply)

    if scan == 5:
        cam_file = os.path.join(data_dir_root, "BlendedMVS", "scan5",
                                "cameras.npz")
        scale_mat = np.load(cam_file)["scale_mat_0"]
        hom = np.concatenate([data_pcd, np.ones_like(data_pcd[:, :1])], -1)
        data_pcd = (hom @ scale_mat.T)[:, :3]

    suffix = "" if no_crop else "_crop"
    gt_path = os.path.join(data_dir_root, "BlendedMVS", "stl",
                           f"scan{scan}{suffix}.ply")
    gt_pcd, _ = load_ply(gt_path)

    s = BMVS_RELATIVE_SCALE[scan]
    kwargs.setdefault("downsample", 0.0)
    res = chamfer(data_pcd / s, gt_pcd / s,
                  want_detail=visualize_error, **kwargs)
    if visualize_error:
        out = vis_dir or os.path.join(os.path.dirname(pred_ply), "result")
        os.makedirs(out, exist_ok=True)
        write_error_clouds(res.pop("detail"),
                           os.path.join(out, f"{scan}_d2s.ply"),
                           os.path.join(out, f"{scan}_s2d.ply"),
                           vis_dist=10.0)
    logger.info(f"bmvs scan{scan} overall={res['overall']:.2f}")
    return res
