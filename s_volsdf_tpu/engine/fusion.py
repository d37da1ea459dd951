"""Multi-view geometric-consistency depth fusion -> point cloud.

Rebuild of /root/reference/runner.py:301-404 and
/root/reference/helpers/utils.py:77-132. Two equivalent cores:
  * a native C++ (OpenMP) reprojection kernel
    (s_volsdf_tpu/native/fusion.cpp, auto-compiled at first use) —
    the production path (~10x the numpy pass at 1152x1536);
  * a vectorized-numpy fallback (the reference is per-view numpy +
    cv2.remap; here the reprojection and bilinear resampling are
    closed-form array ops), used when g++ is unavailable and as the
    parity oracle in tests.
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from s_volsdf_tpu.utils.logging import get_logger

logger = get_logger()

_LIB = None
_LIB_FAILED = False


def _load_native():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    try:
        from s_volsdf_tpu.native.build import build_native
        lib = ctypes.CDLL(build_native(
            "libfusion.so", "fusion.cpp",
            extra_flags=["-fopenmp"], fallback_flags=[]))
        dp = ctypes.POINTER(ctypes.c_double)
        lib.geo_consistency.restype = None
        lib.geo_consistency.argtypes = (
            [dp, dp, ctypes.c_int64, ctypes.c_int64]
            + [dp] * 8
            + [ctypes.c_double, ctypes.c_double,
               ctypes.POINTER(ctypes.c_uint8), dp, dp, dp])
        _LIB = lib
    except Exception as e:  # pragma: no cover - env without g++
        logger.warning(f"native fusion unavailable ({e}); numpy fallback")
        _LIB_FAILED = True
    return _LIB


def _geo_consistency_native(depth_ref, intr_ref, extr_ref, depth_src,
                            intr_src, extr_src, filter_dist, filter_diff):
    """Native-core geometric consistency (native/fusion.cpp); returns
    the same tuple as the numpy oracle. None if unavailable."""
    lib = _load_native()
    if lib is None or depth_ref.shape != depth_src.shape:
        return None

    H, W = depth_ref.shape
    T_rs = extr_src @ np.linalg.inv(extr_ref)   # ref cam -> src cam
    T_sr = extr_ref @ np.linalg.inv(extr_src)

    def c(a):
        return np.ascontiguousarray(a, dtype=np.float64)

    dp = ctypes.POINTER(ctypes.c_double)
    mask = np.empty((H, W), np.uint8)
    depth_out = np.empty((H, W), np.float64)
    xs_out = np.empty((H, W), np.float64)
    ys_out = np.empty((H, W), np.float64)
    args = [c(depth_ref), c(depth_src)]
    mats = [c(np.linalg.inv(intr_ref[:3, :3])), c(intr_src[:3, :3]),
            c(np.linalg.inv(intr_src[:3, :3])), c(intr_ref[:3, :3]),
            c(T_rs[:3, :3]), c(T_rs[:3, 3]), c(T_sr[:3, :3]),
            c(T_sr[:3, 3])]
    lib.geo_consistency(
        args[0].ctypes.data_as(dp), args[1].ctypes.data_as(dp),
        ctypes.c_int64(H), ctypes.c_int64(W),
        *[m.ctypes.data_as(dp) for m in mats],
        ctypes.c_double(filter_dist), ctypes.c_double(filter_diff),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        depth_out.ctypes.data_as(dp), xs_out.ctypes.data_as(dp),
        ys_out.ctypes.data_as(dp))
    return mask.astype(bool), depth_out, xs_out, ys_out


def _bilinear_sample(img: np.ndarray, x: np.ndarray, y: np.ndarray):
    """Sample img (H, W) at float coords with cv2.remap's default
    BORDER_CONSTANT(0) semantics (the reference samples src depth with
    cv2.remap and no borderMode override, helpers/utils.py:97): each of
    the 4 corner contributions is zeroed when that corner falls outside
    the image, so fully-out-of-bounds samples read 0 and the border
    band gets partial sums — parity-checked A/B against cv2.remap in
    test_parity_fusion.py."""
    H, W = img.shape[:2]
    xf = np.floor(x)
    yf = np.floor(y)
    x0 = xf.astype(np.int64)
    y0 = yf.astype(np.int64)
    wx = x - xf
    wy = y - yf
    v = np.zeros(np.broadcast(x, y).shape, dtype=np.float64)
    for dy, dx, w in ((0, 0, (1 - wx) * (1 - wy)), (0, 1, wx * (1 - wy)),
                      (1, 0, (1 - wx) * wy), (1, 1, wx * wy)):
        xi = x0 + dx
        yi = y0 + dy
        ok = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v += np.where(ok, img[np.clip(yi, 0, H - 1),
                              np.clip(xi, 0, W - 1)] * w, 0.0)
    return v


def reproject_with_depth(depth_ref, intr_ref, extr_ref, depth_src,
                         intr_src, extr_src):
    """Project ref depth into src, sample src depth, project back
    (helpers/utils.py:77-114). Returns (reprojected ref depth, x2d, y2d
    in ref after the round trip, src pixel coords)."""
    H, W = depth_ref.shape
    y, x = np.mgrid[0:H, 0:W].astype(np.float64)
    xr = x.reshape(-1)
    yr = y.reshape(-1)
    d = depth_ref.reshape(-1)

    # ref pixels -> world
    xyz_ref = np.linalg.inv(intr_ref) @ (np.vstack([xr, yr, np.ones_like(xr)])
                                         * d)
    xyz_world = (np.linalg.inv(extr_ref)
                 @ np.vstack([xyz_ref, np.ones_like(xr)]))[:3]
    # world -> src
    xyz_src = (extr_src @ np.vstack([xyz_world, np.ones_like(xr)]))[:3]
    k_src = intr_src @ xyz_src
    xy_src = k_src[:2] / np.maximum(k_src[2:3], 1e-12)
    x_src = xy_src[0].reshape(H, W)
    y_src = xy_src[1].reshape(H, W)

    # sample src depth at those coords
    sampled = _bilinear_sample(depth_src, x_src, y_src).reshape(-1)

    # src pixels -> world -> ref
    xyz_src2 = np.linalg.inv(intr_src) @ (np.vstack([xy_src,
                                                     np.ones_like(xr)])
                                          * sampled)
    xyz_world2 = (np.linalg.inv(extr_src)
                  @ np.vstack([xyz_src2, np.ones_like(xr)]))[:3]
    xyz_ref2 = (extr_ref @ np.vstack([xyz_world2, np.ones_like(xr)]))[:3]
    depth_reprojected = xyz_ref2[2].reshape(H, W)
    k_ref2 = intr_ref @ xyz_ref2
    xy_ref2 = k_ref2[:2] / np.maximum(k_ref2[2:3], 1e-12)
    x_reproj = xy_ref2[0].reshape(H, W)
    y_reproj = xy_ref2[1].reshape(H, W)
    return depth_reprojected, x_reproj, y_reproj, x_src, y_src


def check_geometric_consistency(depth_ref, intr_ref, extr_ref, depth_src,
                                intr_src, extr_src, filter_dist=1.0,
                                filter_diff=0.01):
    """Pixel passes if round-trip displacement < filter_dist px AND
    relative depth difference < filter_diff (helpers/utils.py:116-132).
    Returns (mask, reprojected depth, src x coords, src y coords).
    Dispatches to the native core when available (bit-identical)."""
    out = _geo_consistency_native(depth_ref, intr_ref, extr_ref, depth_src,
                                  intr_src, extr_src, filter_dist,
                                  filter_diff)
    if out is not None:
        return out
    return check_geometric_consistency_np(
        depth_ref, intr_ref, extr_ref, depth_src, intr_src, extr_src,
        filter_dist, filter_diff)


def check_geometric_consistency_np(depth_ref, intr_ref, extr_ref, depth_src,
                                   intr_src, extr_src, filter_dist=1.0,
                                   filter_diff=0.01):
    """Vectorized-numpy reference implementation (fallback + oracle)."""
    H, W = depth_ref.shape
    y, x = np.mgrid[0:H, 0:W]
    depth_reproj, x2d, y2d, x_src, y_src = reproject_with_depth(
        depth_ref, intr_ref, extr_ref, depth_src, intr_src, extr_src)
    dist = np.sqrt((x2d - x) ** 2 + (y2d - y) ** 2)
    depth_diff = np.abs(depth_reproj - depth_ref)
    relative_depth_diff = depth_diff / np.maximum(depth_ref, 1e-12)
    mask = (dist < filter_dist) & (relative_depth_diff < filter_diff)
    depth_reproj = np.where(mask, depth_reproj, 0.0)
    return mask, depth_reproj, x_src, y_src


def fuse_views(views: List[Dict], *, conf_thresh: float = 0.0,
               thres_view: int = 1, filter_dist: float = 1.0,
               filter_diff: float = 0.01,
               eval_masks: Optional[List[np.ndarray]] = None
               ) -> Tuple[np.ndarray, np.ndarray, List[Dict]]:
    """Fuse per-view depths into a point cloud (runner.py:308-391).

    views: list of dicts with keys depth (H, W), confidence (H, W),
      intrinsics (3, 3), extrinsics (4, 4), image (H, W, 3).
    eval_masks: optional per-view foreground masks (already dilated).
    Returns (xyz (N, 3), rgb uint8 (N, 3), per-view stats).
    """
    vertexs, colors, stats = [], [], []
    n = len(views)
    for ref_i in range(n):
        ref = views[ref_i]
        photo_mask = ref["confidence"] > conf_thresh

        geo_mask_sum = 0
        depth_ests = []
        for src_i in range(n):
            if src_i == ref_i:
                continue
            src = views[src_i]
            geo_mask, depth_reproj, _, _ = check_geometric_consistency(
                ref["depth"], ref["intrinsics"], ref["extrinsics"],
                src["depth"], src["intrinsics"], src["extrinsics"],
                filter_dist, filter_diff)
            geo_mask_sum = geo_mask_sum + geo_mask.astype(np.int32)
            depth_ests.append(depth_reproj)

        depth_avg = (sum(depth_ests) + ref["depth"]) / (geo_mask_sum + 1)
        geo_mask = geo_mask_sum >= thres_view
        final_mask = np.logical_and(photo_mask, geo_mask)
        if eval_masks is not None and eval_masks[ref_i] is not None:
            final_mask = np.logical_and(final_mask, eval_masks[ref_i] > 0)

        stats.append({"photo": float(photo_mask.mean()),
                      "geo": float(geo_mask.mean()),
                      "final": float(final_mask.mean())})
        logger.info(
            f"fusion ref {ref_i}: photo/geo/final = "
            f"{photo_mask.mean():.3f}/{geo_mask.mean():.3f}/"
            f"{final_mask.mean():.3f}")

        H, W = depth_avg.shape
        y, x = np.mgrid[0:H, 0:W]
        valid = final_mask
        xv, yv, dv = x[valid], y[valid], depth_avg[valid]
        color = ref["image"][valid]
        xyz_ref = np.linalg.inv(ref["intrinsics"]) @ (
            np.vstack([xv, yv, np.ones_like(xv)]) * dv)
        xyz_world = (np.linalg.inv(ref["extrinsics"])
                     @ np.vstack([xyz_ref, np.ones_like(xv)]))[:3]
        vertexs.append(xyz_world.T)
        colors.append((np.clip(color, 0, 1) * 255).astype(np.uint8))

    xyz = np.concatenate(vertexs, axis=0).astype(np.float32)
    rgb = np.concatenate(colors, axis=0)
    return xyz, rgb, stats


def filter_depth(scan_folder: str, out_folder: str, plyfilename: str,
                 trains_i: List[int], *, conf_thresh: float = 0.0,
                 thres_view: int = 1, filter_dist: float = 1.0,
                 filter_diff: float = 0.01,
                 eval_mask_dir: Optional[str] = None) -> str:
    """File-level fusion entry (runner.py:301-404): reads saved PFM
    depth/confidence + cam txt + images, writes the fused PLY."""
    import cv2
    from s_volsdf_tpu.data.io import (read_camera_parameters, read_img,
                                      read_pfm, save_ply)

    views = []
    eval_masks = []
    for v in trains_i:
        intr, extr = read_camera_parameters(
            os.path.join(scan_folder, f"cams/{v:08d}_cam.txt"))
        img = read_img(os.path.join(scan_folder, f"images/{v:08d}.jpg"))
        depth = read_pfm(os.path.join(out_folder,
                                      f"depth_est/{v:08d}.pfm"))[0]
        conf = read_pfm(os.path.join(out_folder,
                                     f"confidence/{v:08d}.pfm"))[0]
        assert depth.shape == img.shape[:2]
        views.append({"depth": depth, "confidence": conf,
                      "intrinsics": intr, "extrinsics": extr,
                      "image": img})
        em = None
        if eval_mask_dir is not None:
            for pattern in (f"mask/{v:08d}.png", f"mask/{v:03d}.png",
                            f"{v:03d}.png"):
                p = os.path.join(eval_mask_dir, pattern)
                if os.path.exists(p):
                    m = read_img(p)
                    if m.ndim == 3:
                        m = m[..., -1]
                    # disk(12) dilation (runner.py:365) via cv2.
                    kernel = cv2.getStructuringElement(
                        cv2.MORPH_ELLIPSE, (25, 25))
                    m = cv2.dilate((m > 0).astype(np.uint8), kernel)
                    m = cv2.resize(m.astype(np.float32),
                                   depth.shape[::-1])
                    em = m
                    break
        eval_masks.append(em)

    xyz, rgb, _ = fuse_views(
        views, conf_thresh=conf_thresh, thres_view=thres_view,
        filter_dist=filter_dist, filter_diff=filter_diff,
        eval_masks=eval_masks)
    save_ply(plyfilename, xyz, rgb)
    logger.info(f"saved fused point cloud to {plyfilename} "
                f"({xyz.shape[0]} points)")
    return plyfilename
