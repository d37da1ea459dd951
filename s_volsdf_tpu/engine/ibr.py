"""Simple image-based rendering for novel views.

Rebuild of /root/reference/simple_ibr.py:31-235 and the create_scene
export (/root/reference/runner.py:74-108): warp training images into an
eval view through the rendered depth, weight by view-direction cosine
(softmax x20), fill holes from the VolSDF render, erode masks, and blend
with a 4-level Laplacian pyramid. Host-side cv2/numpy — this is an
offline post-process, not a hot path.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List

import cv2
import numpy as np

from s_volsdf_tpu.config import Config
from s_volsdf_tpu.data.io import (read_camera_parameters, read_img,
                                  read_pfm, write_cam)
from s_volsdf_tpu.data.splits import get_eval_ids, get_trains_ids
from s_volsdf_tpu.engine.fusion import check_geometric_consistency
from s_volsdf_tpu.utils.logging import get_logger

logger = get_logger()


def create_scene(cfg: Config, scene: str, exps_root: str = ".") -> None:
    """Export cams (+ eval-view cams without images) and images for IBR
    (runner.py:74-108)."""
    from s_volsdf_tpu.data.mvs_dataset import MVSDataset

    outdir = os.path.join(exps_root, cfg.outdir)
    os.makedirs(os.path.join(outdir, scene), exist_ok=True)

    trains_i = get_trains_ids(cfg.dataset.data_dir, scene, cfg.num_view)
    evals_i = get_eval_ids(cfg.dataset.data_dir, int(scene[4:]))
    all_i = trains_i + evals_i
    mvs_datapath = os.path.join(cfg.data_dir_root, cfg.dataset.data_dir,
                                "mvs_data")
    ds = MVSDataset(
        datapath=mvs_datapath, scan=scene, nviews=cfg.num_view,
        data_dir=cfg.dataset.data_dir, ndepths=cfg.mvs.numdepth,
        interval_scale=(cfg.mvs.interval_scale
                        if cfg.dataset.data_dir == "DTU" else 1.0),
        max_h=cfg.max_h, max_w=cfg.max_w, trains_i=all_i,
        data_dir_root=cfg.data_dir_root, x2_mvsres=False)

    for i in range(len(ds)):
        s = ds[i]
        vid = s.view_ids[0]
        cam = np.asarray(s.proj_matrices["stage3"][0])
        cam_fn = os.path.join(outdir, s.filename.format("cams", "_cam.txt"))
        write_cam(cam_fn, cam, s.cam_near_far)
        if vid not in evals_i:
            img_fn = os.path.join(outdir, s.filename.format("images", ".png"))
            os.makedirs(os.path.dirname(img_fn), exist_ok=True)
            img = (np.clip(s.imgs[0], 0, 1) * 255).astype(np.uint8)
            cv2.imwrite(img_fn, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    logger.info(f"create_scene: wrote cams/images for {scene} to {outdir}")


# --------------------------------------------------------------------------
# Laplacian blending (simple_ibr.py:93-147)
# --------------------------------------------------------------------------

def _laplacian_pyramid(img: np.ndarray, num_levels: int, is_mask: bool):
    g = img.astype(np.float64)
    gp = [g]
    for _ in range(num_levels):
        g = cv2.pyrDown(g)
        gp.append(g)
    if is_mask:
        lp = [gp[num_levels - 1]]
        for i in range(num_levels - 2, -1, -1):
            lp.append(gp[i])
    else:
        lp = [gp[num_levels - 1]]
        for i in range(num_levels - 1, 0, -1):
            up = cv2.pyrUp(gp[i])
            lp.append(cv2.subtract(gp[i - 1], up))
    return lp


def laplacian_blending(imgs: np.ndarray, masks: np.ndarray,
                       num_levels: int = 4) -> np.ndarray:
    """Blend N images by N masks across a Laplacian pyramid
    (simple_ibr.py:116-147)."""
    assert imgs.shape == masks.shape
    lp_imgs = [_laplacian_pyramid(i, num_levels, False) for i in imgs]
    lp_masks = [_laplacian_pyramid(m, num_levels, True) for m in masks]
    levels = []
    for lvl in range(num_levels):
        acc = 0
        for j in range(len(lp_masks)):
            acc = acc + lp_masks[j][lvl] * lp_imgs[j][lvl]
        levels.append(acc)
    out = levels[0]
    for lvl in range(1, num_levels):
        out = cv2.pyrUp(out)
        out = cv2.add(out, levels[lvl])
    return np.clip(out, 0.0, 1.0)


def _dirs_for_view(intrinsics3, extrinsics, hw):
    """Per-pixel unit ray directions in world space
    (simple_ibr.py:80-91)."""
    h, w = hw
    pose = np.linalg.inv(extrinsics)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    fx, fy = intrinsics3[0, 0], intrinsics3[1, 1]
    cx, cy = intrinsics3[0, 2], intrinsics3[1, 2]
    sk = intrinsics3[0, 1]
    x_lift = (xs - cx + cy * sk / fy - sk * ys / fy) / fx
    y_lift = (ys - cy) / fy
    pts = np.stack([x_lift, y_lift, np.ones_like(x_lift)], axis=-1)
    world = pts @ pose[:3, :3].T
    dirs = world / np.linalg.norm(world, axis=-1, keepdims=True)
    return dirs.astype(np.float32), pose[:3, 3]


def image_based_render(scan_folder: str, out_folder: str, data_dir: str,
                       num_view: int = 3) -> List[str]:
    """Blend warped training views into each eval view
    (simple_ibr.py:149-235). Expects:
      scan_folder/cams/XXXXXXXX_cam.txt, scan_folder/images/XXXXXXXX.png
      out_folder/eval_XXX.png (VolSDF renders),
      out_folder/depth_est/XXXXXXXX.pfm
    """
    scan = Path(scan_folder).name
    trains_i = get_trains_ids(data_dir, scan, num_view)
    evals_i = get_eval_ids(data_dir, int(scan[4:]))

    written = []
    for ref_view in evals_i:
        ref_intr, ref_extr = read_camera_parameters(
            os.path.join(scan_folder, f"cams/{ref_view:08d}_cam.txt"))
        pred_ref_img = read_img(
            os.path.join(out_folder, f"eval_{ref_view:03d}.png"))
        ref_depth = read_pfm(
            os.path.join(out_folder, f"depth_est/{ref_view:08d}.pfm"))[0]
        ref_dir, _ = _dirs_for_view(ref_intr, ref_extr, ref_depth.shape)

        weight_masks, sampled_srcs = [], []
        for src_view in trains_i:
            src_intr, src_extr = read_camera_parameters(
                os.path.join(scan_folder, f"cams/{src_view:08d}_cam.txt"))
            src_img = read_img(
                os.path.join(scan_folder, f"images/{src_view:08d}.png"))
            src_depth = read_pfm(
                os.path.join(out_folder, f"depth_est/{src_view:08d}.pfm"))[0]
            assert src_depth.shape == ref_depth.shape

            geo_mask, _, x2d, y2d = check_geometric_consistency(
                ref_depth, ref_intr, ref_extr, src_depth, src_intr,
                src_extr, filter_dist=2.0)
            x2d = x2d.astype(np.float32)
            y2d = y2d.astype(np.float32)
            sampled = cv2.remap(src_img, x2d, y2d,
                                interpolation=cv2.INTER_CUBIC)
            sampled_srcs.append(sampled)

            src_dir, _ = _dirs_for_view(src_intr, src_extr, src_depth.shape)
            sampled_dir = cv2.remap(src_dir, x2d, y2d,
                                    interpolation=cv2.INTER_CUBIC)
            norm = np.linalg.norm(sampled_dir, axis=2, keepdims=True)
            sampled_dir = sampled_dir / norm
            cos_dir = np.nan_to_num((sampled_dir * ref_dir).sum(axis=2))
            weight_masks.append(cos_dir * geo_mask.astype(np.float64))

        # VolSDF render as the fallback layer (simple_ibr.py:210-212).
        weight_masks.append(0.2 * np.ones_like(ref_depth, np.float64))
        sampled_srcs.append(pred_ref_img)

        wm = np.stack(weight_masks)
        wm = np.exp(20 * wm - np.max(20 * wm, axis=0, keepdims=True))
        wm = wm / wm.sum(axis=0, keepdims=True)
        wm = np.repeat(wm[..., None], 3, axis=-1)
        srcs = np.stack(sampled_srcs)

        # Fill undefined pixels from the render, erode warp masks so
        # pyramid blur doesn't bleed holes (simple_ibr.py:219-229).
        srcs_fill = srcs * wm + srcs[-1:] * (1 - wm)
        wm_lap = wm.copy()
        kernel = np.ones((5, 5), np.uint8)
        for i in range(wm_lap.shape[0] - 1):
            eroded = cv2.erode((wm_lap[i] > 0.2).astype(np.float64), kernel)
            wm_lap[i] = eroded * wm_lap[i]
        wm_lap[-1] += 1e-2
        wm_lap = wm_lap / wm_lap.sum(axis=0, keepdims=True)

        blend = laplacian_blending(srcs_fill, wm_lap, num_levels=4)
        out_path = os.path.join(out_folder, f"eval_blend_{ref_view:03d}.png")
        import imageio.v2 as imageio
        imageio.imwrite(out_path, (blend * 255).astype(np.uint8))
        written.append(out_path)
        logger.info(f"IBR: wrote {out_path}")
    return written
