"""Synthetic scenes for tests and benchmarking (no dataset required).

The reference has no test suite (SURVEY.md section 4); this module
provides analytic scenes (sphere SDF + Lambertian shading) so the full
pipeline — rays, sampler, render, loss, fusion, eval — can be exercised
end-to-end on CI without DTU/BlendedMVS data.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np


@dataclass
class SyntheticScene:
    """A ring of pinhole cameras looking at a sphere at the origin."""
    intrinsics: np.ndarray   # (V, 4, 4)
    poses: np.ndarray        # (V, 4, 4) camera-to-world
    images: np.ndarray       # (V, H, W, 3) float32 in [0, 1]
    depths: np.ndarray       # (V, H, W) z-depth of the sphere (inf = miss)
    img_res: tuple
    sphere_radius: float
    scale_factor: float = 1.0


def look_at(eye: np.ndarray, target: np.ndarray, up: np.ndarray) -> np.ndarray:
    """Camera-to-world with +z forward (OpenCV convention, matching the
    reference's pose math in rend_util.py:60-95)."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0] = right
    c2w[:3, 1] = down
    c2w[:3, 2] = fwd
    c2w[:3, 3] = eye
    return c2w


def ray_sphere_depth(origins, dirs, radius):
    """Analytic first-hit distance along unit `dirs` (inf on miss)."""
    b = np.sum(origins * dirs, axis=-1)
    c = np.sum(origins * origins, axis=-1) - radius ** 2
    disc = b * b - c
    hit = disc >= 0
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    t = np.where(hit & (t > 0), t, np.inf)
    return t


def make_sphere_scene(n_views: int = 3, img_res=(64, 96),
                      sphere_radius: float = 0.8,
                      cam_radius: float = 2.2,
                      light_dir=(0.3, -0.5, -0.8)) -> SyntheticScene:
    """Render a diffuse sphere from `n_views` cameras on a ring."""
    H, W = img_res
    f = 0.9 * max(H, W)
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1] = f, f
    K[0, 2], K[1, 2] = W / 2.0, H / 2.0

    light = np.asarray(light_dir, dtype=np.float32)
    light = light / np.linalg.norm(light)

    intrinsics, poses, images, depths = [], [], [], []
    for v in range(n_views):
        ang = 2 * np.pi * v / max(n_views, 1) * 0.25  # a sparse arc
        eye = np.array([cam_radius * np.sin(ang), 0.35 * cam_radius,
                        -cam_radius * np.cos(ang)], dtype=np.float32)
        c2w = look_at(eye, np.zeros(3, dtype=np.float32),
                      np.array([0.0, 1.0, 0.0], dtype=np.float32))

        # Per-pixel rays.
        ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
        x_lift = (xs - K[0, 2]) / K[0, 0]
        y_lift = (ys - K[1, 2]) / K[1, 1]
        dirs_cam = np.stack([x_lift, y_lift, np.ones_like(x_lift)], axis=-1)
        dirs = dirs_cam @ c2w[:3, :3].T
        dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
        origins = np.broadcast_to(c2w[:3, 3], dirs.shape)

        t = ray_sphere_depth(origins.reshape(-1, 3), dirs.reshape(-1, 3),
                             sphere_radius).reshape(H, W)
        hit = np.isfinite(t)
        pts = origins + np.where(hit, t, 0.0)[..., None] * dirs
        normal = pts / np.maximum(
            np.linalg.norm(pts, axis=-1, keepdims=True), 1e-8)
        lambert = np.clip(-np.sum(normal * light, axis=-1), 0.0, 1.0)
        base = np.array([0.85, 0.45, 0.3], dtype=np.float32)
        img = np.where(hit[..., None],
                       (0.15 + 0.85 * lambert[..., None]) * base,
                       np.array([0.05, 0.05, 0.08], dtype=np.float32))

        # z-depth (distance along camera z), matching depth_values
        # semantics in the reference (network.py:241-243).
        z_depth = np.where(hit, t * (dirs_cam / np.linalg.norm(
            dirs_cam, axis=-1, keepdims=True))[..., 2], np.inf)

        intrinsics.append(K.copy())
        poses.append(c2w)
        images.append(img.astype(np.float32))
        depths.append(z_depth.astype(np.float32))

    return SyntheticScene(
        intrinsics=np.stack(intrinsics),
        poses=np.stack(poses),
        images=np.stack(images),
        depths=np.stack(depths),
        img_res=(H, W),
        sphere_radius=sphere_radius,
    )


def gt_prob_volume(c2w: np.ndarray, K: np.ndarray, res,
                   depth_values: np.ndarray, scale_factor: float,
                   sphere_radius: float = 0.8,
                   sigma_intervals: float = 1.5,
                   floor: float = 0.05,
                   inverse_depth: bool = False,
                   depth_noise: float = 0.0,
                   rng: "np.random.Generator | None" = None):
    """Informative MVS probability volume from the analytic sphere.

    Stands in for a *pretrained* cascade (absent in this env — no
    checkpoints, no egress): per-pixel Gaussian bumps centered on the
    scene's ground-truth z-depth over the stage's hypothesis grid,
    mixed with a uniform floor, exactly the kind of signal a trained
    CasMVSNet emits (peaked prob_volume + background mass). This is
    what lets the GCE regularizer (reference loss.py:53-67) train with
    its confidence gate OPEN at production scale.

    c2w/K: camera in the normalized (unit-sphere) frame, K scaled to
      `res` (H, W) — the cost-volume stage resolution.
    depth_values: (D,) metric hypothesis depths (the MVS dataset's).
      When `inverse_depth`, the grid is re-spaced uniform in 1/z
      between its endpoints (the stage-0 unbounded-scene variant,
      reference CasMVSNet.py:538-577), matching cost_mapping's slab
      normalization.
    depth_noise: optional per-pixel metric jitter of the bump center
      (simulates MVS estimation error).

    Returns (prob (D, H, W) float32 normalized over D,
             hyp (D,) metric hypothesis grid actually used).
    """
    H, W = res
    dvals = np.asarray(depth_values, np.float64)
    if inverse_depth:
        dvals = 1.0 / np.linspace(1.0 / dvals[0], 1.0 / dvals[-1],
                                  len(dvals))
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    x_lift = (xs - K[0, 2]) / K[0, 0]
    y_lift = (ys - K[1, 2]) / K[1, 1]
    dirs_cam = np.stack([x_lift, y_lift, np.ones_like(x_lift)], axis=-1)
    dirs = dirs_cam @ c2w[:3, :3].T
    dirs_u = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.broadcast_to(c2w[:3, 3], dirs.shape)
    t = ray_sphere_depth(origins.reshape(-1, 3), dirs_u.reshape(-1, 3),
                         sphere_radius).reshape(H, W)
    hit = np.isfinite(t)
    unit_z = (dirs_cam / np.linalg.norm(dirs_cam, axis=-1,
                                        keepdims=True))[..., 2]
    z = np.where(hit, t * unit_z, 0.0) * scale_factor     # metric z-depth
    if depth_noise > 0.0:
        rng = rng if rng is not None else np.random.default_rng(0)
        z = z + rng.normal(0.0, depth_noise, size=z.shape)
    sigma = sigma_intervals * max(float(np.median(np.abs(np.diff(dvals)))),
                                  1e-6)
    gauss = np.exp(-0.5 * ((dvals[:, None, None] - z[None]) / sigma) ** 2)
    gauss = np.where(hit[None], gauss, 1.0)               # miss -> flat
    gauss = gauss / np.clip(gauss.sum(axis=0, keepdims=True), 1e-12, None)
    prob = (1.0 - floor) * gauss + floor / len(dvals)
    return prob.astype(np.float32), dvals.astype(np.float32)


def sphere_radial_error(c2w: np.ndarray, K: np.ndarray, res,
                        depth_metric: np.ndarray, scale_factor: float,
                        sphere_radius: float = 0.8):
    """Geometry error of a rendered z-depth map against the analytic
    sphere: back-project each GT-hit pixel to a 3D point in the unit
    frame and measure | ||p|| - r |, returned in METRIC units (the
    fixture's DTU-like mm frame) as (mean, median, n_pixels).

    This is the synthetic stand-in for the DTU Chamfer protocol
    (reference evals/eval_dtu.py:140-166): every back-projected point's
    distance to the GT surface is exactly its radial offset.
    """
    H, W = res
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    x_lift = (xs - K[0, 2]) / K[0, 0]
    y_lift = (ys - K[1, 2]) / K[1, 1]
    dirs_cam = np.stack([x_lift, y_lift, np.ones_like(x_lift)], axis=-1)
    dirs = dirs_cam @ c2w[:3, :3].T
    dirs_u = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.broadcast_to(c2w[:3, 3], dirs.shape)
    t_gt = ray_sphere_depth(origins.reshape(-1, 3),
                            dirs_u.reshape(-1, 3),
                            sphere_radius).reshape(H, W)
    hit = np.isfinite(t_gt)
    unit_z = (dirs_cam / np.linalg.norm(dirs_cam, axis=-1,
                                        keepdims=True))[..., 2]
    t_pred = (np.asarray(depth_metric) / scale_factor) / unit_z
    pts = origins + t_pred[..., None] * dirs_u
    radial = np.abs(np.linalg.norm(pts, axis=-1) - sphere_radius)
    err = radial[hit] * scale_factor
    return float(err.mean()), float(np.median(err)), int(hit.sum())


def sample_rays(scene: SyntheticScene, rng: np.random.Generator,
                view_idx: int, n_rays: int):
    """Random pixel batch from one view: (uv, rgb) like the reference's
    change_sampling_idx pixel subset (scene_dataset.py:248-251)."""
    H, W = scene.img_res
    idx = rng.integers(0, H * W, size=n_rays)
    ys, xs = np.divmod(idx, W)
    uv = np.stack([xs, ys], axis=-1).astype(np.float32)
    rgb = scene.images[view_idx].reshape(-1, 3)[idx]
    return uv, rgb
