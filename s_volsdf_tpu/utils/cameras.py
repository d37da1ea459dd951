"""Camera math: ray generation, projection, pose decomposition.

Parity with /root/reference/volsdf/utils/rend_util.py (get_camera_params,
lift, get_sphere_intersections, load_K_Rt_from_P) but vectorized JAX,
no implicit device placement.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def lift(x, y, z, intrinsics):
    """Back-project pixel coords to camera space (rend_util.py:143-156).

    x, y, z: (..., N); intrinsics: (..., 4, 4) with skew support.
    Returns homogeneous (..., N, 4).
    """
    fx = intrinsics[..., 0, 0:1]
    fy = intrinsics[..., 1, 1:2]
    cx = intrinsics[..., 0, 2:3]
    cy = intrinsics[..., 1, 2:3]
    sk = intrinsics[..., 0, 1:2]

    x_lift = (x - cx + cy * sk / fy - sk * y / fy) / fx * z
    y_lift = (y - cy) / fy * z
    return jnp.stack([x_lift, y_lift, z, jnp.ones_like(z)], axis=-1)


def get_camera_params(uv, pose, intrinsics):
    """Rays from pixels (rend_util.py:60-95).

    uv: (B, N, 2) pixel coords; pose: (B, 4, 4) camera-to-world;
    intrinsics: (B, 4, 4).
    Returns (ray_dirs (B, N, 3) unit-norm world, cam_loc (B, 3)).
    """
    cam_loc = pose[..., :3, 3]
    x_cam = uv[..., 0]
    y_cam = uv[..., 1]
    z_cam = jnp.ones_like(x_cam)

    pts_cam = lift(x_cam, y_cam, z_cam, intrinsics)  # (B, N, 4)
    # world = R @ p_cam + t
    world = jnp.einsum("bij,bnj->bni", pose[..., :3, :3], pts_cam[..., :3])
    world = world + cam_loc[..., None, :]

    ray_dirs = world - cam_loc[..., None, :]
    ray_dirs = ray_dirs / jnp.linalg.norm(ray_dirs, axis=-1, keepdims=True)
    return ray_dirs, cam_loc


def depth_scale_factor(uv, intrinsics):
    """z-component of camera-frame unit ray dirs: converts distance
    along the ray to z-depth (reference network.py:215-217 computes
    this by passing an identity pose)."""
    x_cam = uv[..., 0]
    y_cam = uv[..., 1]
    z_cam = jnp.ones_like(x_cam)
    pts = lift(x_cam, y_cam, z_cam, intrinsics)[..., :3]
    dirs = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    return dirs[..., 2:3]  # (B, N, 1)


def get_sphere_intersections(cam_loc, ray_dirs, r=1.0):
    """Near/far intersections of rays with the bounding sphere
    (rend_util.py:200-216). cam_loc, ray_dirs: (N, 3). Returns (N, 2),
    clamped at 0; caller must ensure rays hit the sphere."""
    ray_cam_dot = jnp.sum(ray_dirs * cam_loc, axis=-1, keepdims=True)
    under_sqrt = ray_cam_dot ** 2 - (
        jnp.sum(cam_loc ** 2, axis=-1, keepdims=True) - r ** 2)
    under_sqrt = jnp.maximum(under_sqrt, 0.0)
    sqrt = jnp.sqrt(under_sqrt)
    both = sqrt * jnp.asarray([-1.0, 1.0]) - ray_cam_dot
    return jnp.maximum(both, 0.0)


def load_K_Rt_from_P(P: np.ndarray):
    """Decompose a 3x4 projection into intrinsics + c2w pose
    (rend_util.py:36-57, via cv2.decomposeProjectionMatrix). Host-side
    numpy; RQ decomposition with positive-diagonal K."""
    import cv2

    out = cv2.decomposeProjectionMatrix(P.astype(np.float64))
    K = out[0]
    R = out[1]
    t = out[2]

    K = K / K[2, 2]
    intrinsics = np.eye(4, dtype=np.float32)
    intrinsics[:3, :3] = K

    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.transpose()
    pose[:3, 3] = (t[:3] / t[3])[:, 0]
    return intrinsics, pose


def psnr(img1, img2):
    """PSNR in the reference's ln-based form (rend_util.py:14-22)."""
    mse = jnp.mean((img1 - img2) ** 2)
    return -10.0 * jnp.log(mse) / jnp.log(10.0)
