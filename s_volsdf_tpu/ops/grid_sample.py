"""Gather-based bilinear/trilinear sampling with torch `grid_sample`
semantics (align_corners + zeros padding).

The reference leans on torch's CUDA grid_sample in two places with
DIFFERENT conventions (SURVEY.md hard-part #5):
  * 2D bilinear, align_corners=False — MVS homography warp
    (/root/reference/models/CasMVSNet.py:311)
  * 2D bilinear + 3D trilinear, align_corners=True — cost_mapping
    (/root/reference/volsdf/vsdf.py:424-440) and TransMVSNet's warp
    (/root/reference/models/module.py:321).

Here both are explicit gathers, which XLA lowers to TPU-friendly
dynamic-gathers; a fused Pallas path can replace the hot 3D case.
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord, size: int, align_corners: bool):
    """Map [-1, 1] to pixel index space (torch grid_sampler semantics)."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _gather_2d(img, ix, iy):
    """img: (H, W, C); ix/iy: int arrays (...,). Zero padding outside."""
    H, W = img.shape[0], img.shape[1]
    valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    ixc = jnp.clip(ix, 0, W - 1)
    iyc = jnp.clip(iy, 0, H - 1)
    vals = img[iyc, ixc]  # (..., C)
    return vals * valid[..., None]


def grid_sample_2d(img, coords, align_corners: bool = True):
    """Bilinear sample.

    img: (H, W, C); coords: (..., 2) normalized (x, y) in [-1, 1].
    Returns (..., C). Matches torch grid_sample(mode=bilinear,
    padding_mode=zeros).
    """
    H, W = img.shape[0], img.shape[1]
    x = _unnormalize(coords[..., 0], W, align_corners)
    y = _unnormalize(coords[..., 1], H, align_corners)

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx = x - x0
    wy = y - y0

    v00 = _gather_2d(img, x0, y0)
    v01 = _gather_2d(img, x1, y0)
    v10 = _gather_2d(img, x0, y1)
    v11 = _gather_2d(img, x1, y1)

    wx = wx[..., None]
    wy = wy[..., None]
    return ((v00 * (1 - wx) + v01 * wx) * (1 - wy)
            + (v10 * (1 - wx) + v11 * wx) * wy)


def _gather_3d(vol, ix, iy, iz):
    """vol: (D, H, W); zero padding outside."""
    D, H, W = vol.shape
    valid = ((ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
             & (iz >= 0) & (iz < D))
    ixc = jnp.clip(ix, 0, W - 1)
    iyc = jnp.clip(iy, 0, H - 1)
    izc = jnp.clip(iz, 0, D - 1)
    return vol[izc, iyc, ixc] * valid


def grid_sample_3d(vol, coords, align_corners: bool = True):
    """Trilinear sample.

    vol: (D, H, W); coords: (..., 3) normalized (x, y, z) where x->W,
    y->H, z->D (torch 3D grid_sample convention, vsdf.py:437-440).
    Returns (...,).
    """
    D, H, W = vol.shape
    x = _unnormalize(coords[..., 0], W, align_corners)
    y = _unnormalize(coords[..., 1], H, align_corners)
    z = _unnormalize(coords[..., 2], D, align_corners)

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    x1, y1, z1 = x0 + 1, y0 + 1, z0 + 1
    wx, wy, wz = x - x0, y - y0, z - z0

    c000 = _gather_3d(vol, x0, y0, z0)
    c001 = _gather_3d(vol, x1, y0, z0)
    c010 = _gather_3d(vol, x0, y1, z0)
    c011 = _gather_3d(vol, x1, y1, z0)
    c100 = _gather_3d(vol, x0, y0, z1)
    c101 = _gather_3d(vol, x1, y0, z1)
    c110 = _gather_3d(vol, x0, y1, z1)
    c111 = _gather_3d(vol, x1, y1, z1)

    c00 = c000 * (1 - wx) + c001 * wx
    c01 = c010 * (1 - wx) + c011 * wx
    c10 = c100 * (1 - wx) + c101 * wx
    c11 = c110 * (1 - wx) + c111 * wx
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wz) + c1 * wz
