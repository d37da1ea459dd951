"""Differentiable homography warping for plane-sweep cost volumes.

Rebuild of /root/reference/models/CasMVSNet.py:280-315 (`homo_warping`,
align_corners=False) and /root/reference/models/module.py:285-324
(TransMVSNet variant: align_corners=True + behind-camera masking).

TPU design: instead of materializing a (B, 3, D, H*W) coordinate tensor
and calling torch grid_sample, the projection is computed closed-form
per (depth, pixel) and the source feature map is sampled with the
shared gather-based bilinear op — one fused XLA program, no host
round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from s_volsdf_tpu.ops.grid_sample import grid_sample_2d_packed, pack_corners

# Byte budget for one packed-gather block's (N, P) output — the peak
# temporary of the warp; depth rows are sub-chunked to respect it.
_BLOCK_BYTES = 512 * 1024 * 1024


def _proj_grid(src_proj, ref_proj, depth_values, height, width):
    """Normalized (x, y) sampling grid + positive-depth mask.

    src_proj/ref_proj: (4, 4) stage projection matrices (K@[R|t]).
    depth_values: (D, H, W) or (D,) hypothesis depths in the ref view.
    Returns grid (D, H, W, 2) in [-1, 1] and z > 0 mask (D, H, W).
    """
    proj = src_proj @ jnp.linalg.inv(ref_proj)
    rot = proj[:3, :3]
    trans = proj[:3, 3]

    y, x = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                        jnp.arange(width, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones_like(x)
    xyz = jnp.stack([x, y, ones], axis=-1)          # (H, W, 3)
    rot_xyz = xyz @ rot.T                            # (H, W, 3)

    if depth_values.ndim == 1:
        depth = depth_values[:, None, None]
    else:
        depth = depth_values                         # (D, H, W)
    proj_xyz = rot_xyz[None] * depth[..., None] + trans  # (D, H, W, 3)
    z = proj_xyz[..., 2]
    xy = proj_xyz[..., :2] / z[..., None]

    gx = xy[..., 0] / ((width - 1) / 2.0) - 1.0
    gy = xy[..., 1] / ((height - 1) / 2.0) - 1.0
    return jnp.stack([gx, gy], axis=-1), z > 1e-6


def homo_warping(src_fea, src_proj, ref_proj, depth_values,
                 align_corners: bool = False,
                 mask_behind: bool = False):
    """Warp source features onto ref-view depth hypothesis planes.

    src_fea: (H, W, C) source features (single view; vmap for batch).
    depth_values: (D,) or (D, H, W).
    Returns (D, H, W, C).

    align_corners=False + no masking = CasMVSNet/UCSNet semantics
    (CasMVSNet.py:311-312); align_corners=True + behind-camera -99
    masking = TransMVSNet semantics (module.py:301-321).
    """
    H, W, C = src_fea.shape
    grid, valid_z = _proj_grid(src_proj, ref_proj, depth_values, H, W)

    if mask_behind:
        grid = jnp.where(valid_z[..., None], grid, -99.0)
    # Packed single-gather sampling: the warp touches D*H*W positions
    # with C-float rows — DMA-count-bound on TPU; the dup-y layout
    # fetches all four corners in one contiguous gather (pack cost is
    # 2x the feature map, amortized over D depth planes). Depth rows
    # are sub-chunked so the (P, 2, 2, C) gather block stays ~450 MB.
    return warp_packed(pack_corners(src_fea), C, grid,
                       align_corners=align_corners)


def warp_packed(packed, n_channels: int, grid, *,
                align_corners: bool = False):
    """Sample a pre-packed (pack_corners) source at a (D, H, W, 2)
    grid, sub-chunking depth rows so the (N, P) gather output stays
    within _BLOCK_BYTES. Pre-pack once per source view when warping
    many depth chunks (variance_volume) so the pack is hoisted out of
    the chunk loop."""
    D, H, W = grid.shape[:3]
    C = n_channels
    P = packed.shape[-1]
    per = max(1, min(D, _BLOCK_BYTES // (P * 4) // max(H * W, 1)))
    while D % per:
        per -= 1
    if per == D:
        return grid_sample_2d_packed(packed, C, grid,
                                     align_corners=align_corners)
    g = grid.reshape(D // per, per, H, W, 2)
    out = jax.lax.map(
        lambda gg: grid_sample_2d_packed(packed, C, gg,
                                         align_corners=align_corners), g)
    return out.reshape(D, H, W, C)
