"""cost_mapping — resample MVS probability volumes along VolSDF rays.

The core S-VolSDF coupling (/root/reference/volsdf/vsdf.py:382-452):
every ray sample is projected into every training view, its depth is
normalized into that view's MVS hypothesis slab, and the probability
volume is trilinearly sampled. Same-view probability (`pi`) and
other-view sum (`pj`) feed the GCE loss.

TPU design: the per-view Python loop becomes a `vmap` over a stacked
(V, ...) volume pytree; the same-view test (traced in the reference via
`ts[0] == id_k`) becomes a static-shape one-hot blend so the step stays
a single compiled program for any batch view.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from s_volsdf_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d


@struct.dataclass
class MVSVolumes:
    """Per-training-view MVS outputs, stacked over views (V = num_views).

    Built by the runner from cascade outputs (vsdf.py:369-380):
    prob: (V, D, Hc, Wc) softmax probability volumes.
    z_slab: (V, 2, Hc, Wc) near/far depth-hypothesis planes, already
      divided by scale_factor and near clamped to the bounding sphere.
    intrinsics: (V, 4, 4); c2w: (V, 4, 4) — VolSDF-resolution cameras.
    img_res: (H, W) static ints of the VolSDF image grid.
    inverse_depth: static bool — stage-0 inverse-depth slab
      normalization for unbounded scenes (vsdf.py:426-428).
    """
    prob: jnp.ndarray
    z_slab: jnp.ndarray
    intrinsics: jnp.ndarray
    c2w: jnp.ndarray
    img_res: Tuple[int, int] = struct.field(pytree_node=False)
    inverse_depth: bool = struct.field(pytree_node=False)


def _project_one_view(xyz, K, c2w, img_res):
    """World points -> normalized (x, y) grid coords + camera z
    (vsdf.py:405-415). xyz: (R, S, 3)."""
    H, W = img_res
    p = xyz - c2w[:3, 3]
    p = p @ c2w[:3, :3]  # camera coords (R, S, 3)
    z = p[..., 2]
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    sk = K[0, 1]
    xz = p[..., 0] / z
    yz = p[..., 1] / z
    v_pix = yz * fy + cy
    u_pix = xz * fx + cx + (v_pix - cy) * sk / fy
    # align_corners=True normalization (vsdf.py:414-415).
    u = u_pix / ((W - 1) / 2.0) - 1.0
    v = v_pix / ((H - 1) / 2.0) - 1.0
    return u, v, z


def _sample_one_view(xyz, prob, z_slab, K, c2w, img_res,
                     inverse_depth: bool):
    """cost_j + validity for a single view (vsdf.py:395-448)."""
    u, v, z = _project_one_view(xyz, K, c2w, img_res)

    bound_hw = 1.001
    invalid = ((z < 1e-5) | (u > bound_hw) | (u < -bound_hw)
               | (v > bound_hw) | (v < -bound_hw))
    u = jnp.where(invalid, -99.0, u)
    v = jnp.where(invalid, -99.0, v)

    # Bilinear-sample the per-pixel near/far hypothesis planes.
    uv = jnp.stack([u, v], axis=-1)
    near_far = grid_sample_2d(
        jnp.moveaxis(z_slab, 0, -1), uv, align_corners=True)  # (R, S, 2)
    near_j, far_j = near_far[..., 0], near_far[..., 1]

    if inverse_depth:
        far_safe = jnp.where(invalid, 1e-8, far_j)
        zg = 2.0 * (1.0 - near_j / z) / (1.0 - near_j / far_safe) - 1.0
    else:
        zg = 2.0 * (z - near_j) / (far_j - near_j) - 1.0

    bound_z = 1.01
    invalid = ((near_j < 1e-5) | (far_j < 1e-5)
               | (zg > bound_z) | (zg < -bound_z) | invalid)
    u = jnp.where(invalid, -99.0, u)
    v = jnp.where(invalid, -99.0, v)
    zg = jnp.where(invalid, -99.0, zg)

    cost = grid_sample_3d(prob, jnp.stack([u, v, zg], axis=-1),
                          align_corners=True)  # (R, S)
    return cost, ~invalid


def cost_mapping(z_vals, xyz, view_onehot, mvs: MVSVolumes):
    """Project all ray samples into all views and sample probabilities.

    Args:
      z_vals: (R, S) per-sample z-depths (only used for shape/dtype).
      xyz: (R, S, 3) world sample points (already stop-gradient'd; the
        reference runs this under no_grad, vsdf.py:382).
      view_onehot: (V,) float — 1.0 at this batch's training view.
      mvs: stacked volumes.

    Returns:
      (pj, pi, valid): other-view cost sum, same-view cost (masked to
      rays seen by >= 1 other view), and the validity mask — matching
      vsdf.py:443-452.
    """
    sample_fn = lambda prob, z_slab, K, c2w: _sample_one_view(
        xyz, prob, z_slab, K, c2w, mvs.img_res, mvs.inverse_depth)
    costs, valids = jax.vmap(sample_fn)(
        mvs.prob, mvs.z_slab, mvs.intrinsics, mvs.c2w)  # (V, R, S)

    w_same = view_onehot[:, None, None]
    pi = jnp.sum(w_same * costs, axis=0)
    pj = jnp.sum((1.0 - w_same) * costs, axis=0)
    valid = jnp.any((view_onehot[:, None, None] == 0.0) & valids, axis=0)
    pi = jnp.where(valid, pi, 0.0)
    del z_vals
    return pj, pi, valid
