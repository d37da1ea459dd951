"""cost_mapping — resample MVS probability volumes along VolSDF rays.

The core S-VolSDF coupling (/root/reference/volsdf/vsdf.py:382-452):
every ray sample is projected into every training view, its depth is
normalized into that view's MVS hypothesis slab, and the probability
volume is trilinearly sampled. Same-view probability (`pi`) and
other-view sum (`pj`) feed the GCE loss.

TPU design (measured on v5e):
  * The per-view Python loop becomes a `vmap` over a stacked (V, ...)
    volume pytree; the same-view test (traced in the reference via
    `ts[0] == id_k`) becomes a static-shape one-hot blend so the step
    stays a single compiled program for any batch view.
  * The gathers are the hot path (latency-bound, not bandwidth-bound).
    The volume is pre-packed as (H, W, 2, D+2): depth row-major in the
    minor dim, the y+1 row DUPLICATED next to y, and the per-pixel
    near/far hypothesis planes appended to every row. All four bilinear
    corners plus near/far then arrive in ONE contiguous ~1.5-3 KB
    gather per sample — replacing 4 volume row-gathers + 4 tiny 8-byte
    slab gathers (the reference needs two separate grid_sample calls,
    vsdf.py:424, 440). 18.5 -> 12.0 ms (f32) / 9.8 ms (bf16) for the
    production 3x(512x98) sample load.
  * Optional bf16 packing halves gather bytes; near/far keep full f32
    accuracy via a hi/lo split (bf16(x) + bf16(x - bf16(x))) that
    commutes with the bilinear lerp.
  * The z-lerp is a banded one-hot reduction along D on the VPU — no
    gather depends on z, which is what makes the near/far fusion legal.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax
from flax import struct

from s_volsdf_tpu.ops.grid_sample import _unnormalize


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


@struct.dataclass
class PackedVolumes:
    """Gather-optimized layout (see module docstring).

    vol: (V, Hc, Wc, 2, D + 2) — [y / y+1 dup, prob row + near, far];
      with hi_lo (bf16) the tail is 4 wide: near_hi/near_lo/far_hi/
      far_lo. The y+1 slot of the last row is zeros (zero padding).
    """
    vol: jnp.ndarray
    intrinsics: jnp.ndarray
    c2w: jnp.ndarray
    img_res: Tuple[int, int] = struct.field(pytree_node=False)
    inverse_depth: bool = struct.field(pytree_node=False)
    n_depth: int = struct.field(pytree_node=False)
    hi_lo: bool = struct.field(pytree_node=False)


def pack_volumes(mvs: MVSVolumes, dtype=jnp.float32) -> PackedVolumes:
    """Build the packed gather layout. Costs ~2x the volume's HBM, so
    hoist it out of the per-step loop (once per chunk/stage)."""
    hi_lo = dtype == jnp.bfloat16

    def one(prob, z_slab):
        row = jnp.transpose(prob, (1, 2, 0))           # (H, W, D)
        nf = jnp.moveaxis(z_slab, 0, -1)               # (H, W, 2)
        if hi_lo:
            row = row.astype(dtype)
            hi = nf.astype(dtype)
            lo = (nf - hi.astype(nf.dtype)).astype(dtype)
            tail = jnp.stack([hi[..., 0], lo[..., 0],
                              hi[..., 1], lo[..., 1]], axis=-1)
        else:
            tail = nf.astype(dtype)
        base = jnp.concatenate([row, tail], axis=-1)   # (H, W, D+t)
        nxt = jnp.concatenate([base[1:], jnp.zeros_like(base[:1])], 0)
        return jnp.stack([base, nxt], axis=2)          # (H, W, 2, D+t)

    vol = jax.vmap(one)(mvs.prob, mvs.z_slab)
    return PackedVolumes(
        vol=vol, intrinsics=mvs.intrinsics, c2w=mvs.c2w,
        img_res=mvs.img_res, inverse_depth=mvs.inverse_depth,
        n_depth=int(mvs.prob.shape[1]), hi_lo=hi_lo)


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


def _sample_one_view(xyz, vol, img_res, n_depth: int, hi_lo: bool,
                     inverse_depth: bool, K, c2w):
    """cost_j + validity for a single view (vsdf.py:395-448) via one
    block-gather per sample. vol: (Hc, Wc, 2, D+t)."""
    Hv, Wv = vol.shape[0], vol.shape[1]
    Dv = n_depth
    u, v, z = _project_one_view(xyz, K, c2w, img_res)

    bound_hw = 1.001
    invalid = ((z < 1e-5) | (u > bound_hw) | (u < -bound_hw)
               | (v > bound_hw) | (v < -bound_hw))
    u = jnp.where(invalid, -99.0, u)
    v = jnp.where(invalid, -99.0, v)

    shape = u.shape
    uf, vf, zf = u.reshape(-1), v.reshape(-1), z.reshape(-1)
    x = _unnormalize(uf, Wv, True)
    y = _unnormalize(vf, Hv, True)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    # Clamped block starts; the true corner offsets are recovered from
    # the shifts sx/sy below (weight permutation, zero for corners that
    # fall outside the fetched block == out-of-bounds zero padding).
    xs = jnp.clip(x0, 0, Wv - 2)
    ys = jnp.clip(y0, 0, Hv - 1)   # row Hv-1's y+1 slot is a zero row
    sx = x0 - xs
    sy = y0 - ys
    wx = x - x0
    wy = y - y0

    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
        start_index_map=(0, 1))
    blk = lax.gather(vol, jnp.stack([ys, xs], -1), dnums,
                     slice_sizes=(1, 2, 2, vol.shape[-1]),
                     mode=lax.GatherScatterMode.CLIP)  # (N, 2x, 2y, D+t)

    def wgt(i, w):
        return jnp.where(i == 0, 1.0 - w, jnp.where(i == 1, w, 0.0))

    r = 0.0
    for bx in (0, 1):
        for by in (0, 1):
            w = wgt(bx - sx, wx) * wgt(by - sy, wy)   # f32
            r = r + blk[:, bx, by] * w[:, None]        # promotes to f32

    if hi_lo:
        near_j = r[:, Dv] + r[:, Dv + 1]
        far_j = r[:, Dv + 2] + r[:, Dv + 3]
    else:
        near_j, far_j = r[:, Dv], r[:, Dv + 1]

    if inverse_depth:
        far_safe = jnp.where(far_j < 1e-5, 1e-8, far_j)
        zg = 2.0 * (1.0 - near_j / zf) / (1.0 - near_j / far_safe) - 1.0
    else:
        zg = 2.0 * (zf - near_j) / (far_j - near_j) - 1.0

    bound_z = 1.01
    invalid_f = ((near_j < 1e-5) | (far_j < 1e-5)
                 | (zg > bound_z) | (zg < -bound_z) | invalid.reshape(-1))
    zn = _unnormalize(jnp.where(invalid_f, -99.0, zg), Dv, True)

    # z-lerp as a banded weight reduction (no gather). Out-of-range z
    # contributes only its in-range neighbor (zeros padding); fully-
    # outside samples get zero weight everywhere.
    iota = jnp.arange(Dv, dtype=zn.dtype)[None, :]
    z0f = jnp.floor(zn)[:, None]
    wz = zn[:, None] - z0f
    band = (jnp.where(iota == z0f, 1.0 - wz, 0.0)
            + jnp.where(iota == z0f + 1.0, wz, 0.0))
    cost = jnp.sum(r[:, :Dv] * band, axis=1)
    return cost.reshape(shape), ~invalid_f.reshape(shape)


def cost_mapping(z_vals, xyz, view_onehot,
                 mvs: Union[MVSVolumes, PackedVolumes]):
    """Project all ray samples into all views and sample probabilities.

    Args:
      z_vals: (R, S) per-sample z-depths (only used for shape/dtype).
      xyz: (R, S, 3) world sample points (already stop-gradient'd; the
        reference runs this under no_grad, vsdf.py:382).
      view_onehot: (V,) float — 1.0 at this batch's training view.
      mvs: stacked volumes — MVSVolumes (packed on the fly) or
        PackedVolumes (pre-packed; pass this from chunked loops so the
        pack is hoisted out of the step).

    Returns:
      (pj, pi, valid): other-view cost sum, same-view cost (masked to
      rays seen by >= 1 other view), and the validity mask — matching
      vsdf.py:443-452.
    """
    packed = mvs if isinstance(mvs, PackedVolumes) else pack_volumes(mvs)
    sample_fn = lambda vol, K, c2w: _sample_one_view(
        xyz, vol, packed.img_res, packed.n_depth, packed.hi_lo,
        packed.inverse_depth, K, c2w)
    costs, valids = jax.vmap(sample_fn)(
        packed.vol, packed.intrinsics, packed.c2w)  # (V, R, S)

    w_same = view_onehot[:, None, None]
    pi = jnp.sum(w_same * costs, axis=0)
    pj = jnp.sum((1.0 - w_same) * costs, axis=0)
    valid = jnp.any((view_onehot[:, None, None] == 0.0) & valids, axis=0)
    pi = jnp.where(valid, pi, 0.0)
    del z_vals
    return pj, pi, valid
