"""cost_mapping — resample MVS probability volumes along VolSDF rays.

The core S-VolSDF coupling (/root/reference/volsdf/vsdf.py:382-452):
every ray sample is projected into every training view, its depth is
normalized into that view's MVS hypothesis slab, and the probability
volume is trilinearly sampled. Same-view probability (`pi`) and
other-view sum (`pj`) feed the GCE loss.

TPU design (measured on v5e; several dead ends are documented because
they are non-obvious):
  * The per-view Python loop becomes a `vmap` over a stacked (V, ...)
    volume pytree; the same-view test (traced in the reference via
    `ts[0] == id_k`) becomes a static-shape one-hot blend so the step
    stays a single compiled program for any batch view.
  * The gathers are the hot path. Fetching whole depth rows per
    bilinear corner (the "contiguous rows" layout) is BANDWIDTH-bound:
    it materializes V*R*S*(2*2*D) values per step — ~0.5 GB of traffic
    for the production 3x(512x98) load, ~6.5 ms/step, even though the
    trilinear sample only needs 8 of the 2*2*D fetched values.
  * Instead, every (y, x, z) cell's full 2x2x2 TRILINEAR CORNER CUBE
    is precomputed into an 8-wide row (corner-shifted, zero-padded
    copies of the volume), and likewise the 2x2 bilinear corners of
    the near/far planes into an 8-wide row per (y, x). A ray sample
    then costs exactly TWO embedding-style row lookups:
      1. nf8[(y*W + x)]        -> 8 f32  (4 corners x near/far)
      2. vol8[((y*W + x)*D+z)] -> 8 vals (the corner cube; z comes
                                  from step 1's slab normalization —
                                  mirroring the reference's two
                                  grid_sample calls, vsdf.py:424, 440)
    ~7 MB of traffic per step instead of ~0.5 GB. The 8x volume copy
    costs ~1 GB HBM at DTU production shapes (D=192, 288x384, bf16) —
    cheap next to the bandwidth it saves; pack once per stage.
  * Both lookups are `jnp.take` of rows from a 2D (M, 8) operand —
    the embedding-lookup pattern — with the VIEW AXIS FOLDED INTO the
    row index so all V views ride one flat take (a vmapped take
    becomes a batched-operand gather, measured ~0.4 ms/step slower at
    production shapes). This is load-bearing: slice-style
    `lax.gather` formulations (a (1,2,2,194) block of a 5D operand, a
    (1,4,2) z-indexed slice of 3D, an (8,) slice of flat 1D) either
    forced a pathological 64x-padded operand relayout (a 243 MB volume
    literally compiled to 15 GB of HBM) or MISCOMPILED outright — the
    TPU worker dies with a kernel fault once the surrounding while
    loop's trip count reaches ~100+ and the loop scheduler switches
    strategies. Per-element flat takes compile fine but are
    transaction-bound (~4x slower than the row form).
  * Out-of-volume semantics: lookup indices are clamped, corner
    weights are computed from the UNCLAMPED floor index, and any
    corner whose weight slot does not match its true offset gets
    weight 0 — together with the zero padding of the shifted copies
    this reproduces grid_sample's zeros padding exactly.
  * Optional bf16 volume packing halves gather bytes; the near/far
    planes stay exact f32 (they decide validity).
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
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
    """Corner-cube lookup layout (see module docstring).

    vol8: (V, Hc*Wc*D, 8) — row (y*Wc + x)*D + z holds the volume at
      (y+by, x+bx, z+bz) for corner slot (by*2 + bx)*2 + bz, zero-
      padded past each edge.
    nf8: (V, Hc*Wc, 8) f32 — row y*Wc + x holds [near, far] at
      (y+by, x+bx) for slot (by*2 + bx)*2 + {0,1}.
    """
    vol8: jnp.ndarray
    nf8: jnp.ndarray
    intrinsics: jnp.ndarray
    c2w: jnp.ndarray
    img_res: Tuple[int, int] = struct.field(pytree_node=False)
    inverse_depth: bool = struct.field(pytree_node=False)
    n_depth: int = struct.field(pytree_node=False)
    vol_res: Tuple[int, int] = struct.field(pytree_node=False)  # (Hc, Wc)


def _shift2(a: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """a[y+dy, x+dx] with zero padding past the edges (leading 2 dims)."""
    if dy:
        a = jnp.concatenate([a[dy:], jnp.zeros_like(a[:dy])], axis=0)
    if dx:
        a = jnp.concatenate([a[:, dx:], jnp.zeros_like(a[:, :dx])], axis=1)
    return a


def pack_volumes(mvs: MVSVolumes, dtype=jnp.float32) -> PackedVolumes:
    """Build the corner-cube lookup layout. Costs 8x the volume's HBM
    (use bf16), so hoist the pack out of the per-step loop (once per
    chunk/stage)."""

    def one(prob, z_slab):
        base = jnp.transpose(prob, (1, 2, 0)).astype(dtype)   # (H, W, D)
        nf = jnp.moveaxis(z_slab, 0, -1).astype(jnp.float32)  # (H, W, 2)
        vols, nfs = [], []
        for by in (0, 1):
            for bx in (0, 1):
                v = _shift2(base, by, bx)
                # z+1 shifted copy, zero past the last hypothesis.
                v1 = jnp.concatenate(
                    [v[..., 1:], jnp.zeros_like(v[..., :1])], axis=-1)
                vols.extend([v, v1])
                nfs.append(_shift2(nf, by, bx))
        vol8 = jnp.stack(vols, axis=-1)          # (H, W, D, 8)
        nf8 = jnp.concatenate(nfs, axis=-1)      # (H, W, 8)
        return vol8.reshape(-1, 8), nf8.reshape(-1, 8)

    vol8, nf8 = jax.vmap(one)(mvs.prob, mvs.z_slab)
    return PackedVolumes(
        vol8=vol8, nf8=nf8, intrinsics=mvs.intrinsics, c2w=mvs.c2w,
        img_res=mvs.img_res, inverse_depth=mvs.inverse_depth,
        n_depth=int(mvs.prob.shape[1]),
        vol_res=(int(mvs.prob.shape[2]), int(mvs.prob.shape[3])))


def _corner_wgt(i, w):
    """Linear-interp weight for corner slot offset `i` relative to the
    true floor corner: 1-w at 0, w at 1, 0 for any out-of-slot shift
    (== zeros padding for clamped-away corners)."""
    return jnp.where(i == 0, 1.0 - w, jnp.where(i == 1, w, 0.0))


def _sample_all_views(xyz, packed: PackedVolumes):
    """All-view cost + validity with the view axis FOLDED INTO the row
    index, so the whole step issues exactly TWO flat `jnp.take` calls
    on 2D (V*M, 8) operands instead of V vmapped (batched-operand)
    gathers. Per-view math broadcasts over a leading V axis
    (vsdf.py:395-448)."""
    Dv = packed.n_depth
    Hv, Wv = packed.vol_res
    H, W = packed.img_res
    K, c2w = packed.intrinsics, packed.c2w
    V = K.shape[0]

    p = xyz[None] - c2w[:, None, None, :3, 3]          # (V, R, S, 3)
    p = jnp.einsum("vrsk,vkj->vrsj", p, c2w[:, :3, :3])
    z = p[..., 2]
    fx = K[:, 0, 0][:, None, None]
    fy = K[:, 1, 1][:, None, None]
    cx = K[:, 0, 2][:, None, None]
    cy = K[:, 1, 2][:, None, None]
    sk = K[:, 0, 1][:, None, None]
    xz = p[..., 0] / z
    yz = p[..., 1] / z
    v_pix = yz * fy + cy
    u_pix = xz * fx + cx + (v_pix - cy) * sk / fy
    u = u_pix / ((W - 1) / 2.0) - 1.0
    v = v_pix / ((H - 1) / 2.0) - 1.0

    bound_hw = 1.001
    invalid = ((z < 1e-5) | (u > bound_hw) | (u < -bound_hw)
               | (v > bound_hw) | (v < -bound_hw))
    u = jnp.where(invalid, -99.0, u)
    v = jnp.where(invalid, -99.0, v)

    shape = u.shape                                   # (V, R, S)
    uf = u.reshape(V, -1)
    vf = v.reshape(V, -1)
    zf = z.reshape(V, -1)
    x = _unnormalize(uf, Wv, True)
    y = _unnormalize(vf, Hv, True)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    xs = jnp.clip(x0, 0, Wv - 1)
    ys = jnp.clip(y0, 0, Hv - 1)
    sx = x0 - xs
    sy = y0 - ys
    wx = x - x0
    wy = y - y0

    pix_idx = ys * Wv + xs                            # (V, N)
    offs = (jnp.arange(V, dtype=jnp.int32) * (Hv * Wv))[:, None]
    blk_nf = jnp.take(packed.nf8.reshape(V * Hv * Wv, 8),
                      (pix_idx + offs).reshape(-1), axis=0)
    blk_nf = blk_nf.reshape(V, -1, 2, 2, 2)           # (V, N, by, bx, nf)

    nfv = 0.0
    for by in (0, 1):
        for bx in (0, 1):
            w = _corner_wgt(by - sy, wy) * _corner_wgt(bx - sx, wx)
            nfv = nfv + blk_nf[:, :, by, bx] * w[..., None]
    near_j, far_j = nfv[..., 0], nfv[..., 1]

    if packed.inverse_depth:
        far_safe = jnp.where(far_j < 1e-5, 1e-8, far_j)
        zg = 2.0 * (1.0 - near_j / zf) / (1.0 - near_j / far_safe) - 1.0
    else:
        zg = 2.0 * (zf - near_j) / (far_j - near_j) - 1.0

    bound_z = 1.01
    invalid_f = ((near_j < 1e-5) | (far_j < 1e-5)
                 | (zg > bound_z) | (zg < -bound_z)
                 | invalid.reshape(V, -1))
    zn = _unnormalize(jnp.where(invalid_f, -99.0, zg), Dv, True)
    z0f = jnp.floor(zn)
    z0 = z0f.astype(jnp.int32)
    zs = jnp.clip(z0, 0, Dv - 1)
    sz = z0 - zs
    wz = zn - z0f

    voffs = (jnp.arange(V, dtype=jnp.int32) * (Hv * Wv * Dv))[:, None]
    blk = jnp.take(packed.vol8.reshape(V * Hv * Wv * Dv, 8),
                   (pix_idx * Dv + zs + voffs).reshape(-1), axis=0)
    blk = blk.reshape(V, -1, 2, 2, 2)                 # (V, N, by, bx, bz)

    cost = 0.0
    for by in (0, 1):
        for bx in (0, 1):
            wxy = _corner_wgt(by - sy, wy) * _corner_wgt(bx - sx, wx)
            for bz in (0, 1):
                w = wxy * _corner_wgt(bz - sz, wz)
                cost = cost + blk[:, :, by, bx, bz] * w
    return cost.reshape(shape), ~invalid_f.reshape(shape)


def prior_depth_anchor(uv, view_onehot, packed: PackedVolumes):
    """Per-ray prior WTA depth + peak from the ray's OWN view volume.

    Gate-rescue support (loss.gate_rescue, a TPU-build extra — off by
    default): when a training collapse drives every ray sample out of
    the hypothesis slab, pi*pj == 0 exactly and the GCE loss loses all
    gradient (the reference gate, loss.py:61-67, can never re-open).
    The anchor is a recovery target that does NOT depend on the current
    sample positions: the prior's winner-take-all depth at the ray's
    own pixel (reference module.py:475-479 depth_wta semantics) plus
    its peak probability, so uninformative pixels can be masked out.

    uv: (R, 2) pixel coords in the VolSDF (H, W) grid.
    view_onehot: (V,) float, 1.0 at this batch's training view.
    Returns (anchor (R,), peak (R,)) f32 — anchor in the slab's
    z-depth (scale-normalized) units; peak is 0 where the pixel's
    near/far planes are degenerate.
    """
    Dv = packed.n_depth
    Hv, Wv = packed.vol_res
    H, W = packed.img_res
    view_idx = jnp.argmax(view_onehot).astype(jnp.int32)

    x = uv[:, 0] * ((Wv - 1) / (W - 1))      # align_corners=True rescale
    y = uv[:, 1] * ((Hv - 1) / (H - 1))
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    xs = jnp.clip(x0, 0, Wv - 1)
    ys = jnp.clip(y0, 0, Hv - 1)
    sx = x0 - xs
    sy = y0 - ys
    wx = x - x0
    wy = y - y0
    pix_idx = ys * Wv + xs                               # (R,)

    # Bilinear near/far at the pixel (same slot layout as the sampler).
    blk_nf = jnp.take(packed.nf8.reshape(-1, 8),
                      pix_idx + view_idx * (Hv * Wv), axis=0)
    blk_nf = blk_nf.reshape(-1, 2, 2, 2)                 # (R, by, bx, nf)
    nfv = 0.0
    for by in (0, 1):
        for bx in (0, 1):
            w = _corner_wgt(by - sy, wy) * _corner_wgt(bx - sx, wx)
            nfv = nfv + blk_nf[:, by, bx] * w[..., None]
    near, far = nfv[..., 0], nfv[..., 1]

    # Bilinear D-profile: rows pix*D + z of the own view's vol8; the
    # bz=0 slots ((by*2+bx)*2) are the unshifted-z corner values.
    zrange = jnp.arange(Dv, dtype=jnp.int32)
    rows = (pix_idx[:, None] * Dv + zrange[None, :]
            + view_idx * (Hv * Wv * Dv))                 # (R, D)
    blk = jnp.take(packed.vol8.reshape(-1, 8), rows.reshape(-1), axis=0)
    blk = blk.reshape(-1, Dv, 8).astype(jnp.float32)     # (R, D, 8)
    prof = 0.0
    for by in (0, 1):
        for bx in (0, 1):
            w = _corner_wgt(by - sy, wy) * _corner_wgt(bx - sx, wx)
            prof = prof + blk[:, :, (by * 2 + bx) * 2] * w[:, None]

    # Per-pixel hypothesis grid between near/far (linear, or uniform in
    # 1/z for the stage-0 unbounded variant — matching cost_mapping's
    # slab normalization, vsdf.py:426-432).
    frac = zrange.astype(jnp.float32) / max(Dv - 1, 1)
    if packed.inverse_depth:
        near_s = jnp.where(near < 1e-5, 1e-8, near)
        far_s = jnp.where(far < 1e-5, 1e-8, far)
        inv = (1.0 / near_s)[:, None] + frac[None, :] * (
            1.0 / far_s - 1.0 / near_s)[:, None]
        zgrid = 1.0 / inv
    else:
        zgrid = near[:, None] + frac[None, :] * (far - near)[:, None]

    dstar = jnp.argmax(prof, axis=1)
    anchor = jnp.take_along_axis(zgrid, dstar[:, None], axis=1)[:, 0]
    peak = jnp.max(prof, axis=1)
    valid = (near > 1e-5) & (far > 1e-5)
    return (jnp.where(valid, anchor, 0.0),
            jnp.where(valid, peak, 0.0))


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
    costs, valids = _sample_all_views(xyz, packed)    # (V, R, S)

    w_same = view_onehot[:, None, None]
    pi = jnp.sum(w_same * costs, axis=0)
    pj = jnp.sum((1.0 - w_same) * costs, axis=0)
    valid = jnp.any((view_onehot[:, None, None] == 0.0) & valids, axis=0)
    pi = jnp.where(valid, pi, 0.0)
    del z_vals
    return pj, pi, valid
