"""Modulated deformable convolution (DCNv2) as a gather + matmul.

The reference delegates to torchvision's CUDA kernel
(/root/reference/models/dcn.py:71-80: offset/mask conv then
`torchvision.ops.deform_conv2d`). TPU rebuild: for each output pixel
and each of the K=kh*kw taps, bilinearly sample the input at
(base_tap + learned_offset), scale by the sigmoid mask, then contract
the Cin patch axis against that tap's weight rows on the MXU.

Layout: the input is corner-packed ONCE (ops/grid_sample.pack_corners)
so every bilinear sample is a single contiguous 128-lane row take
instead of four C-float gathers — the op is gather-transaction-bound
at TransMVSNet's full-res shapes (nine 1152x1536 DCNs per view), and
the 4x transaction cut is the same lever that carried the plane-sweep
warp (models/mvs/warp.py). Taps run as a lax.scan accumulating
directly into the (H*W, Cout) output, so only ONE tap's gathered rows
(~0.9 GB at stage-3 production shapes) are live at a time instead of a
(H, W, K*Cin) patch tensor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from s_volsdf_tpu.ops.grid_sample import bilinear_packed_pix, pack_corners


def deform_conv2d(x, offset, mask, weight, bias=None, *, kh: int = 3,
                  kw: int = 3, padding: int = 1):
    """Stride-1 modulated deformable conv (the only configuration the
    reference uses: module.py:345-423, all DCNs are k3 s1 p1).

    x:      (H, W, Cin)
    offset: (H, W, 2*K) per-tap (dy, dx) — torchvision layout: the
            first K channels are y-offsets interleaved per tap as
            (y_0, x_0, y_1, x_1, ...) grouped [o1(y), o2(x)] — here we
            take offset[..., 0::2] = dy, offset[..., 1::2] = dx after
            the converter re-packs torch's (o1, o2) chunk layout.
    mask:   (H, W, K) sigmoid modulation.
    weight: (K*Cin, Cout) — tap-major rows (tap k, then channel).
    Returns (H, W, Cout).
    """
    H, W, Cin = x.shape
    K = kh * kw
    Cout = weight.shape[-1]
    flat = pack_corners(x).reshape(H * W, -1)
    ys = jnp.arange(H, dtype=x.dtype)
    xs = jnp.arange(W, dtype=x.dtype)
    base_y, base_x = jnp.meshgrid(ys, xs, indexing="ij")  # (H, W)

    taps = jnp.arange(K, dtype=jnp.int32)
    tap_y = (taps // kw - padding).astype(x.dtype)         # (K,)
    tap_x = (taps % kw - padding).astype(x.dtype)
    dy = jnp.moveaxis(offset[..., 0::2], -1, 0)            # (K, H, W)
    dx = jnp.moveaxis(offset[..., 1::2], -1, 0)
    mk = jnp.moveaxis(mask, -1, 0)                         # (K, H, W)
    w_taps = weight.reshape(K, Cin, Cout)

    def tap(acc, inp):
        dyk, dxk, m, wk, ky, kx = inp
        py = base_y + ky + dyk
        px = base_x + kx + dxk
        v = bilinear_packed_pix(flat, (H, W), Cin, py, px)  # (H, W, Cin)
        acc = acc + (v * m[..., None]).reshape(H * W, Cin) @ wk
        return acc, None

    acc0 = jnp.zeros((H * W, Cout), x.dtype)
    acc, _ = jax.lax.scan(tap, acc0, (dy, dx, mk, w_taps, tap_y, tap_x))
    out = acc.reshape(H, W, Cout)
    if bias is not None:
        out = out + bias
    return out
