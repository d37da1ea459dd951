"""Modulated deformable convolution (DCNv2) as a gather + matmul.

The reference delegates to torchvision's CUDA kernel
(/root/reference/models/dcn.py:71-80: offset/mask conv then
`torchvision.ops.deform_conv2d`). TPU rebuild: for each output pixel
and each of the K=kh*kw taps, bilinearly sample the input at
(base_tap + learned_offset), scale by the sigmoid mask, then contract
the (K*Cin) patch axis against the weights on the MXU — the gather is
the only non-matmul work, exactly the structure XLA fuses well.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_gather(img, y, x):
    """img: (H, W, C); y/x: (...,) float pixel coords; zero padding.
    Returns (..., C)."""
    H, W = img.shape[0], img.shape[1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    def g(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return v * valid[..., None]

    return ((g(y0, x0) * (1 - wx) + g(y0, x1) * wx) * (1 - wy)
            + (g(y1, x0) * (1 - wx) + g(y1, x1) * wx) * wy)


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
    ys = jnp.arange(H, dtype=x.dtype)
    xs = jnp.arange(W, dtype=x.dtype)
    base_y, base_x = jnp.meshgrid(ys, xs, indexing="ij")  # (H, W)

    taps = []
    for k in range(K):
        ky, kx = divmod(k, kw)
        dy = offset[..., 2 * k]
        dx = offset[..., 2 * k + 1]
        py = base_y + (ky - padding) + dy
        px = base_x + (kx - padding) + dx
        sampled = _bilinear_gather(x, py, px)          # (H, W, Cin)
        taps.append(sampled * mask[..., k:k + 1])
    patches = jnp.concatenate(taps, axis=-1)           # (H, W, K*Cin)

    out = patches.reshape(-1, K * Cin) @ weight        # MXU contraction
    out = out.reshape(H, W, -1)
    if bias is not None:
        out = out + bias
    return out
