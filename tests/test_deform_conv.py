"""Deformable-conv correctness vs a direct numpy implementation of the
torchvision deform_conv2d semantics (torchvision is not in this image;
the numpy oracle implements the documented bilinear/offset math)."""

import jax.numpy as jnp
import numpy as np

from s_volsdf_tpu.ops.deform_conv import deform_conv2d


def numpy_deform_conv(x, offset, mask, w, b, padding=1):
    """x: (H,W,Cin); offset: (H,W,2K) interleaved (dy,dx); mask: (H,W,K);
    w: (Cout,Cin,kh,kw). Zero padding, stride 1."""
    H, W, Cin = x.shape
    Cout, _, kh, kw = w.shape
    K = kh * kw
    out = np.zeros((H, W, Cout), np.float32)

    def sample(c, y, xx):
        y0, x0 = int(np.floor(y)), int(np.floor(xx))
        val = 0.0
        for (yy, wy) in ((y0, 1 - (y - y0)), (y0 + 1, y - y0)):
            for (xc, wx) in ((x0, 1 - (xx - x0)), (x0 + 1, xx - x0)):
                if 0 <= yy < H and 0 <= xc < W:
                    val += wy * wx * x[yy, xc, c]
        return val

    for oy in range(H):
        for ox in range(W):
            for co in range(Cout):
                acc = b[co]
                for k in range(K):
                    ky, kx = divmod(k, kw)
                    py = oy + ky - padding + offset[oy, ox, 2 * k]
                    px = ox + kx - padding + offset[oy, ox, 2 * k + 1]
                    m = mask[oy, ox, k]
                    for c in range(Cin):
                        acc += w[co, c, ky, kx] * m * sample(c, py, px)
                out[oy, ox, co] = acc
    return out


def test_deform_conv_matches_numpy_oracle(rng_np):
    H, W, Cin, Cout = 6, 7, 3, 4
    kh = kw = 3
    K = kh * kw
    x = rng_np.standard_normal((H, W, Cin)).astype(np.float32)
    offset = (rng_np.standard_normal((H, W, 2 * K)) * 0.7).astype(np.float32)
    mask = 1.0 / (1.0 + np.exp(-rng_np.standard_normal((H, W, K)))).astype(np.float32)
    w = (rng_np.standard_normal((Cout, Cin, kh, kw)) * 0.2).astype(np.float32)
    b = rng_np.standard_normal(Cout).astype(np.float32)

    expected = numpy_deform_conv(x, offset, mask, w, b)

    w_ours = w.transpose(2, 3, 1, 0).reshape(K * Cin, Cout)
    ours = deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                         jnp.asarray(mask), jnp.asarray(w_ours),
                         jnp.asarray(b), kh=kh, kw=kw, padding=1)
    np.testing.assert_allclose(np.asarray(ours), expected, atol=2e-4)


def test_deform_conv_zero_offset_equals_conv(rng_np):
    """With zero offsets and unit mask, DCN == plain conv (the init
    state of the reference's DCN, dcn.py:63-65)."""
    import jax
    from jax import lax
    H, W, Cin, Cout = 8, 8, 3, 5
    kh = kw = 3
    K = kh * kw
    x = rng_np.standard_normal((H, W, Cin)).astype(np.float32)
    w = (rng_np.standard_normal((Cout, Cin, kh, kw)) * 0.2).astype(np.float32)
    b = np.zeros(Cout, np.float32)

    w_ours = w.transpose(2, 3, 1, 0).reshape(K * Cin, Cout)
    ours = deform_conv2d(jnp.asarray(x), jnp.zeros((H, W, 2 * K)),
                         jnp.ones((H, W, K)), jnp.asarray(w_ours),
                         jnp.asarray(b))

    conv = lax.conv_general_dilated(
        jnp.asarray(x)[None], jnp.asarray(w.transpose(2, 3, 1, 0)),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    np.testing.assert_allclose(np.asarray(ours), np.asarray(conv), atol=1e-4)
