"""Functional conv blocks for the MVS networks (NHWC / NDHWC).

Rebuild of the reference torch blocks (/root/reference/models/
CasMVSNet.py:24-277): Conv2d/Deconv2d/Conv3d/Deconv3d each fused with
inference-mode BatchNorm + ReLU. The MVS nets are FROZEN here (the
reference decorates every forward with @torch.no_grad(),
CasMVSNet.py:705), so BN is a static scale/shift folded at apply time.

Layouts are TPU-native: NHWC for 2D, NDHWC for 3D (channels-last feeds
the MXU's 128-lane minor dimension). Transposed convs are expressed as
input-dilated convolutions so XLA lowers them onto the same conv path.

Weight storage: HWIO (2D) / DHWIO (3D). The torch checkpoint converter
(tools/convert_ckpt.py) handles OIHW -> HWIO transposition and the
transposed-conv kernel flip.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, jnp.ndarray]

_DN2D = ("NHWC", "HWIO", "NHWC")
_DN3D = ("NDHWC", "DHWIO", "NDHWC")


# --------------------------------------------------------------------------
# Initializers
# --------------------------------------------------------------------------

def _kaiming_uniform(key, shape, fan_in):
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def init_conv2d(key, cin, cout, k, bn: bool = True,
                bias: Optional[bool] = None) -> Params:
    """k: int or (kh, kw). bias defaults to (not bn) like the reference
    (CasMVSNet.py:39-40)."""
    kh, kw = (k, k) if isinstance(k, int) else k
    fan_in = cin * kh * kw
    p: Params = {"w": _kaiming_uniform(key, (kh, kw, cin, cout), fan_in)}
    use_bias = (not bn) if bias is None else bias
    if use_bias:
        p["b"] = jnp.zeros((cout,))
    if bn:
        p["bn"] = init_bn(cout)
    return p


def init_conv3d(key, cin, cout, k, bn: bool = True,
                bias: Optional[bool] = None) -> Params:
    kd, kh, kw = (k, k, k) if isinstance(k, int) else k
    fan_in = cin * kd * kh * kw
    p: Params = {"w": _kaiming_uniform(key, (kd, kh, kw, cin, cout), fan_in)}
    use_bias = (not bn) if bias is None else bias
    if use_bias:
        p["b"] = jnp.zeros((cout,))
    if bn:
        p["bn"] = init_bn(cout)
    return p


def init_bn(c) -> Params:
    return {
        "scale": jnp.ones((c,)),
        "bias": jnp.zeros((c,)),
        "mean": jnp.zeros((c,)),
        "var": jnp.ones((c,)),
    }


# --------------------------------------------------------------------------
# Apply
# --------------------------------------------------------------------------

def batch_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Inference-mode BN over the trailing channel axis."""
    inv = p["scale"] * lax.rsqrt(p["var"] + eps)
    return x * inv + (p["bias"] - p["mean"] * inv)


def _conv_operands(p: Params, x: jnp.ndarray):
    """The conv compute dtype FOLLOWS THE WEIGHT dtype: bf16 kernels
    run the conv on the MXU's native bf16 path with f32 accumulation
    (preferred_element_type), so BN/bias/activations stay f32. The MVS
    nets are frozen, so enabling bf16 inference is a one-time weight
    cast (`cast_conv_weights`) — no flags to thread through ~100 call
    sites, and the dtype is part of the jit cache key via the avals."""
    w = p["w"]
    if w.dtype == jnp.bfloat16:
        return x.astype(jnp.bfloat16), w, {"preferred_element_type":
                                           jnp.float32}
    return x, w, {}


def cast_conv_weights(params, dtype=jnp.bfloat16):
    """Cast every conv kernel (ndim >= 4: HWIO / DHWIO, incl. packed
    2D-lowered 3D kernels) in a param pytree to `dtype`; BN stats,
    biases, and linear/attention weights stay f32."""
    return jax.tree.map(
        lambda a: a.astype(dtype) if hasattr(a, "ndim") and a.ndim >= 4
        else a, params)


def conv2d(p: Params, x, stride=1, padding=0, *, relu=True,
           dilation=1) -> jnp.ndarray:
    """x: (N, H, W, C)."""
    s = (stride, stride) if isinstance(stride, int) else stride
    pad = ((padding, padding),) * 2 if isinstance(padding, int) else padding
    d = (dilation, dilation) if isinstance(dilation, int) else dilation
    xq, w, kw = _conv_operands(p, x)
    y = lax.conv_general_dilated(
        xq, w, window_strides=s, padding=pad, rhs_dilation=d,
        dimension_numbers=_DN2D, **kw)
    if "b" in p:
        y = y + p["b"]
    if "bn" in p:
        y = batch_norm(p["bn"], y)
    if relu:
        y = jax.nn.relu(y)
    return y


def deconv2d(p: Params, x, stride=2, padding=1, output_padding=1, *,
             relu=True, k=3) -> jnp.ndarray:
    """Transposed 2D conv as an input-dilated conv (exact torch
    ConvTranspose2d equivalence): pad = (k-1-p, k-1-p+output_padding),
    lhs_dilation = stride. Weights are stored pre-flipped in HWIO."""
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    xq, w, kw = _conv_operands(p, x)
    y = lax.conv_general_dilated(
        xq, w, window_strides=(1, 1), padding=((lo, hi), (lo, hi)),
        lhs_dilation=(stride, stride), dimension_numbers=_DN2D, **kw)
    if "b" in p:
        y = y + p["b"]
    if "bn" in p:
        y = batch_norm(p["bn"], y)
    if relu:
        y = jax.nn.relu(y)
    return y


def conv3d(p: Params, x, stride=1, padding=1, *, relu=True) -> jnp.ndarray:
    """x: (N, D, H, W, C)."""
    s = (stride,) * 3 if isinstance(stride, int) else stride
    pad = ((padding, padding),) * 3 if isinstance(padding, int) else padding
    xq, w, kw = _conv_operands(p, x)
    y = lax.conv_general_dilated(
        xq, w, window_strides=s, padding=pad, dimension_numbers=_DN3D, **kw)
    if "b" in p:
        y = y + p["b"]
    if "bn" in p:
        y = batch_norm(p["bn"], y)
    if relu:
        y = jax.nn.relu(y)
    return y


def deconv3d(p: Params, x, stride=2, padding=1, output_padding=1, *,
             relu=True, k=3) -> jnp.ndarray:
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    xq, w, kw = _conv_operands(p, x)
    y = lax.conv_general_dilated(
        xq, w, window_strides=(1, 1, 1),
        padding=((lo, hi),) * 3, lhs_dilation=(stride,) * 3,
        dimension_numbers=_DN3D, **kw)
    if "b" in p:
        y = y + p["b"]
    if "bn" in p:
        y = batch_norm(p["bn"], y)
    if relu:
        y = jax.nn.relu(y)
    return y


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """F.interpolate(scale_factor=2, mode='nearest') for NHWC
    (CasMVSNet.py:426-430 FPN pathway)."""
    N, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (N, H, 2, W, 2, C))
    return x.reshape(N, 2 * H, 2 * W, C)


def interpolate_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int],
                         align_corners: bool = False) -> jnp.ndarray:
    """F.interpolate(mode='bilinear') for NHWC (torch semantics)."""
    N, H, W, C = x.shape
    OH, OW = out_hw
    if align_corners:
        ys = jnp.linspace(0, H - 1, OH)
        xs = jnp.linspace(0, W - 1, OW)
    else:
        ys = (jnp.arange(OH) + 0.5) * (H / OH) - 0.5
        xs = (jnp.arange(OW) + 0.5) * (W / OW) - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, H - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, W - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)[None, :, None, None]
    wx = jnp.clip(xs - x0, 0.0, 1.0)[None, None, :, None]

    g = lambda yi, xi: x[:, yi][:, :, xi]
    top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
    bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
    return top * (1 - wy) + bot * wy


def interpolate_trilinear_depth(vol: jnp.ndarray, out_shape,
                                align_corners: bool = False) -> jnp.ndarray:
    """F.interpolate(mode='trilinear') for (N, D, H, W) single-channel
    volumes (CasMVSNet.py:749-751 depth-hypothesis resampling)."""
    N, D, H, W = vol.shape
    OD, OH, OW = out_shape

    def axis_coords(insz, outsz):
        if align_corners:
            return jnp.linspace(0, insz - 1, outsz) if outsz > 1 else \
                jnp.zeros((outsz,))
        return (jnp.arange(outsz) + 0.5) * (insz / outsz) - 0.5

    ds = axis_coords(D, OD)
    ys = axis_coords(H, OH)
    xs = axis_coords(W, OW)

    def lerp_axis(v, coords, axis):
        insz = v.shape[axis]
        c0 = jnp.clip(jnp.floor(coords), 0, insz - 1).astype(jnp.int32)
        c1 = jnp.clip(c0 + 1, 0, insz - 1)
        w = jnp.clip(coords - c0, 0.0, 1.0)
        v0 = jnp.take(v, c0, axis=axis)
        v1 = jnp.take(v, c1, axis=axis)
        shape = [1] * v.ndim
        shape[axis] = -1
        w = w.reshape(shape)
        return v0 * (1 - w) + v1 * w

    out = lerp_axis(vol, ds, axis=1)
    out = lerp_axis(out, ys, axis=2)
    out = lerp_axis(out, xs, axis=3)
    return out


def avg_pool3d_depth_win4(prob: jnp.ndarray) -> jnp.ndarray:
    """4 * avg_pool3d(pad(prob, (1, 2) on depth), kernel (4,1,1)) — the
    4-hypothesis photometric-confidence window (CasMVSNet.py:658).
    prob: (N, D, H, W) -> same shape (sliding sum of 4 along depth)."""
    padded = jnp.pad(prob, ((0, 0), (1, 2), (0, 0), (0, 0)))
    return (padded[:, 0:-3] + padded[:, 1:-2]
            + padded[:, 2:-1] + padded[:, 3:])
