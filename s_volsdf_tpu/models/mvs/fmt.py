"""FMT — Feature Matching Transformer (TransMVSNet).

Rebuild of /root/reference/models/FMT.py:16-225 and
position_encoding.py:23-60. Kernelized linear attention (elu+1 feature
map) is pure einsums — native MXU work; the 2D sinusoidal positional
encoding is computed closed-form instead of a 600x600 buffer slice.

Layer schedule: 4 x (self, cross). The ref view runs only the 'self'
layers and keeps each intermediate (FMT.py:142-154); each src view runs
self+cross where cross attends to ref intermediate i//2 (FMT.py:156-172).
"""

from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp

LAYER_NAMES = ("self", "cross") * 4
D_MODEL = 32
N_HEADS = 8


def sine_position_encoding(feat: jnp.ndarray, d_model: int = D_MODEL):
    """PositionEncodingSine with temp_bug_fix=True
    (position_encoding.py:23-60). feat: (H, W, C) -> (H, W, C)."""
    H, W, C = feat.shape
    # x/y positions are 1-indexed cumsums in the reference.
    y_pos = jnp.arange(1, H + 1, dtype=feat.dtype)[:, None]   # (H, 1)
    x_pos = jnp.arange(1, W + 1, dtype=feat.dtype)[None, :]   # (1, W)
    div = jnp.exp(jnp.arange(0, d_model // 2, 2, dtype=feat.dtype)
                  * (-math.log(10000.0) / (d_model // 2)))    # (C//4,)
    pe = jnp.zeros((H, W, C), dtype=feat.dtype)
    xa = x_pos[..., None] * div                                # (1, W, C//4)
    ya = y_pos[..., None] * div                                # (H, 1, C//4)
    pe = pe.at[..., 0::4].set(jnp.broadcast_to(jnp.sin(xa), (H, W, C // 4)))
    pe = pe.at[..., 1::4].set(jnp.broadcast_to(jnp.cos(xa), (H, W, C // 4)))
    pe = pe.at[..., 2::4].set(jnp.broadcast_to(jnp.sin(ya), (H, W, C // 4)))
    pe = pe.at[..., 3::4].set(jnp.broadcast_to(jnp.cos(ya), (H, W, C // 4)))
    return feat + pe


# --------------------------------------------------------------------------
# Linear attention encoder layer
# --------------------------------------------------------------------------

def _init_linear(key, d_in, d_out):
    """xavier_uniform to match FMT._reset_parameters (FMT.py:128-131)."""
    bound = math.sqrt(6.0 / (d_in + d_out))
    w = jax.random.uniform(key, (d_in, d_out), minval=-bound, maxval=bound)
    return {"w": w, "b": jnp.zeros((d_out,))}


def init_encoder_layer(key, d_model: int = D_MODEL, n_heads: int = N_HEADS):
    ks = jax.random.split(key, 6)
    d_ff = 2 * d_model
    return {
        "q": _init_linear(ks[0], d_model, d_model),
        "k": _init_linear(ks[1], d_model, d_model),
        "v": _init_linear(ks[2], d_model, d_model),
        "out": _init_linear(ks[3], d_model, d_model),
        "ff1": _init_linear(ks[4], d_model, d_ff),
        "ff2": _init_linear(ks[5], d_ff, d_model),
        "ln1": {"scale": jnp.ones((d_model,)), "bias": jnp.zeros((d_model,))},
        "ln2": {"scale": jnp.ones((d_model,)), "bias": jnp.zeros((d_model,))},
    }


def _lin(p, x):
    return x @ p["w"] + p["b"]


def _layer_norm(p, x, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def linear_attention(q, k, v, eps: float = 1e-6):
    """elu+1 kernelized linear attention (FMT.py:16-37).
    q: (L, H, D); k, v: (S, H, D)."""
    fq = jax.nn.elu(q) + 1.0
    fk = jax.nn.elu(k) + 1.0
    kv = jnp.einsum("shd,shm->hmd", fk, v)
    z = 1.0 / (jnp.einsum("lhd,hd->lh", fq, jnp.sum(fk, axis=0)) + eps)
    return jnp.einsum("lhd,hmd,lh->lhm", fq, kv, z)


def encoder_layer(p: Dict, x: jnp.ndarray, source: jnp.ndarray,
                  n_heads: int = N_HEADS) -> jnp.ndarray:
    """EncoderLayer.forward (FMT.py:96-111). x: (L, C), source: (S, C)."""
    L, C = x.shape
    S = source.shape[0]
    q = _lin(p["q"], x).reshape(L, n_heads, -1)
    k = _lin(p["k"], source).reshape(S, n_heads, -1)
    v = _lin(p["v"], source).reshape(S, n_heads, -1)
    att = linear_attention(q, k, v).reshape(L, C)
    x = x + _lin(p["out"], att)
    y = x = _layer_norm(p["ln1"], x)
    y = _lin(p["ff2"], jax.nn.relu(_lin(p["ff1"], y)))
    return _layer_norm(p["ln2"], x + y)


# --------------------------------------------------------------------------
# FMT over ref/src feature maps + FPN pathway
# --------------------------------------------------------------------------

def init_fmt(key, d_model: int = D_MODEL, n_heads: int = N_HEADS):
    ks = jax.random.split(key, len(LAYER_NAMES))
    return {"layers": [init_encoder_layer(k, d_model, n_heads) for k in ks]}


def fmt_ref(params, ref_feat: jnp.ndarray) -> List[jnp.ndarray]:
    """Self-attention stack over the ref view; returns the intermediate
    after each 'self' layer (FMT.py:142-154). ref_feat: (H, W, C)."""
    H, W, C = ref_feat.shape
    x = sine_position_encoding(ref_feat).reshape(H * W, C)
    outs = []
    for p, name in zip(params["layers"], LAYER_NAMES):
        if name == "self":
            x = encoder_layer(p, x, x)
            outs.append(x.reshape(H, W, C))
    return outs


def fmt_src(params, ref_list: List[jnp.ndarray],
            src_feat: jnp.ndarray) -> jnp.ndarray:
    """Self+cross stack over a src view (FMT.py:156-172)."""
    H, W, C = src_feat.shape
    refs = [r.reshape(H * W, C) for r in ref_list]
    x = sine_position_encoding(src_feat).reshape(H * W, C)
    for i, (p, name) in enumerate(zip(params["layers"], LAYER_NAMES)):
        if name == "self":
            x = encoder_layer(p, x, x)
        else:
            x = encoder_layer(p, x, refs[i // 2])
    return x.reshape(H, W, C)


def init_fmt_with_pathway(key, base: int = 8):
    from s_volsdf_tpu.models.mvs import blocks as B
    ks = jax.random.split(key, 5)
    return {
        "fmt": init_fmt(ks[0]),
        "dim_reduction_1": B.init_conv2d(ks[1], base * 4, base * 2, 1,
                                         bn=False, bias=False),
        "dim_reduction_2": B.init_conv2d(ks[2], base * 2, base, 1,
                                         bn=False, bias=False),
        "smooth_1": B.init_conv2d(ks[3], base * 2, base * 2, 3, bn=False,
                                  bias=False),
        "smooth_2": B.init_conv2d(ks[4], base, base, 3, bn=False,
                                  bias=False),
    }


def fmt_with_pathway(params, features: List[Dict]) -> List[Dict]:
    """FMT_with_pathway.forward (FMT.py:207-225): transform stage1 of
    every view (ref first), then re-smooth stages 2/3 through the
    upsample-add pathway. features: list of per-view {'stageN': (H,W,C)}.
    """
    from s_volsdf_tpu.models.mvs import blocks as B

    def upsample_add(x, y):
        return B.interpolate_bilinear(x[None], y.shape[:2],
                                      align_corners=False)[0] + y

    out = []
    ref_list = None
    for i, f in enumerate(features):
        f = dict(f)
        if i == 0:
            ref_list = fmt_ref(params["fmt"], f["stage1"])
            f["stage1"] = ref_list[-1]
        else:
            f["stage1"] = fmt_src(params["fmt"], ref_list, f["stage1"])
        s2 = upsample_add(
            B.conv2d(params["dim_reduction_1"], f["stage1"][None],
                     padding=0, relu=False)[0], f["stage2"])
        f["stage2"] = B.conv2d(params["smooth_1"], s2[None], padding=1,
                               relu=False)[0]
        s3 = upsample_add(
            B.conv2d(params["dim_reduction_2"], f["stage2"][None],
                     padding=0, relu=False)[0], f["stage3"])
        f["stage3"] = B.conv2d(params["smooth_2"], s3[None], padding=1,
                               relu=False)[0]
        out.append(f)
    return out
