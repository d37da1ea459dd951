"""Weight-normalized MLP layers as pure functions over pytree params.

Replaces torch nn.Linear + nn.utils.weight_norm used by the reference
SDF / radiance networks (/root/reference/volsdf/model/network.py:46-67,
158-165). Parameters are plain dicts so the whole model is a pytree
compatible with jit / grad / vmap / shard_map.

Weight layout: `v` is stored (d_in, d_out) so application is `x @ w`
(MXU-friendly). Torch's weight_norm(dim=0) on a (out, in) weight
normalizes each output row; here that is each column of `v`.
"""

from __future__ import annotations

import math
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]


def init_linear(key, d_in: int, d_out: int, weight_norm: bool = True,
                w_init: str = "relu_he", bias_init: float = 0.0) -> Params:
    """Standard init: W ~ N(0, sqrt(2)/sqrt(d_out)) per reference
    geometric-init 'else' branch (network.py:60-62)."""
    std = math.sqrt(2.0) / math.sqrt(d_out)
    w = std * jax.random.normal(key, (d_in, d_out), dtype=jnp.float32)
    b = jnp.full((d_out,), bias_init, dtype=jnp.float32)
    return _pack(w, b, weight_norm)


def _pack(w: jnp.ndarray, b: jnp.ndarray, weight_norm: bool) -> Params:
    """Store weights; with weight_norm, g is set so W == g * v/||v||."""
    if weight_norm:
        norms = jnp.linalg.norm(w, axis=0)  # per output column
        return {"v": w, "g": norms, "b": b}
    return {"w": w, "b": b}


def apply_linear(p: Params, x: jnp.ndarray,
                 compute_dtype=None) -> jnp.ndarray:
    """compute_dtype: None keeps fp32; jnp.bfloat16 runs the matmul on
    the MXU's native bf16 path with fp32 accumulation (weight-norm
    normalization stays fp32)."""
    if "v" in p:
        v = p["v"]
        # Normalize each output column; epsilon-free like torch.
        w = p["g"] * v / jnp.linalg.norm(v, axis=0, keepdims=True)
    else:
        w = p["w"]
    if compute_dtype is not None:
        y = jax.lax.dot(x.astype(compute_dtype), w.astype(compute_dtype),
                        preferred_element_type=jnp.float32)
        return y + p["b"]
    return x @ w + p["b"]


def softplus_b(x: jnp.ndarray, beta: float = 100.0) -> jnp.ndarray:
    """torch nn.Softplus(beta=100) (network.py:69)."""
    return jax.nn.softplus(beta * x) / beta


# --------------------------------------------------------------------------
# Geometric initialization for the SDF MLP (network.py:48-62)
# --------------------------------------------------------------------------

def init_sdf_mlp(key, d_in: int, d_out: int, dims: Sequence[int],
                 feature_size: int, skip_in: Tuple[int, ...],
                 multires: int, geometric_init: bool, bias: float,
                 weight_norm: bool) -> list:
    """Initialize the SDF MLP parameter list.

    Layer widths follow the reference: dims = [d_in_pe] + dims +
    [d_out + feature_size]; the layer feeding a skip junction has its
    output shrunk by the PE input width (network.py:40-44).
    Geometric (sphere) init makes sdf(x) ~ ||x|| - bias at start.
    """
    from s_volsdf_tpu.models.embedder import embed_dim

    d_pe = embed_dim(multires, d_in)
    widths = [d_pe] + list(dims) + [d_out + feature_size]
    n_layers = len(widths)
    params = []
    keys = jax.random.split(key, n_layers - 1)
    for layer in range(n_layers - 1):
        out_dim = widths[layer + 1]
        if layer + 1 in skip_in:
            out_dim = widths[layer + 1] - widths[0]
        in_dim = widths[layer]
        k = keys[layer]
        if geometric_init:
            if layer == n_layers - 2:
                # Final layer: mean sqrt(pi)/sqrt(in), tiny std, bias=-bias.
                mean = math.sqrt(math.pi) / math.sqrt(in_dim)
                w = mean + 1e-4 * jax.random.normal(k, (in_dim, out_dim))
                b = jnp.full((out_dim,), -bias, dtype=jnp.float32)
            elif multires > 0 and layer == 0:
                std = math.sqrt(2.0) / math.sqrt(out_dim)
                w0 = std * jax.random.normal(k, (3, out_dim))
                w = jnp.concatenate(
                    [w0, jnp.zeros((in_dim - 3, out_dim))], axis=0)
                b = jnp.zeros((out_dim,))
            elif multires > 0 and layer in skip_in:
                std = math.sqrt(2.0) / math.sqrt(out_dim)
                w = std * jax.random.normal(k, (in_dim, out_dim))
                # Zero the PE (non-xyz) part of the concatenated input,
                # which sits in the LAST (d_pe - 3) input rows.
                w = w.at[-(widths[0] - 3):, :].set(0.0)
                b = jnp.zeros((out_dim,))
            else:
                std = math.sqrt(2.0) / math.sqrt(out_dim)
                w = std * jax.random.normal(k, (in_dim, out_dim))
                b = jnp.zeros((out_dim,))
        else:
            std = math.sqrt(2.0) / math.sqrt(out_dim)
            w = std * jax.random.normal(k, (in_dim, out_dim))
            b = jnp.zeros((out_dim,))
        params.append(_pack(w.astype(jnp.float32), b, weight_norm))
    return params


def init_mlp(key, widths: Sequence[int], weight_norm: bool) -> list:
    """Plain MLP init (rendering network, network.py:158-165)."""
    params = []
    keys = jax.random.split(key, len(widths) - 1)
    for i in range(len(widths) - 1):
        params.append(init_linear(keys[i], widths[i], widths[i + 1],
                                  weight_norm=weight_norm))
    return params
