"""Positional (Fourier) encoding.

Behavioral parity with the reference NeRF-style embedder
(/root/reference/volsdf/model/embedder.py:5-50): output layout is
[x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...] with
log-spaced frequency bands 2^0 .. 2^(multires-1).
"""

from __future__ import annotations

import jax.numpy as jnp


def embed_dim(multires: int, input_dims: int = 3) -> int:
    """Output dimension of `positional_encoding`."""
    if multires <= 0:
        return input_dims
    return input_dims * (1 + 2 * multires)


def positional_encoding(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """Fourier-encode the last axis of `x`.

    Args:
      x: (..., D) inputs.
      multires: number of frequency octaves; 0 means identity.

    Returns:
      (..., D * (1 + 2*multires)) encoding, ordered [x, sin(f0 x),
      cos(f0 x), sin(f1 x), cos(f1 x), ...] to match the reference
      embedder's per-frequency interleaving.
    """
    if multires <= 0:
        return x
    freqs = 2.0 ** jnp.arange(multires, dtype=x.dtype)  # (F,)
    # (..., F, D): scale each input dim by each frequency.
    xf = x[..., None, :] * freqs[:, None]
    # Interleave sin/cos per frequency: (..., F, 2, D) -> flat.
    enc = jnp.stack([jnp.sin(xf), jnp.cos(xf)], axis=-2)
    enc = enc.reshape(*x.shape[:-1], 2 * multires * x.shape[-1])
    return jnp.concatenate([x, enc], axis=-1)
