"""Inverse-CDF sampling (the `searchsorted` + gather block of the
reference sampler, /root/reference/volsdf/model/ray_sampler.py:166-185).

Implemented as a branchless comparison-sum: for each u, the insertion
index is `sum(cdf <= u)`, an O(K*N) elementwise compare that maps onto
the TPU VPU far better than a per-row binary search.
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_pdf_from_cdf(bins: jnp.ndarray, cdf: jnp.ndarray,
                        u: jnp.ndarray) -> jnp.ndarray:
    """Draw samples by inverting a per-ray CDF.

    Args:
      bins: (R, K) sorted sample locations.
      cdf:  (R, K) CDF with leading zero included (cdf[:, 0] == 0).
      u:    (R, N) quantiles in [0, 1).

    Returns:
      (R, N) samples, linearly interpolated within CDF segments.
    """
    K = cdf.shape[-1]
    # searchsorted(cdf, u, side='right'): count of cdf entries <= u.
    inds = jnp.sum(u[..., :, None] >= cdf[..., None, :], axis=-1)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, K - 1)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def pdf_to_cdf(pdf: jnp.ndarray) -> jnp.ndarray:
    """Normalize a per-interval pdf (R, K-1) and return the CDF with a
    leading zero, shape (R, K) (ray_sampler.py:148-163)."""
    pdf = pdf / jnp.sum(pdf, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    zeros = jnp.zeros_like(cdf[..., :1])
    return jnp.concatenate([zeros, cdf], axis=-1)
