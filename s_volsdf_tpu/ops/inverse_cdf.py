"""Inverse-CDF sampling (the `searchsorted` + gather block of the
reference sampler, /root/reference/volsdf/model/ray_sampler.py:166-185).

TPU design: `searchsorted` + 4x `take_along_axis` would put four
random gathers on the LANE dimension in the hot loop — measured
1.28 ms/step at production shapes (512 rays, 64-from-128), ~10% of the
whole train step. Because the CDF is non-decreasing, the comparison
mask `u >= cdf` is a PREFIX-OF-ONES along K for every (ray, quantile),
so "gather at the insertion index" collapses into masked max/min
reductions over values — no integer indices, no gathers:

    below = last masked index   -> value = max over masked entries
    above = first unmasked index -> value = min over unmasked entries

(both `cdf` and `bins` are non-decreasing, so the extremum IS the
boundary entry). Measured 0.12 ms/step — ~10x — and bit-identical to
the gather form (tests/test_core_math.py).

PRECONDITIONS (both hold at every call site, models/sampler.py):
  * cdf non-decreasing per ray with cdf[..., 0] == 0 (pdf_to_cdf
    output for a non-negative pdf);
  * bins non-decreasing per ray (sampler z_vals are sorted by
    construction);
  * u >= 0.
Rows whose pdf contains NaN produce all-NaN samples either way
(pdf_to_cdf's normalization poisons the whole row). For unsorted bins
use `sample_pdf_from_cdf_gather`.
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_pdf_from_cdf(bins: jnp.ndarray, cdf: jnp.ndarray,
                        u: jnp.ndarray) -> jnp.ndarray:
    """Draw samples by inverting a per-ray CDF.

    Args:
      bins: (R, K) sorted sample locations.
      cdf:  (R, K) non-decreasing CDF with leading zero (cdf[:, 0] == 0).
      u:    (R, N) quantiles in [0, 1].

    Returns:
      (R, N) samples, linearly interpolated within CDF segments.
    """
    mask = u[..., :, None] >= cdf[..., None, :]        # prefix-of-ones
    cdf_e = cdf[..., None, :]
    bins_e = bins[..., None, :]
    cdf_below = jnp.max(
        jnp.where(mask, cdf_e, jnp.asarray(-jnp.inf, cdf.dtype)), axis=-1)
    bins_below = jnp.max(
        jnp.where(mask, bins_e, jnp.asarray(-jnp.inf, bins.dtype)), axis=-1)
    # `inds == K` (mask all-true, u beyond the last CDF entry) clamps
    # above to the last entry — same as minimum(inds, K-1) in the
    # gather form. `inds >= 1` always because cdf[..., 0] == 0 <= u,
    # so the below-reductions are never empty.
    cdf_above = jnp.minimum(
        jnp.min(jnp.where(mask, jnp.asarray(jnp.inf, cdf.dtype), cdf_e),
                axis=-1), cdf[..., -1:])
    bins_above = jnp.minimum(
        jnp.min(jnp.where(mask, jnp.asarray(jnp.inf, bins.dtype), bins_e),
                axis=-1), bins[..., -1:])

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def sample_pdf_from_cdf_gather(bins: jnp.ndarray, cdf: jnp.ndarray,
                               u: jnp.ndarray) -> jnp.ndarray:
    """Literal searchsorted-right + gather form (the reference's exact
    index semantics, ray_sampler.py:166-185). Works for UNSORTED bins
    too; kept as the oracle for the masked-reduction fast path and for
    callers whose bins are not monotone."""
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
