"""Depth-hypothesis generators for the MVS cascade.

Rebuild of /root/reference/models/CasMVSNet.py:519-595:
  * linear range sampling from a (D,) global range or a per-pixel
    current depth window,
  * the inverse-depth variant used for unbounded BMVS scenes
    (CasMVSNet.py:538-577, enabled via `inverse_depth`,
    runner.py:62-65).
"""

from __future__ import annotations

import jax.numpy as jnp


def cur_depth_range_samples(cur_depth, ndepth: int, depth_interval_pixel):
    """Per-pixel window [d - D/2*i, d + D/2*i] (CasMVSNet.py:519-536).
    cur_depth: (H, W) -> (D, H, W)."""
    cur_depth_min = cur_depth - ndepth / 2 * depth_interval_pixel
    cur_depth_max = cur_depth + ndepth / 2 * depth_interval_pixel
    new_interval = (cur_depth_max - cur_depth_min) / (ndepth - 1)
    steps = jnp.arange(ndepth, dtype=cur_depth.dtype)[:, None, None]
    return cur_depth_min[None] + steps * new_interval[None]


def depth_range_samples(cur_depth, ndepth: int, depth_interval_pixel,
                        shape):
    """Stage-1 linear span from (D,) range, else per-pixel window
    (CasMVSNet.py:579-595). Returns (D, H, W)."""
    H, W = shape
    if cur_depth.ndim == 1:
        dmin, dmax = cur_depth[0], cur_depth[-1]
        new_interval = (dmax - dmin) / (ndepth - 1)
        steps = jnp.arange(ndepth, dtype=cur_depth.dtype)
        d = dmin + steps * new_interval                     # (D,)
        return jnp.broadcast_to(d[:, None, None], (ndepth, H, W))
    return cur_depth_range_samples(cur_depth, ndepth, depth_interval_pixel)


def depth_range_samples_inverse(cur_depth, ndepth: int,
                                depth_interval_pixel, shape):
    """Inverse-depth sampling (CasMVSNet.py:538-577). Stage 1 samples
    uniformly in 1/d; later stages keep the linear window."""
    H, W = shape
    if cur_depth.ndim == 1:
        dmin, dmax = cur_depth[0], cur_depth[-1]
        z = jnp.linspace(0.0, 1.0, ndepth, dtype=cur_depth.dtype)
        d = 1.0 / (1.0 / dmin * (1.0 - z) + 1.0 / dmax * z)  # (D,)
        return jnp.broadcast_to(d[:, None, None], (ndepth, H, W))
    return cur_depth_range_samples(cur_depth, ndepth, depth_interval_pixel)


def uncertainty_aware_samples(cur_depth, exp_var, ndepth: int, shape,
                              inverse_depth: bool = False, eps: float = 1e-12):
    """UCSNet uncertainty-aware hypothesis slab
    (/root/reference/models/ucsnet.py:44-72): window
    [d - min(d, sigma), d + sigma] where `exp_var` is the lamb-scaled
    predicted std from the previous stage (ucsnet.py:393-394).
    cur_depth: (H, W) or (D0,); exp_var: (H, W). Returns (D, H, W)."""
    H, W = shape
    if cur_depth.ndim == 1:
        dmin, dmax = cur_depth[0], cur_depth[-1]
        if inverse_depth:
            z = jnp.linspace(0.0, 1.0, ndepth, dtype=cur_depth.dtype)
            d = 1.0 / (1.0 / dmin * (1.0 - z) + 1.0 / dmax * z)
        else:
            new_interval = (dmax - dmin) / (ndepth - 1)
            d = dmin + jnp.arange(ndepth, dtype=cur_depth.dtype) * new_interval
        return jnp.broadcast_to(d[:, None, None], (ndepth, H, W))
    low_bound = -jnp.minimum(cur_depth, exp_var)
    high_bound = exp_var
    step = (high_bound - low_bound) / (float(ndepth) - 1)
    steps = jnp.arange(ndepth, dtype=cur_depth.dtype)[:, None, None]
    return cur_depth[None] + low_bound[None] + steps * step[None] + eps
