"""SDF -> density transforms.

Parity with /root/reference/volsdf/model/density.py:16-47.
Parameters are scalars in a dict so beta is learnable under optax.
"""

from __future__ import annotations

import jax.numpy as jnp


def init_laplace_density(beta_init: float = 0.1) -> dict:
    return {"beta": jnp.asarray(beta_init, dtype=jnp.float32)}


def get_beta(params: dict, beta_min: float = 1e-4) -> jnp.ndarray:
    """beta = |beta_param| + beta_min (density.py:28-30)."""
    return jnp.abs(params["beta"]) + beta_min


def laplace_density(sdf: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """alpha * Laplace(0, beta).cdf(-sdf) with alpha = 1/beta
    (density.py:21-26). Uses expm1 for numerical parity."""
    alpha = 1.0 / beta
    return alpha * (0.5 + 0.5 * jnp.sign(sdf) * jnp.expm1(-jnp.abs(sdf) / beta))


def abs_density(x: jnp.ndarray) -> jnp.ndarray:
    """NeRF++-style background density (density.py:33-35)."""
    return jnp.abs(x)
