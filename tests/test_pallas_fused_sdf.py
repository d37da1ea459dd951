"""Correctness of the experimental Pallas fused SDF kernel (interpret
mode on CPU; the kernel is benchmark-documented but not wired into the
hot path — see ops/pallas/fused_sdf.py docstring)."""

import jax
import jax.numpy as jnp
import numpy as np

from s_volsdf_tpu.config import load_config
from s_volsdf_tpu.models.network import init_volsdf_params, sdf_values
from s_volsdf_tpu.ops.pallas.fused_sdf import fused_sdf_values, supported


def test_fused_sdf_matches_xla():
    cfg = load_config("dtu")
    assert supported(cfg.model)
    params = init_volsdf_params(jax.random.PRNGKey(0), cfg.model)
    pts = jax.random.normal(jax.random.PRNGKey(1), (700, 3))  # pad path
    ref = sdf_values(params["sdf"], cfg.model, pts, 3.0)
    got = fused_sdf_values(params["sdf"], cfg.model, pts, 3.0,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5)
