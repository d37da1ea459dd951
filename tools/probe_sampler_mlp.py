"""Split the sampler phase: raw no-grad SDF-MLP sweep time vs glue.

Times ONLY the sampler's MLP work — sdf_values on 65,536 points/step
(the sampler's total eval volume at production shapes) with the
training compute dtypes — inside a scanned loop with rng-derived
points (so nothing hoists). The difference between this and the
profile_step sampler phase (~2.4 ms) is inverse-CDF/bisection glue.

Usage: python -m tools.probe_sampler_mlp [pallas]
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tools.profile_step import N_STEPS, TRIALS, build_inputs
from s_volsdf_tpu.models.network import sdf_values


def main():
    cfg, tx, state, scene_dev, packed = build_inputs()
    mcfg = dataclasses.replace(
        cfg.model, compute_dtype=cfg.train.train_compute_dtype,
        activation_dtype=cfg.train.train_activation_dtype)
    n_pts = 512 * 128
    bs = cfg.model.scene_bounding_sphere
    params = state.params["sdf"]

    use_pallas = "pallas" in sys.argv
    if use_pallas:
        from s_volsdf_tpu.ops.pallas.fused_sdf import fused_sdf_values
        print("path=pallas fused_sdf_values")

        def eval_fn(p, pts):
            return fused_sdf_values(p, mcfg, pts, bs)
    else:
        print("path=xla sdf_values")

        def eval_fn(p, pts):
            return sdf_values(p, mcfg, pts, bs)

    def body(p, carry, rng):
        pts = jax.random.uniform(rng, (n_pts, 3), minval=-1.0, maxval=1.0)
        s = eval_fn(p, pts)
        return carry + jnp.sum(s), jnp.max(s)

    fn = jax.jit(lambda p, c, rngs: jax.lax.scan(
        lambda c, r: body(p, c, r), c, rngs))
    rngs = jax.random.split(jax.random.PRNGKey(2), N_STEPS)
    out = fn(params, jnp.zeros(()), rngs)
    np.asarray(out[0])
    t0 = time.perf_counter()
    for t in range(TRIALS):
        out = fn(params, jnp.zeros(()),
                 jax.random.split(jax.random.PRNGKey(3 + t), N_STEPS))
        np.asarray(out[0])
    ms = (time.perf_counter() - t0) / (TRIALS * N_STEPS) * 1000.0
    gflop = n_pts * 1.05e6 / 1e9
    print(f"sdf sweep ({n_pts} pts): {ms:.3f} ms/step  "
          f"= {gflop / (ms / 1000):,.0f} GFLOP/s")


if __name__ == "__main__":
    main()
