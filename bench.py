"""Benchmark: VolSDF optimization throughput (rays/sec/chip).

Measures the full S-VolSDF hot loop (SURVEY.md section 3.2) at the
reference's production shape: 512 rays/step, 8x256 SDF MLP, error-bound
sampler fast=1 (128 eval + 64+32+2 final samples), MVS cost_mapping
against 3 probability volumes (192x72x96 at DTU stage-0 quarter-res),
full loss, Adam update, NaN guard.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the reference PyTorch pipeline's measured
throughput of ~3.4 steps/s x 512 rays ~= 1740 rays/s on its published
single-GPU setup (BASELINE.md; the repo publishes no numbers, so this
is the conservative estimate recorded there for a 100k-step/8h run).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from s_volsdf_tpu.config import load_config
from s_volsdf_tpu.data.synthetic import make_sphere_scene, sample_rays
from s_volsdf_tpu.engine.train_step import (init_train_state, make_optimizer,
                                            train_step)
from s_volsdf_tpu.models.network import init_volsdf_params
from s_volsdf_tpu.ops.cost_mapping import MVSVolumes

REFERENCE_RAYS_PER_SEC = 1740.0


def main():
    cfg = load_config("dtu")  # full production model shapes
    n_rays = cfg.train.num_pixels  # 512
    img_res = (cfg.max_h, cfg.max_w)

    scene = make_sphere_scene(n_views=3, img_res=(64, 96))
    rng_np = np.random.default_rng(0)

    params = init_volsdf_params(jax.random.PRNGKey(0), cfg.model)
    tx = make_optimizer(cfg)
    state = init_train_state(cfg, params, tx)

    # Synthetic stage-0 MVS volumes at DTU shapes (D=192, H/8, W/8 of
    # the x2 MVS res = 288x384 downsampled 4x -> use 72x96 to bound
    # HBM on a single v5e chip during the bench; production runs use
    # the real cascade outputs).
    D, Hc, Wc = 192, 72, 96
    prob = jax.random.uniform(jax.random.PRNGKey(1), (3, D, Hc, Wc))
    prob = prob / prob.sum(axis=1, keepdims=True)
    z_slab = jnp.stack([jnp.full((3, Hc, Wc), 0.5),
                        jnp.full((3, Hc, Wc), 5.0)], axis=1)
    mvs = MVSVolumes(
        prob=prob, z_slab=z_slab,
        intrinsics=jnp.asarray(scene.intrinsics),
        c2w=jnp.asarray(scene.poses),
        img_res=scene.img_res, inverse_depth=False)

    def batchf(view):
        uv, rgb = sample_rays(scene, rng_np, view, n_rays)
        return {"uv": jnp.asarray(uv)[None], "rgb": jnp.asarray(rgb)[None],
                "rgb_smooth": jnp.asarray(rgb)[None],
                "pose": jnp.asarray(scene.poses[view])[None],
                "intrinsics": jnp.asarray(scene.intrinsics[view])[None],
                "view_onehot": jnp.zeros((3,)).at[view].set(1.0)}

    key = jax.random.PRNGKey(2)
    batches = [batchf(v) for v in range(3)]

    # Warmup / compile.
    state, lo = train_step(state, batches[0], key, mvs,
                           cfg=cfg, tx=tx, use_mvs=True)
    jax.block_until_ready(lo.loss)

    n_steps = 200
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        state, lo = train_step(state, batches[i % 3], sub, mvs,
                               cfg=cfg, tx=tx, use_mvs=True)
    jax.block_until_ready(lo.loss)
    dt = time.perf_counter() - t0

    steps_per_sec = n_steps / dt
    rays_per_sec = steps_per_sec * n_rays
    print(json.dumps({
        "metric": "volsdf_opt_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
