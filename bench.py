"""Benchmark: VolSDF optimization throughput (rays/sec/chip).

Measures the production hot loop (SURVEY.md section 3.2) exactly as the
trainer runs it: the scan-fused optimization chunk at the reference's
shapes — 512 rays/step, 8x256 SDF MLP, error-bound sampler fast=1
(128 eval + 64+32+2 final samples), cost_mapping against 3 full
DTU stage-0 probability volumes (192 x 288 x 384), full loss, Adam,
NaN guard, on-device pixel sampling.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the reference PyTorch pipeline's
estimated single-GPU throughput of ~1740 rays/s (BASELINE.md: 512 rays
x ~3.4 it/s for the published 100k-step runs; the repo itself
publishes no numbers).

NOTE: timing fetches results to host each round — on the axon TPU
tunnel, block_until_ready alone does not synchronize.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from s_volsdf_tpu.config import load_config
from s_volsdf_tpu.data.synthetic import make_sphere_scene
from s_volsdf_tpu.engine.train_step import init_train_state, make_optimizer
from s_volsdf_tpu.engine.trainer import make_scan_train_fn
from s_volsdf_tpu.models.network import init_volsdf_params
from s_volsdf_tpu.ops.cost_mapping import MVSVolumes

REFERENCE_RAYS_PER_SEC = 1740.0


def main():
    cfg = load_config("dtu")  # full production model shapes
    n_rays = cfg.train.num_pixels  # 512

    scene = make_sphere_scene(n_views=3, img_res=(cfg.max_h, cfg.max_w))
    params = init_volsdf_params(jax.random.PRNGKey(0), cfg.model)
    tx = make_optimizer(cfg)
    state = init_train_state(cfg, params, tx)

    # DTU stage-0 probability volumes at true shape (D=192, 1152/4 x
    # 1536/4) per training view.
    D, Hc, Wc = 192, 288, 384
    prob = jax.random.uniform(jax.random.PRNGKey(1), (3, D, Hc, Wc))
    prob = prob / prob.sum(axis=1, keepdims=True)
    z_slab = jnp.stack([jnp.full((3, Hc, Wc), 0.5),
                        jnp.full((3, Hc, Wc), 5.0)], axis=1)
    mvs = MVSVolumes(
        prob=prob, z_slab=z_slab,
        intrinsics=jnp.asarray(scene.intrinsics),
        c2w=jnp.asarray(scene.poses),
        img_res=scene.img_res, inverse_depth=False)

    scene_dev = {
        "rgb": jnp.asarray(scene.images.reshape(3, -1, 3)),
        "rgb_smooth": jnp.asarray(scene.images.reshape(3, -1, 3)),
        "poses": jnp.asarray(scene.poses),
        "intrinsics": jnp.asarray(scene.intrinsics),
    }

    run_chunk = make_scan_train_fn(cfg, tx, use_mvs=True, n_views=3,
                                   img_res=scene.img_res)

    n_steps = 200
    rngs = jax.random.split(jax.random.PRNGKey(2), n_steps)
    # Warmup / compile.
    state, losses = run_chunk(state, rngs, scene_dev, mvs)
    np.asarray(losses.loss)

    t0 = time.perf_counter()
    trials = 3
    for t in range(trials):
        key = jax.random.PRNGKey(3 + t)
        state, losses = run_chunk(state, jax.random.split(key, n_steps),
                                  scene_dev, mvs)
        np.asarray(losses.loss)  # host fetch = hard sync
    dt = time.perf_counter() - t0

    rays_per_sec = trials * n_steps * n_rays / dt
    print(json.dumps({
        "metric": "volsdf_opt_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    if "--profile" in sys.argv:
        # Phase breakdown + XLA flop count + MFU (results and
        # methodology documented in BENCH_NOTES.md).
        from tools.profile_step import main as profile_main
        profile_main()
    else:
        main()
