"""Benchmark: VolSDF optimization throughput (rays/sec/chip).

Measures the production hot loop (SURVEY.md section 3.2) exactly as the
trainer runs it: the scan-fused optimization chunk at the reference's
shapes — 512 rays/step, 8x256 SDF MLP, error-bound sampler fast=1
(128 eval + 64+32+2 final samples), cost_mapping against 3 full
DTU stage-0 probability volumes (192 x 288 x 384), full loss, Adam,
NaN guard, on-device pixel sampling.

The probability volumes are INFORMATIVE (data/synthetic.py:
gt_prob_volume at realistic trained-cascade peakiness), so the GCE
confidence gate is OPEN and the measured step is the live-gradient
configuration the production runs actually execute (RUNLOG_R4.md) —
round 4 benched against uniform-random volumes, i.e. a mostly-closed
gate (VERDICT r4 weak #5).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
`value` is the MEDIAN of `rounds` independent measurement rounds;
spread fields (min/max/all rounds) quantify run-to-run variance, which
on the axon TPU tunnel was observed at ~±8% between identical code
snapshots (VERDICT r4 weak #1 — see BENCH_NOTES.md variance section).
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
from s_volsdf_tpu.data.synthetic import gt_prob_volume, make_sphere_scene
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
    # 1536/4) per training view — informative gt-derived bumps at
    # trained-cascade peakiness (sigma=1.0 intervals, floor=0.02; the
    # run_100k.py production-evidence configuration), NOT uniform
    # noise, so the GCE gate trains open in the measured step.
    D, Hc, Wc = 192, 288, 384
    H, W = scene.img_res
    dvals = np.linspace(0.5, 5.0, D).astype(np.float32)
    rngp = np.random.default_rng(7)
    probs = []
    for v in range(3):
        Kc = scene.intrinsics[v].copy()
        Kc[0, :] *= Wc / W
        Kc[1, :] *= Hc / H
        prob, _ = gt_prob_volume(scene.poses[v], Kc, (Hc, Wc), dvals,
                                 scale_factor=1.0, sigma_intervals=1.0,
                                 floor=0.02, depth_noise=2.5 / 200.0,
                                 rng=rngp)
        probs.append(prob)
    prob = jnp.asarray(np.stack(probs))
    z_slab = jnp.stack([jnp.full((3, Hc, Wc), float(dvals[0])),
                        jnp.full((3, Hc, Wc), float(dvals[-1]))], axis=1)
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
    # Warmup / compile (two rounds: the first pays compile, the second
    # warms the dispatch path so round 1 isn't systematically slow).
    for w in range(2):
        state, losses = run_chunk(state, rngs, scene_dev, mvs)
        np.asarray(losses.loss)

    rounds = 5
    per_round = []
    for t in range(rounds):
        key = jax.random.PRNGKey(3 + t)
        t0 = time.perf_counter()
        state, losses = run_chunk(state, jax.random.split(key, n_steps),
                                  scene_dev, mvs)
        np.asarray(losses.loss)  # host fetch = hard sync
        dt = time.perf_counter() - t0
        per_round.append(n_steps * n_rays / dt)

    per_round = sorted(per_round)
    med = float(np.median(per_round))
    print(json.dumps({
        "metric": "volsdf_opt_rays_per_sec_per_chip",
        "value": round(med, 1),
        "unit": "rays/s",
        "vs_baseline": round(med / REFERENCE_RAYS_PER_SEC, 2),
        "rounds": [round(r, 1) for r in per_round],
        "spread_pct": round(100 * (per_round[-1] - per_round[0]) / med, 2),
        "gate": "open (gt_prob_volume, sigma=1.0, floor=0.02)",
    }))


if __name__ == "__main__":
    if "--profile" in sys.argv:
        # Phase breakdown + XLA flop count + MFU (results and
        # methodology documented in BENCH_NOTES.md).
        from tools.profile_step import main as profile_main
        profile_main()
    else:
        main()
