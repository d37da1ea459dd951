"""Phase profile of the production VolSDF train step (SURVEY.md §3.2).

Times jitted lax.scan chunks of ablated step variants at the bench
shapes (512 rays, fast=1 sampler, 3 full DTU stage-0 volumes) and
derives per-phase costs by subtraction. Every variant scans over
per-step rngs with a state carry, so nothing is hoisted out of the
loop (fixed inputs get loop-invariant-code-motioned and standalone
probes lie — see memory/tpu-gotchas).

Also reports XLA's own FLOP estimate for the full step program
(`compiled.cost_analysis()`) and an MFU estimate against v5e peak.

Usage: python tools/profile_step.py  (runs on the default backend;
use the TPU for real numbers).
"""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from s_volsdf_tpu.config import load_config
from s_volsdf_tpu.data.synthetic import make_sphere_scene
from s_volsdf_tpu.engine.train_step import (guarded_update, init_train_state,
                                            make_optimizer, pack_for_chunk,
                                            sample_train_batch, _loss_fn)
from s_volsdf_tpu.models.network import init_volsdf_params, render_rays
from s_volsdf_tpu.ops.cost_mapping import MVSVolumes, cost_mapping

V5E_BF16_PEAK = 394e12 / 2.0  # 197 TFLOP/s bf16, 98.5 f32 (v5e, per chip)

N_STEPS = 200
TRIALS = 3


def build_inputs():
    cfg = load_config("dtu")
    scene = make_sphere_scene(n_views=3, img_res=(cfg.max_h, cfg.max_w))
    params = init_volsdf_params(jax.random.PRNGKey(0), cfg.model)
    tx = make_optimizer(cfg)
    state = init_train_state(cfg, params, tx)
    D, Hc, Wc = 192, 288, 384
    prob = jax.random.uniform(jax.random.PRNGKey(1), (3, D, Hc, Wc))
    prob = prob / prob.sum(axis=1, keepdims=True)
    z_slab = jnp.stack([jnp.full((3, Hc, Wc), 0.5),
                        jnp.full((3, Hc, Wc), 5.0)], axis=1)
    mvs = MVSVolumes(prob=prob, z_slab=z_slab,
                     intrinsics=jnp.asarray(scene.intrinsics),
                     c2w=jnp.asarray(scene.poses),
                     img_res=scene.img_res, inverse_depth=False)
    packed = pack_for_chunk(cfg, mvs)
    scene_dev = {
        "rgb": jnp.asarray(scene.images.reshape(3, -1, 3)),
        "rgb_smooth": jnp.asarray(scene.images.reshape(3, -1, 3)),
        "poses": jnp.asarray(scene.poses),
        "intrinsics": jnp.asarray(scene.intrinsics),
    }
    return cfg, tx, state, scene_dev, packed


def timed_scan(body, state, aux, label, results):
    """Scan `body(aux, carry, rng) -> (carry, out)` N_STEPS times,
    TRIALS x. `aux` (scene/volumes) rides in as a program PARAMETER —
    closing over device arrays would bake them into the HLO as
    constants (and blow the remote-compile request size)."""
    fn = jax.jit(lambda a, s, rngs: jax.lax.scan(
        lambda c, r: body(a, c, r), s, rngs))
    rngs = jax.random.split(jax.random.PRNGKey(2), N_STEPS)
    out = fn(aux, state, rngs)
    jax.tree.map(np.asarray, out[1])  # host fetch = hard sync on axon
    t0 = time.perf_counter()
    for t in range(TRIALS):
        out = fn(aux, state,
                 jax.random.split(jax.random.PRNGKey(3 + t), N_STEPS))
        jax.tree.map(np.asarray, out[1])
    ms = (time.perf_counter() - t0) / (TRIALS * N_STEPS) * 1000.0
    results[label] = ms
    print(f"{label:34s} {ms:7.2f} ms/step")
    return fn, rngs


def main():
    cfg, tx, state, scene_dev, packed = build_inputs()
    n_views, img_res = 3, (cfg.max_h, cfg.max_w)
    n_rays = cfg.train.num_pixels
    results = {}

    def make_body(*, use_mvs, do_grad, fwd_only_rgb=False, fast=1):
        def body(aux, st, rng):
            scene, vols = aux
            batch, k = sample_train_batch(
                scene, rng, n_views=n_views, img_res=img_res,
                n_rays=n_rays)
            if do_grad:
                grads, loss_out = jax.grad(_loss_fn, has_aux=True)(
                    st.params, cfg, batch, k,
                    vols if use_mvs else None, st.iter_step)
                st2, loss_out = guarded_update(tx, st, grads, loss_out)
                return st2, loss_out.loss
            if fwd_only_rgb:
                mcfg = dataclasses.replace(
                    cfg.model, compute_dtype=cfg.train.train_compute_dtype,
                    activation_dtype=cfg.train.train_activation_dtype)
                out = render_rays(st.params, mcfg, batch["uv"],
                                  batch["pose"], batch["intrinsics"], k,
                                  training=True, fast=fast)
                extra = 0.0
                if use_mvs:
                    pj, pi, _ = cost_mapping(
                        jax.lax.stop_gradient(out.depth_vals),
                        jax.lax.stop_gradient(out.xyz),
                        batch["view_onehot"], vols)
                    extra = jnp.sum(pj) + jnp.sum(pi)
                return st, jnp.sum(out.rgb_values) + jnp.sum(
                    out.grad_theta) + extra
            loss, loss_out = _loss_fn(st.params, cfg, batch, k,
                                      vols if use_mvs else None,
                                      st.iter_step)
            return st, loss
        return body

    # Sampler-only scan: the no-grad 128-sample SDF eval + inverse CDF.
    from s_volsdf_tpu.models.network import sdf_values
    from s_volsdf_tpu.models.sampler import error_bound_sample
    from s_volsdf_tpu.utils.cameras import get_camera_params

    def sampler_body(aux, st, rng):
        scene, _ = aux
        batch, k = sample_train_batch(
            scene, rng, n_views=n_views, img_res=img_res, n_rays=n_rays)
        mcfg = dataclasses.replace(
            cfg.model, compute_dtype=cfg.train.train_compute_dtype,
            activation_dtype=cfg.train.train_activation_dtype)
        ray_dirs, cam_loc = get_camera_params(
            batch["uv"], batch["pose"], batch["intrinsics"])
        R = ray_dirs.shape[0] * ray_dirs.shape[1]
        rd = ray_dirs.reshape(R, 3)
        cl = jnp.broadcast_to(cam_loc[:, None, :],
                              ray_dirs.shape).reshape(R, 3)
        bs = mcfg.scene_bounding_sphere
        sdf_fn = lambda pts: sdf_values(
            jax.lax.stop_gradient(st.params["sdf"]), mcfg, pts, bs)
        s = error_bound_sample(k, mcfg.sampler, rd, cl, sdf_fn,
                               jnp.asarray(0.1), n_iters=1, training=True,
                               scene_bounding_sphere=bs)
        return st, jnp.sum(s.z_vals)

    aux = (scene_dev, packed)
    timed_scan(sampler_body, state, aux, "sampler_only", results)

    timed_scan(make_body(use_mvs=False, do_grad=False, fwd_only_rgb=True),
               state, aux, "fwd_render (sampler+mlps+eik)", results)
    timed_scan(make_body(use_mvs=True, do_grad=False, fwd_only_rgb=True),
               state, aux, "fwd_render + cost_mapping", results)
    timed_scan(make_body(use_mvs=True, do_grad=False),
               state, aux, "fwd + cost_mapping + loss", results)
    timed_scan(make_body(use_mvs=False, do_grad=True),
               state, aux, "full step, no mvs", results)
    fn_full, rngs = timed_scan(make_body(use_mvs=True, do_grad=True),
                               state, aux, "full step (production)", results)

    full = results["full step (production)"]
    fwd = results["fwd_render (sampler+mlps+eik)"]
    print("\n--- derived phases ---")
    print(f"sampler (no-grad)        {results['sampler_only']:7.2f} ms")
    print(f"main mlps + eik fwd      {fwd - results['sampler_only']:7.2f} ms")
    print(f"cost_mapping fwd         "
          f"{results['fwd_render + cost_mapping'] - fwd:7.2f} ms")
    print(f"loss                     "
          f"{results['fwd + cost_mapping + loss'] - results['fwd_render + cost_mapping']:7.2f} ms")
    print(f"backward + optimizer     "
          f"{full - results['fwd + cost_mapping + loss']:7.2f} ms")
    print(f"mvs fwd total            "
          f"{full - results['full step, no mvs']:7.2f} ms")

    # XLA's own FLOP count for the full production program.
    body = make_body(use_mvs=True, do_grad=True)
    lowered = jax.jit(
        lambda a, s, rngs: jax.lax.scan(
            lambda c, r: body(a, c, r), s, rngs)
    ).lower(aux, state, rngs)
    cost = lowered.compile().cost_analysis()
    if cost:
        # XLA's cost model counts a while-loop body ONCE, so the
        # program total ~= the per-step flop count.
        flops = cost.get("flops", 0.0)
        sustained = flops / (full / 1000.0)
        print(f"\nXLA flops/step: {flops/1e9:.1f} GFLOP "
              f"(scan body counted once)")
        print(f"sustained: {sustained/1e12:.1f} TFLOP/s "
              f"= {100*sustained/V5E_BF16_PEAK:.1f}% of v5e bf16 peak")
    print(f"\nrays/s: {n_rays / (full/1000.0):,.0f}")


if __name__ == "__main__":
    main()
