"""Speed-of-light analysis of the production train step (VERDICT r3
item 5 close-out).

The 11.6-12.0 ms step is 53% backward+optimizer and every recompute
lever measured NEGATIVE (full remat 24.8 ms; dots_saveable /
dots_with_no_batch_dims +3.8 ms each, tools/probe_backward.py; jvp
reordering regressed, round 3) while batch scaling is flat — so the
remaining floor must be pinned by an arithmetic/bandwidth roofline,
not guessed. This tool compiles the exact phase programs that
tools/profile_step.py times (same scanned bodies, same shapes) and
pulls XLA's own `compiled.cost_analysis()` FLOP and bytes-accessed
counts per phase (the scan body is counted ONCE, i.e. per step), then
reports two floors per phase:

  t_mxu  = flops / 197 TFLOP/s     (v5e bf16 peak)
  t_hbm  = bytes / 819 GB/s        (v5e HBM peak)

and speed-of-light = max of the two, vs the measured phase time
(pass --time to re-measure on this run; otherwise supply the
committed BENCH_NOTES table next to the output by hand).

Caveats — measured (see BENCH_NOTES "Speed-of-light close-out"): the
MXU floor is sound, but XLA's bytes-accessed is an UPPER BOUND, not a
floor, for gather-heavy programs: each `take`/gather HLO is charged
its FULL operand (the 763 MB packed corner-cube volumes count once
per lookup), so the cost_mapping phase reports a 20.8 ms "HBM floor"
that the real program beats at 5.4 ms — the corner-pack layout's
whole point is that the step actually touches ~8 MB of those
operands. Treat t_hbm as honest only for phases with no
gather/scatter; the binding constraints on the residual are gather
ISSUE RATE (~300k 8-wide rows/step in cost_mapping) and VPU
elementwise chains, which no byte count models.

Usage: python tools/sol_analysis.py [--time]   (run on the TPU)
"""

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tools.profile_step import (build_inputs, timed_scan, N_STEPS,
                                V5E_BF16_PEAK)
from s_volsdf_tpu.engine.train_step import (guarded_update,
                                            sample_train_batch, _loss_fn)
from s_volsdf_tpu.models.network import render_rays
from s_volsdf_tpu.ops.cost_mapping import cost_mapping

V5E_HBM_GBS = 819e9  # v5e HBM bandwidth, bytes/s


def cost_of(body, aux, state):
    rngs = jax.random.split(jax.random.PRNGKey(2), N_STEPS)
    compiled = jax.jit(
        lambda a, s, r: jax.lax.scan(lambda c, k: body(a, c, k), s, r)
    ).lower(aux, state, rngs).compile()
    c = compiled.cost_analysis()
    if isinstance(c, list):  # older jax returns one dict per device
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def main():
    do_time = "--time" in sys.argv[1:]
    cfg, tx, state, scene_dev, packed = build_inputs()
    n_views, img_res = 3, (cfg.max_h, cfg.max_w)
    n_rays = cfg.train.num_pixels
    kw = dict(n_views=n_views, img_res=img_res, n_rays=n_rays)
    aux = (scene_dev, packed)

    def make_body(*, use_mvs, do_grad, fwd_only_rgb=False):
        def body(a, st, rng):
            scene, vols = a
            batch, k = sample_train_batch(scene, rng, **kw)
            if do_grad:
                grads, loss_out = jax.grad(_loss_fn, has_aux=True)(
                    st.params, cfg, batch, k,
                    vols if use_mvs else None, st.iter_step)
                st2, loss_out = guarded_update(tx, st, grads, loss_out)
                return st2, loss_out.loss
            if fwd_only_rgb:
                mcfg = dataclasses.replace(
                    cfg.model,
                    compute_dtype=cfg.train.train_compute_dtype,
                    activation_dtype=cfg.train.train_activation_dtype)
                out = render_rays(st.params, mcfg, batch["uv"],
                                  batch["pose"], batch["intrinsics"], k,
                                  training=True, fast=1)
                extra = 0.0
                if use_mvs:
                    pj, pi, _ = cost_mapping(
                        jax.lax.stop_gradient(out.depth_vals),
                        jax.lax.stop_gradient(out.xyz),
                        batch["view_onehot"], vols)
                    extra = jnp.sum(pj) + jnp.sum(pi)
                return st, jnp.sum(out.rgb_values) + jnp.sum(
                    out.grad_theta) + extra
            loss, _ = _loss_fn(st.params, cfg, batch, k,
                               vols if use_mvs else None, st.iter_step)
            return st, loss
        return body

    stages = [
        ("fwd_render (sampler+mlps+eik)",
         make_body(use_mvs=False, do_grad=False, fwd_only_rgb=True)),
        ("fwd + cost_mapping",
         make_body(use_mvs=True, do_grad=False, fwd_only_rgb=True)),
        ("fwd + cost_mapping + loss",
         make_body(use_mvs=True, do_grad=False)),
        ("full step (production)",
         make_body(use_mvs=True, do_grad=True)),
    ]

    rows, times = [], {}
    for name, body in stages:
        f, b = cost_of(body, aux, state)
        rows.append((name, f, b))
        print(f"# compiled {name}: {f/1e9:.1f} GFLOP, "
              f"{b/1e6:.1f} MB accessed", flush=True)
        if do_time:
            timed_scan(body, state, aux, name, times)

    print("\n## cumulative programs (XLA cost_analysis, scan body "
          "counted once = per step)")
    print(f"{'program':34s} {'GFLOP':>8s} {'MB':>8s} "
          f"{'t_mxu ms':>9s} {'t_hbm ms':>9s} {'SoL ms':>8s}"
          + ("  meas ms" if do_time else ""))
    for name, f, b in rows:
        t_mxu = f / V5E_BF16_PEAK * 1e3
        t_hbm = b / V5E_HBM_GBS * 1e3
        line = (f"{name:34s} {f/1e9:8.1f} {b/1e6:8.1f} "
                f"{t_mxu:9.2f} {t_hbm:9.2f} {max(t_mxu, t_hbm):8.2f}")
        if do_time:
            line += f"  {times[name]:7.2f}"
        print(line)

    print("\n## phase deltas")
    prev = ("(nothing)", 0.0, 0.0)
    for name, f, b in rows:
        df, db = f - prev[1], b - prev[2]
        t_mxu = df / V5E_BF16_PEAK * 1e3
        t_hbm = db / V5E_HBM_GBS * 1e3
        print(f"{name:34s} +{df/1e9:7.1f} GFLOP +{db/1e6:7.1f} MB  "
              f"SoL {max(t_mxu, t_hbm):6.2f} ms")
        prev = (name, f, b)


if __name__ == "__main__":
    main()
