"""The reference's full production schedule on TPU: opt_stepNs=
[100000,0,0] (README.md:40-42, config/ours.yaml) at production shapes,
with mid-run kill + resume evidence — VERDICT r2 item 1.

Drives the REAL pipeline pieces: production-scale DTU fixture
(576x768 VolSDF res, x2 MVS res 1152x1536), the jitted cascade stage 0
(random weights — no pretrained ckpt in this env), MVS volumes into
VolTrainer, scan-chunked optimization with TB/checkpoints/renders,
loss/PSNR/beta/guard-trip telemetry appended to a JSONL.

Phases:
  python tools/run_100k.py --exps /tmp/run100k --target 100000 \
      --crash-at 52000       # phase 1: hard-exits (os._exit) mid-run
  python tools/run_100k.py --exps /tmp/run100k --target 100000 \
      --resume               # phase 2: is_continue from latest -> end

BMVS / NeRF++ background variant (inverse-depth hypotheses, inverted-
sphere background samples, config/vol/bmvs.yaml shapes):
  python tools/run_100k.py --preset bmvs --target 10000 --exps /tmp/bmvs

The JSONL rows carry wall-clock so RUNLOG_100K.md can be generated
from them afterwards (tools/summarize_100k.py).
"""

import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exps", default="/tmp/run100k")
    ap.add_argument("--target", type=int, default=100000)
    ap.add_argument("--crash-at", type=int, default=0,
                    help="os._exit(17) once iter_step passes this; NO "
                         "checkpoint is written at the kill site, so "
                         "resume genuinely recovers from the last "
                         "periodic checkpoint")
    ap.add_argument("--crash-save", action="store_true",
                    help="also checkpoint right before the simulated "
                         "kill (weaker evidence; pre-r3 behavior)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--chunk", type=int, default=250)
    ap.add_argument("--log", default=None)
    ap.add_argument("--preset", default="dtu", choices=["dtu", "bmvs"])
    ap.add_argument("--prior", default="gt", choices=["gt", "cascade"],
                    help="MVS regularizer source: 'gt' = informative "
                         "volumes from the fixture's analytic sphere "
                         "(Gaussian bumps around GT depth + noise — "
                         "stands in for a PRETRAINED cascade, so the "
                         "GCE confidence gate trains OPEN); 'cascade' "
                         "= run the random-weight cascade (exercises "
                         "the full stage-0 plumbing but the gate "
                         "closes after ~5k steps; pre-r4 behavior)")
    ap.add_argument("--prior-noise", type=float, default=2.5,
                    help="metric std of per-pixel GT-depth jitter for "
                         "--prior gt (~1 DTU depth interval)")
    ap.add_argument("--prior-sigma", type=float, default=1.5,
                    help="--prior gt bump width in hypothesis "
                         "intervals. 1.5 gives peak prob ~0.24 — a "
                         "deliberately SOFT cascade stand-in. A "
                         "trained cascade peaks 0.5-0.9; on the "
                         "bg-model preset the soft prior leaves the "
                         "per-ray confidence only ~3x above the GCE "
                         "gate (loss confi=1e-3) and the anneal "
                         "boundary becomes a coin-flip (see --seed "
                         "help + RUNLOG_R4). Use ~1.0 with "
                         "--prior-floor 0.02 for realistic peakiness")
    ap.add_argument("--prior-floor", type=float, default=0.05,
                    help="--prior gt uniform background mass")
    ap.add_argument("--gate-rescue", action="store_true",
                    help="loss.gate_rescue=true (TPU-build extra, off "
                         "by default): depth-anchor recovery for the "
                         "anneal-boundary GCE collapse — A/B against "
                         "runs/r4_bmvs_10k_seed0_collapsed.jsonl")
    ap.add_argument("--gate-rescue-weight", type=float, default=0.1)
    ap.add_argument("--no-mvs", action="store_true",
                    help="train WITHOUT the MVS regularizer (same "
                         "seed/schedule) — the A/B control arm")
    ap.add_argument("--seed", type=int, default=None,
                    help="override cfg.seed (the trainer's param-init "
                         "+ ray-sampling RNG). The anneal boundary "
                         "(loss.py:104-105 semantics) is a stochastic "
                         "bifurcation on 3-view fixtures: a bad stream "
                         "can dump all foreground mass into the NeRF++ "
                         "background and close the GCE gate for good "
                         "(conf==0 once every sample leaves the "
                         "hypothesis slab), so runs record their seed")
    args = ap.parse_args()

    os.makedirs(args.exps, exist_ok=True)
    log_path = args.log or os.path.join(args.exps, "run100k.jsonl")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from s_volsdf_tpu.config import load_config, per_scene_overrides
    from s_volsdf_tpu.data.fixtures import make_dtu_fixture
    from s_volsdf_tpu.data.scene_dataset import load_scene
    from s_volsdf_tpu.engine.runner import (MVSEngine, run_mvs_stage,
                                            setup_scene)
    from s_volsdf_tpu.engine.trainer import VolTrainer

    root = os.path.join(args.exps, "data")
    if args.preset == "bmvs":
        from s_volsdf_tpu.data.fixtures import make_bmvs_fixture
        if not os.path.exists(os.path.join(root, "BlendedMVS")):
            print("building production-scale BMVS fixture (576x768)...",
                  flush=True)
            make_bmvs_fixture(root, scan_id=1, img_res=(576, 768))
        scene_name = "scan1"
        overrides = [
            f"data_dir_root={root}", f"dataset.data_dir_root={root}",
            "dataset.img_res=[576,768]",
            f"is_continue={'true' if args.resume else 'false'}",
        ]
    else:
        if not os.path.exists(os.path.join(root, "DTU")):
            print("building production-scale fixture (576x768)...",
                  flush=True)
            # 7 DISTINCT held-out views on the regnerf eval ids so
            # tools/run_flagship.py can score the reference's NVS eval
            # protocol (eval_vsdf.py:205-212) on genuinely unseen views.
            make_dtu_fixture(root, scan_id=106, img_res=(576, 768),
                             n_eval_views=7)
        scene_name = "scan106"
        overrides = [
            f"data_dir_root={root}", f"dataset.data_dir_root={root}",
            "mvs.numdepth=192", "dataset.img_res=[576,768]",
            f"is_continue={'true' if args.resume else 'false'}",
        ]

    if args.seed is not None:
        overrides.append(f"seed={args.seed}")
    if args.gate_rescue:
        overrides += ["loss.gate_rescue=true",
                      f"loss.gate_rescue_weight={args.gate_rescue_weight}"]
    cfg = load_config(args.preset, overrides=overrides)
    cfg = per_scene_overrides(cfg, scene_name)

    t_all = time.time()
    print(f"[{time.strftime('%H:%M:%S')}] setup_scene...", flush=True)
    sc = setup_scene(cfg, scene_name, exps_root=args.exps)
    print(f"[{time.strftime('%H:%M:%S')}] setup done "
          f"({time.time()-t_all:.0f}s)", flush=True)
    trainer: VolTrainer = sc["trainer"]
    trainer.chunk_steps = args.chunk

    start_step = int(trainer.state.iter_step)
    print(f"trainer at step {start_step} (resume={args.resume})",
          flush=True)

    # Stage-0 prob volumes: either the jitted cascade (random weights —
    # no pretrained ckpt in this env) or informative GT-derived volumes
    # (--prior gt) that stand in for a pretrained cascade so the GCE
    # regularizer trains with its gate open (reference loss.py:53-67,
    # runner.py:149-154 loads real ckpts).
    t0 = time.time()
    if args.prior == "cascade":
        engine = MVSEngine(cfg)
        outs, extras = run_mvs_stage(cfg, engine, sc, 0)
    else:
        from s_volsdf_tpu.data.synthetic import gt_prob_volume
        rng_prior = np.random.default_rng(7)
        outs = []
        for i, tid in enumerate(trainer.trains_i):
            s = sc["samples"][i]
            assert s.view_ids[0] == tid
            Hc, Wc = s.imgs.shape[1] // 4, s.imgs.shape[2] // 4
            K = trainer.scene.intrinsics[tid].copy()
            K[0, :] *= Wc / trainer.scene.img_res[1]
            K[1, :] *= Hc / trainer.scene.img_res[0]
            prob, hyp = gt_prob_volume(
                trainer.scene.poses[tid], K, (Hc, Wc), s.depth_values,
                trainer.scale_factor,
                sigma_intervals=args.prior_sigma, floor=args.prior_floor,
                inverse_depth=bool(cfg.inverse_depth),
                depth_noise=args.prior_noise, rng=rng_prior)
            outs.append({"prob_volume": prob,
                         "depth_values": np.broadcast_to(
                             hyp[:, None, None], prob.shape)})
    trainer.stg = 0
    mvs = trainer.get_mvs_input(outs)
    t_cascade = time.time() - t0
    print(f"stage-0 volumes ({args.prior}): {t_cascade:.1f}s", flush=True)

    use_mvs = not args.no_mvs
    run_chunk = trainer._get_loop(use_mvs)
    ti = trainer.trains_i
    scene_dev = {
        "rgb": jnp.asarray(trainer.scene.rgb[ti]),
        "rgb_smooth": jnp.asarray(trainer.scene.rgb_smooth[ti]),
        "poses": jnp.asarray(trainer.scene.poses[ti]),
        "intrinsics": jnp.asarray(trainer.scene.intrinsics[ti]),
    }
    from s_volsdf_tpu.engine.train_step import pack_for_chunk
    mvs_dev = pack_for_chunk(cfg, mvs) if use_mvs else None

    guard_trips = 0
    logf = open(log_path, "a")
    t_compile_probe = time.time()
    first_chunk = True
    while int(trainer.state.iter_step) < args.target:
        n = min(args.chunk, args.target - int(trainer.state.iter_step))
        trainer.rng, sub = jax.random.split(trainer.rng)
        rngs = jax.random.split(sub, n)
        t0 = time.time()
        trainer.state, losses = run_chunk(trainer.state, rngs, scene_dev,
                                          mvs_dev)
        losses = jax.tree.map(np.asarray, losses)
        dt = time.time() - t0
        if first_chunk:
            print(f"first chunk (compile) {dt:.1f}s", flush=True)
            first_chunk = False
        step = int(trainer.state.iter_step)
        guard_trips += int(n - losses.grad_finite.sum())
        beta = float(np.abs(np.asarray(
            trainer.state.params["density"]["beta"])))
        rec = {
            "step": step,
            "n": int(n),
            "loss": round(float(losses.loss[-1]), 5),
            "rgb": round(float(losses.rgb_loss[-1]), 5),
            "eik": round(float(losses.eikonal_loss[-1]), 5),
            "mvs": round(float(losses.mvs_loss[-1]), 5),
            # chunk mean: "gate open" evidence must not rest on the
            # last step alone (the GCE gate is per-ray, loss.py:66)
            "mvs_mean": round(float(losses.mvs_loss.mean()), 6),
            "sparse": round(float(losses.sparse_loss[-1]), 5),
            **({"rescue_mean": round(float(losses.rescue_loss.mean()), 6)}
               if args.gate_rescue else {}),
            "psnr": round(float(losses.psnr[-1]), 3),
            "beta": round(beta, 6),
            "guard_trips": guard_trips,
            "chunk_s": round(dt, 3),
            "wall": round(time.time() - t_all, 1),
            "phase": "resume" if args.resume else "initial",
        }
        logf.write(json.dumps(rec) + "\n")
        logf.flush()
        if step % 5000 < args.chunk:
            print(json.dumps(rec), flush=True)
        if step % (args.chunk * 40) < args.chunk:
            trainer.save_checkpoint()
        if args.crash_at and step >= args.crash_at:
            if args.crash_save:
                trainer.save_checkpoint()
            print(f"simulating hard kill at step {step} "
                  f"(kill-site checkpoint: {args.crash_save})", flush=True)
            logf.close()
            os._exit(17)

    trainer.save_checkpoint()
    trainer.save_checkpoint("epoch_final")

    # Feedback render (the stage-0 -> stage-1 coupling the production
    # pipeline performs after the optimization, runner.py:235-243) +
    # geometry vs the analytic GT sphere for every train view (the
    # synthetic Chamfer stand-in; see sphere_radial_error).
    from s_volsdf_tpu.data.synthetic import sphere_radial_error
    t0 = time.time()
    radial = {}
    depth = None
    for v in ti:
        d = trainer.render_mvs(v)
        if depth is None:
            depth = d
        mean_e, med_e, n = sphere_radial_error(
            trainer.scene.poses[v], trainer.scene.intrinsics[v],
            trainer.scene.img_res, d, trainer.scale_factor)
        radial[int(v)] = {"mean_mm": round(mean_e, 3),
                          "median_mm": round(med_e, 3), "n_px": n}
    t_render = time.time() - t0
    rec = {
        "done": True, "steps": int(trainer.state.iter_step),
        "use_mvs": use_mvs, "prior": args.prior,
        "guard_trips": guard_trips,
        "cascade_s": round(t_cascade, 1),
        "feedback_render_s": round(t_render, 1),
        "total_wall_s": round(time.time() - t_all, 1),
        "depth_range": [float(depth.min()), float(depth.max())],
        "radial_error": radial,
    }
    logf.write(json.dumps(rec) + "\n")
    logf.close()
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
