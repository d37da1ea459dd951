"""Quantify the eval-mode sampler drift at production scale — VERDICT
r4 item 5.

models/sampler.py documents two numerics drifts vs the reference once
the global early exit engages (duplicated-bin pdf sliver; extra-sample
selection over the enlarged z set). They were bounded only by the
2e-4 full-render parity at test scale (24x32, fast=-1). This tool
measures them where the NVS eval protocol actually runs: a 576x768
fast=-1 full render of a TRAINED model, ours vs the literal torch
reference rendering the SAME converted weights, with the production
eval sampler budget (N_samples=64, N_samples_eval=128, extra=32,
eps=0.1, max_total_iters=5) — and logs the per-chunk
converged-iteration histogram so the early-exit path is demonstrably
engaged in the measurement.

Both renders run f32 on CPU (the torch reference is CPU-only here), so
the numbers isolate SAMPLER/renderer numerics, not hardware precision.

Run:  python tools/sampler_drift.py --out runs/SAMPLER_DRIFT.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-steps", type=int, default=800)
    ap.add_argument("--train-res", default="96,128")
    ap.add_argument("--render-res", default="576,768")
    ap.add_argument("--chunk", type=int, default=10000,
                    help="render chunk (the reference's split_n_pixels)")
    ap.add_argument("--row-band", default=None,
                    help="'r0,r1': render only rows [r0,r1) of the "
                    "production-res frame (identical rays both sides; "
                    "full camera geometry, full width). The torch "
                    "reference renders ~2 min per 10k rays on this 1-CPU "
                    "env, so the full 442k-ray frame costs ~1.5 h — a "
                    "contiguous band keeps the measurement at production "
                    "ray geometry and chunking at a committable cost.")
    ap.add_argument("--world-scale", type=float, default=200.0)
    ap.add_argument("--out", default="runs/SAMPLER_DRIFT.json")
    args = ap.parse_args()
    Ht, Wt = (int(x) for x in args.train_res.split(","))
    H, W = (int(x) for x in args.render_res.split(","))

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import torch

    from test_parity_volsdf import MiniConf, _our_config
    from test_parity_pipeline import _train_torch
    from reference_stubs import install_stubs
    from tools.convert_ckpt import convert
    from s_volsdf_tpu.data.synthetic import (gt_prob_volume,
                                             make_sphere_scene, sample_rays)

    install_stubs()
    from volsdf.model.network import VolSDFNetwork

    # Reference model with the PRODUCTION eval sampler budget.
    prod_sampler = dict(near=0.0001, N_samples=64, N_samples_eval=128,
                        N_samples_extra=32, eps=0.1, beta_iters=10,
                        max_total_iters=5)
    torch.manual_seed(0)
    conf = MiniConf({
        "feature_vector_size": 64,
        "scene_bounding_sphere": 3.0,
        "white_bkgd": False,
        "bg_color": [1.0, 1.0, 1.0],
        "implicit_network": dict(
            d_in=3, d_out=1, dims=[64, 64, 64, 64], geometric_init=True,
            bias=0.6, skip_in=(2,), weight_norm=True, multires=6,
            sphere_scale=20.0),
        "rendering_network": dict(
            mode="idr", d_in=9, d_out=3, dims=[64, 64], weight_norm=True,
            multires_view=1),
        "density": dict(params_init={"beta": 0.1}, beta_min=0.0001),
        "ray_sampler": dict(**prod_sampler),
    })
    model = VolSDFNetwork(conf)
    model.eval()

    cfg = _our_config()
    for k, v in prod_sampler.items():
        setattr(cfg.model.sampler, k, v)
    cfg.loss.mvs_weight = 1.0
    cfg.loss.sparse_weight = 0.0
    cfg.loss.anneal_rgb = 0

    # Train the TORCH model (production GCE-regularized protocol, as in
    # tools/chamfer_midscale.py) so the SDF converges and the eval
    # sampler's early exit genuinely engages; then convert the trained
    # weights — both frameworks render the SAME parameters, so every
    # difference below is render/sampler numerics.
    scene = make_sphere_scene(n_views=3, img_res=(Ht, Wt), cam_radius=2.2)
    Hc, Wc = Ht // 4, Wt // 4
    dvals = np.linspace(1.0, 3.4, 48).astype(np.float32)
    rngp = np.random.default_rng(7)
    torch_mvs = {"costs": [], "z_mvs": [], "intrinsics": [], "c2w": [],
                 "img_res": (Ht, Wt)}
    for v in range(3):
        Kc = scene.intrinsics[v].copy()
        Kc[0, :] *= Wc / Wt
        Kc[1, :] *= Hc / Ht
        prob, hyp = gt_prob_volume(scene.poses[v], Kc, (Hc, Wc), dvals,
                                   scale_factor=1.0,
                                   depth_noise=2.5 / args.world_scale,
                                   rng=rngp)
        torch_mvs["costs"].append(torch.from_numpy(prob)[None])
        torch_mvs["z_mvs"].append(torch.from_numpy(np.broadcast_to(
            hyp[:, None, None], prob.shape).copy())[None])
        torch_mvs["intrinsics"].append(torch.from_numpy(scene.intrinsics[v]))
        torch_mvs["c2w"].append(torch.from_numpy(scene.poses[v]))

    rng_np = np.random.default_rng(11)
    batches = []
    for _ in range(args.train_steps):
        view = int(rng_np.integers(0, 3))
        uv, rgb = sample_rays(scene, rng_np, view, 192)
        batches.append((view, uv, rgb))
    t0 = time.time()
    print(f"[{time.strftime('%H:%M:%S')}] training torch "
          f"({args.train_steps} steps @ {Ht}x{Wt})", flush=True)
    model = _train_torch(model, cfg, scene, batches, stream_seed=100,
                         mvs=torch_mvs)
    t_train = time.time() - t0
    params = convert("volsdf", model.state_dict(),
                     n_sdf_layers=5, n_rgb_layers=3)

    # ---- render scene at production res (same cameras, finer grid) --
    rscene = make_sphere_scene(n_views=3, img_res=(H, W), cam_radius=2.2)
    view = 0
    r0, r1 = (0, H) if args.row_band is None else (
        int(x) for x in args.row_band.split(","))
    ys, xs = np.mgrid[r0:r1, 0:W]
    uv_full = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)
    Hb = r1 - r0

    # torch full render, eval protocol chunks (eval_vsdf.py:216-228)
    print(f"[{time.strftime('%H:%M:%S')}] torch render {H}x{W} fast=-1",
          flush=True)
    t0 = time.time()
    t_rgb, t_depth = [], []
    for c in range(0, uv_full.shape[0], args.chunk):
        t_in = {
            "uv": torch.from_numpy(uv_full[c:c + args.chunk])[None],
            "intrinsics": torch.from_numpy(rscene.intrinsics[view])[None],
            "pose": torch.from_numpy(rscene.poses[view])[None],
        }
        out = model(t_in, fast=-1)
        t_rgb.append(out["rgb_values"].detach().numpy())
        t_depth.append(out["depth_values"].detach().numpy().ravel())
        if (c // args.chunk) % 5 == 0:
            print(f"  torch chunk {c // args.chunk + 1}/"
                  f"{(uv_full.shape[0] + args.chunk - 1) // args.chunk}",
                  flush=True)
    t_rgb = np.concatenate(t_rgb).reshape(Hb, W, 3)
    t_depth = np.concatenate(t_depth).reshape(Hb, W)
    t_torch_render = time.time() - t0

    print(f"[{time.strftime('%H:%M:%S')}] ours render {H}x{W} "
          f"rows[{r0}:{r1}] fast=-1", flush=True)
    t0 = time.time()
    from s_volsdf_tpu.engine.render import _render_chunk
    n_rays = uv_full.shape[0]
    n_pad = (-n_rays) % args.chunk
    uv_pad = np.concatenate(
        [uv_full, np.zeros((n_pad, 2), np.float32)], axis=0)
    pose_b = jnp.asarray(rscene.poses[view])[None]
    intr_b = jnp.asarray(rscene.intrinsics[view])[None]
    rng0 = jax.random.PRNGKey(0)
    outs = [_render_chunk(params, jnp.asarray(uv_pad[i:i + args.chunk])[None],
                          pose_b, intr_b, rng0, cfg=cfg.model, fast=-1)
            for i in range(0, uv_pad.shape[0], args.chunk)]
    o_rgb = np.concatenate([np.asarray(o["rgb_values"]).reshape(-1, 3)
                            for o in outs])[:n_rays].reshape(Hb, W, 3)
    o_depth = np.concatenate([np.asarray(o["depth_values"]).ravel()
                              for o in outs])[:n_rays].reshape(Hb, W)
    t_ours_render = time.time() - t0

    # ---- converged-iteration histogram (early-exit evidence) --------
    from s_volsdf_tpu.models.network import get_beta, sdf_values
    from s_volsdf_tpu.models.sampler import error_bound_sample
    from s_volsdf_tpu.utils.cameras import get_camera_params
    import functools

    @functools.partial(jax.jit, static_argnames=())
    def probe(uv_c, pose, intr, key):
        ray_dirs, cam_loc = get_camera_params(uv_c[None], pose[None],
                                              intr[None])
        R = ray_dirs.shape[1]
        ray_dirs = ray_dirs.reshape(R, 3)
        cam_loc = jnp.broadcast_to(cam_loc[:, None, :],
                                   (1, R, 3)).reshape(R, 3)
        sdf_fn = lambda pts: sdf_values(params["sdf"], cfg.model, pts,
                                        cfg.model.scene_bounding_sphere)
        beta0 = get_beta(params["density"], cfg.model.density.beta_min)
        s_out = error_bound_sample(
            key, cfg.model.sampler, ray_dirs, cam_loc, sdf_fn, beta0,
            n_iters=cfg.model.sampler.max_total_iters, training=False,
            scene_bounding_sphere=cfg.model.scene_bounding_sphere)
        return s_out.converged_iter

    hist = {}
    key = jax.random.PRNGKey(0)
    for c in range(0, uv_full.shape[0], args.chunk):
        ci = int(probe(jnp.asarray(uv_full[c:c + args.chunk]),
                       jnp.asarray(rscene.poses[view]),
                       jnp.asarray(rscene.intrinsics[view]), key))
        hist[ci] = hist.get(ci, 0) + 1
    n_chunks = sum(hist.values())
    early = sum(v for k, v in hist.items()
                if k < cfg.model.sampler.max_total_iters)

    # ---- drift metrics ----------------------------------------------
    s = args.world_scale
    hit = np.isfinite(rscene.depths[view])[r0:r1]
    depth_mae_mm = float(np.abs(o_depth - t_depth).mean() * s)
    depth_mae_hit_mm = float(np.abs(o_depth - t_depth)[hit].mean() * s)
    mse = float(np.mean((o_rgb - t_rgb) ** 2))
    rgb_psnr = float(-10.0 * np.log10(mse)) if mse > 0 else float("inf")
    from s_volsdf_tpu.utils.metrics import ssim
    rgb_ssim = float(ssim(np.clip(o_rgb, 0, 1), np.clip(t_rgb, 0, 1),
                          data_range=1.0))

    out = {
        "protocol": {
            "render_res": [H, W], "row_band": [r0, r1],
            "fast": -1, "view": view,
            "sampler": prod_sampler, "chunk": args.chunk,
            "train": {"steps": args.train_steps, "res": [Ht, Wt],
                      "rays": 192, "use_mvs": True},
            "model": "converted trained torch weights, 5x64 SDF + "
                     "3x64 RGB — identical params both sides, f32 CPU",
            "world_scale": s,
        },
        "depth_mae_mm": round(depth_mae_mm, 4),
        "depth_mae_hit_mm": round(depth_mae_hit_mm, 4),
        "rgb_psnr_ours_vs_torch": round(rgb_psnr, 2),
        "rgb_ssim_ours_vs_torch": round(rgb_ssim, 5),
        "converged_iter_histogram": {str(k): v
                                     for k, v in sorted(hist.items())},
        "early_exit_chunk_frac": round(early / n_chunks, 4),
        "wall_s": {"train": round(t_train, 1),
                   "torch_render": round(t_torch_render, 1),
                   "ours_render": round(t_ours_render, 1)},
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("depth_mae_mm", "depth_mae_hit_mm",
                       "rgb_psnr_ours_vs_torch", "rgb_ssim_ours_vs_torch",
                       "early_exit_chunk_frac")}), flush=True)
    print("converged-iter histogram:", out["converged_iter_histogram"],
          flush=True)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
