"""Flagship close-out: fusion -> Chamfer protocol + NVS eval protocol
on the 100k live-prior production run — VERDICT r4 items 2 (missing #1)
and 3 (missing #3).

Runs AFTER tools/run_100k.py trained the scene (phases 1+2 with a
mid-run kill/resume). Loads the latest checkpoint, then:

1. Renders full-res depth for each train view (fast=-1, the feedback
   path), fuses them with the REAL geometric-consistency filter
   (engine/fusion.py = runner.py:301-404 semantics, photo mask free at
   conf=1), writes the PLY, and scores the fused cloud against the
   analytic GT sphere with the REAL Chamfer protocol (0.2 mm radius
   downsample + 20 mm clipped acc/comp, engine/eval_geo.py =
   evals/eval_dtu.py:105-166) in the fixture's mm frame.
2. Renders the held-out eval views (fast=-1 full renders,
   eval_vsdf.py:215-264) and computes the reference's masked
   PSNR/SSIM protocol (eval_vsdf.py:205-212) against the fixture's
   distinct eval-view ground truth (make_dtu_fixture n_eval_views).

Usage (after run_100k.py with the same --exps):
    python tools/run_flagship.py --exps /tmp/run100k \
        --out runs/r5_flagship_eval.json
"""

import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exps", default="/tmp/run100k")
    ap.add_argument("--out", default="runs/r5_flagship_eval.json")
    ap.add_argument("--n-eval", type=int, default=7,
                    help="distinct held-out views the fixture was built "
                         "with (make_dtu_fixture n_eval_views)")
    ap.add_argument("--world-scale", type=float, default=200.0)
    args = ap.parse_args()

    import numpy as np

    from s_volsdf_tpu.config import load_config, per_scene_overrides
    from s_volsdf_tpu.data.splits import get_eval_ids, get_trains_ids
    from s_volsdf_tpu.engine.eval_geo import chamfer
    from s_volsdf_tpu.engine.eval_nvs import eval_rendered_views
    from s_volsdf_tpu.engine.fusion import fuse_views
    from s_volsdf_tpu.engine.render import render_image
    from s_volsdf_tpu.engine.runner import setup_scene
    from s_volsdf_tpu.data.io import save_ply

    root = os.path.join(args.exps, "data")
    cfg = load_config("dtu", overrides=[
        f"data_dir_root={root}", f"dataset.data_dir_root={root}",
        "mvs.numdepth=192", "dataset.img_res=[576,768]",
        "is_continue=true",
    ])
    cfg = per_scene_overrides(cfg, "scan106")

    t_all = time.time()
    sc = setup_scene(cfg, "scan106", exps_root=args.exps)
    trainer = sc["trainer"]
    scene = trainer.scene
    step = int(trainer.state.iter_step)
    print(f"loaded checkpoint at step {step}", flush=True)
    assert step > 0, "no trained checkpoint found under --exps"
    H, W = scene.img_res
    s = trainer.scale_factor
    assert abs(s - args.world_scale) < 1e-3, (s, args.world_scale)

    # ---- 1. fusion + Chamfer protocol ----
    train_ids = get_trains_ids("DTU", "scan106", 3)
    t0 = time.time()
    views = []
    for tid in train_ids:
        depth_mm = trainer.render_mvs(tid)          # metric, far-pushed
        views.append({
            "depth": depth_mm / s,                  # normalized frame
            "confidence": np.ones_like(depth_mm),
            "intrinsics": scene.intrinsics[tid][:3, :3].copy(),
            "extrinsics": np.linalg.inv(scene.poses[tid]),
            "image": scene.rgb[tid].reshape(H, W, 3),
        })
    t_render_depth = time.time() - t0
    xyz, rgb, fstats = fuse_views(views, conf_thresh=0.0, thres_view=1,
                                  filter_dist=1.0, filter_diff=0.01)
    ply_path = os.path.join(args.exps, "fused_flagship.ply")
    save_ply(ply_path, xyz * s, rgb)
    print(f"fused {len(xyz)} points -> {ply_path}", flush=True)

    # GT: uniform sphere samples restricted to the train-camera-visible
    # region (the ObsMask analog; same construction as
    # tools/chamfer_midscale.py).
    rng = np.random.default_rng(0)
    g = rng.normal(size=(1_000_000, 3))
    g = g / np.linalg.norm(g, axis=1, keepdims=True) * 0.8
    visible = np.zeros(len(g), bool)
    for tid in train_ids:
        K, c2w = scene.intrinsics[tid], scene.poses[tid]
        w2c = np.linalg.inv(c2w)
        pc = g @ w2c[:3, :3].T + w2c[:3, 3]
        uvw = pc @ K[:3, :3].T
        u, v_ = uvw[:, 0] / uvw[:, 2], uvw[:, 1] / uvw[:, 2]
        in_img = (uvw[:, 2] > 0) & (u >= 0) & (u < W) & (v_ >= 0) & (v_ < H)
        front = ((g / 0.8) * (c2w[:3, 3] - g)).sum(1) > 0
        visible |= in_img & front
    gt = g[visible]

    cham = chamfer(xyz * s, gt * s, max_dist=20.0, downsample=0.2)
    radial = np.abs(np.linalg.norm(xyz, axis=1) - 0.8) * s
    radial = radial[radial < 20.0]
    print(f"Chamfer: acc={cham['acc']:.4f} comp={cham['comp']:.4f} "
          f"overall={cham['overall']:.4f} mm "
          f"(radial {radial.mean():.4f} mm)", flush=True)

    # ---- 2. NVS eval protocol on the held-out views ----
    eval_ids = get_eval_ids("DTU")[:args.n_eval]
    images_dir = os.path.join(args.exps, "eval_renders")
    os.makedirs(images_dir, exist_ok=True)
    import imageio.v2 as imageio
    t0 = time.time()
    for vid in eval_ids:
        maps = render_image(trainer.state.params, cfg.model,
                            scene.poses[vid], scene.intrinsics[vid],
                            scene.img_res, chunk=16384, fast=-1)
        pred = np.clip(maps["rgb"], 0, 1).reshape(H, W, 3)
        imageio.imwrite(os.path.join(images_dir, f"eval_{vid:03d}.png"),
                        (pred * 255).astype(np.uint8))
        print(f"rendered eval view {vid}", flush=True)
    t_render_eval = time.time() - t0
    nvs = eval_rendered_views(cfg, scene, images_dir)

    out = {
        "step": step,
        "protocol": {
            "img_res": [H, W], "world_scale": s,
            "fusion": {"conf_thresh": 0.0, "thres_view": 1,
                       "filter_dist": 1.0, "filter_diff": 0.01},
            "chamfer": {"downsample_mm": 0.2, "max_dist_mm": 20.0,
                        "gt": f"{int(visible.sum())} visible sphere "
                              "samples"},
            "nvs": {"eval_ids": eval_ids, "fast": -1,
                    "masked_psnr": True, "ssim_data_range": 2.0},
        },
        "fusion_stats": fstats,
        "n_fused_points": int(len(xyz)),
        "chamfer_mm": {k: round(float(cham[k]), 4)
                       for k in ("acc", "comp", "overall")},
        "radial_mm": round(float(radial.mean()), 4),
        "nvs": nvs,
        "wall_s": {"depth_renders": round(t_render_depth, 1),
                   "eval_renders": round(t_render_eval, 1),
                   "total": round(time.time() - t_all, 1)},
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"chamfer_overall_mm": out["chamfer_mm"]["overall"],
                      "psnr": nvs["psnr_mean"], "ssim": nvs["ssim_mean"]}),
          flush=True)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
