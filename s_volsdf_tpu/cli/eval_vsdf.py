"""Novel-view / mesh evaluation CLI — mirrors the reference
`python eval_vsdf.py --conf dtu --eval_rendering ...`
(/root/reference/eval_vsdf.py:283-348).

Examples:
  s-volsdf-eval --conf dtu --scan_ids 106 --eval_rendering
  s-volsdf-eval --conf dtu --scan_ids 106 --eval_rendering \
      --result_from default
  s-volsdf-eval --conf dtu --scan_ids 106 --eval_mesh
"""

import argparse
import json
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--conf", default="dtu", choices=["dtu", "bmvs"])
    p.add_argument("--scan_ids", type=int, nargs="+", default=None)
    p.add_argument("--expname", default="ours")
    p.add_argument("--exps_folder", default="exps_vsdf")
    p.add_argument("--evals_folder", default="exps_result")
    p.add_argument("--data_dir_root", default="data_s_volsdf")
    p.add_argument("--checkpoint", default="latest")
    p.add_argument("--timestamp", default="latest",
                   help="specific run-dir timestamp to evaluate")
    p.add_argument("--ckpt_dir", default="",
                   help="explicit run dir (containing checkpoints/)")
    p.add_argument("--split_n_pixels", type=int, default=16384,
                   help="rays per render chunk (reference flag; the "
                        "TPU-sized default is 16384, not 512)")
    p.add_argument("--gpu", default="auto",
                   help="accepted for reference-CLI compatibility; "
                        "ignored (JAX owns device selection)")
    p.add_argument("--eval_rendering", action="store_true")
    p.add_argument("--eval_mesh", action="store_true")
    p.add_argument("--result_from", default="None",
                   choices=["None", "default", "blend"])
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--lpips_weights", default="")
    p.add_argument("--override", nargs="*", default=[])
    opt = p.parse_args()

    from s_volsdf_tpu.config import load_config
    from s_volsdf_tpu.data.scene_dataset import load_scene
    from s_volsdf_tpu.engine.eval_nvs import (eval_rendered_views,
                                              export_mesh, find_checkpoint,
                                              load_trained_params,
                                              render_eval_views)
    from s_volsdf_tpu.utils.logging import get_logger
    logger = get_logger()

    # Default scan lists (eval_vsdf.py:313-319).
    if opt.scan_ids is None:
        opt.scan_ids = ([21, 24, 34, 37, 38, 40, 82, 106, 110, 114, 118]
                        if opt.conf == "dtu" else list(range(1, 10)))

    # --ckpt_dir names ONE run dir; applying it to a scan list would
    # silently evaluate every scan against the same weights.
    if opt.ckpt_dir and len(opt.scan_ids) != 1:
        p.error(f"--ckpt_dir points at a single run dir; pass exactly "
                f"one --scan_ids with it (got {len(opt.scan_ids)} scans)")

    cfg = load_config(opt.conf, overrides=list(opt.override))
    cfg.data_dir_root = opt.data_dir_root
    cfg.dataset.data_dir_root = opt.data_dir_root

    all_results = []
    for scan_id in opt.scan_ids:
        expdir = os.path.join(opt.exps_folder, f"{opt.expname}_{scan_id}")
        ckpt_path = find_checkpoint(expdir, opt.checkpoint,
                                    timestamp=opt.timestamp,
                                    ckpt_dir=opt.ckpt_dir)
        if ckpt_path is None:
            logger.warning(f"no checkpoint for scan{scan_id} in {expdir}")
            continue
        logger.info(f"scan{scan_id}: checkpoint {ckpt_path}")

        scene = load_scene(cfg.dataset.data_dir, tuple(cfg.dataset.img_res),
                           scan_id, -1, cfg.data_dir_root)
        params = load_trained_params(cfg, ckpt_path)

        evaldir = os.path.join(opt.evals_folder,
                               f"{cfg.train.expname}_{scan_id}")
        # Epoch label from checkpoint metadata (rendering_<epoch> dir).
        meta_path = os.path.join(ckpt_path, "meta.json")
        epoch = 0
        if os.path.exists(meta_path):
            epoch = json.load(open(meta_path)).get("epoch", 0)
        images_dir = os.path.join(evaldir, f"rendering_{epoch}")
        os.makedirs(images_dir, exist_ok=True)

        if opt.eval_mesh:
            bbs = os.path.join(cfg.data_dir_root, "DTU", "bbs.npz") \
                if opt.conf == "dtu" else None
            mesh_dir = os.path.join(evaldir, "mesh")
            os.makedirs(mesh_dir, exist_ok=True)
            export_mesh(cfg, scene, params,
                        os.path.join(mesh_dir, f"scan{scan_id}.ply"),
                        resolution=opt.resolution, bbs_file=bbs)

        if opt.eval_rendering:
            if opt.result_from == "None":
                render_eval_views(cfg, scene, params, images_dir,
                                  chunk=opt.split_n_pixels)
            else:
                res = eval_rendered_views(
                    cfg, scene, images_dir, result_from=opt.result_from,
                    lpips_weights=opt.lpips_weights or None)
                all_results.append(res)
                print(f"SCAN {scan_id}:")
                for k in ("psnr", "ssim", "lpips"):
                    m, s = res[f"{k}_mean"], res[f"{k}_std"]
                    if m is not None:
                        print(f"    {k} mean = {m:.4f}, std {s:.4f}")

    if all_results:
        for k in ("psnr", "ssim", "lpips"):
            vals = [r[f"{k}_mean"] for r in all_results
                    if r[f"{k}_mean"] is not None]
            if vals:
                print(f"ALL {k}: {np.mean(vals):.4f}")


if __name__ == "__main__":
    main()
