"""DTU Chamfer evaluation CLI (reference evals/eval_dtu.py:38-197).

  s-volsdf-eval-dtu --datadir exps_mvs --scan 106 \
      --dataset_dir <DTU official SampleSet/MVS Data>
"""

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datadir", type=str, required=True,
                   help="dir with mvsnetXXX_l3.ply predictions")
    p.add_argument("--dataset_dir", type=str, required=True,
                   help="official DTU dir (ObsMask/, Points/stl/)")
    p.add_argument("--scan", type=int, default=-1)
    p.add_argument("--max_dist", type=float, default=20.0)
    p.add_argument("--downsample", type=float, default=0.2)
    p.add_argument("--mode", default="pcd", choices=["pcd", "mesh"],
                   help="'mesh' samples a predicted mesh PLY first")
    args = p.parse_args()

    from s_volsdf_tpu.engine.eval_geo import eval_dtu_scan

    scans = [21, 24, 34, 37, 38, 40, 82, 106, 110, 114, 118] \
        if args.scan < 0 else [args.scan]

    results = []
    print("scan, acc, comp, overall (mm)")
    for scan in scans:
        ply = os.path.join(args.datadir, f"mvsnet{scan:03d}_l3.ply")
        if not os.path.exists(ply):
            print(f"scan{scan:03d} MISSING {ply}")
            continue
        r = eval_dtu_scan(ply, scan, args.dataset_dir, mode=args.mode,
                          max_dist=args.max_dist,
                          downsample=args.downsample)
        print(f"scan{scan:03d} {r['acc']:.2f} {r['comp']:.2f} "
              f"{r['overall']:.2f}")
        results.append([r["acc"], r["comp"], r["overall"]])
    if results:
        m = np.mean(results, axis=0)
        print(f"mean_err {m[0]:.3f} {m[1]:.3f} {m[2]:.3f}")


if __name__ == "__main__":
    main()
