"""Multi-scene production throughput: serial save_depth vs the
lockstep multiscene path on real hardware — VERDICT r3 item 7.

Runs the SAME 3-scene production workload (576x768 fixtures, x2 MVS
res, opt_stepNs=[N,0,0]) twice:

  serial    engine.runner.save_depth — the default per-scene loop
            (one shared MVSEngine, reference runner.py:46-71)
  lockstep  engine.multiscene.save_depth_multiscene — S scenes advance
            as one vmapped XLA program on this chip (the mesh-sharded
            variant of the same loop body is what scales scenes
            one-per-chip; parallel/train_parallel.py)

and reports s/scene for each plus the phase split of the lockstep run,
so BENCH_NOTES can state where single-chip lockstep saturates. All
scans share the default per-scan override so the lockstep path trains
them as ONE group (config.per_scene_overrides).

Usage:
  python tools/bench_multiscene.py [steps=1000] [scans=106,110,114]
  python tools/bench_multiscene.py small cpu steps=30   # CPU smoke
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL_OVERRIDES = [  # CI/CPU smoke shapes ("small" arg)
    "max_h=64", "max_w=96", "dataset.img_res=[64,96]",
    "mvs.ndepths=[16,8,8]", "mvs.numdepth=16", "mvs.x2_mvsres=false",
]


def main():
    small = "small" in sys.argv[1:]
    if "cpu" in sys.argv[1:]:
        import jax
        jax.config.update("jax_platforms", "cpu")
    steps = 1000
    scan_ids = [106, 110, 114]
    for a in sys.argv[1:]:
        if a.startswith("steps="):
            steps = int(a.split("=")[1])
        elif a.startswith("scans="):
            scan_ids = [int(s) for s in a.split("=")[1].split(",")]

    from s_volsdf_tpu.config import load_config, validate_config
    from s_volsdf_tpu.data.fixtures import make_dtu_fixture

    work_root = tempfile.mkdtemp(prefix="bench_multiscene_")
    data_root = os.path.join(work_root, "data")
    img_res = (64, 96) if small else (576, 768)
    for sid in scan_ids:
        make_dtu_fixture(data_root, scan_id=sid, img_res=img_res)
    testlist = [f"scan{sid}" for sid in scan_ids]

    def build_cfg():
        return validate_config(load_config("dtu", overrides=[
            f"data_dir_root={data_root}",
            f"dataset.data_dir_root={data_root}",
            f"opt_stepNs=[{steps},0,0]",
            "train.render_freq=1000000", "train.checkpoint_freq=1000000",
        ] + ([f"dataset.img_res=[{img_res[0]},{img_res[1]}]"]
             if not small else SMALL_OVERRIDES)))

    import jax
    print(f"backend={jax.devices()[0].platform} steps={steps} "
          f"scans={testlist} res={img_res}", file=sys.stderr)

    # Serial arm first (it also warms the shared compile cache the way
    # a production run would).
    from s_volsdf_tpu.engine.runner import save_depth
    cfg = build_cfg()
    t0 = time.perf_counter()
    save_depth(cfg, testlist, exps_root=os.path.join(work_root, "serial"))
    serial_s = time.perf_counter() - t0

    from s_volsdf_tpu.engine.multiscene import save_depth_multiscene
    cfg = build_cfg()
    t0 = time.perf_counter()
    save_depth_multiscene(cfg, testlist,
                          exps_root=os.path.join(work_root, "lockstep"))
    lockstep_s = time.perf_counter() - t0

    n = len(testlist)
    print(json.dumps({
        "scenes": n, "steps": steps,
        "res": list(img_res), "x2_mvsres": not small,
        "serial_s_per_scene": round(serial_s / n, 1),
        "lockstep_s_per_scene": round(lockstep_s / n, 1),
        "serial_total_s": round(serial_s, 1),
        "lockstep_total_s": round(lockstep_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
