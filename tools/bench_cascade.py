"""Cascade throughput benchmark for all three MVS models.

Times the production MVS phase (`engine.runner.run_mvs_stage`, i.e.
per-scene feature cache + 3 cascade stages over 3 reference views) at
the reference's production x2 shapes — 1152x1536 images, D=192/32/8
hypothesis planes (reference runner.py:184-207, help.py:47-53) — with
random weights on whatever backend jax selects (run on the TPU for
real numbers). Reports cold (first scene: traces + remote compiles)
and warm (steady-state s/scene) times; the warm number is what the
multi-scene production pipeline pays per scene.

The per-view timing sync is run_mvs_stage's own 2D-map host fetch —
the same fetch the production pipeline does (block_until_ready does
not synchronize on the axon tunnel; big 3D tensors stay on device).

Usage:
  python tools/bench_cascade.py [casmvsnet ucsnet transmvsnet] [reps=3]
  python tools/bench_cascade.py small cpu   # tiny-shape CPU smoke

One JSON line per model:
  {"model": ..., "cold_s": ..., "warm_s_per_scene": ...,
   "stages_warm_s": [s0, s1, s2]}
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


def bench_model(name: str, data_root: str, work_root: str,
                reps: int, small: bool) -> dict:
    from s_volsdf_tpu.config import load_config, validate_config
    from s_volsdf_tpu.engine.runner import (MVSEngine, accumulate_stage,
                                            run_mvs_stage, setup_scene)
    cfg = validate_config(load_config("dtu", overrides=[
        f"data_dir_root={data_root}",
        f"dataset.data_dir_root={data_root}",
        "opt_stepNs=[0,0,0]",
        f"mvs.model_name={name}",
    ] + (SMALL_OVERRIDES if small else [])))
    engine = MVSEngine(cfg)

    exps_root = os.path.join(work_root, name)
    stage_times = []  # [rep][stage]
    for rep in range(reps):
        # Fresh scene state per rep: the warm reps still pay the full
        # per-scene cost (feature cache included) on the cached
        # programs, exactly like scene k>0 of a production run.
        sc = setup_scene(cfg, "scan106", exps_root=exps_root)
        per_stage = []
        for stage_idx in range(3):
            t0 = time.perf_counter()
            outs, new_extras = run_mvs_stage(cfg, engine, sc, stage_idx)
            per_stage.append(time.perf_counter() - t0)
            accumulate_stage(sc, outs, new_extras, stage_idx)
        stage_times.append(per_stage)

    warm = stage_times[-1]
    return {
        "model": name,
        "cold_s": round(sum(stage_times[0]), 2),
        "warm_s_per_scene": round(sum(warm), 2),
        "stages_warm_s": [round(t, 2) for t in warm],
    }


def main():
    small = "small" in sys.argv[1:]
    if "cpu" in sys.argv[1:]:
        # JAX_PLATFORMS=axon is baked into this env at interpreter
        # start; forcing CPU must happen in-process (tests/conftest.py
        # does the same).
        import jax
        jax.config.update("jax_platforms", "cpu")
    names = [a for a in sys.argv[1:]
             if not a.startswith("reps=") and a not in ("small", "cpu")] or [
        "casmvsnet", "ucsnet", "transmvsnet"]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("reps="):
            reps = int(a.split("=")[1])

    work_root = tempfile.mkdtemp(prefix="bench_cascade_")
    data_root = os.path.join(work_root, "data")
    from s_volsdf_tpu.data.fixtures import make_dtu_fixture
    make_dtu_fixture(data_root, scan_id=106,
                     img_res=(64, 96) if small else (576, 768))

    import jax
    print(f"backend={jax.devices()[0].platform} reps={reps} "
          f"small={small}", file=sys.stderr)
    for name in names:
        r = bench_model(name, data_root, work_root, reps, small)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
