"""Split TransMVSNet's warm stage-0 wall-clock (36.9 s/scene vs ~7.6
for CasMVSNet/UCSNet, tools/bench_cascade.py) into its parts:

  feat_cache   DCN backbone over all scene images (cacheable)
  fmt          fmt_all_views — the linear-attention transformer,
               once per scene over all samples
  stage0       the similarity cost volume + WTA regularization dispatch
  stage1/2     the upper stages for context

Production x2 shapes (1152x1536, D=192/32/8), random weights, warm
timings on the cached programs (rep 2 of 2). Run on the TPU.

Usage: python tools/probe_trans_stage0.py [small cpu]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_cascade import SMALL_OVERRIDES


def main():
    small = "small" in sys.argv[1:]
    if "cpu" in sys.argv[1:]:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from s_volsdf_tpu.config import load_config, validate_config
    from s_volsdf_tpu.data.fixtures import make_dtu_fixture
    from s_volsdf_tpu.engine.runner import (MVSEngine, _view_mesh,
                                            accumulate_stage,
                                            run_mvs_stage, setup_scene)

    work_root = tempfile.mkdtemp(prefix="probe_trans_")
    data_root = os.path.join(work_root, "data")
    make_dtu_fixture(data_root, scan_id=106,
                     img_res=(64, 96) if small else (576, 768))
    cfg = validate_config(load_config("dtu", overrides=[
        f"data_dir_root={data_root}", f"dataset.data_dir_root={data_root}",
        "opt_stepNs=[0,0,0]", "mvs.model_name=transmvsnet",
    ] + (SMALL_OVERRIDES if small else [])))
    engine = MVSEngine(cfg)

    # Sync = fetch ONE scalar reduced on device: block_until_ready does
    # not synchronize on the axon tunnel, and fetching the full feature
    # pyramids (~GBs) would time the host link, not the compute.
    _sum = jax.jit(lambda t: jax.tree.reduce(
        lambda a, x: a + jnp.sum(x.astype(jnp.float32)),
        t, jnp.float32(0.0)))

    def sync(tree):
        float(_sum(tree))

    for rep in range(2):
        sc = setup_scene(cfg, "scan106", exps_root=work_root)
        samples = sc["samples"]
        label = "warm" if rep else "cold"

        t0 = time.time()
        imgs_all = jnp.asarray(np.stack([s.imgs[0] for s in samples]))
        sc["feat_cache"] = engine.scene_feature_cache(imgs_all)
        sync(sc["feat_cache"])
        t_feat = time.time() - t0

        mesh = _view_mesh(cfg, len(samples))
        t0 = time.time()
        perms = [[sc["trains_i"].index(v) for v in s.view_ids]
                 for s in samples]
        if mesh is not None:
            fmt_feats = engine.fmt_all_views(sc["feat_cache"], perms,
                                             mesh)
        else:
            # Single-device: time the serial per-sample FMT (what the
            # production serial fallback pays per stage).
            fmt_feats = [engine.sample_features(sc["feat_cache"], p)
                         for p in perms]
        sync(fmt_feats)
        t_fmt = time.time() - t0

        stage_s = []
        for stage_idx in range(3):
            t0 = time.time()
            outs, new_extras = run_mvs_stage(cfg, engine, sc, stage_idx)
            stage_s.append(time.time() - t0)
            accumulate_stage(sc, outs, new_extras, stage_idx)

        print(f"[{label}] feat_cache {t_feat:6.2f}s  fmt {t_fmt:6.2f}s  "
              f"stage0 {stage_s[0]:6.2f}s  stage1 {stage_s[1]:6.2f}s  "
              f"stage2 {stage_s[2]:6.2f}s", flush=True)


if __name__ == "__main__":
    main()
