"""save_depth_multiscene: the joint (lockstep) multi-scene pipeline
must produce the same outputs as the serial per-scene pipeline — each
scene consumes its own RNG stream, so depth PFMs should agree up to
vmap numerics."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow   # full-pipeline test (see pytest.ini)

from s_volsdf_tpu.config import load_config
from s_volsdf_tpu.data.fixtures import make_dtu_fixture
from s_volsdf_tpu.data.io import read_pfm

SCANS = ["scan106", "scan114"]


def _cfg(data_root, outdir):
    return load_config("dtu", overrides=[
        "data_dir_root=" + data_root,
        "dataset.data_dir_root=" + data_root,
        "max_h=64", "max_w=96", "dataset.img_res=[64,96]",
        "mvs.ndepths=[16,8,8]", "mvs.numdepth=16", "mvs.x2_mvsres=false",
        "opt_stepNs=[30,0,0]",
        "train.num_pixels=64",
        "train.render_freq=-1",
        "model.implicit.dims=[32,32]", "model.implicit.skip_in=[]",
        "model.rendering.dims=[32]", "model.feature_vector_size=32",
        "model.sampler.N_samples=8", "model.sampler.N_samples_eval=16",
        "model.sampler.N_samples_extra=4",
        "loss.anneal_rgb=10",
        "parallel.shard_rays=false",
        # This file asserts vmapped-multiscene == serial trajectories;
        # pin f32 training dots so rounding is identical across the
        # differently-fused programs.
        "train.train_compute_dtype=float32",
        "outdir=" + outdir,
    ])


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ms_pipe"))
    data_root = os.path.join(root, "data")
    for scan in SCANS:
        make_dtu_fixture(data_root, scan_id=int(scan[4:]),
                         img_res=(64, 96))
    return root, data_root


def test_multiscene_matches_serial(roots):
    root, data_root = roots

    from s_volsdf_tpu.engine.multiscene import save_depth_multiscene
    from s_volsdf_tpu.engine.runner import save_depth

    cfg_j = _cfg(data_root, "exps_joint")
    save_depth_multiscene(cfg_j, SCANS,
                          exps_root=os.path.join(root, "joint"))

    cfg_s = _cfg(data_root, "exps_serial")
    save_depth(cfg_s, SCANS, exps_root=os.path.join(root, "serial"))

    for scan in SCANS:
        for v in (25, 22, 28):
            dj, _ = read_pfm(os.path.join(root, "joint", "exps_joint",
                                          scan, f"depth_est/{v:08d}.pfm"))
            ds, _ = read_pfm(os.path.join(root, "serial", "exps_serial",
                                          scan, f"depth_est/{v:08d}.pfm"))
            assert np.isfinite(dj).all()
            # Same RNG stream per scene -> near-identical trajectories.
            # vmapped and serial programs fuse differently, so f32
            # rounding can drift a handful of pixels past tolerance
            # over 30 optimization steps; require >=99.5% agreement.
            close = np.isclose(dj, ds, rtol=1e-3, atol=1e-3)
            assert close.mean() > 0.995, \
                f"{scan} view {v}: {100 * (1 - close.mean()):.2f}% mismatch"


def test_multiscene_groups_by_overrides(roots):
    """Scenes with different per-scan overrides must land in separate
    compile groups (loss weights are static in the step)."""
    from s_volsdf_tpu.config import per_scene_overrides
    root, data_root = roots
    cfg = _cfg(data_root, "exps_x")
    # DTU per-scan sparse_weight table: scan37 -> 0.1, scan24 -> 0.0
    # (reference runner.py:46-67) — genuinely different overrides, so
    # the grouping key MUST distinguish them; scan106/114 share the
    # defaults and MUST collapse to one group.
    a = per_scene_overrides(cfg, "scan37")
    b = per_scene_overrides(cfg, "scan24")
    assert repr(a) != repr(b)
    same1 = per_scene_overrides(cfg, "scan106")
    same2 = per_scene_overrides(cfg, "scan114")
    assert repr(same1) == repr(same2)


def test_run_joint_scene_sharded(roots, tmp_path):
    """run_joint with S == n_devices picks the scene-sharded shard_map
    path; all trainers advance and checkpoint."""
    import jax
    from s_volsdf_tpu.data.scene_dataset import load_scene
    from s_volsdf_tpu.engine.multiscene import run_joint
    from s_volsdf_tpu.engine.trainer import VolTrainer

    root, data_root = roots
    S = len(jax.devices())
    assert S == 8
    cfg = _cfg(data_root, "exps_shard")
    scene = load_scene("DTU", (64, 96), 106, cfg.num_view, data_root)
    trainers = [
        VolTrainer(cfg, scene, "scan106",
                   exps_root=str(tmp_path / f"t{s}"))
        for s in range(S)
    ]
    run_joint(trainers, 20, chunk_steps=10)
    for t in trainers:
        assert int(t.state.iter_step) == 20
        assert os.path.exists(os.path.join(t.checkpoints_path, "latest",
                                           "state.npz"))
