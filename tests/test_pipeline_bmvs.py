"""BlendedMVS-path integration test: BMVS disk layout (hash dirs, cam
txt depth ranges), NeRF++ background model in the training loop,
inverse-depth hypothesis sampling + slab normalization (scan1 is in the
reference's inverse-depth list, runner.py:62-65)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow   # full-pipeline test (see pytest.ini)

from s_volsdf_tpu.config import load_config, per_scene_overrides
from s_volsdf_tpu.data.fixtures import make_bmvs_fixture
from s_volsdf_tpu.data.io import load_ply, read_pfm


@pytest.fixture(scope="module")
def bmvs_run(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bmvs"))
    data_root = os.path.join(root, "data")
    make_bmvs_fixture(data_root, scan_id=1, img_res=(64, 96))

    cfg = load_config("bmvs", overrides=[
        "data_dir_root=" + data_root,
        "dataset.data_dir_root=" + data_root,
        "max_h=64", "max_w=96",
        "dataset.img_res=[64,96]",
        "mvs.ndepths=[16,8,8]", "mvs.numdepth=16",
        "mvs.interval_scale=1.0",
        "mvs.x2_mvsres=false",
        "opt_stepNs=[30,0,0]",
        "train.num_pixels=48",
        "model.implicit.dims=[48,48,48]", "model.implicit.skip_in=[]",
        "model.rendering.dims=[48]", "model.feature_vector_size=48",
        "model.bg.implicit.dims=[48,48,48]", "model.bg.implicit.skip_in=[]",
        "model.bg.feature_vector_size=48", "model.bg.rendering.dims=[48]",
        "model.sampler.N_samples=12", "model.sampler.N_samples_eval=24",
        "model.sampler.N_samples_extra=6",
        "model.sampler.N_samples_inverse_sphere=6",
        "loss.anneal_rgb=10",
        "filter.eval_mask=false",
    ])
    cfg = per_scene_overrides(cfg, "scan1")
    assert cfg.inverse_depth  # reference runner.py:62-65

    from s_volsdf_tpu.engine.runner import pcd_filter, save_scene_depth
    save_scene_depth(cfg, "scan1", exps_root=root)
    plys = pcd_filter(cfg, ["scan1"], exps_root=root)
    return root, cfg, plys


def test_bmvs_outputs(bmvs_run):
    root, cfg, plys = bmvs_run
    out = os.path.join(root, "exps_mvs", "scan1")
    for v in (9, 10, 55):  # scan1 train ids (splits.py)
        depth, _ = read_pfm(os.path.join(out, f"depth_est/{v:08d}.pfm"))
        assert np.isfinite(depth).all()


def test_bmvs_fused_cloud(bmvs_run):
    root, cfg, plys = bmvs_run
    xyz, rgb = load_ply(plys[0])
    assert xyz.shape[0] > 50
    r = np.linalg.norm(xyz, axis=1)
    assert np.median(r) < 800, np.median(r)
