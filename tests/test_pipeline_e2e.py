"""Full-pipeline integration test: disk fixture -> MVS cascade ->
VolSDF optimization -> depth feedback -> PFM outputs -> fused PLY.

This is the CI analog of `python runner.py testlist=scan106` on a
synthetic DTU-layout scene (the reference has no such test)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow   # full-pipeline test (see pytest.ini)

from s_volsdf_tpu.config import load_config
from s_volsdf_tpu.data.fixtures import make_dtu_fixture
from s_volsdf_tpu.data.io import load_ply, read_pfm


@pytest.fixture(scope="module")
def pipeline_run(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pipeline"))
    data_root = os.path.join(root, "data")
    make_dtu_fixture(data_root, scan_id=106, img_res=(64, 96))

    cfg = load_config("dtu", overrides=[
        "data_dir_root=" + data_root,
        "dataset.data_dir_root=" + data_root,
        "max_h=64", "max_w=96",
        "dataset.img_res=[64,96]",
        "mvs.ndepths=[16,8,8]",
        "mvs.numdepth=16",
        "mvs.x2_mvsres=false",
        "opt_stepNs=[40,0,0]",
        "train.num_pixels=64",
        "model.implicit.dims=[64,64,64,64]",
        "model.implicit.skip_in=[]",
        "model.rendering.dims=[64,64]",
        "model.feature_vector_size=64",
        "model.sampler.N_samples=16",
        "model.sampler.N_samples_eval=32",
        "model.sampler.N_samples_extra=8",
        "loss.anneal_rgb=10",
        "filter.eval_mask=false",
        "outdir=exps_mvs", "exps_folder=exps_vsdf",
    ])

    from s_volsdf_tpu.engine.runner import pcd_filter, save_depth
    save_depth(cfg, ["scan106"], exps_root=root)
    plys = pcd_filter(cfg, ["scan106"], exps_root=root)
    return root, cfg, plys


def test_outputs_exist(pipeline_run):
    root, cfg, plys = pipeline_run
    out = os.path.join(root, "exps_mvs", "scan106")
    for v in (25, 22, 28):
        assert os.path.exists(os.path.join(out, f"depth_est/{v:08d}.pfm"))
        assert os.path.exists(os.path.join(out, f"confidence/{v:08d}.pfm"))
        assert os.path.exists(os.path.join(out, f"cams/{v:08d}_cam.txt"))
        assert os.path.exists(os.path.join(out, f"images/{v:08d}.jpg"))


def test_depth_in_scene_range(pipeline_run):
    """Final depth (VolSDF-fed cascade) must live in the DTU-scaled
    metric range of the fixture (world_scale=200, cams at ~2.97)."""
    root, cfg, plys = pipeline_run
    out = os.path.join(root, "exps_mvs", "scan106")
    depth, _ = read_pfm(os.path.join(out, "depth_est/00000025.pfm"))
    assert np.isfinite(depth).all()
    assert depth.min() > 100 and depth.max() < 1500, \
        (depth.min(), depth.max())


def test_fused_ply(pipeline_run):
    root, cfg, plys = pipeline_run
    assert os.path.exists(plys[0])
    xyz, rgb = load_ply(plys[0])
    assert xyz.shape[0] > 100, f"too few fused points: {xyz.shape}"
    assert rgb is not None and rgb.shape == xyz.shape
    # Fused points should sit near the scaled sphere (radius 0.8*200).
    r = np.linalg.norm(xyz, axis=1)
    frac_near = np.mean((r > 80) & (r < 400))
    assert frac_near > 0.5, f"points off-scene: median r={np.median(r)}"


def test_checkpoint_written(pipeline_run):
    root, cfg, plys = pipeline_run
    exp = os.path.join(root, "exps_vsdf", "ours_106")
    runs = os.listdir(exp)
    assert runs
    ck = os.path.join(exp, sorted(runs)[-1], "checkpoints", "latest")
    assert os.path.exists(os.path.join(ck, "state.npz"))


def test_filter_only_refilter(pipeline_run):
    """filter_only mode (reference config/base.yaml:54, runner.py
    __main__): re-fuse already-inferred depths with different filter
    parameters without re-running MVS/VolSDF. A stricter confidence
    threshold must keep a subset of the default fusion's points."""
    root, cfg, plys = pipeline_run
    n_default = load_ply(plys[0])[0].shape[0]

    # Distinct outdir (symlinked to the existing depths) so the
    # re-fusion never overwrites the module fixture's PLY, and drive
    # the REAL dispatch: cli/run.py must skip save_depth when
    # filter_only=true and still run fusion.
    os.makedirs(os.path.join(root, "exps_refilter"), exist_ok=True)
    link = os.path.join(root, "exps_refilter", "scan106")
    if not os.path.exists(link):
        os.symlink(os.path.join(root, "exps_mvs", "scan106"), link)

    import contextlib
    from s_volsdf_tpu.cli import run as run_cli

    @contextlib.contextmanager
    def chdir(d):
        old = os.getcwd()
        os.chdir(d)
        try:
            yield
        finally:
            os.chdir(old)

    with chdir(root):
        run_cli.main([
            "testlist=scan106", "filter_only=true",
            "outdir=exps_refilter",
            "data_dir_root=" + os.path.join(root, "data"),
            "dataset.data_dir_root=" + os.path.join(root, "data"),
            "max_h=64", "max_w=96", "dataset.img_res=[64,96]",
            "mvs.ndepths=[16,8,8]", "mvs.numdepth=16",
            "filter.eval_mask=false",
            "filter.filter_dist=0.5",   # stricter reprojection gate (px)
        ])

    ply2 = os.path.join(root, "exps_refilter", "mvsnet106_l3.ply")
    assert os.path.exists(ply2)
    n_strict = load_ply(ply2)[0].shape[0]
    assert 0 < n_strict <= n_default, (n_strict, n_default)
    # the module fixture's default fusion is untouched
    assert load_ply(plys[0])[0].shape[0] == n_default
