"""Pipeline dispatch for all three MVS model families: save_scene_depth
in ablate mode (MVS-only, no VolSDF — reference config/base.yaml:39,
runner.py:213-216) must produce depth/confidence PFMs for each of
casmvsnet / ucsnet / transmvsnet, exercising the per-model `extra`
threading (UCSNet variance, TransMVSNet view weights)."""

import os

import numpy as np
import pytest

from s_volsdf_tpu.config import load_config
from s_volsdf_tpu.data.fixtures import make_dtu_fixture
from s_volsdf_tpu.data.io import read_pfm


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mvs_dispatch"))
    make_dtu_fixture(os.path.join(root, "data"), scan_id=106,
                     img_res=(64, 96))
    return root


@pytest.mark.parametrize("model", ["casmvsnet", "ucsnet", "transmvsnet"])
def test_ablate_pipeline_per_model(fixture_root, model):
    data_root = os.path.join(fixture_root, "data")
    cfg = load_config("dtu", overrides=[
        "data_dir_root=" + data_root,
        "dataset.data_dir_root=" + data_root,
        "max_h=64", "max_w=96", "dataset.img_res=[64,96]",
        "mvs.model_name=" + model,
        "mvs.ndepths=[16,8,8]", "mvs.numdepth=16",
        "mvs.x2_mvsres=false",
        "ablate=true",                      # MVS-only, no VolSDF
        "outdir=exps_" + model,
    ])
    from s_volsdf_tpu.engine.runner import save_scene_depth
    save_scene_depth(cfg, "scan106", exps_root=fixture_root)

    out = os.path.join(fixture_root, "exps_" + model, "scan106")
    for v in (25, 22, 28):
        depth, _ = read_pfm(os.path.join(out, f"depth_est/{v:08d}.pfm"))
        conf, _ = read_pfm(os.path.join(out, f"confidence/{v:08d}.pfm"))
        assert depth.shape == (64, 96)
        assert np.isfinite(depth).all(), model
        assert np.isfinite(conf).all() and (conf >= 0).all() \
            and (conf <= 1.0 + 1e-5).all(), model
