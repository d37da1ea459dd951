"""Data-path tests: IO round trips + IDR/MVS loaders on a disk fixture."""

import os

import numpy as np
import pytest

from s_volsdf_tpu.data.fixtures import make_dtu_fixture
from s_volsdf_tpu.data.io import (read_camera_parameters, read_pfm, save_pfm,
                                  save_ply, load_ply, write_cam)
from s_volsdf_tpu.data.mvs_dataset import MVSDataset
from s_volsdf_tpu.data.scene_dataset import load_scene
from s_volsdf_tpu.data.splits import (get_eval_ids, get_near_id,
                                      get_trains_ids, scan2hash)


def test_pfm_roundtrip(tmp_path, rng_np):
    img = rng_np.standard_normal((17, 23)).astype(np.float32)
    p = str(tmp_path / "d.pfm")
    save_pfm(p, img)
    back, scale = read_pfm(p)
    np.testing.assert_array_equal(back, img)

    rgb = rng_np.standard_normal((9, 11, 3)).astype(np.float32)
    p2 = str(tmp_path / "c.pfm")
    save_pfm(p2, rgb)
    back2, _ = read_pfm(p2)
    np.testing.assert_array_equal(back2, rgb)


def test_ply_roundtrip(tmp_path, rng_np):
    xyz = rng_np.standard_normal((100, 3)).astype(np.float32)
    rgb = (rng_np.uniform(0, 255, (100, 3))).astype(np.uint8)
    p = str(tmp_path / "pc.ply")
    save_ply(p, xyz, rgb)
    xyz2, rgb2 = load_ply(p)
    np.testing.assert_allclose(xyz2, xyz, atol=1e-6)
    np.testing.assert_array_equal(rgb2, rgb)


def test_cam_txt_roundtrip(tmp_path, rng_np):
    cam = np.zeros((2, 4, 4), np.float32)
    cam[0] = np.eye(4) + 0.01 * rng_np.standard_normal((4, 4)).astype(np.float32)
    cam[1, :3, :3] = [[500, 0, 320], [0, 500, 240], [0, 0, 1]]
    p = str(tmp_path / "cam.txt")
    write_cam(p, cam, near_far=np.array([425.0, 2.5, 192, 905.0]))
    K, extr = read_camera_parameters(p)
    np.testing.assert_allclose(extr, cam[0], rtol=1e-6)
    np.testing.assert_allclose(K, cam[1, :3, :3], rtol=1e-6)


def test_splits_protocol():
    assert get_trains_ids("DTU", "scan106", 3) == [25, 22, 28]
    ev = get_eval_ids("DTU")
    assert len(ev) == 25 and all(e not in (25, 22, 28) for e in ev)
    assert get_trains_ids("BlendedMVS", "scan4", 3) == [11, 39, 53]
    assert len(get_eval_ids("BlendedMVS", 4)) == 12
    assert get_near_id("BlendedMVS", 1, 7) == 55
    assert scan2hash("scan4") == "5b4933abf2b5f44e95de482a"


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data_root"))
    make_dtu_fixture(root, scan_id=106, img_res=(64, 96))
    return root


def test_scene_dataset_loads(fixture_root):
    scene = load_scene("DTU", (64, 96), 106, 3, fixture_root)
    assert scene.n_images == 49
    assert scene.rgb.shape == (49, 64 * 96, 3)
    assert scene.trains_ids() == [25, 22, 28]
    # scale_factor from scale_mat (scene_dataset.py:145).
    assert scene.scale_factor == 200.0
    # Cameras decompose back to the unit-sphere frame: eye sits at
    # radius cam_radius * sqrt(1 + 0.35^2) (synthetic.py ring height)
    # after the scale_mat is divided out.
    d = np.linalg.norm(scene.poses[25][:3, 3])
    assert abs(d - 2.8 * np.sqrt(1 + 0.35 ** 2)) < 0.05, d

    rng = np.random.default_rng(0)
    batch = scene.sample_batch(rng, 64)
    assert batch["uv"].shape == (1, 64, 2)
    assert batch["rgb"].shape == (1, 64, 3)
    assert batch["view_onehot"].shape == (3,)
    assert batch["view_onehot"].sum() == 1.0


def test_mvs_dataset_sample(fixture_root):
    ds = MVSDataset(
        datapath=os.path.join(fixture_root, "DTU", "mvs_data"),
        scan="scan106", nviews=3, data_dir="DTU", ndepths=192,
        interval_scale=1.06, max_h=64, max_w=96,
        trains_i=[25, 22, 28], data_dir_root=fixture_root,
        x2_mvsres=False)
    assert len(ds) == 3
    s = ds[0]
    assert s.view_ids[0] == 25 and set(s.view_ids) == {25, 22, 28}
    V, H, W, _ = s.imgs.shape
    assert V == 3 and H % 32 == 0 and W % 32 == 0
    assert s.depth_values.shape == (192,)
    np.testing.assert_allclose(s.depth_values[0], 425.0)
    # stage scaling: stage3 K = 4x stage1 K (general_eval.py:256-260).
    np.testing.assert_allclose(
        s.proj_matrices["stage3"][:, 1, :2, :],
        s.proj_matrices["stage1"][:, 1, :2, :] * 4)
    # Ref-view extrinsics match the IDR camera (world frame).
    extr = s.proj_matrices["stage1"][0, 0]
    assert np.isfinite(extr).all()


def test_validate_config_catches_bad_invariants():
    from s_volsdf_tpu.config import load_config, validate_config
    validate_config(load_config("dtu"))  # defaults pass
    bad = load_config("dtu", overrides=["mvs.ndepths=[192,32,9]"])
    with pytest.raises(AssertionError):
        validate_config(bad)
    bad2 = load_config("dtu", overrides=["max_h=512"])
    with pytest.raises(AssertionError):
        validate_config(bad2)
    bad3 = load_config("bmvs", overrides=["mvs.interval_scale=1.06"])
    with pytest.raises(AssertionError):
        validate_config(bad3)


def test_load_ply_empty_cloud(tmp_path):
    """A 0-vertex PLY (fusion can legitimately keep nothing) must
    round-trip to an empty (0,3) array, not crash the reader."""
    from s_volsdf_tpu.data.io import load_ply, save_ply
    p = str(tmp_path / "empty.ply")
    save_ply(p, np.zeros((0, 3), np.float32))
    xyz, rgb = load_ply(p)
    assert xyz.shape == (0, 3) and rgb is None
