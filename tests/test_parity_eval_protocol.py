"""A/B the Chamfer protocol machinery against the reference's exact
math (evals/eval_dtu.py:92-166), re-executed here with the reference's
own tools (sklearn NearestNeighbors; open3d is IO-only and absent).

Covers the three protocol stages on random clouds + a synthetic
ObsMask: (1) the greedy radius-downsample loop, (2) the
bbox/grid/ObsMask crop chain, (3) the clipped NN mean distances and
the ground-plane crop. Our implementation uses scipy cKDTree; the
numbers must be identical (exact masks, distances equal to ~f32/f64
rounding).
"""

import numpy as np
import pytest
import sklearn.neighbors as skln
from scipy.io import savemat

from s_volsdf_tpu.engine.eval_geo import (apply_dtu_crops, chamfer,
                                          crop_above_plane,
                                          downsample_radius)


@pytest.fixture()
def clouds():
    rng = np.random.default_rng(3)
    data = (rng.standard_normal((4000, 3)) * 15).astype(np.float32)
    stl = (rng.standard_normal((5000, 3)) * 15).astype(np.float32)
    return data, stl


def _ref_downsample(data_pcd, thresh):
    """eval_dtu.py:100-116 verbatim (same seeded shuffle as ours)."""
    data_pcd = data_pcd.copy()
    np.random.default_rng(0).shuffle(data_pcd, axis=0)
    nn_engine = skln.NearestNeighbors(n_neighbors=1, radius=thresh,
                                      algorithm="kd_tree", n_jobs=-1)
    nn_engine.fit(data_pcd)
    rnn_idxs = nn_engine.radius_neighbors(data_pcd, radius=thresh,
                                          return_distance=False)
    mask = np.ones(data_pcd.shape[0], dtype=np.bool_)
    for curr, idxs in enumerate(rnn_idxs):
        if mask[curr]:
            mask[idxs] = 0
            mask[curr] = 1
    return data_pcd[mask]


def test_downsample_matches_reference_loop(clouds):
    data, _ = clouds
    ours = downsample_radius(data, radius=2.0)
    ref = _ref_downsample(data, 2.0)
    np.testing.assert_array_equal(ours, ref)


def test_crops_and_distances_match_reference(tmp_path, clouds):
    data, stl = clouds
    # synthetic ObsMask covering a random half of the grid cells
    rng = np.random.default_rng(7)
    BB = np.stack([data.min(0) - 1, data.max(0) + 1]).astype(np.float32)
    Res = np.array([[4.0]])
    shape = np.ceil((BB[1] - BB[0]) / 4.0).astype(int) + 1
    ObsMask = (rng.random(shape) > 0.5).astype(np.uint8)
    obs_file = str(tmp_path / "ObsMask106_10.mat")
    savemat(obs_file, {"ObsMask": ObsMask, "BB": BB, "Res": Res})
    plane_file = str(tmp_path / "Plane106.mat")
    P = np.array([[0.3], [-0.2], [1.0], [2.0]])
    savemat(plane_file, {"P": P})

    # --- reference chain (eval_dtu.py:119-166), verbatim math ---
    patch = 60
    inbound = ((data >= BB[:1] - patch)
               & (data < BB[1:] + patch * 2)).sum(axis=-1) == 3
    data_in = data[inbound]
    data_grid = np.around((data_in - BB[:1]) / Res).astype(np.int32)
    grid_inbound = ((data_grid >= 0)
                    & (data_grid < np.expand_dims(ObsMask.shape, 0))
                    ).sum(axis=-1) == 3
    data_grid_in = data_grid[grid_inbound]
    in_obs = ObsMask[data_grid_in[:, 0], data_grid_in[:, 1],
                     data_grid_in[:, 2]].astype(np.bool_)
    data_in_obs = data_in[grid_inbound][in_obs]

    nn = skln.NearestNeighbors(n_neighbors=1, algorithm="kd_tree")
    nn.fit(stl)
    dist_d2s, _ = nn.kneighbors(data_in_obs, n_neighbors=1,
                                return_distance=True)
    max_dist = 20
    ref_acc = dist_d2s[dist_d2s < max_dist].mean()

    stl_hom = np.concatenate([stl, np.ones_like(stl[:, :1])], -1)
    above = (P.reshape((1, 4)) * stl_hom).sum(-1) > 0
    stl_above = stl[above]
    nn.fit(data_in)
    dist_s2d, _ = nn.kneighbors(stl_above, n_neighbors=1,
                                return_distance=True)
    ref_comp = dist_s2d[dist_s2d < max_dist].mean()

    # --- ours ---
    kept, cropped, kept_idx = apply_dtu_crops(data, obs_file)
    np.testing.assert_array_equal(kept, data_in_obs)
    np.testing.assert_array_equal(cropped, data_in)
    np.testing.assert_array_equal(data[kept_idx], data_in_obs)

    stl_ours, _ = crop_above_plane(stl, plane_file)
    np.testing.assert_array_equal(stl_ours, stl_above)

    res = chamfer(data, stl, downsample=0.0, obsmask_file=obs_file,
                  plane_file=plane_file)
    assert res["acc"] == pytest.approx(float(ref_acc), rel=1e-6)
    assert res["comp"] == pytest.approx(float(ref_comp), rel=1e-6)
    assert res["overall"] == pytest.approx(
        float((ref_acc + ref_comp) / 2), rel=1e-6)
