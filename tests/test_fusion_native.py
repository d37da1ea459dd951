"""Native C++ fusion core == the vectorized-numpy oracle, bit-for-bit
masks and near-bit depth (engine/fusion.py vs native/fusion.cpp)."""

import numpy as np
import pytest

from s_volsdf_tpu.engine.fusion import (_geo_consistency_native,
                                        _load_native,
                                        check_geometric_consistency_np)


def make_pair(seed=0, H=48, W=64):
    rng = np.random.default_rng(seed)
    intr = np.array([[70.0, 0, W / 2], [0, 70.0, H / 2], [0, 0, 1]])

    def extr(angle):
        c, s = np.cos(angle), np.sin(angle)
        E = np.eye(4)
        E[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        E[:3, 3] = [0.1 * angle, 0, 2.5]
        return E

    # Smooth-ish positive depth maps around 2.5.
    base = 2.5 + 0.3 * np.sin(np.linspace(0, 3, W))[None, :] \
        + 0.2 * np.cos(np.linspace(0, 2, H))[:, None]
    depth_ref = (base + 0.05 * rng.standard_normal((H, W))).astype(
        np.float32)
    depth_src = (base + 0.05 * rng.standard_normal((H, W))).astype(
        np.float32)
    # A few zero/invalid pixels.
    depth_ref[rng.random((H, W)) < 0.05] = 0.0
    return depth_ref, intr, extr(0.0), depth_src, intr, extr(0.15)


def test_native_matches_numpy_oracle():
    if _load_native() is None:
        pytest.skip("g++ unavailable")
    for seed in range(3):
        d_ref, K1, E1, d_src, K2, E2 = make_pair(seed)
        m_np, dr_np, xs_np, ys_np = check_geometric_consistency_np(
            d_ref, K1, E1, d_src, K2, E2, 1.0, 0.01)
        m_c, dr_c, xs_c, ys_c = _geo_consistency_native(
            d_ref, K1, E1, d_src, K2, E2, 1.0, 0.01)
        np.testing.assert_array_equal(m_c, m_np)
        np.testing.assert_allclose(dr_c, dr_np, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(xs_c, xs_np, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(ys_c, ys_np, rtol=1e-9, atol=1e-9)


def test_native_loose_thresholds_pass_most():
    if _load_native() is None:
        pytest.skip("g++ unavailable")
    d_ref, K1, E1, d_src, K2, E2 = make_pair(1)
    # Same depth map from the same camera: perfect round trip.
    m, dr, _, _ = _geo_consistency_native(d_ref, K1, E1, d_ref, K1, E1,
                                          1.0, 0.01)
    valid = d_ref > 0
    assert m[valid].mean() > 0.99
    np.testing.assert_allclose(dr[valid], d_ref[valid], rtol=1e-5)
