"""MVS cascade tests: all three engines run 3 stages with random
weights on a synthetic scene and produce consistent outputs.

(No pretrained ckpts in this environment; these tests pin shapes,
probability normalization, depth ranges, and cascade chaining. Weight
porting parity is covered by tools/convert_ckpt.py when ckpts exist.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s_volsdf_tpu.data.synthetic import make_sphere_scene
from s_volsdf_tpu.models.mvs.casmvsnet import (casmvsnet_features,
                                               casmvsnet_stage,
                                               init_casmvsnet)
from s_volsdf_tpu.models.mvs.ucsnet import (init_ucsnet, ucsnet_features,
                                            ucsnet_stage)
from s_volsdf_tpu.models.mvs.transmvsnet import (init_transmvsnet,
                                                 transmvsnet_features,
                                                 transmvsnet_stage)

H = W = 64
NDEPTHS = (16, 8, 8)
DMIN, DMAX = 1.0, 4.0


@pytest.fixture(scope="module")
def mvs_inputs():
    scene = make_sphere_scene(n_views=3, img_res=(H, W))
    imgs = jnp.asarray(scene.images)  # (3, H, W, 3)
    # Stage proj matrices: [extrinsic(w2c), scaled-K] pairs
    # (datasets/general_eval.py:256-265 convention).
    proj = {}
    for s, scale in enumerate((4, 2, 1)):
        mats = []
        for v in range(3):
            extr = np.linalg.inv(scene.poses[v])
            K = scene.intrinsics[v].copy()
            K[:2] /= scale
            mats.append(np.stack([extr, K]))
        proj[f"stage{s + 1}"] = jnp.asarray(np.stack(mats))  # (3,2,4,4)
    depth_range = jnp.linspace(DMIN, DMAX, 192)
    return imgs, proj, depth_range


def _check_stage(out, stage_idx):
    scale = (4, 2, 1)[stage_idx]
    hs, ws = H // scale, W // scale
    D = NDEPTHS[stage_idx]
    assert out["depth"].shape == (hs, ws)
    assert out["prob_volume"].shape == (D, hs, ws)
    assert out["photometric_confidence"].shape == (hs, ws)
    pv = np.asarray(out["prob_volume"])
    np.testing.assert_allclose(pv.sum(0), 1.0, atol=1e-4)
    d = np.asarray(out["depth"])
    assert np.isfinite(d).all()
    conf = np.asarray(out["photometric_confidence"])
    assert (conf >= 0).all() and (conf <= 1 + 1e-5).all()


def test_casmvsnet_cascade(mvs_inputs):
    imgs, proj, depth_range = mvs_inputs
    params = init_casmvsnet(jax.random.PRNGKey(0), ndepths=NDEPTHS)
    feats = casmvsnet_features(params, imgs)
    assert feats[0]["stage1"].shape == (H // 4, W // 4, 32)
    assert feats[0]["stage3"].shape == (H, W, 8)

    prev_depth = None
    for s in range(3):
        out = casmvsnet_stage(params, s, feats, proj[f"stage{s + 1}"],
                              depth_range, prev_depth, (H, W),
                              ndepths=NDEPTHS)
        _check_stage(out, s)
        prev_depth = out["depth"]
    # Stage-1 depth regression stays within the hypothesis range.
    assert DMIN - 1e-3 <= float(np.asarray(out["depth"]).min())


def test_casmvsnet_depth_feedback(mvs_inputs):
    """The runner replaces cascade depth with VolSDF depth between
    stages (runner.py:239-243) — the stage must accept any (H, W) map."""
    imgs, proj, depth_range = mvs_inputs
    params = init_casmvsnet(jax.random.PRNGKey(0), ndepths=NDEPTHS)
    feats = casmvsnet_features(params, imgs)
    fake_vol_depth = jnp.full((H, W), 2.5)
    out = casmvsnet_stage(params, 1, feats, proj["stage2"], depth_range,
                          fake_vol_depth, (H, W), ndepths=NDEPTHS)
    _check_stage(out, 1)
    d = np.asarray(out["depth"])
    # Hypotheses centered on 2.5 with window 8 * 0.5 * interval.
    interval = (DMAX - DMIN) / 192
    half = NDEPTHS[1] / 2 * 0.5 * interval
    assert (d >= 2.5 - half - 1e-3).all() and (d <= 2.5 + half + 1e-3).all()


def test_ucsnet_cascade(mvs_inputs):
    imgs, proj, depth_range = mvs_inputs
    params = init_ucsnet(jax.random.PRNGKey(0), stage_configs=NDEPTHS)
    feats = ucsnet_features(params, imgs)
    prev_depth, prev_var = None, None
    for s in range(3):
        out = ucsnet_stage(params, s, feats, proj[f"stage{s + 1}"],
                           depth_range, prev_depth, prev_var, (H, W),
                           stage_configs=NDEPTHS)
        _check_stage(out, s)
        assert np.isfinite(np.asarray(out["variance"])).all()
        assert (np.asarray(out["variance"]) >= 0).all()
        prev_depth, prev_var = out["depth"], out["variance"]


def test_transmvsnet_cascade(mvs_inputs):
    imgs, proj, depth_range = mvs_inputs
    params = init_transmvsnet(jax.random.PRNGKey(0), ndepths=NDEPTHS)
    feats = transmvsnet_features(params, imgs)
    assert feats[0]["stage1"].shape == (H // 4, W // 4, 32)
    prev_depth, vw = None, None
    for s in range(3):
        out, vw = transmvsnet_stage(params, s, feats, proj[f"stage{s + 1}"],
                                    depth_range, prev_depth, vw, (H, W),
                                    ndepths=NDEPTHS)
        _check_stage(out, s)
        scale = (4, 2, 1)[s]
        assert vw.shape == (2, H // scale, W // scale)
        prev_depth = out["depth"]
    # WTA depth must be an element of the hypothesis set.
    dv = np.asarray(out["depth_values"])
    d = np.asarray(out["depth"])
    assert np.all(np.min(np.abs(dv - d[None]), axis=0) < 1e-5)
