"""Numerical parity: reference torch CascadeMVSNet vs the JAX rebuild,
weights mapped through tools/convert_ckpt.py.

This is the checkpoint-porting guarantee (SURVEY.md hard-part #6): if
random reference weights transfer bit-for-purpose, pretrained ckpts do
too. The reference model code is imported from /root/reference with its
missing deps (loguru) stubbed.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _import_reference_casmvsnet():
    from reference_stubs import install_stubs
    install_stubs()
    from models.CasMVSNet import CascadeMVSNet
    return CascadeMVSNet


def _randomize(model, seed=0):
    """Randomize ALL params and BN running stats so layout bugs can't
    hide behind default-initialized (0/1) buffers."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.empty_like(p).uniform_(-0.25, 0.25, generator=g))
        for m in model.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
                m.running_mean.copy_(
                    torch.empty_like(m.running_mean).uniform_(
                        -0.3, 0.3, generator=g))
                m.running_var.copy_(
                    torch.empty_like(m.running_var).uniform_(
                        0.5, 1.5, generator=g))


@pytest.fixture(scope="module")
def parity_setup():
    import jax.numpy as jnp
    from s_volsdf_tpu.data.synthetic import make_sphere_scene
    from tools.convert_ckpt import convert

    CascadeMVSNet = _import_reference_casmvsnet()
    NDEPTHS = [16, 8, 8]
    model = CascadeMVSNet(refine=False, ndepths=NDEPTHS,
                          depth_interals_ratio=[1, 0.5, 0.5],
                          share_cr=False, cr_base_chs=[8, 8, 8],
                          grad_method="detach")
    model.eval()
    _randomize(model)

    params = convert("casmvsnet", model.state_dict())

    H = W = 64
    scene = make_sphere_scene(n_views=3, img_res=(H, W), cam_radius=2.8)
    imgs = scene.images.astype(np.float32)  # (3, H, W, 3)

    proj = {}
    for s, scale in enumerate((4, 2, 1)):
        mats = []
        for v in range(3):
            extr = np.linalg.inv(scene.poses[v]).astype(np.float32)
            K = scene.intrinsics[v].copy().astype(np.float32)
            K[:2] /= scale
            pm = np.zeros((2, 4, 4), np.float32)
            pm[0] = extr
            pm[1, :3, :3] = K[:3, :3]
            mats.append(pm)
        proj[f"stage{s + 1}"] = np.stack(mats)
    depth_values = np.linspace(1.0, 4.0, 192, dtype=np.float32)

    return model, params, imgs, proj, depth_values, NDEPTHS, (H, W)


def _torch_stage(model, imgs, proj, depth_values, stage_idx, prev_outputs):
    sample = {
        "imgs": torch.from_numpy(imgs.transpose(0, 3, 1, 2))[None],
        "proj_matrices": {k: torch.from_numpy(v)[None]
                          for k, v in proj.items()},
        "depth_values": torch.from_numpy(depth_values)[None],
    }
    with torch.no_grad():
        features = [model.feature(sample["imgs"][:, v])
                    for v in range(3)]
        outputs, _ = model(stage_idx, sample, features=features,
                           extra=None, outputs=prev_outputs,
                           int_r=model.depth_interals_ratio[stage_idx],
                           prevent_oom=False, inverse_depth=False)
    return outputs


def test_feature_net_parity(parity_setup):
    import jax.numpy as jnp
    from s_volsdf_tpu.models.mvs.casmvsnet import feature_net

    model, params, imgs, proj, depth_values, NDEPTHS, hw = parity_setup
    with torch.no_grad():
        t_feats = model.feature(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2)))
    j_feats = feature_net(params["feature"], jnp.asarray(imgs))
    for stage in ("stage1", "stage2", "stage3"):
        t = t_feats[stage].numpy().transpose(0, 2, 3, 1)
        j = np.asarray(j_feats[stage])
        np.testing.assert_allclose(j, t, atol=2e-4,
                                   err_msg=f"feature {stage}")


def test_full_cascade_parity(parity_setup):
    import jax.numpy as jnp
    from s_volsdf_tpu.models.mvs.casmvsnet import (casmvsnet_features,
                                                   casmvsnet_stage)

    model, params, imgs, proj, depth_values, NDEPTHS, (H, W) = parity_setup

    j_feats = casmvsnet_features(params, jnp.asarray(imgs))
    t_outputs = None
    j_prev_depth = None
    for stage_idx in range(3):
        t_outputs = _torch_stage(model, imgs, proj, depth_values,
                                 stage_idx, t_outputs)
        j_out = casmvsnet_stage(
            params, stage_idx, j_feats,
            jnp.asarray(proj[f"stage{stage_idx + 1}"]),
            jnp.asarray(depth_values), j_prev_depth, (H, W),
            ndepths=tuple(NDEPTHS), depth_inter_r=(1.0, 0.5, 0.5))
        j_prev_depth = j_out["depth"]

        t_depth = t_outputs["depth"][0].numpy()
        j_depth = np.asarray(j_out["depth"])
        t_prob = t_outputs["prob_volume"][0].numpy()
        j_prob = np.asarray(j_out["prob_volume"])
        t_conf = t_outputs["photometric_confidence"][0].numpy()
        j_conf = np.asarray(j_out["photometric_confidence"])

        assert j_prob.shape == t_prob.shape
        np.testing.assert_allclose(j_prob, t_prob, atol=5e-3,
                                   err_msg=f"prob stage{stage_idx}")
        drange = float(depth_values.max() - depth_values.min())
        assert np.abs(j_depth - t_depth).max() < 5e-3 * drange, \
            f"depth stage{stage_idx}: " \
            f"{np.abs(j_depth - t_depth).max()}"
        np.testing.assert_allclose(j_conf, t_conf, atol=5e-3,
                                   err_msg=f"conf stage{stage_idx}")
