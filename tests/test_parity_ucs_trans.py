"""Parity: reference torch UCSNet / TransMVSNet vs the JAX rebuilds."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _setup_common():
    import jax.numpy as jnp
    from reference_stubs import install_stubs
    install_stubs()
    from s_volsdf_tpu.data.synthetic import make_sphere_scene

    H = W = 64
    scene = make_sphere_scene(n_views=3, img_res=(H, W), cam_radius=2.8)
    imgs = scene.images.astype(np.float32)
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
    return imgs, proj, depth_values, (H, W)


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "conv_offset_mask" in name:
                # keep DCN offsets small so both implementations sample
                # comparable neighborhoods (real ckpts have small
                # offsets; zero-init at train start, dcn.py:63-65)
                p.copy_(torch.empty_like(p).uniform_(-0.01, 0.01,
                                                     generator=g))
            else:
                p.copy_(torch.empty_like(p).uniform_(-0.25, 0.25,
                                                     generator=g))
        for m in model.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
                m.running_mean.copy_(torch.empty_like(
                    m.running_mean).uniform_(-0.3, 0.3, generator=g))
                m.running_var.copy_(torch.empty_like(
                    m.running_var).uniform_(0.5, 1.5, generator=g))


def _sample(imgs, proj, depth_values):
    return {
        "imgs": torch.from_numpy(imgs.transpose(0, 3, 1, 2))[None],
        "proj_matrices": {k: torch.from_numpy(v)[None]
                          for k, v in proj.items()},
        "depth_values": torch.from_numpy(depth_values)[None],
    }


def test_ucsnet_cascade_parity():
    import jax.numpy as jnp
    from tools.convert_ckpt import convert
    from s_volsdf_tpu.models.mvs.ucsnet import ucsnet_features, ucsnet_stage

    imgs, proj, depth_values, (H, W) = _setup_common()
    from models.ucsnet import UCSNet
    NDEPTHS = [16, 8, 8]
    model = UCSNet(stage_configs=NDEPTHS, lamb=1.5)
    model.eval()
    _randomize(model)
    params = convert("ucsnet", model.state_dict())

    sample = _sample(imgs, proj, depth_values)
    with torch.no_grad():
        t_feats = [model.feature_extraction(sample["imgs"][:, v])
                   for v in range(3)]
    j_feats = ucsnet_features(params, jnp.asarray(imgs))
    for st in ("stage1", "stage2", "stage3"):
        t = t_feats[0][st].numpy().transpose(0, 2, 3, 1)[0]
        np.testing.assert_allclose(np.asarray(j_feats[0][st]), t,
                                   atol=3e-4, err_msg=f"feat {st}")

    t_outputs, t_extra = None, None
    j_depth, j_var = None, None
    for stage_idx in range(3):
        with torch.no_grad():
            t_outputs, t_extra = model(
                stage_idx, sample, features=t_feats, extra=t_extra,
                outputs=t_outputs, int_r=None)
        j_out = ucsnet_stage(
            params, stage_idx, j_feats,
            jnp.asarray(proj[f"stage{stage_idx + 1}"]),
            jnp.asarray(depth_values), j_depth, j_var, (H, W),
            stage_configs=tuple(NDEPTHS))
        j_depth, j_var = j_out["depth"], j_out["variance"]

        t_prob = t_outputs["prob_volume"][0].numpy()
        np.testing.assert_allclose(np.asarray(j_out["prob_volume"]),
                                   t_prob, atol=5e-3,
                                   err_msg=f"prob stage{stage_idx}")
        t_depth = t_outputs["depth"][0].numpy()
        drange = float(depth_values.max() - depth_values.min())
        assert np.abs(np.asarray(j_out["depth"]) - t_depth).max() \
            < 5e-3 * drange, f"depth stage{stage_idx}"
        t_var = t_outputs["variance"][0].numpy()
        np.testing.assert_allclose(np.asarray(j_out["variance"]), t_var,
                                   atol=2e-2,
                                   err_msg=f"var stage{stage_idx}")


def test_transmvsnet_cascade_parity():
    import jax.numpy as jnp
    from tools.convert_ckpt import convert
    from s_volsdf_tpu.models.mvs.transmvsnet import (transmvsnet_features,
                                                     transmvsnet_stage)

    imgs, proj, depth_values, (H, W) = _setup_common()
    from models.TransMVSNet import TransMVSNet
    NDEPTHS = [16, 8, 8]
    model = TransMVSNet(refine=False, ndepths=NDEPTHS,
                        depth_interals_ratio=[1, 0.5, 0.5],
                        share_cr=False, cr_base_chs=[8, 8, 8],
                        grad_method="detach")
    model.eval()
    _randomize(model)
    params = convert("transmvsnet", model.state_dict())

    sample = _sample(imgs, proj, depth_values)
    with torch.no_grad():
        t_feats = [model.feature(sample["imgs"][:, v]) for v in range(3)]
        t_feats = model.FMT_with_pathway(t_feats)
    j_feats = transmvsnet_features(params, jnp.asarray(imgs))
    for v in range(3):
        for st in ("stage1", "stage2", "stage3"):
            t = t_feats[v][st].detach().numpy().transpose(0, 2, 3, 1)[0]
            np.testing.assert_allclose(
                np.asarray(j_feats[v][st]), t, atol=3e-3,
                err_msg=f"feat view{v} {st}")

    t_outputs, t_vw = None, None
    j_vw = None
    for stage_idx in range(3):
        # Per-stage parity with IDENTICAL inputs: feed the torch
        # previous-stage WTA depth to both sides (argmax tie flips on
        # random weights otherwise amplify through the hypothesis
        # windows).
        t_prev = (jnp.asarray(t_outputs["depth"][0].numpy())
                  if stage_idx > 0 else None)
        with torch.no_grad():
            t_outputs, t_vw = model(
                stage_idx, sample, features=t_feats, extra=t_vw,
                outputs=t_outputs,
                int_r=model.depth_interals_ratio[stage_idx])
        j_out, j_vw = transmvsnet_stage(
            params, stage_idx, j_feats,
            jnp.asarray(proj[f"stage{stage_idx + 1}"]),
            jnp.asarray(depth_values), t_prev, j_vw, (H, W),
            ndepths=tuple(NDEPTHS), depth_inter_r=(1.0, 0.5, 0.5))

        t_prob = t_outputs["prob_volume"][0].numpy()
        np.testing.assert_allclose(np.asarray(j_out["prob_volume"]),
                                   t_prob, atol=1e-5,
                                   err_msg=f"prob stage{stage_idx}")
        np.testing.assert_allclose(
            np.asarray(j_out["depth_values"]),
            t_outputs["depth_values"][0].numpy(), atol=1e-4,
            err_msg=f"depth hypotheses stage{stage_idx}")
        np.testing.assert_allclose(np.asarray(j_vw), t_vw[0].numpy(),
                                   atol=1e-5,
                                   err_msg=f"view weights stage{stage_idx}")
        # WTA depth: random-weight prob volumes are flat to ~1e-7, so
        # exact argmax equality is meaningless (bins tie). Require the
        # reference's chosen bin to be within 1e-5 probability of OUR
        # per-pixel max — i.e. every disagreement is a genuine tie.
        j_prob = np.asarray(j_out["prob_volume"])
        t_depth = t_outputs["depth"][0].numpy()
        dv = np.asarray(j_out["depth_values"])
        t_bin = np.argmin(np.abs(dv - t_depth[None]), axis=0)
        t_bin_prob = np.take_along_axis(j_prob, t_bin[None], axis=0)[0]
        gap = j_prob.max(axis=0) - t_bin_prob
        assert gap.max() < 1e-5, \
            f"non-tie WTA mismatch stage{stage_idx}: {gap.max()}"
