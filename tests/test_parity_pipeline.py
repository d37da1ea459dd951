"""Pipeline-level parity vs the reference torch code on the synthetic
DTU fixture (SURVEY.md section 7 parity checkpoints, machine-checked):

  1. MVS data loaders agree (images, stage projections, hypotheses).
  2. Stage-0 probability volumes agree (argmax + values) through the
     real data path with shared (converted) weights.
  3. VolSDF optimization at equal steps: both frameworks train their
     production loss from the same init on the same pixel batches;
     rendered depth maps must correlate and the back-projected clouds'
     Chamfer-to-GT must match within 10%. Renders use fast=1 (the
     reference's own train-time sampler budget): the reference's
     fast=-1 eval sampler emits NaN depths at this toy scale, which
     our sampler guards against.

The reference torch stack runs on CPU via tests/reference_stubs.py.
Slower than unit tests (~2-3 min) but the only end-to-end accuracy
gate tying the two pipelines together.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_parity_volsdf import (_build_reference_model, _our_config)  # noqa: E402

SCAN = 106
IMG_RES = (64, 96)
TRAIN_IDS = [25, 22, 28]
NDEPTHS = 16


class _HParams:
    """Minimal stand-in for the reference's hydra args object."""

    def __init__(self, data_dir_root):
        self.data_dir_root = data_dir_root

    def get(self, key, default=None):
        return getattr(self, key, default)


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    from s_volsdf_tpu.data.fixtures import make_dtu_fixture
    root = str(tmp_path_factory.mktemp("pipe_parity"))
    make_dtu_fixture(root, scan_id=SCAN, img_res=IMG_RES)
    return root


@pytest.fixture(scope="module")
def samples(fixture_root):
    """Both loaders on the same fixture."""
    from reference_stubs import install_stubs
    install_stubs()
    from datasets.general_eval import MVSDataset as RefMVSDataset
    from s_volsdf_tpu.data.mvs_dataset import MVSDataset

    mvs_path = os.path.join(fixture_root, "DTU", "mvs_data")
    ref_ds = RefMVSDataset(mvs_path, [f"scan{SCAN}"], "test", 3, "DTU",
                           ndepths=NDEPTHS, interval_scale=1.06,
                           max_h=IMG_RES[0], max_w=IMG_RES[1],
                           trains_i=TRAIN_IDS,
                           args=_HParams(fixture_root))
    ours_ds = MVSDataset(mvs_path, f"scan{SCAN}", 3, "DTU",
                         ndepths=NDEPTHS, interval_scale=1.06,
                         max_h=IMG_RES[0], max_w=IMG_RES[1],
                         trains_i=TRAIN_IDS, data_dir_root=fixture_root,
                         x2_mvsres=False)
    return ref_ds, ours_ds


def test_mvs_loader_parity(samples):
    """Same images, same stage projection matrices, same hypotheses."""
    ref_ds, ours_ds = samples
    assert len(ref_ds) == len(ours_ds) == 3
    for i in range(3):
        r = ref_ds[i]
        o = ours_ds[i]
        r_imgs = np.asarray(r["imgs"]).transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(o.imgs), r_imgs, atol=1e-5)
        for s in ("stage1", "stage2", "stage3"):
            np.testing.assert_allclose(
                np.asarray(o.proj_matrices[s]),
                np.asarray(r["proj_matrices"][s]), rtol=1e-5, atol=1e-4,
                err_msg=f"view {i} {s}")
        np.testing.assert_allclose(np.asarray(o.depth_values),
                                   np.asarray(r["depth_values"]),
                                   rtol=1e-6)


def test_stage0_prob_volume_agreement(samples):
    """Shared random weights (through the checkpoint converter): the
    stage-0 probability volume from the full data path must agree —
    argmax depth bin >= 99% of pixels, values within 5e-3."""
    import jax.numpy as jnp
    from test_parity_casmvsnet import (_import_reference_casmvsnet,
                                       _randomize)
    from tools.convert_ckpt import convert
    from s_volsdf_tpu.models.mvs.casmvsnet import (casmvsnet_features,
                                                   casmvsnet_stage)

    ref_ds, ours_ds = samples
    CascadeMVSNet = _import_reference_casmvsnet()
    nd = [NDEPTHS, 8, 8]
    model = CascadeMVSNet(refine=False, ndepths=nd,
                          depth_interals_ratio=[1, 0.5, 0.5],
                          share_cr=False, cr_base_chs=[8, 8, 8],
                          grad_method="detach")
    model.eval()
    _randomize(model)
    params = convert("casmvsnet", model.state_dict())

    r = ref_ds[0]
    o = ours_ds[0]
    sample = {
        "imgs": torch.from_numpy(np.asarray(r["imgs"]))[None],
        "proj_matrices": {k: torch.from_numpy(np.asarray(v))[None]
                          for k, v in r["proj_matrices"].items()},
        "depth_values": torch.from_numpy(np.asarray(r["depth_values"]))[None],
    }
    with torch.no_grad():
        features = [model.feature(sample["imgs"][:, v]) for v in range(3)]
        t_out, _ = model(0, sample, features=features, extra=None,
                         outputs=None, int_r=1, prevent_oom=False,
                         inverse_depth=False)

    j_feats = casmvsnet_features(params, jnp.asarray(o.imgs))
    j_out = casmvsnet_stage(
        params, 0, j_feats, jnp.asarray(o.proj_matrices["stage1"]),
        jnp.asarray(o.depth_values), None, IMG_RES,
        ndepths=tuple(nd), depth_inter_r=(1.0, 0.5, 0.5))

    t_prob = t_out["prob_volume"][0].numpy()
    j_prob = np.asarray(j_out["prob_volume"])
    assert j_prob.shape == t_prob.shape
    agree = (j_prob.argmax(0) == t_prob.argmax(0)).mean()
    assert agree >= 0.99, f"stage-0 argmax agreement {agree:.3f}"
    np.testing.assert_allclose(j_prob, t_prob, atol=5e-3)


@pytest.fixture(scope="module")
def trained_pair(fixture_root):
    """Train torch-reference and ours from the same init on the same
    pixel batches (production losses, mvs off), 150 steps each."""
    import jax
    import jax.numpy as jnp
    from tools.convert_ckpt import convert
    from s_volsdf_tpu.data.synthetic import make_sphere_scene, sample_rays
    from s_volsdf_tpu.engine.train_step import (init_train_state,
                                                make_optimizer, train_step)

    model = _build_reference_model()
    params = convert("volsdf", model.state_dict(),
                     n_sdf_layers=5, n_rgb_layers=3)
    cfg = _our_config()
    scene = make_sphere_scene(n_views=3, img_res=(32, 48), cam_radius=2.2)

    n_steps, n_rays = 150, 64
    rng_np = np.random.default_rng(11)
    batches = []
    for i in range(n_steps):
        view = int(rng_np.integers(0, 3))
        uv, rgb = sample_rays(scene, rng_np, view, n_rays)
        batches.append((view, uv, rgb))

    # --- torch side: production VolSDFLoss + Adam (vsdf.py:92-102) ---
    from volsdf.model.loss import VolSDFLoss
    model.train()
    loss_fn = VolSDFLoss(rgb_loss="torch.nn.L1Loss", eikonal_weight=0.1)
    loss_fn.set_stg(0)   # initializes iter_step (vsdf.py does this)
    opt = torch.optim.Adam(model.parameters(), lr=cfg.train.learning_rate)
    for view, uv, rgb in batches:
        t_in = {
            "uv": torch.from_numpy(uv)[None],
            "intrinsics": torch.from_numpy(scene.intrinsics[view])[None],
            "pose": torch.from_numpy(scene.poses[view])[None],
        }
        out = model(t_in, fast=1)
        losses = loss_fn(out, {"rgb": torch.from_numpy(rgb)[None]})
        opt.zero_grad()
        losses["loss"].backward()
        opt.step()
    model.eval()

    # --- jax side: production train_step on the same batches ---------
    tx = make_optimizer(cfg)
    state = init_train_state(cfg, params, tx)
    key = jax.random.PRNGKey(5)
    for view, uv, rgb in batches:
        key, sub = jax.random.split(key)
        batch = {
            "uv": jnp.asarray(uv)[None], "rgb": jnp.asarray(rgb)[None],
            "rgb_smooth": jnp.asarray(rgb)[None],
            "pose": jnp.asarray(scene.poses[view])[None],
            "intrinsics": jnp.asarray(scene.intrinsics[view])[None],
            "view_onehot": jnp.zeros((3,)).at[view].set(1.0),
        }
        state, _ = train_step(state, batch, sub, None, cfg=cfg, tx=tx,
                              use_mvs=False)
    return model, state, cfg, scene


def _torch_depth_map(model, scene, view, img_res):
    H, W = img_res
    ys, xs = np.mgrid[0:H, 0:W]
    uv = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)
    depths, accs = [], []
    with torch.no_grad():
        pass  # forward needs grad for eikonal path; eval mode is fine
    for c in range(0, uv.shape[0], 512):
        t_in = {
            "uv": torch.from_numpy(uv[c:c + 512])[None],
            "intrinsics": torch.from_numpy(scene.intrinsics[view])[None],
            "pose": torch.from_numpy(scene.poses[view])[None],
        }
        out = model(t_in, fast=1)
        depths.append(out["depth_values"].detach().numpy().ravel())
    return np.concatenate(depths).reshape(H, W)


def _our_depth_map(state, cfg, scene, view, img_res):
    from s_volsdf_tpu.engine.render import render_image
    maps = render_image(state.params, cfg.model, scene.poses[view],
                        scene.intrinsics[view], img_res, chunk=1024,
                        fast=1)
    return np.asarray(maps["depth"]).reshape(img_res)


def test_volsdf_training_parity(trained_pair):
    """Equal-steps depth maps: correlated (>0.9) and back-projected
    Chamfer-to-GT within 10% of the torch reference."""
    from s_volsdf_tpu.utils.cameras import get_camera_params
    import jax.numpy as jnp

    model, state, cfg, scene = trained_pair
    img_res = (32, 48)
    clouds = {}
    t_depths, j_depths = [], []
    for view in range(3):
        t_d = _torch_depth_map(model, scene, view, img_res)
        j_d = _our_depth_map(state, cfg, scene, view, img_res)
        t_depths.append(t_d)
        j_depths.append(j_d)

    t_all = np.stack(t_depths).ravel()
    j_all = np.stack(j_depths).ravel()
    corr = np.corrcoef(t_all, j_all)[0, 1]
    assert corr > 0.9, f"depth correlation {corr:.3f}"

    # Back-project each view's depth to world points; Chamfer-to-GT
    # sphere (|dist(p) - r| mean) must match within 10%. Stands in for
    # the fused-cloud Chamfer at this scale (fusion masks are parity-
    # tested separately in test_pipeline_e2e).
    H, W = img_res
    ys, xs = np.mgrid[0:H, 0:W]
    uv = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)
    r = scene.sphere_radius

    def cloud_err(depths):
        errs = []
        for view in range(3):
            dirs, loc = get_camera_params(
                jnp.asarray(uv)[None], jnp.asarray(scene.poses[view])[None],
                jnp.asarray(scene.intrinsics[view])[None])
            dirs = np.asarray(dirs[0])
            loc = np.asarray(loc[0])
            pts = loc[None] + depths[view].ravel()[:, None] * dirs
            d = np.abs(np.linalg.norm(pts, axis=-1) - r)
            errs.append(np.clip(d, 0, 0.5))   # outlier clip
        return float(np.mean(np.concatenate(errs)))

    t_err = cloud_err(t_depths)
    j_err = cloud_err(j_depths)
    assert j_err <= t_err * 1.10 + 1e-3, \
        f"ours {j_err:.4f} vs torch {t_err:.4f}"
