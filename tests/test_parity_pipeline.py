"""Pipeline-level parity vs the reference torch code on the synthetic
DTU fixture (SURVEY.md section 7 parity checkpoints, machine-checked):

  1. MVS data loaders agree (images, stage projections, hypotheses).
  2. Stage-0 probability volumes agree (argmax + values) through the
     real data path with shared (converted) weights.
  3. VolSDF optimization at equal steps: both frameworks train their
     production loss from the same seeded init on the same pixel
     batches; depth maps must correlate and the cross-framework depth
     gap must stay within measured noise-referenced tolerances (see
     test_volsdf_training_parity's docstring for the measurements).
     Renders use fast=1 (the reference's own train-time sampler
     budget): the reference's fast=-1 eval sampler emits NaN depths at
     this toy scale, which our sampler guards against.
  4. Full 3-stage cascade parity for ALL THREE MVS models through the
     production MVSEngine, including the between-stage extra thread,
     plus a transposed-weight canary proving the gate's sensitivity.

The reference torch stack runs on CPU via tests/reference_stubs.py.
Slower than unit tests (~2-3 min) but the only end-to-end accuracy
gate tying the two pipelines together.
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow   # full-pipeline test (see pytest.ini)

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


def _build_torch_mvs(model_name, ndepths):
    """Reference-model construction exactly as runner.py:128-154."""
    if model_name == "casmvsnet":
        from test_parity_casmvsnet import _import_reference_casmvsnet
        CascadeMVSNet = _import_reference_casmvsnet()
        return CascadeMVSNet(refine=False, ndepths=list(ndepths),
                             depth_interals_ratio=[1, 0.5, 0.5],
                             share_cr=False, cr_base_chs=[8, 8, 8],
                             grad_method="detach")
    if model_name == "ucsnet":
        from models.ucsnet import UCSNet
        return UCSNet(stage_configs=list(ndepths), lamb=1.5)
    from models.TransMVSNet import TransMVSNet
    return TransMVSNet(refine=False, ndepths=list(ndepths),
                       depth_interals_ratio=[1, 0.5, 0.5],
                       share_cr=False, cr_base_chs=[8, 8, 8],
                       grad_method="detach")


def _torch_features(model, model_name, sample, n_views):
    """Per-view feature pyramids as the orchestrator computes them
    (reference runner.py:184-197)."""
    with torch.no_grad():
        if model_name == "casmvsnet":
            return [model.feature(sample["imgs"][:, v])
                    for v in range(n_views)]
        if model_name == "ucsnet":
            return [model.feature_extraction(sample["imgs"][:, v])
                    for v in range(n_views)]
        feats = [model.feature(sample["imgs"][:, v])
                 for v in range(n_views)]
        return model.FMT_with_pathway(feats)


def _make_engine(fixture_root, model_name, ndepths, params):
    """Production MVSEngine wired with converted torch weights via the
    checkpoint path (the same loading branch real runs use)."""
    from s_volsdf_tpu.config import load_config
    from s_volsdf_tpu.engine.runner import MVSEngine
    from s_volsdf_tpu.utils import checkpoint as ckpt

    cfg = load_config("dtu")
    cfg.mvs.model_name = model_name
    cfg.mvs.ndepths = tuple(ndepths)
    cfg.mvs.numdepth = ndepths[0]
    cfg.mvs.cr_base_chs = (8, 8, 8)
    cfg.mvs.compute_dtype = "float32"   # bit-parity with torch f32
    cfg.mvs.x2_mvsres = False
    wdir = os.path.join(fixture_root, f"w_{model_name}")
    ckpt.save_state(wdir, params)
    return MVSEngine(cfg, weights_path=wdir), cfg


@pytest.mark.parametrize("model_name",
                         ["casmvsnet", "ucsnet", "transmvsnet"])
def test_cascade_pipeline_parity_3stage(samples, fixture_root, model_name):
    """Full 3-stage cascade through the PRODUCTION MVSEngine on the
    real fixture data path, with converted reference weights — per
    stage: probability volumes agree, and the between-stage `extra`
    thread (UCSNet variance ucsnet.py:471-476; TransMVSNet view
    weights TransMVSNet.py:160-232) matches the torch reference.

    Threading: each side consumes its OWN previous-stage outputs,
    exactly as its production pipeline does — except TransMVSNet's
    prev depth, where both sides get the torch WTA depth (random-
    weight prob volumes are flat, so WTA argmax ties flip arbitrarily;
    see test_parity_ucs_trans.py)."""
    import jax.numpy as jnp
    from test_parity_ucs_trans import _randomize
    from tools.convert_ckpt import convert

    ref_ds, ours_ds = samples
    ndepths = [NDEPTHS, 8, 8]
    model = _build_torch_mvs(model_name, ndepths)
    model.eval()
    _randomize(model)
    params = convert(model_name, model.state_dict())
    engine, cfg = _make_engine(fixture_root, model_name, ndepths, params)

    r, o = ref_ds[0], ours_ds[0]
    sample = {
        "imgs": torch.from_numpy(np.asarray(r["imgs"]))[None],
        "proj_matrices": {k: torch.from_numpy(np.asarray(v))[None]
                          for k, v in r["proj_matrices"].items()},
        "depth_values": torch.from_numpy(
            np.asarray(r["depth_values"]))[None],
    }
    n_views = sample["imgs"].shape[1]
    t_feats = _torch_features(model, model_name, sample, n_views)

    cache = engine.scene_feature_cache(jnp.asarray(o.imgs))
    perm = list(range(n_views))   # sample 0's view order == cache order
    j_feats = engine.sample_features(cache, perm)

    drange = float(np.ptp(np.asarray(r["depth_values"])))
    t_outputs, t_extra = None, None
    j_out, j_extra = None, None
    j_prev_t = None   # torch prev-stage depth (Trans WTA tie dodge)
    for stage_idx in range(3):
        int_r = {"casmvsnet": 1, "ucsnet": None,
                 "transmvsnet": [1, 0.5, 0.5][stage_idx]}[model_name]
        kwargs = (dict(prevent_oom=False, inverse_depth=False)
                  if model_name == "casmvsnet" else {})
        with torch.no_grad():
            t_outputs, t_extra = model(
                stage_idx, sample, features=t_feats, extra=t_extra,
                outputs=t_outputs, int_r=int_r, **kwargs)

        if stage_idx == 0:
            prev_depth = None
        elif model_name == "transmvsnet":
            prev_depth = j_prev_t
        else:
            prev_depth = j_out["depth"]
        j_out, j_extra = engine.stage(
            stage_idx, j_feats,
            jnp.asarray(o.proj_matrices[f"stage{stage_idx + 1}"]),
            jnp.asarray(o.depth_values), prev_depth, j_extra,
            (o.imgs.shape[1], o.imgs.shape[2]), inverse_depth=False)
        j_prev_t = jnp.asarray(t_outputs["depth"][0].numpy())

        t_prob = t_outputs["prob_volume"][0].numpy()
        j_prob = np.asarray(j_out["prob_volume"])
        assert j_prob.shape == t_prob.shape, f"stage{stage_idx}"
        agree = (j_prob.argmax(0) == t_prob.argmax(0)).mean()
        # Trans WTA ties on flat random-weight volumes make exact
        # argmax meaningless there; probability values carry parity.
        if model_name != "transmvsnet":
            assert agree >= 0.98, \
                f"{model_name} stage{stage_idx} argmax {agree:.3f}"
        np.testing.assert_allclose(
            j_prob, t_prob, atol=6e-3,
            err_msg=f"{model_name} prob stage{stage_idx}")
        if model_name != "transmvsnet":
            t_depth = t_outputs["depth"][0].numpy()
            # Sub-bin agreement: regression depth within 0.75x this
            # stage's hypothesis spacing. Random-weight prob volumes
            # are nearly flat, so soft-argmax amplifies f32 conv noise
            # (and the own-threaded prev-depth drift) far above value-
            # level tolerance — but a disagreement below one bin can't
            # move any fusion/confidence decision.
            interval = [1.0, 0.5, 0.5][stage_idx] * drange / NDEPTHS
            assert np.abs(np.asarray(j_out["depth"]) - t_depth).max() \
                < 0.75 * interval, f"{model_name} depth stage{stage_idx}"

        # The extra thread between stages.
        if model_name == "ucsnet":
            np.testing.assert_allclose(
                np.asarray(j_extra), t_extra[0].numpy(), atol=2e-2,
                err_msg=f"ucs variance stage{stage_idx}")
        elif model_name == "transmvsnet":
            np.testing.assert_allclose(
                np.asarray(j_extra), t_extra[0].numpy(), atol=1e-4,
                err_msg=f"trans view weights stage{stage_idx}")
        else:
            assert j_extra is None and t_extra is None


def test_pipeline_gate_catches_transposed_weight(samples, fixture_root):
    """The gate must fail loudly on a layout bug: transpose one conv
    kernel in the converted weights and verify the stage-0 probability
    agreement collapses below the gate's threshold."""
    import jax
    import jax.numpy as jnp
    from test_parity_ucs_trans import _randomize
    from tools.convert_ckpt import convert

    ref_ds, ours_ds = samples
    ndepths = [NDEPTHS, 8, 8]
    model = _build_torch_mvs("casmvsnet", ndepths)
    model.eval()
    _randomize(model)
    params = convert("casmvsnet", model.state_dict())

    # Transpose two spatial dims of the stage-0 cost-reg output conv
    # (DHWIO, 3x3x3): shape-preserving, so only the numbers can catch
    # it — and LATE in the net, where the random-weight cascade (conv
    # weights ~U(-0.25,0.25) are contractive: a perturbation 7 layers
    # from the output is attenuated to ~1e-7) can't wash it out.
    w = jnp.asarray(params["cost_reg"][0]["prob"]["w"])
    assert w.ndim == 5 and w.shape[0] == w.shape[1] > 1
    params["cost_reg"][0]["prob"]["w"] = jnp.swapaxes(w, 0, 1)

    engine, cfg = _make_engine(fixture_root, "casmvsnet", ndepths, params)
    r, o = ref_ds[0], ours_ds[0]
    sample = {
        "imgs": torch.from_numpy(np.asarray(r["imgs"]))[None],
        "proj_matrices": {k: torch.from_numpy(np.asarray(v))[None]
                          for k, v in r["proj_matrices"].items()},
        "depth_values": torch.from_numpy(
            np.asarray(r["depth_values"]))[None],
    }
    t_feats = _torch_features(model, "casmvsnet", sample,
                              sample["imgs"].shape[1])
    with torch.no_grad():
        t_out, _ = model(0, sample, features=t_feats, extra=None,
                         outputs=None, int_r=1, prevent_oom=False,
                         inverse_depth=False)
    cache = engine.scene_feature_cache(jnp.asarray(o.imgs))
    j_feats = engine.sample_features(cache, list(range(o.imgs.shape[0])))
    j_out, _ = engine.stage(
        0, j_feats, jnp.asarray(o.proj_matrices["stage1"]),
        jnp.asarray(o.depth_values), None, None,
        (o.imgs.shape[1], o.imgs.shape[2]), inverse_depth=False)
    t_prob = t_out["prob_volume"][0].numpy()
    j_prob = np.asarray(j_out["prob_volume"])
    mismatch = np.abs(j_prob - t_prob).max()
    assert mismatch > 6e-3, \
        f"transposed weight went undetected (max diff {mismatch})"


def _train_torch(model, cfg, scene, batches, stream_seed: int, mvs=None,
                 per_step=None):
    """Train the reference model in place with its production
    VolSDFLoss + Adam (vsdf.py:92-102); only the per-step torch RNG
    stream (sampler noise, eikonal points) depends on stream_seed.

    per_step: optional callback(step_index) invoked before each
    forward — the common-random-numbers pairing hook
    (tools/paired_jitter.py advances its torch replay feed here).

    With `mvs` (dict of costs/z_mvs/intrinsics/c2w/img_res lists, the
    torch_cost_mapping operand layout), each step also runs the literal
    cost_mapping oracle and trains the GCE term with cfg.loss's
    mvs/gce/confi weights — the reference's use_mvs=True step
    (vsdf.py:206-210)."""
    from volsdf.model.loss import VolSDFLoss
    torch.manual_seed(stream_seed)
    model.train()
    if mvs is None:
        loss_fn = VolSDFLoss(rgb_loss="torch.nn.L1Loss",
                             eikonal_weight=0.1)
    else:
        from test_parity_cost_mapping import torch_cost_mapping
        loss_fn = VolSDFLoss(
            rgb_loss="torch.nn.L1Loss",
            eikonal_weight=cfg.loss.eikonal_weight,
            mvs_weight=cfg.loss.mvs_weight,
            sparse_weight=cfg.loss.sparse_weight,
            anneal_rgb=cfg.loss.anneal_rgb,
            gce=cfg.loss.gce, confi=cfg.loss.confi)
    loss_fn.set_stg(0)   # initializes iter_step (vsdf.py does this)
    opt = torch.optim.Adam(model.parameters(), lr=cfg.train.learning_rate)
    for step_i, (view, uv, rgb) in enumerate(batches):
        if per_step is not None:
            per_step(step_i)
        t_in = {
            "uv": torch.from_numpy(uv)[None],
            "intrinsics": torch.from_numpy(scene.intrinsics[view])[None],
            "pose": torch.from_numpy(scene.poses[view])[None],
        }
        out = model(t_in, fast=1)
        if mvs is not None:
            out["pj"], out["pi"], _ = torch_cost_mapping(
                out["depth_vals"].detach(), out["xyz"].detach(),
                [v == view for v in range(len(mvs["costs"]))],
                mvs["costs"], mvs["z_mvs"], mvs["intrinsics"],
                mvs["c2w"], mvs["img_res"])
        losses = loss_fn(out, {"rgb": torch.from_numpy(rgb)[None]})
        opt.zero_grad()
        losses["loss"].backward()
        # The reference clips global grad norm at 1.0 (vsdf.py:216-217,
        # grad_clip: true in base.yaml) and so does our production
        # optimizer — without it the two trajectories diverge
        # SYSTEMATICALLY (~6x the RNG-stream noise floor).
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
    model.eval()
    return model


@pytest.fixture(scope="module")
def trained_pair(fixture_root):
    """Train torch-reference and ours from the same (seeded) init on
    the same pixel batches (production losses, mvs off), 150 steps
    each — PLUS a second torch run that differs only in its per-step
    RNG stream, which measures the reference's own stochastic noise
    floor for the parity assertions."""
    import copy
    import jax
    import jax.numpy as jnp
    from tools.convert_ckpt import convert
    from s_volsdf_tpu.data.synthetic import make_sphere_scene, sample_rays
    from s_volsdf_tpu.engine.train_step import (init_train_state,
                                                make_optimizer, train_step)

    torch.manual_seed(0)   # deterministic shared init
    model = _build_reference_model()
    sd0 = copy.deepcopy(model.state_dict())
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

    model = _train_torch(model, cfg, scene, batches, stream_seed=100)
    # Stream-noise control: same init, same batches, different torch
    # RNG stream.
    model_b = _build_reference_model()
    model_b.load_state_dict(sd0)
    model_b = _train_torch(model_b, cfg, scene, batches, stream_seed=200)

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
    return model, model_b, state, cfg, scene


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
    """Equal-steps depth parity with MEASURED, data-justified
    tolerances (VERDICT r2 item 6).

    Measurements on this exact fixture (150 steps x 64 rays, seed-0
    init, f32 both sides, grad-clip both sides; mean eval depth 4.86),
    re-measured after the converter aliasing fix
    (test_convert_decouples_from_live_module — the original 0.0057
    figure was taken while the "shared init" silently tracked torch
    arm A's in-place updates):
      * torch-vs-torch, RNG stream only:       0.0008 mean |d-depth|
      * jax-vs-jax, RNG stream only:           0.0007
      * jax-vs-jax, ray-order permutation
        (pure f32 reduction-order rounding):   0.0007
      * ours-vs-torch (same init/batches):     0.0042 vs A / 0.0040
        vs B (= 0.086% of depth)
    The cross-framework gap sits ~5x above the single-framework noise
    envelopes — residual systematic drift from differently-distributed
    sampler draws and op orderings, NOT a layout/semantics bug: the
    transposed-weight canary (below) produces gaps orders of magnitude
    larger, and 1-step losses agree to 4 decimals. Gate: 0.3% of mean
    depth, ~3.5x the measured drift and ~20x the noise floor.
    BASELINE.md's 5% Chamfer bar applies to the full 100k-step
    production protocol on real DTU data, which this environment
    cannot run (PARITY.md known limits); at fixture scale the
    back-projected Chamfer itself fluctuates >10% between the torch
    reference's own RNG streams, so a 5%-ratio assertion here would be
    noise, not signal."""
    from s_volsdf_tpu.utils.cameras import get_camera_params
    import jax.numpy as jnp

    model, model_b, state, cfg, scene = trained_pair
    img_res = (32, 48)
    t_depths, tb_depths, j_depths = [], [], []
    for view in range(3):
        t_depths.append(_torch_depth_map(model, scene, view, img_res))
        tb_depths.append(_torch_depth_map(model_b, scene, view, img_res))
        j_depths.append(_our_depth_map(state, cfg, scene, view, img_res))

    t_all = np.stack(t_depths).ravel()
    tb_all = np.stack(tb_depths).ravel()
    j_all = np.stack(j_depths).ravel()
    corr = np.corrcoef(t_all, j_all)[0, 1]
    assert corr > 0.9, f"depth correlation {corr:.3f}"

    cross_gap = float(np.mean(np.abs(j_all - t_all)))
    noise_gap = float(np.mean(np.abs(tb_all - t_all)))
    depth_scale = float(np.mean(t_all))
    assert cross_gap <= 0.003 * depth_scale, \
        f"ours-vs-torch depth gap {cross_gap:.4f} exceeds 0.3% of " \
        f"mean depth {depth_scale:.2f} (torch stream noise " \
        f"{noise_gap:.4f})"

    # Back-projected Chamfer-to-GT sanity: ours within the torch
    # stream-noise band around the reference value.
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
            pts = np.asarray(loc[0])[None] \
                + depths[view].ravel()[:, None] * np.asarray(dirs[0])
            errs.append(np.clip(np.abs(np.linalg.norm(pts, axis=-1) - r),
                                0, 0.5))
        return float(np.mean(np.concatenate(errs)))

    t_err = cloud_err(t_depths)
    tb_err = cloud_err(tb_depths)
    j_err = cloud_err(j_depths)
    band = max(abs(t_err - tb_err), 0.02)   # measured stream noise
    assert j_err <= max(t_err, tb_err) + band, \
        f"ours {j_err:.4f} vs torch {t_err:.4f}/{tb_err:.4f} " \
        f"(noise band {band:.4f})"
