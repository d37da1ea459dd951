"""End-to-end: VolSDF optimization improves PSNR on a synthetic scene.

The reference has no such test (SURVEY.md section 4); this is the
"synthetic-scene end-to-end" CI gate — small nets, few steps, CPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s_volsdf_tpu.config import Config
from s_volsdf_tpu.data.synthetic import make_sphere_scene, sample_rays
from s_volsdf_tpu.engine.train_step import (init_train_state, make_optimizer,
                                            train_step)
from s_volsdf_tpu.models.network import init_volsdf_params


def tiny_config() -> Config:
    cfg = Config()
    cfg.model.implicit.dims = (64,) * 4
    cfg.model.implicit.skip_in = ()
    cfg.model.rendering.dims = (64, 64)
    cfg.model.feature_vector_size = 64
    cfg.model.scene_bounding_sphere = 3.0
    cfg.model.sampler.N_samples = 24
    cfg.model.sampler.N_samples_eval = 48
    cfg.model.sampler.N_samples_extra = 8
    cfg.train.num_pixels = 64
    cfg.loss.mvs_weight = 0.0
    cfg.loss.sparse_weight = 0.0
    cfg.loss.anneal_rgb = 0
    return cfg


def make_batch(scene, rng_np, view, n_rays):
    uv, rgb = sample_rays(scene, rng_np, view, n_rays)
    return {
        "uv": jnp.asarray(uv)[None],
        "rgb": jnp.asarray(rgb)[None],
        "rgb_smooth": jnp.asarray(rgb)[None],
        "pose": jnp.asarray(scene.poses[view])[None],
        "intrinsics": jnp.asarray(scene.intrinsics[view])[None],
        "view_onehot": jnp.zeros((3,)).at[view].set(1.0),
    }


@pytest.mark.slow
def test_training_reduces_loss():
    cfg = tiny_config()
    scene = make_sphere_scene(n_views=3, img_res=(48, 64))
    rng_np = np.random.default_rng(0)

    params = init_volsdf_params(jax.random.PRNGKey(0), cfg.model)
    tx = make_optimizer(cfg)
    state = init_train_state(cfg, params, tx)

    key = jax.random.PRNGKey(1)
    losses, psnrs = [], []
    for step in range(60):
        view = step % 3
        batch = make_batch(scene, rng_np, view, cfg.train.num_pixels)
        key, sub = jax.random.split(key)
        state, loss_out = train_step(state, batch, sub, None,
                                     cfg=cfg, tx=tx, use_mvs=False)
        losses.append(float(loss_out.loss))
        psnrs.append(float(loss_out.psnr))

    first, last = np.mean(losses[:10]), np.mean(losses[-10:])
    assert np.isfinite(losses).all()
    assert last < first, f"loss did not decrease: {first} -> {last}"
    assert np.mean(psnrs[-10:]) > np.mean(psnrs[:10]), "psnr did not improve"


def _train_psnr(cfg, n_steps=60):
    scene = make_sphere_scene(n_views=3, img_res=(48, 64))
    rng_np = np.random.default_rng(0)
    params = init_volsdf_params(jax.random.PRNGKey(0), cfg.model)
    tx = make_optimizer(cfg)
    state = init_train_state(cfg, params, tx)
    key = jax.random.PRNGKey(1)
    psnrs = []
    for step in range(n_steps):
        batch = make_batch(scene, rng_np, step % 3, cfg.train.num_pixels)
        key, sub = jax.random.split(key)
        state, loss_out = train_step(state, batch, sub, None,
                                     cfg=cfg, tx=tx, use_mvs=False)
        psnrs.append(float(loss_out.psnr))
    assert np.isfinite(psnrs).all()
    return np.mean(psnrs[-10:])


def _gt_volumes(scene, D=32, noise=0.0):
    """Informative MVSVolumes from the analytic sphere (unit frame)."""
    from s_volsdf_tpu.data.synthetic import gt_prob_volume
    from s_volsdf_tpu.ops.cost_mapping import MVSVolumes
    H, W = scene.img_res
    dvals = np.linspace(1.0, 3.4, D).astype(np.float32)
    probs, slabs = [], []
    rng = np.random.default_rng(3)
    for v in range(3):
        prob, hyp = gt_prob_volume(scene.poses[v], scene.intrinsics[v],
                                   (H, W), dvals, scale_factor=1.0,
                                   depth_noise=noise, rng=rng)
        probs.append(prob)
        slabs.append(np.stack([np.full((H, W), hyp[0], np.float32),
                               np.full((H, W), hyp[-1], np.float32)]))
    return MVSVolumes(prob=jnp.asarray(np.stack(probs)),
                      z_slab=jnp.asarray(np.stack(slabs)),
                      intrinsics=jnp.asarray(scene.intrinsics),
                      c2w=jnp.asarray(scene.poses),
                      img_res=scene.img_res, inverse_depth=False)


def test_gt_prob_volume_peaks_at_gt_depth():
    """The synthetic-prior generator: bump argmax lands on the
    hypothesis nearest GT z-depth at hit pixels; miss pixels are flat;
    each pixel's column is a probability distribution."""
    from s_volsdf_tpu.data.synthetic import gt_prob_volume
    scene = make_sphere_scene(n_views=3, img_res=(48, 64))
    H, W = scene.img_res
    dvals = np.linspace(1.0, 3.4, 48).astype(np.float32)
    prob, hyp = gt_prob_volume(scene.poses[0], scene.intrinsics[0],
                               (H, W), dvals, scale_factor=1.0)
    assert prob.shape == (48, H, W)
    np.testing.assert_allclose(prob.sum(axis=0), 1.0, rtol=1e-5)
    gt_z = scene.depths[0]
    hit = np.isfinite(gt_z)
    nearest = np.abs(hyp[:, None, None] - np.where(hit, gt_z, 0.0)
                     ).argmin(axis=0)
    peak = prob.argmax(axis=0)
    assert (np.abs(peak - nearest)[hit] <= 1).mean() > 0.99
    flat = prob[:, ~hit]
    assert np.allclose(flat, flat[0:1], atol=1e-6), "miss pixels not flat"

    # inverse-depth grid: same endpoints, uniform in 1/z.
    prob_i, hyp_i = gt_prob_volume(scene.poses[0], scene.intrinsics[0],
                                   (H, W), dvals, scale_factor=1.0,
                                   inverse_depth=True)
    np.testing.assert_allclose([hyp_i[0], hyp_i[-1]],
                               [dvals[0], dvals[-1]], rtol=1e-5)
    np.testing.assert_allclose(np.diff(1.0 / hyp_i),
                               np.diff(1.0 / hyp_i)[0], rtol=1e-4)


@pytest.mark.slow
def test_gt_prior_opens_gce_gate():
    """With informative volumes (the pretrained-cascade stand-in) the
    GCE confidence gate is OPEN during training: mvs_loss is nonzero
    for most steps and decays as the SDF aligns with the prior —
    unlike random-weight volumes, where it collapses to 0 (round-3
    RUNLOG_100K). Reference mechanism: loss.py:53-67, vsdf.py:382-452."""
    cfg = tiny_config()
    cfg.loss.mvs_weight = 1.0
    cfg.loss.sparse_weight = 1.0
    cfg.loss.anneal_rgb = 30
    scene = make_sphere_scene(n_views=3, img_res=(48, 64))
    mvs = _gt_volumes(scene, noise=0.01)
    rng_np = np.random.default_rng(0)
    params = init_volsdf_params(jax.random.PRNGKey(0), cfg.model)
    tx = make_optimizer(cfg)
    state = init_train_state(cfg, params, tx)
    key = jax.random.PRNGKey(1)
    mvs_losses = []
    for step in range(120):
        batch = make_batch(scene, rng_np, step % 3, cfg.train.num_pixels)
        key, sub = jax.random.split(key)
        state, lo = train_step(state, batch, sub, mvs,
                               cfg=cfg, tx=tx, use_mvs=True)
        assert np.isfinite(float(lo.loss))
        mvs_losses.append(float(lo.mvs_loss))
    mvs_losses = np.asarray(mvs_losses)
    open_frac = (mvs_losses > 1e-6).mean()
    assert open_frac > 0.5, f"GCE gate mostly closed ({open_frac:.0%})"
    assert mvs_losses[-30:].mean() < mvs_losses[:30].mean(), \
        "mvs loss did not decay"


@pytest.mark.slow
def test_bf16_activation_training_quality():
    """bf16 hidden activations during training (the v5e 17.0 -> 13.3 ms
    step lever, config.train.train_activation_dtype) must match f32
    training quality on the synthetic end-to-end gate.

    Same seeds, same batches; only the training precision differs.
    The 1.5 dB tolerance is generous vs the observed gap (<0.5 dB on
    this 60-step run) but tight enough to catch a broken cast (a
    stray bf16 loss or optimizer collapses PSNR by several dB).
    """
    base = tiny_config()
    f32 = dataclasses.replace(
        base, train=dataclasses.replace(
            base.train, train_compute_dtype="float32",
            train_activation_dtype="float32"))
    bf16 = dataclasses.replace(
        base, train=dataclasses.replace(
            base.train, train_compute_dtype="bfloat16",
            train_activation_dtype="bfloat16"))
    p_f32 = _train_psnr(f32)
    p_bf16 = _train_psnr(bf16)
    assert p_bf16 > p_f32 - 1.5, (p_f32, p_bf16)


def test_render_depth_matches_full_render():
    """Depth-only feedback path == full render's depth (fg model)."""
    import jax
    from s_volsdf_tpu.engine.render import render_depth, render_image

    cfg = tiny_config()
    scene = make_sphere_scene(n_views=3, img_res=(16, 24))
    params = init_volsdf_params(jax.random.PRNGKey(0), cfg.model)
    full = render_image(params, cfg.model, scene.poses[0],
                        scene.intrinsics[0], (16, 24), chunk=128, fast=1)
    dep = render_depth(params, cfg.model, scene.poses[0],
                       scene.intrinsics[0], (16, 24), chunk=128, fast=1)
    np.testing.assert_allclose(dep["depth"], full["depth"], atol=1e-4)
    np.testing.assert_allclose(dep["acc"], full["acc"], atol=1e-4)


def test_feedback_render_bf16_close_to_f32():
    """train.feedback_render_dtype='bfloat16' renders the cascade
    feedback depth with bf16 MLP dots/activations: same structure as
    the f32 render within bf16 rounding (measured on v5e at production
    shapes: 0.58% of depth range MAE, 0% acc-mask flips, ~9% faster —
    an opt-in; eval/plot renders always stay f32)."""
    import dataclasses

    import jax
    from s_volsdf_tpu.engine.render import render_depth

    cfg = tiny_config()
    scene = make_sphere_scene(n_views=3, img_res=(16, 24))
    params = init_volsdf_params(jax.random.PRNGKey(0), cfg.model)
    f32 = render_depth(params, cfg.model, scene.poses[0],
                       scene.intrinsics[0], (16, 24), chunk=128, fast=1)
    mcfg = dataclasses.replace(cfg.model, compute_dtype="bfloat16",
                               activation_dtype="bfloat16")
    bf = render_depth(params, mcfg, scene.poses[0],
                      scene.intrinsics[0], (16, 24), chunk=128, fast=1)
    rng_d = float(f32["depth"].max() - f32["depth"].min()) or 1.0
    assert np.abs(bf["depth"] - f32["depth"]).mean() / rng_d < 0.02
    assert np.mean((f32["acc"] < 0.2) != (bf["acc"] < 0.2)) < 0.01


def _train_live_gce(cfg, n_steps=80):
    """Train with the GT-prior volumes (GCE gate open) and return the
    per-step (loss, mvs_loss, psnr) trajectory."""
    scene = make_sphere_scene(n_views=3, img_res=(48, 64))
    mvs = _gt_volumes(scene, noise=0.01)
    rng_np = np.random.default_rng(0)
    params = init_volsdf_params(jax.random.PRNGKey(0), cfg.model)
    tx = make_optimizer(cfg)
    state = init_train_state(cfg, params, tx)
    key = jax.random.PRNGKey(1)
    rows = []
    for step in range(n_steps):
        batch = make_batch(scene, rng_np, step % 3, cfg.train.num_pixels)
        key, sub = jax.random.split(key)
        state, lo = train_step(state, batch, sub, mvs,
                               cfg=cfg, tx=tx, use_mvs=True)
        rows.append((float(lo.loss), float(lo.mvs_loss), float(lo.psnr)))
    out = np.asarray(rows)
    assert np.isfinite(out).all()
    return out


def _live_cfg():
    cfg = tiny_config()
    cfg.loss.mvs_weight = 1.0
    cfg.loss.sparse_weight = 1.0
    cfg.loss.anneal_rgb = 30
    return cfg


@pytest.mark.slow
def test_inverse_cdf_lever_bitidentical_on_live_gce_path():
    """Round-3 lever re-verification on a LIVE-gradient GCE path
    (VERDICT r3 item 1 tail): the round-3 100k evidence showed the
    gather-free inverse CDF bit-identical only on a trajectory whose
    mvs term was 0 after step 5k. Here the GT-prior volumes keep the
    confidence gate open, so the cost_mapping/GCE gradient flows
    through the sampled z_vals — and the masked-reduction inverse CDF
    (ops/inverse_cdf.py) must still match the literal
    searchsorted+gather form (ray_sampler.py:166-185 semantics)
    bit-for-bit, trajectory-wide."""
    import s_volsdf_tpu.models.sampler as sampler_mod
    from s_volsdf_tpu.ops.inverse_cdf import sample_pdf_from_cdf_gather

    cfg = _live_cfg()
    traj_fast = _train_live_gce(cfg)
    assert (traj_fast[:, 1] > 1e-6).mean() > 0.5, "GCE gate not open"

    calls = {"n": 0}

    def gather_spy(bins, cdf, u):
        calls["n"] += 1
        return sample_pdf_from_cdf_gather(bins, cdf, u)

    orig = sampler_mod.sample_pdf_from_cdf
    sampler_mod.sample_pdf_from_cdf = gather_spy
    jax.clear_caches()  # force retrace so the swap is actually traced
    try:
        traj_gather = _train_live_gce(cfg)
    finally:
        sampler_mod.sample_pdf_from_cdf = orig
        jax.clear_caches()
    assert calls["n"] > 0, "gather form was never traced"
    np.testing.assert_array_equal(traj_fast, traj_gather)


@pytest.mark.slow
def test_bf16_lever_quality_on_live_gce_path():
    """bf16 train activations re-verified with a live GCE gradient
    (VERDICT r3 item 1 tail): same seeds/batches/volumes, precision is
    the only difference; the gate must stay open in both arms and the
    PSNR gap must stay inside the round-3 quality bar (1.5 dB)."""
    f32 = _live_cfg()
    f32.train = dataclasses.replace(
        f32.train, train_compute_dtype="float32",
        train_activation_dtype="float32")
    bf16 = _live_cfg()
    bf16.train = dataclasses.replace(
        bf16.train, train_compute_dtype="bfloat16",
        train_activation_dtype="bfloat16")
    t_f32 = _train_live_gce(f32)
    t_bf16 = _train_live_gce(bf16)
    for name, t in (("f32", t_f32), ("bf16", t_bf16)):
        assert (t[:, 1] > 1e-6).mean() > 0.5, f"GCE gate not open ({name})"
    p_f32 = t_f32[-10:, 2].mean()
    p_bf16 = t_bf16[-10:, 2].mean()
    assert p_bf16 > p_f32 - 1.5, (p_f32, p_bf16)


def _gt_volumes_inverse(scene, D=32, noise=0.0):
    """Informative volumes on an INVERSE-depth hypothesis grid (the
    BMVS stage-0 unbounded-scene variant, reference
    CasMVSNet.py:538-577 + vsdf.py:426-428)."""
    from s_volsdf_tpu.data.synthetic import gt_prob_volume
    from s_volsdf_tpu.ops.cost_mapping import MVSVolumes
    H, W = scene.img_res
    dvals = np.linspace(1.2, 3.8, D).astype(np.float32)
    probs, slabs = [], []
    rng = np.random.default_rng(3)
    for v in range(3):
        prob, hyp = gt_prob_volume(scene.poses[v], scene.intrinsics[v],
                                   (H, W), dvals, scale_factor=1.0,
                                   inverse_depth=True,
                                   depth_noise=noise, rng=rng)
        probs.append(prob)
        slabs.append(np.stack([np.full((H, W), hyp[0], np.float32),
                               np.full((H, W), hyp[-1], np.float32)]))
    return MVSVolumes(prob=jnp.asarray(np.stack(probs)),
                      z_slab=jnp.asarray(np.stack(slabs)),
                      intrinsics=jnp.asarray(scene.intrinsics),
                      c2w=jnp.asarray(scene.poses),
                      img_res=scene.img_res, inverse_depth=True)


def _bmvs_cfg():
    """BMVS-shaped tiny config: NeRF++ background + inverse-depth
    stage-0 volumes (config/vol/bmvs.yaml shapes, shrunk for CPU)."""
    from s_volsdf_tpu.config import BGNetworkConfig, ImplicitNetConfig, \
        RenderingNetConfig
    cfg = tiny_config()
    cfg.loss.mvs_weight = 1.0
    cfg.loss.sparse_weight = 1.0
    cfg.loss.anneal_rgb = 30
    cfg.model.with_background = True
    cfg.model.implicit.sphere_scale = 1.0
    cfg.model.sampler.inverse_sphere_bg = True
    cfg.model.sampler.N_samples_inverse_sphere = 8
    cfg.model.bg = BGNetworkConfig(
        feature_vector_size=64,
        implicit=ImplicitNetConfig(
            d_in=4, d_out=1, dims=(64,) * 4, geometric_init=False,
            bias=0.0, skip_in=(), weight_norm=False, multires=10),
        rendering=RenderingNetConfig(
            mode="nerf", d_in=3, d_out=3, dims=(64,), weight_norm=False,
            multires_view=4))
    return cfg


@pytest.mark.slow
def test_bmvs_gt_prior_keeps_gce_gate_open_past_anneal():
    """BMVS-path regression for the r4 production finding: on the
    background-model + inverse-depth path the anneal boundary
    (loss.py:104-105) is a bifurcation — a bad stream can dump all
    foreground mass into the NeRF++ background, every sample leaves
    the hypothesis slab, and the GCE gate (loss.py:66) closes FOREVER
    (conf == 0 exactly; runs/r4_bmvs_10k_seed0_collapsed.jsonl). This
    gate-level test trains through the boundary and asserts the mvs
    term is alive in the post-anneal half, so a plumbing regression
    that zeroes pi/pj on the bg path (wrong depth frame, slab
    normalization, validity mask) cannot hide behind 'photometrics
    still train'."""
    from s_volsdf_tpu.models.network_bg import init_volsdf_bg_params

    cfg = _bmvs_cfg()
    scene = make_sphere_scene(n_views=3, img_res=(48, 64))
    mvs = _gt_volumes_inverse(scene, noise=0.01)
    rng_np = np.random.default_rng(0)
    params = init_volsdf_bg_params(jax.random.PRNGKey(0), cfg.model)
    tx = make_optimizer(cfg)
    state = init_train_state(cfg, params, tx)
    key = jax.random.PRNGKey(1)
    mvs_losses = []
    for step in range(120):
        batch = make_batch(scene, rng_np, step % 3, cfg.train.num_pixels)
        key, sub = jax.random.split(key)
        state, lo = train_step(state, batch, sub, mvs,
                               cfg=cfg, tx=tx, use_mvs=True)
        assert np.isfinite(float(lo.loss))
        mvs_losses.append(float(lo.mvs_loss))
    post = np.asarray(mvs_losses[60:])
    open_frac = (post > 1e-6).mean()
    assert open_frac > 0.5, \
        f"GCE gate mostly closed post-anneal ({open_frac:.0%})"


# --------------------------------------------------------------------------
# Gate rescue (loss.gate_rescue): survivable GCE-collapse failure mode
# --------------------------------------------------------------------------

def test_prior_depth_anchor_matches_gt_depth():
    """prior_depth_anchor: the WTA anchor at a hit pixel lands on the
    hypothesis nearest GT z-depth (within one interval); miss pixels'
    peaks are at the flat floor level."""
    from s_volsdf_tpu.engine.train_step import pack_for_chunk
    from s_volsdf_tpu.ops.cost_mapping import prior_depth_anchor

    cfg = tiny_config()
    scene = make_sphere_scene(n_views=3, img_res=(48, 64))
    mvs = _gt_volumes(scene, D=48)
    packed = pack_for_chunk(cfg, mvs)

    # GT z-depth at the train pixels of view 0.
    H, W = scene.img_res
    ys, xs = np.mgrid[0:H, 0:W]
    hit = np.isfinite(scene.depths[0])
    uv_hit = np.stack([xs[hit], ys[hit]], -1).astype(np.float32)[:200]
    z_gt = scene.depths[0][hit][:200]
    onehot = jnp.zeros((3,)).at[0].set(1.0)

    anchor, peak = prior_depth_anchor(jnp.asarray(uv_hit), onehot, packed)
    interval = (3.4 - 1.0) / 47
    # bilinear pixel interp + bump discretization: within ~2 intervals
    err = np.abs(np.asarray(anchor) - z_gt)
    assert np.median(err) < 2 * interval, float(np.median(err))
    assert float(np.asarray(peak).min()) > 0.05  # informative bumps

    uv_miss = np.stack([xs[~hit], ys[~hit]], -1).astype(np.float32)[:50]
    _, peak_m = prior_depth_anchor(jnp.asarray(uv_miss), onehot, packed)
    # miss pixels are flat (floor mass only): peak ~ 1/D << hit peaks
    assert float(np.median(np.asarray(peak_m))) < 0.1


def _conflicting_volumes(scene, D=32, shift=8):
    """Volumes whose bumps are INCONSISTENT between views (each view's
    bump rolled a different way along the hypothesis axis, floor=0):
    no 3D point carries probability in two views at once, so
    pi*pj == 0 exactly — the reference GCE loss (loss.py:61-67) has
    identically zero gradient, the deterministic analog of the
    committed anneal-boundary collapse
    (runs/r4_bmvs_10k_seed0_collapsed.jsonl)."""
    from s_volsdf_tpu.data.synthetic import gt_prob_volume
    from s_volsdf_tpu.ops.cost_mapping import MVSVolumes
    H, W = scene.img_res
    dvals = np.linspace(1.0, 3.4, D).astype(np.float32)
    probs, slabs = [], []
    for v in range(3):
        prob, hyp = gt_prob_volume(scene.poses[v], scene.intrinsics[v],
                                   (H, W), dvals, scale_factor=1.0,
                                   sigma_intervals=1.0, floor=0.0)
        s = [shift, -shift, 0][v]
        prob = np.roll(prob, s, axis=0)
        if s > 0:       # no wrap-around: rolled-past mass is dropped,
            prob[:s] = 0.0   # else head/tail bumps re-agree across views
        elif s < 0:
            prob[s:] = 0.0
        # Keep each view's mass in a DISJOINT radial shell — view 0
        # deep-shifted inside r<0.40, view 1 front-shifted outside
        # r>1.20, view 2 unshifted in the 0.65<r<0.95 band. Grazing
        # limb pixels (where shifted bump surfaces cross in 3D) and
        # miss pixels (which normalize to mutually-agreeing uniform
        # columns) are zeroed. Guarantees pi*pj == 0 for every 3D
        # point: the GCE gradient is identically dead.
        ys, xs = np.mgrid[0:H, 0:W]
        K, c2w = scene.intrinsics[v], scene.poses[v]
        dirs_cam = np.stack(
            [(xs - K[0, 2]) / K[0, 0], (ys - K[1, 2]) / K[1, 1],
             np.ones((H, W), np.float32)], -1)
        zc = scene.depths[v] + s * (hyp[1] - hyp[0])
        pts = (dirs_cam * zc[..., None]) @ c2w[:3, :3].T + c2w[:3, 3]
        r = np.linalg.norm(pts, axis=-1)
        band = [r < 0.40, r > 1.20, (r > 0.65) & (r < 0.95)][v]
        keep = np.isfinite(scene.depths[v]) & band
        prob[:, ~keep] = 0.0
        probs.append(prob)
        slabs.append(np.stack([np.full((H, W), hyp[0], np.float32),
                               np.full((H, W), hyp[-1], np.float32)]))
    return MVSVolumes(prob=jnp.asarray(np.stack(probs)),
                      z_slab=jnp.asarray(np.stack(slabs)),
                      intrinsics=jnp.asarray(scene.intrinsics),
                      c2w=jnp.asarray(scene.poses),
                      img_res=scene.img_res, inverse_depth=False)


def _run_rescue_arm(rescue_on: bool, n_steps=100):
    cfg = tiny_config()
    cfg.loss.mvs_weight = 1.0
    cfg.loss.gate_rescue = rescue_on
    cfg.loss.gate_rescue_weight = 2.0
    scene = make_sphere_scene(n_views=3, img_res=(48, 64))
    mvs = _conflicting_volumes(scene)
    rng_np = np.random.default_rng(0)
    params = init_volsdf_params(jax.random.PRNGKey(0), cfg.model)
    tx = make_optimizer(cfg)
    state = init_train_state(cfg, params, tx)
    key = jax.random.PRNGKey(1)
    mvs_losses, rescue = [], []
    for step in range(n_steps):
        batch = make_batch(scene, rng_np, step % 3, cfg.train.num_pixels)
        key, sub = jax.random.split(key)
        state, lo = train_step(state, batch, sub, mvs,
                               cfg=cfg, tx=tx, use_mvs=True)
        assert np.isfinite(float(lo.loss))
        mvs_losses.append(float(lo.mvs_loss))
        rescue.append(float(lo.rescue_loss))
    return state, cfg, scene, mvs, np.asarray(mvs_losses), \
        np.asarray(rescue)


def _anchor_distance(state, scene, mvs):
    """Mean |rendered depth - prior WTA anchor| over view-0 hit pixels
    (measured with a probe cfg, gradient-free)."""
    from s_volsdf_tpu.engine.render import render_depth
    from s_volsdf_tpu.engine.train_step import pack_for_chunk
    from s_volsdf_tpu.ops.cost_mapping import prior_depth_anchor

    cfg = tiny_config()
    d = render_depth(state.params, cfg.model, scene.poses[0],
                     scene.intrinsics[0], scene.img_res, chunk=1024,
                     fast=1)["depth"].reshape(scene.img_res)
    H, W = scene.img_res
    ys, xs = np.mgrid[0:H, 0:W]
    hit = np.isfinite(scene.depths[0])
    uv = np.stack([xs[hit], ys[hit]], -1).astype(np.float32)
    anchor, peak = prior_depth_anchor(
        jnp.asarray(uv), jnp.zeros((3,)).at[0].set(1.0),
        pack_for_chunk(cfg, mvs))
    informative = np.asarray(peak) > 0.02
    return float(np.abs(np.asarray(d)[hit] - np.asarray(anchor))
                 [informative].mean())


@pytest.mark.slow
def test_gate_rescue_recovers_dead_gce():
    """A/B on the deterministic collapse: conflicting priors keep
    pi*pj == 0 (GCE gradient identically dead, mvs term 0 throughout
    both arms). With gate_rescue ON the rescue term fires and pulls
    rendered depth toward the prior's WTA anchor; with it OFF (the
    reference path) nothing can act and depth stays put."""
    st_off, _, scene, mvs, mvs_off, rescue_off = _run_rescue_arm(False)
    st_on, _, _, _, mvs_on, rescue_on = _run_rescue_arm(True)

    # the GCE gate is genuinely dead in both arms
    assert float(mvs_off.max()) < 1e-6
    assert float(mvs_on.max()) < 1e-6
    # flag off: the rescue field stays the scalar 0
    assert float(np.abs(rescue_off).max()) == 0.0
    # flag on: the term fires and decreases as depth approaches anchor
    assert rescue_on[0] > 1e-3
    assert rescue_on[-5:].mean() < rescue_on[:5].mean()

    d_off = _anchor_distance(st_off, scene, mvs)
    d_on = _anchor_distance(st_on, scene, mvs)
    assert d_on < 0.6 * d_off, (d_on, d_off)


def test_gate_rescue_off_keeps_loss_identical():
    """Default path: the flag-off program computes the SAME total as a
    manual recomposition without any rescue term (the Python-level
    gate adds nothing to the traced graph)."""
    from s_volsdf_tpu.engine.train_step import _loss_fn

    cfg = tiny_config()
    cfg.loss.mvs_weight = 1.0
    scene = make_sphere_scene(n_views=3, img_res=(48, 64))
    mvs = _gt_volumes(scene)
    rng_np = np.random.default_rng(0)
    params = init_volsdf_params(jax.random.PRNGKey(0), cfg.model)
    batch = make_batch(scene, rng_np, 0, cfg.train.num_pixels)

    loss, lo = _loss_fn(params, cfg, batch, jax.random.PRNGKey(2), mvs,
                        jnp.asarray(0, jnp.int32))
    manual = (cfg.loss.rgb_weight * lo.rgb_loss
              + cfg.loss.eikonal_weight * lo.eikonal_loss
              + cfg.loss.mvs_weight * lo.mvs_loss
              + cfg.loss.sparse_weight * 0.0)
    assert float(np.abs(np.asarray(loss) - np.asarray(manual))) == 0.0
    assert float(np.asarray(lo.rescue_loss)) == 0.0
