"""Common-random-numbers pairing seam (tools/paired_jitter.py).

Validates the three properties the paired Chamfer design
(tools/chamfer_midscale.py --paired) rests on:

  1. ours: injected jitter replaces every random draw — the training
     step becomes a deterministic function of the feed (rng-key
     independent), and the injection is demonstrably live.
  2. torch: the replay shim makes the reference training loop a
     deterministic function of the same feed.
  3. cross-framework coupling: with a SHARED feed, the two frameworks'
     one-step losses agree far tighter than with independent feeds —
     i.e. the five draw sites are mapped 1:1 and the pairing cancels
     the stream variance it is built to cancel.
"""

import copy
import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from paired_jitter import JitterStream, TorchReplay, jitter_batch_entry
from test_parity_pipeline import (_build_reference_model, _our_config,
                                  _train_torch)


N_RAYS = 64


@pytest.fixture(scope="module")
def setup():
    import jax.numpy as jnp
    from tools.convert_ckpt import convert
    from s_volsdf_tpu.data.synthetic import make_sphere_scene, sample_rays

    torch.manual_seed(0)
    model = _build_reference_model()
    sd0 = copy.deepcopy(model.state_dict())
    params = convert("volsdf", model.state_dict(),
                     n_sdf_layers=5, n_rgb_layers=3)
    cfg = _our_config()
    scene = make_sphere_scene(n_views=3, img_res=(32, 48), cam_radius=2.2)
    rng_np = np.random.default_rng(11)
    batches = []
    for _ in range(6):
        view = int(rng_np.integers(0, 3))
        uv, rgb = sample_rays(scene, rng_np, view, N_RAYS)
        batches.append((view, uv, rgb))
    return model, sd0, params, cfg, scene, batches


def _stream(seed, cfg):
    s = cfg.model.sampler
    return JitterStream(seed, N_RAYS, s.N_samples_eval, s.N_samples,
                        s.N_samples_extra)


def _our_batch(cfg, scene, view, uv, rgb, feed=None):
    import jax.numpy as jnp
    batch = {
        "uv": jnp.asarray(uv)[None], "rgb": jnp.asarray(rgb)[None],
        "rgb_smooth": jnp.asarray(rgb)[None],
        "pose": jnp.asarray(scene.poses[view])[None],
        "intrinsics": jnp.asarray(scene.intrinsics[view])[None],
        "view_onehot": jnp.zeros((3,)).at[view].set(1.0),
    }
    if feed is not None:
        batch["jitter"] = jitter_batch_entry(
            feed, cfg.model.sampler.N_samples_extra)
    return batch


def _our_loss(params, cfg, batch, key):
    from s_volsdf_tpu.engine.train_step import _loss_fn
    loss, _ = _loss_fn(params, cfg, batch, key, None, 0)
    return float(loss)


def test_ours_injection_deterministic_and_live(setup):
    import jax
    _, _, params, cfg, scene, batches = setup
    view, uv, rgb = batches[0]
    feed = _stream(3, cfg).step()
    batch = _our_batch(cfg, scene, view, uv, rgb, feed)
    l1 = _our_loss(params, cfg, batch, jax.random.PRNGKey(0))
    l2 = _our_loss(params, cfg, batch, jax.random.PRNGKey(999))
    assert l1 == l2, "injected jitter must make the step key-independent"
    l3 = _our_loss(params, cfg, _our_batch(cfg, scene, view, uv, rgb),
                   jax.random.PRNGKey(0))
    assert l1 != l3, "injection must actually replace the draws"


def test_torch_replay_deterministic_and_live(setup):
    model, sd0, _, cfg, scene, batches = setup

    def run(seed, replay_feeds):
        m = _build_reference_model()
        m.load_state_dict(sd0)
        if replay_feeds is None:
            return _train_torch(m, cfg, scene, batches, stream_seed=seed)
        replay = TorchReplay()
        feeds = list(replay_feeds)
        with replay:
            m = _train_torch(m, cfg, scene, batches, stream_seed=seed,
                             per_step=lambda i: replay.set_step(feeds[i]))
        return m

    feeds = [_stream(3, cfg).step() for _ in range(len(batches))]
    m_a = run(100, feeds)
    m_b = run(200, feeds)   # different torch seed, same feed
    for (ka, va), (kb, vb) in zip(m_a.state_dict().items(),
                                  m_b.state_dict().items()):
        assert ka == kb and torch.equal(va, vb), \
            f"replayed training not deterministic at {ka}"
    m_c = run(100, None)    # native stream: must differ from the feed
    diffs = [float((va - vc).abs().max()) for va, vc in
             zip(m_a.state_dict().values(), m_c.state_dict().values())]
    assert max(diffs) > 0, "replay must actually replace torch draws"


def test_cross_framework_coupling(setup):
    """Shared feed => the two frameworks' 1-step losses land within
    f32 numerics of each other; independent feeds => they differ by
    the stream variance. The paired design's entire premise, measured
    on one batch."""
    import jax
    model, sd0, params, cfg, scene, batches = setup
    view, uv, rgb = batches[0]
    from volsdf.model.loss import VolSDFLoss
    loss_fn = VolSDFLoss(rgb_loss="torch.nn.L1Loss", eikonal_weight=0.1)
    loss_fn.set_stg(0)

    def torch_loss(feed):
        m = _build_reference_model()
        m.load_state_dict(sd0)
        m.train()
        t_in = {
            "uv": torch.from_numpy(uv)[None],
            "intrinsics": torch.from_numpy(scene.intrinsics[view])[None],
            "pose": torch.from_numpy(scene.poses[view])[None],
        }
        replay = TorchReplay()
        with replay:
            replay.set_step(feed)
            out = m(t_in, fast=1)
        losses = loss_fn(out, {"rgb": torch.from_numpy(rgb)[None]})
        return float(losses["loss"])

    feed_a = _stream(3, cfg).step()
    feed_b = _stream(4, cfg).step()
    t_a = torch_loss(feed_a)
    o_a = _our_loss(params, cfg,
                    _our_batch(cfg, scene, view, uv, rgb, feed_a),
                    jax.random.PRNGKey(0))
    t_b = torch_loss(feed_b)
    paired = abs(o_a - t_a)
    unpaired = abs(t_a - t_b)    # pure stream variance, same framework
    assert paired < 1e-4, \
        f"shared-feed cross-framework loss gap {paired:.2e} too large " \
        f"— a draw site is mismapped"
    assert paired < 0.2 * unpaired, \
        f"pairing gives no variance reduction: paired {paired:.2e} vs " \
        f"stream spread {unpaired:.2e}"
