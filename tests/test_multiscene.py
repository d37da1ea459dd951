"""Multi-scene vmapped training: S independent per-scene optimizations
in one XLA program (new TPU capability vs the reference)."""

import jax
import jax.numpy as jnp
import numpy as np

from s_volsdf_tpu.config import load_config
from s_volsdf_tpu.data.synthetic import make_sphere_scene
from s_volsdf_tpu.engine.train_step import init_train_state, make_optimizer
from s_volsdf_tpu.engine.trainer import (make_multiscene_train_fn,
                                         make_scan_train_fn, stack_states)
from s_volsdf_tpu.models.network import init_volsdf_params


def tiny_cfg():
    return load_config("dtu", overrides=[
        "train.num_pixels=64",
        "model.implicit.dims=[48,48,48]", "model.implicit.skip_in=[]",
        "model.rendering.dims=[48]", "model.feature_vector_size=48",
        "model.sampler.N_samples=12", "model.sampler.N_samples_eval=24",
        "model.sampler.N_samples_extra=6",
        "loss.mvs_weight=0", "loss.sparse_weight=0", "loss.anneal_rgb=0"])


def test_multiscene_training_improves_every_scene():
    cfg = tiny_cfg()
    S = 3
    scenes = [make_sphere_scene(3, (32, 48), sphere_radius=0.5 + 0.15 * i)
              for i in range(S)]
    tx = make_optimizer(cfg)

    states = stack_states([
        init_train_state(cfg, init_volsdf_params(jax.random.PRNGKey(i),
                                                 cfg.model), tx)
        for i in range(S)])
    scene_dev = stack_states([{
        "rgb": jnp.asarray(s.images.reshape(3, -1, 3)),
        "rgb_smooth": jnp.asarray(s.images.reshape(3, -1, 3)),
        "poses": jnp.asarray(s.poses),
        "intrinsics": jnp.asarray(s.intrinsics),
    } for s in scenes])

    run = make_multiscene_train_fn(cfg, tx, use_mvs=False, n_views=3,
                                   img_res=(32, 48))
    T = 40
    rngs = jax.random.split(jax.random.PRNGKey(0), S * T).reshape(S, T, -1)
    states, losses = run(states, rngs, scene_dev, None)

    loss = np.asarray(losses.loss)   # (S, T)
    psnr = np.asarray(losses.psnr)
    assert loss.shape == (S, T)
    for s in range(S):
        assert np.isfinite(loss[s]).all()
        assert loss[s, -5:].mean() < loss[s, :5].mean(), f"scene {s}"
        assert psnr[s, -5:].mean() > psnr[s, :5].mean(), f"scene {s}"
    # States advanced independently.
    assert int(states.iter_step[0]) == T


def test_multiscene_matches_single_scene():
    """vmapped scene 0 must produce the same trajectory as the plain
    single-scene loop given identical rngs."""
    cfg = tiny_cfg()
    scene = make_sphere_scene(3, (32, 48))
    tx = make_optimizer(cfg)
    params = init_volsdf_params(jax.random.PRNGKey(0), cfg.model)

    scene_dev = {
        "rgb": jnp.asarray(scene.images.reshape(3, -1, 3)),
        "rgb_smooth": jnp.asarray(scene.images.reshape(3, -1, 3)),
        "poses": jnp.asarray(scene.poses),
        "intrinsics": jnp.asarray(scene.intrinsics),
    }
    T = 10
    rngs = jax.random.split(jax.random.PRNGKey(1), T)

    single = make_scan_train_fn(cfg, tx, use_mvs=False, n_views=3,
                                img_res=(32, 48))
    # run_chunk donates its state; give each run its own copy.
    st1 = init_train_state(cfg, jax.tree.map(jnp.array, params), tx)
    st1, l1 = single(st1, rngs, scene_dev, None)

    multi = make_multiscene_train_fn(cfg, tx, use_mvs=False, n_views=3,
                                     img_res=(32, 48))
    st2 = stack_states([init_train_state(
        cfg, jax.tree.map(jnp.array, params), tx)])
    scenes2 = stack_states([scene_dev])
    st2, l2 = multi(st2, rngs[None], scenes2, None)

    np.testing.assert_allclose(np.asarray(l2.loss[0]), np.asarray(l1.loss),
                               rtol=2e-4, atol=1e-6)
