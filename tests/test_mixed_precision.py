"""Mixed-precision flags must actually change the training numerics.

Round-5 finding: tools/chamfer_midscale.py's "bf16" ours arms trained
pure f32 because bf16 activations are conditional on bf16 dots
(models/network.py:_activation_dtype — intended semantics, documented
at config.py:ModelConfig.activation_dtype) and the parity config pins
train_compute_dtype=float32. These tests pin both sides of that
contract so precision flags can't silently go inert again:

1. the PRODUCTION flag combination (bf16 dots + bf16 activations,
   config.py TrainConfig defaults) produces a trajectory that DIFFERS
   from pure f32 within a few steps;
2. bf16 activations WITHOUT bf16 dots are a no-op by design — the
   trajectory is bit-identical to f32 (the conditional that made the
   chamfer arms f32);
3. pack_for_chunk respects mvs_pack_dtype, and cost_mapping's
   raw-volume fallback packs f32 (ops/cost_mapping.py:343) — the
   reason tools must pre-pack.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s_volsdf_tpu.config import load_config
from s_volsdf_tpu.data.synthetic import make_sphere_scene, sample_rays
from s_volsdf_tpu.engine.train_step import (init_train_state,
                                            make_optimizer, pack_for_chunk,
                                            train_step)
from s_volsdf_tpu.models.network import init_volsdf_params


def _cfg(compute, activation):
    cfg = load_config("dtu", overrides=[
        "train.num_pixels=32",
        "model.implicit.dims=[32,32]",
        "model.implicit.skip_in=[]",
        "model.rendering.dims=[32]",
        "model.feature_vector_size=32",
        "model.sampler.N_samples=8",
        "model.sampler.N_samples_eval=16",
        "model.sampler.N_samples_extra=4",
        "model.sampler.max_total_iters=2",
        "loss.mvs_weight=0", "loss.sparse_weight=0", "loss.anneal_rgb=0",
        f"train.train_compute_dtype={compute}",
        f"train.train_activation_dtype={activation}",
    ])
    return cfg


def _train(cfg, n_steps=8):
    scene = make_sphere_scene(3, (16, 24), cam_radius=2.2)
    params = init_volsdf_params(jax.random.PRNGKey(0), cfg.model)
    tx = make_optimizer(cfg)
    state = init_train_state(cfg, params, tx)
    rng_np = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    for i in range(n_steps):
        v = i % 3
        uv, rgb = sample_rays(scene, rng_np, v, cfg.train.num_pixels)
        batch = {"uv": jnp.asarray(uv)[None], "rgb": jnp.asarray(rgb)[None],
                 "rgb_smooth": jnp.asarray(rgb)[None],
                 "pose": jnp.asarray(scene.poses[v])[None],
                 "intrinsics": jnp.asarray(scene.intrinsics[v])[None],
                 "view_onehot": jnp.zeros((3,)).at[v].set(1.0)}
        key, sub = jax.random.split(key)
        state, _ = train_step(state, batch, sub, None,
                              cfg=cfg, tx=tx, use_mvs=False)
    return np.concatenate([np.asarray(x).ravel()
                           for x in jax.tree.leaves(state.params)])


def test_production_bf16_flags_are_live():
    f32 = _train(_cfg("float32", "float32"))
    bf16 = _train(_cfg("bfloat16", "bfloat16"))
    assert np.isfinite(bf16).all()
    assert not np.array_equal(f32, bf16), \
        "bf16 dots+activations trained bit-identically to f32 — the " \
        "production mixed-precision flags are inert"


def test_bf16_activations_require_bf16_dots():
    f32 = _train(_cfg("float32", "float32"))
    mixed = _train(_cfg("float32", "bfloat16"))
    assert np.array_equal(f32, mixed), \
        "activation_dtype engaged without bf16 compute — the " \
        "documented conditional (network.py:_activation_dtype) changed"


def test_pack_dtype_respected_and_fallback_is_f32():
    from s_volsdf_tpu.ops.cost_mapping import MVSVolumes, pack_volumes
    H, W, D = 16, 24, 8
    prob = jnp.asarray(np.random.default_rng(0).random((3, D, H, W)),
                       jnp.float32)
    z_slab = jnp.stack([jnp.full((3, H, W), 0.5),
                        jnp.full((3, H, W), 5.0)], axis=1)
    scene = make_sphere_scene(3, (H, W))
    mvs = MVSVolumes(prob=prob, z_slab=z_slab,
                     intrinsics=jnp.asarray(scene.intrinsics),
                     c2w=jnp.asarray(scene.poses),
                     img_res=(H, W), inverse_depth=False)
    cfg = _cfg("float32", "float32")
    cfg.train.mvs_pack_dtype = "bfloat16"
    packed_bf16 = pack_for_chunk(cfg, mvs)
    cfg.train.mvs_pack_dtype = "float32"
    packed_f32 = pack_for_chunk(cfg, mvs)
    def dtype_names(tree):
        return {x.dtype.name for x in jax.tree.leaves(tree)}

    assert "bfloat16" in dtype_names(packed_bf16), dtype_names(packed_bf16)
    assert "bfloat16" not in dtype_names(packed_f32)
    # the raw-volume fallback inside cost_mapping packs f32 — tools
    # that want bf16 packing must pre-pack (chamfer_midscale does now)
    default_packed = pack_volumes(mvs)
    assert "bfloat16" not in dtype_names(default_packed)
