"""PackedVolumes gather layout (ops/cost_mapping.py): the dup-y block
gathers must be numerically identical to the on-the-fly f32 path, and
the bf16 volume packing must stay within bf16 lerp error of f32 with
EXACT near/far (the near/far planes stay f32 in a separate array)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s_volsdf_tpu.data.synthetic import make_sphere_scene
from s_volsdf_tpu.ops.cost_mapping import (MVSVolumes, PackedVolumes,
                                           cost_mapping, pack_volumes)


@pytest.fixture(scope="module")
def setup(rng_np=None):
    rng = np.random.default_rng(3)
    scene = make_sphere_scene(3, (48, 64))
    D, Hc, Wc = 16, 12, 16
    prob = rng.random((3, D, Hc, Wc)).astype(np.float32)
    prob /= prob.sum(1, keepdims=True)
    near = rng.uniform(0.3, 0.7, (3, Hc, Wc)).astype(np.float32)
    far = near + rng.uniform(2.0, 4.0, (3, Hc, Wc)).astype(np.float32)
    z_slab = np.stack([near, far], 1)
    mvs = MVSVolumes(prob=jnp.asarray(prob), z_slab=jnp.asarray(z_slab),
                     intrinsics=jnp.asarray(scene.intrinsics),
                     c2w=jnp.asarray(scene.poses), img_res=scene.img_res,
                     inverse_depth=False)
    # Sample points: some inside, some far outside every frustum.
    R, S = 64, 24
    xyz = rng.uniform(-1.5, 1.5, (R, S, 3)).astype(np.float32)
    xyz[:4] *= 50.0   # out of all frustums
    z = rng.uniform(0.1, 5.0, (R, S)).astype(np.float32)
    onehot = jnp.zeros((3,)).at[1].set(1.0)
    return mvs, jnp.asarray(z), jnp.asarray(xyz), onehot


def test_prepacked_f32_matches_unpacked(setup):
    mvs, z, xyz, onehot = setup
    pj0, pi0, v0 = cost_mapping(z, xyz, onehot, mvs)
    packed = pack_volumes(mvs, dtype=jnp.float32)
    assert isinstance(packed, PackedVolumes)
    assert packed.vol8.dtype == jnp.float32
    pj1, pi1, v1 = cost_mapping(z, xyz, onehot, packed)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_allclose(np.asarray(pj0), np.asarray(pj1),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(pi0), np.asarray(pi1),
                               rtol=1e-6, atol=1e-7)


def test_packed_bf16_close_and_nearfar_exact(setup):
    mvs, z, xyz, onehot = setup
    pj0, pi0, v0 = cost_mapping(z, xyz, onehot, mvs)
    packed = pack_volumes(mvs, dtype=jnp.bfloat16)
    assert packed.vol8.dtype == jnp.bfloat16
    assert packed.nf8.dtype == jnp.float32
    pj1, pi1, v1 = cost_mapping(z, xyz, onehot, packed)
    # Validity depends only on geometry + near/far (exact: f32 planes).
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    # Costs within bf16 lerp error of the f32 path.
    np.testing.assert_allclose(np.asarray(pj0), np.asarray(pj1),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(pi0), np.asarray(pi1),
                               atol=2e-3)
    # The packed near/far planes reproduce the slabs exactly (nf8 row
    # y*Wc + x, slot (by*2+bx)*2 + {near,far}; slots 0/1 = corner 0,0).
    Hc, Wc = packed.vol_res
    nf = np.asarray(packed.nf8).reshape(-1, Hc, Wc, 8)
    np.testing.assert_array_equal(nf[..., 0],
                                  np.asarray(mvs.z_slab[:, 0]))
    np.testing.assert_array_equal(nf[..., 1],
                                  np.asarray(mvs.z_slab[:, 1]))


def test_packed_train_chunk_converges():
    """End-to-end: the chunked trainer with bf16-packed volumes still
    optimizes (loss decreases, finite)."""
    from s_volsdf_tpu.config import load_config
    from s_volsdf_tpu.engine.train_step import (init_train_state,
                                                make_optimizer)
    from s_volsdf_tpu.engine.trainer import make_scan_train_fn
    from s_volsdf_tpu.models.network import init_volsdf_params

    cfg = load_config("dtu", overrides=[
        "train.num_pixels=64", "model.implicit.dims=[32,32]",
        "model.implicit.skip_in=[]", "model.rendering.dims=[32]",
        "model.feature_vector_size=32", "model.sampler.N_samples=8",
        "model.sampler.N_samples_eval=16", "model.sampler.N_samples_extra=4",
        "loss.anneal_rgb=0",
    ])
    assert cfg.train.mvs_pack_dtype == "bfloat16"
    scene = make_sphere_scene(3, (24, 32))
    rng = np.random.default_rng(0)
    D, Hc, Wc = 16, 6, 8
    prob = rng.random((3, D, Hc, Wc)).astype(np.float32)
    prob /= prob.sum(1, keepdims=True)
    z_slab = np.stack([np.full((3, Hc, Wc), 0.5, np.float32),
                       np.full((3, Hc, Wc), 5.0, np.float32)], 1)
    mvs = MVSVolumes(prob=jnp.asarray(prob), z_slab=jnp.asarray(z_slab),
                     intrinsics=jnp.asarray(scene.intrinsics),
                     c2w=jnp.asarray(scene.poses), img_res=scene.img_res,
                     inverse_depth=False)
    scene_dev = {"rgb": jnp.asarray(scene.images.reshape(3, -1, 3)),
                 "rgb_smooth": jnp.asarray(scene.images.reshape(3, -1, 3)),
                 "poses": jnp.asarray(scene.poses),
                 "intrinsics": jnp.asarray(scene.intrinsics)}
    params = init_volsdf_params(jax.random.PRNGKey(0), cfg.model)
    tx = make_optimizer(cfg)
    state = init_train_state(cfg, params, tx)
    run = make_scan_train_fn(cfg, tx, use_mvs=True, n_views=3,
                             img_res=scene.img_res)
    state, losses = run(state, jax.random.split(jax.random.PRNGKey(1), 50),
                        scene_dev, mvs)
    l = np.asarray(losses.loss)
    assert np.all(np.isfinite(l))
    assert l[-10:].mean() < l[:10].mean()
