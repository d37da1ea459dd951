"""Tests for the NeRF++ background model (BMVS path)."""

import jax
import jax.numpy as jnp
import numpy as np

from s_volsdf_tpu.config import bmvs_config
from s_volsdf_tpu.data.synthetic import make_sphere_scene, sample_rays
from s_volsdf_tpu.models.network_bg import (depth2pts_outside,
                                            init_volsdf_bg_params,
                                            render_rays_bg)


def small_bmvs_cfg():
    cfg = bmvs_config()
    cfg.model.implicit.dims = (64,) * 4
    cfg.model.implicit.skip_in = ()
    cfg.model.rendering.dims = (64, 64)
    cfg.model.feature_vector_size = 64
    cfg.model.bg.implicit.dims = (64,) * 4
    cfg.model.bg.implicit.skip_in = ()
    cfg.model.bg.feature_vector_size = 64
    cfg.model.bg.rendering.dims = (64,)
    cfg.model.sampler.N_samples = 16
    cfg.model.sampler.N_samples_eval = 32
    cfg.model.sampler.N_samples_extra = 8
    cfg.model.sampler.N_samples_inverse_sphere = 8
    return cfg


def test_depth2pts_outside_geometry():
    """Points must lie on the unit direction sphere with 4th coord the
    inverse depth; depth_real decreases as inverse depth increases."""
    r = 3.0
    # Off-axis ray (a ray exactly through the origin is degenerate for
    # the Rodrigues axis, in the reference too: network_bg.py:196-197).
    ray_o = jnp.asarray([[0.4, 0.1, -2.0]])
    ray_d = jnp.asarray([[0.05, -0.02, 1.0]])
    ray_d = ray_d / jnp.linalg.norm(ray_d)
    depth = jnp.asarray([[0.05, 0.15, 0.25]])  # inverse depths
    o = jnp.broadcast_to(ray_o[:, None, :], (1, 3, 3))
    d = jnp.broadcast_to(ray_d[:, None, :], (1, 3, 3))
    pts, depth_real = depth2pts_outside(o, d, depth, r)
    assert pts.shape == (1, 3, 4)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(pts[..., :3]), axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pts[..., 3]), np.asarray(depth))
    dr = np.asarray(depth_real[0])
    assert dr[0] > dr[1] > dr[2] > 0  # farther for smaller inverse depth
    # All background points lie beyond the sphere-exit distance.
    o_dot_d = float(jnp.sum(ray_o * ray_d))
    d_sphere = np.sqrt(o_dot_d ** 2
                       - (float(jnp.sum(ray_o ** 2)) - r ** 2)) - o_dot_d
    assert (dr > d_sphere).all()
    # Exact reference formula: 1/d * cos(theta) * |d|^-1 + d1.
    p_mid_norm = float(jnp.linalg.norm(ray_o + (-o_dot_d) * ray_d))
    theta = np.arcsin(p_mid_norm * np.asarray(depth[0]))
    expected = 1.0 / np.asarray(depth[0]) * np.cos(theta) + (-o_dot_d)
    np.testing.assert_allclose(dr, expected, rtol=1e-3)


def test_render_bg_shapes_and_finite():
    cfg = small_bmvs_cfg()
    scene = make_sphere_scene(3, (32, 48))
    rng_np = np.random.default_rng(0)
    params = init_volsdf_bg_params(jax.random.PRNGKey(0), cfg.model)
    uv, rgb = sample_rays(scene, rng_np, 0, 64)

    out = render_rays_bg(
        params, cfg.model, jnp.asarray(uv)[None],
        jnp.asarray(scene.poses[0])[None],
        jnp.asarray(scene.intrinsics[0])[None],
        jax.random.PRNGKey(1), training=True, fast=1)

    R = 64
    S = cfg.model.sampler.N_samples + cfg.model.sampler.N_samples_extra + 1
    assert out.rgb_values.shape == (R, 3)
    assert out.weights.shape == (R, S)
    assert out.depth_values_all.shape == (R, 1)
    assert out.grad_theta.shape == (2 * R, 3)
    for leaf in [out.rgb_values, out.depth_values, out.depth_values_all,
                 out.weights, out.grad_theta]:
        assert np.isfinite(np.asarray(leaf)).all()
    rgbv = np.asarray(out.rgb_values)
    assert (rgbv >= 0).all() and (rgbv <= 1).all()


def test_render_bg_eval_near_pose():
    """Eval path uses the nearest training view's directions
    (network_bg.py:70-75) and emits normal maps."""
    cfg = small_bmvs_cfg()
    scene = make_sphere_scene(3, (32, 48))
    rng_np = np.random.default_rng(0)
    params = init_volsdf_bg_params(jax.random.PRNGKey(0), cfg.model)
    uv, _ = sample_rays(scene, rng_np, 0, 32)

    out = render_rays_bg(
        params, cfg.model, jnp.asarray(uv)[None],
        jnp.asarray(scene.poses[0])[None],
        jnp.asarray(scene.intrinsics[0])[None],
        jax.random.PRNGKey(1), training=False, fast=1,
        near_pose=jnp.asarray(scene.poses[1])[None])
    assert out.normal_map.shape == (32, 3)
    assert out.grad_theta is None
    assert np.isfinite(np.asarray(out.normal_map)).all()


def test_render_image_bg_sharded_matches_solo():
    """Full-image BG (NeRF++) rendering under mesh sharding ==
    single-device (engine/render.py:_shard_inputs covers the bg
    chunk path incl. near_pose replication)."""
    from s_volsdf_tpu.engine.render import render_image
    from s_volsdf_tpu.parallel.mesh import make_mesh

    cfg = small_bmvs_cfg()
    scene = make_sphere_scene(3, (16, 24))
    params = init_volsdf_bg_params(jax.random.PRNGKey(0), cfg.model)
    kw = dict(chunk=64, fast=1, with_background=True,
              near_pose=scene.poses[1])
    solo = render_image(params, cfg.model, scene.poses[0],
                        scene.intrinsics[0], (16, 24), **kw)
    shard = render_image(params, cfg.model, scene.poses[0],
                         scene.intrinsics[0], (16, 24),
                         mesh=make_mesh((-1,), ("rays",)), **kw)
    for k in solo:
        np.testing.assert_allclose(shard[k], solo[k], atol=1e-5,
                                   err_msg=k)
