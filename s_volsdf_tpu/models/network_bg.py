"""VolSDF with NeRF++ inverted-sphere background (BMVS scenes).

Behavioral parity with /root/reference/volsdf/model/network_bg.py:18-214:
foreground SDF inside the bounding sphere (NO sdf clamp — the bg covers
the outside), background MLP over inverted-sphere coords (x', y', z',
1/r) with AbsDensity, composited by the foreground's residual
transmittance. At eval the view direction is swapped for the nearest
training view's direction (network_bg.py:70-75).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from s_volsdf_tpu.config import ModelConfig
from s_volsdf_tpu.models import layers
from s_volsdf_tpu.models.density import (abs_density, get_beta,
                                         init_laplace_density,
                                         laplace_density)
from s_volsdf_tpu.models.embedder import embed_dim, positional_encoding
from s_volsdf_tpu.models.network import (RenderOutput, rgb_mlp,
                                         sdf_feat_grad, sdf_gradient)
from s_volsdf_tpu.models.sampler import error_bound_sample
from s_volsdf_tpu.utils.cameras import depth_scale_factor, get_camera_params


class BGRenderOutput(NamedTuple):
    rgb_values: jnp.ndarray
    depth_values: jnp.ndarray       # fg-only depth (vsdf render path)
    depth_values_all: jnp.ndarray   # fg+bg depth (sparse loss uses this)
    depth_vals: jnp.ndarray
    weights: jnp.ndarray
    xyz: jnp.ndarray
    grad_theta: Optional[jnp.ndarray]
    normal_map: Optional[jnp.ndarray]
    acc: jnp.ndarray


def init_volsdf_bg_params(key, cfg: ModelConfig) -> Dict:
    from s_volsdf_tpu.models.network import init_volsdf_params
    k_fg, k_bg_sdf, k_bg_rgb = jax.random.split(key, 3)
    params = init_volsdf_params(k_fg, cfg)

    bg = cfg.bg
    params["bg_sdf"] = layers.init_sdf_mlp(
        k_bg_sdf, bg.implicit.d_in, bg.implicit.d_out, bg.implicit.dims,
        bg.feature_vector_size, bg.implicit.skip_in, bg.implicit.multires,
        bg.implicit.geometric_init, bg.implicit.bias,
        bg.implicit.weight_norm)
    d_view = embed_dim(bg.rendering.multires_view, 3)
    d_in0 = bg.rendering.d_in + bg.feature_vector_size + (d_view - 3)
    widths = [d_in0] + list(bg.rendering.dims) + [bg.rendering.d_out]
    params["bg_rgb"] = layers.init_mlp(k_bg_rgb, widths,
                                       bg.rendering.weight_norm)
    return params


def bg_mlp_raw(params, cfg: ModelConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Background ImplicitNetwork forward (4D input, multires=10)."""
    bg = cfg.bg.implicit
    inp = positional_encoding(x, bg.multires)
    h = inp
    n_layers = len(params)
    inv_sqrt2 = 0.7071067811865475
    for l, p in enumerate(params):
        if l in bg.skip_in:
            h = jnp.concatenate([h, inp], axis=-1) * inv_sqrt2
        h = layers.apply_linear(p, h)
        if l < n_layers - 1:
            h = layers.softplus_b(h, beta=100.0)
    return h


def bg_rgb_mlp(params, cfg: ModelConfig, view_dirs, feats) -> jnp.ndarray:
    """Background RenderingNetwork in 'nerf' mode."""
    ren = cfg.bg.rendering
    view_pe = positional_encoding(view_dirs, ren.multires_view)
    h = jnp.concatenate([view_pe, feats], axis=-1)
    n_layers = len(params)
    for l, p in enumerate(params):
        h = layers.apply_linear(p, h)
        if l < n_layers - 1:
            h = jax.nn.relu(h)
    return jax.nn.sigmoid(h)


def depth2pts_outside(ray_o, ray_d, depth, r: float):
    """Inverted-sphere parametrization via Rodrigues rotation
    (network_bg.py:182-214). depth: inverse distance in [0, 1/r]...
    actually in [0, 1] scaled by 1/r upstream. Returns ((..., 4) pts,
    real depth along the ray)."""
    o_dot_d = jnp.sum(ray_d * ray_o, axis=-1)
    under_sqrt = o_dot_d ** 2 - (jnp.sum(ray_o ** 2, axis=-1) - r ** 2)
    d_sphere = jnp.sqrt(jnp.maximum(under_sqrt, 0.0)) - o_dot_d
    p_sphere = ray_o + d_sphere[..., None] * ray_d
    p_mid = ray_o - o_dot_d[..., None] * ray_d
    p_mid_norm = jnp.linalg.norm(p_mid, axis=-1)

    rot_axis = jnp.cross(ray_o, p_sphere)
    rot_axis = rot_axis / jnp.linalg.norm(rot_axis, axis=-1, keepdims=True)
    phi = jnp.arcsin(jnp.clip(p_mid_norm / r, -1.0, 1.0))
    theta = jnp.arcsin(jnp.clip(p_mid_norm * depth, -1.0, 1.0))
    rot_angle = (phi - theta)[..., None]

    p_new = (p_sphere * jnp.cos(rot_angle)
             + jnp.cross(rot_axis, p_sphere) * jnp.sin(rot_angle)
             + rot_axis * jnp.sum(rot_axis * p_sphere, axis=-1,
                                  keepdims=True) * (1.0 - jnp.cos(rot_angle)))
    p_new = p_new / jnp.linalg.norm(p_new, axis=-1, keepdims=True)
    pts = jnp.concatenate([p_new, depth[..., None]], axis=-1)

    d1 = -o_dot_d / jnp.sum(ray_d * ray_d, axis=-1)
    ray_d_cos = 1.0 / jnp.linalg.norm(ray_d, axis=-1)
    depth_real = 1.0 / (depth + 1e-6) * jnp.cos(theta) * ray_d_cos + d1
    return pts, depth_real


def _fg_volume_rendering(z_vals, z_max, density):
    """Foreground compositing incl. the sphere-exit interval; returns
    (weights, bg_transmittance) (network_bg.py:147-164)."""
    dists = z_vals[:, 1:] - z_vals[:, :-1]
    dists = jnp.concatenate([dists, z_max[:, None] - z_vals[:, -1:]], axis=-1)
    free_energy = dists * density
    shifted = jnp.concatenate(
        [jnp.zeros_like(free_energy[:, :1]), free_energy], axis=-1)
    alpha = 1.0 - jnp.exp(-free_energy)
    transmittance = jnp.exp(-jnp.cumsum(shifted, axis=-1))
    weights = alpha * transmittance[:, :-1]
    return weights, transmittance[:, -1]


def _bg_volume_rendering(z_vals_bg, bg_density):
    """Background compositing over flipped (1 -> 0) inverse depths
    (network_bg.py:166-180)."""
    dists = z_vals_bg[:, :-1] - z_vals_bg[:, 1:]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[:, :1], 1e10)], axis=-1)
    free_energy = dists * bg_density
    shifted = jnp.concatenate(
        [jnp.zeros_like(free_energy[:, :1]), free_energy[:, :-1]], axis=-1)
    alpha = 1.0 - jnp.exp(-free_energy)
    transmittance = jnp.exp(-jnp.cumsum(shifted, axis=-1))
    return alpha * transmittance


def render_rays_bg(params, cfg: ModelConfig, uv, pose, intrinsics, rng, *,
                   training: bool, fast: int,
                   near_pose: Optional[jnp.ndarray] = None) -> BGRenderOutput:
    """VolSDFNetworkBG.forward (network_bg.py:37-145)."""
    ray_dirs, cam_loc = get_camera_params(uv, pose, intrinsics)
    depth_scale = depth_scale_factor(uv, intrinsics)

    B, N, _ = ray_dirs.shape
    R = B * N
    ray_dirs = ray_dirs.reshape(R, 3)
    cam_loc = jnp.broadcast_to(cam_loc[:, None, :], (B, N, 3)).reshape(R, 3)
    depth_scale = depth_scale.reshape(R, 1)

    k_sample, k_eik = jax.random.split(rng)
    n_iters = fast if fast >= 0 else cfg.sampler.max_total_iters

    # Foreground SDF is UNCLAMPED (bounding_sphere=0, network_bg.py:25).
    sdf_fn = lambda pts: jnp.squeeze(
        _bg_safe_sdf(params, cfg, pts), -1)
    beta0 = jax.lax.stop_gradient(
        get_beta(params["density"], cfg.density.beta_min))

    s_out = error_bound_sample(
        k_sample, cfg.sampler, ray_dirs, cam_loc, sdf_fn, beta0,
        n_iters=n_iters, training=training,
        scene_bounding_sphere=cfg.scene_bounding_sphere)

    z_vals = s_out.z_vals
    z_max = z_vals[:, -1]
    z_vals = z_vals[:, :-1]
    S = z_vals.shape[1]

    points = cam_loc[:, None, :] + z_vals[..., None] * ray_dirs[:, None, :]
    points_flat = points.reshape(-1, 3)
    dirs_flat = jnp.broadcast_to(ray_dirs[:, None, :], (R, S, 3)).reshape(-1, 3)

    sdf, feats, grads = sdf_feat_grad(params["sdf"], cfg, points_flat,
                                      bounding_sphere=0.0)

    # Nearest-training-view direction trick at eval (network_bg.py:70-75).
    if not training and near_pose is not None:
        dirs_near, _ = get_camera_params(uv, near_pose, intrinsics)
        dirs_near = dirs_near.reshape(R, 3)
        dirs_flat = jnp.broadcast_to(
            dirs_near[:, None, :], (R, S, 3)).reshape(-1, 3)

    rgb_flat = rgb_mlp(params["rgb"], cfg, points_flat, grads, dirs_flat,
                       feats)
    rgb = rgb_flat.reshape(R, S, 3)

    beta = get_beta(params["density"], cfg.density.beta_min)
    density = laplace_density(sdf[..., 0], beta).reshape(R, S)
    weights, bg_transmittance = _fg_volume_rendering(z_vals, z_max, density)
    fg_rgb_values = jnp.sum(weights[..., None] * rgb, axis=1)

    # ---- Background ----
    z_vals_bg = jnp.flip(s_out.z_vals_bg, axis=-1)  # 1 -> 0
    NB = z_vals_bg.shape[1]
    bg_dirs = jnp.broadcast_to(ray_dirs[:, None, :], (R, NB, 3))
    bg_locs = jnp.broadcast_to(cam_loc[:, None, :], (R, NB, 3))
    bg_points, bg_depth_vals = depth2pts_outside(
        bg_locs, bg_dirs, z_vals_bg, cfg.scene_bounding_sphere)

    bg_out = bg_mlp_raw(params["bg_sdf"], cfg, bg_points.reshape(-1, 4))
    bg_sdf = bg_out[:, :1]
    bg_feats = bg_out[:, 1:]
    bg_dirs_flat = bg_dirs.reshape(-1, 3)
    if not training and near_pose is not None:
        bg_dirs_flat = jnp.broadcast_to(
            dirs_near[:, None, :], (R, NB, 3)).reshape(-1, 3)
    bg_rgb_flat = bg_rgb_mlp(params["bg_rgb"], cfg, bg_dirs_flat, bg_feats)
    bg_rgb = bg_rgb_flat.reshape(R, NB, 3)

    bg_density = abs_density(bg_sdf[:, 0]).reshape(R, NB)
    bg_weights = _bg_volume_rendering(z_vals_bg, bg_density)
    bg_rgb_values = jnp.sum(bg_weights[..., None] * bg_rgb, axis=1)

    weights_all = jnp.concatenate(
        [weights, bg_transmittance[:, None] * bg_weights], axis=1)
    depth_vals_all = depth_scale * jnp.concatenate(
        [z_vals, bg_depth_vals], axis=1)
    depth_values_all = jnp.sum(weights_all * depth_vals_all, axis=1,
                               keepdims=True) / (
        jnp.sum(weights_all, axis=1, keepdims=True) + 1e-8)

    depth_vals = z_vals * depth_scale
    depth_values = jnp.sum(weights * depth_vals, axis=1, keepdims=True) / (
        jnp.sum(weights, axis=1, keepdims=True) + 1e-8)

    rgb_values = fg_rgb_values + bg_transmittance[:, None] * bg_rgb_values

    grad_theta = None
    normal_map = None
    if training:
        r = cfg.scene_bounding_sphere
        eik_uniform = jax.random.uniform(k_eik, (R, 3), minval=-r, maxval=r)
        eik_near = cam_loc + s_out.z_samples_eik * ray_dirs
        eik_points = jnp.concatenate([eik_uniform, eik_near], axis=0)
        grad_theta = sdf_gradient(params["sdf"], cfg, eik_points, 0.0)
    else:
        g = jax.lax.stop_gradient(grads)
        normals = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
        normals = normals.reshape(R, S, 3)
        normal_map = jnp.sum(weights[..., None] * normals, axis=1)

    return BGRenderOutput(
        rgb_values=rgb_values,
        depth_values=depth_values,
        depth_values_all=depth_values_all,
        depth_vals=depth_vals,
        weights=weights,
        xyz=jax.lax.stop_gradient(points),
        grad_theta=grad_theta,
        normal_map=normal_map,
        acc=jnp.sum(weights_all, axis=-1),
    )


def _bg_safe_sdf(params, cfg: ModelConfig, pts):
    """Foreground sdf values for the sampler (no clamp), stop-gradient
    params handled by the caller."""
    from s_volsdf_tpu.models.network import sdf_mlp_raw
    out = sdf_mlp_raw(jax.lax.stop_gradient(params["sdf"]), cfg, pts)
    return out[..., :1]
