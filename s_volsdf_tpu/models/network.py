"""VolSDF foreground network: SDF MLP + radiance MLP + volume rendering.

Pure-function rebuild of /root/reference/volsdf/model/network.py.
Params are pytrees; the render is one traced graph per (shape, mode),
so the full train step jit-compiles into a single TPU program.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from s_volsdf_tpu.config import ModelConfig
from s_volsdf_tpu.models import layers
from s_volsdf_tpu.models.density import (get_beta, init_laplace_density,
                                         laplace_density)
from s_volsdf_tpu.models.embedder import embed_dim, positional_encoding
from s_volsdf_tpu.models.sampler import error_bound_sample
from s_volsdf_tpu.utils.cameras import depth_scale_factor, get_camera_params


# --------------------------------------------------------------------------
# Parameter init
# --------------------------------------------------------------------------

def init_volsdf_params(key, cfg: ModelConfig) -> Dict:
    k_sdf, k_rgb = jax.random.split(key)
    imp = cfg.implicit
    sdf_params = layers.init_sdf_mlp(
        k_sdf, imp.d_in, imp.d_out, imp.dims, cfg.feature_vector_size,
        imp.skip_in, imp.multires, imp.geometric_init, imp.bias,
        imp.weight_norm)

    ren = cfg.rendering
    d_view = embed_dim(ren.multires_view, 3)
    # idr mode input: [points(3), view_pe, normals(3), features]
    # (network.py:148-154, 174-177).
    d_in0 = ren.d_in + cfg.feature_vector_size + (d_view - 3)
    widths = [d_in0] + list(ren.dims) + [ren.d_out]
    rgb_params = layers.init_mlp(k_rgb, widths, ren.weight_norm)

    return {
        "sdf": sdf_params,
        "rgb": rgb_params,
        "density": init_laplace_density(cfg.density.beta_init),
    }


def _compute_dtype(cfg: ModelConfig):
    """bf16 MXU path when cfg.compute_dtype == 'bfloat16'."""
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None


def _activation_dtype(cfg: ModelConfig):
    """Hidden-activation dtype BETWEEN MLP layers (final layer outputs
    stay f32). Only active alongside bf16 dots — bf16 residuals with
    f32 matmuls would downcast inputs without any MXU benefit. The win
    is in the backward pass: saved residuals and the elementwise
    chains halve their HBM traffic (v5e, production 512-ray step:
    17.0 -> 13.3 ms)."""
    if cfg.activation_dtype == "bfloat16" and cfg.compute_dtype == "bfloat16":
        return jnp.bfloat16
    return None


# --------------------------------------------------------------------------
# SDF network
# --------------------------------------------------------------------------

def sdf_mlp_raw(params, cfg: ModelConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Raw MLP output (N, 1 + feature_size) (network.py:71-88)."""
    imp = cfg.implicit
    dt = _compute_dtype(cfg)
    act_dt = _activation_dtype(cfg)
    inp = positional_encoding(x, imp.multires)
    h = inp
    n_layers = len(params)
    inv_sqrt2 = 0.7071067811865475
    for l, p in enumerate(params):
        if l in imp.skip_in:
            # Under bf16 activations the PE input joins the skip concat
            # in bf16 so the junction stays half-width end to end.
            h = jnp.concatenate([h, inp.astype(h.dtype)], axis=-1) \
                * jnp.asarray(inv_sqrt2, h.dtype)
        h = layers.apply_linear(p, h, compute_dtype=dt)
        if l < n_layers - 1:
            if act_dt is not None:
                h = h.astype(act_dt)
            h = layers.softplus_b(h, beta=100.0)
    return h


def _clamp_sdf(sdf, x, cfg: ModelConfig, bounding_sphere: float):
    """Clamp SDF by the bounding-sphere SDF so rays terminate
    (network.py:109-112)."""
    if bounding_sphere > 0.0:
        sphere_sdf = cfg.implicit.sphere_scale * (
            bounding_sphere - jnp.linalg.norm(x, axis=-1, keepdims=True))
        sdf = jnp.minimum(sdf, sphere_sdf)
    return sdf


def sdf_values(params, cfg: ModelConfig, x: jnp.ndarray,
               bounding_sphere: float) -> jnp.ndarray:
    """Clamped SDF values (N,) (network.py:125-131)."""
    out = sdf_mlp_raw(params, cfg, x)
    sdf = _clamp_sdf(out[..., :1], x, cfg, bounding_sphere)
    return sdf[..., 0]


def sdf_feat_grad(params, cfg: ModelConfig, x: jnp.ndarray,
                  bounding_sphere: float):
    """(sdf, features, d sdf/dx) with grad flowing through the clamp
    (network.py:105-123). The spatial gradient stays in the autodiff
    graph so the eikonal term trains the SDF (double backprop).

    NOTE: a jax.vjp formulation that shares the forward pass between
    the values and the spatial gradient is mathematically identical and
    cheaper on paper, but its doubly-differentiated graph crashes the
    TPU runtime (worker SIGILL — same compiler bug family as the
    grad-of-sum form documented at sdf_gradient below). Keep the
    separate-forward form; XLA CSEs the duplicate forward anyway."""
    def sdf_only(pts):
        out = sdf_mlp_raw(params, cfg, pts)
        return jnp.sum(_clamp_sdf(out[..., :1], pts, cfg, bounding_sphere))

    out = sdf_mlp_raw(params, cfg, x)
    sdf = _clamp_sdf(out[..., :1], x, cfg, bounding_sphere)
    feat = out[..., 1:]
    grads = jax.grad(sdf_only)(x)
    return sdf, feat, grads


def sdf_gradient(params, cfg: ModelConfig, x: jnp.ndarray,
                 bounding_sphere: float) -> jnp.ndarray:
    """d sdf/dx for eikonal points (network.py:90-103). NOTE: the
    reference's `gradient()` differentiates the UNCLAMPED sdf.

    Formulated as vmap(grad(pointwise)) rather than grad(sum(batch)):
    mathematically identical for a pointwise MLP, but the grad-of-sum
    form triggers a TPU XLA fusion-pass crash (SIGILL in
    TpuPriorityFusionQueue) when differentiated a second time for the
    eikonal loss."""
    del bounding_sphere

    def sdf_single(pt):
        return sdf_mlp_raw(params, cfg, pt[None])[0, 0]

    return jax.vmap(jax.grad(sdf_single))(x)


# NOTE (measured negative result, v5e, 512-ray production step):
# merging the eikonal points into the render points' MLP batch — one
# forward + one gradient over the concatenated batch instead of three
# separate pipelines — does NOT help. The vmap(grad(pointwise))
# formulation regresses the step 16.7 -> 18.5 ms (its second
# derivative compiles to a slower program), and the grad-of-sum mixed
# objective (clamped sum on render points + raw sum on eikonal points)
# lands at 17.1 ms, within noise of the separate-path baseline: the
# backward is not bottlenecked by the extra 1k-point pipeline's FLOPs
# or launches. Keep the separate sdf_feat_grad + sdf_gradient calls.


# --------------------------------------------------------------------------
# Radiance network
# --------------------------------------------------------------------------

def rgb_mlp(params, cfg: ModelConfig, points, normals, view_dirs, feats):
    """RenderingNetwork.forward (network.py:170-190)."""
    ren = cfg.rendering
    view_pe = positional_encoding(view_dirs, ren.multires_view)
    if ren.mode == "idr":
        h = jnp.concatenate([points, view_pe, normals, feats], axis=-1)
    elif ren.mode == "nerf":
        h = jnp.concatenate([view_pe, feats], axis=-1)
    else:
        raise ValueError(ren.mode)
    n_layers = len(params)
    dt = _compute_dtype(cfg)
    act_dt = _activation_dtype(cfg)
    for l, p in enumerate(params):
        h = layers.apply_linear(p, h, compute_dtype=dt)
        if l < n_layers - 1:
            if act_dt is not None:
                h = h.astype(act_dt)
            h = jax.nn.relu(h)
    return jax.nn.sigmoid(h)


# --------------------------------------------------------------------------
# Volume rendering
# --------------------------------------------------------------------------

def volume_rendering(z_vals, density):
    """Log-space alpha compositing (network.py:281-295).

    density: (R, S). Returns weights (R, S)."""
    dists = z_vals[:, 1:] - z_vals[:, :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[:, :1], 1e10)], axis=-1)
    free_energy = dists * density
    shifted = jnp.concatenate(
        [jnp.zeros_like(free_energy[:, :1]), free_energy[:, :-1]], axis=-1)
    alpha = 1.0 - jnp.exp(-free_energy)
    transmittance = jnp.exp(-jnp.cumsum(shifted, axis=-1))
    return alpha * transmittance


# --------------------------------------------------------------------------
# Full forward
# --------------------------------------------------------------------------

class RenderOutput(NamedTuple):
    rgb_values: jnp.ndarray       # (R, 3)
    depth_values: jnp.ndarray     # (R, 1) z-depth
    depth_vals: jnp.ndarray       # (R, S) per-sample z-depth
    weights: jnp.ndarray          # (R, S)
    xyz: jnp.ndarray              # (R, S, 3) world sample points
    grad_theta: Optional[jnp.ndarray]   # eikonal grads (training)
    normal_map: Optional[jnp.ndarray]   # (R, 3) (eval)
    acc: jnp.ndarray              # (R,) accumulated weight


def render_rays(params, cfg: ModelConfig, uv, pose, intrinsics, rng,
                *, training: bool, fast: int,
                jitter=None) -> RenderOutput:
    """VolSDFNetwork.forward (network.py:206-279).

    uv: (B, N, 2); pose/intrinsics: (B, 4, 4). Rays are flattened to
    R = B*N — rays are the sharding axis for multi-chip.
    fast: sampler iteration budget; -1 => cfg.sampler.max_total_iters.
    jitter: optional common-random-numbers feed (paired
    cross-framework experiments): the sampler keys documented at
    models/sampler.py:error_bound_sample plus "eik_pts" (R, 3) U[0,1)
    realizations for the uniform eikonal points (network.py:260-261).
    """
    bounding_sphere = 0.0 if cfg.white_bkgd else cfg.scene_bounding_sphere
    ray_dirs, cam_loc = get_camera_params(uv, pose, intrinsics)
    depth_scale = depth_scale_factor(uv, intrinsics)  # (B, N, 1)

    B, N, _ = ray_dirs.shape
    R = B * N
    ray_dirs = ray_dirs.reshape(R, 3)
    cam_loc = jnp.broadcast_to(cam_loc[:, None, :], (B, N, 3)).reshape(R, 3)
    depth_scale = depth_scale.reshape(R, 1)

    k_sample, k_eik = jax.random.split(rng)
    n_iters = fast if fast >= 0 else cfg.sampler.max_total_iters

    sdf_fn = lambda pts: sdf_values(
        jax.lax.stop_gradient(params["sdf"]), cfg, pts, bounding_sphere)
    beta0 = jax.lax.stop_gradient(
        get_beta(params["density"], cfg.density.beta_min))

    s_out = error_bound_sample(
        k_sample, cfg.sampler, ray_dirs, cam_loc, sdf_fn, beta0,
        n_iters=n_iters, training=training,
        scene_bounding_sphere=cfg.scene_bounding_sphere, jitter=jitter)
    z_vals = s_out.z_vals
    S = z_vals.shape[1]

    points = cam_loc[:, None, :] + z_vals[..., None] * ray_dirs[:, None, :]
    points_flat = points.reshape(-1, 3)
    dirs_flat = jnp.broadcast_to(
        ray_dirs[:, None, :], (R, S, 3)).reshape(-1, 3)

    sdf, feats, grads = sdf_feat_grad(
        params["sdf"], cfg, points_flat, bounding_sphere)
    rgb_flat = rgb_mlp(params["rgb"], cfg, points_flat, grads, dirs_flat,
                       feats)
    rgb = rgb_flat.reshape(R, S, 3)

    beta = get_beta(params["density"], cfg.density.beta_min)
    density = laplace_density(sdf[..., 0], beta).reshape(R, S)
    weights = volume_rendering(z_vals, density)

    rgb_values = jnp.sum(weights[..., None] * rgb, axis=1)
    depth_values = jnp.sum(weights * z_vals, axis=1, keepdims=True) / (
        jnp.sum(weights, axis=1, keepdims=True) + 1e-8)
    depth_values = depth_scale * depth_values

    acc = jnp.sum(weights, axis=-1)
    if cfg.white_bkgd:
        bg = jnp.asarray(cfg.bg_color, dtype=rgb_values.dtype)
        rgb_values = rgb_values + (1.0 - acc[..., None]) * bg

    grad_theta = None
    normal_map = None
    if training:
        # Eikonal points: uniform in the bounding cube + near-surface
        # (network.py:258-268).
        r = cfg.scene_bounding_sphere
        if jitter is not None:
            # U[0,1) feed -> U(-r, r), exactly Tensor.uniform_'s
            # affine map so torch replays the same realizations.
            eik_uniform = -r + 2.0 * r * jitter["eik_pts"]
        else:
            eik_uniform = jax.random.uniform(
                k_eik, (R, 3), minval=-r, maxval=r)
        eik_near = cam_loc + s_out.z_samples_eik * ray_dirs
        eik_points = jnp.concatenate([eik_uniform, eik_near], axis=0)
        grad_theta = sdf_gradient(params["sdf"], cfg, eik_points,
                                  bounding_sphere)
    else:
        g = jax.lax.stop_gradient(grads)
        normals = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
        normals = normals.reshape(R, S, 3)
        normal_map = jnp.sum(weights[..., None] * normals, axis=1)

    return RenderOutput(
        rgb_values=rgb_values,
        depth_values=depth_values,
        depth_vals=z_vals * depth_scale,
        weights=weights,
        xyz=points,
        grad_theta=grad_theta,
        normal_map=normal_map,
        acc=acc,
    )
