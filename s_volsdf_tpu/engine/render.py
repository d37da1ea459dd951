"""Chunked full-image rendering (the eval path).

Replaces the reference's split_input/merge_output pixel chunking
(/root/reference/volsdf/utils/general.py:24-59, vsdf.py:237-287) with a
jit-compiled fixed-chunk render: all chunks share one compiled program,
the host loop just feeds pixel blocks. Supports both the foreground
model and the NeRF++ background model (with the nearest-training-view
direction trick, network_bg.py:70-75).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from s_volsdf_tpu.config import ModelConfig
from s_volsdf_tpu.models.network import render_rays


def _shard_inputs(mesh: Optional[Mesh], chunk: int, params, consts):
    """Prepare (params, consts, uv_placer) for an optionally sharded
    render.

    Full-image rendering is embarrassingly parallel over rays, so
    multi-chip eval is pure data parallelism: each chunk's ray axis is
    sharded over the mesh's first axis, params/pose/intrinsics are
    replicated, and GSPMD partitions the compiled render with zero
    collectives (new capability vs the single-GPU reference,
    SURVEY.md section 2.9). Returns the inputs committed to their
    shardings plus a function that places a host uv block.
    """
    if mesh is None or np.prod(list(mesh.shape.values())) <= 1:
        return params, consts, lambda uv: jnp.asarray(uv)
    from s_volsdf_tpu.parallel.mesh import ray_sharding, replicated
    axis = mesh.axis_names[0]
    if chunk % mesh.shape[axis] != 0:
        raise ValueError(
            f"render chunk={chunk} not divisible by mesh axis "
            f"{axis!r} size {mesh.shape[axis]}")
    rep = replicated(mesh)
    shard = ray_sharding(mesh, axis)
    params = jax.device_put(params, rep)
    consts = tuple(None if c is None else jax.device_put(c, rep)
                   for c in consts)
    return params, consts, lambda uv: jax.device_put(uv, shard)


@functools.partial(jax.jit, static_argnames=("cfg", "fast"))
def _render_chunk(params, uv, pose, intrinsics, rng, *, cfg: ModelConfig,
                  fast: int):
    out = render_rays(params, cfg, uv, pose, intrinsics, rng,
                      training=False, fast=fast)
    return {
        "rgb_values": out.rgb_values,
        "depth_values": out.depth_values,
        "normal_map": out.normal_map,
        "acc": out.acc,
    }


@functools.partial(jax.jit, static_argnames=("cfg", "fast"))
def _depth_chunk(params, uv, pose, intrinsics, rng, *, cfg: ModelConfig,
                 fast: int):
    """Depth/acc only — skips the radiance MLP and normal computation
    (cascade feedback needs just the depth map, runner.py:239-243)."""
    import jax.numpy as jnp
    from s_volsdf_tpu.models.density import get_beta, laplace_density
    from s_volsdf_tpu.models.network import (sdf_values, volume_rendering)
    from s_volsdf_tpu.models.sampler import error_bound_sample
    from s_volsdf_tpu.utils.cameras import (depth_scale_factor,
                                            get_camera_params)

    bounding = 0.0 if (cfg.white_bkgd or cfg.with_background) \
        else cfg.scene_bounding_sphere
    ray_dirs, cam_loc = get_camera_params(uv, pose, intrinsics)
    depth_scale = depth_scale_factor(uv, intrinsics)
    B, N, _ = ray_dirs.shape
    R = B * N
    ray_dirs = ray_dirs.reshape(R, 3)
    cam_loc = jnp.broadcast_to(cam_loc[:, None, :], (B, N, 3)).reshape(R, 3)
    depth_scale = depth_scale.reshape(R, 1)

    sdf_fn = lambda pts: sdf_values(params["sdf"], cfg, pts, bounding)
    beta0 = get_beta(params["density"], cfg.density.beta_min)
    n_iters = fast if fast >= 0 else cfg.sampler.max_total_iters
    s_out = error_bound_sample(
        rng, cfg.sampler, ray_dirs, cam_loc, sdf_fn, beta0,
        n_iters=n_iters, training=False,
        scene_bounding_sphere=cfg.scene_bounding_sphere)
    z_vals = s_out.z_vals
    if cfg.with_background:
        z_vals = z_vals[:, :-1]
    pts = cam_loc[:, None, :] + z_vals[..., None] * ray_dirs[:, None, :]
    sdf = sdf_fn(pts.reshape(-1, 3)).reshape(z_vals.shape)
    density = laplace_density(sdf, beta0)
    weights = volume_rendering(z_vals, density)
    depth = jnp.sum(weights * z_vals, axis=1, keepdims=True) / (
        jnp.sum(weights, axis=1, keepdims=True) + 1e-8)
    return {"depth_values": depth * depth_scale,
            "acc": jnp.sum(weights, axis=-1)}


def render_depth(params, cfg: ModelConfig, pose, intrinsics,
                 img_res: Tuple[int, int], *, chunk: int = 16384,
                 fast: int = -1, rng=None,
                 mesh: Optional[Mesh] = None) -> Dict[str, np.ndarray]:
    """Depth-only full-image render (cascade feedback path).

    With `mesh`, each chunk's rays shard over the mesh's first axis
    (see _shard_inputs)."""
    H, W = img_res
    rng = jax.random.PRNGKey(0) if rng is None else rng
    ys, xs = np.mgrid[0:H, 0:W]
    uv = np.stack([xs, ys], axis=-1).reshape(-1, 2).astype(np.float32)
    n = uv.shape[0]
    n_pad = (-n) % chunk
    uv = np.concatenate([uv, np.zeros((n_pad, 2), np.float32)], axis=0)
    pose_b = jnp.asarray(pose)[None]
    intr_b = jnp.asarray(intrinsics)[None]
    params, (pose_b, intr_b), place_uv = _shard_inputs(
        mesh, chunk, params, (pose_b, intr_b))
    # Dispatch every chunk before fetching any result: each fetch is a
    # synchronous round trip over the device link, and fetching chunk i
    # before dispatching i+1 serializes compute behind transfers
    # (measured 14.8 -> 12.7 s on a 576x768 worst-case view).
    outs = [_depth_chunk(params, place_uv(uv[i:i + chunk][None]),
                         pose_b, intr_b, rng, cfg=cfg, fast=fast)
            for i in range(0, uv.shape[0], chunk)]
    outs = [jax.tree.map(np.asarray, o) for o in outs]
    depth = np.concatenate(
        [o["depth_values"].reshape(chunk) for o in outs])[:n].reshape(H, W)
    acc = np.concatenate(
        [o["acc"].reshape(chunk) for o in outs])[:n].reshape(H, W)
    return {"depth": depth, "acc": acc}


@functools.partial(jax.jit, static_argnames=("cfg", "fast"))
def _render_chunk_bg(params, uv, pose, intrinsics, near_pose, rng, *,
                     cfg: ModelConfig, fast: int):
    from s_volsdf_tpu.models.network_bg import render_rays_bg
    out = render_rays_bg(params, cfg, uv, pose, intrinsics, rng,
                         training=False, fast=fast, near_pose=near_pose)
    return {
        "rgb_values": out.rgb_values,
        "depth_values": out.depth_values,
        "normal_map": out.normal_map,
        "acc": out.acc,
    }


def render_image(params, cfg: ModelConfig, pose, intrinsics,
                 img_res: Tuple[int, int], *, chunk: int = 2048,
                 fast: int = -1, rng=None, with_background: bool = False,
                 near_pose: Optional[np.ndarray] = None,
                 mesh: Optional[Mesh] = None
                 ) -> Dict[str, np.ndarray]:
    """Render a full image by fixed-size ray chunks.

    pose/intrinsics: (4, 4). Returns host numpy maps:
    rgb (H, W, 3), depth (H, W), normal (H, W, 3), acc (H, W).
    The pixel grid matches the reference's uv convention
    (scene_dataset.py:227-229: x = column, y = row).
    With `mesh`, each chunk's rays shard over the mesh's first axis
    (see _shard_inputs).
    """
    H, W = img_res
    rng = jax.random.PRNGKey(0) if rng is None else rng
    ys, xs = np.mgrid[0:H, 0:W]
    uv = np.stack([xs, ys], axis=-1).reshape(-1, 2).astype(np.float32)
    n = uv.shape[0]
    n_pad = (-n) % chunk
    uv = np.concatenate([uv, np.zeros((n_pad, 2), np.float32)], axis=0)

    pose_b = jnp.asarray(pose)[None]
    intr_b = jnp.asarray(intrinsics)[None]
    near_b = jnp.asarray(near_pose)[None] if near_pose is not None else None
    params, (pose_b, intr_b, near_b), place_uv = _shard_inputs(
        mesh, chunk, params, (pose_b, intr_b, near_b))

    # Dispatch-all-then-fetch (see render_depth): keeps the device busy
    # instead of serializing each chunk behind its host transfer.
    outs = []
    for i in range(0, uv.shape[0], chunk):
        uv_c = place_uv(uv[i:i + chunk][None])
        if with_background:
            np_b = near_b if near_b is not None else pose_b
            o = _render_chunk_bg(params, uv_c, pose_b, intr_b, np_b, rng,
                                 cfg=cfg, fast=fast)
        else:
            o = _render_chunk(params, uv_c, pose_b, intr_b, rng,
                              cfg=cfg, fast=fast)
        outs.append(o)
    outs = [jax.tree.map(np.asarray, o) for o in outs]

    def cat(key, shape):
        x = np.concatenate([o[key].reshape(chunk, -1) for o in outs])[:n]
        return x.reshape(shape)

    return {
        "rgb": cat("rgb_values", (H, W, 3)),
        "depth": cat("depth_values", (H, W)),
        "normal": cat("normal_map", (H, W, 3)),
        "acc": cat("acc", (H, W)),
    }
