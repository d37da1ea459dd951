"""The jit-compiled VolSDF optimization step.

Replaces the reference's stateful trainer loop body
(/root/reference/volsdf/vsdf.py:196-235): forward (fast=1 sampler),
cost_mapping against the MVS probability volumes, loss, backward,
NaN/Inf gradient guard (vsdf.py:454-464), clip, Adam — all fused into
one XLA program. MVS volumes ride along as device-resident arrays.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from s_volsdf_tpu.config import Config
from s_volsdf_tpu.models.loss import LossOutput, compute_loss
from s_volsdf_tpu.models.network import render_rays
from s_volsdf_tpu.ops.cost_mapping import (MVSVolumes, cost_mapping,
                                           pack_volumes)


def pack_for_chunk(cfg: Config, mvs):
    """Pack MVS volumes into the gather-optimized layout once per
    chunked loop (ops/cost_mapping.py); no-op for None or pre-packed."""
    if mvs is None or not isinstance(mvs, MVSVolumes):
        return mvs
    dtype = jnp.bfloat16 if cfg.train.mvs_pack_dtype == "bfloat16" \
        else jnp.float32
    return pack_volumes(mvs, dtype=dtype)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    iter_step: jnp.ndarray   # scalar int32


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam with optional global-norm clip (vsdf.py:102, 216-217)."""
    tx = [optax.clip_by_global_norm(1.0)] if cfg.train.grad_clip else []
    tx.append(optax.adam(cfg.train.learning_rate))
    return optax.chain(*tx)


def init_train_state(cfg: Config, params, tx) -> TrainState:
    return TrainState(params, tx.init(params), jnp.asarray(0, jnp.int32))


def _loss_fn(params, cfg: Config, batch: Dict, rng,
             mvs: Optional[MVSVolumes], iter_step):
    # Training-only mixed precision: MLP dots run in
    # train_compute_dtype (f32 accumulate) and hidden activations +
    # their backward residuals in train_activation_dtype; eval/render
    # paths keep model.compute_dtype / activation_dtype (f32 default).
    mcfg = dataclasses.replace(
        cfg.model, compute_dtype=cfg.train.train_compute_dtype,
        activation_dtype=cfg.train.train_activation_dtype)
    # Optional common-random-numbers feed for paired cross-framework
    # experiments (models/sampler.py:error_bound_sample jitter doc);
    # rides in the batch dict so the jit signature is unchanged.
    jitter = batch.get("jitter")
    if cfg.model.with_background:
        assert jitter is None, \
            "jitter injection is not threaded through the bg network"
        from s_volsdf_tpu.models.network_bg import render_rays_bg
        out = render_rays_bg(
            params, mcfg, batch["uv"], batch["pose"],
            batch["intrinsics"], rng, training=True, fast=1)
    else:
        out = render_rays(
            params, mcfg, batch["uv"], batch["pose"],
            batch["intrinsics"], rng, training=True, fast=1,
            jitter=jitter)
    outputs = {
        "rgb_values": out.rgb_values,
        "depth_values": out.depth_values,
        "weights": out.weights,
        "grad_theta": out.grad_theta,
    }
    if cfg.model.with_background:
        outputs["depth_values_all"] = out.depth_values_all
    use_mvs = mvs is not None
    if use_mvs:
        pj, pi, _ = cost_mapping(
            jax.lax.stop_gradient(out.depth_vals),
            jax.lax.stop_gradient(out.xyz),
            batch["view_onehot"], mvs)
        outputs["pi"], outputs["pj"] = pi, pj
        if cfg.loss.gate_rescue:
            from s_volsdf_tpu.ops.cost_mapping import (PackedVolumes,
                                                       pack_volumes,
                                                       prior_depth_anchor)
            packed = (mvs if isinstance(mvs, PackedVolumes)
                      else pack_volumes(mvs))
            anchor, peak = prior_depth_anchor(
                batch["uv"].reshape(-1, 2), batch["view_onehot"], packed)
            outputs["prior_anchor"] = anchor
            outputs["prior_peak"] = peak
    loss_out = compute_loss(
        cfg.loss, outputs, batch["rgb"], batch.get("rgb_smooth", batch["rgb"]),
        iter_step, use_mvs=use_mvs)
    return loss_out.loss, loss_out


def guarded_update(tx, state: TrainState, grads,
                   loss_out: LossOutput
                   ) -> Tuple[TrainState, LossOutput]:
    """NaN/Inf gradient guard + optimizer apply (vsdf.py:454-464).

    Skips the update entirely when any gradient leaf or the loss is
    non-finite. The loss check matters: JAX's |x - NaN| gradient is
    finite-but-garbage (sign(NaN) -> ±1), so grads alone can miss data
    NaNs. Returns the new state and loss_out with `grad_finite` set
    (1.0 accepted / 0.0 skipped) so callers can count guard trips.
    """
    leaves = jax.tree_util.tree_leaves(grads)
    finite = jnp.all(jnp.asarray(
        [jnp.all(jnp.isfinite(g)) for g in leaves]))
    finite = finite & jnp.isfinite(loss_out.loss)
    grads = jax.tree.map(
        lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)

    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    # If non-finite, keep old params/opt_state.
    new_params = jax.tree.map(
        lambda n, o: jnp.where(finite, n, o), new_params, state.params)
    new_opt_state = jax.tree.map(
        lambda n, o: jnp.where(finite, n, o), new_opt_state, state.opt_state)
    return (TrainState(new_params, new_opt_state, state.iter_step + 1),
            loss_out._replace(grad_finite=finite.astype(jnp.float32)))


def sample_train_batch(scene: Dict, rng, *, n_views: int,
                       img_res: Tuple[int, int], n_rays: int,
                       shard_axis: Optional[str] = None):
    """On-device pixel sampling for one step (replaces the reference's
    host DataLoader + resample, vsdf.py:200-203, 232).

    All lanes of a sharded step pick the SAME view (the reference draws
    one training view per step); with `shard_axis` set, the pixel and
    per-step RNG keys are folded with the chip index so each chip
    renders an independent ray shard of the global batch.

    Returns (batch, k_step).
    """
    H, W = img_res
    total_pixels = H * W
    k_view, k_pix, k_step = jax.random.split(rng, 3)
    if shard_axis is not None:
        idx = jax.lax.axis_index(shard_axis)
        k_pix = jax.random.fold_in(k_pix, idx)
        k_step = jax.random.fold_in(k_step, idx)
    view = jax.random.randint(k_view, (), 0, n_views)
    pix = jax.random.randint(k_pix, (n_rays,), 0, total_pixels)

    ys = (pix // W).astype(jnp.float32)
    xs = (pix % W).astype(jnp.float32)
    uv = jnp.stack([xs, ys], axis=-1)

    batch = {
        "uv": uv[None],
        "rgb": scene["rgb"][view][pix][None],
        "rgb_smooth": scene["rgb_smooth"][view][pix][None],
        "pose": scene["poses"][view][None],
        "intrinsics": scene["intrinsics"][view][None],
        "view_onehot": jax.nn.one_hot(view, n_views),
    }
    return batch, k_step


def make_one_step(cfg: Config, tx, *, use_mvs: bool, n_views: int,
                  img_res: Tuple[int, int], n_rays: Optional[int] = None,
                  shard_axis: Optional[str] = None):
    """Build the scan-body step: sample pixels on device, grad, guard,
    update. With `shard_axis`, grads and loss stats are pmean-averaged
    over that mesh axis before the (replicated) update — the multi-chip
    variant keeps the exact structure of the single-chip body.
    """
    n_rays = n_rays if n_rays is not None else cfg.train.num_pixels

    def one_step(scene, mvs, state: TrainState, rng):
        batch, k_step = sample_train_batch(
            scene, rng, n_views=n_views, img_res=img_res, n_rays=n_rays,
            shard_axis=shard_axis)
        grads, loss_out = jax.grad(_loss_fn, has_aux=True)(
            state.params, cfg, batch, k_step,
            mvs if use_mvs else None, state.iter_step)
        if shard_axis is not None:
            grads = jax.lax.pmean(grads, shard_axis)
            loss_out = jax.tree.map(
                lambda x: jax.lax.pmean(x, shard_axis), loss_out)
        return guarded_update(tx, state, grads, loss_out)

    return one_step


@functools.partial(jax.jit, static_argnames=("cfg", "tx", "use_mvs"))
def train_step(state: TrainState, batch: Dict, rng, mvs: Optional[MVSVolumes],
               *, cfg: Config, tx, use_mvs: bool
               ) -> Tuple[TrainState, LossOutput]:
    """One optimization step on a host-provided batch.

    batch: uv (B,N,2), pose (B,4,4), intrinsics (B,4,4), rgb (B,N,3),
    rgb_smooth (B,N,3), view_onehot (V,) — 1.0 at the training view
    index of this batch (drives the pi/pj split in cost_mapping).
    """
    mvs_in = mvs if use_mvs else None
    grads, loss_out = jax.grad(_loss_fn, has_aux=True)(
        state.params, cfg, batch, rng, mvs_in, state.iter_step)
    return guarded_update(tx, state, grads, loss_out)
