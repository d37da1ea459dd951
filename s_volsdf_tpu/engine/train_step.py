"""The jit-compiled VolSDF optimization step.

Replaces the reference's stateful trainer loop body
(/root/reference/volsdf/vsdf.py:196-235): forward (fast=1 sampler),
cost_mapping against the MVS probability volumes, loss, backward,
NaN/Inf gradient guard (vsdf.py:454-464), clip, Adam — all fused into
one XLA program. MVS volumes ride along as device-resident arrays.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from s_volsdf_tpu.config import Config
from s_volsdf_tpu.models.loss import LossOutput, compute_loss
from s_volsdf_tpu.models.network import render_rays
from s_volsdf_tpu.ops.cost_mapping import MVSVolumes, cost_mapping


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
    if cfg.model.with_background:
        from s_volsdf_tpu.models.network_bg import render_rays_bg
        out = render_rays_bg(
            params, cfg.model, batch["uv"], batch["pose"],
            batch["intrinsics"], rng, training=True, fast=1)
    else:
        out = render_rays(
            params, cfg.model, batch["uv"], batch["pose"],
            batch["intrinsics"], rng, training=True, fast=1)
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
    loss_out = compute_loss(
        cfg.loss, outputs, batch["rgb"], batch.get("rgb_smooth", batch["rgb"]),
        iter_step, use_mvs=use_mvs)
    return loss_out.loss, loss_out


@functools.partial(jax.jit, static_argnames=("cfg", "tx", "use_mvs"))
def train_step(state: TrainState, batch: Dict, rng, mvs: Optional[MVSVolumes],
               *, cfg: Config, tx, use_mvs: bool
               ) -> Tuple[TrainState, LossOutput]:
    """One optimization step.

    batch: uv (B,N,2), pose (B,4,4), intrinsics (B,4,4), rgb (B,N,3),
    rgb_smooth (B,N,3), view_onehot (V,) — 1.0 at the training view
    index of this batch (drives the pi/pj split in cost_mapping).
    """
    mvs_in = mvs if use_mvs else None
    grads, loss_out = jax.grad(_loss_fn, has_aux=True)(
        state.params, cfg, batch, rng, mvs_in, state.iter_step)

    # NaN/Inf guard: skip the update entirely (vsdf.py:454-464). Also
    # checks the loss — JAX's |x - NaN| gradient is finite-but-garbage
    # (sign(NaN) -> ±1), so grads alone can miss data NaNs.
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

    return TrainState(new_params, new_opt_state, state.iter_step + 1), loss_out
