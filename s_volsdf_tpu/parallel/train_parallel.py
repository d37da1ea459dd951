"""Multi-chip VolSDF training: rays sharded over the mesh, gradients
psum-averaged over ICI.

New capability vs the single-GPU reference (SURVEY.md sections 2.9, 7):
one scene's per-step ray batch (the reference's 512 random pixels,
config/ours.yaml:11) splits across chips under `shard_map`; parameters
and MVS volumes are replicated; each chip renders its ray shard and the
gradient is `psum`-averaged before the (replicated) Adam update. This
is pure data parallelism along rays — the only cross-chip traffic is
one gradient all-reduce per step, riding ICI.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from s_volsdf_tpu.config import Config
from s_volsdf_tpu.engine.train_step import TrainState, _loss_fn
from s_volsdf_tpu.models.loss import LossOutput
from s_volsdf_tpu.ops.cost_mapping import MVSVolumes


def make_sharded_train_step(cfg: Config, tx, mesh: Mesh, *, use_mvs: bool,
                            axis: str = "rays"):
    """Build a jitted multi-chip train step.

    Batch layout: uv/rgb/rgb_smooth are (B, N, ...) with N divisible by
    mesh.shape[axis]; pose/intrinsics/view_onehot replicated.
    """

    def per_shard(params, opt_state, iter_step, batch, rng, mvs):
        # Decorrelate per-chip RNG (sampler noise, eikonal points).
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        mvs_in = mvs if use_mvs else None
        grads, loss_out = jax.grad(_loss_fn, has_aux=True)(
            params, cfg, batch, rng, mvs_in, iter_step)
        grads = jax.lax.pmean(grads, axis)
        loss_out = jax.tree.map(lambda x: jax.lax.pmean(x, axis), loss_out)

        # NaN/Inf guard incl. loss (see engine/train_step.py).
        leaves = jax.tree_util.tree_leaves(grads)
        finite = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(g)) for g in leaves]))
        finite = finite & jnp.isfinite(loss_out.loss)
        grads = jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)

        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_params = jax.tree.map(
            lambda n, o: jnp.where(finite, n, o), new_params, params)
        new_opt_state = jax.tree.map(
            lambda n, o: jnp.where(finite, n, o), new_opt_state, opt_state)
        return new_params, new_opt_state, loss_out

    batch_spec = {
        "uv": P(None, axis, None),
        "rgb": P(None, axis, None),
        "rgb_smooth": P(None, axis, None),
        "pose": P(),
        "intrinsics": P(),
        "view_onehot": P(),
    }
    mvs_spec = P() if use_mvs else None

    sharded = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(), P(), batch_spec, P(), mvs_spec),
        out_specs=(P(), P(), P()),
        check_rep=False)

    @jax.jit
    def step(state: TrainState, batch: Dict, rng,
             mvs: Optional[MVSVolumes]) -> Tuple[TrainState, LossOutput]:
        new_params, new_opt, loss_out = sharded(
            state.params, state.opt_state, state.iter_step, batch, rng, mvs)
        return TrainState(new_params, new_opt, state.iter_step + 1), loss_out

    return step
