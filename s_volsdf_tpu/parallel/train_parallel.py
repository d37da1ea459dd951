"""Multi-chip VolSDF training: rays sharded over the mesh, gradients
psum-averaged over ICI; or whole scenes sharded over the mesh.

New capability vs the single-GPU reference (SURVEY.md sections 2.9, 7):

* `make_sharded_scan_train_fn` — the PRODUCTION multi-chip loop. One
  scene's per-step ray batch (the reference's 512 random pixels,
  config/ours.yaml:11) splits across chips: each chip samples its own
  n_rays/n_chips pixels on device (same view on every chip, per-chip
  folded pixel RNG), renders them, and the gradient is pmean-averaged
  before the replicated Adam update. The whole multi-step chunk is ONE
  XLA program (`lax.scan` inside `shard_map`), preserving the
  one-dispatch-per-chunk property of the single-chip trainer
  (engine/trainer.py) — the only cross-chip traffic is one gradient
  all-reduce per step, riding ICI.

* `make_sharded_train_step` — single-step variant on a host-provided
  batch with the ray axis explicitly sharded; used by tests and the
  driver dryrun to validate sharding semantics.

* `make_sharded_multiscene_train_fn` — S independent per-scene
  optimizations sharded over a 'scene' mesh axis (embarrassingly
  parallel, zero collectives): the TPU answer to the reference's
  mp.Pool over scenes (/root/reference/runner.py:420-432).

* `make_sharded_scene_ray_train_fn` — the 2D composition of the two:
  a ('scene', 'rays') mesh where each scene owns a slice of chips and
  its ray batch shards within the slice. This is the pod-scale
  topology (e.g. 4 scenes x 8 ray-chips on a v5e-32): gradient
  pmeans ride the 'rays' submesh ICI only, with ZERO traffic on the
  'scene' axis, so scenes scale out for free while each scene still
  gets ray-level speedup. It is also what lets S < n_devices
  multiscene runs use the whole mesh (pure scene-sharding would idle
  n_devices - S chips).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from s_volsdf_tpu.config import Config
from s_volsdf_tpu.engine.train_step import (TrainState, _loss_fn,
                                            guarded_update, make_one_step,
                                            pack_for_chunk)
from s_volsdf_tpu.models.loss import LossOutput
from s_volsdf_tpu.ops.cost_mapping import MVSVolumes


def make_sharded_scan_train_fn(cfg: Config, tx, mesh: Mesh, *,
                               use_mvs: bool, n_views: int,
                               img_res: Tuple[int, int],
                               axis: str = "rays"):
    """Scan-fused multi-chip training chunk (see module docstring).

    Drop-in replacement for engine.trainer.make_scan_train_fn: same
    (state, rngs, scene, mvs) -> (state, losses) signature with all
    inputs/outputs replicated; cfg.train.num_pixels is the GLOBAL ray
    count and must divide by mesh.shape[axis].
    """
    n_chips = mesh.shape[axis]
    n_rays = cfg.train.num_pixels
    if n_rays % n_chips != 0:
        raise ValueError(
            f"train.num_pixels={n_rays} not divisible by mesh axis "
            f"{axis!r} size {n_chips}")
    one_step = make_one_step(cfg, tx, use_mvs=use_mvs, n_views=n_views,
                             img_res=img_res, n_rays=n_rays // n_chips,
                             shard_axis=axis)

    def per_chip_chunk(state, rngs, scene, packed):
        step = lambda carry, rng: one_step(scene, packed, carry, rng)
        return jax.lax.scan(step, state, rngs)

    sharded = shard_map(
        per_chip_chunk, mesh=mesh,
        in_specs=(P(), P(), P(), P() if use_mvs else None),
        out_specs=(P(), P()),
        check_vma=False)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _run(state: TrainState, rngs, scene: Dict, packed
             ) -> Tuple[TrainState, LossOutput]:
        return sharded(state, rngs, scene, packed)

    def run_chunk(state: TrainState, rngs, scene: Dict,
                  mvs: Optional[MVSVolumes]
                  ) -> Tuple[TrainState, LossOutput]:
        # Pack OUTSIDE the jit so the volumes enter as parameters, not
        # loop-invariant temps (see engine.trainer.make_scan_train_fn).
        packed = pack_for_chunk(cfg, mvs)
        if packed is not None:
            # Cascade outputs may arrive committed to the view mesh
            # (MVSEngine.stage_all_views); every chip's cost_mapping
            # needs all views' volumes, so replicate onto THIS mesh
            # (jit refuses cross-mesh committed arguments).
            from jax.sharding import NamedSharding
            packed = jax.device_put(
                packed, NamedSharding(mesh, P()))
        return _run(state, rngs, scene, packed)

    run_chunk.one_step = one_step
    run_chunk.jitted = _run  # for HLO inspection (test_parallel)
    return run_chunk


def make_sharded_train_step(cfg: Config, tx, mesh: Mesh, *, use_mvs: bool,
                            axis: str = "rays"):
    """Build a jitted multi-chip train step on a host-provided batch.

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
        state, loss_out = guarded_update(
            tx, TrainState(params, opt_state, iter_step), grads, loss_out)
        return state.params, state.opt_state, loss_out

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
        check_vma=False)

    @jax.jit
    def step(state: TrainState, batch: Dict, rng,
             mvs: Optional[MVSVolumes]) -> Tuple[TrainState, LossOutput]:
        new_params, new_opt, loss_out = sharded(
            state.params, state.opt_state, state.iter_step, batch, rng, mvs)
        return TrainState(new_params, new_opt, state.iter_step + 1), loss_out

    return step


def make_sharded_scene_ray_train_fn(cfg: Config, tx, mesh: Mesh, *,
                                    use_mvs: bool, n_views: int,
                                    img_res: Tuple[int, int],
                                    scene_axis: str = "scene",
                                    ray_axis: str = "rays"):
    """2D-mesh training chunk: scenes over `scene_axis`, each scene's
    ray batch over `ray_axis` (see module docstring).

    Same (states, rngs, scenes, mvs) -> (states, losses) signature as
    make_sharded_multiscene_train_fn: every pytree carries a leading S
    axis with S divisible by mesh.shape[scene_axis];
    cfg.train.num_pixels is the per-scene GLOBAL ray count and must
    divide by mesh.shape[ray_axis]. Each scene's trajectory is the
    same program as make_sharded_scan_train_fn on a 1D 'rays' mesh of
    the same size (same per-chip folded rng, same pmean), so results
    match the 1D loop chip-for-chip.
    """
    n_ray_chips = mesh.shape[ray_axis]
    n_rays = cfg.train.num_pixels
    if n_rays % n_ray_chips != 0:
        raise ValueError(
            f"train.num_pixels={n_rays} not divisible by mesh axis "
            f"{ray_axis!r} size {n_ray_chips}")
    one_step = make_one_step(cfg, tx, use_mvs=use_mvs, n_views=n_views,
                             img_res=img_res, n_rays=n_rays // n_ray_chips,
                             shard_axis=ray_axis)

    def scene_scan(state, rngs, scene, packed):
        step = lambda carry, rng: one_step(scene, packed, carry, rng)
        return jax.lax.scan(step, state, rngs)

    def per_chip(states, rngs, scenes, packed):
        # Local scene shard is a leading batch axis; the pmean inside
        # one_step reduces over the 'rays' mesh axis and maps through
        # the vmap untouched.
        return jax.vmap(scene_scan)(states, rngs, scenes, packed)

    spec = P(scene_axis)
    sharded = shard_map(
        per_chip, mesh=mesh,
        in_specs=(spec, spec, spec, spec if use_mvs else None),
        out_specs=(spec, spec),
        check_vma=False)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _run(states: TrainState, rngs, scenes: Dict, packed
             ) -> Tuple[TrainState, LossOutput]:
        return sharded(states, rngs, scenes, packed)

    def run_chunk(states: TrainState, rngs, scenes: Dict,
                  mvs: Optional[MVSVolumes]
                  ) -> Tuple[TrainState, LossOutput]:
        # Per-scene pack OUTSIDE the jit (parameters, not loop temps);
        # pre-packed volumes (run_joint) pass through.
        if isinstance(mvs, MVSVolumes):
            mvs = jax.vmap(lambda m: pack_for_chunk(cfg, m))(mvs)
        if mvs is not None:
            # Commit to THIS mesh: scene-sharded, replicated over the
            # ray submesh (cascade outputs may arrive committed to the
            # eval view mesh; jit refuses cross-mesh arguments).
            from jax.sharding import NamedSharding
            mvs = jax.device_put(mvs, NamedSharding(mesh, spec))
        return _run(states, rngs, scenes, mvs)

    run_chunk.one_step = one_step
    run_chunk.jitted = _run  # for HLO inspection (test_parallel)
    return run_chunk


def make_sharded_multiscene_train_fn(cfg: Config, tx, mesh: Mesh, *,
                                     use_mvs: bool, n_views: int,
                                     img_res: Tuple[int, int],
                                     axis: str = "scene"):
    """S independent per-scene optimizations, scenes sharded over
    `axis` (S divisible by the axis size; use S == axis size for one
    scene per chip). All pytrees (states, scene tensors, MVS volumes,
    rngs) carry a leading S axis. Zero cross-chip collectives — each
    chip advances its own scenes' scan; per-scene trajectories are
    bit-identical to solo runs of the same rng stream.
    """
    one_step = make_one_step(cfg, tx, use_mvs=use_mvs, n_views=n_views,
                             img_res=img_res)

    def scene_scan(state, rngs, scene, packed):
        step = lambda carry, rng: one_step(scene, packed, carry, rng)
        return jax.lax.scan(step, state, rngs)

    def per_chip(states, rngs, scenes, packed):
        return jax.vmap(scene_scan)(states, rngs, scenes, packed)

    spec = P(axis)
    sharded = shard_map(
        per_chip, mesh=mesh,
        in_specs=(spec, spec, spec, spec if use_mvs else None),
        out_specs=(spec, spec),
        check_vma=False)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _run(states: TrainState, rngs, scenes: Dict, packed
             ) -> Tuple[TrainState, LossOutput]:
        # rngs: (S, T, 2); states/scenes/packed: leading S axis.
        return sharded(states, rngs, scenes, packed)

    def run_chunk(states: TrainState, rngs, scenes: Dict,
                  mvs: Optional[MVSVolumes]
                  ) -> Tuple[TrainState, LossOutput]:
        # Per-scene pack, OUTSIDE the jit (parameters, not loop temps).
        if isinstance(mvs, MVSVolumes):
            mvs = jax.vmap(lambda m: pack_for_chunk(cfg, m))(mvs)
        if mvs is not None:
            # Commit to THIS mesh: cascade outputs can arrive committed
            # to the eval view mesh (or a sub-mesh when S < n_devices);
            # jit refuses cross-mesh arguments.
            from jax.sharding import NamedSharding
            mvs = jax.device_put(mvs, NamedSharding(mesh, spec))
        return _run(states, rngs, scenes, mvs)

    run_chunk.jitted = _run  # for HLO inspection (test_parallel)
    return run_chunk
