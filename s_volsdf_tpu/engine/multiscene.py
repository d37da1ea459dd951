"""Multi-scene production pipeline: S per-scene VolSDF optimizations
advance in LOCKSTEP as one XLA program (vmap on one chip, scene-sharded
`shard_map` on a mesh), replacing the reference's serial per-scene loop
(/root/reference/runner.py:46-71) and its fusion-only mp.Pool
(runner.py:420-432) with device-level scene parallelism.

Orchestration per cascade stage: the frozen MVS cascade still runs per
scene (different images/volumes, one jitted program each), then all
scenes' VolSDF optimizations run jointly; feedback renders and output
writing are per scene again. Scenes are grouped by their
per-scan-override config (loss weights are static in the compiled
step), so e.g. DTU scans with different sparse_weight train in
separate groups.

Per-scene trajectories match serial runs to f32 fusion-rounding
tolerance (vmap changes how XLA fuses the step, so results drift at
the last ulp and compound over steps; test_multiscene_pipeline.py
asserts >=99.5% pixel agreement on rendered depth after 30 steps).
Each scene consumes its own trainer's RNG stream with the same
chunking, so the sampled pixels/views are identical to serial.

PERFORMANCE NOTE (measured on one v5e at full production shapes): the
single-chip vmap path is about scheduling, not speed — a production
512-ray step already keeps the chip busy, so S=2 lockstep runs ~25%
SLOWER than 2 serial runs (vmap blocks some fusion). The throughput
win is the MULTI-CHIP axis: scenes sharded one-per-chip over a mesh
(`make_sharded_multiscene_train_fn`) scale linearly with zero
collectives. On one chip, prefer serial scenes (the default
`save_depth`) unless you need synchronized checkpoints/logging.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from s_volsdf_tpu.config import Config, per_scene_overrides
from s_volsdf_tpu.engine.train_step import make_optimizer
from s_volsdf_tpu.engine.trainer import (VolTrainer,
                                         make_multiscene_train_fn)
from s_volsdf_tpu.utils.logging import get_logger

logger = get_logger()


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _scene_dev(trainer: VolTrainer) -> Dict:
    ti = trainer.trains_i
    sc = trainer.scene
    return {
        "rgb": jnp.asarray(sc.rgb[ti]),
        "rgb_smooth": jnp.asarray(sc.rgb_smooth[ti]),
        "poses": jnp.asarray(sc.poses[ti]),
        "intrinsics": jnp.asarray(sc.intrinsics[ti]),
    }


def _pack_stacked(cfg: Config, trainers: List[VolTrainer]):
    """Stacked PackedVolumes for the lockstep loop, packed ONE scene at
    a time. vmapping pack_for_chunk over scenes holds every scene's
    corner-cube f32 temps (8 shifted copies of each (V, D, Hc, Wc)
    volume + the pre-cast concat) live simultaneously — at production
    x2 stage-0 shapes that is >12 GB and OOMs a 16 GB chip (measured,
    round 4). Sequential packing bounds the transient to one scene
    (~5 GB) plus the stacked bf16 result (~1 GB/scene)."""
    from s_volsdf_tpu.engine.train_step import pack_for_chunk
    pack1 = jax.jit(lambda m: pack_for_chunk(cfg, m))
    packed = []
    for t in trainers:
        p = pack1(t.mvs)
        # Bound the transient to one scene's pack temps at a time: a
        # host fetch is the only hard sync on the axon tunnel
        # (block_until_ready returns before remote temps are freed).
        np.asarray(p.nf8[0, 0, 0])
        packed.append(p)
    return _stack(packed)


def _pick_loop(cfg: Config, S: int, *, use_mvs: bool, n_views: int,
               img_res):
    """Pick the widest topology the device count admits: scenes over
    the whole mesh when S divides it; a 2D (scene x rays) mesh when
    there are spare chips per scene (S < n_dev), the per-scene ray
    batch splits across them, AND ray sharding is enabled; else
    one-chip vmap.

    cfg.parallel.shard_rays=false pins each scene's rays to one chip:
    the ray-sharded step folds the RNG per chip, so its pixel draw —
    and therefore the whole trajectory — differs from the single-chip
    loop. Disabling it keeps multiscene trajectories comparable to
    serial single-chip runs (test_multiscene_pipeline.py)."""
    n_dev = len(jax.devices())
    if n_dev > 1 and S % n_dev == 0:
        from s_volsdf_tpu.parallel.mesh import make_mesh
        from s_volsdf_tpu.parallel.train_parallel import (
            make_sharded_multiscene_train_fn)
        mesh = make_mesh((-1,), ("scene",))
        logger.info(f"multiscene: {S} scenes sharded over "
                    f"{mesh.shape['scene']} devices")
        return make_sharded_multiscene_train_fn(
            cfg, make_optimizer(cfg), mesh, use_mvs=use_mvs,
            n_views=n_views, img_res=img_res)
    ray_chips = n_dev // S if S < n_dev else 0
    if (cfg.parallel.shard_rays and ray_chips > 1
            and cfg.train.num_pixels % ray_chips == 0):
        from s_volsdf_tpu.parallel.mesh import make_mesh
        from s_volsdf_tpu.parallel.train_parallel import (
            make_sharded_scene_ray_train_fn)
        # Uses S * ray_chips devices (all of them when S divides n_dev).
        mesh = make_mesh((S, ray_chips), ("scene", "rays"))
        logger.info(
            f"multiscene: 2D mesh — {S} scenes x {ray_chips} ray-chips "
            f"each ({cfg.train.num_pixels // ray_chips} rays/chip, "
            f"{S * ray_chips}/{n_dev} devices)")
        return make_sharded_scene_ray_train_fn(
            cfg, make_optimizer(cfg), mesh, use_mvs=use_mvs,
            n_views=n_views, img_res=img_res)
    if 1 < S < n_dev:
        # No ray split available; still put each scene on its own chip.
        from s_volsdf_tpu.parallel.mesh import make_mesh
        from s_volsdf_tpu.parallel.train_parallel import (
            make_sharded_multiscene_train_fn)
        mesh = make_mesh((S,), ("scene",), devices=jax.devices()[:S])
        logger.info(f"multiscene: {S} scenes sharded over {S}/{n_dev} "
                    f"devices")
        return make_sharded_multiscene_train_fn(
            cfg, make_optimizer(cfg), mesh, use_mvs=use_mvs,
            n_views=n_views, img_res=img_res)
    logger.info(f"multiscene: {S} scenes vmapped on one device"
                + (f" ({n_dev} devices visible but {S} not divisible)"
                   if n_dev > 1 else ""))
    return make_multiscene_train_fn(cfg, make_optimizer(cfg),
                                    use_mvs=use_mvs, n_views=n_views,
                                    img_res=img_res)


def run_joint(trainers: List[VolTrainer], opt_stepN: int,
              chunk_steps: int = 200, log_every: int = 1000) -> None:
    """Advance every trainer by opt_stepN steps in lockstep (the joint
    analog of VolTrainer.run, vsdf.py:322-367). Trainer states, RNG
    streams, epochs and checkpoints are updated in place."""
    cfg = trainers[0].cfg
    S = len(trainers)
    use_mvs = bool(cfg.use_mvs) and all(t.mvs is not None
                                        for t in trainers)
    n_views = len(trainers[0].trains_i)
    img_res = trainers[0].scene.img_res
    assert all(len(t.trains_i) == n_views for t in trainers)
    assert all(t.scene.img_res == img_res for t in trainers)

    run = _pick_loop(cfg, S, use_mvs=use_mvs, n_views=n_views,
                     img_res=img_res)

    states = _stack([t.state for t in trainers])
    scenes = _stack([_scene_dev(t) for t in trainers])
    mvs = _pack_stacked(cfg, trainers) if use_mvs else None

    start = int(np.asarray(states.iter_step)[0])
    done = 0
    next_log = log_every
    logger.info(f"joint volsdf: {S} scenes, start={start} "
                f"steps={opt_stepN} use_mvs={use_mvs}")
    while done < opt_stepN:
        n = min(chunk_steps, opt_stepN - done)
        rngs = []
        for t in trainers:
            t.rng, sub = jax.random.split(t.rng)
            rngs.append(jax.random.split(sub, n))
        states, losses = run(states, jnp.stack(rngs), scenes, mvs)
        done += n
        if done >= next_log or done >= opt_stepN:
            last = np.asarray(losses.loss)[:, -1]
            psnr = np.asarray(losses.psnr)[:, -1]
            logger.info(
                f"joint step {start + done}: loss="
                + ",".join(f"{v:.4f}" for v in last)
                + " psnr=" + ",".join(f"{v:.1f}" for v in psnr))
            next_log += log_every

    # Unstack back into the per-scene trainers (one host fetch).
    states_np = jax.tree.map(np.asarray, states)
    for s, t in enumerate(trainers):
        t.state = jax.tree.map(lambda x: jnp.asarray(x[s]), states_np)
        t.epoch += max(1, opt_stepN // max(n_views, 1))
        t.save_checkpoint()
        t.save_checkpoint(f"epoch_{t.epoch}")


def save_depth_multiscene(cfg: Config, testlist: List[str], *,
                          mvs_weights: Optional[str] = None,
                          exps_root: str = ".",
                          all_hosts: bool = False) -> Dict[str, Dict]:
    """Multi-scene analog of save_depth: per-scene MVS cascades, joint
    VolSDF optimization per override-group, per-scene outputs."""
    from s_volsdf_tpu.engine.runner import (MVSEngine, accumulate_stage,
                                            feedback_depths, run_mvs_stage,
                                            save_scene_outputs, setup_scene)
    from s_volsdf_tpu.parallel.multihost import partition_scenes
    if not all_hosts:
        testlist = partition_scenes(testlist)

    # Group scenes by their per-scan override config (static in the
    # compiled step: loss weights, inverse_depth, ...). Keyed by repr
    # to avoid relying on nested-dataclass hashing.
    groups: Dict[str, tuple] = {}
    for scene in testlist:
        gcfg = per_scene_overrides(cfg, scene)
        key = repr(gcfg)
        groups.setdefault(key, (gcfg, []))[1].append(scene)
    if len(groups) > 1:
        logger.info(f"multiscene: {len(groups)} override-groups "
                    f"{[len(v[1]) for v in groups.values()]}")

    results: Dict[str, Dict] = {}
    for gcfg, scans in groups.values():
        engine = MVSEngine(gcfg, weights_path=mvs_weights)
        scs = [setup_scene(gcfg, s, exps_root=exps_root) for s in scans]

        for stage_idx in range(3):
            stage_outs = []
            for sc in scs:
                stage_outs.append(run_mvs_stage(gcfg, engine, sc,
                                                stage_idx))

            do_volopt = (not gcfg.ablate
                         and gcfg.opt_stepNs[stage_idx] > 0
                         and gcfg.use_nerf_d[stage_idx] > 0)
            if do_volopt:
                for sc, (outs, _) in zip(scs, stage_outs):
                    sc["trainer"].stg = stage_idx
                    sc["trainer"].get_mvs_input(outs)
                if gcfg.opt_stepNs[stage_idx] > 1:
                    run_joint([sc["trainer"] for sc in scs],
                              gcfg.opt_stepNs[stage_idx])
                for sc, (outs, _) in zip(scs, stage_outs):
                    feedback_depths(sc, outs)

            for sc, (outs, new_extras) in zip(scs, stage_outs):
                accumulate_stage(sc, outs, new_extras, stage_idx)

        for scan, sc in zip(scans, scs):
            save_scene_outputs(sc)
            logger.info(f"scene {scan}: outputs saved to {sc['outdir']}")
            results[scan] = {"trainer": sc["trainer"],
                             "outdir": sc["outdir"]}
    return results
