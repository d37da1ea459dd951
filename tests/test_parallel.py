"""Tests for the parallel package on the 8-device virtual CPU mesh
(conftest forces jax_num_cpu_devices=8).

Covers: sharded-step == manually-pmean'd single-device grads on the
same global batch; the production scan-fused sharded chunk across
chunk boundaries; scene-axis sharding matching solo trajectories; the
NaN guard under shard_map; and VolTrainer loop selection.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s_volsdf_tpu.config import load_config
from s_volsdf_tpu.data.synthetic import make_sphere_scene, sample_rays
from s_volsdf_tpu.engine.train_step import (_loss_fn, guarded_update,
                                            init_train_state, make_optimizer,
                                            TrainState)
from s_volsdf_tpu.engine.trainer import make_scan_train_fn
from s_volsdf_tpu.models.network import init_volsdf_params
from s_volsdf_tpu.parallel.mesh import make_mesh
from s_volsdf_tpu.parallel.train_parallel import (
    make_sharded_multiscene_train_fn, make_sharded_scan_train_fn,
    make_sharded_train_step)


def tiny_cfg(**extra):
    overrides = [
        "train.num_pixels=64",
        "model.implicit.dims=[32,32]",
        "model.implicit.skip_in=[]",
        "model.rendering.dims=[32]",
        "model.feature_vector_size=32",
        "model.sampler.N_samples=8",
        "model.sampler.N_samples_eval=16",
        "model.sampler.N_samples_extra=4",
        "loss.mvs_weight=0", "loss.sparse_weight=0", "loss.anneal_rgb=0",
        # These tests assert sharded == solo trajectories; pin the
        # training dots to f32 so rounding is identical across the
        # differently-fused sharded/solo programs.
        "train.train_compute_dtype=float32",
    ] + [f"{k}={v}" for k, v in extra.items()]
    return load_config("dtu", overrides=overrides)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    scene = make_sphere_scene(3, (24, 32))
    params = init_volsdf_params(jax.random.PRNGKey(0), cfg.model)
    tx = make_optimizer(cfg)
    scene_dev = {
        "rgb": jnp.asarray(scene.images.reshape(3, -1, 3)),
        "rgb_smooth": jnp.asarray(scene.images.reshape(3, -1, 3)),
        "poses": jnp.asarray(scene.poses),
        "intrinsics": jnp.asarray(scene.intrinsics),
    }
    return cfg, scene, params, tx, scene_dev


def global_batch(scene, cfg, view=0, seed=0):
    rng_np = np.random.default_rng(seed)
    uv, rgb = sample_rays(scene, rng_np, view, cfg.train.num_pixels)
    return {
        "uv": jnp.asarray(uv)[None], "rgb": jnp.asarray(rgb)[None],
        "rgb_smooth": jnp.asarray(rgb)[None],
        "pose": jnp.asarray(scene.poses[view])[None],
        "intrinsics": jnp.asarray(scene.intrinsics[view])[None],
        "view_onehot": jnp.zeros((3,)).at[view].set(1.0),
    }


@pytest.mark.slow
def test_sharded_step_matches_manual_pmean(setup):
    """The sharded step's update == averaging the per-shard grads (each
    computed with the documented per-chip folded rng) on one device."""
    cfg, scene, params, tx, _ = setup
    mesh = make_mesh((-1,), ("rays",))
    n_chips = mesh.shape["rays"]
    batch = global_batch(scene, cfg)
    rng = jax.random.PRNGKey(7)

    step_fn = make_sharded_train_step(cfg, tx, mesh, use_mvs=False)
    state = init_train_state(cfg, params, tx)
    new_state, loss_out = step_fn(state, batch, rng, None)

    # Manual reference: same shards, same folded rngs, mean of grads.
    n_local = cfg.train.num_pixels // n_chips
    grads_sum, losses = None, []
    for i in range(n_chips):
        sl = slice(i * n_local, (i + 1) * n_local)
        shard = dict(batch)
        for k in ("uv", "rgb", "rgb_smooth"):
            shard[k] = batch[k][:, sl]
        g, lo = jax.grad(_loss_fn, has_aux=True)(
            params, cfg, shard, jax.random.fold_in(rng, i), None,
            jnp.asarray(0, jnp.int32))
        losses.append(float(lo.loss))
        grads_sum = g if grads_sum is None else jax.tree.map(
            jnp.add, grads_sum, g)
    grads_mean = jax.tree.map(lambda x: x / n_chips, grads_sum)

    assert np.isclose(float(loss_out.loss), np.mean(losses), rtol=1e-5)
    ref_state, _ = guarded_update(
        tx, init_train_state(cfg, params, tx), grads_mean, loss_out)
    for a, b in zip(jax.tree.leaves(new_state.params),
                    jax.tree.leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_sharded_scan_chunks_converge(setup):
    """Production multi-chip loop: loss finite and decreasing across
    >= 2 chunk boundaries; params actually update."""
    cfg, scene, params, tx, scene_dev = setup
    mesh = make_mesh((-1,), ("rays",))
    run = make_sharded_scan_train_fn(cfg, tx, mesh, use_mvs=False,
                                     n_views=3, img_res=scene.img_res)
    state = init_train_state(cfg, params, tx)
    p0 = jax.tree.map(np.asarray, params)

    all_losses = []
    key = jax.random.PRNGKey(3)
    for chunk in range(3):
        key, sub = jax.random.split(key)
        state, losses = run(state, jax.random.split(sub, 20),
                            scene_dev, None)
        all_losses.append(np.asarray(losses.loss))
    losses = np.concatenate(all_losses)
    assert np.all(np.isfinite(losses))
    assert losses[-5:].mean() < losses[:5].mean()
    assert int(state.iter_step) == 60
    moved = any(
        not np.allclose(np.asarray(a), b)
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(p0)))
    assert moved


def test_sharded_scan_rejects_indivisible_rays(setup):
    cfg, scene, params, tx, scene_dev = setup
    bad = tiny_cfg(**{"train.num_pixels": 60})
    mesh = make_mesh((-1,), ("rays",))
    with pytest.raises(ValueError, match="not divisible"):
        make_sharded_scan_train_fn(bad, tx, mesh, use_mvs=False,
                                   n_views=3, img_res=scene.img_res)


def test_multiscene_sharded_matches_solo(setup):
    """Scenes sharded over the mesh: each scene's trajectory matches a
    solo single-device run with the same rng stream."""
    cfg, scene, params, tx, scene_dev = setup
    mesh = make_mesh((-1,), ("scene",))
    S = mesh.shape["scene"]
    T = 10

    run_ms = make_sharded_multiscene_train_fn(
        cfg, tx, mesh, use_mvs=False, n_views=3, img_res=scene.img_res)

    def fresh_state():
        p = init_volsdf_params(jax.random.PRNGKey(0), cfg.model)
        return init_train_state(cfg, p, tx)

    states = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[fresh_state() for _ in range(S)])
    scenes = jax.tree.map(lambda x: jnp.stack([x] * S), scene_dev)
    rngs = jnp.stack([jax.random.split(jax.random.PRNGKey(100 + s), T)
                      for s in range(S)])
    states, losses_ms = run_ms(states, rngs, scenes, None)
    losses_ms = np.asarray(losses_ms.loss)   # (S, T)

    run_1 = make_scan_train_fn(cfg, tx, use_mvs=False, n_views=3,
                               img_res=scene.img_res)
    for s in (0, S - 1):
        st = fresh_state()
        st, losses_1 = run_1(st, jax.random.split(
            jax.random.PRNGKey(100 + s), T), scene_dev, None)
        np.testing.assert_allclose(losses_ms[s], np.asarray(losses_1.loss),
                                   rtol=1e-4, atol=1e-6)


def test_scene_ray_2d_matches_1d_ray_sharded(setup):
    """2D (scene x rays) mesh: each scene's trajectory matches the 1D
    ray-sharded production loop on a same-width 'rays' mesh with the
    same rng stream (same per-chip folded rngs, same pmean width)."""
    from s_volsdf_tpu.parallel.train_parallel import (
        make_sharded_scene_ray_train_fn)

    cfg, scene, params, tx, scene_dev = setup
    S, R, T = 2, 4, 10
    mesh2d = make_mesh((S, R), ("scene", "rays"))
    run_2d = make_sharded_scene_ray_train_fn(
        cfg, tx, mesh2d, use_mvs=False, n_views=3, img_res=scene.img_res)

    def fresh_state():
        p = init_volsdf_params(jax.random.PRNGKey(0), cfg.model)
        return init_train_state(cfg, p, tx)

    states = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[fresh_state() for _ in range(S)])
    scenes = jax.tree.map(lambda x: jnp.stack([x] * S), scene_dev)
    rngs = jnp.stack([jax.random.split(jax.random.PRNGKey(100 + s), T)
                      for s in range(S)])
    states, losses_2d = run_2d(states, rngs, scenes, None)
    losses_2d = np.asarray(losses_2d.loss)   # (S, T)
    assert np.all(np.isfinite(losses_2d))

    mesh1d = make_mesh((R,), ("rays",), devices=jax.devices()[:R])
    run_1d = make_sharded_scan_train_fn(
        cfg, tx, mesh1d, use_mvs=False, n_views=3, img_res=scene.img_res)
    for s in range(S):
        st = fresh_state()
        st, losses_1 = run_1d(st, jax.random.split(
            jax.random.PRNGKey(100 + s), T), scene_dev, None)
        np.testing.assert_allclose(losses_2d[s], np.asarray(losses_1.loss),
                                   rtol=1e-4, atol=1e-6)
        for a, b in zip(jax.tree.leaves(
                jax.tree.map(lambda x: x[s], states.params)),
                jax.tree.leaves(st.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-6)


def test_scene_ray_2d_rejects_indivisible_rays(setup):
    from s_volsdf_tpu.parallel.train_parallel import (
        make_sharded_scene_ray_train_fn)
    cfg, scene, params, tx, _ = setup
    bad = tiny_cfg(**{"train.num_pixels": 62})
    mesh = make_mesh((2, 4), ("scene", "rays"))
    with pytest.raises(ValueError, match="not divisible"):
        make_sharded_scene_ray_train_fn(bad, tx, mesh, use_mvs=False,
                                        n_views=3, img_res=scene.img_res)


def test_pick_loop_widens_small_scene_counts(setup):
    """_pick_loop topology table on 8 devices: S=8 scene-sharded,
    S=2 -> 2D (2 scenes x 4 ray-chips), S=3 -> 2D over 6 chips,
    S=5 -> scene-sharded over 5 chips; every branch steps finitely."""
    from s_volsdf_tpu.engine.multiscene import _pick_loop

    cfg, scene, params, tx, scene_dev = setup
    T = 3

    def step_S(S):
        run = _pick_loop(cfg, S, use_mvs=False, n_views=3,
                         img_res=scene.img_res)
        st = init_train_state(cfg, params, tx)
        states = jax.tree.map(lambda *xs: jnp.stack(xs), *[st] * S)
        scenes = jax.tree.map(lambda x: jnp.stack([x] * S), scene_dev)
        rngs = jnp.stack([jax.random.split(jax.random.PRNGKey(s), T)
                          for s in range(S)])
        states, losses = run(states, rngs, scenes, None)
        losses = np.asarray(losses.loss)
        assert losses.shape == (S, T) and np.all(np.isfinite(losses))
        return run

    assert len(jax.devices()) == 8
    # 64 rays: S=2 -> 4 ray-chips; S=3 -> 2 ray-chips (6/8 devices).
    for S in (2, 3, 5, 8):
        step_S(S)
    # S=2 and S=3 took the 2D path (one_step attribute is only set by
    # the scene-ray and scan builders).
    assert hasattr(_pick_loop(cfg, 2, use_mvs=False, n_views=3,
                              img_res=scene.img_res), "one_step")
    assert hasattr(_pick_loop(cfg, 3, use_mvs=False, n_views=3,
                              img_res=scene.img_res), "one_step")
    assert not hasattr(_pick_loop(cfg, 5, use_mvs=False, n_views=3,
                                  img_res=scene.img_res), "one_step")
    assert not hasattr(_pick_loop(cfg, 8, use_mvs=False, n_views=3,
                                  img_res=scene.img_res), "one_step")
    # shard_rays=false pins every scene's rays to one chip: the 2D
    # widening must NOT trigger (per-chip rng folds would change the
    # trajectory vs serial — engine/multiscene.py:_pick_loop).
    import dataclasses
    cfg_ns = dataclasses.replace(cfg)
    cfg_ns.parallel = dataclasses.replace(cfg.parallel, shard_rays=False)
    assert not hasattr(_pick_loop(cfg_ns, 2, use_mvs=False, n_views=3,
                                  img_res=scene.img_res), "one_step")


def test_sharded_nan_guard(setup):
    """A poisoned batch must leave params bit-identical under shard_map."""
    cfg, scene, params, tx, _ = setup
    mesh = make_mesh((-1,), ("rays",))
    step_fn = make_sharded_train_step(cfg, tx, mesh, use_mvs=False)
    state = init_train_state(cfg, params, tx)
    batch = global_batch(scene, cfg)
    batch["rgb"] = batch["rgb"] * jnp.nan
    new_state, loss_out = step_fn(state, batch, jax.random.PRNGKey(0), None)
    assert not np.isfinite(float(loss_out.loss))
    for a, b in zip(jax.tree.leaves(new_state.params),
                    jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_voltrainer_selects_sharded_loop(tmp_path):
    """ParallelConfig drives loop selection: with 8 devices and
    divisible num_pixels VolTrainer trains ray-sharded with no code
    edits; parallel.shard_rays=false restores the single-device scan."""
    from s_volsdf_tpu.data.fixtures import make_dtu_fixture
    from s_volsdf_tpu.data.scene_dataset import load_scene
    from s_volsdf_tpu.engine.trainer import VolTrainer

    root = str(tmp_path / "data")
    make_dtu_fixture(root, scan_id=106, img_res=(24, 32))
    common = {
        "data_dir_root": root, "dataset.data_dir_root": root,
        "dataset.img_res": "[24,32]", "train.render_freq": -1,
    }
    cfg = tiny_cfg(**common)
    scene = load_scene(cfg.dataset.data_dir, (24, 32), 106,
                       cfg.num_view, root)

    tr = VolTrainer(cfg, scene, "scan106", exps_root=str(tmp_path / "e1"))
    # Loop selection: 8 devices, 64 rays divisible -> sharded chunk.
    assert tr.cfg.parallel.shard_rays and len(jax.devices()) == 8
    tr.run(40, log_every=1000)
    assert int(tr.state.iter_step) == 40

    cfg2 = tiny_cfg(**common, **{"parallel.shard_rays": "false"})
    tr2 = VolTrainer(cfg2, scene, "scan106",
                     exps_root=str(tmp_path / "e2"))
    loop2 = tr2._build_loop(use_mvs=False)
    # Single-device body: runs directly outside shard_map (no axis).
    st, lo = loop2.one_step(
        {"rgb": jnp.asarray(scene.rgb[tr2.trains_i]),
         "rgb_smooth": jnp.asarray(scene.rgb_smooth[tr2.trains_i]),
         "poses": jnp.asarray(scene.poses[tr2.trains_i]),
         "intrinsics": jnp.asarray(scene.intrinsics[tr2.trains_i])},
        None, tr2.state, jax.random.PRNGKey(0))
    assert np.isfinite(float(lo.loss))


def test_partition_scenes_multihost():
    """Round-robin host partition: disjoint, load-balanced, union-exact
    (DCN scene parallelism replacing the reference's mp.Pool)."""
    from s_volsdf_tpu.parallel.multihost import partition_scenes

    scans = [f"scan{i}" for i in range(11)]
    parts = [partition_scenes(scans, process_index=p, process_count=4)
             for p in range(4)]
    assert sorted(sum(parts, [])) == sorted(scans)
    assert max(len(p) for p in parts) - min(len(p) for p in parts) <= 1
    seen = set()
    for p in parts:
        assert not (seen & set(p))
        seen |= set(p)
    # Single-process identity (this test env).
    assert partition_scenes(scans) == scans


def test_pcd_filter_host_pool(tmp_path):
    """pcd_filter fans scenes over cfg.num_worker processes (the
    reference's mp.Pool role) and still produces identical PLYs."""
    import os
    from s_volsdf_tpu.parallel.multihost import map_scenes_host_pool

    # Pure function of the task — compare pooled vs serial results.
    tasks = list(range(7))
    pooled = map_scenes_host_pool(_square_task, tasks, num_workers=3)
    serial = map_scenes_host_pool(_square_task, tasks, num_workers=1)
    assert pooled == serial == [t * t for t in tasks]


def _square_task(t):
    return t * t


def test_sharded_render_matches_single_device(setup):
    """Mesh-sharded full-image rendering (render.py:_shard_inputs) is
    pure ray data parallelism: same maps as the single-device render,
    and the compiled chunk actually executes distributed."""
    from s_volsdf_tpu.engine.render import (_depth_chunk, render_depth,
                                            render_image)
    from s_volsdf_tpu.parallel.mesh import ray_sharding, replicated

    cfg, scene, params, tx, scene_dev = setup
    mesh = make_mesh((-1,), ("rays",))
    assert mesh.shape["rays"] == 8
    pose, intr = scene.poses[0], scene.intrinsics[0]
    res = scene.img_res

    solo = render_image(params, cfg.model, pose, intr, res,
                        chunk=64, fast=1)
    shard = render_image(params, cfg.model, pose, intr, res,
                         chunk=64, fast=1, mesh=mesh)
    for k in solo:
        np.testing.assert_allclose(shard[k], solo[k], atol=1e-5,
                                   err_msg=k)

    solo_d = render_depth(params, cfg.model, pose, intr, res,
                          chunk=64, fast=1)
    shard_d = render_depth(params, cfg.model, pose, intr, res,
                           chunk=64, fast=1, mesh=mesh)
    np.testing.assert_allclose(shard_d["depth"], solo_d["depth"],
                               atol=1e-5)

    # the compiled chunk really is partitioned: its output lives on
    # all 8 devices, split along the ray axis
    uv = np.zeros((1, 64, 2), np.float32)
    out = _depth_chunk(
        jax.device_put(params, replicated(mesh)),
        jax.device_put(uv, ray_sharding(mesh)),
        jax.device_put(np.asarray(pose)[None], replicated(mesh)),
        jax.device_put(np.asarray(intr)[None], replicated(mesh)),
        jax.random.PRNGKey(0), cfg=cfg.model, fast=1)
    assert len(out["depth_values"].sharding.device_set) == 8


def test_eval_mesh_helper():
    """eval_mesh: on when shard_eval and the chunk divides; falls back
    to None (single-device render) otherwise."""
    from s_volsdf_tpu.parallel.mesh import eval_mesh

    cfg = tiny_cfg()
    assert eval_mesh(cfg.parallel, 16384) is not None
    assert eval_mesh(cfg.parallel, 13) is None  # 13 % 8 != 0
    # Always a FLAT mesh over every device: a 2D ('scene','rays')
    # TRAINING mesh must not leave eval renders sharded over only its
    # first axis (the other axis' chips would redundantly recompute).
    cfg.parallel.mesh_shape = (2, 4)
    cfg.parallel.mesh_axes = ("scene", "rays")
    m = eval_mesh(cfg.parallel, 16384)
    assert m is not None and m.devices.size == 8 and len(m.shape) == 1
    # ... but a mesh_shape deliberately sized BELOW the device count
    # also bounds eval: no renders on devices the config excluded.
    cfg.parallel.mesh_shape = (4,)
    cfg.parallel.mesh_axes = ("rays",)
    m = eval_mesh(cfg.parallel, 16384)
    assert m is not None and m.devices.size == 4 and len(m.shape) == 1
    cfg.parallel.mesh_shape = (-1,)
    cfg.parallel.shard_eval = False
    assert eval_mesh(cfg.parallel, 16384) is None


def test_single_device_loop_accepts_view_mesh_volumes(setup):
    """Cascade outputs committed to a view mesh (stage_all_views) must
    not crash the single-device trainer fallback (shard_rays=False on
    a multi-device host): make_scan_train_fn normalizes the packed
    volumes onto its own device."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from s_volsdf_tpu.ops.cost_mapping import MVSVolumes

    cfg, scene, params, tx, scene_dev = setup
    state = init_train_state(cfg, params, tx)
    view_mesh = make_mesh((3,), ("view",), devices=jax.devices()[:3])
    rep = NamedSharding(view_mesh, P())

    D, Hc, Wc = 8, 12, 16
    prob = jax.random.uniform(jax.random.PRNGKey(0), (3, D, Hc, Wc))
    mvs = MVSVolumes(
        prob=jax.device_put(prob / prob.sum(1, keepdims=True), rep),
        z_slab=jax.device_put(
            jnp.stack([jnp.full((3, Hc, Wc), 0.5),
                       jnp.full((3, Hc, Wc), 5.0)], axis=1), rep),
        intrinsics=jnp.asarray(scene.intrinsics),
        c2w=jnp.asarray(scene.poses),
        img_res=scene.img_res, inverse_depth=False)

    cfg2 = tiny_cfg(**{"loss.mvs_weight": 1})
    run_chunk = make_scan_train_fn(cfg2, tx, use_mvs=True, n_views=3,
                                   img_res=scene.img_res)
    st, losses = run_chunk(state, jax.random.split(jax.random.PRNGKey(1), 2),
                           scene_dev, mvs)
    assert np.all(np.isfinite(np.asarray(losses.loss)))


# --------------------------------------------------------------------------
# Collective-traffic contract in compiled HLO (docs/SCALING.md table):
# ONE all-reduce per training step, ZERO collectives everywhere else.
# A GSPMD or refactor regression that silently adds cross-chip traffic
# fails here, not in a pod-scale profile.
# --------------------------------------------------------------------------

def _collective_counts(hlo_text):
    """Count collective INSTRUCTIONS in optimized HLO text (excludes
    computation names / -done halves of async pairs)."""
    import re
    from collections import Counter
    names = re.findall(
        r"= \S+ (all-reduce|all-gather|reduce-scatter"
        r"|collective-permute|all-to-all)(?:-start)?[\w.]*\(",
        hlo_text)
    return Counter(names)


def _first_all_reduce_group_size(hlo_text):
    """Group width of the first all-reduce: how many chips exchange."""
    import re
    m = re.search(r"all-reduce[\w.-]*\([^\n]*replica_groups="
                  r"(\{\{[^}]*\}|\[\d+,\d+\]<=\[\d+\])", hlo_text)
    assert m, "no all-reduce with replica_groups found"
    g = m.group(1)
    if g.startswith("{{"):
        return len(g[2:].split(","))
    return int(g[1:-1].split("]<=[")[0].split(",")[1])


def test_hlo_collective_contract_train_render_scene(setup):
    """Compile the sharded programs on the 8-device mesh and assert the
    all-reduce count in HLO: production train chunk (rays mesh,
    LIVE-MVS configuration) = 1; render = 0; multiscene (scene axis)
    = 0; 2D scene x rays = 1 riding the rays submesh only."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from s_volsdf_tpu.engine.train_step import pack_for_chunk
    from s_volsdf_tpu.ops.cost_mapping import MVSVolumes
    from s_volsdf_tpu.parallel.train_parallel import (
        make_sharded_scene_ray_train_fn)

    cfg, scene, params, tx, scene_dev = setup
    cfg_mvs = tiny_cfg(**{"loss.mvs_weight": 1})
    T = 3

    # --- production 1D ray-sharded train chunk, gate-live MVS ---
    mesh = make_mesh((-1,), ("rays",))
    D, Hc, Wc = 8, 6, 8
    prob = jax.random.uniform(jax.random.PRNGKey(0), (3, D, Hc, Wc))
    mvs = MVSVolumes(
        prob=prob / prob.sum(1, keepdims=True),
        z_slab=jnp.stack([jnp.full((3, Hc, Wc), 0.5),
                          jnp.full((3, Hc, Wc), 5.0)], axis=1),
        intrinsics=jnp.asarray(scene.intrinsics),
        c2w=jnp.asarray(scene.poses),
        img_res=scene.img_res, inverse_depth=False)
    packed = jax.device_put(pack_for_chunk(cfg_mvs, mvs),
                            NamedSharding(mesh, P()))
    run = make_sharded_scan_train_fn(cfg_mvs, tx, mesh, use_mvs=True,
                                     n_views=3, img_res=scene.img_res)
    state = init_train_state(cfg_mvs, params, tx)
    rngs = jax.random.split(jax.random.PRNGKey(1), T)
    hlo = run.jitted.lower(state, rngs, scene_dev, packed) \
        .compile().as_text()
    counts = _collective_counts(hlo)
    assert counts["all-reduce"] == 1, counts
    assert sum(counts.values()) == 1, counts
    assert _first_all_reduce_group_size(hlo) == 8

    # --- mesh-sharded eval render: ZERO collectives ---
    from s_volsdf_tpu.engine.render import _depth_chunk, _render_chunk
    from s_volsdf_tpu.parallel.mesh import ray_sharding, replicated

    uv = jax.device_put(np.zeros((1, 64, 2), np.float32),
                        ray_sharding(mesh))
    pose_b = jax.device_put(np.asarray(scene.poses[0])[None],
                            replicated(mesh))
    intr_b = jax.device_put(np.asarray(scene.intrinsics[0])[None],
                            replicated(mesh))
    params_r = jax.device_put(params, replicated(mesh))
    for chunk_fn in (_depth_chunk, _render_chunk):
        hlo = chunk_fn.lower(params_r, uv, pose_b, intr_b,
                             jax.random.PRNGKey(0), cfg=cfg.model,
                             fast=1).compile().as_text()
        counts = _collective_counts(hlo)
        assert sum(counts.values()) == 0, (chunk_fn, counts)

    # --- scene-sharded multiscene loop: ZERO collectives ---
    mesh_s = make_mesh((-1,), ("scene",))
    S = mesh_s.shape["scene"]
    run_ms = make_sharded_multiscene_train_fn(
        cfg, tx, mesh_s, use_mvs=False, n_views=3, img_res=scene.img_res)
    states = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[init_train_state(cfg, params, tx) for _ in range(S)])
    scenes = jax.tree.map(lambda x: jnp.stack([x] * S), scene_dev)
    rngs_s = jnp.stack([jax.random.split(jax.random.PRNGKey(s), T)
                        for s in range(S)])
    states_p = jax.device_put(states, NamedSharding(mesh_s, P("scene")))
    hlo = run_ms.jitted.lower(states_p, rngs_s, scenes, None) \
        .compile().as_text()
    counts = _collective_counts(hlo)
    assert sum(counts.values()) == 0, counts

    # --- 2D scene x rays loop: ONE all-reduce on the rays submesh ---
    S2, R2 = 2, 4
    mesh_2d = make_mesh((S2, R2), ("scene", "rays"))
    run_2d = make_sharded_scene_ray_train_fn(
        cfg, tx, mesh_2d, use_mvs=False, n_views=3,
        img_res=scene.img_res)
    states2 = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[init_train_state(cfg, params, tx) for _ in range(S2)])
    scenes2 = jax.tree.map(lambda x: jnp.stack([x] * S2), scene_dev)
    rngs2 = jnp.stack([jax.random.split(jax.random.PRNGKey(s), T)
                       for s in range(S2)])
    states2_p = jax.device_put(states2,
                               NamedSharding(mesh_2d, P("scene")))
    hlo = run_2d.jitted.lower(states2_p, rngs2, scenes2, None) \
        .compile().as_text()
    counts = _collective_counts(hlo)
    assert counts["all-reduce"] == 1, counts
    assert sum(counts.values()) == 1, counts
    # the gradient mean exchanges within each scene's ray slice ONLY:
    # group width = R2, not the full 8-chip mesh
    assert _first_all_reduce_group_size(hlo) == R2
