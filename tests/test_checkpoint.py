"""Checkpoint completeness: "latest" + per-epoch snapshots, and
resume-from-epoch (reference keeps latest.pth + per-epoch .pth,
vsdf.py:178-194; resume restores model/optimizer/epoch/iter_step,
vsdf.py:104-111)."""

import os

import jax
import numpy as np
import pytest

from s_volsdf_tpu.config import load_config
from s_volsdf_tpu.data.fixtures import make_dtu_fixture
from s_volsdf_tpu.data.scene_dataset import load_scene
from s_volsdf_tpu.engine.trainer import VolTrainer


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ckpt"))
    data_root = os.path.join(root, "data")
    make_dtu_fixture(data_root, scan_id=106, img_res=(24, 32))
    cfg = load_config("dtu", overrides=[
        "data_dir_root=" + data_root,
        "dataset.data_dir_root=" + data_root,
        "dataset.img_res=[24,32]",
        "train.num_pixels=64",
        "train.checkpoint_freq=5",   # snapshot every 15 steps (3 views)
        "train.render_freq=-1",
        "model.implicit.dims=[32,32]",
        "model.implicit.skip_in=[]",
        "model.rendering.dims=[32]",
        "model.feature_vector_size=32",
        "model.sampler.N_samples=8",
        "model.sampler.N_samples_eval=16",
        "model.sampler.N_samples_extra=4",
        "loss.mvs_weight=0", "loss.sparse_weight=0", "loss.anneal_rgb=0",
        "parallel.shard_rays=false",
    ])
    scene = load_scene(cfg.dataset.data_dir, (24, 32), 106,
                       cfg.num_view, data_root)
    tr = VolTrainer(cfg, scene, "scan106",
                    exps_root=os.path.join(root, "exps"), chunk_steps=15)
    tr.run(45, log_every=1000)
    return cfg, scene, root, tr


def test_epoch_snapshots_exist(trained):
    cfg, scene, root, tr = trained
    labels = sorted(os.listdir(tr.checkpoints_path))
    assert "latest" in labels
    epoch_snaps = [l for l in labels if l.startswith("epoch_")]
    # 45 steps / 3 views = 15 epochs; snapshots every 5 epochs.
    assert len(epoch_snaps) >= 3, labels


def test_resume_latest_restores_state(trained):
    cfg, scene, root, tr = trained
    tr3 = VolTrainer(cfg, scene, "scan106",
                     exps_root=os.path.join(root, "exps"),
                     is_continue=True)
    # is_continue loads "latest" in __init__ (newest timestamp dir).
    assert int(tr3.state.iter_step) == 45


def test_resume_rng_bit_continuity(trained):
    """A kill+resume at a chunk boundary reproduces the uninterrupted
    run bit-for-bit: the chunk-RNG key rides in the checkpoint meta
    (the reference does not checkpoint RNG; vsdf.py:104-111 restores
    only model/optimizer/epoch)."""
    cfg, scene, root, tr = trained

    # Uninterrupted: continue the module's trainer 30 more steps.
    rng_before = np.asarray(tr.rng).copy()
    tr.save_checkpoint("ckpt_test")
    tr.run(30, log_every=1000)
    params_uninterrupted = jax.tree.map(np.asarray, tr.state.params)

    # Killed+resumed: fresh trainer restoring state AND rng from the
    # checkpoint, then the same 30 steps.
    # Same chunk_steps as the original: the chunk key is split once
    # per chunk, so bit-continuity requires resuming with the same
    # chunk partitioning (production runs use a fixed chunk size).
    tr2 = VolTrainer(cfg, scene, "scan106",
                     exps_root=os.path.join(root, "exps"),
                     is_continue=True, chunk_steps=15)
    tr2.load_checkpoint("ckpt_test")
    # __init__ applies _resume_rng only for the checkpoint it loaded at
    # construction ("latest"); an explicit post-init load stashes it.
    tr2.rng = tr2._resume_rng
    np.testing.assert_array_equal(np.asarray(tr2.rng), rng_before)
    tr2.run(30, log_every=1000)
    for a, b in zip(jax.tree.leaves(params_uninterrupted),
                    jax.tree.leaves(tr2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_from_epoch_snapshot(trained):
    cfg, scene, root, tr = trained
    final_params = jax.tree.map(np.asarray, tr.state.params)

    tr2 = VolTrainer(cfg, scene, "scan106",
                     exps_root=os.path.join(root, "exps"),
                     is_continue=True)
    tr2.load_checkpoint("epoch_5")
    assert int(tr2.state.iter_step) == 15
    # Snapshot differs from the final state (training continued past it).
    diff = any(
        not np.allclose(np.asarray(a), b)
        for a, b in zip(jax.tree.leaves(tr2.state.params),
                        jax.tree.leaves(final_params)))
    assert diff
    # And resuming from it trains onward.
    tr2.run(6, log_every=1000)
    assert int(tr2.state.iter_step) == 21


def test_orbax_backend_roundtrip_and_cross_restore(trained, tmp_path):
    """The orbax backend (SURVEY.md section 7 step 7; atomic commits,
    named leaves) stores the SAME TrainState and restores it
    bit-for-bit through either load path: backend auto-detection must
    let a run switch train.ckpt_backend between restarts."""
    from s_volsdf_tpu.utils import checkpoint as ckpt

    cfg, scene, root, tr = trained
    state = tr.state

    p_orbax = str(tmp_path / "orbax_ck")
    ckpt.save_state(p_orbax, state, backend="orbax", epoch=7,
                    rng=[1, 2])
    restored, meta = ckpt.load_state(p_orbax, state)   # auto-detect
    assert meta == {"epoch": 7, "rng": [1, 2]}
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # npz written next to it restores identically (same contract).
    p_npz = str(tmp_path / "npz_ck")
    ckpt.save_state(p_npz, state, backend="npz", epoch=7, rng=[1, 2])
    r2, _ = ckpt.load_state(p_npz, state)
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(r2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Overwrite in place (the "latest" pattern) must not fail or
    # corrupt: orbax stages + atomically renames.
    ckpt.save_state(p_orbax, state, backend="orbax", epoch=8)
    _, meta2 = ckpt.load_state(p_orbax, state)
    assert meta2["epoch"] == 8

    with pytest.raises(ValueError, match="unknown ckpt backend"):
        ckpt.save_state(str(tmp_path / "x"), state, backend="hdf5")


def test_orbax_backend_resume_through_trainer(trained, tmp_path):
    """train.ckpt_backend='orbax' end-to-end: the trainer saves via
    orbax and a fresh trainer resumes from it (load auto-detects)."""
    import dataclasses

    cfg, scene, root, tr = trained
    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ckpt_backend="orbax"))
    tr2 = VolTrainer(cfg2, scene, "scan106",
                     exps_root=str(tmp_path / "exps"), chunk_steps=15)
    tr2.run(15, log_every=1000)
    assert os.path.isdir(os.path.join(tr2.checkpoints_path, "latest",
                                      "orbax"))
    tr3 = VolTrainer(cfg2, scene, "scan106",
                     exps_root=str(tmp_path / "exps"), is_continue=True)
    assert int(tr3.state.iter_step) == 15
    for a, b in zip(jax.tree.leaves(tr2.state.params),
                    jax.tree.leaves(tr3.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
