"""View-sharded cascade dispatch (MVSEngine.stage_all_views) must match
the serial per-view stage loop exactly: the shard_map body runs the
very same single-view stage program on each device, so depth,
confidence, probability volumes and the per-model `extra` thread
(UCSNet variance, TransMVSNet view weights) agree with the serial
path across all 3 stages.
"""

import os

import numpy as np
import pytest

from s_volsdf_tpu.config import load_config
from s_volsdf_tpu.data.fixtures import make_dtu_fixture
from s_volsdf_tpu.data.mvs_dataset import MVSDataset
from s_volsdf_tpu.data.splits import get_trains_ids


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("view_shard"))
    make_dtu_fixture(os.path.join(root, "data"), scan_id=106,
                     img_res=(64, 96))
    return root


def _make_sc(cfg, root):
    trains_i = get_trains_ids(cfg.dataset.data_dir, "scan106",
                              cfg.num_view)
    dataset = MVSDataset(
        datapath=os.path.join(cfg.data_dir_root, cfg.dataset.data_dir,
                              "mvs_data"),
        scan="scan106", nviews=cfg.num_view,
        data_dir=cfg.dataset.data_dir, ndepths=cfg.mvs.numdepth,
        interval_scale=cfg.mvs.interval_scale,
        max_h=cfg.max_h, max_w=cfg.max_w, trains_i=trains_i,
        data_dir_root=cfg.data_dir_root, x2_mvsres=cfg.mvs.x2_mvsres)
    samples = [dataset[i] for i in range(len(dataset))]
    return {"cfg": cfg, "name": "scan106", "samples": samples,
            "trains_i": trains_i,
            "outs_samples": [None] * len(samples),
            "extras": [None] * len(samples)}


def test_view_mesh_gating():
    """shard_mvs_views overrides shard_eval for the cascade dispatch
    (None inherits shard_eval; render sharding stays independent)."""
    from s_volsdf_tpu.engine.runner import _view_mesh

    cfg = load_config("dtu")
    cfg.parallel.shard_eval = True
    cfg.parallel.shard_mvs_views = None
    assert _view_mesh(cfg, 3) is not None
    cfg.parallel.shard_mvs_views = False
    assert _view_mesh(cfg, 3) is None
    cfg.parallel.shard_eval = False
    cfg.parallel.shard_mvs_views = True
    assert _view_mesh(cfg, 3) is not None
    # Optional[bool] fields coerce through YAML rules.
    from s_volsdf_tpu.config import apply_override
    apply_override(cfg, "parallel.shard_mvs_views", "false")
    assert cfg.parallel.shard_mvs_views is False
    apply_override(cfg, "parallel.shard_mvs_views", "null")
    assert cfg.parallel.shard_mvs_views is None


@pytest.mark.slow
@pytest.mark.parametrize("model", ["casmvsnet", "ucsnet", "transmvsnet"])
def test_stage_all_views_matches_serial(fixture_root, model):
    from s_volsdf_tpu.engine.runner import MVSEngine, run_mvs_stage

    data_root = os.path.join(fixture_root, "data")
    cfg = load_config("dtu", overrides=[
        "data_dir_root=" + data_root,
        "dataset.data_dir_root=" + data_root,
        "max_h=64", "max_w=96", "dataset.img_res=[64,96]",
        "mvs.model_name=" + model,
        "mvs.ndepths=[16,8,8]", "mvs.numdepth=16",
        "mvs.x2_mvsres=false",
    ])
    engine = MVSEngine(cfg)

    def run_all(shard: bool):
        cfg.parallel.shard_eval = shard
        sc = _make_sc(cfg, fixture_root)
        results = []
        for stage in range(3):
            outs, extras = run_mvs_stage(cfg, engine, sc, stage)
            sc["outs_samples"] = outs
            sc["extras"] = extras
            results.append((outs, extras))
        return results

    serial = run_all(False)
    sharded = run_all(True)

    for stage, ((s_outs, s_ex), (p_outs, p_ex)) in enumerate(
            zip(serial, sharded)):
        for i, (so, po) in enumerate(zip(s_outs, p_outs)):
            for k in ("depth", "photometric_confidence", "prob_volume"):
                if k not in so:
                    continue
                np.testing.assert_allclose(
                    np.asarray(po[k]), np.asarray(so[k]), atol=1e-5,
                    err_msg=f"{model} stage{stage} view{i} {k}")
            import jax
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-5,
                    err_msg=f"{model} stage{stage} view{i} extra"),
                p_ex[i], s_ex[i])


def test_cascade_hlo_zero_collectives(fixture_root):
    """The view-sharded cascade stage program (stage_all_views) is
    embarrassingly parallel: its compiled HLO must contain ZERO
    collective ops (docs/SCALING.md 'view' row; companion to
    test_parallel.py::test_hlo_collective_contract_train_render_scene).
    Captures the cached jit + its real args via a recording dict."""
    from s_volsdf_tpu.engine.runner import MVSEngine, run_mvs_stage
    from tests.test_parallel import _collective_counts

    data_root = os.path.join(fixture_root, "data")
    cfg = load_config("dtu", overrides=[
        "data_dir_root=" + data_root,
        "dataset.data_dir_root=" + data_root,
        "max_h=64", "max_w=96", "dataset.img_res=[64,96]",
        "mvs.model_name=casmvsnet",
        "mvs.ndepths=[16,8,8]", "mvs.numdepth=16",
        "mvs.x2_mvsres=false",
        "parallel.shard_eval=true",
    ])
    engine = MVSEngine(cfg)
    captured = {}

    class Recording(dict):
        def __getitem__(self, key):
            fn = super().__getitem__(key)
            if isinstance(key, tuple) and key and key[0] == "all_views":
                def wrapper(*args, fn=fn, key=key):
                    captured[key] = (fn, args)
                    return fn(*args)
                return wrapper
            return fn

    engine._stage_jit = Recording(engine._stage_jit)
    sc = _make_sc(cfg, fixture_root)
    run_mvs_stage(cfg, engine, sc, 0)
    assert captured, "stage_all_views dispatch was not exercised"
    (fn, args), = captured.values()
    hlo = fn.lower(*args).compile().as_text()
    counts = _collective_counts(hlo)
    assert sum(counts.values()) == 0, counts
