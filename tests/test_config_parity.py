"""Config-surface parity audit against the reference.

Flattens every key in the reference's hydra tree
(/root/reference/config/base.yaml, ours.yaml, vol/{dtu,bmvs}.yaml) and
its pyhocon eval confs (config/confs/{dtu,bmvs}.conf) and asserts:

  1. every reference key either maps to a dotted path in our Config or
     appears in an explicit exclusion table with a reason;
  2. every mapped leaf's reference default VALUE equals our preset's
     value (dtu preset vs vol/dtu.yaml+ours.yaml, bmvs preset vs
     vol/bmvs.yaml+ours.yaml);
  3. every leaf of OUR Config is either a mapping target or a
     documented TPU-native extra — so config drift in either
     direction fails this test.

The .conf files duplicate the vol yamls for eval_vsdf.py's pyhocon
loader; we check their key sets agree with the yamls modulo a known
difference set rather than re-auditing their values.
"""

import dataclasses
import os
import re

import pytest
import yaml

from s_volsdf_tpu.config import Config, bmvs_config, dtu_config

REF = "/root/reference/config"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not available")


# --------------------------------------------------------------------------
# reference key -> our dotted path (None = excluded, reason in comment map)
# --------------------------------------------------------------------------

# base.yaml (pipeline-level args namespace)
BASE_MAP = {
    "defaults": None,        # hydra composition machinery
    "hydra": None,           # hydra output/logging machinery
    "gpu": None,             # CUDA device selection; JAX owns devices
    "num_view": "num_view",
    "testlist": "testlist",
    "outdir": "outdir",
    "exps_folder": "exps_folder",
    "data_dir_root": "data_dir_root",
    "max_h": "max_h",
    "max_w": "max_w",
    "trains_i": None,        # dead key: runner.py:78 recomputes via
                             # get_trains_ids; our oracle is data/splits.py
    "use_mvs": "use_mvs",
    "opt_stepNs": "opt_stepNs",
    "grad_clip": "train.grad_clip",
    "mvs_model_name": "mvs.model_name",
    "ndepths": "mvs.ndepths",
    "depth_inter_r": "mvs.depth_inter_r",
    "use_nerf_d": "use_nerf_d",
    "x2_mvsres": "mvs.x2_mvsres",
    "inverse_depth": "inverse_depth",
    "prevent_oom": None,     # CUDA-OOM offload flag; depth-packed conv3d
                             # (ops/packed_conv3d.py) fits full volumes
    "ablate": "ablate",
    "share_cr": "mvs.share_cr",
    "cr_base_chs": "mvs.cr_base_chs",
    "grad_method": "mvs.grad_method",
    "interval_scale": "mvs.interval_scale",
    "numdepth": "mvs.numdepth",
    "num_workers": None,     # torch DataLoader workers; in-process numpy IO
    "batch_size": None,      # torch DataLoader batch; MVS batch is 1
    "eval_mask": "filter.eval_mask",
    "filter_only": "filter_only",
    "filter_dist": "filter.filter_dist",
    "filter_diff": "filter.filter_diff",
    "conf": "filter.conf",
    "thres_view": "filter.thres_view",
    "num_worker": "num_worker",
}

# vol/*.yaml + ours.yaml `vol:` subtree (VolSDF conf namespace)
VOL_MAP = {
    "train.expname": "train.expname",
    "train.dataset_class": None,   # class-path string; single impl
                                   # (data/scene_dataset.py)
    "train.model_class": "model.with_background",  # VolSDFNetwork vs
                                                   # VolSDFNetworkBG
    "train.loss_class": None,      # class-path string; single impl
                                   # (models/loss.py)
    "train.learning_rate": "train.learning_rate",
    "train.num_pixels": "train.num_pixels",
    "train.checkpoint_freq": "train.checkpoint_freq",
    "train.plot_freq": "train.plot_freq",
    "train.render_freq": "train.render_freq",
    "train.split_n_pixels": "train.split_n_pixels",
    "plot.plot_nimgs": "plot.plot_nimgs",
    "plot.resolution": "plot.resolution",
    "plot.grid_boundary": "plot.grid_boundary",
    "loss.eikonal_weight": "loss.eikonal_weight",
    "loss.mvs_weight": "loss.mvs_weight",
    "loss.rgb_weight": "loss.rgb_weight",
    "loss.sparse_weight": "loss.sparse_weight",
    "loss.confi": "loss.confi",
    "loss.gce": "loss.gce",
    "loss.anneal_rgb": "loss.anneal_rgb",
    "loss.rgb_loss": None,         # torch class path; L1 like the default
    "dataset.data_dir": "dataset.data_dir",
    "dataset.img_res": "dataset.img_res",
    "dataset.scan_id": "dataset.scan_id",
    "dataset.num_views": "dataset.num_views",
    "model.feature_vector_size": "model.feature_vector_size",
    "model.scene_bounding_sphere": "model.scene_bounding_sphere",
    "model.implicit_network.d_in": "model.implicit.d_in",
    "model.implicit_network.d_out": "model.implicit.d_out",
    "model.implicit_network.dims": "model.implicit.dims",
    "model.implicit_network.geometric_init": "model.implicit.geometric_init",
    "model.implicit_network.bias": "model.implicit.bias",
    "model.implicit_network.skip_in": "model.implicit.skip_in",
    "model.implicit_network.weight_norm": "model.implicit.weight_norm",
    "model.implicit_network.multires": "model.implicit.multires",
    "model.implicit_network.sphere_scale": "model.implicit.sphere_scale",
    "model.rendering_network.mode": "model.rendering.mode",
    "model.rendering_network.d_in": "model.rendering.d_in",
    "model.rendering_network.d_out": "model.rendering.d_out",
    "model.rendering_network.dims": "model.rendering.dims",
    "model.rendering_network.weight_norm": "model.rendering.weight_norm",
    "model.rendering_network.multires_view": "model.rendering.multires_view",
    "model.density.params_init.beta": "model.density.beta_init",
    "model.density.beta_min": "model.density.beta_min",
    "model.ray_sampler.near": "model.sampler.near",
    "model.ray_sampler.N_samples": "model.sampler.N_samples",
    "model.ray_sampler.N_samples_eval": "model.sampler.N_samples_eval",
    "model.ray_sampler.N_samples_extra": "model.sampler.N_samples_extra",
    "model.ray_sampler.eps": "model.sampler.eps",
    "model.ray_sampler.beta_iters": "model.sampler.beta_iters",
    "model.ray_sampler.max_total_iters": "model.sampler.max_total_iters",
    "model.ray_sampler.N_samples_inverse_sphere":
        "model.sampler.N_samples_inverse_sphere",
    "model.ray_sampler.add_tiny": "model.sampler.add_tiny",
    "model.bg_network.feature_vector_size": "model.bg.feature_vector_size",
    "model.bg_network.implicit_network.d_in": "model.bg.implicit.d_in",
    "model.bg_network.implicit_network.d_out": "model.bg.implicit.d_out",
    "model.bg_network.implicit_network.dims": "model.bg.implicit.dims",
    "model.bg_network.implicit_network.geometric_init":
        "model.bg.implicit.geometric_init",
    "model.bg_network.implicit_network.bias": "model.bg.implicit.bias",
    "model.bg_network.implicit_network.skip_in": "model.bg.implicit.skip_in",
    "model.bg_network.implicit_network.weight_norm":
        "model.bg.implicit.weight_norm",
    "model.bg_network.implicit_network.multires": "model.bg.implicit.multires",
    "model.bg_network.rendering_network.mode": "model.bg.rendering.mode",
    "model.bg_network.rendering_network.d_in": "model.bg.rendering.d_in",
    "model.bg_network.rendering_network.d_out": "model.bg.rendering.d_out",
    "model.bg_network.rendering_network.dims": "model.bg.rendering.dims",
    "model.bg_network.rendering_network.weight_norm":
        "model.bg.rendering.weight_norm",
    "model.bg_network.rendering_network.multires_view":
        "model.bg.rendering.multires_view",
}

# ours.yaml top level (pipeline overrides; `vol:` subtree uses VOL_MAP)
OURS_MAP = {
    "defaults": None,
    "outdir": "outdir",
    "exps_folder": "exps_folder",
    "opt_stepNs": "opt_stepNs",
}

# Fields of OUR Config that are not mapping targets: TPU-native
# capabilities or explicit replacements, each with its home.
OUR_EXTRAS = {
    "is_continue",               # runner --is_continue CLI flag equivalent
    "seed",                      # explicit RNG seeding (reference uses
                                 # torch global seed implicitly)
    "dataset.data_dir_root",     # per-dataset root (reference threads
                                 # args.data_dir_root separately)
    "plot.level",                # conf.get_int('plot.level', default=0)
                                 # — read with a default, never in yaml
    "train.mvs_pack_dtype",      # TPU gather-bandwidth knob
    "train.train_compute_dtype",  # bf16 MXU training dots
    "train.train_activation_dtype",  # bf16 training activations
    "train.feedback_render_dtype",   # cascade-feedback render precision
    "train.ckpt_backend",        # npz | orbax checkpoint format
                                 # (SURVEY §7 step 7)
    "model.compute_dtype",       # eval-path precision
    "model.activation_dtype",    # eval-path activation precision
    "model.white_bkgd",          # VolSDF-upstream option the reference
                                 # hard-codes False (network.py bg_color)
    "model.bg_color",            # ditto
    "mvs.fea_base_channels",     # FeatureNet width (hard-coded 8 in
                                 # reference CasMVSNet.py:35)
    "mvs.compute_dtype",         # bf16 cascade convs
    "parallel.mesh_shape",       # TPU mesh scale-out (SURVEY §7)
    "parallel.mesh_axes",
    "parallel.shard_rays",
    "parallel.shard_eval",
    "parallel.shard_mvs_views",
    "loss.gate_rescue",          # GCE anneal-collapse recovery (off by
    "loss.gate_rescue_weight",   # default; PARITY.md TPU-build extras)
    "loss.gate_rescue_peak",
    "model.sampler.inverse_sphere_bg",  # reference infers NeRF++ sampling
                                        # from model_class; we make the
                                        # switch explicit
    "model.bg.implicit.sphere_scale",   # artifact of reusing
                                        # ImplicitNetConfig for the BG
                                        # net; unused there (the BG SDF
                                        # has no sphere clamp)
}


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

def _flatten(d, prefix=""):
    out = {}
    for k, v in d.items():
        kk = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, kk + "."))
        else:
            out[kk] = v
    return out


def _load_yaml(path):
    with open(path) as f:
        return yaml.safe_load(f) or {}


def _our_leaves(obj, prefix=""):
    out = {}
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        kk = f"{prefix}{f.name}"
        if dataclasses.is_dataclass(v):
            out.update(_our_leaves(v, kk + "."))
        else:
            out[kk] = v
    return out


def _norm(v):
    """Normalize a reference yaml value for comparison with our field."""
    if isinstance(v, str):
        # comma-packed numeric lists: "192,32,8", "1,0.5,0.5"
        parts = v.split(",")
        if len(parts) > 1:
            try:
                return tuple(float(p) for p in parts)
            except ValueError:
                pass
    if isinstance(v, list):
        return tuple(float(x) for x in v) if all(
            isinstance(x, (int, float)) for x in v) else tuple(v)
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    return v


def _norm_ours(v):
    if isinstance(v, tuple):
        return tuple(float(x) if isinstance(x, (int, float)) and not
                     isinstance(x, bool) else x for x in v)
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    return v


def _get(cfg, dotted):
    obj = cfg
    for p in dotted.split("."):
        obj = getattr(obj, p)
    return obj


def _conf_keys(path):
    """Key paths of a pyhocon .conf file (names only, no values).

    Handles the three block spellings these files use: `name{`,
    `name {`, and `name` with `{` on the following line."""
    keys, stack, pending = set(), [], None
    for raw in open(path):
        line = raw.split("#")[0].strip()
        if not line:
            continue
        assign = re.match(r"([A-Za-z_]\w*)\s*=\s*\S", line)
        bare = re.match(r"([A-Za-z_]\w*)\s*$", line)
        named_open = re.match(r"([A-Za-z_]\w*)\s*\{", line)
        if assign:
            keys.add(".".join(stack + [assign.group(1)]))
            pending = None
            continue
        if named_open:
            stack.append(named_open.group(1))
        elif line.startswith("{") and pending:
            stack.append(pending)
        elif bare:
            pending = bare.group(1)
            continue
        pending = None
        for _ in range(line.count("}")):
            if stack:
                stack.pop()
    return keys


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------

def test_base_yaml_fully_mapped():
    flat = _load_yaml(f"{REF}/base.yaml")
    # top-level only: base.yaml has no nested app keys besides hydra
    unmapped = [k for k in flat if k not in BASE_MAP]
    assert not unmapped, f"unmapped base.yaml keys: {unmapped}"
    cfg = dtu_config()
    mismatches = []
    for k, target in BASE_MAP.items():
        if target is None or k not in flat:
            continue
        ours, ref = _norm_ours(_get(cfg, target)), _norm(flat[k])
        if k == "mvs_model_name":
            ref = flat[k].split("#")[0].strip()
        if ours != ref:
            mismatches.append((k, ref, ours))
    assert not mismatches, f"default-value drift: {mismatches}"


@pytest.mark.parametrize("vol,preset", [("dtu", dtu_config),
                                        ("bmvs", bmvs_config)])
def test_vol_yaml_fully_mapped(vol, preset):
    flat = _flatten(_load_yaml(f"{REF}/vol/{vol}.yaml"))
    # ours.yaml overrides the vol tree before runner.py reads it
    ours_yaml = _load_yaml(f"{REF}/ours.yaml")
    flat.update(_flatten(ours_yaml.get("vol", {})))

    unmapped = [k for k in flat if k not in VOL_MAP]
    assert not unmapped, f"unmapped vol/{vol}.yaml keys: {unmapped}"

    cfg = preset()
    mismatches = []
    for k, v in flat.items():
        target = VOL_MAP[k]
        if target is None:
            continue
        if k == "train.model_class":
            ref = v.endswith("network_bg.VolSDFNetworkBG")
        else:
            ref = _norm(v)
        ours = _norm_ours(_get(cfg, target))
        if ours != ref:
            mismatches.append((k, ref, ours))
    assert not mismatches, f"vol/{vol} default drift: {mismatches}"


def test_ours_yaml_fully_mapped():
    top = _load_yaml(f"{REF}/ours.yaml")
    unmapped = [k for k in top if k != "vol" and k not in OURS_MAP]
    assert not unmapped, f"unmapped ours.yaml keys: {unmapped}"


def test_conf_files_match_vol_yamls():
    """The pyhocon eval confs must stay in key-sync with the vol yamls
    (the reference comment at vol/dtu.yaml:1 promises this)."""
    for name in ("dtu", "bmvs"):
        yaml_keys = set(_flatten(_load_yaml(f"{REF}/vol/{name}.yaml")))
        conf_keys = _conf_keys(f"{REF}/confs/{name}.conf")
        # render_freq exists only in the training yaml (eval never
        # renders on a cadence) and the confs omit the MVS loss weights
        # (eval_vsdf.py never builds the loss); everything else must
        # agree.
        missing_in_conf = yaml_keys - conf_keys - {
            "train.render_freq", "loss.mvs_weight", "loss.rgb_weight"}
        extra_in_conf = conf_keys - yaml_keys
        assert not missing_in_conf, (name, sorted(missing_in_conf))
        assert not extra_in_conf, (name, sorted(extra_in_conf))


def test_every_our_field_is_mapped_or_documented():
    leaves = set(_our_leaves(Config()))
    targets = ({v for v in BASE_MAP.values() if v} |
               {v for v in VOL_MAP.values() if v} |
               {v for v in OURS_MAP.values() if v})
    unknown_targets = targets - leaves
    assert not unknown_targets, \
        f"mapping points at nonexistent fields: {sorted(unknown_targets)}"
    undocumented = leaves - targets - OUR_EXTRAS
    assert not undocumented, \
        f"our config has undocumented extras: {sorted(undocumented)}"
    stale_extras = OUR_EXTRAS - leaves
    assert not stale_extras, \
        f"OUR_EXTRAS names nonexistent fields: {sorted(stale_extras)}"
