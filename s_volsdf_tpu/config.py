"""Configuration tree for the TPU S-VolSDF pipeline.

Replaces the reference's dual hydra/OmegaConf + pyhocon stack
(/root/reference/runner.py:8-16, /root/reference/volsdf/vsdf.py:24-26)
with a single typed dataclass tree loadable from YAML with dotted CLI
overrides (`key.subkey=value`), mirroring the reference defaults in
/root/reference/config/{base,ours}.yaml and config/vol/{dtu,bmvs}.yaml.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, List, Optional, Tuple

import yaml


# --------------------------------------------------------------------------
# VolSDF model configs (reference config/vol/dtu.yaml, bmvs.yaml)
# --------------------------------------------------------------------------

@dataclass(unsafe_hash=True)
class ImplicitNetConfig:
    """SDF MLP (reference volsdf/model/network.py:10-131)."""
    d_in: int = 3
    d_out: int = 1
    dims: Tuple[int, ...] = (256,) * 8
    geometric_init: bool = True
    bias: float = 0.6
    skip_in: Tuple[int, ...] = (4,)
    weight_norm: bool = True
    multires: int = 6
    sphere_scale: float = 20.0


@dataclass(unsafe_hash=True)
class RenderingNetConfig:
    """Radiance MLP (reference volsdf/model/network.py:134-190)."""
    mode: str = "idr"  # 'idr' | 'nerf'
    d_in: int = 9
    d_out: int = 3
    dims: Tuple[int, ...] = (256,) * 4
    weight_norm: bool = True
    multires_view: int = 1


@dataclass(unsafe_hash=True)
class DensityConfig:
    """Laplace CDF density (reference volsdf/model/density.py:16-30)."""
    beta_init: float = 0.1
    beta_min: float = 1e-4


@dataclass(unsafe_hash=True)
class RaySamplerConfig:
    """Error-bound sampler (reference volsdf/model/ray_sampler.py:46-66;
    values from config/vol/dtu.yaml + ours.yaml near=1e-4 override)."""
    near: float = 1e-4
    N_samples: int = 64
    N_samples_eval: int = 128
    N_samples_extra: int = 32
    eps: float = 0.1
    beta_iters: int = 10
    max_total_iters: int = 5
    inverse_sphere_bg: bool = False
    N_samples_inverse_sphere: int = 0
    add_tiny: float = 0.0


@dataclass(unsafe_hash=True)
class BGNetworkConfig:
    """NeRF++ background nets (reference config/vol/bmvs.yaml bg_network)."""
    feature_vector_size: int = 256
    implicit: ImplicitNetConfig = field(default_factory=lambda: ImplicitNetConfig(
        d_in=4, d_out=1, dims=(256,) * 8, geometric_init=False, bias=0.0,
        skip_in=(4,), weight_norm=False, multires=10))
    rendering: RenderingNetConfig = field(default_factory=lambda: RenderingNetConfig(
        mode="nerf", d_in=3, d_out=3, dims=(128,), weight_norm=False,
        multires_view=4))


@dataclass(unsafe_hash=True)
class ModelConfig:
    """VolSDF network (reference volsdf/model/network.py:192-295)."""
    feature_vector_size: int = 256
    scene_bounding_sphere: float = 3.0
    white_bkgd: bool = False
    compute_dtype: str = "float32"   # 'bfloat16' -> MXU-native matmuls
    # 'bfloat16' keeps HIDDEN MLP activations (and their saved
    # backward residuals) in bf16 between layers; final layer outputs
    # are always f32. Only takes effect when compute_dtype is also
    # bfloat16 (bf16 residuals with f32 dots would be pure loss).
    # Measured on v5e at production shapes: step 17.0 -> 13.3 ms.
    activation_dtype: str = "float32"
    bg_color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    with_background: bool = False  # True => VolSDFNetworkBG (BMVS)
    implicit: ImplicitNetConfig = field(default_factory=ImplicitNetConfig)
    rendering: RenderingNetConfig = field(default_factory=RenderingNetConfig)
    density: DensityConfig = field(default_factory=DensityConfig)
    sampler: RaySamplerConfig = field(default_factory=RaySamplerConfig)
    bg: BGNetworkConfig = field(default_factory=BGNetworkConfig)


@dataclass(unsafe_hash=True)
class PlotConfig:
    """Surface/plot extraction knobs (reference config/vol/*.yaml `plot`
    section + `plot.level` read with default 0 at eval_vsdf.py:118,134).
    `grid_boundary`/`level` feed mesh export (engine/eval_nvs.py) — the
    reference uses the configured [-1.5, 1.5] there, NOT the scene
    bounding sphere. `plot_nimgs`/`resolution` are carried for config
    parity with the reference's training-plot path (its stacked_plot
    takes them; our training plots are fixed-size render panels that
    don't extract surfaces, so nothing consumes them yet)."""
    plot_nimgs: int = 1
    resolution: int = 100
    grid_boundary: Tuple[float, float] = (-1.5, 1.5)
    level: float = 0.0


@dataclass(unsafe_hash=True)
class LossConfig:
    """VolSDFLoss weights (reference volsdf/model/loss.py:15-28 +
    config/ours.yaml loss overrides)."""
    eikonal_weight: float = 0.1
    rgb_weight: float = 1.0
    mvs_weight: float = 1.0
    sparse_weight: float = 1.0
    confi: float = 1e-3
    gce: float = 0.5
    anneal_rgb: int = 200
    # --- gate rescue (TPU-build extra, OFF by default) -------------
    # Survivable failure mode for the GCE anneal-boundary collapse
    # (RUNLOG_BMVS.md): when a bad stream dumps all foreground mass
    # into the background, every ray sample leaves the hypothesis slab,
    # pi*pj == 0 exactly, and the reference gate (loss.py:61-67) can
    # never re-open — the GCE gradient is identically zero. With
    # gate_rescue on, rays whose gate is CLOSED but whose prior is
    # informative (per-pixel WTA peak > gate_rescue_peak) get an L1
    # pull of rendered depth toward the prior's WTA depth at that
    # pixel; once samples re-enter the slab the gate re-opens and the
    # rescue term self-disables per ray (complementary gating).
    gate_rescue: bool = False
    gate_rescue_weight: float = 0.1
    gate_rescue_peak: float = 0.02


@dataclass(unsafe_hash=True)
class TrainConfig:
    """Per-scene optimization (reference config/vol/dtu.yaml train +
    ours.yaml overrides)."""
    expname: str = "ours"
    learning_rate: float = 5e-4
    num_pixels: int = 512          # rays per step (ours.yaml:11)
    checkpoint_freq: int = 100
    plot_freq: int = 500
    render_freq: int = 500
    split_n_pixels: int = 10000    # chunk for full-image render
    grad_clip: bool = True
    # Gather precision of the packed MVS probability volumes in chunked
    # training (ops/cost_mapping.py): 'bfloat16' halves gather bytes
    # (the near/far planes always stay exact f32); 'float32' for
    # bit-parity.
    mvs_pack_dtype: str = "bfloat16"
    # MLP matmul precision DURING TRAINING ONLY (f32 accumulation on
    # the MXU; weight-norm normalization and everything outside the
    # dots stay f32). Eval/render always use model.compute_dtype
    # (f32 by default) — mixed precision in the reference's sense.
    # Measured on v5e: 14.7x -> 16.9x baseline with equal final
    # render PSNR and depth MAE on the production-shape sphere run.
    train_compute_dtype: str = "bfloat16"
    # Hidden-activation precision DURING TRAINING ONLY (see
    # ModelConfig.activation_dtype). bf16 residuals + elementwise
    # chains cut the latency-bound step 17.0 -> 13.3 ms on v5e
    # (17.3x -> 22x baseline); final layer outputs, losses, the
    # optimizer, and all eval/render paths stay f32. Quality gate:
    # tests/test_train_e2e.py::test_bf16_activation_training_quality.
    train_activation_dtype: str = "bfloat16"
    # MLP precision of the cascade-feedback depth render ONLY
    # (VolTrainer.render_mvs). The feedback depth re-centers the
    # next cascade stage's hypothesis range (runner.py:235-243 in the
    # reference), so sub-interval precision is irrelevant; eval/plot
    # renders are untouched and stay f32.
    feedback_render_dtype: str = "float32"
    # Checkpoint format (utils/checkpoint.py): 'npz' (default — ~2 MB
    # states, zero dependency surface) or 'orbax' (atomic directory
    # commits, named leaves, multi-host coordination; SURVEY.md §7
    # step 7). Loads auto-detect, so a run may switch between
    # restarts.
    ckpt_backend: str = "npz"


@dataclass(unsafe_hash=True)
class DatasetConfig:
    data_dir: str = "DTU"          # 'DTU' | 'BlendedMVS'
    img_res: Tuple[int, int] = (576, 768)
    scan_id: int = 114
    num_views: int = 3
    data_dir_root: str = "data_s_volsdf"


# --------------------------------------------------------------------------
# MVS / pipeline configs (reference config/base.yaml)
# --------------------------------------------------------------------------

@dataclass(unsafe_hash=True)
class MVSConfig:
    model_name: str = "casmvsnet"  # casmvsnet | ucsnet | transmvsnet
    ndepths: Tuple[int, ...] = (192, 32, 8)
    depth_inter_r: Tuple[float, ...] = (1.0, 0.5, 0.5)
    numdepth: int = 192
    interval_scale: float = 1.06
    share_cr: bool = False
    cr_base_chs: Tuple[int, ...] = (8, 8, 8)
    grad_method: str = "detach"
    x2_mvsres: bool = True         # upscale images x2 for MVS
    fea_base_channels: int = 8
    # Conv kernel precision of the frozen cascade (blocks.py
    # cast_conv_weights): 'bfloat16' runs every conv on the MXU's
    # native bf16 path with f32 accumulation (BN/bias/softmax stay
    # f32); 'float32' for bit-parity with the torch reference.
    compute_dtype: str = "bfloat16"


@dataclass(unsafe_hash=True)
class FilterConfig:
    """Point-cloud fusion (reference config/base.yaml:52-58)."""
    conf: float = 0.0
    filter_dist: float = 1.0
    filter_diff: float = 0.01
    thres_view: int = 1
    eval_mask: bool = True


@dataclass(unsafe_hash=True)
class ParallelConfig:
    """TPU scale-out (new capability; SURVEY.md section 2.9/7)."""
    mesh_shape: Tuple[int, ...] = (-1,)   # -1 => all local devices
    mesh_axes: Tuple[str, ...] = ("rays",)
    shard_rays: bool = True
    # shard full-image eval/feedback renders and SDF grid evals over
    # the same mesh (embarrassingly parallel;
    # engine/render.py:_shard_inputs, engine/mesh.py:eval_sdf_grid)
    shard_eval: bool = True
    # one-view-per-device MVS cascade dispatch
    # (engine/runner.py:_view_mesh). None => follow shard_eval; set
    # explicitly to split render sharding from cascade sharding.
    shard_mvs_views: Optional[bool] = None


@dataclass(unsafe_hash=True)
class Config:
    # general (reference config/base.yaml)
    num_view: int = 3
    testlist: str = "scan106"
    outdir: str = "exps_mvs"
    exps_folder: str = "exps_vsdf"
    data_dir_root: str = "data_s_volsdf"
    max_h: int = 576
    max_w: int = 768
    use_mvs: bool = True
    opt_stepNs: Tuple[int, ...] = (100000, 0, 0)
    use_nerf_d: Tuple[int, ...] = (1, 0, 0)
    inverse_depth: bool = False
    ablate: bool = False
    filter_only: bool = False
    num_worker: int = 4
    is_continue: bool = False
    seed: int = 0

    mvs: MVSConfig = field(default_factory=MVSConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    plot: PlotConfig = field(default_factory=PlotConfig)
    filter: FilterConfig = field(default_factory=FilterConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)


# --------------------------------------------------------------------------
# Presets mirroring the reference defaults trees
# --------------------------------------------------------------------------

def dtu_config() -> Config:
    """Mirror of config/vol/dtu.yaml + config/ours.yaml."""
    cfg = Config()
    cfg.train.expname = "ours"
    cfg.train.num_pixels = 512
    cfg.train.render_freq = 500
    cfg.train.split_n_pixels = 500
    return cfg


def bmvs_config() -> Config:
    """Mirror of config/vol/bmvs.yaml + config/ours.yaml."""
    cfg = dtu_config()
    cfg.dataset.data_dir = "BlendedMVS"
    cfg.dataset.scan_id = 1
    cfg.model.with_background = True
    cfg.model.implicit.sphere_scale = 1.0
    cfg.model.sampler.inverse_sphere_bg = True
    cfg.model.sampler.N_samples_inverse_sphere = 32
    cfg.model.sampler.add_tiny = 1e-6
    return cfg


def per_scene_overrides(cfg: Config, scene: str) -> Config:
    """Per-scan hyperparameter tweaks (reference runner.py:46-67)."""
    cfg = dataclasses.replace(cfg)  # shallow copy of top level
    cfg.loss = dataclasses.replace(cfg.loss)
    if cfg.dataset.data_dir == "DTU":
        if scene == "scan37":
            cfg.loss.sparse_weight = 0.1
        elif scene == "scan24":
            cfg.loss.sparse_weight = 0.0
    elif cfg.dataset.data_dir == "BlendedMVS":
        if scene in ("scan2", "scan3", "scan7", "scan9"):
            cfg.loss.sparse_weight = 0.0
        if scene in ("scan1", "scan2", "scan5", "scan6", "scan8", "scan9"):
            cfg.inverse_depth = True
    return cfg


# --------------------------------------------------------------------------
# YAML + dotted CLI override machinery
# --------------------------------------------------------------------------

_PRESETS = {"dtu": dtu_config, "bmvs": bmvs_config, "default": Config}


def _coerce(value: str, current: Any) -> Any:
    """Parse a CLI string into the type of the existing field value."""
    if current is None:
        # Optional fields (e.g. parallel.shard_mvs_views): YAML rules,
        # so "true"/"false"/"null"/numbers all parse sensibly.
        return yaml.safe_load(value)
    if isinstance(current, bool):
        return value.lower() in ("1", "true", "yes", "on")
    if isinstance(current, int):
        return int(value)
    if isinstance(current, float):
        return float(value)
    if isinstance(current, tuple):
        parsed = yaml.safe_load(value)
        if not isinstance(parsed, (list, tuple)):
            parsed = [parsed]
        return tuple(parsed)
    return value


def apply_override(cfg: Any, dotted_key: str, value: str) -> None:
    """Set `cfg.<dotted.key> = value` with type coercion."""
    parts = dotted_key.split(".")
    obj = cfg
    for p in parts[:-1]:
        obj = getattr(obj, p)
    current = getattr(obj, parts[-1])
    # Optional fields (declared default None) coerce by YAML rules
    # regardless of the value they currently hold, so "null" can
    # always reset them.
    fld = next((f for f in dataclasses.fields(obj)
                if f.name == parts[-1]), None)
    if fld is not None and fld.default is None:
        current = None
    setattr(obj, parts[-1], _coerce(value, current))


def _apply_dict(cfg: Any, d: dict, prefix: str = "") -> None:
    for k, v in d.items():
        if isinstance(v, dict) and dataclasses.is_dataclass(getattr(cfg, k, None)):
            _apply_dict(getattr(cfg, k), v)
        else:
            current = getattr(cfg, k)
            if isinstance(current, tuple) and isinstance(v, list):
                v = tuple(v)
            setattr(cfg, k, v)


def load_config(preset: str = "dtu", yaml_path: Optional[str] = None,
                overrides: Optional[List[str]] = None) -> Config:
    """Build a Config from a preset, optional YAML file, and CLI overrides.

    `overrides` are `key.subkey=value` strings (hydra-style UX,
    reference README.md:40-42).
    """
    cfg = _PRESETS[preset]()
    if yaml_path and os.path.exists(yaml_path):
        with open(yaml_path) as f:
            _apply_dict(cfg, yaml.safe_load(f) or {})
    for ov in overrides or []:
        key, _, value = ov.partition("=")
        apply_override(cfg, key.strip(), value.strip())
    return cfg


def validate_config(cfg: Config) -> Config:
    """Invariant checks (reference helpers/help.py:47-53 + TPU needs)."""
    assert cfg.dataset.data_dir in ("DTU", "BlendedMVS"), cfg.dataset.data_dir
    assert len(cfg.mvs.ndepths) == len(cfg.mvs.depth_inter_r) == 3
    assert len(cfg.opt_stepNs) == 3 and len(cfg.use_nerf_d) == 3
    assert cfg.mvs.numdepth == cfg.mvs.ndepths[0], \
        "numdepth must match stage-1 hypothesis count"
    if cfg.dataset.data_dir == "BlendedMVS":
        assert cfg.mvs.interval_scale == 1.0, \
            "BlendedMVS requires interval_scale=1 (general_eval.py:32)"
    for d in cfg.mvs.ndepths:
        assert d % 8 == 0, f"ndepths must be multiples of 8 (3-level " \
            f"cost UNet + depth packing), got {d}"
    H, W = cfg.dataset.img_res
    assert (cfg.max_h, cfg.max_w) == (H, W), \
        "max_h/max_w must equal dataset.img_res (reference vsdf.py:82)"
    assert H % 32 == 0 and W % 32 == 0, \
        "img_res must be multiples of 32 for the MVS pyramids"
    assert cfg.train.mvs_pack_dtype in ("float32", "bfloat16"), \
        cfg.train.mvs_pack_dtype
    assert cfg.train.train_compute_dtype in ("float32", "bfloat16"), \
        cfg.train.train_compute_dtype
    assert cfg.model.activation_dtype in ("float32", "bfloat16"), \
        cfg.model.activation_dtype
    assert cfg.train.train_activation_dtype in ("float32", "bfloat16"), \
        cfg.train.train_activation_dtype
    assert cfg.mvs.compute_dtype in ("float32", "bfloat16"), \
        cfg.mvs.compute_dtype
    assert cfg.train.feedback_render_dtype in ("float32", "bfloat16"), \
        cfg.train.feedback_render_dtype
    assert cfg.train.ckpt_backend in ("npz", "orbax"), \
        cfg.train.ckpt_backend
    return cfg


def save_config(cfg: Config, path: str) -> None:
    """Snapshot config to YAML (reference vsdf.py:71-72, runner.py:113-115)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg), f, sort_keys=False)
