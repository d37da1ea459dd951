"""VolSDF training loss: RGB L1 + eikonal + MVS GCE + sparsity/anneal.

Parity with /root/reference/volsdf/model/loss.py:15-115. Everything is
a pure function of (outputs, ground truth, iter_step) so the annealing
schedule is traced — iter_step is a scalar array, the anneal gates are
`where`s, and the whole loss jit-fuses with the render.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax.numpy as jnp
from jax import lax

from s_volsdf_tpu.config import LossConfig


class LossOutput(NamedTuple):
    loss: jnp.ndarray
    rgb_loss: jnp.ndarray
    eikonal_loss: jnp.ndarray
    mvs_loss: jnp.ndarray
    sparse_loss: jnp.ndarray
    psnr: jnp.ndarray
    # Gate-rescue depth-anchor loss (loss.gate_rescue, TPU-build extra;
    # stays the scalar 0.0 with the flag off — see _gate_rescue).
    rescue_loss: jnp.ndarray = None
    # 1.0 when the NaN/Inf gradient guard accepted the update, 0.0 when
    # it skipped (set by engine.train_step.guarded_update; None before
    # the guard runs). Lets long runs count guard trips (the reference
    # only logs them, vsdf.py:454-464).
    grad_finite: jnp.ndarray = None


def _rgb_l1(rgb_values, rgb_gt):
    """L1 reduction='mean' (loss.py:29, 46-47)."""
    return jnp.mean(jnp.abs(rgb_values - rgb_gt))


def _rgb_l1_gated(rgb_values, rgb_gt, pi, pj, t):
    """Low-confidence-gated L1 vs blurred GT (loss.py:38-45)."""
    confi = jnp.sum(pi * pj, axis=-1)
    per_ray = jnp.mean(jnp.abs(rgb_values - rgb_gt), axis=-1)
    return jnp.mean(per_ray * (confi < t))


def _eikonal(grad_theta):
    """(||grad|| - 1)^2 (loss.py:49-51)."""
    return jnp.mean((jnp.linalg.norm(grad_theta, axis=1) - 1.0) ** 2)


def _mvs_gce(pi, pj, w, gce: float, confi_thresh: float):
    """Generalized cross-entropy against the MVS probability volume
    (loss.py:53-67). pi: same-view prob, pj: other-view prob sums."""
    pw = pi * pj
    if gce == 1.0:
        per_sample = -pw * w
    elif gce == 0.0:
        per_sample = -pw * jnp.log(w + 1e-8)
    else:
        per_sample = -pw * lax.stop_gradient(w) ** gce * jnp.log(w + 1e-8)
    per_ray = jnp.sum(per_sample, axis=1)
    gate = (jnp.sum(pw, axis=1) > confi_thresh).astype(per_ray.dtype)
    return jnp.mean(gate * per_ray)


def _sparse(pi, pj, depth, confi_thresh: float):
    """Penalize small depth on low-confidence rays (loss.py:69-78).
    `depth` is depth_values_all when a background model is active
    (loss.py:72-75)."""
    confi = jnp.sum(pi * pj, axis=-1)
    per_ray = 1.0 / (depth.squeeze() + 1e-3)
    return jnp.mean(per_ray * (confi < confi_thresh))


def _gate_rescue(pi, pj, depth, anchor, peak, confi_thresh: float,
                 peak_thresh: float):
    """Recovery pull for gate-closed rays (config.LossConfig rationale):
    L1 of rendered depth to the prior's WTA depth, only where the GCE
    gate is CLOSED (complement of loss.py:66's `pw.sum > confi`) AND
    the prior is informative (WTA peak above threshold). Zero gradient
    interference with the reference path: on every gate-open ray the
    term is exactly 0."""
    conf = jnp.sum(pi * pj, axis=-1)
    closed = (conf <= confi_thresh).astype(depth.dtype)
    informative = (peak > peak_thresh).astype(depth.dtype)
    per_ray = jnp.abs(depth.squeeze() - anchor)
    return jnp.mean(closed * informative * per_ray)


def compute_loss(cfg: LossConfig, outputs: Dict, rgb_gt, rgb_smooth,
                 iter_step, *, use_mvs: bool) -> LossOutput:
    """Total loss (loss.py:80-114).

    outputs must contain rgb_values, grad_theta, weights, depth_values
    and — when use_mvs — pi, pj from cost_mapping.
    iter_step: scalar int array (traced; drives the anneal).
    """
    rgb_gt = rgb_gt.reshape(-1, 3)
    rgb_values = outputs["rgb_values"]

    rgb_loss = _rgb_l1(rgb_values, rgb_gt)
    eik_loss = _eikonal(outputs["grad_theta"])

    zero = jnp.asarray(0.0, dtype=rgb_loss.dtype)
    mvs_loss = zero
    sparse_loss = zero

    anneal_active = (cfg.sparse_weight > 0.0) and (cfg.anneal_rgb > 0)
    if use_mvs and cfg.mvs_weight > 0.0:
        mvs_loss = _mvs_gce(outputs["pi"], outputs["pj"],
                            outputs["weights"], cfg.gce, cfg.confi)

    anneal_sparse = zero
    if use_mvs and anneal_active:
        in_anneal = iter_step < cfg.anneal_rgb
        sparse_depth = outputs.get("depth_values_all",
                                   outputs["depth_values"])
        sparse_loss = jnp.where(
            in_anneal,
            _sparse(outputs["pi"], outputs["pj"], sparse_depth, cfg.confi),
            zero)
        # Linear 1 -> 0 decay over anneal_rgb steps (loss.py:8-13, 104).
        t = iter_step.astype(rgb_loss.dtype) / cfg.anneal_rgb
        anneal_sparse = jnp.where(in_anneal, jnp.maximum(1.0 - t, 0.0), zero)
        # During anneal the RGB target switches to the blurred GT gated
        # to low-confidence rays (loss.py:105).
        rgb_loss_anneal = _rgb_l1_gated(
            rgb_values, rgb_smooth.reshape(-1, 3),
            outputs["pi"], outputs["pj"], t=1e-8)
        rgb_loss = jnp.where(in_anneal, rgb_loss_anneal, rgb_loss)

    rescue_loss = zero
    if use_mvs and cfg.gate_rescue:
        rescue_depth = outputs.get("depth_values_all",
                                   outputs["depth_values"])
        rescue_loss = _gate_rescue(
            outputs["pi"], outputs["pj"], rescue_depth,
            outputs["prior_anchor"], outputs["prior_peak"],
            cfg.confi, cfg.gate_rescue_peak)

    total = (cfg.rgb_weight * rgb_loss
             + cfg.eikonal_weight * eik_loss
             + cfg.mvs_weight * mvs_loss
             + cfg.sparse_weight * anneal_sparse * sparse_loss)
    if use_mvs and cfg.gate_rescue:
        # Python-level gate: with the flag off the traced graph (and
        # therefore the default-path trajectory) is bit-identical.
        total = total + cfg.gate_rescue_weight * rescue_loss

    mse = jnp.mean((rgb_values - rgb_gt) ** 2)
    psnr = -10.0 * jnp.log(mse) / jnp.log(10.0)

    return LossOutput(total, rgb_loss, eik_loss, mvs_loss, sparse_loss,
                      psnr, rescue_loss=rescue_loss)
