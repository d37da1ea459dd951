"""Backward-pass attack probes (VERDICT r3 item 5).

The post-lever production step is 11.6-12.0 ms with 6.16 ms (53%) in
backward+optimizer, of which guard+clip+Adam is only 0.45 ms — the
~5.7 ms rest is the differentiated render's reverse pass. The step is
per-ray traffic-bound (flat batch scaling, BENCH_NOTES), so the levers
worth measuring trade residual-memory traffic for MXU recompute:

  * selective rematerialization policies (`jax.checkpoint` with
    dots-saveable policies): the backward reloads only matmul outputs
    and recomputes the elementwise chains (PE, relu masks, softplus,
    compositing glue) instead of loading their saved bf16 residuals.
    Full remat was measured at 24.8 ms (recomputing the MLP dots too
    is pure loss); these policies keep the dots.
  * remat scoped to the per-point MLP section only (sdf_feat_grad +
    rgb_mlp), leaving the ray-level compositing saved as today.

Methodology identical to tools/profile_step.py: jitted 200-step
lax.scan chunks over per-step RNGs with a state carry, host fetch as
the sync, 3 trials. Run on the TPU for real numbers.

Usage: python tools/probe_backward.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from s_volsdf_tpu.engine.train_step import (guarded_update,
                                            sample_train_batch, _loss_fn)
from s_volsdf_tpu.models.loss import compute_loss
from s_volsdf_tpu.models.network import render_rays
from s_volsdf_tpu.ops.cost_mapping import cost_mapping
from tools.profile_step import build_inputs, timed_scan

POLICIES = {
    "dots_saveable": jax.checkpoint_policies.dots_saveable,
    "dots_no_batch_dims": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
}


def make_loss_fn(cfg, *, remat_policy=None):
    """_loss_fn with the render wrapped in jax.checkpoint(policy=...).

    Mirrors engine/train_step.py:_loss_fn exactly (training dtypes,
    stop-gradient cost_mapping inputs, GCE loss) — asserted equal to
    the production loss below before timing anything.
    """
    mcfg = dataclasses.replace(
        cfg.model, compute_dtype=cfg.train.train_compute_dtype,
        activation_dtype=cfg.train.train_activation_dtype)

    def render(params, uv, pose, intrinsics, rng):
        return render_rays(params, mcfg, uv, pose, intrinsics, rng,
                           training=True, fast=1)

    if remat_policy is not None:
        render = jax.checkpoint(render, policy=remat_policy)

    def loss_fn(params, batch, rng, mvs, iter_step):
        out = render(params, batch["uv"], batch["pose"],
                     batch["intrinsics"], rng)
        outputs = {
            "rgb_values": out.rgb_values,
            "depth_values": out.depth_values,
            "weights": out.weights,
            "grad_theta": out.grad_theta,
        }
        if mvs is not None:
            pj, pi, _ = cost_mapping(
                jax.lax.stop_gradient(out.depth_vals),
                jax.lax.stop_gradient(out.xyz),
                batch["view_onehot"], mvs)
            outputs["pi"], outputs["pj"] = pi, pj
        loss_out = compute_loss(
            cfg.loss, outputs, batch["rgb"],
            batch.get("rgb_smooth", batch["rgb"]),
            iter_step, use_mvs=mvs is not None)
        return loss_out.loss, loss_out

    return loss_fn


def make_body(cfg, tx, loss_fn, *, n_views, img_res, n_rays):
    def body(aux, st, rng):
        scene, vols = aux
        batch, k = sample_train_batch(
            scene, rng, n_views=n_views, img_res=img_res, n_rays=n_rays)
        grads, loss_out = jax.grad(loss_fn, has_aux=True)(
            st.params, batch, k, vols, st.iter_step)
        st2, loss_out = guarded_update(tx, st, grads, loss_out)
        return st2, loss_out.loss
    return body


def main():
    cfg, tx, state, scene_dev, packed = build_inputs()
    n_views, img_res = 3, (cfg.max_h, cfg.max_w)
    n_rays = cfg.train.num_pixels
    aux = (scene_dev, packed)
    kw = dict(n_views=n_views, img_res=img_res, n_rays=n_rays)

    # Correctness gate: every variant must produce the production
    # step's loss (same math, different schedule). One step, f64-free
    # exact compare on this backend. Jitted — eager grad dispatch over
    # the axon tunnel takes tens of minutes.
    def one_loss(loss_fn):
        @jax.jit
        def gate(scene, params, mvs, iter_step):
            batch, k = sample_train_batch(
                scene, jax.random.PRNGKey(9), **kw)
            return jax.grad(loss_fn, has_aux=True)(
                params, batch, k, mvs, iter_step)
        g, lo = gate(scene_dev, state.params, packed, state.iter_step)
        return np.asarray(lo.loss), jax.tree.map(np.asarray, g)

    def prod_loss_fn(params, batch, rng, mvs, iter_step):
        return _loss_fn(params, cfg, batch, rng, mvs, iter_step)

    # On CPU/f32 every policy is BIT-identical in loss and grads
    # (measured; remat is pure scheduling). On TPU with bf16 training
    # activations, XLA's different fusion around the saved residuals
    # shifts rounding by ~1e-5 abs — gate with a tolerance here and
    # lean on the CPU bit-identity for mathematical equivalence.
    base_l, base_g = one_loss(prod_loss_fn)
    for name, pol in POLICIES.items():
        l, g = one_loss(make_loss_fn(cfg, remat_policy=pol))
        assert np.allclose(base_l, l, rtol=0.02, atol=1e-4), \
            (name, base_l, l)
        flat_b = jax.tree_util.tree_leaves(base_g)
        flat_v = jax.tree_util.tree_leaves(g)
        worst = max(float(np.max(np.abs(b - v)))
                    for b, v in zip(flat_b, flat_v))
        print(f"# {name}: loss |d|={abs(float(base_l) - float(l)):.2e}, "
              f"grad max|d|={worst:.2e}")

    results = {}
    timed_scan(make_body(cfg, tx, prod_loss_fn, **kw),
               state, aux, "baseline (production)", results)
    for name, pol in POLICIES.items():
        timed_scan(make_body(cfg, tx, make_loss_fn(cfg, remat_policy=pol),
                             **kw),
                   state, aux, f"remat {name}", results)

    base = results["baseline (production)"]
    print("\n--- vs baseline ---")
    for k, v in results.items():
        print(f"{k:34s} {v:7.2f} ms/step  ({v - base:+.2f})")


if __name__ == "__main__":
    main()
