"""Ray samplers: uniform + VolSDF error-bound (Algorithm 1).

Behavioral rebuild of /root/reference/volsdf/model/ray_sampler.py under
XLA static-shape constraints:

  * The reference runs a data-dependent `while not_converge` loop with
    a global early exit (ray_sampler.py:83-136). Here the iteration
    count is STATIC (`n_iters = fast if fast >= 0 else max_total_iters`,
    matching the train/eval budgets at vsdf.py:205-206), with the final
    iteration always taking the "final sample set" branch — but the
    reference's global early exit IS reproduced: once every ray's
    bisected beta reaches beta0 (the reference's `not_converge`
    condition, ray_sampler.py:134), remaining refine iterations run a
    scalar `lax.cond` branch that merely appends duplicates of the
    far sample — skipping the SDF MLP eval AND the whole per-iteration
    d*/beta-bisection/weights machinery the reference also never runs
    after its loop exits (the final pdf then comes straight from
    _weights at beta0, which is exactly what the bisection returns
    once every ray has converged). Duplicated samples
    span zero-length intervals, so the downstream integrals (d*,
    error bound, weights) match what the reference computes on its
    smaller early-exited sample set, up to two small drifts: the final
    pdf's 1e-5 floor gives each duplicated zero-width bin a sliver of
    mass (final samples can land on the duplicated far z), and the
    N_samples_extra linspace/permutation indexes the enlarged z_vals,
    so the extra-sample selection differs from the reference's smaller
    set. Shapes stay static. On a trained model most rays converge
    after 1-2
    iterations, so eval-mode renders skip most of their sampler MLP
    cost — the same place the reference's adaptive loop saves its
    time.
  * torch.sort of concatenated (z, sdf) pairs becomes argsort + gather
    so SDF values are never recomputed for old samples
    (ray_sampler.py:90-93).
  * searchsorted-based inverse CDF is a branchless comparison-sum
    (ops/inverse_cdf.py).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from s_volsdf_tpu.config import RaySamplerConfig
from s_volsdf_tpu.models.density import laplace_density
from s_volsdf_tpu.ops.inverse_cdf import pdf_to_cdf, sample_pdf_from_cdf
from s_volsdf_tpu.utils.cameras import get_sphere_intersections


def merge_sorted_pairs(za, sa, zb, sb):
    """Merge two per-ray SORTED (z, payload) pairs into one sorted pair.

    Bit-identical to `order = argsort(concat([za, zb]))` + two
    take_along_axis (jnp.argsort is stable; the rank formulas below
    reproduce exactly that tie order: a-elements precede equal
    b-elements, and equal elements within each input keep their
    order). Replacing the bitonic argsort + per-element gathers with
    a branchless comparison-rank + batched scatter measures ~2x
    faster at eval-render shapes on v5e (158 -> 80 ms at (16k, 256))
    — the sampler's inputs are always sorted already: z_vals by
    construction (uniform_z_vals pins far >= near so the initial
    linspace never descends), new samples because the inverse CDF is
    evaluated at ascending quantiles (ops/inverse_cdf.py).

    PRECONDITION: za and zb must each be non-decreasing per ray
    (NaNs allowed anywhere — ranked as +inf). Unsorted inputs
    collide ranks and silently drop samples; use argsort for those.
    """
    n1, n2 = za.shape[1], zb.shape[1]
    # NaN z (rays missing the bounding sphere) sort last under
    # argsort; rank on NaN->+inf keys to reproduce that exactly —
    # raw NaN comparisons are all-false and would collide ranks.
    ka = jnp.where(jnp.isnan(za), jnp.inf, za)
    kb = jnp.where(jnp.isnan(zb), jnp.inf, zb)
    ra = jnp.arange(n1)[None, :] + jnp.sum(
        kb[:, None, :] < ka[:, :, None], axis=-1)
    rb = jnp.arange(n2)[None, :] + jnp.sum(
        ka[:, None, :] <= kb[:, :, None], axis=-1)
    zm = jnp.zeros((za.shape[0], n1 + n2), za.dtype)
    sm = jnp.zeros((sa.shape[0], n1 + n2), sa.dtype)
    dims = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(), inserted_window_dims=(1,),
        operand_batching_dims=(0,), scatter_indices_batching_dims=(0,),
        scatter_dims_to_operand_dims=(1,))

    def scat(op, idx, upd):
        # ranks form a permutation by construction
        return jax.lax.scatter(
            op, idx[..., None], upd, dims,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    return (scat(scat(zm, ra, za), rb, zb),
            scat(scat(sm, ra, sa), rb, sb))


class SamplerOutput(NamedTuple):
    z_vals: jnp.ndarray            # (R, N_final) sorted
    z_samples_eik: jnp.ndarray     # (R, 1) random near-surface z
    z_vals_bg: Optional[jnp.ndarray]  # (R, N_bg) or None
    # Iteration (1-based) after which the GLOBAL early exit engaged
    # (scalar int32; == n_iters when the loop ran its full budget).
    # Instrumentation for quantifying the eval-mode drift at scale
    # (tools/sampler_drift.py); adds one comparison to the graph.
    converged_iter: jnp.ndarray = None


def uniform_z_vals(rng, cfg: RaySamplerConfig, ray_dirs, cam_loc, far,
                   n_samples: int, training: bool,
                   take_sphere_intersection: bool,
                   scene_bounding_sphere: float, t_rand=None):
    """UniformSampler.get_z_vals (ray_sampler.py:15-43).

    t_rand: optional externally-supplied U[0,1) jitter of shape
    (R, n_samples) — the common-random-numbers seam for paired
    cross-framework experiments (tools/chamfer_midscale.py --paired);
    when None the jitter is drawn from `rng` as usual."""
    R = ray_dirs.shape[0]
    near = jnp.full((R, 1), cfg.near, dtype=ray_dirs.dtype)
    if take_sphere_intersection:
        sph = get_sphere_intersections(cam_loc, ray_dirs,
                                       r=scene_bounding_sphere)
        # Degenerate geometry (ray missing/grazing the sphere) can
        # clamp the exit distance below `near`, which would make the
        # linspace DESCEND — downstream, merge_sorted_pairs requires
        # ascending z (the reference's torch.sort tolerated any
        # order). Pin far >= near: changes numerics only on rays
        # whose sample window was already degenerate.
        far_v = jnp.maximum(sph[:, 1:], near)
    else:
        far_v = jnp.full((R, 1), far, dtype=ray_dirs.dtype)

    t_vals = jnp.linspace(0.0, 1.0, n_samples, dtype=ray_dirs.dtype)
    z_vals = near * (1.0 - t_vals) + far_v * t_vals
    if training:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        if t_rand is None:
            t_rand = jax.random.uniform(rng, z_vals.shape,
                                        dtype=z_vals.dtype)
        z_vals = lower + (upper - lower) * t_rand.astype(z_vals.dtype)
    return z_vals


def _d_star(z_vals, sdf):
    """Per-interval min-distance bound d* (Theorem 1,
    ray_sampler.py:98-111)."""
    d = sdf
    dists = z_vals[:, 1:] - z_vals[:, :-1]
    a, b, c = dists, jnp.abs(d[:, :-1]), jnp.abs(d[:, 1:])
    first = a ** 2 + b ** 2 <= c ** 2
    second = a ** 2 + c ** 2 <= b ** 2
    s = (a + b + c) / 2.0
    area = s * (s - a) * (s - b) * (s - c)
    height = 2.0 * jnp.sqrt(jnp.maximum(area, 0.0)) / jnp.maximum(a, 1e-12)
    inner = (~first) & (~second) & (b + c - a > 0)
    d_star = jnp.where(first, b, 0.0)
    d_star = jnp.where(second, c, d_star)
    d_star = jnp.where(inner, height, d_star)
    # Zero out intervals where the SDF changes sign.
    same_sign = jnp.sign(d[:, 1:]) * jnp.sign(d[:, :-1]) == 1
    return jnp.where(same_sign, d_star, 0.0)


def _error_bound(beta, sdf, z_vals, dists, d_star):
    """Max per-ray opacity error bound (ray_sampler.py:221-229).
    beta: (R, 1)."""
    density = laplace_density(sdf, beta)
    shifted = jnp.concatenate(
        [jnp.zeros_like(dists[:, :1]), dists * density[:, :-1]], axis=-1)
    integral_estimation = jnp.cumsum(shifted, axis=-1)
    error_per_section = jnp.exp(-d_star / beta) * (dists ** 2) / (4 * beta ** 2)
    error_integral = jnp.cumsum(error_per_section, axis=-1)
    bound_opacity = (jnp.clip(jnp.exp(error_integral), max=1e6) - 1.0) \
        * jnp.exp(-integral_estimation[:, :-1])
    return jnp.max(bound_opacity, axis=-1)


def _weights(z_vals, sdf, beta):
    """alpha-compositing weights under per-ray beta
    (ray_sampler.py:126-132). Returns (weights, dists, transmittance)."""
    density = laplace_density(sdf, beta)
    dists = z_vals[:, 1:] - z_vals[:, :-1]
    dists_inf = jnp.concatenate(
        [dists, jnp.full_like(dists[:, :1], 1e10)], axis=-1)
    free_energy = dists_inf * density
    shifted = jnp.concatenate(
        [jnp.zeros_like(free_energy[:, :1]), free_energy[:, :-1]], axis=-1)
    alpha = 1.0 - jnp.exp(-free_energy)
    transmittance = jnp.exp(-jnp.cumsum(shifted, axis=-1))
    return alpha * transmittance, dists, transmittance


def error_bound_sample(rng, cfg: RaySamplerConfig, ray_dirs, cam_loc,
                       sdf_fn, beta0, *, n_iters: int, training: bool,
                       scene_bounding_sphere: float,
                       jitter=None) -> SamplerOutput:
    """ErrorBoundSampler.get_z_vals with a static iteration schedule.

    Args:
      sdf_fn: points (M, 3) -> sdf (M,) (no gradient needed; the
        reference wraps this eval in no_grad, ray_sampler.py:88-89).
      beta0: scalar current density beta (already stop-gradient'd).
      n_iters: static loop count; the reference uses 1 in training
        (fast=1, vsdf.py:205) and max_total_iters=5 at eval.
      jitter: optional common-random-numbers feed replacing every
        random draw this function makes — keys "t_rand" (R, N_eval)
        U[0,1), "u_final" (R, N_samples) U[0,1), "extra_idx"
        (N_extra,) int32 column picks, "eik_idx" (R, 1) int32. The
        torch reference consumes the SAME realizations at its
        matching sites (ray_sampler.py:39,170,201,211) in paired
        cross-framework experiments (tools/chamfer_midscale.py
        --paired). Only supported at the training fast=1 budget
        (n_iters == 1, where the draw schedule is static).
    """
    far = 2.0 * scene_bounding_sphere
    R = ray_dirs.shape[0]
    if jitter is not None:
        assert n_iters == 1 and training, \
            "jitter injection is defined for the training fast=1 path"
    k_uniform, k_final, k_extra, k_eik, k_bg = jax.random.split(rng, 5)

    def eval_sdf(z):
        pts = cam_loc[:, None, :] + z[..., None] * ray_dirs[:, None, :]
        return sdf_fn(pts.reshape(-1, 3)).reshape(z.shape)

    z_vals = uniform_z_vals(
        k_uniform, cfg, ray_dirs, cam_loc, far, cfg.N_samples_eval,
        training, cfg.inverse_sphere_bg, scene_bounding_sphere,
        t_rand=None if jitter is None else jitter["t_rand"])
    sdf = eval_sdf(z_vals)

    # Beta upper bound from Lemma 2 (ray_sampler.py:76-78).
    dists0 = z_vals[:, 1:] - z_vals[:, :-1]
    log_eps1 = math.log(cfg.eps + 1.0)
    bound = (1.0 / (4.0 * log_eps1)) * jnp.sum(dists0 ** 2, axis=-1)
    beta = jnp.sqrt(bound)

    def bisect_beta(z_vals, sdf, beta, d_star, dists):
        # Bisection line search for minimal beta with error <= eps
        # (ray_sampler.py:114-123).
        curr_error = _error_bound(beta0[None, None], sdf, z_vals, dists,
                                  d_star)
        beta = jnp.where(curr_error <= cfg.eps, beta0, beta)
        beta_lo = jnp.full_like(beta, beta0)
        beta_hi = beta
        for _ in range(cfg.beta_iters):
            beta_mid = 0.5 * (beta_lo + beta_hi)
            err = _error_bound(beta_mid[:, None], sdf, z_vals, dists, d_star)
            ok = err <= cfg.eps
            beta_hi = jnp.where(ok, beta_mid, beta_hi)
            beta_lo = jnp.where(ok, beta_lo, beta_mid)
        return beta_hi

    def dup(z_vals, sdf):
        K = cfg.N_samples_eval
        return (jnp.concatenate(
                    [z_vals, jnp.repeat(z_vals[:, -1:], K, axis=1)],
                    axis=-1),
                jnp.concatenate(
                    [sdf, jnp.repeat(sdf[:, -1:], K, axis=1)],
                    axis=-1))

    def upsample_iter(z_vals, sdf, beta_in, converged):
        """One non-final iteration: bisect, test convergence, refine.
        Runs only for rays still in play — the caller skips it entirely
        once `converged` is set (the reference exits its while loop,
        ray_sampler.py:137-139, so nothing after that point is
        computed there either)."""
        d_star = _d_star(z_vals, sdf)
        dists = z_vals[:, 1:] - z_vals[:, :-1]
        beta = bisect_beta(z_vals, sdf, beta_in, d_star, dists)
        _, _, transmittance = _weights(z_vals, sdf, beta[:, None])

        # The reference's global early exit: once every ray's bisected
        # beta is at beta0 (`not_converge = beta.max() > beta0`), no
        # further samples are added. Zero-length duplicates of the far
        # sample leave every downstream integral/pdf unchanged.
        conv2 = converged | (jnp.max(beta) <= beta0)

        def refine(z_vals, sdf):
            # Sample proportional to the error bound
            # (ray_sampler.py:139-151).
            error_per_section = (jnp.exp(-d_star / beta[:, None])
                                 * (dists ** 2) / (4 * beta[:, None] ** 2))
            error_integral = jnp.cumsum(error_per_section, axis=-1)
            bound_opacity = \
                (jnp.clip(jnp.exp(error_integral), max=1e6) - 1.0) \
                * transmittance[:, :-1]
            pdf = bound_opacity + cfg.add_tiny
            cdf = pdf_to_cdf(pdf)
            u = jnp.broadcast_to(
                jnp.linspace(0.0, 1.0, cfg.N_samples_eval),
                (R, cfg.N_samples_eval))
            new_samples = sample_pdf_from_cdf(z_vals, cdf, u)
            new_sdf = eval_sdf(new_samples)
            # both sequences are sorted -> stable rank-merge instead
            # of a bitonic argsort (bit-identical; see
            # merge_sorted_pairs)
            return merge_sorted_pairs(z_vals, sdf, new_samples, new_sdf)

        z2, s2 = jax.lax.cond(conv2, dup, refine, z_vals, sdf)
        return z2, s2, beta, conv2

    def final_pdf(z_vals, sdf, beta_in):
        """Final-iteration weights -> pdf (ray_sampler.py:154-163)."""
        d_star = _d_star(z_vals, sdf)
        dists = z_vals[:, 1:] - z_vals[:, :-1]
        beta = bisect_beta(z_vals, sdf, beta_in, d_star, dists)
        weights, _, _ = _weights(z_vals, sdf, beta[:, None])
        return weights[..., :-1] + 1e-5

    def final_pdf_converged(z_vals, sdf, beta_in):
        """Once globally converged the bisection is pinned at beta0
        (`curr_error <= eps` for every ray is exactly the convergence
        test), so the final weights are just _weights at beta0 — skip
        the d*/bisection machinery the reference never runs after its
        loop exits."""
        del beta_in
        weights, _, _ = _weights(z_vals, sdf,
                                 jnp.broadcast_to(beta0, (R,))[:, None])
        return weights[..., :-1] + 1e-5

    samples = None
    converged = jnp.asarray(False)
    conv_iter = jnp.asarray(n_iters, jnp.int32)
    for it in range(n_iters):
        last = it == n_iters - 1
        if not last:
            if it == 0:
                # `converged` is still the literal False — no cond.
                z_vals, sdf, beta, converged = upsample_iter(
                    z_vals, sdf, beta, converged)
            else:
                def skip_iter(z_vals, sdf, beta, converged):
                    z2, s2 = dup(z_vals, sdf)
                    return z2, s2, beta, converged

                z_vals, sdf, beta, converged = jax.lax.cond(
                    converged, skip_iter, upsample_iter,
                    z_vals, sdf, beta, converged)
            conv_iter = jnp.where((conv_iter == n_iters) & converged,
                                  it + 1, conv_iter)
        else:
            if n_iters == 1:
                pdf = final_pdf(z_vals, sdf, beta)
            else:
                pdf = jax.lax.cond(converged, final_pdf_converged,
                                   final_pdf, z_vals, sdf, beta)
            cdf = pdf_to_cdf(pdf)
            if jitter is not None:
                u = jitter["u_final"]
            elif training:
                u = jax.random.uniform(k_final, (R, cfg.N_samples))
            else:
                u = jnp.broadcast_to(
                    jnp.linspace(0.0, 1.0, cfg.N_samples), (R, cfg.N_samples))
            samples = sample_pdf_from_cdf(z_vals, cdf, u)

    # Extra samples + near/far (ray_sampler.py:195-208).
    near_col = jnp.full((R, 1), cfg.near, dtype=z_vals.dtype)
    if cfg.inverse_sphere_bg:
        far_col = get_sphere_intersections(
            cam_loc, ray_dirs, r=scene_bounding_sphere)[:, 1:]
    else:
        far_col = jnp.full((R, 1), far, dtype=z_vals.dtype)

    K = z_vals.shape[1]
    if cfg.N_samples_extra > 0:
        if jitter is not None:
            idx = jitter["extra_idx"]
        elif training:
            idx = jax.random.permutation(k_extra, K)[: cfg.N_samples_extra]
        else:
            idx = jnp.linspace(0, K - 1, cfg.N_samples_extra).astype(jnp.int32)
        z_extra = jnp.concatenate([near_col, far_col, z_vals[:, idx]], axis=-1)
    else:
        z_extra = jnp.concatenate([near_col, far_col], axis=-1)

    z_final = jnp.sort(jnp.concatenate([samples, z_extra], axis=-1), axis=-1)

    # Random near-surface z for the eikonal loss (ray_sampler.py:210-212).
    if jitter is not None:
        eik_idx = jitter["eik_idx"]
    else:
        eik_idx = jax.random.randint(k_eik, (R, 1), 0, z_final.shape[-1])
    z_samples_eik = jnp.take_along_axis(z_final, eik_idx, axis=-1)

    z_bg = None
    if cfg.inverse_sphere_bg:
        # Background samples in inverted-sphere coords
        # (ray_sampler.py:214-217): uniform in [0,1], scaled by 1/R.
        bg_cfg = RaySamplerConfig(near=0.0)
        z_bg = uniform_z_vals(
            k_bg, bg_cfg, ray_dirs, cam_loc, 1.0,
            cfg.N_samples_inverse_sphere, training, False, 1.0)
        z_bg = z_bg * (1.0 / scene_bounding_sphere)

    return SamplerOutput(z_final, z_samples_eik, z_bg, conv_iter)
