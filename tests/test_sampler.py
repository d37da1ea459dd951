"""Tests for the error-bound ray sampler under static shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from s_volsdf_tpu.config import RaySamplerConfig
from s_volsdf_tpu.models.sampler import (error_bound_sample, uniform_z_vals)


def _rays(R=8):
    cam = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -2.5]), (R, 3))
    # Rays fanning toward the origin.
    t = jnp.linspace(-0.2, 0.2, R)
    dirs = jnp.stack([t, jnp.zeros_like(t), jnp.ones_like(t)], axis=-1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return dirs, cam


def sphere_sdf(pts, radius=0.7):
    return jnp.linalg.norm(pts, axis=-1) - radius


def test_uniform_sampler_bounds_and_sorted():
    cfg = RaySamplerConfig()
    dirs, cam = _rays()
    z = uniform_z_vals(jax.random.PRNGKey(0), cfg, dirs, cam, 6.0, 128,
                       False, False, 3.0)
    assert z.shape == (8, 128)
    assert np.all(np.diff(np.asarray(z), axis=-1) >= 0)
    np.testing.assert_allclose(np.asarray(z[:, 0]), cfg.near, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z[:, -1]), 6.0, atol=1e-5)


def test_error_bound_sampler_shapes_train():
    """Train mode (fast=1): final count = N_samples + N_extra + 2
    (ray_sampler.py final concat; 64+32+2 = 98)."""
    cfg = RaySamplerConfig()
    dirs, cam = _rays()
    out = error_bound_sample(
        jax.random.PRNGKey(0), cfg, dirs, cam, sphere_sdf,
        jnp.asarray(0.1), n_iters=1, training=True,
        scene_bounding_sphere=3.0)
    assert out.z_vals.shape == (8, cfg.N_samples + cfg.N_samples_extra + 2)
    assert np.all(np.diff(np.asarray(out.z_vals), axis=-1) >= 0)
    assert out.z_samples_eik.shape == (8, 1)
    assert out.z_vals_bg is None


def test_error_bound_sampler_eval_iters():
    """Eval mode: 5 refinement iterations, same final static shape."""
    cfg = RaySamplerConfig()
    dirs, cam = _rays()
    out = error_bound_sample(
        jax.random.PRNGKey(0), cfg, dirs, cam, sphere_sdf,
        jnp.asarray(0.1), n_iters=5, training=False,
        scene_bounding_sphere=3.0)
    assert out.z_vals.shape == (8, 98)
    z = np.asarray(out.z_vals)
    assert np.all(np.diff(z, axis=-1) >= 0)


def test_early_exit_duplicates_preserve_distribution():
    """Global early exit (the reference's `not_converge` loop break,
    ray_sampler.py:134-139): with eps huge the sampler converges on the
    very first iteration, so all later iterations only append
    zero-measure duplicates and skip every per-iteration computation
    (d*, beta bisection, refine MLP evals). The final sample
    distribution must match a run that never entered the skip path
    (n_iters=1, which computes the final pdf on the raw 128-sample set
    with the full bisection) up to the documented 1e-5 pdf floor on
    duplicated bins.
    """
    import dataclasses
    cfg = dataclasses.replace(RaySamplerConfig(), eps=1e6,
                              N_samples_extra=0)
    dirs, cam = _rays()
    outs = {}
    for n in (1, 5):
        outs[n] = error_bound_sample(
            jax.random.PRNGKey(0), cfg, dirs, cam, sphere_sdf,
            jnp.asarray(0.1), n_iters=n, training=False,
            scene_bounding_sphere=3.0)
    z1 = np.asarray(outs[1].z_vals)
    z5 = np.asarray(outs[5].z_vals)
    assert z1.shape == z5.shape == (8, cfg.N_samples + 2)
    # Same eval linspace-u inverse-CDF draw; the only drift source is
    # the duplicated bins' 1e-5 pdf floor shifting quantiles slightly.
    np.testing.assert_allclose(z5, z1, atol=0.05)
    assert not np.allclose(z5, z1, atol=0.0), \
        "expected the documented pdf-floor drift (else the skip path " \
        "probably never ran)"


def test_sampler_concentrates_near_surface():
    """Samples should cluster around the sphere intersection."""
    cfg = RaySamplerConfig()
    dirs, cam = _rays(R=4)
    out = error_bound_sample(
        jax.random.PRNGKey(1), cfg, dirs, cam, sphere_sdf,
        jnp.asarray(0.02), n_iters=5, training=False,
        scene_bounding_sphere=3.0)
    z = np.asarray(out.z_vals)
    # Ray 0 hits the sphere around t = 2.5 - 0.7 = 1.8 (center ray ~).
    # Count samples within +-0.3 of the surface band [1.7, 2.0].
    frac_near = np.mean((z > 1.4) & (z < 2.4), axis=-1)
    assert frac_near.mean() > 0.4, frac_near


def test_sampler_bg_samples():
    cfg = RaySamplerConfig(inverse_sphere_bg=True,
                           N_samples_inverse_sphere=32, add_tiny=1e-6)
    dirs, cam = _rays()
    out = error_bound_sample(
        jax.random.PRNGKey(0), cfg, dirs, cam, sphere_sdf,
        jnp.asarray(0.1), n_iters=1, training=True,
        scene_bounding_sphere=3.0)
    assert out.z_vals_bg.shape == (8, 32)
    bg = np.asarray(out.z_vals_bg)
    assert bg.min() >= 0.0 and bg.max() <= 1.0 / 3.0 + 1e-6


def test_merge_sorted_pairs_matches_stable_argsort():
    """Rank-merge == stable argsort of the concatenation, including
    exact ties within and across the two inputs."""
    import numpy as np

    from s_volsdf_tpu.models.sampler import merge_sorted_pairs

    rng = np.random.default_rng(0)
    for trial in range(5):
        R, n1, n2 = 7, 13, 9
        za = np.sort(rng.integers(0, 8, (R, n1)).astype(np.float32), -1)
        zb = np.sort(rng.integers(0, 8, (R, n2)).astype(np.float32), -1)
        if trial == 3:          # fully-NaN rays (missed bounding sphere)
            za[:2] = np.nan
            zb[:2] = np.nan
        if trial == 4:          # NaN tails after an ascending prefix
            za[:, -3:] = np.nan
            zb[:, -2:] = np.nan
        sa = rng.normal(size=(R, n1)).astype(np.float32)
        sb = rng.normal(size=(R, n2)).astype(np.float32)
        zm, sm = merge_sorted_pairs(jnp.asarray(za), jnp.asarray(sa),
                                    jnp.asarray(zb), jnp.asarray(sb))
        z_cat = np.concatenate([za, zb], -1)
        s_cat = np.concatenate([sa, sb], -1)
        order = np.argsort(z_cat, -1, kind="stable")
        np.testing.assert_array_equal(np.asarray(zm),
                                      np.take_along_axis(z_cat, order, -1))
        np.testing.assert_array_equal(np.asarray(sm),
                                      np.take_along_axis(s_cat, order, -1))


def test_inverse_cdf_ascending_u_gives_sorted_samples():
    """merge_sorted_pairs' precondition: inverse-CDF samples at
    ascending quantiles are non-decreasing, for arbitrary pdfs
    including zero-mass and near-degenerate segments."""
    import numpy as np

    from s_volsdf_tpu.ops.inverse_cdf import pdf_to_cdf, \
        sample_pdf_from_cdf

    rng = np.random.default_rng(1)
    R, K, N = 32, 65, 48
    bins = np.sort(rng.uniform(0, 5, (R, K)).astype(np.float32), -1)
    pdf = rng.uniform(0, 1, (R, K - 1)).astype(np.float32)
    pdf[:, ::3] = 0.0                      # zero-mass segments
    pdf[:4] = 1e-9                         # near-degenerate rays
    cdf = pdf_to_cdf(jnp.asarray(pdf) + 1e-5)
    u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, N), (R, N))
    s = np.asarray(sample_pdf_from_cdf(jnp.asarray(bins), cdf, u))
    assert np.all(np.diff(s, axis=-1) >= 0)


def test_sampler_masked_invcdf_matches_gather_end_to_end(monkeypatch):
    """The gather-free inverse CDF leaves the FULL sampler bit-identical
    — train (n_iters=1) and eval (n_iters=5, exercising refine-merge
    with the masked op at every iteration)."""
    import s_volsdf_tpu.models.sampler as samp
    from s_volsdf_tpu.ops.inverse_cdf import sample_pdf_from_cdf_gather

    cfg = RaySamplerConfig()
    dirs, cam = _rays(R=16)
    beta0 = jnp.asarray(0.1)

    def run():
        outs = []
        for n_iters, training in ((1, True), (5, False)):
            o = error_bound_sample(
                jax.random.PRNGKey(3), cfg, dirs, cam, sphere_sdf,
                beta0, n_iters=n_iters, training=training,
                scene_bounding_sphere=3.0)
            outs.append((np.asarray(o.z_vals), np.asarray(o.z_samples_eik)))
        return outs

    fast = run()
    monkeypatch.setattr(samp, "sample_pdf_from_cdf",
                        sample_pdf_from_cdf_gather)
    ref = run()
    for (za, ea), (zb, eb) in zip(fast, ref):
        assert np.array_equal(za, zb)
        assert np.array_equal(ea, eb)
