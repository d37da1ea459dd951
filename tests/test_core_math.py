"""Golden/property tests for the VolSDF math core."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s_volsdf_tpu.config import ModelConfig
from s_volsdf_tpu.models.density import (get_beta, init_laplace_density,
                                         laplace_density)
from s_volsdf_tpu.models.embedder import embed_dim, positional_encoding
from s_volsdf_tpu.models.network import (init_volsdf_params, sdf_feat_grad,
                                         sdf_values, volume_rendering)
from s_volsdf_tpu.ops.inverse_cdf import pdf_to_cdf, sample_pdf_from_cdf


def test_positional_encoding_shape_and_values():
    x = jnp.asarray([[0.5, -0.25, 1.0]])
    enc = positional_encoding(x, multires=6)
    assert enc.shape == (1, embed_dim(6, 3))
    # First 3 dims are the identity.
    np.testing.assert_allclose(enc[0, :3], x[0], rtol=1e-6)
    # Next block is sin(2^0 x) then cos(2^0 x).
    np.testing.assert_allclose(enc[0, 3:6], np.sin(x[0]), rtol=1e-6)
    np.testing.assert_allclose(enc[0, 6:9], np.cos(x[0]), rtol=1e-6)
    # Last block: cos(2^5 x).
    np.testing.assert_allclose(enc[0, -3:], np.cos(32.0 * x[0]), rtol=1e-5)


def test_laplace_density_matches_formula():
    params = init_laplace_density(0.1)
    beta = get_beta(params, 1e-4)
    sdf = jnp.asarray([-0.5, -0.1, 0.0, 0.1, 0.5])
    got = laplace_density(sdf, beta)
    b = float(beta)
    expected = (1 / b) * (0.5 + 0.5 * np.sign(sdf) * np.expm1(-np.abs(sdf) / b))
    np.testing.assert_allclose(got, expected, rtol=1e-5)
    # CDF property: density*beta in (0, 1), monotone decreasing in sdf.
    assert np.all(np.diff(got) < 0)


def test_geometric_init_approximates_sphere():
    """With geometric init, sdf(x) ~ ||x|| - bias (VolSDF init scheme)."""
    cfg = ModelConfig()
    params = init_volsdf_params(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(1), (256, 3)) * 0.8
    sdf = sdf_values(params["sdf"], cfg, pts, bounding_sphere=0.0)
    r = jnp.linalg.norm(pts, axis=-1)
    expected = r - cfg.implicit.bias
    err = np.abs(np.asarray(sdf - expected))
    # The torch reference init gives mean |err| ~= 0.16 on the same
    # distribution (verified against /root/reference implementation).
    assert err.mean() < 0.3, f"geometric init off: mean err {err.mean()}"


def test_eikonal_property_of_init():
    """Geometric init should give ||grad sdf|| ~ 1 away from origin."""
    cfg = ModelConfig()
    params = init_volsdf_params(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(2), (128, 3))
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True) * 1.2
    _, _, grads = sdf_feat_grad(params["sdf"], cfg, pts, bounding_sphere=0.0)
    norms = np.asarray(jnp.linalg.norm(grads, axis=-1))
    assert np.abs(norms - 1.0).mean() < 0.2


def test_volume_rendering_opaque_wall():
    """A huge density spike at one sample should put all weight there."""
    R, S = 4, 32
    z = jnp.broadcast_to(jnp.linspace(0.1, 3.0, S), (R, S))
    density = jnp.zeros((R, S)).at[:, 16].set(1e4)
    w = volume_rendering(z, density)
    assert w.shape == (R, S)
    # Weight mass concentrated at/after the wall.
    np.testing.assert_allclose(np.asarray(w[:, :16]).sum(), 0.0, atol=1e-5)
    assert np.all(np.asarray(w[:, 16]) > 0.99)


def test_volume_rendering_transmittance_monotone():
    R, S = 2, 64
    z = jnp.broadcast_to(jnp.linspace(0.1, 3.0, S), (R, S))
    density = jax.random.uniform(jax.random.PRNGKey(0), (R, S)) * 5
    w = volume_rendering(z, density)
    # weights sum to 1 - final transmittance <= 1
    assert np.all(np.asarray(w.sum(-1)) <= 1.0 + 1e-5)
    assert np.all(np.asarray(w) >= 0)


def test_sample_pdf_uniform_recovers_linspace():
    """Inverting a uniform CDF with linspace quantiles gives linspace."""
    R, K, N = 3, 65, 17
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, K), (R, K))
    pdf = jnp.ones((R, K - 1))
    cdf = pdf_to_cdf(pdf)
    u = jnp.broadcast_to(jnp.linspace(0.0, 0.999, N), (R, N))
    s = sample_pdf_from_cdf(bins, cdf, u)
    np.testing.assert_allclose(np.asarray(s[0]), np.asarray(u[0]), atol=1e-4)


def test_sample_pdf_concentrates_on_peak():
    R, K = 1, 33
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, K), (R, K))
    pdf = jnp.full((R, K - 1), 1e-6).at[:, 16].set(1.0)
    cdf = pdf_to_cdf(pdf)
    u = jax.random.uniform(jax.random.PRNGKey(0), (R, 64))
    s = sample_pdf_from_cdf(bins, cdf, u)
    # Peak bin is [0.5, 0.53125]; nearly all samples land inside.
    frac = np.mean((np.asarray(s) >= 0.49) & (np.asarray(s) <= 0.54))
    assert frac > 0.95


def test_sample_pdf_masked_matches_gather_exactly():
    """The masked-reduction fast path is BIT-identical to the literal
    searchsorted+gather form (the reference's index semantics) on
    sorted bins — random CDFs, flat tie segments, and edge quantiles
    u=0 / u=1."""
    from s_volsdf_tpu.ops.inverse_cdf import sample_pdf_from_cdf_gather

    R, K, N = 64, 128, 48
    key = jax.random.PRNGKey(7)
    kz, kp, ku = jax.random.split(key, 3)
    bins = jnp.sort(jax.random.uniform(kz, (R, K), minval=0.5, maxval=4.0),
                    axis=-1)
    u = jax.random.uniform(ku, (R, N))
    u = u.at[:, 0].set(0.0).at[:, 1].set(1.0)

    # random pdf
    cdf = pdf_to_cdf(jax.random.uniform(kp, (R, K - 1)) + 1e-5)
    a = np.asarray(sample_pdf_from_cdf_gather(bins, cdf, u))
    b = np.asarray(sample_pdf_from_cdf(bins, cdf, u))
    assert np.array_equal(a, b)

    # flat tie segments in the cdf (zero-mass bins)
    pdf = jnp.zeros((R, K - 1)).at[:, 40:].set(1.0) + 1e-12
    cdf = pdf_to_cdf(pdf)
    a = np.asarray(sample_pdf_from_cdf_gather(bins, cdf, u))
    b = np.asarray(sample_pdf_from_cdf(bins, cdf, u))
    assert np.array_equal(a, b)

    # a NaN pdf row poisons that row's samples in BOTH forms
    pdf = jax.random.uniform(kp, (R, K - 1)).at[3, 5].set(jnp.nan) + 1e-5
    cdf = pdf_to_cdf(pdf)
    a = np.asarray(sample_pdf_from_cdf_gather(bins, cdf, u))
    b = np.asarray(sample_pdf_from_cdf(bins, cdf, u))
    assert np.all(np.isnan(a[3])) and np.all(np.isnan(b[3]))
    assert np.array_equal(np.delete(a, 3, 0), np.delete(b, 3, 0))
