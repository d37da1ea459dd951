"""Isolate the sampler's non-MLP glue cost at production shapes.

Times three scanned variants (512 rays, N_samples_eval=128, f32):
  1. full sampler (error_bound_sample, training, n_iters=1) with a
     FREE sdf_fn (identity-ish) -> total glue incl. uniform/extra/sort
  2. final_pdf machinery alone (d_star + 11-eval beta bisection +
     weights) on random sorted z/sdf
  3. the bisection loop alone

Usage: python -m tools.probe_sampler_glue
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from tools.profile_step import N_STEPS, TRIALS, build_inputs
from s_volsdf_tpu.models import sampler as S


def timed(fn, args, label):
    f = jax.jit(fn)
    rngs = jax.random.split(jax.random.PRNGKey(2), N_STEPS)
    out = f(*args, rngs)
    np.asarray(out)
    t0 = time.perf_counter()
    for t in range(TRIALS):
        out = f(*args, jax.random.split(jax.random.PRNGKey(3 + t), N_STEPS))
        np.asarray(out)
    ms = (time.perf_counter() - t0) / (TRIALS * N_STEPS) * 1000.0
    print(f"{label}: {ms:.3f} ms/step")
    return ms


def main():
    cfg, tx, state, scene_dev, packed = build_inputs()
    scfg = cfg.model.sampler
    R, K = cfg.train.num_pixels, scfg.N_samples_eval
    beta0 = jnp.asarray(0.1)

    ray_dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (R, 1))
    cam_loc = jnp.tile(jnp.asarray([[0.0, 0.0, -2.0]]), (R, 1))

    def free_sdf(pts):  # ~zero-cost sdf: one multiply-add chain
        return pts[:, 0] * 0.25 + 0.3

    def full_sampler(_, rngs):
        def body(c, r):
            out = S.error_bound_sample(
                r, scfg, ray_dirs, cam_loc, free_sdf, beta0,
                n_iters=1, training=True,
                scene_bounding_sphere=cfg.model.scene_bounding_sphere)
            return c + jnp.sum(out.z_vals), jnp.max(out.z_vals)
        return jax.lax.scan(body, jnp.zeros(()), rngs)[0]

    def rand_zs(r):
        kz, ks = jax.random.split(r)
        z = jnp.sort(jax.random.uniform(kz, (R, K), minval=0.5, maxval=4.0),
                     axis=-1)
        sdf = jax.random.normal(ks, (R, K)) * 0.3
        return z, sdf

    def final_pdf_only(_, rngs):
        def body(c, r):
            z, sdf = rand_zs(r)
            d_star = S._d_star(z, sdf)
            dists = z[:, 1:] - z[:, :-1]
            bound = (1.0 / (4.0 * jnp.log(jnp.asarray(scfg.eps + 1.0)))) \
                * jnp.sum(dists ** 2, axis=-1)
            beta = jnp.sqrt(bound)
            curr = S._error_bound(beta0[None, None], sdf, z, dists, d_star)
            beta = jnp.where(curr <= scfg.eps, beta0, beta)
            lo = jnp.full_like(beta, beta0)
            hi = beta
            for _ in range(scfg.beta_iters):
                mid = 0.5 * (lo + hi)
                err = S._error_bound(mid[:, None], sdf, z, dists, d_star)
                ok = err <= scfg.eps
                hi = jnp.where(ok, mid, hi)
                lo = jnp.where(ok, lo, mid)
            w, _, _ = S._weights(z, sdf, hi[:, None])
            return c + jnp.sum(w), jnp.max(w)
        return jax.lax.scan(body, jnp.zeros(()), rngs)[0]

    def bisect_only(_, rngs):
        def body(c, r):
            z, sdf = rand_zs(r)
            d_star = S._d_star(z, sdf)
            dists = z[:, 1:] - z[:, :-1]
            hi = jnp.full((R,), 0.5)
            lo = jnp.full((R,), float(beta0))
            for _ in range(scfg.beta_iters):
                mid = 0.5 * (lo + hi)
                err = S._error_bound(mid[:, None], sdf, z, dists, d_star)
                ok = err <= scfg.eps
                hi = jnp.where(ok, mid, hi)
                lo = jnp.where(ok, lo, mid)
            return c + jnp.sum(hi), jnp.max(hi)
        return jax.lax.scan(body, jnp.zeros(()), rngs)[0]

    print(f"R={R} K={K} beta_iters={scfg.beta_iters}")
    timed(full_sampler, (jnp.zeros(()),), "full sampler, free sdf (glue total)")
    timed(final_pdf_only, (jnp.zeros(()),), "final_pdf machinery")
    timed(bisect_only, (jnp.zeros(()),), "bisection loop only")




def main2():
    """Break the remaining glue into pieces."""
    cfg, tx, state, scene_dev, packed = build_inputs()
    scfg = cfg.model.sampler
    R, K = cfg.train.num_pixels, scfg.N_samples_eval
    N = scfg.N_samples

    def piece(label, body):
        def fn(_, rngs):
            return jax.lax.scan(body, jnp.zeros(()), rngs)[0]
        timed(fn, (jnp.zeros(()),), label)

    def rand_z(r, n=K):
        return jnp.sort(jax.random.uniform(r, (R, n), minval=0.5,
                                           maxval=4.0), axis=-1)

    from s_volsdf_tpu.ops.inverse_cdf import pdf_to_cdf, sample_pdf_from_cdf

    def inv_cdf_body(c, r):
        kz, kp, ku = jax.random.split(r, 3)
        z = rand_z(kz)
        pdf = jax.random.uniform(kp, (R, K - 1)) + 1e-5
        cdf = pdf_to_cdf(pdf)
        u = jax.random.uniform(ku, (R, N))
        s = sample_pdf_from_cdf(z, cdf, u)
        return c + jnp.sum(s), jnp.max(s)

    def sort_body(c, r):
        z = jax.random.uniform(r, (R, N + scfg.N_samples_extra + 2))
        s = jnp.sort(z, axis=-1)
        return c + jnp.sum(s), jnp.max(s)

    def perm_body(c, r):
        idx = jax.random.permutation(r, K)[: scfg.N_samples_extra]
        return c + jnp.sum(idx), jnp.max(idx)

    def rng_body(c, r):
        ks = jax.random.split(r, 5)
        a = jax.random.uniform(ks[0], (R, K))
        b = jax.random.uniform(ks[1], (R, N))
        return c + jnp.sum(a) + jnp.sum(b), jnp.max(a)

    def uniform_body(c, r):
        ray_dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (R, 1))
        cam_loc = jnp.tile(jnp.asarray([[0.0, 0.0, -2.0]]), (R, 1))
        z = S.uniform_z_vals(r, scfg, ray_dirs, cam_loc, 4.0, K, True,
                             False, cfg.model.scene_bounding_sphere)
        return c + jnp.sum(z), jnp.max(z)

    def pts_body(c, r):
        kz, kd = jax.random.split(r)
        z = rand_z(kz)
        d = jax.random.normal(kd, (R, 3))
        pts = d[:, None, :] * z[..., None] + d[:, None, :]
        s = pts.reshape(-1, 3)[:, 0] * 0.25
        return c + jnp.sum(s), jnp.max(s)

    print("--- pieces ---")
    piece("inverse CDF (pdf->cdf + sample 64 from 128)", inv_cdf_body)
    piece(f"final sort (512x{N + scfg.N_samples_extra + 2})", sort_body)
    piece("permutation(128)", perm_body)
    piece("rng uniforms", rng_body)
    piece("uniform_z_vals", uniform_body)
    piece("point gen 65k", pts_body)


if __name__ == "__main__":
    main()
    main2()
