"""Quick full-step timing at production shapes (subset of
profile_step.py; same scan/ablation methodology).

Usage: python tools/profile_quick.py [unroll]
"""

import sys
import time

import jax
import numpy as np

from tools.profile_step import N_STEPS, TRIALS, build_inputs
from s_volsdf_tpu.engine.train_step import guarded_update, sample_train_batch, _loss_fn


def main():
    cfg, tx, state, scene_dev, packed = build_inputs()
    if "flat" in sys.argv:
        import optax
        from s_volsdf_tpu.engine.train_step import init_train_state
        print("flat-optimizer=on")
        tx = optax.flatten(tx)
        state = init_train_state(cfg, state.params, tx)
    n_views, img_res = 3, (cfg.max_h, cfg.max_w)
    n_rays = cfg.train.num_pixels

    if "noeik" in sys.argv:
        # eikonal_weight=0 -> XLA folds the 0-weight term away and
        # DCEs grad_theta: measures the eikonal double-backprop cost.
        import dataclasses
        print("eikonal=off")
        cfg.loss = dataclasses.replace(cfg.loss, eikonal_weight=0.0)
    if "act32" in sys.argv:
        # A/B switch: disable the (default-on) bf16 training
        # activations to measure their contribution in isolation.
        import dataclasses
        print("act32=on (train_activation_dtype=float32)")
        cfg.train = dataclasses.replace(
            cfg.train, train_activation_dtype="float32")
    remat = "remat" in sys.argv
    loss_fn = _loss_fn
    if remat:
        print("remat=on")
        import functools
        loss_fn = jax.checkpoint(_loss_fn, static_argnums=(1,))
    pol_name = next((a.split("=", 1)[1] for a in sys.argv
                     if a.startswith("rematpol=")), None)
    if pol_name:
        # Selective rematerialization (VERDICT r3 item 5a): keep the
        # MXU dot outputs as residuals but recompute the elementwise
        # chains (softplus/PE/density) in the backward instead of
        # loading their saved bf16 residuals from HBM.
        pols = jax.checkpoint_policies
        policy = {
            "dots": pols.dots_saveable,
            "dots_nobatch": pols.dots_with_no_batch_dims_saveable,
            "nothing": pols.nothing_saveable,
        }[pol_name]
        print(f"rematpol={pol_name}")
        loss_fn = jax.checkpoint(_loss_fn, static_argnums=(1,),
                                 policy=policy)

    def body(aux, st, rng):
        scene, vols = aux
        batch, k = sample_train_batch(scene, rng, n_views=n_views,
                                      img_res=img_res, n_rays=n_rays)
        grads, loss_out = jax.grad(loss_fn, has_aux=True)(
            st.params, cfg, batch, k, vols, st.iter_step)
        st2, loss_out = guarded_update(tx, st, grads, loss_out)
        return st2, loss_out.loss

    unroll = next((int(a) for a in sys.argv[1:] if a.isdigit()), 1)
    print(f"unroll={unroll}")
    fn = jax.jit(lambda a, s, rngs: jax.lax.scan(
        lambda c, r: body(a, c, r), s, rngs, unroll=unroll))
    aux = (scene_dev, packed)
    rngs = jax.random.split(jax.random.PRNGKey(2), N_STEPS)
    if "cost" in sys.argv:
        ca = fn.lower(aux, state, rngs).compile().cost_analysis()
        for k in ("flops", "bytes accessed"):
            if k in ca:
                print(f"cost_analysis[{k}] = {ca[k]/N_STEPS:,.0f} /step")
        for k, v in sorted(ca.items()):
            if k.startswith("bytes accessed") and k != "bytes accessed":
                print(f"  {k} = {v/N_STEPS:,.0f} /step")
    out = fn(aux, state, rngs)
    print("losses[:3] =", np.asarray(out[1][:3]))
    t0 = time.perf_counter()
    for t in range(TRIALS):
        out = fn(aux, state,
                 jax.random.split(jax.random.PRNGKey(3 + t), N_STEPS))
        np.asarray(out[1])
    ms = (time.perf_counter() - t0) / (TRIALS * N_STEPS) * 1000.0
    print(f"full step: {ms:.2f} ms  -> {n_rays/(ms/1000):,.0f} rays/s "
          f"({n_rays/(ms/1000)/1740.0:.2f}x baseline)")


if __name__ == "__main__":
    main()
