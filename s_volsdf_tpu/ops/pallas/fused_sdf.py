"""Fused SDF-MLP forward (Pallas) — MEASURED SLOWER THAN XLA; kept as
a documented experiment, default OFF.

Hypothesis: the sampler's no-grad SDF sweep (65k points x 9 layers,
ray_sampler.py:88-89) pays per-layer HBM round-trips under XLA, so a
kernel holding weights + activations in VMEM should win.

Measured on v5e (512x128 points, production 8x256 MLP): XLA 2.7 ms,
this kernel 8.5 ms at BLOCK=512 (small per-program matmuls underuse
the MXU) and VMEM-OOM at BLOCK=2048 (Mosaic stacks all 9 layer
temporaries, ~19 MB > 16 MB). XLA's conv/matmul pipeline already fuses
and overlaps these shapes well — the kernel stays for infrastructure
(correctness-tested in interpret mode) and as a base for future
block-pipelined variants, but `fused_sdf_values` is NOT wired into the
sampler.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from s_volsdf_tpu.config import ModelConfig

BLOCK = 512


def normalized_weights(sdf_params: List[dict]) -> List[Tuple]:
    """Materialize weight-norm layers to plain (W, b) pairs."""
    out = []
    for p in sdf_params:
        if "v" in p:
            v = p["v"]
            w = p["g"] * v / jnp.linalg.norm(v, axis=0, keepdims=True)
        else:
            w = p["w"]
        out.append((w, p["b"]))
    return out


def supported(cfg: ModelConfig) -> bool:
    """Kernel covers the production config family: 3-D input with PE,
    uniform hidden width, at most one skip junction."""
    imp = cfg.implicit
    return (imp.d_in == 3 and imp.multires > 0
            and len(set(imp.dims)) == 1 and len(imp.skip_in) <= 1)


def _kernel(cfg: ModelConfig, n_layers: int, bounding_sphere: float,
            pts_ref, *refs):
    from jax.experimental import pallas as pl  # noqa: F401

    imp = cfg.implicit
    ws = refs[:n_layers]
    bs = refs[n_layers:2 * n_layers]
    out_ref = refs[2 * n_layers]

    x = pts_ref[:]                                   # (B, 3)
    # Positional encoding with 2D ops only (Mosaic cannot shape-cast
    # rank-4 vectors); octave scales are python floats (static).
    pieces = [x]
    for k in range(imp.multires):
        xk = x * float(2.0 ** k)
        pieces.append(jnp.sin(xk))
        pieces.append(jnp.cos(xk))
    inp = jnp.concatenate(pieces, axis=-1)           # (B, 3*(1+2F))

    inv_sqrt2 = 0.7071067811865475
    h = inp
    for l in range(n_layers):
        if l in imp.skip_in:
            h = jnp.concatenate([h, inp], axis=-1) * inv_sqrt2
        h = jnp.dot(h, ws[l][:], preferred_element_type=jnp.float32) \
            + bs[l][:]
        if l < n_layers - 1:
            h = jax.nn.softplus(100.0 * h) / 100.0

    sdf = h[:, :1]
    if bounding_sphere > 0.0:
        r = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
        sdf = jnp.minimum(sdf, imp.sphere_scale * (bounding_sphere - r))
    # The output lives in VMEM as one (n_blocks, BLOCK) buffer shared
    # by all grid steps; each program fills its row.
    out_ref[pl.program_id(0), :] = sdf[:, 0]


@functools.partial(jax.jit,
                   static_argnames=("cfg", "bounding_sphere", "n_layers",
                                    "interpret"))
def _fused_call(pts, flat_weights, *, cfg: ModelConfig,
                bounding_sphere: float, n_layers: int,
                interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pts.shape[0]
    grid = (n // BLOCK,)
    ws, bs = flat_weights

    in_specs = [pl.BlockSpec((BLOCK, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    # Weights/biases: same full block for every grid step (the
    # pipeline keeps them resident in VMEM).
    for w in ws:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for b in bs:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0,),
                                     memory_space=pltpu.VMEM))

    kernel = functools.partial(_kernel, cfg, n_layers, bounding_sphere)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n // BLOCK, BLOCK), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // BLOCK, BLOCK), jnp.float32),
        interpret=interpret,
    )(pts, *ws, *bs).reshape(n)


def fused_sdf_values(sdf_params, cfg: ModelConfig, pts,
                     bounding_sphere: float, interpret: bool = False):
    """Drop-in for models.network.sdf_values on the no-grad path.
    pts: (N, 3); N padded to BLOCK internally."""
    wb = normalized_weights(sdf_params)
    ws = tuple(w for w, _ in wb)
    bs = tuple(b for _, b in wb)
    n = pts.shape[0]
    pad = (-n) % BLOCK
    if pad:
        pts = jnp.concatenate(
            [pts, jnp.zeros((pad, 3), pts.dtype)], axis=0)
    out = _fused_call(pts, (ws, bs), cfg=cfg,
                      bounding_sphere=bounding_sphere, n_layers=len(wb),
                      interpret=interpret)
    return out[:n]
