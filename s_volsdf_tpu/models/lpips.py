"""LPIPS perceptual distance (VGG variant) in JAX.

Replaces the reference's vendored TF1 graph hack
(/root/reference/lpips_tensorflow/lpips_tf.py:29-90, which downloads a
frozen .pb at runtime) with a native JAX implementation of the same
net-lin/vgg model: VGG16 conv features at the 5 standard taps,
unit-normalized along channels, squared difference, 1x1 learned linear
weights, spatial + tap sum.

Weights: convert the torch `lpips` package (or torchvision VGG16 +
LPIPS lin layers) with tools/convert_ckpt.py -> lpips_vgg.npz. Without
weights, `lpips_available()` is False and the eval CLI reports LPIPS
as None (there is no egress in CI environments to fetch them).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan per block (channels), taps after relu1_2, relu2_2,
# relu3_3, relu4_3, relu5_3.
VGG_PLAN = ((64, 64), (128, 128), (256, 256, 256),
            (512, 512, 512), (512, 512, 512))

# ImageNet normalization used by LPIPS' scaling layer.
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_lpips_params(key) -> Dict:
    """Random-init params with the right shapes (testing / converter
    template)."""
    params = {"features": [], "lins": []}
    cin = 3
    for block in VGG_PLAN:
        blk = []
        for cout in block:
            key, k = jax.random.split(key)
            w = jax.random.normal(k, (3, 3, cin, cout)) * 0.05
            blk.append({"w": w, "b": jnp.zeros((cout,))})
            cin = cout
        params["features"].append(blk)
        params["lins"].append(
            {"w": jnp.abs(jax.random.normal(key, (cin, 1))) * 0.01})
    return params


def load_lpips(path: str) -> Optional[Dict]:
    if not os.path.exists(path):
        return None
    from s_volsdf_tpu.utils import checkpoint as ckpt
    template = init_lpips_params(jax.random.PRNGKey(0))
    params, _ = ckpt.load_state(path, template)
    return params


def _vgg_features(params: Dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: (N, H, W, 3) in [0, 1] -> 5 tap activations."""
    # LPIPS scaling layer: map [0,1] -> [-1,1] then normalize.
    x = 2.0 * x - 1.0
    x = (x - _SHIFT) / _SCALE
    taps = []
    for b, block in enumerate(params["features"]):
        for conv in block:
            x = jax.lax.conv_general_dilated(
                x, conv["w"], (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + conv["b"]
            x = jax.nn.relu(x)
        taps.append(x)
        if b < len(params["features"]) - 1:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")
    return taps


def lpips_distance(params: Dict, img0: jnp.ndarray,
                   img1: jnp.ndarray) -> jnp.ndarray:
    """net-lin/vgg LPIPS. img: (N, H, W, 3) in [0, 1]. Returns (N,)."""
    f0 = _vgg_features(params, img0)
    f1 = _vgg_features(params, img1)
    total = 0.0
    for a, b, lin in zip(f0, f1, params["lins"]):
        na = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
        nb = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
        diff = (na - nb) ** 2
        w = jnp.maximum(lin["w"], 0.0)  # lin weights are non-negative
        val = diff @ w                  # (N, H, W, 1)
        total = total + jnp.mean(val, axis=(1, 2, 3))
    return total
