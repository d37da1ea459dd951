"""Depth-packed 3D convolutions — TPU-native lowering for low-channel
cost-volume UNets.

Problem: XLA TPU tiles every array's two minor dims to (8, 128). The
MVS cost-regularization UNets (reference models/CasMVSNet.py:441-472)
run 8-32 channels, so a (D, H, W, 8) stage-1 activation at DTU x2
resolution pads 16x to ~10 GB and a single conv OOMs a 16 GB v5e.

Lowering: pack P consecutive depth slices into channels. An activation
(D, H, W, C) becomes (D/P, H, W, P*C) — with P*C >= 128 the tiles are
dense. A 3x3x3 conv becomes ONE 3x3 2D conv on the packed tensor with
a block-banded weight matrix: output sub-slice o reads input sub-slices
o-1, o, o+1 (cross-block neighbors come from a 1-slice halo appended to
the pack). Strided and transposed depth convs use stride/phase
re-indexed bands. All results are exactly equal to the unpacked conv
(verified in tests); the MXU sees 128+-wide contractions instead of
8-wide ones and HBM sees dense tiles.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


# --------------------------------------------------------------------------
# Packing / unpacking
# --------------------------------------------------------------------------

def pack_depth(x: jnp.ndarray, pack: int) -> jnp.ndarray:
    """(D, H, W, C) -> (D/P, H, W, P*C)."""
    D, H, W, C = x.shape
    assert D % pack == 0, (D, pack)
    return jnp.transpose(x.reshape(D // pack, pack, H, W, C),
                         (0, 2, 3, 1, 4)).reshape(D // pack, H, W, pack * C)


def unpack_depth(xp: jnp.ndarray, pack: int) -> jnp.ndarray:
    """(D/P, H, W, P*C) -> (D, H, W, C)."""
    B, H, W, PC = xp.shape
    C = PC // pack
    return jnp.transpose(xp.reshape(B, H, W, pack, C),
                         (0, 3, 1, 2, 4)).reshape(B * pack, H, W, C)


def _with_halo(xp: jnp.ndarray, pack: int, cin: int) -> jnp.ndarray:
    """Append the previous block's last slice and next block's first
    slice as extra channels: (B, H, W, P*C) -> (B, H, W, (P+2)*C)."""
    B = xp.shape[0]
    zeros = jnp.zeros_like(xp[:1, ..., :cin])
    prev_last = jnp.concatenate([zeros, xp[:-1, ..., -cin:]], axis=0)
    next_first = jnp.concatenate([xp[1:, ..., :cin], zeros], axis=0)
    return jnp.concatenate([prev_last, xp, next_first], axis=-1)


# --------------------------------------------------------------------------
# Packed weight construction (host-side numpy; weights are small)
# --------------------------------------------------------------------------

def _packed_weights_s1(w: np.ndarray, pack: int) -> np.ndarray:
    """3x3x3 stride-1 weights (3, 3, 3, Cin, Cout) -> 2D block-banded
    (3, 3, (P+2)*Cin, P*Cout). Input layout after _with_halo:
    [prev_last, slice_0..P-1, next_first]; input slice j sits at true
    depth offset (j - 1) relative to the block, so output sub-slice o
    (true depth o) reads input slots o, o+1, o+2 for dz = -1, 0, +1."""
    kd, kh, kw, cin, cout = w.shape
    assert kd == 3
    w2 = np.zeros((kh, kw, (pack + 2) * cin, pack * cout), w.dtype)
    for o in range(pack):
        for k in range(3):  # dz = k - 1
            j = o + k       # input slot in the haloed layout
            w2[:, :, j * cin:(j + 1) * cin, o * cout:(o + 1) * cout] = \
                w[k]
    return w2


def _packed_weights_s2(w: np.ndarray, pack_out: int) -> np.ndarray:
    """3x3x3 stride-2 weights -> packed 2D weights.

    Output block has pack_out sub-slices at true depths 2*o (relative
    to 2*pack_out input slices per block). Input slot layout after
    _with_halo on an input packed with P_in = 2*pack_out: slot j = true
    offset j - 1. Output o reads true inputs 2o-1, 2o, 2o+1 -> slots
    2o, 2o+1, 2o+2."""
    kd, kh, kw, cin, cout = w.shape
    p_in = 2 * pack_out
    w2 = np.zeros((kh, kw, (p_in + 2) * cin, pack_out * cout), w.dtype)
    for o in range(pack_out):
        for k in range(3):
            j = 2 * o + k
            w2[:, :, j * cin:(j + 1) * cin, o * cout:(o + 1) * cout] = \
                w[k]
    return w2


def _packed_weights_t2(w: np.ndarray, pack_in: int) -> np.ndarray:
    """Transposed 3x3x3 stride-2 (pad 1, output_pad 1) weights, ALREADY
    in the flipped DHWIO form used by blocks.deconv3d, -> packed 2D.

    Depth relation of the input-dilated equivalent conv: output depth
    d reads dilated position d + t for t in {0, 1, 2} with pad (1, 2);
    dilated index d + t maps to true input (d + t - 1) / 2 when even.
    Output block packs 2*pack_in sub-slices; input slot j = true offset
    j - 1 (haloed)."""
    kd, kh, kw, cin, cout = w.shape
    pack_out = 2 * pack_in
    w2 = np.zeros((kh, kw, (pack_in + 2) * cin, pack_out * cout), w.dtype)
    for o in range(pack_out):
        for t in range(3):
            pos = o + t - 1          # dilated-axis position
            if pos % 2:
                continue             # zero (dilation hole)
            i_true = pos // 2        # true input offset within block
            j = i_true + 1           # haloed slot
            if 0 <= j < pack_in + 2:
                w2[:, :, j * cin:(j + 1) * cin,
                   o * cout:(o + 1) * cout] = w[t]
    return w2


# --------------------------------------------------------------------------
# Packed conv applications
# --------------------------------------------------------------------------

def _packed_operands(p: Dict, x: jnp.ndarray):
    """bf16 conv path when the packed kernel is bf16 (f32 accumulate);
    mirrors blocks._conv_operands — compute dtype follows weight dtype."""
    w = p["w_packed"]
    if w.dtype == jnp.bfloat16:
        return x.astype(jnp.bfloat16), w, {"preferred_element_type":
                                           jnp.float32}
    return x, w, {}


def _bn_packed(bn: Dict, pack: int, y: jnp.ndarray) -> jnp.ndarray:
    from s_volsdf_tpu.models.mvs.blocks import batch_norm
    tiled = {k: jnp.tile(v, pack) for k, v in bn.items()}
    return batch_norm(tiled, y)


def packed_conv3d_s1(p: Dict, xp: jnp.ndarray, pack: int, cin: int, *,
                     relu: bool = True) -> jnp.ndarray:
    """Stride-1 3x3x3 conv on a packed volume. p holds packed weights
    under 'w_packed' (built by pack_costreg_params)."""
    xh = _with_halo(xp, pack, cin)
    xh, w, kw = _packed_operands(p, xh)
    y = lax.conv_general_dilated(
        xh, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), **kw)
    if "b" in p:
        y = y + jnp.tile(p["b"], pack)
    if "bn" in p:
        y = _bn_packed(p["bn"], pack, y)
    if relu:
        y = jax.nn.relu(y)
    return y


def packed_conv3d_s2(p: Dict, xp: jnp.ndarray, pack_in: int, cin: int, *,
                     relu: bool = True) -> jnp.ndarray:
    """Stride-2 3x3x3 conv: depth stride via the banded weights,
    spatial stride via the 2D conv. Output pack = pack_in // 2."""
    pack_out = pack_in // 2
    xh = _with_halo(xp, pack_in, cin)
    xh, w, kw = _packed_operands(p, xh)
    y = lax.conv_general_dilated(
        xh, w, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), **kw)
    if "b" in p:
        y = y + jnp.tile(p["b"], pack_out)
    if "bn" in p:
        y = _bn_packed(p["bn"], pack_out, y)
    if relu:
        y = jax.nn.relu(y)
    return y


def packed_deconv3d(p: Dict, xp: jnp.ndarray, pack_in: int, cin: int, *,
                    relu: bool = True) -> jnp.ndarray:
    """Transposed 3x3x3 stride-2 conv (pad 1, out-pad 1): spatial part
    via lhs_dilation, depth part via the phase-banded weights. Output
    pack = 2 * pack_in."""
    pack_out = 2 * pack_in
    xh = _with_halo(xp, pack_in, cin)
    xh, w, kw = _packed_operands(p, xh)
    y = lax.conv_general_dilated(
        xh, w, (1, 1), ((1, 2), (1, 2)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"), **kw)
    if "b" in p:
        y = y + jnp.tile(p["b"], pack_out)
    if "bn" in p:
        y = _bn_packed(p["bn"], pack_out, y)
    if relu:
        y = jax.nn.relu(y)
    return y


# --------------------------------------------------------------------------
# Packed CostRegNet
# --------------------------------------------------------------------------

_LAYER_KINDS = {
    "conv0": ("s1", None), "conv1": ("s2", None), "conv2": ("s1", None),
    "conv3": ("s2", None), "conv4": ("s1", None), "conv5": ("s2", None),
    "conv6": ("s1", None), "conv7": ("t2", None), "conv9": ("t2", None),
    "conv11": ("t2", None), "prob": ("s1", None),
}


def pack_costreg_params(params: Dict, pack0: int) -> Dict:
    """Precompute packed 2D weights for every CostRegNet layer.
    pack0: depth pack of the full-resolution level (e.g. 16). Deeper
    levels halve it (min 1)."""
    packs = {"conv0": pack0, "conv1": pack0, "conv2": pack0 // 2,
             "conv3": pack0 // 2, "conv4": pack0 // 4,
             "conv5": pack0 // 4, "conv6": pack0 // 8,
             "conv7": pack0 // 8, "conv9": pack0 // 4,
             "conv11": pack0 // 2, "prob": pack0}
    out = {}
    for name, p in params.items():
        kind = _LAYER_KINDS[name][0]
        w = np.asarray(p["w"])
        pk = max(packs[name], 1)
        if kind == "s1":
            wp = _packed_weights_s1(w, pk)
        elif kind == "s2":
            wp = _packed_weights_s2(w, max(pk // 2, 1))
        else:
            wp = _packed_weights_t2(w, pk)
        q = dict(p)
        q["w_packed"] = jnp.asarray(wp)
        out[name] = q
    return out


def cost_reg_net_packed(packed_params: Dict, var_packed: jnp.ndarray,
                        pack0: int, chans=(8, 16, 32, 64),
                        cin: int = 32) -> jnp.ndarray:
    """CostRegNet forward on a depth-packed variance volume.

    var_packed: (D/pack0, H, W, pack0*cin).
    Returns logits (D, H, W) — numerically identical to
    casmvsnet.cost_reg_net on the unpacked volume.
    """
    c0, c1, c2, c3 = chans
    P = pack0
    p = packed_params

    x0 = packed_conv3d_s1(p["conv0"], var_packed, P, cin)          # P, c0
    x1 = packed_conv3d_s2(p["conv1"], x0, P, c0)                    # P/2, c1
    x1 = packed_conv3d_s1(p["conv2"], x1, P // 2, c1)
    x2 = packed_conv3d_s2(p["conv3"], x1, P // 2, c1)               # P/4, c2
    x2 = packed_conv3d_s1(p["conv4"], x2, P // 4, c2)
    x3 = packed_conv3d_s2(p["conv5"], x2, P // 4, c2)               # P/8, c3
    x3 = packed_conv3d_s1(p["conv6"], x3, P // 8, c3)
    y = x2 + packed_deconv3d(p["conv7"], x3, P // 8, c3)            # P/4, c2
    y = x1 + packed_deconv3d(p["conv9"], y, P // 4, c2)             # P/2, c1
    y = x0 + packed_deconv3d(p["conv11"], y, P // 2, c1)            # P, c0
    logits_p = packed_conv3d_s1(p["prob"], y, P, c0, relu=False)    # P, 1
    B, H, W, _ = logits_p.shape
    return unpack_depth(logits_p, P)[..., 0]
