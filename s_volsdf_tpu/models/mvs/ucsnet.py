"""UCSNet — uncertainty-aware cascade MVS, TPU rebuild.

Behavioral parity with /root/reference/models/ucsnet.py:237-477:
same cost-volume skeleton as CasMVSNet but with a UNet feature
extractor (deconv-fuse pathway) and hypothesis slabs derived from the
previous stage's predicted depth variance (ucsnet.py:44-72, 393-394).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from s_volsdf_tpu.models.mvs import blocks as B
from s_volsdf_tpu.models.mvs.casmvsnet import (cost_reg_net,
                                               init_cost_reg_net)
from s_volsdf_tpu.models.mvs.hypotheses import uncertainty_aware_samples
from s_volsdf_tpu.models.mvs.warp import homo_warping

STAGE_SCALES = (4, 2, 1)  # ucsnet.py:407-410


# --------------------------------------------------------------------------
# FeatExtNet (UNet pathway) — ucsnet.py:237-302
# --------------------------------------------------------------------------

def init_feat_ext_net(key, base: int = 8) -> Dict:
    ks = jax.random.split(key, 15)
    return {
        "conv0": [B.init_conv2d(ks[0], 3, base, 3),
                  B.init_conv2d(ks[1], base, base, 3)],
        "conv1": [B.init_conv2d(ks[2], base, base * 2, 5),
                  B.init_conv2d(ks[3], base * 2, base * 2, 3),
                  B.init_conv2d(ks[4], base * 2, base * 2, 3)],
        "conv2": [B.init_conv2d(ks[5], base * 2, base * 4, 5),
                  B.init_conv2d(ks[6], base * 4, base * 4, 3),
                  B.init_conv2d(ks[7], base * 4, base * 4, 3)],
        "out1": B.init_conv2d(ks[8], base * 4, base * 4, 1, bn=False,
                              bias=False),
        # Deconv2dBlock = deconv(stride2) then conv on concat
        # (ucsnet.py:220-235).
        "deconv1": {"deconv": B.init_conv2d(ks[9], base * 4, base * 2, 3),
                    "conv": B.init_conv2d(ks[10], base * 4, base * 2, 3)},
        "deconv2": {"deconv": B.init_conv2d(ks[11], base * 2, base, 3),
                    "conv": B.init_conv2d(ks[12], base * 2, base, 3)},
        "out2": B.init_conv2d(ks[13], base * 2, base * 2, 1, bn=False,
                              bias=False),
        "out3": B.init_conv2d(ks[14], base, base, 1, bn=False, bias=False),
    }


def _deconv_fuse(p: Dict, x_pre, x):
    """Deconv2dBlock.forward (ucsnet.py:231-235)."""
    y = B.deconv2d(p["deconv"], x)
    y = jnp.concatenate([y, x_pre], axis=-1)
    return B.conv2d(p["conv"], y, padding=1)


def feat_ext_net(params: Dict, img: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """img: (N, H, W, 3) -> 3-stage pyramid (ucsnet.py:279-302)."""
    c0 = img
    for p in params["conv0"]:
        c0 = B.conv2d(p, c0, padding=1)
    c1 = c0
    for i, p in enumerate(params["conv1"]):
        c1 = B.conv2d(p, c1, stride=2 if i == 0 else 1,
                      padding=2 if i == 0 else 1)
    c2 = c1
    for i, p in enumerate(params["conv2"]):
        c2 = B.conv2d(p, c2, stride=2 if i == 0 else 1,
                      padding=2 if i == 0 else 1)

    outputs = {"stage1": B.conv2d(params["out1"], c2, padding=0, relu=False)}
    intra = _deconv_fuse(params["deconv1"], c1, c2)
    outputs["stage2"] = B.conv2d(params["out2"], intra, padding=0, relu=False)
    intra = _deconv_fuse(params["deconv2"], c0, intra)
    outputs["stage3"] = B.conv2d(params["out3"], intra, padding=0, relu=False)
    return outputs


# --------------------------------------------------------------------------
# compute_depth — ucsnet.py:338-396
# --------------------------------------------------------------------------

def compute_depth(cr_params: Dict, features: List[jnp.ndarray],
                  proj_mats: jnp.ndarray, depth_samps: jnp.ndarray,
                  lamb: float, packed_cr=None) -> Dict[str, jnp.ndarray]:
    """Variance cost volume -> depth, confidence, and the lamb-scaled
    uncertainty used to build the next stage's slab."""
    from s_volsdf_tpu.models.mvs.casmvsnet import variance_volume
    D = depth_samps.shape[0]
    if packed_cr is not None:
        from s_volsdf_tpu.ops.packed_conv3d import cost_reg_net_packed
        pparams, pack0 = packed_cr
        var_packed = variance_volume(features, proj_mats, depth_samps,
                                     depth_chunk=pack0, packed=True)
        logits = cost_reg_net_packed(pparams, var_packed, pack0,
                                     cin=features[0].shape[-1])
    else:
        variance = variance_volume(features, proj_mats, depth_samps)
        logits = cost_reg_net(cr_params, variance[None])[0]
    prob_volume = jax.nn.softmax(logits, axis=0)
    depth = jnp.sum(prob_volume * depth_samps, axis=0)

    sum4 = B.avg_pool3d_depth_win4(prob_volume[None])[0]
    steps = jnp.arange(D, dtype=prob_volume.dtype)[:, None, None]
    depth_index = jnp.clip(
        jnp.sum(prob_volume * steps, axis=0).astype(jnp.int32), 0, D - 1)
    confidence = jnp.take_along_axis(sum4, depth_index[None], axis=0)[0]

    samp_variance = (depth_samps - depth[None]) ** 2
    exp_variance = lamb * jnp.sqrt(
        jnp.sum(samp_variance * prob_volume, axis=0))

    return {"depth": depth, "photometric_confidence": confidence,
            "prob_volume": prob_volume, "variance": exp_variance,
            "depth_values": depth_samps}


# --------------------------------------------------------------------------
# Full cascade
# --------------------------------------------------------------------------

def init_ucsnet(key, stage_configs=(64, 32, 8), base_chs=(8, 8, 8),
                feat_ext_ch: int = 8) -> Dict:
    k_feat, *k_cr = jax.random.split(key, 1 + len(stage_configs))
    out_chs = (feat_ext_ch * 4, feat_ext_ch * 2, feat_ext_ch)
    return {
        "feature": init_feat_ext_net(k_feat, feat_ext_ch),
        "cost_reg": [init_cost_reg_net(k_cr[i], out_chs[i], base_chs[i])
                     for i in range(len(stage_configs))],
    }


def ucsnet_features(params: Dict, imgs: jnp.ndarray) -> List[Dict]:
    stacked = feat_ext_net(params["feature"], imgs)
    V = imgs.shape[0]
    return [{k: v[i] for k, v in stacked.items()} for i in range(V)]


def ucsnet_stage(params: Dict, stage_idx: int, features: List[Dict],
                 proj_mats: jnp.ndarray, depth_values_range: jnp.ndarray,
                 prev_depth: Optional[jnp.ndarray],
                 prev_variance: Optional[jnp.ndarray],
                 img_hw: Tuple[int, int], stage_configs=(64, 32, 8),
                 lamb: float = 1.5, inverse_depth: bool = False,
                 packed_cr=None) -> Dict[str, jnp.ndarray]:
    """UCSNet.forward for one stage (ucsnet.py:417-477). prev_depth and
    prev_variance come from the previous stage (the runner's `extra`
    blob)."""
    H, W = img_hw
    scale = STAGE_SCALES[stage_idx]
    cur_h, cur_w = H // scale, W // scale
    stage_key = f"stage{stage_idx + 1}"

    if prev_depth is not None:
        cur_depth = B.interpolate_bilinear(
            prev_depth[None, ..., None], (cur_h, cur_w),
            align_corners=False)[0, ..., 0]
        exp_var = B.interpolate_bilinear(
            prev_variance[None, ..., None], (cur_h, cur_w),
            align_corners=False)[0, ..., 0]
    else:
        cur_depth = depth_values_range
        exp_var = None

    depth_samps = uncertainty_aware_samples(
        cur_depth, exp_var, stage_configs[stage_idx], (cur_h, cur_w),
        inverse_depth=inverse_depth)

    feats_stage = [f[stage_key] for f in features]
    return compute_depth(params["cost_reg"][stage_idx], feats_stage,
                         proj_mats, depth_samps, lamb,
                         packed_cr=packed_cr)
