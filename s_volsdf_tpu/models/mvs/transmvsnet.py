"""TransMVSNet — TPU rebuild.

Behavioral parity with /root/reference/models/TransMVSNet.py:12-232 and
module.py:345-479: DCN-augmented FPN features, FMT transformer
(fmt.py), dot-product similarity cost volumes weighted by a per-pixel
PixelwiseNet visibility estimate, shared 1-channel CostRegNet, and
winner-take-all depth.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from s_volsdf_tpu.models.mvs import blocks as B
from s_volsdf_tpu.models.mvs.casmvsnet import (cost_reg_net,
                                               init_cost_reg_net)
from s_volsdf_tpu.models.mvs.fmt import fmt_with_pathway, init_fmt_with_pathway
from s_volsdf_tpu.models.mvs.hypotheses import (depth_range_samples,
                                                depth_range_samples_inverse)
from s_volsdf_tpu.models.mvs.warp import homo_warping
from s_volsdf_tpu.ops.deform_conv import deform_conv2d

STAGE_SCALES = (4, 2, 1)


# --------------------------------------------------------------------------
# DCN block params (dcn.py:15-80): offset/mask conv + deformable conv
# --------------------------------------------------------------------------

def init_dcn(key, cin: int, cout: int, k: int = 3) -> Dict:
    k1, k2 = jax.random.split(key)
    K = k * k
    # Offset/mask conv initialized to ZERO (dcn.py:63-65) so the DCN
    # starts as a plain conv.
    return {
        "offset_conv": {
            "w": jnp.zeros((k, k, cin, 3 * K)),
            "b": jnp.zeros((3 * K,)),
        },
        "w": jax.random.uniform(
            k1, (K * cin, cout),
            minval=-(1.0 / (cin * K) ** 0.5),
            maxval=(1.0 / (cin * K) ** 0.5)),
        "b": jnp.zeros((cout,)),
    }


def dcn_apply(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """DCN.forward (dcn.py:66-80). x: (H, W, C). The kernel size is
    recovered from the offset-conv weight shape (a static int even
    when the params ride through jit; an explicit "k" leaf would get
    traced)."""
    k = int(p["offset_conv"]["w"].shape[0])
    K = k * k
    from s_volsdf_tpu.models.mvs.blocks import _conv_operands
    xo, wo, kwo = _conv_operands(p["offset_conv"], x[None])
    om = jax.lax.conv_general_dilated(
        xo, wo, (1, 1),
        ((k // 2, k // 2), (k // 2, k // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        **kwo)[0] + p["offset_conv"]["b"]
    o1, o2, mask = jnp.split(om, 3, axis=-1)
    # torchvision reads offsets interleaved (dy, dx) per tap from
    # cat(o1, o2): reproduce that exact layout.
    offset = jnp.concatenate([o1, o2], axis=-1)
    mask = jax.nn.sigmoid(mask)
    return deform_conv2d(x, offset, mask, p["w"], p["b"], kh=k, kw=k,
                         padding=k // 2)


# --------------------------------------------------------------------------
# FeatureNet with DCN heads (module.py:345-423)
# --------------------------------------------------------------------------

def init_trans_feature_net(key, base: int = 8) -> Dict:
    ks = jax.random.split(key, 24)
    fc = base * 4
    return {
        "conv0": [B.init_conv2d(ks[0], 3, base, 3),
                  B.init_conv2d(ks[1], base, base, 3)],
        "conv1": [B.init_conv2d(ks[2], base, base * 2, 5),
                  B.init_conv2d(ks[3], base * 2, base * 2, 3),
                  B.init_conv2d(ks[4], base * 2, base * 2, 3)],
        "conv2": [B.init_conv2d(ks[5], base * 2, fc, 5),
                  B.init_conv2d(ks[6], fc, fc, 3),
                  B.init_conv2d(ks[7], fc, fc, 3)],
        # out1 = Conv2d(1x1,bn,relu), DCN, BN, ReLU, DCN, BN, ReLU, DCN
        "out1": {"conv": B.init_conv2d(ks[8], fc, fc, 1),
                 "dcn1": init_dcn(ks[9], fc, fc),
                 "bn1": B.init_bn(fc),
                 "dcn2": init_dcn(ks[10], fc, fc),
                 "bn2": B.init_bn(fc),
                 "dcn3": init_dcn(ks[11], fc, fc)},
        "inner1": B.init_conv2d(ks[12], base * 2, fc, 1, bn=False, bias=True),
        "inner2": B.init_conv2d(ks[13], base, fc, 1, bn=False, bias=True),
        "out2": {"conv": B.init_conv2d(ks[14], fc, fc, 3),
                 "dcn1": init_dcn(ks[15], fc, fc),
                 "bn1": B.init_bn(fc),
                 "dcn2": init_dcn(ks[16], fc, fc),
                 "bn2": B.init_bn(fc),
                 "dcn3": init_dcn(ks[17], fc, base * 2)},
        "out3": {"conv": B.init_conv2d(ks[18], fc, fc, 3),
                 "dcn1": init_dcn(ks[19], fc, fc),
                 "bn1": B.init_bn(fc),
                 "dcn2": init_dcn(ks[20], fc, fc),
                 "bn2": B.init_bn(fc),
                 "dcn3": init_dcn(ks[21], fc, base)},
    }


def _dcn_head(p: Dict, x: jnp.ndarray, first_pad: int) -> jnp.ndarray:
    """out1/out2/out3 head: conv(+bn+relu), then DCN-BN-ReLU x2, final
    DCN (module.py:364-397). x: (H, W, C)."""
    h = B.conv2d(p["conv"], x[None], padding=first_pad)[0]
    h = jax.nn.relu(B.batch_norm(p["bn1"], dcn_apply(p["dcn1"], h)))
    h = jax.nn.relu(B.batch_norm(p["bn2"], dcn_apply(p["dcn2"], h)))
    return dcn_apply(p["dcn3"], h)


def trans_feature_net(params: Dict, img: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """img: (H, W, 3) single view -> 3-stage pyramid."""
    x = img[None]
    c0 = x
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

    outputs = {"stage1": _dcn_head(params["out1"], c2[0], first_pad=0)}
    intra = B.upsample2x_nearest(c2) + B.conv2d(params["inner1"], c1,
                                                padding=0, relu=False)
    outputs["stage2"] = _dcn_head(params["out2"], intra[0], first_pad=1)
    intra = B.upsample2x_nearest(intra) + B.conv2d(params["inner2"], c0,
                                                   padding=0, relu=False)
    outputs["stage3"] = _dcn_head(params["out3"], intra[0], first_pad=1)
    return outputs


# --------------------------------------------------------------------------
# PixelwiseNet (TransMVSNet.py:12-32)
# --------------------------------------------------------------------------

def init_pixelwise_net(key) -> Dict:
    ks = jax.random.split(key, 3)
    return {
        "conv0": B.init_conv3d(ks[0], 1, 16, 1),
        "conv1": B.init_conv3d(ks[1], 16, 8, 1),
        "conv2": B.init_conv3d(ks[2], 8, 1, 1, bn=False, bias=True),
    }


def pixelwise_net(params: Dict, similarity: jnp.ndarray) -> jnp.ndarray:
    """similarity: (D, H, W) -> per-pixel visibility weight (H, W).

    The reference uses 1x1x1 Conv3d + BN + ReLU stacks
    (TransMVSNet.py:12-32); a 1x1x1 conv is a per-voxel dense layer, so
    it is applied as channel matmuls (the (D, H, W, 1..16) conv forms
    would pad 8-128x on TPU tiles). Callers should chunk over D for
    production sizes (trans_depth_net does)."""
    x = similarity[..., None]                    # (D, H, W, 1)

    def dense_bn_relu(p, x, relu=True):
        w = p["w"].reshape(p["w"].shape[-2:])    # (Cin, Cout)
        y = x @ w
        if "b" in p:
            y = y + p["b"]
        if "bn" in p:
            y = B.batch_norm(p["bn"], y)
        return jax.nn.relu(y) if relu else y

    x = dense_bn_relu(params["conv0"], x)
    x = dense_bn_relu(params["conv1"], x)
    x = dense_bn_relu(params["conv2"], x, relu=False)
    return jnp.max(jax.nn.sigmoid(x[..., 0]), axis=0)


# --------------------------------------------------------------------------
# DepthNet with similarity volume + view weights (TransMVSNet.py:35-115)
# --------------------------------------------------------------------------

def trans_depth_net(cr_params: Dict, pw_params: Dict,
                    features: List[jnp.ndarray], proj_mats: jnp.ndarray,
                    depth_values: jnp.ndarray,
                    view_weights: Optional[jnp.ndarray],
                    packed_cr: Optional[tuple] = None):
    """Returns (outputs, view_weights). view_weights: (V-1, H, W)."""
    D = depth_values.shape[0]
    ref_feature, src_features = features[0], features[1:]
    C = ref_feature.shape[-1]

    def compose(pm):
        return pm[0].at[:3, :4].set(pm[1][:3, :3] @ pm[0][:3, :4])

    ref_proj = compose(proj_mats[0])

    def similarity_chunked(src_fea, src_proj, chunk=16):
        """Dot-product similarity built in depth chunks so the warped
        (D, H, W, C) volume never materializes (memory note at
        casmvsnet.variance_volume)."""
        c = min(chunk, D)
        while D % c:
            c -= 1
        dv = depth_values.reshape(D // c, c, *depth_values.shape[1:])

        def one(dvc):
            w = homo_warping(src_fea, src_proj, ref_proj, dvc,
                             align_corners=True, mask_behind=True)
            sim_c = jnp.mean(w * ref_feature[None], axis=-1)
            # PixelwiseNet per chunk: its 1x1x1 dense stack would pad
            # 8-128x on TPU tiles at full depth; the final max over D
            # commutes with chunking.
            pw_c = pixelwise_net(pw_params, sim_c)   # (H, W)
            return sim_c, pw_c

        sim, pw = jax.lax.map(one, dv)
        return (sim.reshape(D, *depth_values.shape[1:]),
                jnp.max(pw, axis=0))

    similarity_sum = 0.0
    weight_sum = 1e-5
    new_weights = []
    for i, src_fea in enumerate(src_features):
        similarity, vw_new = similarity_chunked(
            src_fea, compose(proj_mats[i + 1]))  # (D, H, W), (H, W)
        if view_weights is None:
            vw = vw_new
            new_weights.append(vw)
        else:
            vw = view_weights[i]
        similarity_sum = similarity_sum + similarity * vw[None]
        weight_sum = weight_sum + vw[None]
    similarity = similarity_sum / weight_sum  # (D, H, W)

    if packed_cr is not None:
        from s_volsdf_tpu.ops.packed_conv3d import (cost_reg_net_packed,
                                                    pack_depth)
        pparams, pack0 = packed_cr
        sim_packed = pack_depth(similarity[..., None], pack0)
        logits = cost_reg_net_packed(pparams, sim_packed, pack0, cin=1)
    else:
        logits = cost_reg_net(cr_params, similarity[None, ..., None])[0]
    prob_volume = jax.nn.softmax(logits, axis=0)

    # Winner-take-all depth (TransMVSNet.py:101, 225-227).
    wta = jnp.argmax(prob_volume, axis=0)
    depth = jnp.take_along_axis(depth_values, wta[None], axis=0)[0]
    confidence = jnp.max(prob_volume, axis=0)

    out = {"depth": depth, "photometric_confidence": confidence,
           "prob_volume": prob_volume, "depth_values": depth_values}
    if view_weights is None:
        view_weights = jnp.stack(new_weights)  # (V-1, H, W)
    return out, view_weights


# --------------------------------------------------------------------------
# Full model
# --------------------------------------------------------------------------

def init_transmvsnet(key, ndepths=(192, 32, 8), base: int = 8,
                     cr_base_chs=(8, 8, 8)) -> Dict:
    ks = jax.random.split(key, 3 + len(ndepths))
    return {
        "feature": init_trans_feature_net(ks[0], base),
        "fmt": init_fmt_with_pathway(ks[1], base),
        "pixelwise": init_pixelwise_net(ks[2]),
        # in_channels=1 (similarity volume), TransMVSNet.py:151-154
        "cost_reg": [init_cost_reg_net(ks[3 + i], 1, cr_base_chs[i])
                     for i in range(len(ndepths))],
    }


def transmvsnet_features(params: Dict, imgs: jnp.ndarray) -> List[Dict]:
    """Per-view DCN pyramids + FMT pathway — mirrors the orchestrator's
    feature() calls then FMT_with_pathway (runner.py:188-197)."""
    feats = [trans_feature_net(params["feature"], imgs[v])
             for v in range(imgs.shape[0])]
    return fmt_with_pathway(params["fmt"], feats)


def transmvsnet_stage(params: Dict, stage_idx: int, features: List[Dict],
                      proj_mats: jnp.ndarray,
                      depth_values_range: jnp.ndarray,
                      prev_depth: Optional[jnp.ndarray],
                      view_weights: Optional[jnp.ndarray],
                      img_hw: Tuple[int, int], ndepths=(192, 32, 8),
                      depth_inter_r=(1.0, 0.5, 0.5),
                      inverse_depth: bool = False, packed_cr=None):
    """TransMVSNet.forward for one stage (TransMVSNet.py:160-232).
    Returns (outputs, view_weights)."""
    H, W = img_hw
    stage_key = f"stage{stage_idx + 1}"
    scale = STAGE_SCALES[stage_idx]

    depth_min = depth_values_range[0]
    depth_max = depth_values_range[-1]
    depth_interval = (depth_max - depth_min) / depth_values_range.shape[0]

    if prev_depth is not None:
        cur_depth = B.interpolate_bilinear(
            prev_depth[None, ..., None], (H, W),
            align_corners=False)[0, ..., 0]
    else:
        cur_depth = depth_values_range

    gen = depth_range_samples_inverse if inverse_depth else \
        depth_range_samples
    drs = gen(cur_depth, ndepths[stage_idx],
              depth_inter_r[stage_idx] * depth_interval, (H, W))
    depth_values = B.interpolate_trilinear_depth(
        drs[None], (ndepths[stage_idx], H // scale, W // scale),
        align_corners=False)[0]

    if stage_idx > 0 and view_weights is not None:
        # Upsample view weights 2x nearest per stage
        # (TransMVSNet.py:207-208).
        vw = view_weights[..., None]                     # (V-1, h, w, 1)
        vw = jax.vmap(lambda m: B.upsample2x_nearest(m[None])[0])(vw)
        view_weights = vw[..., 0]

    feats_stage = [f[stage_key] for f in features]
    return trans_depth_net(params["cost_reg"][stage_idx],
                           params["pixelwise"], feats_stage, proj_mats,
                           depth_values, view_weights,
                           packed_cr=packed_cr)
