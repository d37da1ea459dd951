"""CascadeMVSNet — TPU rebuild.

Behavioral parity with /root/reference/models/CasMVSNet.py:338-761:
FPN feature pyramid, variance-based cost aggregation over homography-
warped source features, 3D-UNet cost regularization, softmax
probability volume, depth regression + 4-window photometric confidence,
and the 3-stage coarse-to-fine hypothesis cascade.

TPU design notes:
  * NHWC/NDHWC layouts; convs hit the MXU directly.
  * The reference's `prevent_oom` CPU-offload path (CasMVSNet.py:613-
    642) is unnecessary: the warp accumulates running sum/sq-sum so the
    peak live volume is one warped volume, and XLA rematerializes.
  * The frozen net is inference-only (reference wraps forward in
    @torch.no_grad, CasMVSNet.py:705) — BN uses stored stats.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from s_volsdf_tpu.models.mvs import blocks as B
from s_volsdf_tpu.models.mvs.hypotheses import (depth_range_samples,
                                                depth_range_samples_inverse)
from s_volsdf_tpu.models.mvs.warp import (_proj_grid, pack_corners,
                                           warp_packed)

STAGE_SCALES = (4, 2, 1)  # CasMVSNet.py:682-692


# --------------------------------------------------------------------------
# FeatureNet (fpn) — CasMVSNet.py:338-439
# --------------------------------------------------------------------------

def init_feature_net(key, base: int = 8) -> Dict:
    ks = jax.random.split(key, 12)
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
        "inner1": B.init_conv2d(ks[9], base * 2, base * 4, 1, bn=False,
                                bias=True),
        "inner2": B.init_conv2d(ks[10], base, base * 4, 1, bn=False,
                                bias=True),
        "out2": B.init_conv2d(ks[11], base * 4, base * 2, 3, bn=False,
                              bias=False),
        "out3": B.init_conv2d(jax.random.fold_in(key, 99), base * 4, base,
                              3, bn=False, bias=False),
    }


def feature_net(params: Dict, img: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """img: (N, H, W, 3) -> {'stage1': (N, H/4, W/4, 4b), 'stage2':
    (N, H/2, W/2, 2b), 'stage3': (N, H, W, b)} (CasMVSNet.py:400-439)."""
    x = img
    c0 = x
    for p in params["conv0"]:
        c0 = B.conv2d(p, c0, stride=1, padding=(1 if p["w"].shape[0] == 3
                                                else 2))
    c1 = c0
    for i, p in enumerate(params["conv1"]):
        c1 = B.conv2d(p, c1, stride=2 if i == 0 else 1,
                      padding=2 if i == 0 else 1)
    c2 = c1
    for i, p in enumerate(params["conv2"]):
        c2 = B.conv2d(p, c2, stride=2 if i == 0 else 1,
                      padding=2 if i == 0 else 1)

    outputs = {}
    intra = c2
    outputs["stage1"] = B.conv2d(params["out1"], intra, padding=0,
                                 relu=False)
    intra = B.upsample2x_nearest(intra) + B.conv2d(
        params["inner1"], c1, padding=0, relu=False)
    outputs["stage2"] = B.conv2d(params["out2"], intra, padding=1,
                                 relu=False)
    intra = B.upsample2x_nearest(intra) + B.conv2d(
        params["inner2"], c0, padding=0, relu=False)
    outputs["stage3"] = B.conv2d(params["out3"], intra, padding=1,
                                 relu=False)
    return outputs


# --------------------------------------------------------------------------
# CostRegNet — CasMVSNet.py:441-472
# --------------------------------------------------------------------------

def init_cost_reg_net(key, cin: int, base: int = 8) -> Dict:
    ks = jax.random.split(key, 11)
    return {
        "conv0": B.init_conv3d(ks[0], cin, base, 3),
        "conv1": B.init_conv3d(ks[1], base, base * 2, 3),
        "conv2": B.init_conv3d(ks[2], base * 2, base * 2, 3),
        "conv3": B.init_conv3d(ks[3], base * 2, base * 4, 3),
        "conv4": B.init_conv3d(ks[4], base * 4, base * 4, 3),
        "conv5": B.init_conv3d(ks[5], base * 4, base * 8, 3),
        "conv6": B.init_conv3d(ks[6], base * 8, base * 8, 3),
        "conv7": B.init_conv3d(ks[7], base * 8, base * 4, 3),
        "conv9": B.init_conv3d(ks[8], base * 4, base * 2, 3),
        "conv11": B.init_conv3d(ks[9], base * 2, base, 3),
        "prob": B.init_conv3d(ks[10], base, 1, 3, bn=False, bias=False),
    }


def cost_reg_net(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """x: (N, D, H, W, C) variance volume -> (N, D, H, W) logits."""
    c0 = B.conv3d(params["conv0"], x)
    c2 = B.conv3d(params["conv2"], B.conv3d(params["conv1"], c0, stride=2))
    c4 = B.conv3d(params["conv4"], B.conv3d(params["conv3"], c2, stride=2))
    h = B.conv3d(params["conv6"], B.conv3d(params["conv5"], c4, stride=2))
    h = c4 + B.deconv3d(params["conv7"], h)
    h = c2 + B.deconv3d(params["conv9"], h)
    h = c0 + B.deconv3d(params["conv11"], h)
    h = B.conv3d(params["prob"], h, relu=False)
    return h[..., 0]


# --------------------------------------------------------------------------
# DepthNet: variance cost volume -> depth + confidence
# CasMVSNet.py:597-663
# --------------------------------------------------------------------------

def variance_volume(features: Sequence[jnp.ndarray], proj_mats,
                    depth_values: jnp.ndarray,
                    depth_chunk: int = 16,
                    packed: bool = False) -> jnp.ndarray:
    """Variance-aggregated plane-sweep volume, built in depth chunks.

    The naive build materializes warped volumes for every source view
    at once — at DTU production shapes (D=192, 288x384, 32ch) that is
    ~11 GB of fp32 temporaries and OOMs a 16 GB v5e. `lax.map` over
    depth blocks caps live temporaries at the block size while XLA
    still pipelines the gathers (this replaces the reference's
    `prevent_oom` CPU-offload shuffle, CasMVSNet.py:613-642, with a
    device-side schedule).
    """
    num_views = len(features)
    D = depth_values.shape[0]
    ref_feature, src_features = features[0], features[1:]

    def compose(pm):
        # P = [K@[R|t]; 0 0 0 1] (CasMVSNet.py:622-625).
        return pm[0].at[:3, :4].set(pm[1][:3, :3] @ pm[0][:3, :4])

    ref_proj = compose(proj_mats[0])
    src_projs = [compose(proj_mats[i + 1])
                 for i in range(len(src_features))]

    chunk = min(depth_chunk, D)
    while D % chunk:
        chunk -= 1
    n_chunks = D // chunk
    dv_chunks = depth_values.reshape(n_chunks, chunk, *depth_values.shape[1:])
    H, W, C = ref_feature.shape
    # Pack each source once, outside the depth-chunk loop (the pack is
    # loop-invariant; in-loop packing re-materializes it per chunk).
    packed_srcs = [pack_corners(f) for f in src_features]

    def build_chunk(dv):
        ref_block = jnp.broadcast_to(ref_feature[None],
                                     (chunk,) + ref_feature.shape)
        s = ref_block
        sq = ref_block ** 2
        for packed_src, src_proj in zip(packed_srcs, src_projs):
            grid, _ = _proj_grid(src_proj, ref_proj, dv, H, W)
            w = warp_packed(packed_src, C, grid, align_corners=False)
            s = s + w
            sq = sq + w ** 2
        var = sq / num_views - (s / num_views) ** 2
        if packed:
            # Emit directly in depth-packed layout (ops/packed_conv3d):
            # (chunk, H, W, C) -> (H, W, chunk*C); dense TPU tiles.
            return jnp.transpose(var, (1, 2, 0, 3)).reshape(H, W,
                                                            chunk * C)
        return var

    var = jax.lax.map(build_chunk, dv_chunks)
    if packed:
        return var                      # (D/chunk, H, W, chunk*C)
    return var.reshape(D, *ref_feature.shape)


def depth_net(cr_params: Dict, features: Sequence[jnp.ndarray],
              proj_mats: jnp.ndarray, depth_values: jnp.ndarray,
              packed_cr: Optional[Tuple[Dict, int]] = None
              ) -> Dict[str, jnp.ndarray]:
    """One cascade stage.

    features: list of V (H, W, C) maps, ref first.
    proj_mats: (V, 2, 4, 4) — [extrinsic, intrinsic-ish] pairs composed
      like the reference (CasMVSNet.py:622-625: K_stage[:3,:3] @
      extr[:3,:4]).
    depth_values: (D, H, W) hypothesis depths.
    packed_cr: (packed cost-reg params, pack0) — run the UNet in the
      depth-packed layout (ops/packed_conv3d) so production-size
      volumes fit dense TPU tiles; numerically identical.
    """
    D = depth_values.shape[0]
    if packed_cr is not None:
        from s_volsdf_tpu.ops.packed_conv3d import cost_reg_net_packed
        pparams, pack0 = packed_cr
        cin = features[0].shape[-1]
        var_packed = variance_volume(features, proj_mats, depth_values,
                                     depth_chunk=pack0, packed=True)
        logits = cost_reg_net_packed(pparams, var_packed, pack0, cin=cin)
    else:
        variance = variance_volume(features, proj_mats, depth_values)
        logits = cost_reg_net(cr_params, variance[None])[0]  # (D, H, W)
    prob_volume = jax.nn.softmax(logits, axis=0)
    depth = jnp.sum(prob_volume * depth_values, axis=0)

    # Photometric confidence: prob mass of the best 4-hypothesis window
    # at the regressed index (CasMVSNet.py:656-661).
    sum4 = B.avg_pool3d_depth_win4(prob_volume[None])[0]
    steps = jnp.arange(D, dtype=prob_volume.dtype)[:, None, None]
    depth_index = jnp.sum(prob_volume * steps, axis=0).astype(jnp.int32)
    depth_index = jnp.clip(depth_index, 0, D - 1)
    confidence = jnp.take_along_axis(sum4, depth_index[None], axis=0)[0]

    return {"depth": depth, "photometric_confidence": confidence,
            "prob_volume": prob_volume, "depth_values": depth_values}


# --------------------------------------------------------------------------
# Full cascade
# --------------------------------------------------------------------------

def init_casmvsnet(key, ndepths=(192, 32, 8), base: int = 8,
                   cr_base_chs=(8, 8, 8)) -> Dict:
    k_feat, *k_cr = jax.random.split(key, 1 + len(ndepths))
    feat = init_feature_net(k_feat, base)
    out_chs = (base * 4, base * 2, base)
    return {
        "feature": feat,
        "cost_reg": [init_cost_reg_net(k_cr[i], out_chs[i], cr_base_chs[i])
                     for i in range(len(ndepths))],
    }


def casmvsnet_features(params: Dict, imgs: jnp.ndarray) -> List[Dict]:
    """Per-view feature pyramids. imgs: (V, H, W, 3). Returns a list of
    V dicts — mirrors the orchestrator's per-view feature calls
    (runner.py:188-195) but batched over views in one conv pass."""
    stacked = feature_net(params["feature"], imgs)
    V = imgs.shape[0]
    return [{k: v[i] for k, v in stacked.items()} for i in range(V)]


def casmvsnet_stage(params: Dict, stage_idx: int, features: List[Dict],
                    proj_mats: jnp.ndarray, depth_values_range: jnp.ndarray,
                    prev_depth: Optional[jnp.ndarray], img_hw: Tuple[int, int],
                    ndepths=(192, 32, 8), depth_inter_r=(1.0, 0.5, 0.5),
                    inverse_depth: bool = False,
                    packed_cr: Optional[Tuple[Dict, int]] = None
                    ) -> Dict[str, jnp.ndarray]:
    """One cascade stage (CascadeMVSNet.forward, CasMVSNet.py:705-761).

    features: V per-view pyramids; proj_mats: (V, 2, 4, 4) for this
    stage; depth_values_range: (D0,) the scene depth range samples;
    prev_depth: (Hs_prev, Ws_prev) depth from the previous stage or
    None; img_hw: full-resolution (H, W).
    """
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
        cur_depth = depth_values_range  # (D0,)

    gen = depth_range_samples_inverse if inverse_depth \
        else depth_range_samples
    drs = gen(cur_depth, ndepths[stage_idx],
              depth_inter_r[stage_idx] * depth_interval, (H, W))

    depth_values = B.interpolate_trilinear_depth(
        drs[None], (ndepths[stage_idx], H // scale, W // scale),
        align_corners=False)[0]

    feats_stage = [f[stage_key] for f in features]
    return depth_net(params["cost_reg"][stage_idx], feats_stage,
                     proj_mats, depth_values, packed_cr=packed_cr)
