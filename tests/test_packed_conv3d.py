"""Depth-packed CostRegNet must equal the plain 3D-conv CostRegNet."""

import jax
import jax.numpy as jnp
import numpy as np

from s_volsdf_tpu.models.mvs.casmvsnet import cost_reg_net, init_cost_reg_net
from s_volsdf_tpu.ops.packed_conv3d import (cost_reg_net_packed,
                                            pack_costreg_params, pack_depth,
                                            unpack_depth)


def test_pack_unpack_roundtrip(rng_np):
    x = jnp.asarray(rng_np.standard_normal((32, 8, 12, 16)).astype(np.float32))
    xp = pack_depth(x, 16)
    assert xp.shape == (2, 8, 12, 16 * 16)
    np.testing.assert_array_equal(np.asarray(unpack_depth(xp, 16)),
                                  np.asarray(x))


def test_packed_costreg_matches_plain(rng_np):
    D, H, W, C = 32, 16, 24, 32
    params = init_cost_reg_net(jax.random.PRNGKey(0), C, 8)
    # Randomize BN stats so the packed BN mapping is exercised.
    for name in params:
        if "bn" in params[name]:
            bn = params[name]["bn"]
            c = bn["scale"].shape[0]
            params[name]["bn"] = {
                "scale": jnp.asarray(rng_np.uniform(0.5, 1.5, c),
                                     jnp.float32),
                "bias": jnp.asarray(rng_np.uniform(-0.2, 0.2, c),
                                    jnp.float32),
                "mean": jnp.asarray(rng_np.uniform(-0.2, 0.2, c),
                                    jnp.float32),
                "var": jnp.asarray(rng_np.uniform(0.5, 1.5, c),
                                   jnp.float32),
            }

    x = jnp.asarray(rng_np.standard_normal((D, H, W, C)).astype(np.float32))

    ref = cost_reg_net(params, x[None])[0]          # (D, H, W)

    pack0 = 16
    packed_params = pack_costreg_params(params, pack0)
    xp = pack_depth(x, pack0)
    got = cost_reg_net_packed(packed_params, xp, pack0, cin=C)

    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4)


def test_bf16_conv_weights_close_to_f32():
    """Conv compute dtype follows the weight dtype (blocks.py
    cast_conv_weights): bf16 kernels with f32 accumulation must track
    the f32 UNet within bf16 rounding, for both the plain and the
    depth-packed cost-regularization paths."""
    from s_volsdf_tpu.models.mvs.blocks import cast_conv_weights
    from s_volsdf_tpu.models.mvs.casmvsnet import (cost_reg_net,
                                                   init_cost_reg_net)
    from s_volsdf_tpu.ops.packed_conv3d import (cost_reg_net_packed,
                                                pack_costreg_params,
                                                pack_depth)
    rng_np = np.random.default_rng(7)
    D, H, W, C = 32, 16, 24, 32
    params = init_cost_reg_net(jax.random.PRNGKey(1), C, 8)
    x = jnp.asarray(rng_np.standard_normal((D, H, W, C)).astype(np.float32))

    ref = np.asarray(cost_reg_net(params, x[None])[0])
    got = np.asarray(cost_reg_net(cast_conv_weights(params), x[None])[0])
    # The cast touched only the kernels.
    bf = cast_conv_weights(params)
    assert bf["conv0"]["w"].dtype == jnp.bfloat16
    assert bf["conv0"]["bn"]["scale"].dtype == jnp.float32
    scale = np.abs(ref).mean()
    assert np.abs(got - ref).mean() < 2e-2 * max(scale, 1.0)

    pack0 = 16
    pp = cast_conv_weights(pack_costreg_params(params, pack0))
    assert pp["conv0"]["w_packed"].dtype == jnp.bfloat16
    got_p = np.asarray(cost_reg_net_packed(pp, pack_depth(x, pack0),
                                           pack0, cin=C))
    assert np.abs(got_p - ref).mean() < 2e-2 * max(scale, 1.0)
