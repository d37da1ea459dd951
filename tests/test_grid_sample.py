"""Parity tests: our gather-based grid sampling vs torch.grid_sample.

The reference relies on torch's CUDA grid_sample with two different
align_corners conventions (SURVEY.md hard-part #5); these tests pin our
implementations to torch's CPU reference bit-for-purpose.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from s_volsdf_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d


@pytest.mark.parametrize("align_corners", [True, False])
def test_grid_sample_2d_matches_torch(rng_np, align_corners):
    H, W, C = 13, 17, 3
    img = rng_np.standard_normal((H, W, C)).astype(np.float32)
    # Coords inside and outside [-1, 1] (zeros padding behavior).
    coords = (rng_np.uniform(-1.3, 1.3, size=(50, 2))).astype(np.float32)

    ours = grid_sample_2d(jnp.asarray(img), jnp.asarray(coords),
                          align_corners=align_corners)

    t_img = torch.from_numpy(img).permute(2, 0, 1)[None]       # (1,C,H,W)
    t_grid = torch.from_numpy(coords)[None, :, None, :]        # (1,50,1,2)
    t_out = F.grid_sample(t_img, t_grid, mode="bilinear",
                          padding_mode="zeros",
                          align_corners=align_corners)
    t_out = t_out[0, :, :, 0].T.numpy()                        # (50, C)
    np.testing.assert_allclose(np.asarray(ours), t_out, atol=1e-5)


@pytest.mark.parametrize("align_corners", [True, False])
def test_grid_sample_3d_matches_torch(rng_np, align_corners):
    D, H, W = 9, 11, 13
    vol = rng_np.standard_normal((D, H, W)).astype(np.float32)
    coords = (rng_np.uniform(-1.2, 1.2, size=(64, 3))).astype(np.float32)

    ours = grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords),
                          align_corners=align_corners)

    t_vol = torch.from_numpy(vol)[None, None]                  # (1,1,D,H,W)
    t_grid = torch.from_numpy(coords)[None, :, None, None, :]  # (1,64,1,1,3)
    t_out = F.grid_sample(t_vol, t_grid, mode="bilinear",
                          padding_mode="zeros",
                          align_corners=align_corners)
    t_out = t_out[0, 0, :, 0, 0].numpy()
    np.testing.assert_allclose(np.asarray(ours), t_out, atol=1e-5)


def test_grid_sample_sentinel_coords_give_zero():
    """cost_mapping marks invalid points with -99 coords
    (vsdf.py:423, 435) and relies on zeros padding."""
    vol = jnp.ones((4, 4, 4))
    coords = jnp.full((5, 3), -99.0)
    out = grid_sample_3d(vol, coords, align_corners=True)
    np.testing.assert_allclose(np.asarray(out), 0.0)


@pytest.mark.parametrize("align_corners", [True, False])
def test_grid_sample_2d_packed_matches_plain(rng_np, align_corners):
    """Single-gather dup-y layout == the 4-gather reference, incl.
    out-of-bounds zero padding and -99 invalid markers."""
    from s_volsdf_tpu.ops.grid_sample import (grid_sample_2d,
                                              grid_sample_2d_packed,
                                              pack_corners)
    img = jnp.asarray(rng_np.standard_normal((9, 13, 5)).astype(np.float32))
    coords = rng_np.uniform(-1.4, 1.4, (200, 2)).astype(np.float32)
    coords[:10] = -99.0
    coords[10:15, 0] = 1.0   # exact right edge
    coords[15:20, 1] = -1.0  # exact top edge
    a = grid_sample_2d(img, jnp.asarray(coords),
                       align_corners=align_corners)
    b = grid_sample_2d_packed(pack_corners(img), 5, jnp.asarray(coords),
                              align_corners=align_corners)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-6, atol=1e-6)
