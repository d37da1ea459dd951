"""Parity: cost_mapping vs a literal torch oracle of the reference
VolOpt.cost_mapping (/root/reference/volsdf/vsdf.py:382-452)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def torch_cost_mapping(z_vals, xyz_raw, same_view_flags, costs, z_mvs,
                       intrinsics, c2w_all, img_res, inverse_depth=False):
    """Line-for-line oracle of vsdf.py:382-452 (torch CPU)."""
    from torch.nn.functional import grid_sample

    results_cost_j = torch.zeros_like(z_vals)
    results_cost_mvs = torch.zeros_like(z_vals)
    valid_mask = torch.zeros_like(z_vals, dtype=torch.bool)
    _h, _w = img_res

    for i in range(len(costs)):
        same_view = same_view_flags[i]
        xyz_j = xyz_raw.clone()
        cost, z_mvs_i = costs[i], z_mvs[i]     # (1, D, H, W)
        K = intrinsics[i]
        c2w = c2w_all[i][:3]
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
        sk = K[0, 1]

        xyz_j -= c2w[:, 3].view(1, 1, 3)
        xyz_j = xyz_j @ c2w[:, :3]
        xyz_j[..., :2] /= xyz_j[..., 2:]
        xyz_j[..., 1] = xyz_j[..., 1] * fy + cy
        xyz_j[..., 0] = xyz_j[..., 0] * fx + cx + (xyz_j[..., 1] - cy) * sk / fy
        xyz_j[..., 0] = xyz_j[..., 0] / ((_w - 1) / 2) - 1
        xyz_j[..., 1] = xyz_j[..., 1] / ((_h - 1) / 2) - 1
        Hj, Dj, _ = xyz_j.shape
        xyz_j = xyz_j.view(1, Hj, Dj, 3)
        mvs_near, mvs_far = z_mvs_i[:, :1, :, :], z_mvs_i[:, -1:, :, :]
        bound_hw = 1.001
        invalid_j = ((xyz_j[..., 2] < 1e-5) | (xyz_j[..., 0] > bound_hw)
                     | (xyz_j[..., 0] < -bound_hw)
                     | (xyz_j[..., 1] > bound_hw)
                     | (xyz_j[..., 1] < -bound_hw))
        xyz_j[invalid_j, :] = -99.0
        near_j = grid_sample(mvs_near, xyz_j[..., :2], mode="bilinear",
                             padding_mode="zeros",
                             align_corners=True)[:, 0, :, :]
        far_j = grid_sample(mvs_far, xyz_j[..., :2], mode="bilinear",
                            padding_mode="zeros",
                            align_corners=True)[:, 0, :, :]
        if inverse_depth:
            far_j[invalid_j] = 1e-8
            xyz_j[..., 2] = 2 * (1.0 - near_j / xyz_j[..., 2]) / \
                (1.0 - near_j / far_j) - 1
        else:
            xyz_j[..., 2] = 2 * (xyz_j[..., 2] - near_j) / (far_j - near_j) - 1
        bound_z = 1.01
        invalid_j = ((near_j < 1e-5) | (far_j < 1e-5)
                     | (xyz_j[..., 2] > bound_z)
                     | (xyz_j[..., 2] < -bound_z) | invalid_j)
        xyz_j[invalid_j, :] = -99.0
        xyz_j = xyz_j.view(1, Hj, Dj, 1, 3).permute(0, 2, 1, 3, 4)
        cost_j = grid_sample(cost[None, ...], xyz_j, mode="bilinear",
                             padding_mode="zeros", align_corners=True)
        cost_j = cost_j.squeeze().permute(1, 0)
        if same_view:
            results_cost_mvs = cost_j
        else:
            results_cost_j += cost_j
            valid_mask = valid_mask | (~invalid_j[0, :, :])
    results_cost_mvs[~valid_mask] = 0.0
    return results_cost_j, results_cost_mvs, valid_mask


@pytest.mark.parametrize("inverse_depth", [False, True])
def test_cost_mapping_parity(inverse_depth, rng_np):
    import jax.numpy as jnp
    from s_volsdf_tpu.data.synthetic import make_sphere_scene
    from s_volsdf_tpu.ops.cost_mapping import MVSVolumes, cost_mapping

    scene = make_sphere_scene(3, (48, 64), cam_radius=2.5)
    R, S = 64, 30
    D, Hc, Wc = 12, 24, 32

    # World sample points along plausible rays toward the object.
    origins = scene.poses[:, :3, 3]
    t = rng_np.uniform(1.0, 4.0, (R, S)).astype(np.float32)
    t.sort(axis=1)
    dirs = -origins[0] + rng_np.standard_normal((R, 3)) * 0.3
    dirs = (dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)).astype(
        np.float32)
    xyz = origins[0] + t[..., None] * dirs[:, None, :]

    costs = rng_np.random((3, D, Hc, Wc)).astype(np.float32)
    near = rng_np.uniform(0.5, 1.0, (3, Hc, Wc)).astype(np.float32)
    far = near + rng_np.uniform(2.0, 3.0, (3, Hc, Wc)).astype(np.float32)

    # torch oracle
    t_out = torch_cost_mapping(
        torch.from_numpy(t.copy()),
        torch.from_numpy(xyz.copy()),
        [False, True, False],
        [torch.from_numpy(costs[i])[None] for i in range(3)],
        [torch.stack([torch.from_numpy(near[i]),
                      torch.from_numpy(far[i])])[None] for i in range(3)],
        [torch.from_numpy(scene.intrinsics[i]) for i in range(3)],
        [torch.from_numpy(scene.poses[i]) for i in range(3)],
        scene.img_res, inverse_depth=inverse_depth)

    mvs = MVSVolumes(
        prob=jnp.asarray(costs),
        z_slab=jnp.stack([jnp.asarray(near), jnp.asarray(far)], axis=1),
        intrinsics=jnp.asarray(scene.intrinsics),
        c2w=jnp.asarray(scene.poses),
        img_res=scene.img_res, inverse_depth=inverse_depth)
    onehot = jnp.asarray([0.0, 1.0, 0.0])
    pj, pi, valid = cost_mapping(jnp.asarray(t), jnp.asarray(xyz), onehot,
                                 mvs)

    np.testing.assert_allclose(np.asarray(pj), t_out[0].numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(pi), t_out[1].numpy(), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(valid), t_out[2].numpy())
