"""Mesh extraction tests: native marching tetrahedra vs analytic SDFs."""

import jax.numpy as jnp
import numpy as np
import pytest

from s_volsdf_tpu.engine.mesh import (extract_mesh_by_grid,
                                      extract_mesh_high_res,
                                      extract_mesh_uniform,
                                      largest_component, marching_cubes,
                                      sample_surface)


def sphere_vol(n=48, r=0.6, bounds=(-1.0, 1.0)):
    xs = np.linspace(*bounds, n)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    vol = np.sqrt(gx ** 2 + gy ** 2 + gz ** 2) - r
    return vol.astype(np.float32), xs


def test_marching_cubes_sphere_accuracy():
    vol, xs = sphere_vol()
    spacing = (xs[1] - xs[0],) * 3
    verts, faces = marching_cubes(vol, 0.0, spacing)
    verts = verts + xs[0]
    assert verts.shape[0] > 500 and faces.shape[0] > 500
    r = np.linalg.norm(verts, axis=1)
    # Vertices lie on the 0.6-sphere within a voxel of error.
    assert np.abs(r - 0.6).max() < 2 * spacing[0], np.abs(r - 0.6).max()
    assert np.abs(r - 0.6).mean() < 0.25 * spacing[0]
    # Faces reference valid vertices.
    assert faces.min() >= 0 and faces.max() < verts.shape[0]


def test_marching_cubes_empty_and_full():
    vol = np.full((8, 8, 8), 1.0, np.float32)
    verts, faces = marching_cubes(vol, 0.0)
    assert verts.shape[0] == 0 and faces.shape[0] == 0


def test_surface_area_of_sphere():
    vol, xs = sphere_vol(n=64)
    spacing = (xs[1] - xs[0],) * 3
    verts, faces = marching_cubes(vol, 0.0, spacing)
    a = verts[faces[:, 1]] - verts[faces[:, 0]]
    b = verts[faces[:, 2]] - verts[faces[:, 0]]
    area = 0.5 * np.linalg.norm(np.cross(a, b), axis=1).sum()
    expected = 4 * np.pi * 0.6 ** 2
    assert abs(area - expected) / expected < 0.05, area


def test_largest_component_two_spheres():
    xs = np.linspace(-1, 1, 64)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    big = np.sqrt((gx + 0.4) ** 2 + gy ** 2 + gz ** 2) - 0.45
    small = np.sqrt((gx - 0.6) ** 2 + gy ** 2 + gz ** 2) - 0.15
    vol = np.minimum(big, small).astype(np.float32)
    verts, faces = marching_cubes(vol, 0.0, ((xs[1] - xs[0]),) * 3)
    verts = verts + xs[0]
    kept_v, kept_f = largest_component(verts, faces)
    # All surviving vertices belong to the big sphere.
    d_big = np.abs(np.linalg.norm(kept_v + [0.4, 0, 0], axis=1) - 0.45)
    assert d_big.max() < 0.08


def test_sample_surface_on_mesh():
    vol, xs = sphere_vol()
    verts, faces = marching_cubes(vol, 0.0, ((xs[1] - xs[0]),) * 3)
    verts = verts + xs[0]
    pts = sample_surface(verts, faces, 2000)
    r = np.linalg.norm(pts, axis=1)
    assert np.abs(r - 0.6).mean() < 0.02


def test_extract_mesh_pipelines_with_sdf_fn():
    sdf_fn = lambda p: jnp.linalg.norm(p, axis=-1) - 0.5

    m = extract_mesh_uniform(sdf_fn, resolution=48,
                             grid_boundary=(-1.0, 1.0))
    assert m is not None
    verts, faces = m
    assert np.abs(np.linalg.norm(verts, axis=1) - 0.5).mean() < 0.02

    m2 = extract_mesh_high_res(sdf_fn, resolution=64,
                               grid_boundary=(-1.0, 1.0))
    verts2, _ = m2
    assert np.abs(np.linalg.norm(verts2, axis=1) - 0.5).mean() < 0.01

    box = np.array([[-0.6, -0.6, -0.6], [0.6, 0.6, 0.6]])
    m3 = extract_mesh_by_grid(box, sdf_fn, resolution=48)
    assert m3 is not None


def test_mesh_no_surface_returns_none():
    sdf_fn = lambda p: jnp.linalg.norm(p, axis=-1) + 1.0  # never zero
    assert extract_mesh_uniform(sdf_fn, 32, (-1, 1)) is None


def test_eval_sdf_grid_sharded_matches_and_pads():
    """eval_sdf_grid: jitted fixed-chunk padding handles non-divisible
    point counts, and mesh-sharding the point axis is bit-identical."""
    from s_volsdf_tpu.engine.mesh import eval_sdf_grid
    from s_volsdf_tpu.parallel.mesh import make_mesh

    sdf_fn = lambda p: jnp.linalg.norm(p, axis=-1) - 0.5
    pts = np.random.default_rng(0).normal(
        size=(1000, 3)).astype(np.float32)  # 1000 % 64 != 0 -> padding
    ref = np.linalg.norm(pts, axis=-1) - 0.5

    solo = eval_sdf_grid(sdf_fn, pts, chunk=64)
    np.testing.assert_allclose(solo, ref, atol=1e-5)

    mesh = make_mesh((-1,), ("rays",))
    shard = eval_sdf_grid(sdf_fn, pts, chunk=64, mesh=mesh)
    np.testing.assert_array_equal(shard, solo)

    m = extract_mesh_uniform(sdf_fn, resolution=48,
                             grid_boundary=(-1.0, 1.0), mesh=mesh)
    verts, _ = m
    assert np.abs(np.linalg.norm(verts, axis=1) - 0.5).mean() < 0.02
