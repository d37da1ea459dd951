"""Eval stack tests: chamfer protocol, SSIM/PSNR, LPIPS plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s_volsdf_tpu.engine.eval_geo import chamfer, downsample_radius
from s_volsdf_tpu.utils.metrics import masked_psnr, ssim


def sphere_points(n, r, rng, noise=0.0):
    v = rng.standard_normal((n, 3))
    v = v / np.linalg.norm(v, axis=1, keepdims=True) * r
    if noise:
        v = v + rng.standard_normal((n, 3)) * noise
    return v.astype(np.float32)


def test_chamfer_identical_clouds(rng_np):
    pts = sphere_points(5000, 10.0, rng_np)
    r = chamfer(pts, pts.copy(), downsample=0.0)
    assert r["acc"] < 1e-5 and r["comp"] < 1e-5


def test_chamfer_known_offset(rng_np):
    """Two parallel planes distance d apart -> chamfer ~= d."""
    xy = rng_np.uniform(-50, 50, (20000, 2)).astype(np.float32)
    a = np.concatenate([xy, np.zeros((20000, 1), np.float32)], 1)
    b = np.concatenate([xy, np.full((20000, 1), 3.0, np.float32)], 1)
    r = chamfer(a, b, downsample=0.0)
    assert abs(r["acc"] - 3.0) < 0.05
    assert abs(r["comp"] - 3.0) < 0.05


def test_chamfer_outlier_clip(rng_np):
    """Points farther than max_dist are dropped (eval_dtu.py:140-166)."""
    pts = sphere_points(3000, 10.0, rng_np)
    outliers = pts[:100] + 500.0
    pred = np.concatenate([pts, outliers])
    r = chamfer(pred, pts, downsample=0.0, max_dist=20.0)
    assert r["acc"] < 1.0  # outliers clipped, not averaged in


def test_downsample_radius_spacing(rng_np):
    pts = rng_np.uniform(0, 10, (5000, 3)).astype(np.float32)
    down = downsample_radius(pts, radius=1.0)
    from scipy.spatial import cKDTree
    tree = cKDTree(down)
    d, _ = tree.query(down, k=2)
    assert d[:, 1].min() >= 1.0 - 1e-5  # no two kept points within r
    assert down.shape[0] < pts.shape[0]


def test_ssim_identical_and_noise(rng_np):
    img = rng_np.random((64, 64, 3)).astype(np.float64)
    assert abs(ssim(img, img) - 1.0) < 1e-9
    noisy = np.clip(img + 0.3 * rng_np.standard_normal(img.shape), 0, 1)
    s = ssim(img, noisy)
    assert 0.0 < s < 0.7


def test_ssim_matches_closed_form_constant_shift():
    """Uniform images with a luminance shift: SSIM = closed form
    (2*mu1*mu2 + c1) / (mu1^2 + mu2^2 + c1)."""
    a = np.full((32, 32), 0.4)
    b = np.full((32, 32), 0.6)
    c1 = 0.01 ** 2
    expected = (2 * 0.4 * 0.6 + c1) / (0.4 ** 2 + 0.6 ** 2 + c1)
    assert abs(ssim(a, b) - expected) < 1e-6


def test_masked_psnr():
    gt = np.zeros((10, 3))
    pred = np.zeros((10, 3))
    pred[5:] = 1.0
    mask = np.zeros((10, 3))
    mask[:5] = 1.0
    # Perfect within the mask -> infinite PSNR (guard with big value).
    p = masked_psnr(pred, gt, mask)
    assert p > 60 or np.isinf(p)


def test_lpips_shapes_and_zero_distance():
    from s_volsdf_tpu.models.lpips import (init_lpips_params,
                                           lpips_distance)
    params = init_lpips_params(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    d_same = lpips_distance(params, img, img)
    assert d_same.shape == (1,)
    assert float(d_same[0]) < 1e-6
    other = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
    d_diff = lpips_distance(params, img, other)
    assert float(d_diff[0]) > 0


def test_lpips_converter_shapes(rng_np):
    """Fabricated torch-`lpips`-package state_dict -> our pytree."""
    from tools.convert_ckpt import convert
    from s_volsdf_tpu.models.lpips import VGG_PLAN, lpips_distance

    slices = (("slice1", (0, 2)), ("slice2", (5, 7)),
              ("slice3", (10, 12, 14)), ("slice4", (17, 19, 21)),
              ("slice5", (24, 26, 28)))
    sd = {}
    cin = 3
    for bi, (sname, ids) in enumerate(slices):
        for ci, cout in zip(ids, VGG_PLAN[bi]):
            sd[f"net.{sname}.{ci}.weight"] = \
                rng_np.standard_normal((cout, cin, 3, 3)).astype(np.float32)
            sd[f"net.{sname}.{ci}.bias"] = np.zeros(cout, np.float32)
            cin = cout
        sd[f"lin{bi}.model.1.weight"] = np.abs(
            rng_np.standard_normal((1, cin, 1, 1))).astype(np.float32)

    params = convert("lpips", sd)
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
    other = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
    d = lpips_distance(params, img, other)
    assert d.shape == (1,) and float(d[0]) > 0
    assert float(lpips_distance(params, img, img)[0]) < 1e-6


def test_mesh_mode_chamfer(tmp_path, rng_np):
    """mesh-mode eval: sampled mesh vs a point cloud of the same
    sphere -> tiny chamfer."""
    from s_volsdf_tpu.data.io import save_ply
    from s_volsdf_tpu.engine.mesh import marching_cubes
    from s_volsdf_tpu.engine.eval_geo import chamfer, mesh_to_pcd

    xs = np.linspace(-12, 12, 48)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    vol = np.sqrt(gx**2 + gy**2 + gz**2) - 8.0
    verts, faces = marching_cubes(vol.astype(np.float32), 0.0,
                                  ((xs[1]-xs[0]),)*3)
    verts = verts + xs[0]
    ply = str(tmp_path / "mesh.ply")
    save_ply(ply, verts, faces=faces)

    pcd = mesh_to_pcd(ply, target_density=0.5)
    assert pcd.shape[0] > verts.shape[0]
    gt = sphere_points(20000, 8.0, rng_np)
    r = chamfer(pcd, gt, downsample=0.5)
    assert r["overall"] < 0.6, r


def test_save_bmvs_gt(tmp_path):
    import os
    """--save_gt: merge textured .obj meshes, area-uniform 100K-style
    sampling, write stl/scan{n}.ply (+ optional plane crop); samples
    must lie on the union of the input surfaces (reference
    eval_bmvs.py:139-181)."""
    from s_volsdf_tpu.data.splits import scan2hash
    from s_volsdf_tpu.data.io import load_ply
    from s_volsdf_tpu.engine.eval_geo import save_bmvs_gt

    mesh_dir = tmp_path / "meshes" / scan2hash("scan1") / "textured_mesh"
    mesh_dir.mkdir(parents=True)
    # Two axis-aligned unit quads (z=0 and z=2), each two triangles,
    # written as separate .obj files with v/vt/vn-style faces.
    (mesh_dir / "a.obj").write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1/1/1 2/2/2 3/3/3\nf 1 3 4\n")
    (mesh_dir / "b.obj").write_text(
        "v 0 0 2\nv 1 0 2\nv 1 1 2\nv 0 1 2\n"
        "f 1//1 2//2 3//3 4//4\n")   # quad -> fan-triangulated
    root = str(tmp_path / "data")

    out = save_bmvs_gt(1, str(tmp_path / "meshes"), root,
                       n_samples=5000, crop_min_z=1.0)
    pts_full, _ = load_ply(os.path.join(root, "BlendedMVS", "stl",
                                        "scan1.ply"))
    pts_crop, _ = load_ply(out)
    assert pts_full.shape == (5000, 3)
    # Every sample on one of the two planes, inside the unit square.
    on_planes = (np.isclose(pts_full[:, 2], 0.0)
                 | np.isclose(pts_full[:, 2], 2.0))
    assert on_planes.all()
    assert (pts_full[:, :2] >= -1e-6).all() and (pts_full[:, :2] <= 1 + 1e-6).all()
    # Equal areas -> roughly half the samples per plane.
    frac = np.isclose(pts_full[:, 2], 2.0).mean()
    assert 0.4 < frac < 0.6
    # Crop keeps exactly the z=2 plane.
    assert np.isclose(pts_crop[:, 2], 2.0).all()
    assert pts_crop.shape[0] == np.isclose(pts_full[:, 2], 2.0).sum()


def test_downsample_radius_chunked_matches_oneshot():
    """Streaming the neighbor queries must not change the greedy
    result (identical mask for any chunk size)."""
    from s_volsdf_tpu.engine.eval_geo import downsample_radius

    rng = np.random.default_rng(5)
    pts = rng.random((4000, 3)).astype(np.float32) * 10
    # native=False: chunking only exists on the scipy fallback path
    a = downsample_radius(pts, radius=0.4, rng=np.random.default_rng(1),
                          chunk=10_000_000, native=False)   # one-shot
    b = downsample_radius(pts, radius=0.4, rng=np.random.default_rng(1),
                          chunk=257, native=False)  # many tiny chunks
    np.testing.assert_array_equal(a, b)
    # Kept points are pairwise > radius apart.
    from scipy.spatial import cKDTree
    d, _ = cKDTree(a).query(a, k=2)
    assert (d[:, 1] > 0.4).all()


@pytest.mark.slow
def test_render_eval_views_all_views_scene(tmp_path):
    """The eval path loads the scene with num_views=-1 (reference
    eval_vsdf.py:66); rendering with include_train must resolve the
    3-view protocol train ids, not consult the dataset's num_views
    (regression: get_trains_ids raised NotImplementedError)."""
    import os
    import jax
    from s_volsdf_tpu.config import load_config
    from s_volsdf_tpu.data.fixtures import make_dtu_fixture
    from s_volsdf_tpu.data.scene_dataset import load_scene
    from s_volsdf_tpu.engine.eval_nvs import (eval_rendered_views,
                                              render_eval_views)
    from s_volsdf_tpu.models.network import init_volsdf_params

    root = str(tmp_path / "data")
    make_dtu_fixture(root, scan_id=106, img_res=(32, 48))
    cfg = load_config("dtu", overrides=[
        "dataset.img_res=[32,48]", "max_h=32", "max_w=48",
        f"data_dir_root={root}", f"dataset.data_dir_root={root}",
        "model.implicit.dims=[16,16]", "model.implicit.skip_in=[]",
        "model.rendering.dims=[16]", "model.feature_vector_size=16",
        "model.sampler.N_samples=6", "model.sampler.N_samples_eval=8",
        "model.sampler.N_samples_extra=2",
    ])
    scene = load_scene("DTU", (32, 48), 106, -1, root)
    params = init_volsdf_params(jax.random.PRNGKey(0), cfg.model)
    images_dir = str(tmp_path / "renders")
    os.makedirs(images_dir, exist_ok=True)
    vids = render_eval_views(cfg, scene, params, images_dir,
                             include_train=True)
    # Eval views + the 3 protocol train views, each with artifacts.
    assert set(vids) >= {25, 22, 28}
    for vid in vids:
        assert os.path.exists(os.path.join(images_dir,
                                           f"eval_{vid:03d}.png"))
        assert os.path.exists(os.path.join(images_dir, "depth_est",
                                           f"{vid:08d}.pfm"))
    res = eval_rendered_views(cfg, scene, images_dir)
    assert res["n_views"] > 0 and res["psnr_mean"] is not None


def test_dtu_bbs_lookup_remap_and_key_formats(tmp_path):
    """The reference remaps box-less scans (82->83, 21/34/38->24,
    eval_vsdf.py:122-128) and keys the official bbs.npz by
    str(scan_id); synthetic fixtures key by 'scan{id}'."""
    from s_volsdf_tpu.engine.eval_nvs import dtu_bbs_lookup

    box83 = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
    box24 = np.array([[-2, -2, -2], [2, 2, 2]], np.float32)
    official = tmp_path / "bbs.npz"
    np.savez(official, **{"83": box83, "24": box24, "106": box83 * 3})
    bbs = np.load(official)
    np.testing.assert_array_equal(dtu_bbs_lookup(bbs, 82), box83)
    for sid in (21, 34, 38):
        np.testing.assert_array_equal(dtu_bbs_lookup(bbs, sid), box24)
    np.testing.assert_array_equal(dtu_bbs_lookup(bbs, 106), box83 * 3)

    fixture = tmp_path / "bbs_fixture.npz"
    np.savez(fixture, scan106=box24)
    np.testing.assert_array_equal(
        dtu_bbs_lookup(np.load(fixture), 106), box24)


def test_export_mesh_uses_plot_grid_boundary(tmp_path):
    """export_mesh's BMVS path must honor cfg.plot.grid_boundary
    (reference eval_vsdf.py:113-120 reads conf plot.grid_boundary,
    NOT the scene bounding sphere). The geometric-init SDF is ~a
    sphere of radius model.implicit.bias=0.6: a (-0.2, 0.2) boundary
    excludes the surface entirely -> no mesh; the default (-1.5, 1.5)
    contains it -> mesh written."""
    import os

    import jax
    from s_volsdf_tpu.config import load_config
    from s_volsdf_tpu.data.fixtures import make_dtu_fixture
    from s_volsdf_tpu.data.scene_dataset import load_scene
    from s_volsdf_tpu.engine.eval_nvs import export_mesh
    from s_volsdf_tpu.models.network import init_volsdf_params

    root = str(tmp_path / "data")
    make_dtu_fixture(root, scan_id=106, img_res=(32, 48))
    cfg = load_config("dtu", overrides=[
        "dataset.img_res=[32,48]", "max_h=32", "max_w=48",
        "model.implicit.dims=[16,16]", "model.implicit.skip_in=[]",
        "model.rendering.dims=[16]", "model.feature_vector_size=16",
    ])
    scene = load_scene("DTU", (32, 48), 106, 3, root)
    params = {"sdf": init_volsdf_params(jax.random.PRNGKey(0),
                                        cfg.model)["sdf"]}

    cfg.plot.grid_boundary = (-0.2, 0.2)
    out = export_mesh(cfg, scene, params, str(tmp_path / "none.ply"),
                      resolution=48)
    assert out is None

    cfg.plot.grid_boundary = (-1.5, 1.5)
    out = export_mesh(cfg, scene, params, str(tmp_path / "mesh.ply"),
                      resolution=48)
    assert out is not None and os.path.getsize(out) > 0


def test_write_error_clouds_coloring(tmp_path):
    """Error-cloud semantics (eval_dtu.py:169-187): evaluated points
    fade white->red with distance, >=max_dist points are green,
    excluded points stay blue."""
    from s_volsdf_tpu.data.io import load_ply
    from s_volsdf_tpu.engine.eval_geo import chamfer, write_error_clouds

    gt = np.array([[0, 0, 0], [10, 0, 0]], np.float32)
    # pred: exact hit, 5mm off (alpha=0.5 at vis_dist=10), 30mm off
    # (beyond max_dist=20 -> green)
    pred = np.array([[0, 0, 0], [10, 5, 0], [0, 30, 0]], np.float32)
    res = chamfer(pred, gt, downsample=0.0, want_detail=True)
    d2s_ply = str(tmp_path / "d2s.ply")
    s2d_ply = str(tmp_path / "s2d.ply")
    write_error_clouds(res["detail"], d2s_ply, s2d_ply, vis_dist=10.0)

    pts, rgb = load_ply(d2s_ply)
    assert rgb is not None and pts.shape == pred.shape
    by_pt = {tuple(p): c for p, c in zip(pts.tolist(), rgb.tolist())}
    assert by_pt[(0.0, 0.0, 0.0)] == [255, 255, 255]   # zero error: white
    assert by_pt[(0.0, 30.0, 0.0)] == [0, 255, 0]      # clipped: green
    mid = by_pt[(10.0, 5.0, 0.0)]
    assert mid[0] == 255 and 100 < mid[1] < 160        # half red

    pts2, rgb2 = load_ply(s2d_ply)
    assert rgb2 is not None and pts2.shape == gt.shape


def test_bmvs_protocol_skips_downsampling(tmp_path, rng_np):
    """The reference BMVS eval never thins the prediction cloud
    (eval_bmvs.py:192 uses 0.2 only as the sklearn NN radius param);
    eval_bmvs_scan must therefore default to downsample=0."""
    from s_volsdf_tpu.data.io import save_ply
    from s_volsdf_tpu.engine.eval_geo import (BMVS_RELATIVE_SCALE,
                                              chamfer, eval_bmvs_scan)

    scan = 4
    s = BMVS_RELATIVE_SCALE[scan]
    # A tight cluster (within 0.2mm in rescaled units) of points at
    # different distances from GT: thinning would keep one arbitrary
    # member and shift the mean; no thinning averages all of them.
    base = np.array([[0, 0, 0]], np.float32)
    cluster = base + rng_np.uniform(0, 0.05 * s, (50, 3)).astype(np.float32)
    far = np.array([[10 * s, 0, 0]], np.float32)
    pred = np.concatenate([cluster, far])
    gt = np.array([[0, 0, 0]], np.float32)

    root = tmp_path / "data"
    stl_dir = root / "BlendedMVS" / "stl"
    stl_dir.mkdir(parents=True)
    save_ply(str(stl_dir / f"scan{scan}.ply"), gt)
    pred_ply = str(tmp_path / f"mvsnet{scan:03d}_l3.ply")
    save_ply(pred_ply, pred)

    r = eval_bmvs_scan(pred_ply, scan, str(root), no_crop=True)
    expect = chamfer(pred / s, gt / s, downsample=0.0)
    assert r["acc"] == pytest.approx(expect["acc"], rel=1e-6)
    assert r["comp"] == pytest.approx(expect["comp"], rel=1e-6)


def test_find_checkpoint_timestamp_and_ckpt_dir(tmp_path):
    """Discovery options (eval_vsdf.py:40-93): explicit timestamp and
    explicit ckpt_dir override the newest-run scan."""
    from s_volsdf_tpu.engine.eval_nvs import find_checkpoint

    expdir = tmp_path / "exps" / "ours_106"
    for ts in ("2024_01_01", "2024_06_01"):
        d = expdir / ts / "checkpoints" / "latest"
        d.mkdir(parents=True)
        (d / "state.npz").write_bytes(b"x")
    # empty newer run: must be skipped by the 'latest' scan
    (expdir / "2024_12_31" / "checkpoints").mkdir(parents=True)

    got = find_checkpoint(str(expdir))
    assert got is not None and "2024_06_01" in got
    got = find_checkpoint(str(expdir), timestamp="2024_01_01")
    assert got is not None and "2024_01_01" in got
    assert find_checkpoint(str(expdir), timestamp="2099_01_01") is None
    run_dir = str(expdir / "2024_01_01")
    got = find_checkpoint("ignored", ckpt_dir=run_dir)
    assert got is not None and got.startswith(run_dir)


def test_ssim_data_range_two_matches_reference_semantics():
    """The reference's eval calls skimage 0.17.2 structural_similarity
    with float input and NO data_range, which resolves to the float
    dtype range (-1,1) -> data_range=2.0 (eval_vsdf.py:207 +
    requirements.txt:18). Closed form for constant images with c_i
    scaled by (k_i * 2)^2."""
    a = np.full((32, 32), 0.4)
    b = np.full((32, 32), 0.6)
    c1 = (0.01 * 2.0) ** 2
    expected = (2 * 0.4 * 0.6 + c1) / (0.4 ** 2 + 0.6 ** 2 + c1)
    assert abs(ssim(a, b, data_range=2.0) - expected) < 1e-6
    # and on structured images the range choice genuinely moves the
    # score (c2 enters the contrast/structure term)
    rng = np.random.default_rng(0)
    x = rng.random((48, 64))
    y = np.clip(x + 0.2 * rng.standard_normal(x.shape), 0, 1)
    assert abs(ssim(x, y, data_range=2.0) - ssim(x, y)) > 1e-3


def test_downsample_native_matches_python():
    """The native grid-hash downsample (native/downsample.cpp) must
    reproduce the scipy greedy loop bit-for-bit, in both float32 and
    float64 (BMVS-rescaled) inputs, including duplicate points."""
    from s_volsdf_tpu.engine.eval_geo import (_load_native_downsample,
                                              downsample_radius)
    if _load_native_downsample() is None:
        pytest.skip("native downsample unavailable")

    rng = np.random.default_rng(11)
    pts = (rng.standard_normal((30000, 3)) * 5).astype(np.float32)
    pts[1000:1100] = pts[0]          # exact duplicates
    for arr in (pts, (pts.astype(np.float64) / 0.0015)):
        a = downsample_radius(arr, 0.3, native=True)
        b = downsample_radius(arr, 0.3, native=False)
        np.testing.assert_array_equal(a, b)
