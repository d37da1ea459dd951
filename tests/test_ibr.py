"""IBR test: blending GT-depth-warped views reproduces the eval view."""

import os

import numpy as np
import pytest

from s_volsdf_tpu.data.io import save_pfm, write_cam
from s_volsdf_tpu.data.synthetic import make_sphere_scene
from s_volsdf_tpu.engine.ibr import image_based_render, laplacian_blending


def test_laplacian_blending_identity(rng_np):
    img = rng_np.random((64, 64, 3))
    imgs = np.stack([img, img])
    masks = np.stack([np.full_like(img, 0.5), np.full_like(img, 0.5)])
    out = laplacian_blending(imgs, masks, num_levels=3)
    np.testing.assert_allclose(out, np.clip(img, 0, 1), atol=1e-6)


def test_image_based_render_on_synthetic(tmp_path, monkeypatch):
    """With perfect depths and renders, the blended eval view should be
    close to the GT eval image."""
    import imageio.v2 as imageio
    # 3 train views + 1 'eval' view on the same ring.
    scene = make_sphere_scene(n_views=4, img_res=(64, 96), cam_radius=2.5)
    train_ids, eval_id = [25, 22, 28], 1  # eval id from the DTU table

    scan_folder = str(tmp_path / "scan106")
    out_folder = str(tmp_path / "out")
    os.makedirs(out_folder, exist_ok=True)

    def write_view(vid, scene_idx, is_eval):
        K = scene.intrinsics[scene_idx]
        extr = np.linalg.inv(scene.poses[scene_idx])
        cam = np.zeros((2, 4, 4), np.float32)
        cam[0] = extr
        cam[1, :3, :3] = K[:3, :3]
        write_cam(os.path.join(scan_folder, f"cams/{vid:08d}_cam.txt"), cam)
        depth = scene.depths[scene_idx].copy()
        far = depth[np.isfinite(depth)].max() * 2
        depth[~np.isfinite(depth)] = far
        save_pfm(os.path.join(out_folder, f"depth_est/{vid:08d}.pfm"),
                 depth.astype(np.float32))
        img = (np.clip(scene.images[scene_idx], 0, 1) * 255).astype(np.uint8)
        if is_eval:
            imageio.imwrite(
                os.path.join(out_folder, f"eval_{vid:03d}.png"), img)
        else:
            os.makedirs(os.path.join(scan_folder, "images"), exist_ok=True)
            imageio.imwrite(
                os.path.join(scan_folder, f"images/{vid:08d}.png"), img)

    for i, vid in enumerate(train_ids):
        write_view(vid, i, is_eval=False)
    write_view(eval_id, 3, is_eval=True)

    # Restrict the eval list to our single view.
    import s_volsdf_tpu.engine.ibr as ibr_mod
    monkeypatch.setattr(ibr_mod, "get_eval_ids",
                        lambda *a, **k: [eval_id])

    written = image_based_render(scan_folder, out_folder, "DTU", 3)
    assert len(written) == 1 and os.path.exists(written[0])
    blend = np.asarray(imageio.imread(written[0]), np.float32) / 255.0
    gt = scene.images[3]
    mse = np.mean((blend - gt) ** 2)
    psnr = -10 * np.log10(mse)
    assert psnr > 20, f"IBR blend too far from GT: {psnr:.2f} dB"


def test_create_scene_exports(tmp_path):
    """create_scene (reference runner.py:74-108): cams for train AND
    eval views, images only for train views."""
    import os
    from s_volsdf_tpu.config import load_config
    from s_volsdf_tpu.data.fixtures import make_dtu_fixture
    from s_volsdf_tpu.data.splits import get_eval_ids, get_trains_ids
    from s_volsdf_tpu.engine.ibr import create_scene

    root = str(tmp_path / "data")
    make_dtu_fixture(root, scan_id=106, img_res=(64, 96))
    cfg = load_config("dtu", overrides=[
        "data_dir_root=" + root, "dataset.data_dir_root=" + root,
        "max_h=64", "max_w=96", "dataset.img_res=[64,96]",
        "mvs.numdepth=16", "mvs.x2_mvsres=false",
    ])
    create_scene(cfg, "scan106", exps_root=str(tmp_path))

    out = os.path.join(str(tmp_path), cfg.outdir, "scan106")
    trains = get_trains_ids("DTU", "scan106", 3)
    evals = get_eval_ids("DTU", 106)
    for v in trains:
        assert os.path.exists(os.path.join(out, f"cams/{v:08d}_cam.txt"))
        assert os.path.exists(os.path.join(out, f"images/{v:08d}.png"))
    for v in evals[:5]:
        assert os.path.exists(os.path.join(out, f"cams/{v:08d}_cam.txt"))
        assert not os.path.exists(os.path.join(out, f"images/{v:08d}.png"))
