"""IDR-format scene loader (VolSDF side).

Behavioral rebuild of
/root/reference/volsdf/datasets/scene_dataset.py:94-282 as a plain
host-side numpy container (no torch DataLoader): images, cameras and
masks are loaded once; batches are numpy slices handed to the jitted
step. Pixel sampling uses an explicit numpy Generator instead of
global torch RNG state.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

from s_volsdf_tpu.data.splits import get_eval_ids, get_near_id, get_trains_ids
from s_volsdf_tpu.utils.cameras import load_K_Rt_from_P


def _load_rgb(path: str) -> np.ndarray:
    import imageio.v2 as imageio
    img = np.asarray(imageio.imread(path), dtype=np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    return img


@dataclass
class SceneData:
    """One scene in memory. rgb layouts are (V, H*W, 3) flattened rows
    matching the reference's per-pixel indexing."""
    data_dir: str
    scan_id: int
    img_res: Tuple[int, int]
    num_views: int
    intrinsics: np.ndarray          # (V, 4, 4)
    poses: np.ndarray               # (V, 4, 4) c2w
    rgb: np.ndarray                 # (V, H*W, 3)
    rgb_smooth: np.ndarray          # (V, H*W, 3)
    masks: np.ndarray               # (V, H*W, 3)
    scale_factor: float
    scale_mat: Optional[np.ndarray]

    @property
    def n_images(self) -> int:
        return self.rgb.shape[0]

    @property
    def total_pixels(self) -> int:
        return self.img_res[0] * self.img_res[1]

    def trains_ids(self) -> List[int]:
        return get_trains_ids(self.data_dir, f"scan{self.scan_id}",
                              self.num_views)

    def eval_ids(self) -> List[int]:
        return get_eval_ids(self.data_dir, self.scan_id)

    def near_pose(self, idx: int) -> Optional[np.ndarray]:
        if self.data_dir == "BlendedMVS":
            return self.poses[get_near_id(self.data_dir, self.scan_id, idx)]
        return None

    def uv_grid(self) -> np.ndarray:
        """Full pixel grid (H*W, 2) as (x, y) — scene_dataset.py:227-229."""
        H, W = self.img_res
        ys, xs = np.mgrid[0:H, 0:W]
        return np.stack([xs, ys], axis=-1).reshape(-1, 2).astype(np.float32)

    def sample_batch(self, rng: np.random.Generator, n_rays: int,
                     view: Optional[int] = None) -> Dict[str, np.ndarray]:
        """Random training view + random pixel subset — the reference's
        __getitem__ + change_sampling_idx (scene_dataset.py:215-251)."""
        train_ids = self.trains_ids()
        idx = train_ids[int(rng.integers(len(train_ids)))] \
            if view is None else view
        pix = rng.permutation(self.total_pixels)[:n_rays]
        uv = self.uv_grid()[pix]
        onehot = np.zeros(len(train_ids), np.float32)
        onehot[train_ids.index(idx)] = 1.0
        batch = {
            "uv": uv[None],
            "rgb": self.rgb[idx][pix][None],
            "rgb_smooth": self.rgb_smooth[idx][pix][None],
            "pose": self.poses[idx][None],
            "intrinsics": self.intrinsics[idx][None],
            "view_onehot": onehot,
        }
        return batch


def load_scene(data_dir: str, img_res: Tuple[int, int], scan_id: int,
               num_views: int, data_dir_root: str) -> SceneData:
    """Load an IDR-format scene directory (scene_dataset.py:96-206)."""
    H, W = img_res
    instance_dir = os.path.join(data_dir_root, data_dir, f"scan{scan_id}")
    image_dir = os.path.join(instance_dir, "image")
    cam_file = os.path.join(instance_dir, "cameras.npz")
    if not os.path.exists(cam_file) and int(scan_id) < 200:
        cam_file = os.path.join(data_dir_root, data_dir, "scan114",
                                "cameras.npz")
    assert os.path.exists(image_dir), f"missing {image_dir}"
    assert os.path.exists(cam_file), f"missing {cam_file}"

    from s_volsdf_tpu.data.io import glob_imgs
    image_paths = sorted(glob_imgs(image_dir))
    n_images = len(image_paths)
    cams = np.load(cam_file)
    scale_mats = [cams[f"scale_mat_{i}"].astype(np.float32)
                  for i in range(n_images)]
    world_mats = [cams[f"world_mat_{i}"].astype(np.float32)
                  for i in range(n_images)]

    first = _load_rgb(image_paths[0])
    scale_h = H / first.shape[0]
    scale_w = W / first.shape[1]

    scale_factor = float(scale_mats[0][0, 0])
    if scan_id == 5 and data_dir == "BlendedMVS":
        # scale_mat for scan5 is wrong; use 1 (scene_dataset.py:146-148).
        scale_factor = 1.0

    mask_root = os.path.join(data_dir_root, data_dir, "eval_mask")

    def dtu_mask_path(i):
        p = os.path.join(mask_root, f"scan{scan_id}", "mask", f"{i:03d}.png")
        if not os.path.exists(p):
            p = os.path.join(mask_root, f"scan{scan_id}", f"{i:03d}.png")
        return p

    intrinsics_all, poses, rgbs, smooths, masks = [], [], [], [], []
    eval_ids = get_eval_ids(data_dir, scan_id)
    train_ids = get_trains_ids(data_dir, f"scan{scan_id}", 3) \
        if data_dir == "BlendedMVS" else []

    for i, path in enumerate(image_paths):
        P = (world_mats[i] @ scale_mats[i])[:3, :4]
        intr, pose = load_K_Rt_from_P(P)
        intr[0, :] *= scale_w
        intr[1, :] *= scale_h
        intrinsics_all.append(intr)
        poses.append(pose)

        img = _load_rgb(path)[..., :3]
        if scale_h != 1 or scale_w != 1:
            img = cv2.resize(img, (W, H), interpolation=cv2.INTER_CUBIC)
        rgbs.append(img.reshape(-1, 3))
        # 31x31 sigma-90 Gaussian blur for the annealed RGB target
        # (scene_dataset.py:171-175).
        smooths.append(cv2.GaussianBlur(img, (31, 31), 90).reshape(-1, 3))

        mask = np.ones((H * W, 3), np.float32)
        if data_dir == "DTU" and i in eval_ids and \
                scan_id not in (1, 4, 11, 13, 48):
            mp = dtu_mask_path(i)
            if os.path.exists(mp):
                m = _load_rgb(mp)[..., :3]
                m = (m == 1).astype(np.float32)
                m = cv2.resize(m, (W, H), interpolation=cv2.INTER_NEAREST)
                mask = (m > 0.5).astype(np.float32).reshape(-1, 3)
        elif data_dir == "BlendedMVS" and i in (eval_ids + train_ids):
            mp = os.path.join(mask_root, f"scan{scan_id}", "mask",
                              f"{i:08d}.png")
            if os.path.exists(mp):
                m = _load_rgb(mp)
                assert m.ndim == 3 and m.shape[2] == 4
                m = np.stack([m[..., -1]] * 3, -1)
                m = cv2.resize(m, (W, H), interpolation=cv2.INTER_NEAREST)
                mask = (m > 0.5).astype(np.float32).reshape(-1, 3)
        masks.append(mask)

    return SceneData(
        data_dir=data_dir, scan_id=scan_id, img_res=img_res,
        num_views=num_views,
        intrinsics=np.stack(intrinsics_all).astype(np.float32),
        poses=np.stack(poses).astype(np.float32),
        rgb=np.stack(rgbs), rgb_smooth=np.stack(smooths),
        masks=np.stack(masks),
        scale_factor=scale_factor, scale_mat=scale_mats[0])
