"""Visualization: depth colormaps, render panels.

Rebuild of /root/reference/helpers/utils.py:197-224 (JET depth
colormap) and the stacked RGB/depth/normal panel used for TensorBoard
(plots.py:17-31, vsdf.py:278-281), plus the mip-NeRF-style turbo depth
used by eval (plots.py:392-468) in a simplified form.
"""

from __future__ import annotations

from typing import Optional

import cv2
import numpy as np


def visualize_depth(depth: np.ndarray, mask: Optional[np.ndarray] = None,
                    depth_min: Optional[float] = None,
                    depth_max: Optional[float] = None,
                    direct: bool = False) -> np.ndarray:
    """JET-colormapped depth (helpers/utils.py:197-224). Returns a BGR
    uint8 image (cv2 convention, ready for cv2.imwrite)."""
    depth = np.array(depth, dtype=np.float64, copy=True)
    invalid = np.isnan(depth) | ~np.isfinite(depth)
    if mask is not None:
        invalid |= ~mask.astype(bool)
    valid = ~invalid
    if depth_min is None:
        depth_min = np.percentile(depth[valid], 5) if valid.any() else 0.0
    if depth_max is None:
        depth_max = np.percentile(depth[valid], 95) if valid.any() else 1.0
    depth = np.clip(depth, depth_min, depth_max)
    depth[invalid] = depth_max

    denom = max(depth_max - depth_min, 1e-12)
    scaled = np.uint8((depth - depth_min) / denom * 255)
    if not direct:
        scaled = 255 - scaled
        color = cv2.applyColorMap(scaled, cv2.COLORMAP_JET)
        color[invalid, :] = 0
        return color
    scaled[invalid] = 0
    return scaled


def depth_panel(depth: np.ndarray, acc: np.ndarray,
                acc_thresh: float = 0.2) -> np.ndarray:
    """Turbo-style depth panel masked by accumulation (RGB float in
    [0, 1]) for TB image grids (plots.py depth panels)."""
    d = np.array(depth, dtype=np.float64, copy=True)
    valid = acc >= acc_thresh
    if valid.any():
        lo, hi = np.percentile(d[valid], [2, 98])
    else:
        lo, hi = d.min(), d.max()
    d = np.clip((d - lo) / max(hi - lo, 1e-12), 0, 1)
    bgr = cv2.applyColorMap(np.uint8((1 - d) * 255), cv2.COLORMAP_TURBO)
    rgb = bgr[..., ::-1].astype(np.float32) / 255.0
    rgb[~valid] = 0.0
    return rgb


def stacked_panel(rgb_gt: np.ndarray, rgb: np.ndarray, depth: np.ndarray,
                  normal: np.ndarray, acc: np.ndarray) -> np.ndarray:
    """[GT | render | depth | normal] strip, RGB float (H, 4W, 3)
    (reference stacked_plot, plots.py:17-31)."""
    dep = depth_panel(depth, acc)
    nrm = np.clip((normal + 1.0) / 2.0, 0, 1)
    return np.concatenate(
        [np.clip(rgb_gt, 0, 1), np.clip(rgb, 0, 1), dep, nrm], axis=1)
