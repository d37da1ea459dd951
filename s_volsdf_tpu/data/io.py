"""Host-side file IO: PFM, PLY, MVS cam files, images.

Rebuild of /root/reference/datasets/data_io.py (PFM) and
/root/reference/helpers/utils.py:13-74 (cam txt) plus a dependency-free
binary PLY writer replacing the reference's `plyfile` usage
(runner.py:392-404).
"""

from __future__ import annotations

import os
import re
import sys
from typing import Optional, Tuple

import numpy as np


# --------------------------------------------------------------------------
# PFM (data_io.py:6-71)
# --------------------------------------------------------------------------

def read_pfm(filename: str) -> Tuple[np.ndarray, float]:
    with open(filename, "rb") as f:
        header = f.readline().decode("utf-8").rstrip()
        if header == "PF":
            color = True
        elif header == "Pf":
            color = False
        else:
            raise ValueError("Not a PFM file.")

        dim_match = re.match(r"^(\d+)\s(\d+)\s$", f.readline().decode("utf-8"))
        if not dim_match:
            raise ValueError("Malformed PFM header.")
        width, height = map(int, dim_match.groups())

        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        scale = abs(scale)

        data = np.fromfile(f, endian + "f")
        shape = (height, width, 3) if color else (height, width)
        data = np.reshape(data, shape)
        data = np.flipud(data)
    return data, scale


def save_pfm(filename: str, image: np.ndarray, scale: float = 1.0) -> None:
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    image = np.flipud(image.astype(np.float32))
    if image.ndim == 3 and image.shape[2] == 3:
        color = True
    elif image.ndim == 2 or (image.ndim == 3 and image.shape[2] == 1):
        color = False
    else:
        raise ValueError("Image must be HxWx3, HxWx1 or HxW.")
    with open(filename, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{image.shape[1]} {image.shape[0]}\n".encode())
        endian = image.dtype.byteorder
        if endian == "<" or (endian == "=" and sys.byteorder == "little"):
            scale = -scale
        f.write(f"{scale}\n".encode())
        image.tofile(f)


# --------------------------------------------------------------------------
# PLY (binary little-endian, xyz + rgb) — replaces plyfile
# --------------------------------------------------------------------------

def save_ply(filename: str, xyz: np.ndarray,
             rgb: Optional[np.ndarray] = None,
             faces: Optional[np.ndarray] = None) -> None:
    """xyz: (N, 3) float; rgb: (N, 3) uint8 or None; faces: (M, 3)
    int or None (triangle mesh)."""
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    n = xyz.shape[0]
    with open(filename, "wb") as f:
        header = ["ply", "format binary_little_endian 1.0",
                  f"element vertex {n}",
                  "property float x", "property float y", "property float z"]
        if rgb is not None:
            header += ["property uchar red", "property uchar green",
                       "property uchar blue"]
        if faces is not None:
            header += [f"element face {faces.shape[0]}",
                       "property list uchar int vertex_indices"]
        header += ["end_header"]
        f.write(("\n".join(header) + "\n").encode())
        if rgb is None:
            xyz.astype("<f4").tofile(f)
        else:
            rec = np.empty(n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                                     ("r", "u1"), ("g", "u1"), ("b", "u1")])
            rec["x"], rec["y"], rec["z"] = xyz.T.astype(np.float32)
            rec["r"], rec["g"], rec["b"] = rgb.T.astype(np.uint8)
            rec.tofile(f)
        if faces is not None:
            m = faces.shape[0]
            frec = np.empty(m, dtype=[("n", "u1"), ("a", "<i4"),
                                      ("b", "<i4"), ("c", "<i4")])
            frec["n"] = 3
            frec["a"], frec["b"], frec["c"] = faces.T.astype(np.int32)
            frec.tofile(f)


def read_obj(filename: str) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal Wavefront OBJ triangle-mesh reader (vertices + faces).

    Supports `v x y z` and `f` lines with `v`, `v/vt`, `v/vt/vn`,
    `v//vn` index styles (1-based, negative-relative allowed); polygon
    faces are fan-triangulated. Enough for BlendedMVS textured_mesh
    .obj files (used by the GT-cloud generator, reference
    evals/eval_bmvs.py:139-181 reads them with open3d).
    Returns (verts (N,3) float64, faces (M,3) int64).
    """
    verts: list = []
    faces: list = []
    with open(filename, "r", errors="ignore") as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]),
                              float(parts[3])])
            elif line.startswith("f "):
                idx = []
                for tok in line.split()[1:]:
                    i = int(tok.split("/")[0])
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                for k in range(1, len(idx) - 1):  # fan triangulation
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return (np.asarray(verts, dtype=np.float64),
            np.asarray(faces, dtype=np.int64).reshape(-1, 3))


def load_ply(filename: str) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Minimal reader for the PLYs we write + common ascii/binary
    vertex-only files (enough for eval round-trips)."""
    with open(filename, "rb") as f:
        assert f.readline().strip() == b"ply"
        fmt = f.readline().strip().split()[1]
        n = 0
        props = []
        in_vertex = False   # currently inside the vertex element block
        while True:
            line = f.readline().strip()
            if line.startswith(b"element vertex"):
                n = int(line.split()[-1])
                in_vertex = True
            elif line.startswith(b"property") and in_vertex:
                props.append(line.split()[1:])
            elif line == b"end_header":
                break
            elif line.startswith(b"element"):
                in_vertex = False  # stop collecting vertex props
        type_map = {b"float": "<f4", b"float32": "<f4", b"double": "<f8",
                    b"uchar": "u1", b"uint8": "u1", b"int": "<i4"}
        if fmt == b"ascii":
            data = np.loadtxt(f, max_rows=n)
            xyz = data[:, :3].astype(np.float32)
            rgb = data[:, 3:6].astype(np.uint8) if data.shape[1] >= 6 else None
            return xyz, rgb
        dtype = np.dtype([(f"p{i}", type_map[p[0]])
                          for i, p in enumerate(props)])
        rec = np.fromfile(f, dtype=dtype, count=n)
        xyz = np.stack([rec["p0"], rec["p1"], rec["p2"]], -1).astype(np.float32)
        rgb = None
        if len(props) >= 6 and props[3][0] in (b"uchar", b"uint8"):
            rgb = np.stack([rec["p3"], rec["p4"], rec["p5"]], -1)
        return xyz, rgb


# --------------------------------------------------------------------------
# MVS cam txt (helpers/utils.py:13-21, 54-74)
# --------------------------------------------------------------------------

def read_camera_parameters(filename: str):
    with open(filename) as f:
        lines = [line.rstrip() for line in f.readlines()]
    extrinsics = np.fromstring(" ".join(lines[1:5]), dtype=np.float32,
                               sep=" ").reshape((4, 4))
    intrinsics = np.fromstring(" ".join(lines[7:10]), dtype=np.float32,
                               sep=" ").reshape((3, 3))
    return intrinsics, extrinsics


def write_cam(filename: str, cam: np.ndarray,
              near_far: Optional[np.ndarray] = None) -> None:
    """cam: (2, 4, 4) [extrinsic, intrinsic] (helpers/utils.py:54-74)."""
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    with open(filename, "w") as f:
        f.write("extrinsic\n")
        for i in range(4):
            f.write(" ".join(str(cam[0][i][j]) for j in range(4)) + "\n")
        f.write("\nintrinsic\n")
        for i in range(3):
            f.write(" ".join(str(cam[1][i][j]) for j in range(3)) + "\n")
        if near_far is not None:
            f.write("\n" + " ".join(str(x) for x in near_far) + "\n")


def read_img(path: str) -> np.ndarray:
    """RGB float32 in [0, 1] (helpers/utils.py read_img semantics)."""
    import imageio.v2 as imageio
    img = np.asarray(imageio.imread(path), dtype=np.float32) / 255.0
    return img


def glob_imgs(path: str):
    import glob
    imgs = []
    for ext in ("*.png", "*.jpg", "*.JPEG", "*.JPG", "*.bmp"):
        imgs.extend(glob.glob(os.path.join(path, ext)))
    return imgs
