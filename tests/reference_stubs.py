"""Stubs for the reference code's deps missing in this image (loguru,
GPUtil, torchvision), so /root/reference models can be imported for
parity tests.

torchvision.ops.deform_conv2d is replaced with an exact pure-torch
implementation (per-tap bilinear sampling + weighted sum) matching the
documented semantics — slow but bit-accurate for small test tensors.
"""

import sys
import types

import torch


def _deform_conv2d(input, offset, weight, bias=None, stride=(1, 1),
                   padding=(0, 0), dilation=(1, 1), mask=None):
    """input: (B, Cin, H, W); offset: (B, 2K, H', W') interleaved
    (dy, dx); weight: (Cout, Cin, kh, kw); mask: (B, K, H', W')."""
    B, Cin, H, W = input.shape
    Cout, _, kh, kw = weight.shape
    K = kh * kw
    sh, sw = stride if isinstance(stride, tuple) else (stride, stride)
    ph, pw = padding if isinstance(padding, tuple) else (padding, padding)
    dh, dw = dilation if isinstance(dilation, tuple) else (dilation,) * 2
    OH = (H + 2 * ph - dh * (kh - 1) - 1) // sh + 1
    OW = (W + 2 * pw - dw * (kw - 1) - 1) // sw + 1

    ys = torch.arange(OH, dtype=input.dtype) * sh - ph
    xs = torch.arange(OW, dtype=input.dtype) * sw - pw
    base_y, base_x = torch.meshgrid(ys, xs, indexing="ij")

    out = torch.zeros(B, Cout, OH, OW, dtype=input.dtype)
    for k in range(K):
        ky, kx = divmod(k, kw)
        py = base_y[None] + ky * dh + offset[:, 2 * k]
        px = base_x[None] + kx * dw + offset[:, 2 * k + 1]
        # bilinear gather with zero padding
        gx = px / max(W - 1, 1) * 2 - 1
        gy = py / max(H - 1, 1) * 2 - 1
        grid = torch.stack([gx, gy], dim=-1)  # (B, OH, OW, 2)
        sampled = torch.nn.functional.grid_sample(
            input, grid, mode="bilinear", padding_mode="zeros",
            align_corners=True)  # (B, Cin, OH, OW)
        if mask is not None:
            sampled = sampled * mask[:, k:k + 1]
        w_k = weight[:, :, ky, kx]  # (Cout, Cin)
        out = out + torch.einsum("oc,bchw->bohw", w_k, sampled)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


def install_stubs():
    if "loguru" not in sys.modules:
        fake = types.ModuleType("loguru")

        class _L:
            def __getattr__(self, name):
                return lambda *a, **k: None

        fake.logger = _L()
        sys.modules["loguru"] = fake

    if "GPUtil" not in sys.modules:
        g = types.ModuleType("GPUtil")
        g.getFirstAvailable = lambda *a, **k: [0]
        sys.modules["GPUtil"] = g

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")
        ops.deform_conv2d = _deform_conv2d

        class DeformConv2d(torch.nn.Module):
            pass

        ops.DeformConv2d = DeformConv2d
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops

    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        sk.img_as_float32 = lambda x: x.astype("float32") / 255.0 \
            if x.dtype.kind == "u" else x.astype("float32")
        measure = types.ModuleType("skimage.measure")
        sk.measure = measure
        sys.modules["skimage"] = sk
        sys.modules["skimage.measure"] = measure

    if "imageio" not in sys.modules:
        try:
            import imageio  # noqa: F401
        except ImportError:
            sys.modules["imageio"] = types.ModuleType("imageio")

    if "hydra" not in sys.modules:
        # simple_ibr.py runs a @hydra.main-wrapped get_config() at
        # import (simple_ibr.py:8-14); make it a no-op so the module's
        # pure functions (Laplacian_Blending, get_dir_loc, ...) are
        # importable for parity tests. Tests set simple_ibr.args.
        hy = types.ModuleType("hydra")

        def _main(*a, **k):
            def deco(fn):
                def wrapped(*fa, **fk):
                    return None
                return wrapped
            return deco

        hy.main = _main
        sys.modules["hydra"] = hy

    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")

        class OmegaConf:
            pass

        class DictConfig(dict):
            pass

        oc.OmegaConf = OmegaConf
        oc.DictConfig = DictConfig
        sys.modules["omegaconf"] = oc

    # The reference hardcodes .cuda()/empty_cache inside model code
    # (CasMVSNet.py:642, 647); make them CPU no-ops for parity tests.
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.cuda.empty_cache = lambda: None

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
