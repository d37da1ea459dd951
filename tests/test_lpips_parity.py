"""Numeric validation of the JAX LPIPS (models/lpips.py) against a
torch oracle built from the exact state_dict layout that
tools/convert_ckpt.convert_lpips consumes (the `lpips` pip package's
net-lin/vgg format, mirroring /root/reference/lpips_tensorflow/
lpips_tf.py:29-90 behavior). Random weights: if these transfer
bit-for-purpose, the released lpips_vgg weights do too."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

SLICES = (("slice1", (0, 2)), ("slice2", (5, 7)),
          ("slice3", (10, 12, 14)), ("slice4", (17, 19, 21)),
          ("slice5", (24, 26, 28)))
PLAN = ((64, 64), (128, 128), (256, 256, 256),
        (512, 512, 512), (512, 512, 512))


def make_random_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}
    cin = 3
    for i, ((name, ids), block) in enumerate(zip(SLICES, PLAN)):
        for ci, cout in zip(ids, block):
            sd[f"net.{name}.{ci}.weight"] = torch.empty(
                cout, cin, 3, 3).uniform_(-0.05, 0.05, generator=g)
            sd[f"net.{name}.{ci}.bias"] = torch.empty(cout).uniform_(
                -0.1, 0.1, generator=g)
            cin = cout
        sd[f"lin{i}.model.1.weight"] = torch.empty(
            1, cin, 1, 1).uniform_(0.0, 0.02, generator=g)
    return sd


def torch_lpips(sd, im0, im1):
    """Oracle: the lpips package's net-lin/vgg forward (normalize=True
    input range [0,1]), written directly from the state_dict."""
    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)

    def feats(x):
        x = 2.0 * x - 1.0
        x = (x - shift) / scale
        taps = []
        for si, (name, ids) in enumerate(SLICES):
            if si > 0:
                x = F.max_pool2d(x, 2)
            for ci in ids:
                x = F.relu(F.conv2d(x, sd[f"net.{name}.{ci}.weight"],
                                    sd[f"net.{name}.{ci}.bias"],
                                    padding=1))
            taps.append(x)
        return taps

    f0, f1 = feats(im0), feats(im1)
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = (na - nb) ** 2
        w = sd[f"lin{i}.model.1.weight"]
        total = total + F.conv2d(d, w).mean(dim=(2, 3)).squeeze(1)
    return total


def test_lpips_matches_torch_oracle():
    import jax.numpy as jnp
    from tools.convert_ckpt import convert
    from s_volsdf_tpu.models.lpips import lpips_distance

    sd = make_random_state_dict()
    params = convert("lpips", sd)

    rng = np.random.default_rng(0)
    im0 = rng.random((2, 48, 64, 3)).astype(np.float32)
    im1 = np.clip(im0 + rng.normal(0, 0.15, im0.shape), 0, 1) \
        .astype(np.float32)

    t = torch_lpips(sd, torch.from_numpy(im0.transpose(0, 3, 1, 2)),
                    torch.from_numpy(im1.transpose(0, 3, 1, 2)))
    j = lpips_distance(params, jnp.asarray(im0), jnp.asarray(im1))
    np.testing.assert_allclose(np.asarray(j), t.numpy(),
                               rtol=1e-4, atol=1e-6)


def test_lpips_identity_and_order():
    import jax.numpy as jnp
    from tools.convert_ckpt import convert
    from s_volsdf_tpu.models.lpips import lpips_distance

    params = convert("lpips", make_random_state_dict(1))
    rng = np.random.default_rng(2)
    im = rng.random((1, 32, 32, 3)).astype(np.float32)
    near = np.clip(im + rng.normal(0, 0.02, im.shape), 0, 1).astype(np.float32)
    far = rng.random((1, 32, 32, 3)).astype(np.float32)

    d_same = float(lpips_distance(params, jnp.asarray(im), jnp.asarray(im))[0])
    d_near = float(lpips_distance(params, jnp.asarray(im), jnp.asarray(near))[0])
    d_far = float(lpips_distance(params, jnp.asarray(im), jnp.asarray(far))[0])
    assert d_same < 1e-8
    assert d_same < d_near < d_far
