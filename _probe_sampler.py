"""How much of the training fwd is the sampler's no-grad SDF evals,
and what does bf16-ing them buy?"""
import time
import jax, jax.numpy as jnp, numpy as np
from s_volsdf_tpu.config import load_config
from s_volsdf_tpu.data.synthetic import make_sphere_scene
from s_volsdf_tpu.models.network import (init_volsdf_params, render_rays,
                                         sdf_values)
from s_volsdf_tpu.models.sampler import error_bound_sample
from s_volsdf_tpu.utils.cameras import get_camera_params

cfg = load_config("dtu")
scene = make_sphere_scene(n_views=3, img_res=(cfg.max_h, cfg.max_w))
params = init_volsdf_params(jax.random.PRNGKey(0), cfg.model)
rng = np.random.default_rng(0)
H, W = scene.img_res
pix = rng.integers(0, H * W, size=512)
uv = jnp.asarray(np.stack([pix % W, pix // W], -1).astype(np.float32))[None]
pose = jnp.asarray(scene.poses[0])[None]
intr = jnp.asarray(scene.intrinsics[0])[None]
key = jax.random.PRNGKey(3)

def timeit(name, fn, *args, n=50):
    out = fn(*args); jax.tree.map(np.asarray, out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree.map(np.asarray, out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms")

ray_dirs, cam_loc = get_camera_params(uv, pose, intr)
ray_dirs, cam_loc0 = ray_dirs[0], jnp.broadcast_to(
    jnp.reshape(jax.numpy.asarray(cam_loc[0]), (1, 3)), (512, 3))

bs = cfg.model.scene_bounding_sphere

def sampler_only(p, k):
    sdf_fn = lambda pts: sdf_values(p["sdf"], cfg.model, pts, bs)
    out = error_bound_sample(k, cfg.model.sampler, ray_dirs, cam_loc0,
                             sdf_fn, jnp.asarray(0.1), n_iters=1,
                             training=True,
                             scene_bounding_sphere=bs)
    return out.z_vals
timeit("sampler_f32", jax.jit(sampler_only), params, key)

def sampler_bf16(p, k):
    p16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p["sdf"])
    def sdf_fn(pts):
        return sdf_values(p16, cfg.model, pts.astype(jnp.bfloat16),
                          bs).astype(jnp.float32)
    out = error_bound_sample(k, cfg.model.sampler, ray_dirs, cam_loc0,
                             sdf_fn, jnp.asarray(0.1), n_iters=1,
                             training=True,
                             scene_bounding_sphere=bs)
    return out.z_vals
try:
    timeit("sampler_bf16", jax.jit(sampler_bf16), params, key)
except Exception as e:
    print("bf16 sampler failed:", repr(e)[:200])

fwd = jax.jit(lambda p, k: render_rays(p, cfg.model, uv, pose, intr, k,
                                       training=True, fast=1).rgb_values)
timeit("fwd_render", fwd, params, key)
