"""2D (scene x rays) mesh timing — VERDICT r4 item 7.

The pod-scale topology (parallel/train_parallel.py:
make_sharded_scene_ray_train_fn) has correctness coverage
(test_parallel.py, test_dryrun_scaling.py) but no committed timing at
any device count. This measures the production sharded chunk on
virtual CPU meshes of 8/16/32 devices with the ray submesh FIXED at 4
chips and one scene per scene-chip (weak scaling over scenes:
2x4 -> 4x4 -> 8x4).

On this host all virtual devices time-share ONE physical core, so
wall-clock per step necessarily grows with total device count; the
scaling signal is wall per step PER SCENE at a fixed ray submesh —
flat means adding scene rows adds no cross-scene overhead (no
collective whose cost grows with the scene axis; the gradient pmean
rides the ray submesh only), which is what makes the topology
scene-scalable one-per-chip on real ICI. A bend upward = growing
cross-scene traffic or compile-side scheduling overhead.

Each device count needs its own process (device count is fixed at
backend init), so the parent spawns one subprocess per row.

Usage: python tools/bench_mesh2d.py [--steps 16] [--chunks 3]
       [--out runs/MESH2D_BENCH.json]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = r"""
import json, sys, time
import __graft_entry__ as g
n_devices, n_scenes, n_ray, steps, chunks = map(int, sys.argv[1:6])
g._force_cpu_mesh(n_devices)
import jax, jax.numpy as jnp, numpy as np
from s_volsdf_tpu.data.synthetic import make_sphere_scene
from s_volsdf_tpu.engine.train_step import init_train_state, make_optimizer
from s_volsdf_tpu.engine.trainer import stack_states
from s_volsdf_tpu.models.network import init_volsdf_params
from s_volsdf_tpu.ops.cost_mapping import MVSVolumes
from s_volsdf_tpu.parallel.mesh import make_mesh
from s_volsdf_tpu.parallel.train_parallel import (
    make_sharded_scene_ray_train_fn)

cfg = g._tiny_cfg()
scene = make_sphere_scene(n_views=3, img_res=(32, 48))
tx = make_optimizer(cfg)

D, Hc, Wc = 16, 16, 24
prob = jax.random.uniform(jax.random.PRNGKey(1), (3, D, Hc, Wc))
prob = prob / prob.sum(axis=1, keepdims=True)
z_slab = jnp.stack([jnp.full((3, Hc, Wc), 0.5),
                    jnp.full((3, Hc, Wc), 5.0)], axis=1)
mvs = MVSVolumes(prob=prob, z_slab=z_slab,
                 intrinsics=jnp.asarray(scene.intrinsics),
                 c2w=jnp.asarray(scene.poses),
                 img_res=scene.img_res, inverse_depth=False)
scene_dev = {
    "rgb": jnp.asarray(scene.images.reshape(3, -1, 3)),
    "rgb_smooth": jnp.asarray(scene.images.reshape(3, -1, 3)),
    "poses": jnp.asarray(scene.poses),
    "intrinsics": jnp.asarray(scene.intrinsics),
}

mesh = make_mesh((n_scenes, n_ray), ("scene", "rays"),
                 devices=jax.devices()[:n_scenes * n_ray])
fn = make_sharded_scene_ray_train_fn(cfg, tx, mesh, use_mvs=True,
                                     n_views=3, img_res=scene.img_res)
states = stack_states([
    init_train_state(
        cfg, init_volsdf_params(jax.random.PRNGKey(s), cfg.model), tx)
    for s in range(n_scenes)])
scenes = jax.tree.map(lambda x: jnp.stack([x] * n_scenes), scene_dev)
mvs_s = jax.tree.map(
    lambda x: jnp.stack([x] * n_scenes) if hasattr(x, "ndim") else x, mvs)

def chunk_rngs(c):
    return jnp.stack([jax.random.split(jax.random.PRNGKey(100 * c + s),
                                       steps) for s in range(n_scenes)])

t0 = time.perf_counter()
states, losses = fn(states, chunk_rngs(0), scenes, mvs_s)
np.asarray(losses.loss)          # host fetch = real sync
compile_s = time.perf_counter() - t0
assert np.all(np.isfinite(np.asarray(losses.loss)))

walls = []
for c in range(1, chunks + 1):
    rngs = chunk_rngs(c)
    t0 = time.perf_counter()
    states, losses = fn(states, rngs, scenes, mvs_s)
    np.asarray(losses.loss)
    walls.append(time.perf_counter() - t0)
best = min(walls)
print(json.dumps({
    "devices": n_devices, "mesh": [n_scenes, n_ray],
    "scenes": n_scenes, "steps_per_chunk": steps,
    "compile_s": round(compile_s, 1),
    "wall_ms_per_step": round(1e3 * best / steps, 2),
    "wall_ms_per_step_per_scene": round(1e3 * best / steps / n_scenes, 2),
    "chunk_walls_s": [round(w, 3) for w in walls],
}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--chunks", type=int, default=3)
    ap.add_argument("--out", default="runs/MESH2D_BENCH.json")
    args = ap.parse_args()

    rows = []
    for n_scenes in (2, 4, 8):
        n_ray = 4
        n_dev = n_scenes * n_ray
        print(f"[{time.strftime('%H:%M:%S')}] {n_dev} devices "
              f"({n_scenes}x{n_ray})...", flush=True)
        env = dict(os.environ, PYTHONPATH=REPO)
        proc = subprocess.run(
            [sys.executable, "-c", CHILD, str(n_dev), str(n_scenes),
             str(n_ray), str(args.steps), str(args.chunks)],
            cwd=REPO, env=env, capture_output=True, text=True,
            timeout=1800)
        if proc.returncode != 0:
            print(proc.stdout[-2000:], proc.stderr[-2000:], file=sys.stderr)
            sys.exit(1)
        row = json.loads(proc.stdout.strip().splitlines()[-1])
        print(json.dumps(row), flush=True)
        rows.append(row)

    out = {"ray_submesh": 4, "note": (
        "virtual CPU devices time-share one physical core; the scaling "
        "signal is wall_ms_per_step_per_scene at fixed ray submesh "
        "(flat = no cross-scene overhead)"), "rows": rows}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
