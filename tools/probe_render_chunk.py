"""Eval-render chunk-size sweep on the real TPU.

The full-image render is latency-bound (BENCH_NOTES.md): many small
chunk programs, each paying dispatch + sampler-loop latency. This
probe measures steady-state seconds/view for a production 576x768
view at several chunk sizes to find the sweet spot.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site \
            python tools/probe_render_chunk.py [chunk ...]
"""

import sys
import time

import numpy as np

import jax


def main():
    from s_volsdf_tpu.config import load_config
    from s_volsdf_tpu.data.synthetic import make_sphere_scene
    from s_volsdf_tpu.engine.render import render_image
    from s_volsdf_tpu.models.network import init_volsdf_params

    cfg = load_config("dtu")          # full production model sizes
    scene = make_sphere_scene(3, (576, 768))
    params = init_volsdf_params(jax.random.PRNGKey(0), cfg.model)

    chunks = [int(a) for a in sys.argv[1:]] or [16384, 65536]
    print(f"devices: {jax.devices()}", flush=True)
    for chunk in chunks:
        # warm (compile) + 2 timed renders; render_image fetches to
        # host numpy, which is the sync the axon tunnel needs.
        t_all = []
        for it in range(3):
            t0 = time.perf_counter()
            maps = render_image(params, cfg.model, scene.poses[0],
                                scene.intrinsics[0], scene.img_res,
                                chunk=chunk, fast=1)
            assert np.isfinite(maps["rgb"]).all()
            t_all.append(time.perf_counter() - t0)
        print(f"chunk {chunk:>6}: compile+first {t_all[0]:6.2f} s, "
              f"steady {min(t_all[1:]):6.2f} s/view", flush=True)


if __name__ == "__main__":
    main()
