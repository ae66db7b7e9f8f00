"""Round-4 experiment: time the new in-program spp gradient accumulation on
TPU.  Usage: exp_r4_spp.py CONFIG SPP CHUNK [WIDTH HEIGHT] [cap] [vert]"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from raytracer_tpu import diff, generate
from raytracer_tpu.builder import scale_camera
from raytracer_tpu.scene import device_scene


def main():
    config = sys.argv[1]
    spp = int(sys.argv[2])
    chunk = int(sys.argv[3])
    width = int(sys.argv[4]) if len(sys.argv) > 4 else 1920
    height = int(sys.argv[5]) if len(sys.argv) > 5 else 1080
    cap = float(sys.argv[6]) if len(sys.argv) > 6 else 0.0
    vert = len(sys.argv) > 7 and sys.argv[7] == "vert"

    w = generate(config)
    cfg = w.config.replace(
        engine="pallas" if jax.default_backend() != "cpu" else "jnp",
        pallas_kernel="scalar", width=width, height=height,
        ray_chunk=16384, early_exit=False, spp=1,
        static_tile_cap=cap,
        edge_aware_grads=vert,
    )
    scene = device_scene(w.scene)
    camera = jax.tree_util.tree_map(
        jnp.asarray, scale_camera(w.camera, width, w.config.width))
    params = diff.trainable_params(scene, camera, include_vertices=vert)
    target = jnp.zeros((height, width, 4), jnp.float32)

    step = diff.make_spp_grad_fn(scene, camera, cfg, spp,
                                 spp_chunk=None if chunk >= spp else chunk)
    t0 = time.perf_counter()
    v, g = step(params, target)
    jax.block_until_ready((v, g))
    print("compile+first:", round(time.perf_counter() - t0, 1), "s, loss",
          float(v))
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        v, g = step(params, target)
        jax.block_until_ready((v, g))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3
    mrays = width * height * spp / (ms * 1e-3) / 1e6
    print(f"step_ms={ms:.0f} mrays={mrays:.2f}")


if __name__ == "__main__":
    main()
