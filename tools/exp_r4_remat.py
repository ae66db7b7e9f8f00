"""Round-4 experiment: reproduce the per-sample jax.checkpoint staging failure
on TPU (engine.py:538-543) at small scale, and time F vs B per sample on the
world8_stress config.  Scratch tool, not part of the package."""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from raytracer_tpu import diff, generate
from raytracer_tpu.builder import scale_camera
from raytracer_tpu.render.engine import render_frame_sum, spp_jitter_grid
from raytracer_tpu.scene import device_scene


def load(config, width, height):
    w = generate(config)
    cfg = w.config.replace(
        engine="pallas" if jax.default_backend() != "cpu" else "jnp",
        pallas_kernel="scalar", width=width, height=height,
        ray_chunk=16384, early_exit=False, spp=1,
    )
    scene = device_scene(w.scene)
    camera = jax.tree_util.tree_map(
        jnp.asarray, scale_camera(w.camera, width, w.config.width))
    return scene, camera, cfg


def t_ms(f, *a, n=3):
    out = f(*a)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "repro"
    if mode == "repro":
        # small-scale: does jax.checkpoint stage over the pallas custom_vjp?
        scene, camera, cfg = load("/root/reference/world8_stress.json", 256, 192)
        offs, _ = spp_jitter_grid(2, cfg.width, cfg.height)
        params = diff.trainable_params(scene, camera)
        target = jnp.zeros((cfg.height, cfg.width, 4), jnp.float32)

        def loss(p):
            s, c = diff.merge_params(scene, camera, p)
            img = render_frame_sum(s, c, cfg, offs, remat=True) / 2.0
            return jnp.mean((img - target) ** 2)

        try:
            v, g = jax.jit(jax.value_and_grad(loss))(params)
            jax.block_until_ready((v, g))
            print("REMAT OK", float(v))
        except Exception as e:
            print("REMAT FAIL:", type(e).__name__, str(e)[:500])
    elif mode == "fb":
        # forward vs fwd+bwd per sample, 1080p stress
        scene, camera, cfg = load(
            "/root/reference/world8_stress.json", 1920, 1080)
        offs, _ = spp_jitter_grid(1, cfg.width, cfg.height)
        params = diff.trainable_params(scene, camera)
        target = jnp.zeros((cfg.height, cfg.width, 4), jnp.float32)

        def render1(p):
            s, c = diff.merge_params(scene, camera, p)
            return render_frame_sum(s, c, cfg, offs, remat=False)

        fwd = jax.jit(render1)
        print("F  ms:", round(t_ms(fwd, params), 1))

        def loss(p):
            return jnp.mean((render1(p) - target) ** 2)

        vg = jax.jit(jax.value_and_grad(loss))
        print("F+B ms:", round(t_ms(vg, params), 1))
    elif mode == "fb8":
        # same for world8 (no bounce) for comparison
        scene, camera, cfg = load("/root/reference/world8.json", 1920, 1080)
        offs, _ = spp_jitter_grid(1, cfg.width, cfg.height)
        params = diff.trainable_params(scene, camera)
        target = jnp.zeros((cfg.height, cfg.width, 4), jnp.float32)

        def render1(p):
            s, c = diff.merge_params(scene, camera, p)
            return render_frame_sum(s, c, cfg, offs, remat=False)

        fwd = jax.jit(render1)
        print("F  ms:", round(t_ms(fwd, params), 1))

        def loss(p):
            return jnp.mean((render1(p) - target) ** 2)

        vg = jax.jit(jax.value_and_grad(loss))
        print("F+B ms:", round(t_ms(vg, params), 1))


if __name__ == "__main__":
    main()
