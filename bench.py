"""Benchmark driver: renders the headline config on the available accelerator and
prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.

Headline metric (BASELINE.md): frame time on world8.json at the reference's
640x480 — compared against the reference GPU's ~12-15 ms plateau (d>=8, BVH,
per-frame rebuild included).  ``vs_baseline`` > 1 means faster than baseline.

Extra detail lines (stderr) cover per-world timings and Mrays/s.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_WORLD8_MS = 13.5  # midpoint of the reference GPU plateau (BASELINE.md)


def bench_world(config_path: str, width=640, height=480, repeats=3,
                use_bvh=True):
    import jax
    import jax.numpy as jnp

    from raytracer_tpu import generate
    from raytracer_tpu.render import render_frame
    from raytracer_tpu.scene import device_scene

    w = generate(config_path)
    on_accel = jax.default_backend() != "cpu"
    cfg = w.config.replace(width=width, height=height, use_bvh=use_bvh,
                           ray_chunk=8192,
                           engine="pallas" if on_accel else "jnp")
    scene = device_scene(w.scene)
    camera = jax.tree_util.tree_map(jnp.asarray, w.camera)
    render = jax.jit(render_frame, static_argnames=("cfg",))

    img = render(scene, camera, cfg)
    jax.block_until_ready(img)  # compile warm-up

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        img = render(scene, camera, cfg)
        jax.block_until_ready(img)
        times.append((time.perf_counter() - t0) * 1e3)
    return min(times), img


def main():
    import jax

    device = jax.devices()[0]
    print(f"device: {device}", file=sys.stderr)

    detail = {}
    for name in ("world1", "world8"):
        try:
            ms, _ = bench_world(f"/root/reference/{name}.json")
            detail[name] = ms
            rays = 640 * 480
            print(
                f"{name}: {ms:.2f} ms  ({rays / ms / 1e3:.2f} Mrays/s primary)",
                file=sys.stderr,
            )
        except Exception as e:  # pragma: no cover
            print(f"{name}: FAILED {e}", file=sys.stderr)

    ms = detail.get("world8")
    if ms is None:
        print(json.dumps({"metric": "world8_frame_ms", "value": None,
                          "unit": "ms", "vs_baseline": None}))
        return 1
    print(json.dumps({
        "metric": "world8_frame_ms",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_WORLD8_MS / ms, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
