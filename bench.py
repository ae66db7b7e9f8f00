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


def _loop_time_ms(fn, first_arg, rest_args=(), iters=10, repeats=3):
    """ms per call of ``fn(first_arg, *rest_args)``, measured as N dependent
    iterations inside ONE jit.  The TPU relay adds ~20-30 ms of host
    round-trip per fetch and ``block_until_ready`` is not a trustworthy fence
    there, so single-shot timings drown in noise; chaining N iterations
    (``arg + 1e-30 * checksum`` keeps XLA from hoisting the body) amortizes
    the fetch to noise level.  ``first_arg`` must be a float array."""
    import jax
    import jax.numpy as jnp

    def chained(first, rest):
        def body(_, carry):
            csum, f = carry
            out = fn(f + 1e-30 * csum, *rest)
            leaves = jax.tree_util.tree_leaves(out)
            csum = sum(jnp.sum(jnp.asarray(l, jnp.float32)) for l in leaves)
            return csum, f

        csum, _ = jax.lax.fori_loop(0, iters, body, (jnp.float32(0.0), first))
        return csum

    run = jax.jit(chained)
    checksum = float(run(first_arg, rest_args))  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(first_arg, rest_args))
        times.append(time.perf_counter() - t0)

    nrun = jax.jit(lambda f, r: jnp.sum(f) * 0.0)
    float(nrun(first_arg, rest_args))
    nulls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(nrun(first_arg, rest_args))
        nulls.append(time.perf_counter() - t0)

    ms = max(min(times) - min(nulls), 0.0) * 1e3 / iters
    return ms, checksum


def bench_world(config_path: str, width=640, height=480, iters=10,
                use_bvh=True):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from raytracer_tpu import generate
    from raytracer_tpu.render import render_frame
    from raytracer_tpu.scene import device_scene

    w = generate(config_path)
    on_accel = jax.default_backend() != "cpu"
    cfg = w.config.replace(width=width, height=height, use_bvh=use_bvh,
                           ray_chunk=8192, pallas_kernel="scalar",
                           engine="pallas" if on_accel else "jnp")
    scene = device_scene(w.scene)
    camera = jax.tree_util.tree_map(jnp.asarray, w.camera)

    def frame(cam_pos):
        cam = dataclasses.replace(camera, pos=cam_pos)
        return render_frame(scene, cam, cfg)

    return _loop_time_ms(frame, camera.pos, iters=iters)


def bench_fwd_bwd(config_path: str, width=1920, height=1080, iters=3):
    """North-star metric (BASELINE.json): Mrays/sec/chip fwd+bwd at 1080p on
    world8 — one forward render + backward pass to materials, lights, and
    camera pose per measured step."""
    import jax
    import jax.numpy as jnp

    from raytracer_tpu import diff, generate
    from raytracer_tpu.builder import scale_camera
    from raytracer_tpu.scene import device_scene

    w = generate(config_path)
    on_accel = jax.default_backend() != "cpu"
    cfg = w.config.replace(
        width=width, height=height, ray_chunk=16384, early_exit=False,
        pallas_kernel="scalar",
        engine="pallas" if on_accel else "jnp",
    )
    scene = device_scene(w.scene)
    camera = scale_camera(w.camera, width, w.config.width)
    camera = jax.tree_util.tree_map(jnp.asarray, camera)
    params = diff.trainable_params(scene, camera)
    target = jnp.zeros((height, width, 4), jnp.float32)
    loss_fn = diff.make_loss_fn(scene, camera, cfg, target)

    def step(target_):
        def loss2(p):
            return diff.l2_image_loss(
                diff.render_with_params(scene, camera, cfg, p), target_
            )

        value, grads = jax.value_and_grad(loss2)(params)
        return value, grads

    ms, _ = _loop_time_ms(step, target, iters=iters)
    s = max(ms, 1e-3) * 1e-3
    mrays = width * height / s / 1e6
    return ms, mrays


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

    fwd_bwd_ms = None
    fwd_bwd_mrays = None
    fwd_bwd_error = None
    try:
        fwd_bwd_ms, fwd_bwd_mrays = bench_fwd_bwd(
            "/root/reference/world8.json")
        print(
            f"world8 1080p fwd+bwd: {fwd_bwd_ms:.2f} ms/step "
            f"({fwd_bwd_mrays:.2f} Mrays/s/chip)",
            file=sys.stderr,
        )
    except Exception as e:  # pragma: no cover
        fwd_bwd_error = f"{type(e).__name__}: {e}"[:300]
        print(f"world8 fwd+bwd: FAILED {e}", file=sys.stderr)

    ms = detail.get("world8")
    extras = {
        "world1_ms": round(detail["world1"], 3) if "world1" in detail else None,
        # north-star metric (BASELINE.json): Mrays/s/chip fwd+bwd, 1080p world8
        "fwd_bwd_1080p_ms": round(fwd_bwd_ms, 3) if fwd_bwd_ms else None,
        "fwd_bwd_1080p_mrays_per_s_chip": (
            round(fwd_bwd_mrays, 3) if fwd_bwd_mrays else None),
        "fwd_bwd_error": fwd_bwd_error,
    }
    if ms is None:
        print(json.dumps({"metric": "world8_frame_ms", "value": None,
                          "unit": "ms", "vs_baseline": None, **extras}))
        return 1
    print(json.dumps({
        "metric": "world8_frame_ms",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_WORLD8_MS / ms, 3),
        **extras,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
