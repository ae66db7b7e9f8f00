"""Benchmark driver: renders the headline config on the available accelerator and
prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline", ...extras}``.

Headline metric (BASELINE.md): frame time on world8.json at the reference's
640x480 — compared against the reference GPU's ~12-15 ms plateau (d>=8, BVH,
per-frame rebuild included).  ``vs_baseline`` > 1 means faster than baseline.

Extras cover the full BASELINE.json staged-config ladder (VERDICT r2 #2), the
world16 plateau comparison, the BVH-walk vs candidate-cull traversal crossover
at scale (VERDICT r2 #4), the mixed reflect+refract compacted wavefront, the
north-star 1080p fwd+bwd step, and an on-chip cross-engine consistency gate
(VERDICT r2 #6).  Detail lines go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_WORLD8_MS = 13.5  # midpoint of the reference GPU plateau (BASELINE.md)
BASELINE_WORLD1_MS = 5.0  # world1 no-BVH plateau
BASELINE_WORLD16_MS = 40.0  # midpoint of the world16 plateau (~35-45 ms)


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


def _load(config_path, **cfg_over):
    import jax
    import jax.numpy as jnp

    from raytracer_tpu import generate
    from raytracer_tpu.scene import device_scene

    w = generate(config_path)
    on_accel = jax.default_backend() != "cpu"
    cfg = w.config.replace(
        engine="pallas" if on_accel else "jnp",
        pallas_kernel="scalar", **cfg_over,
    )
    scene = device_scene(w.scene)
    camera = jax.tree_util.tree_map(jnp.asarray, w.camera)
    return w, scene, camera, cfg


def bench_world(config_path: str, width=640, height=480, iters=10,
                use_bvh=True, spp=1, traversal="auto", scale_cam=False):
    import dataclasses

    import jax.numpy as jnp

    from raytracer_tpu.render import render_frame

    w, scene, camera, cfg = _load(
        config_path, width=width, height=height, use_bvh=use_bvh,
        ray_chunk=8192, spp=spp, pallas_traversal=traversal,
    )
    if scale_cam:
        from raytracer_tpu.builder import scale_camera
        import jax

        camera = jax.tree_util.tree_map(
            jnp.asarray, scale_camera(w.camera, width, w.config.width)
        )

    def frame(cam_pos):
        cam = dataclasses.replace(camera, pos=cam_pos)
        return render_frame(scene, cam, cfg)

    return _loop_time_ms(frame, camera.pos, iters=iters)


def bench_synth_big(n_instances=4096, traversal="bvh", iters=5):
    """At-scale traversal bench: n translated cube instances, primary+shadow
    frame at 640x480 — the BVH-walk vs dense-cull crossover probe."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from raytracer_tpu.render import render_frame
    from raytracer_tpu.scene import device_scene
    from raytracer_tpu.synth import make_big_world

    scene, cam, cfg = make_big_world(n_instances)
    on_accel = jax.default_backend() != "cpu"
    scene = device_scene(scene)
    camera = jax.tree_util.tree_map(jnp.asarray, cam)
    cfg = cfg.replace(width=640, height=480,
                      engine="pallas" if on_accel else "jnp",
                      pallas_kernel="scalar", pallas_traversal=traversal)

    def frame(cam_pos):
        c = dataclasses.replace(camera, pos=cam_pos)
        return render_frame(scene, c, cfg)

    return _loop_time_ms(frame, camera.pos, iters=iters)


def bench_mixed(iters=5):
    """The compacted 2x-stream wavefront (both child types live) at 640x480."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from raytracer_tpu.builder import scale_camera
    from raytracer_tpu.render import render_frame
    from raytracer_tpu.scene import device_scene
    from raytracer_tpu.synth import make_mixed_world

    scene, cam, cfg = make_mixed_world(depth=2)
    on_accel = jax.default_backend() != "cpu"
    scene = device_scene(scene)
    camera = jax.tree_util.tree_map(
        jnp.asarray, scale_camera(cam, 640, cfg.width)
    )
    cfg = cfg.replace(width=640, height=480,
                      engine="pallas" if on_accel else "jnp",
                      pallas_kernel="scalar")

    def frame(cam_pos):
        c = dataclasses.replace(camera, pos=cam_pos)
        return render_frame(scene, c, cfg)

    return _loop_time_ms(frame, camera.pos, iters=iters)


def bench_fwd_bwd(config_path: str, width=1920, height=1080, iters=3, spp=1,
                  include_lights=True, include_camera=True):
    """fwd+bwd step time: one forward render + backward to materials (and
    optionally lights + camera pose).  The north-star metric uses world8
    1080p spp=1 with all params (BASELINE.json)."""
    import jax
    import jax.numpy as jnp

    from raytracer_tpu import diff
    from raytracer_tpu.builder import scale_camera

    w, scene, camera, cfg = _load(
        config_path, width=width, height=height, ray_chunk=16384,
        early_exit=False, spp=spp,
    )
    camera = jax.tree_util.tree_map(
        jnp.asarray, scale_camera(w.camera, width, w.config.width)
    )
    params = diff.trainable_params(scene, camera,
                                   include_lights=include_lights,
                                   include_camera=include_camera)
    target = jnp.zeros((height, width, 4), jnp.float32)

    def step(target_):
        def loss2(p):
            return diff.l2_image_loss(
                diff.render_with_params(scene, camera, cfg, p), target_
            )

        value, grads = jax.value_and_grad(loss2)(params)
        return value, grads

    ms, _ = _loop_time_ms(step, target, iters=iters)
    s = max(ms, 1e-3) * 1e-3
    mrays = width * height * spp / s / 1e6
    return ms, mrays


def consistency_check(width=256, height=192):
    """On-chip cross-engine agreement gate (VERDICT r2 #6): the candidate-cull
    kernel, the BVH-walk kernel, and the MXU Pluecker kernel must agree with
    each other on a world8 sample — valid masks and materials exact up to an
    edge-pixel budget, hit times within 1e-3 relative.  Catches on-TPU-only
    Mosaic miscompiles that interpret-mode tests cannot see."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from raytracer_tpu.render.engine import make_cast
    from raytracer_tpu.render.geometry import camera_rays, expand_geometry

    w, scene, camera, cfg = _load("/root/reference/world8.json",
                                  width=width, height=height)
    geom = expand_geometry(scene)
    ro, rd = camera_rays(camera, width, height)
    ro = ro.reshape(-1, 3)
    rd = rd.reshape(-1, 3)

    hits = {}
    for name, over in (
        ("cull", dict(pallas_traversal="cull")),
        ("bvh", dict(pallas_traversal="bvh")),
        ("mxu", dict(pallas_kernel="mxu")),
    ):
        cast = jax.jit(make_cast(scene, geom, cfg.replace(**over)))
        h = cast(ro, rd)
        hits[name] = (np.asarray(h.valid), np.asarray(h.t),
                      np.asarray(h.mat) if h.mat is not None else None)

    ref_v, ref_t, ref_m = hits["cull"]
    n = ref_v.size
    for name in ("bvh", "mxu"):
        v, t, m = hits[name]
        v_mism = (v != ref_v).mean()
        if v_mism > 1e-3:
            return f"fail:{name}_valid_mismatch={v_mism:.2e}"
        both = v & ref_v
        rel = np.abs(t[both] - ref_t[both]) / np.maximum(ref_t[both], 1e-3)
        if rel.size and rel.max() > 1e-3:
            return f"fail:{name}_t_rel={rel.max():.2e}"
        if m is not None and ref_m is not None:
            m_mism = (m[both] != ref_m[both]).mean() if both.any() else 0.0
            if m_mism > 1e-3:
                return f"fail:{name}_mat_mismatch={m_mism:.2e}"
    return "ok"


def main():
    import jax

    device = jax.devices()[0]
    print(f"device: {device}", file=sys.stderr)
    extras = {}

    def run(key, fn, *a, detail="", **kw):
        try:
            out = fn(*a, **kw)
            ms = out[0] if isinstance(out, tuple) else out
            extras[key] = round(ms, 3)
            print(f"{key}: {ms:.2f} ms {detail}", file=sys.stderr)
            return out
        except Exception as e:  # pragma: no cover
            extras[key] = None
            extras[key + "_error"] = f"{type(e).__name__}: {e}"[:200]
            print(f"{key}: FAILED {e}", file=sys.stderr)
            return None

    # ---- reference-comparable frame benches (640x480, spp=1) ----
    r1 = run("world1_ms", bench_world, "/root/reference/world1.json")
    r8 = run("world8_ms", bench_world, "/root/reference/world8.json")
    r16 = run("world16_ms", bench_world, "/root/reference/world16.json")
    if r16:
        extras["world16_vs_baseline"] = round(BASELINE_WORLD16_MS / r16[0], 3)
    if r1:
        extras["world1_vs_baseline"] = round(BASELINE_WORLD1_MS / r1[0], 3)

    # ---- north star: world8 1080p fwd+bwd, all params ----
    out = run("fwd_bwd_1080p_ms", bench_fwd_bwd,
              "/root/reference/world8.json")
    if out:
        extras["fwd_bwd_1080p_mrays_per_s_chip"] = round(out[1], 3)

    # ---- BASELINE.json staged configs ----
    run("world4_512_spp4_ms", bench_world, "/root/reference/world4.json",
        width=512, height=512, spp=4, scale_cam=True, iters=5)
    run("world8_1024_spp16_ms", bench_world, "/root/reference/world8.json",
        width=1024, height=1024, spp=16, scale_cam=True, iters=3)
    out = run("world16_1080p_spp64_bwd_ms", bench_fwd_bwd,
              "/root/reference/world16.json", spp=64, iters=2,
              include_lights=False, include_camera=False)
    if out:
        extras["world16_1080p_spp64_bwd_mrays"] = round(out[1], 3)
    out = run("world8_stress_1080p_spp128_fwdbwd_ms", bench_fwd_bwd,
              "/root/reference/world8_stress.json", spp=128, iters=2)
    if out:
        extras["world8_stress_1080p_spp128_mrays"] = round(out[1], 3)

    # ---- traversal crossover: cull vs BVH walk ----
    run("world16_bvh_ms", bench_world, "/root/reference/world16.json",
        traversal="bvh", iters=5)
    run("synth4096_cull_ms", bench_synth_big, traversal="cull")
    run("synth4096_bvh_ms", bench_synth_big, traversal="bvh")

    # ---- mixed compacted wavefront ----
    run("mixed_world_ms", bench_mixed)

    # ---- cross-engine consistency gate ----
    try:
        extras["consistency"] = consistency_check()
    except Exception as e:  # pragma: no cover
        extras["consistency"] = f"error: {type(e).__name__}: {e}"[:200]
    print(f"consistency: {extras['consistency']}", file=sys.stderr)

    ms = extras.get("world8_ms")
    if ms is None:
        print(json.dumps({"metric": "world8_frame_ms", "value": None,
                          "unit": "ms", "vs_baseline": None, **extras}))
        return 1
    print(json.dumps({
        "metric": "world8_frame_ms",
        "value": ms,
        "unit": "ms",
        "vs_baseline": round(BASELINE_WORLD8_MS / ms, 3),
        **extras,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
