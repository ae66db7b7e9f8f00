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

Every item runs in its OWN subprocess (``--item KEY``): a TPU worker crash —
e.g. the runtime watchdog killing a pathological program — poisons the JAX
client for the rest of that process, so isolation keeps one failure from
wiping every later row (this exact failure mode ate half the round-2 ladder).
The heavy spp configs additionally chunk the spp axis over host-level calls
(gradient accumulation via two-pass vjp) so no single device program runs for
minutes.
"""

from __future__ import annotations

import json
import os
import subprocess
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
                use_bvh=True, spp=1, traversal="auto", scale_cam=False,
                tile_cap=0.0):
    import dataclasses

    import jax.numpy as jnp

    from raytracer_tpu.render import render_frame

    w, scene, camera, cfg = _load(
        config_path, width=width, height=height, use_bvh=use_bvh,
        ray_chunk=8192, spp=spp, pallas_traversal=traversal,
        wavefront_tile_cap=tile_cap,
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


def bench_mixed(iters=5, child_tile_cap=0.0):
    """The compacted 2x-stream wavefront (both child types live) at 640x480.

    ``child_tile_cap`` > 0 selects the tile-granular child-queue compaction
    (bit-identical images; the per-lane argsort + full-length gathers +
    full-R scatter per round collapse to a few capped tiles)."""
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
                      pallas_kernel="scalar", child_tile_cap=child_tile_cap)

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


def bench_fwd_bwd_chunked(config_path: str, width=1920, height=1080, spp=64,
                          spp_chunk=8, repeats=2, include_lights=True,
                          include_camera=True):
    """Heavy-spp fwd+bwd with the spp axis chunked over host calls.

    Computes the EXACT full-image-loss gradient by two-pass accumulation:
    pass 1 sums sample-chunk frames into the full image (forward only),
    pass 2 pulls dL/dimage back through each chunk with ``jax.vjp`` and
    accumulates parameter cotangents.  Each device program covers one
    spp_chunk microbatch — bounded runtime, same math as the monolithic
    ``render(spp=N)`` step (same jitter grid, same per-sample clamp)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from raytracer_tpu import diff
    from raytracer_tpu.builder import scale_camera
    from raytracer_tpu.render.engine import render_frame_sum, spp_jitter_grid

    assert spp % spp_chunk == 0
    w, scene, camera, cfg = _load(
        config_path, width=width, height=height, ray_chunk=16384,
        early_exit=False, spp=1,
    )
    camera = jax.tree_util.tree_map(
        jnp.asarray, scale_camera(w.camera, width, w.config.width)
    )
    params = diff.trainable_params(scene, camera,
                                   include_lights=include_lights,
                                   include_camera=include_camera)
    target = jnp.zeros((height, width, 4), jnp.float32)
    offs, _ = spp_jitter_grid(spp, width, height)
    chunks = [offs[i:i + spp_chunk] for i in range(0, spp, spp_chunk)]

    def render_chunk(p, offs_c):
        s, c = diff.merge_params(scene, camera, p)
        # remat=False: backward memory is bounded by spp_chunk instead (the
        # per-sample checkpoint cannot stage on TPU when the body nests the
        # bounce loop around pallas custom_vjp casts — see render_frame_sum).
        return render_frame_sum(s, c, cfg, offs_c, remat=False)

    fwd = jax.jit(render_chunk)

    def bwd_chunk(p, offs_c, g_img):
        _, pull = jax.vjp(lambda p_: render_chunk(p_, offs_c), p)
        return pull(g_img)[0]

    bwd = jax.jit(bwd_chunk)

    def one_step():
        acc = jnp.zeros((height, width, 4), jnp.float32)
        for oc in chunks:
            acc = acc + fwd(params, oc)
        img = acc / spp
        n = img.size
        g_img = 2.0 * (img - target) / (n * spp)  # d(l2)/dimg per-sample
        grads = None
        for oc in chunks:
            g = bwd(params, oc, g_img)
            grads = g if grads is None else jax.tree_util.tree_map(
                jnp.add, grads, g
            )
        return jax.block_until_ready(grads)

    one_step()  # compile + warm both programs
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        one_step()
        times.append(time.perf_counter() - t0)
    ms = min(times) * 1e3
    mrays = width * height * spp / (ms * 1e-3) / 1e6
    return ms, mrays


def consistency_check(width=256, height=192):
    """On-chip cross-engine agreement gate (VERDICT r2 #6): the candidate-cull
    kernel, the BVH-walk kernel, and the MXU Pluecker kernel must agree with
    each other on a world8 sample — valid masks and materials exact up to an
    edge-pixel budget, hit times within 1e-3 relative.  Catches on-TPU-only
    Mosaic miscompiles that interpret-mode tests cannot see (and caught the
    MXU kernel's bf16 input rounding before Precision.HIGHEST pinned it)."""
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
    for name in ("bvh", "mxu"):
        v, t, m = hits[name]
        v_mism = (v != ref_v).mean()
        if v_mism > 1e-3:
            return f"fail:{name}_valid_mismatch={v_mism:.2e}"
        both = v & ref_v
        rel = np.abs(t[both] - ref_t[both]) / np.maximum(ref_t[both], 1e-3)
        # Edge rays may legitimately resolve to a different surface across
        # kernels (a grazing ray catching the near cube on one and the next
        # cube on the other — measured 2/17.9k on world8); the gate budgets
        # their FRACTION, not the max divergence, exactly like the committed
        # parity tests' edge-pixel budgets.  Everything off the edge set must
        # agree to f32 precision.
        frac_bad_t = (rel > 1e-3).mean() if rel.size else 0.0
        if frac_bad_t > 1e-3:
            return f"fail:{name}_t_mismatch_frac={frac_bad_t:.2e}"
        if m is not None and ref_m is not None:
            m_mism = (m[both] != ref_m[both]).mean() if both.any() else 0.0
            if m_mism > 1e-3:
                return f"fail:{name}_mat_mismatch={m_mism:.2e}"
    return "ok"


# ---------------------------------------------------------------------------
# Item registry: each entry returns a dict of extras to merge.

def _item_world1():
    # Tile-compacted queue (1/16 of tiles ~ 19 of 300): world1's lone cube
    # hits ~4 tiles, so bounce/shadow rounds shrink ~30x.  The discipline
    # choice is the analog of the reference's per-world -d sweeps; the dense
    # row is reported alongside for the untuned number.
    ms, _ = bench_world("/root/reference/world1.json", tile_cap=1.0 / 16.0)
    dms, _ = bench_world("/root/reference/world1.json", iters=5)
    return {"world1_ms": round(ms, 3),
            "world1_vs_baseline": round(BASELINE_WORLD1_MS / ms, 3),
            "world1_dense_ms": round(dms, 3)}


def _item_world8():
    ms, _ = bench_world("/root/reference/world8.json")
    return {"world8_ms": round(ms, 3)}


def _item_world16():
    ms, _ = bench_world("/root/reference/world16.json")
    return {"world16_ms": round(ms, 3),
            "world16_vs_baseline": round(BASELINE_WORLD16_MS / ms, 3)}


def _item_fwd_bwd_1080p():
    ms, mrays = bench_fwd_bwd("/root/reference/world8.json")
    return {"fwd_bwd_1080p_ms": round(ms, 3),
            "fwd_bwd_1080p_mrays_per_s_chip": round(mrays, 3)}


def _item_world4_512_spp4():
    ms, _ = bench_world("/root/reference/world4.json", width=512, height=512,
                        spp=4, scale_cam=True, iters=5)
    return {"world4_512_spp4_ms": round(ms, 3)}


def _item_world8_1024_spp16():
    ms, _ = bench_world("/root/reference/world8.json", width=1024,
                        height=1024, spp=16, scale_cam=True, iters=3)
    return {"world8_1024_spp16_ms": round(ms, 3)}


def _item_world16_1080p_spp64_bwd():
    ms, mrays = bench_fwd_bwd_chunked(
        "/root/reference/world16.json", spp=64, spp_chunk=8,
        include_lights=False, include_camera=False,
    )
    return {"world16_1080p_spp64_bwd_ms": round(ms, 3),
            "world16_1080p_spp64_bwd_mrays": round(mrays, 3)}


def _item_world8_stress_1080p_spp128():
    # spp_chunk=2: the reflective bounce rounds make this world's backward
    # program ~3x world16's per sample; chunks >= 4 overflow the TPU
    # compiler (remote_compile HTTP 500), 2 compiles and runs.
    ms, mrays = bench_fwd_bwd_chunked(
        "/root/reference/world8_stress.json", spp=128, spp_chunk=2,
    )
    return {"world8_stress_1080p_spp128_fwdbwd_ms": round(ms, 3),
            "world8_stress_1080p_spp128_mrays": round(mrays, 3)}


def _item_world16_cull():
    ms, _ = bench_world("/root/reference/world16.json", traversal="cull",
                        iters=5)
    return {"world16_cull_ms": round(ms, 3)}


def _item_world8_bvh():
    ms, _ = bench_world("/root/reference/world8.json", traversal="bvh",
                        iters=8)
    return {"world8_bvh_ms": round(ms, 3)}


def _item_synth4096_cull():
    ms, _ = bench_synth_big(traversal="cull")
    return {"synth4096_cull_ms": round(ms, 3)}


def _item_synth4096_bvh():
    ms, _ = bench_synth_big(traversal="bvh")
    return {"synth4096_bvh_ms": round(ms, 3)}


def _item_mixed_world():
    # Tile-granular child compaction (1/8 of tiles): the two spawning cubes
    # cover a handful of tiles, so per-round queue maintenance shrinks ~30x.
    ms, _ = bench_mixed(child_tile_cap=1.0 / 8.0)
    dms, _ = bench_mixed()
    return {"mixed_world_ms": round(ms, 3),
            "mixed_world_dense_ms": round(dms, 3)}


def _item_consistency():
    return {"consistency": consistency_check()}


ITEMS = {
    "world1": _item_world1,
    "world8": _item_world8,
    "world16": _item_world16,
    "fwd_bwd_1080p": _item_fwd_bwd_1080p,
    "world4_512_spp4": _item_world4_512_spp4,
    "world8_1024_spp16": _item_world8_1024_spp16,
    "world16_1080p_spp64_bwd": _item_world16_1080p_spp64_bwd,
    "world8_stress_1080p_spp128": _item_world8_stress_1080p_spp128,
    "world16_cull": _item_world16_cull,
    "world8_bvh": _item_world8_bvh,
    "synth4096_cull": _item_synth4096_cull,
    "synth4096_bvh": _item_synth4096_bvh,
    "mixed_world": _item_mixed_world,
    "consistency": _item_consistency,
}

ITEM_TIMEOUT_S = {
    "world8_1024_spp16": 2400,
    "world16_1080p_spp64_bwd": 3600,
    "world8_stress_1080p_spp128": 5400,
}


def run_item(key: str) -> int:
    """Child-process entry: run one item, print its extras as one JSON line."""
    try:
        out = ITEMS[key]()
    except Exception as e:  # pragma: no cover
        out = {key + "_error": f"{type(e).__name__}: {e}"[:200]}
    print(json.dumps(out))
    return 0


def main():
    extras = {}
    for key in ITEMS:
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--item", key],
                capture_output=True, text=True,
                timeout=ITEM_TIMEOUT_S.get(key, 1200),
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = proc.stdout.strip().splitlines()
            out = json.loads(line[-1]) if line else {
                key + "_error": f"no output (rc={proc.returncode}): "
                + proc.stderr.strip()[-150:]
            }
        except subprocess.TimeoutExpired:
            out = {key + "_error": "timeout"}
        except Exception as e:  # pragma: no cover
            out = {key + "_error": f"{type(e).__name__}: {e}"[:200]}
        extras.update(out)
        dt = time.perf_counter() - t0
        print(f"{key}: {out} [{dt:.0f}s]", file=sys.stderr, flush=True)

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
    if len(sys.argv) >= 3 and sys.argv[1] == "--item":
        sys.exit(run_item(sys.argv[2]))
    sys.exit(main())
