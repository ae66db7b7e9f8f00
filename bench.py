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
The heavy spp configs run as ONE in-program lax.scan with per-sample remat
(diff.make_spp_grad_fn; ~7-13 s device programs measured watchdog-safe); tile
caps come from probe renders (render.auto_tile_caps), never hand tuning.

Two round-5 reliability rules (the round-4 driver run hit rc=124 with all
rows measured but the final line never printed — the entire ladder was lost
to a wall-clock timeout):

* **Global time budget.**  ``BENCH_BUDGET_S`` (default 1350 s) bounds the
  whole run; items execute in priority order (headline rows first), each
  subprocess gets at most the remaining budget, and once the budget is
  spent the remaining items are SKIPPED (listed in ``"skipped"``) — the
  final JSON line always prints.
* **Persistent compilation cache.**  Every item process points
  ``jax_compilation_cache_dir`` at ``.jax_cache/`` next to this file, so
  repeat runs (and the driver's end-of-round run on this machine) pay
  compile cost once: a cold ladder is dominated by XLA compiles (~6-8 min
  for the 1080p spp scans), a warm one runs in seconds per item.
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

_HERE = os.path.dirname(os.path.abspath(__file__))


def _setup_compile_cache():
    """Point JAX at the repo-local persistent compilation cache (works
    through remote-compile TPU relays too: measured cross-process hit
    3.1 s -> 0.8 s).  Must run before the first compilation; safe no-op
    if unsupported."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(_HERE, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover
        print(f"compile cache unavailable: {e}", file=sys.stderr)


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


def bench_world(config_path: str, width=640, height=480, iters=20,
                use_bvh=True, spp=1, traversal="auto", scale_cam=False,
                auto_caps=False):
    """``auto_caps=True`` derives every tile cap from a probe render
    (render.auto_tile_caps) — no hand-tuned per-world constants (VERDICT r3
    weak #7); residual drops are counted and reported."""
    import dataclasses

    import jax.numpy as jnp

    from raytracer_tpu.render import auto_tile_caps, render_frame_with_stats

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
    if auto_caps:
        cfg = cfg.replace(**auto_tile_caps(scene, camera, cfg))

    def frame(cam_pos):
        cam = dataclasses.replace(camera, pos=cam_pos)
        img, stats = render_frame_with_stats(scene, cam, cfg)
        return img + 0.0 * stats["dropped"]

    ms, checksum = _loop_time_ms(frame, camera.pos, iters=iters)
    import jax

    _, stats = jax.jit(
        lambda: render_frame_with_stats(scene, camera, cfg))()
    dropped = int(stats["dropped"])
    if dropped:
        print(f"WARNING {config_path} dropped={dropped}", file=sys.stderr)
    return ms, checksum


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


def bench_mixed(iters=5, auto_caps=False):
    """The compacted 2x-stream wavefront (both child types live) at 640x480.

    ``auto_caps=True`` derives the child-queue tile cap from the probe
    render (tile-granular compaction, bit-identical images)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from raytracer_tpu.builder import scale_camera
    from raytracer_tpu.render import auto_tile_caps, render_frame
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
    if auto_caps:
        caps = auto_tile_caps(scene, camera, cfg)
        cfg = cfg.replace(child_tile_cap=caps["child_tile_cap"])

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


def bench_fwd_bwd_spp(config_path: str, width=1920, height=1080, spp=64,
                      spp_chunk=None, repeats=2, include_lights=True,
                      include_camera=True, include_vertices=False,
                      edge_aware=False):
    """Heavy-spp fwd+bwd via diff.make_spp_grad_fn: the whole gradient
    accumulation runs as in-program lax.scan(s) with per-sample remat
    (spp_chunk=None -> one program; else a host loop of chunk programs to
    bound single-program runtime).  Tile caps come from the probe render
    (auto_tile_caps), not hand tuning."""
    import jax
    import jax.numpy as jnp

    from raytracer_tpu import diff
    from raytracer_tpu.builder import scale_camera
    from raytracer_tpu.render import auto_tile_caps

    w, scene, camera, cfg = _load(
        config_path, width=width, height=height, ray_chunk=16384,
        early_exit=False, spp=1, edge_aware_grads=edge_aware,
    )
    camera = jax.tree_util.tree_map(
        jnp.asarray, scale_camera(w.camera, width, w.config.width)
    )
    cfg = cfg.replace(
        static_tile_cap=auto_tile_caps(scene, camera, cfg)["static_tile_cap"]
    )
    params = diff.trainable_params(scene, camera,
                                   include_lights=include_lights,
                                   include_camera=include_camera,
                                   include_vertices=include_vertices)
    target = jnp.zeros((height, width, 4), jnp.float32)
    step = diff.make_spp_grad_fn(scene, camera, cfg, spp,
                                 spp_chunk=spp_chunk, with_stats=True)

    def one_step():
        return jax.block_until_ready(step(params, target))

    out = one_step()  # compile + warm
    dropped = int(out[2]["dropped"])
    if dropped:  # probe-derived cap must keep the gradient path lossless
        print(f"WARNING {config_path} spp={spp} dropped={dropped}",
              file=sys.stderr)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        one_step()
        times.append(time.perf_counter() - t0)
    ms = min(times) * 1e3
    mrays = width * height * spp / (ms * 1e-3) / 1e6
    return ms, mrays


def vertex_fd_check(width=96, height=72, spp=8):
    """On-chip finite-difference sanity for VERTEX gradients (VERDICT r3
    next #2): the committed FD fixture
    (test_diff.test_edge_aware_vertex_gradient_matches_fd_engines) run on
    the real chip — world1's isolated cube, close-up 35-degree camera,
    directional derivative along a global vertex scale.  On a lone cube
    every silhouette borders the true background, so the one-sided
    mollifier's known bias is the only systematic term (expected AD/FD
    ratio ~0.5-1.6; seam-heavy terrain worlds instead trip the documented
    L_front-vs-neighbor bias and are NOT a meaningful FD target).  Returns
    ``(ad, fd, ratio)``."""
    import dataclasses

    import numpy as np

    import jax
    import jax.numpy as jnp

    from raytracer_tpu import raymath as rm
    from raytracer_tpu.builder import scale_camera
    from raytracer_tpu.render import render_frame
    from raytracer_tpu.render.geometry import expand_geometry

    w, scene, camera, cfg = _load(
        "/root/reference/world1.json", width=width, height=height,
        ray_chunk=16384, early_exit=False, spp=spp, edge_aware_grads=True,
        recurse_depth=0, edge_px=1.5,
    )
    # close-up 35-degree-yaw viewpoint (the committed test's fixture): the
    # cube fills a good fraction of the frame and no face is edge-on
    @jax.jit
    def _aabb():  # expand_geometry inside jit: relay round-trip economy
        geom = expand_geometry(scene)
        return geom.aabb_min.min(0), geom.aabb_max.max(0)

    lo, hi = _aabb()
    center = (lo + hi) / 2
    radius = float(jnp.max(hi - lo)) / 2
    qy = rm.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]),
                                 jnp.float32(35 * np.pi / 180))
    rot = rm.quat_normalize(rm.quat_mul(qy, jnp.asarray(w.camera.rot)))
    fwd = rm.normalize(rm.quat_to_mat(rot)[:, 2])
    cam = dataclasses.replace(
        jax.tree_util.tree_map(jnp.asarray, w.camera),
        pos=center - fwd * (3.0 * radius), rot=rot,
    )
    camera = jax.tree_util.tree_map(
        jnp.asarray, scale_camera(cam, width, w.config.width))

    def loss_of(s):
        s2 = dataclasses.replace(scene, verts=scene.verts * (1.0 + s))
        img = render_frame(s2, camera, cfg)
        return jnp.mean(img[..., :3])  # RGB only: alpha sits on the clamp

    lossj = jax.jit(loss_of)
    ad = float(jax.jit(jax.grad(loss_of))(0.0))
    h = 0.03
    fd = (float(lossj(h)) - float(lossj(-h))) / (2 * h)
    ratio = ad / fd if abs(fd) > 1e-12 else float("nan")
    return ad, fd, ratio


def camera_fd_check(config_path="/root/reference/world8_stress.json",
                    width=480, height=270, spp=8):
    """On-chip FD sanity for CAMERA-pose gradients on the stress config
    itself: directional derivative of the spp-averaged image mean along a
    camera dolly.  Unlike per-cube vertex scaling, camera motion moves
    abutting-cube seams coherently (their opposing bands cancel), so AD
    should track FD closely.  Returns ``(ad, fd, ratio)``."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from raytracer_tpu import raymath as rm
    from raytracer_tpu.builder import scale_camera
    from raytracer_tpu.render import render_frame

    w, scene, camera, cfg = _load(
        config_path, width=width, height=height, ray_chunk=16384,
        early_exit=False, spp=spp, edge_aware_grads=True, recurse_depth=0,
    )
    camera = jax.tree_util.tree_map(
        jnp.asarray, scale_camera(w.camera, width, w.config.width)
    )
    fwd = rm.normalize(rm.quat_to_mat(camera.rot)[:, 2])

    def loss_of(s):
        c2 = dataclasses.replace(camera, pos=camera.pos + s * fwd)
        img = render_frame(scene, c2, cfg)
        return jnp.mean(img[..., :3])

    lossj = jax.jit(loss_of)
    ad = float(jax.jit(jax.grad(loss_of))(0.0))
    h = 0.05
    fd = (float(lossj(h)) - float(lossj(-h))) / (2 * h)
    ratio = ad / fd if abs(fd) > 1e-12 else float("nan")
    return ad, fd, ratio


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

    hits = {}
    for name, over in (
        ("cull", dict(pallas_traversal="cull")),
        ("bvh", dict(pallas_traversal="bvh")),
        ("mxu", dict(pallas_kernel="mxu")),
    ):
        cfg2 = cfg.replace(**over)

        # geometry/ray/table prep INSIDE one jit per engine: eager prep
        # through the TPU relay costs ~70 s of small-op round-trips
        @jax.jit
        def run(cfg2=cfg2):
            geom = expand_geometry(scene)
            ro, rd = camera_rays(camera, width, height)
            cast = make_cast(scene, geom, cfg2)
            return cast(ro.reshape(-1, 3), rd.reshape(-1, 3))

        h = run()
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
    # Probe-derived tile caps (auto_tile_caps — world1's lone cube occupies
    # a handful of tiles, so bounce/shadow rounds shrink ~30x); the dense
    # row is reported alongside for the untuned number.
    ms, _ = bench_world("/root/reference/world1.json", auto_caps=True)
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
                        spp=4, scale_cam=True, iters=5, auto_caps=True)
    return {"world4_512_spp4_ms": round(ms, 3)}


def _item_world8_1024_spp16():
    ms, _ = bench_world("/root/reference/world8.json", width=1024,
                        height=1024, spp=16, scale_cam=True, iters=3,
                        auto_caps=True)
    return {"world8_1024_spp16_ms": round(ms, 3)}


def _item_world16_1080p_spp64_bwd():
    # BASELINE configs[3]: backward to materials.  In-program scan with
    # per-sample remat (round-4 staging fix); chunk 32 bounds program time.
    ms, mrays = bench_fwd_bwd_spp(
        "/root/reference/world16.json", spp=64, spp_chunk=None,
        include_lights=False, include_camera=False,
    )
    return {"world16_1080p_spp64_bwd_ms": round(ms, 3),
            "world16_1080p_spp64_bwd_mrays": round(mrays, 3)}


def _item_world8_stress_1080p_spp128():
    # materials+lights+camera gradients (the VERDICT r3 next #1 target row)
    ms, mrays = bench_fwd_bwd_spp(
        "/root/reference/world8_stress.json", spp=128, spp_chunk=None,
    )
    return {"world8_stress_1080p_spp128_fwdbwd_ms": round(ms, 3),
            "world8_stress_1080p_spp128_mrays": round(mrays, 3)}


def _item_world8_stress_geomgrad():
    # BASELINE configs[4] as specified: geometry+camera gradients (vertex
    # positions via the edge-aware band + analytic uv-VJP) at 1080p 128 spp.
    ms, mrays = bench_fwd_bwd_spp(
        "/root/reference/world8_stress.json", spp=128, spp_chunk=None,
        include_vertices=True, edge_aware=True,
    )
    return {"world8_stress_geomgrad_ms": round(ms, 3),
            "world8_stress_geomgrad_mrays": round(mrays, 3)}


def _item_fd_checks():
    # On-chip central-difference sanity for the vertex + camera gradients
    # (VERDICT r3 next #2); split from the geomgrad bench row so each lands
    # independently inside the time budget.
    _, _, vratio = vertex_fd_check()
    _, _, cratio = camera_fd_check()
    return {"vertex_fd_ad_over_fd": round(vratio, 4),
            "camera_fd_ad_over_fd": round(cratio, 4)}


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
    # Tile-granular child compaction with a probe-derived cap: the two
    # spawning cubes cover a handful of tiles, so per-round queue
    # maintenance shrinks ~30x.
    ms, _ = bench_mixed(auto_caps=True)
    dms, _ = bench_mixed()
    return {"mixed_world_ms": round(ms, 3),
            "mixed_world_dense_ms": round(dms, 3)}


def _item_mxu_general_mesh():
    """Scalar vs MXU cast on a GENERAL trimesh world (64 icospheres, 80
    triangles per mesh — the box fast path is off; the MXU Pluecker
    kernel's claimed niche).  VERDICT r3 weak #9: measured round-4 result —
    scalar wins ~10x at 80 tris/mesh and ~3.7x at 320 tris/mesh, so the
    scalar kernel is the production path everywhere and the MXU kernel is
    demoted to an experimental consistency-gate alternative
    (ARCHITECTURE.md)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from raytracer_tpu.render import render_frame
    from raytracer_tpu.scene import device_scene
    from raytracer_tpu.synth import make_sphere_world

    scene, cam, cfg = make_sphere_world(64, 1)
    scene = device_scene(scene)
    camera = jax.tree_util.tree_map(jnp.asarray, cam)
    out = {}
    for kern in ("scalar", "mxu"):
        c = cfg.replace(width=640, height=480, engine="pallas",
                        pallas_kernel=kern)

        def frame(cam_pos, c=c):
            cc = dataclasses.replace(camera, pos=cam_pos)
            return render_frame(scene, cc, c)

        ms, _ = _loop_time_ms(frame, camera.pos, iters=5)
        out[f"sphere64_{kern}_ms"] = round(ms, 3)
    return out


def _item_dsweep():
    """Sweep the kernel tile size (the reference's -d plots, world*b*.png):
    frame time on world8 640x480 per tile_rows in {8, 16, 24, 32, 48, 64}
    (the d = sqrt(128 * rows) block-edge equivalents; Mosaic requires the
    sublane dimension in multiples of 8).  Long chains (iters=20): at
    iters=5 the relay jitter reordered the sweep run-to-run."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from raytracer_tpu.render import render_frame

    out = {}
    for rows in (8, 16, 24, 32, 48, 64):
        w, scene, camera, cfg = _load(
            "/root/reference/world8.json", ray_chunk=8192, tile_rows=rows
        )

        def frame(cam_pos):
            cam = dataclasses.replace(camera, pos=cam_pos)
            return render_frame(scene, cam, cfg)

        ms, _ = _loop_time_ms(frame, camera.pos, iters=20)
        out[f"world8_d{rows}rows_ms"] = round(ms, 3)
        print(f"dsweep tile_rows={rows}: {ms:.3f} ms", file=sys.stderr,
              flush=True)
    return out


def _item_consistency():
    return {"consistency": consistency_check()}


# Priority order: the headline row and the cheap BASELINE-ladder rows run
# first so a cold-cache run inside a tight driver timeout still lands them;
# the heavy spp scans and diagnostic sweeps follow.
ITEMS = {
    "world8": _item_world8,
    "world1": _item_world1,
    "world16": _item_world16,
    "fwd_bwd_1080p": _item_fwd_bwd_1080p,
    "consistency": _item_consistency,
    "world4_512_spp4": _item_world4_512_spp4,
    "mixed_world": _item_mixed_world,
    "world16_1080p_spp64_bwd": _item_world16_1080p_spp64_bwd,
    "world8_stress_1080p_spp128": _item_world8_stress_1080p_spp128,
    "world8_stress_geomgrad": _item_world8_stress_geomgrad,
    "world8_1024_spp16": _item_world8_1024_spp16,
    "world8_bvh": _item_world8_bvh,
    "synth4096_bvh": _item_synth4096_bvh,
    "synth4096_cull": _item_synth4096_cull,
    "world16_cull": _item_world16_cull,
    "fd_checks": _item_fd_checks,
    "mxu_general_mesh": _item_mxu_general_mesh,
    "dsweep": _item_dsweep,
}

# Per-item ceilings (cold-cache compile included); the global budget caps
# each slice further at whatever remains.
ITEM_TIMEOUT_S = {
    "world8_1024_spp16": 2400,
    "world16_1080p_spp64_bwd": 3600,
    "world8_stress_1080p_spp128": 3600,
    "world8_stress_geomgrad": 3600,
}

# WARM-cache cost estimates (measured 2026-08-21 on the v5e relay; dominated
# by Python tracing + StableHLO lowering, which the persistent cache cannot
# skip).  An item is attempted only when the remaining budget covers its
# estimate — otherwise it is skipped IMMEDIATELY and the next item that fits
# runs, so a too-big item never burns a doomed partial slice.
ITEM_EST_S = {
    "world8": 30,
    "world1": 60,
    "world16": 55,
    "fwd_bwd_1080p": 80,
    "consistency": 40,
    "world4_512_spp4": 65,
    "mixed_world": 85,
    "world16_1080p_spp64_bwd": 200,
    "world8_stress_1080p_spp128": 180,
    "world8_stress_geomgrad": 210,
    "world8_1024_spp16": 70,
    "world8_bvh": 40,
    "synth4096_bvh": 30,
    "synth4096_cull": 30,
    "world16_cull": 60,
    "fd_checks": 130,
    "mxu_general_mesh": 40,
    "dsweep": 150,
}

BENCH_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1350"))
_RESERVE_S = 15  # headroom to print the final line
_MIN_SLICE_S = 45  # don't start an item with less than this remaining


def run_item(key: str) -> int:
    """Child-process entry: run one item, print its extras as one JSON line."""
    _setup_compile_cache()
    try:
        out = ITEMS[key]()
    except Exception as e:  # pragma: no cover
        out = {key + "_error": f"{type(e).__name__}: {e}"[:200]}
    print(json.dumps(out))
    return 0


def _run_schedule(keys, run_one, budget_s, est=None, timeouts=None,
                  now=time.perf_counter):
    """Budget-bounded item scheduler (unit-testable core of ``main``).

    Runs items in the given priority order; an item starts only when the
    remaining budget (minus the final-line reserve) covers its warm-cost
    estimate, otherwise it is skipped immediately — a too-big item never
    burns a doomed partial slice, and the caller always has budget left to
    print the final line.  ``run_one(key, timeout_s) -> dict`` does the
    work (subprocess in production, a stub in tests).

    Items whose first attempt ERRORS (timeout / crash / no output) get ONE
    retry each after the full pass, oldest-priority first, inside whatever
    budget remains: a transient TPU-relay init wedge has stalled a
    70-second item past its slice cap (observed on the headline row — which
    would have reported ``value: null`` for the whole run), while the very
    next subprocess ran normally, so a second attempt is cheap insurance."""
    est = ITEM_EST_S if est is None else est
    timeouts = ITEM_TIMEOUT_S if timeouts is None else timeouts
    deadline = now() + budget_s
    extras = {}
    skipped = []

    def attempt(key, label):
        remaining = deadline - now() - _RESERVE_S
        if remaining < max(_MIN_SLICE_S, est.get(key, _MIN_SLICE_S)):
            return None  # budget can't cover it
        # a started item is additionally capped at 3x its warm estimate
        # (floor 300 s — covers cold-cache compiles, measured <=1.6x of
        # that), so one pathological hang cannot starve every later item
        cap = max(3 * est.get(key, _MIN_SLICE_S), 300)
        t0 = now()
        try:
            out = run_one(key, min(timeouts.get(key, 1200), remaining, cap))
        except subprocess.TimeoutExpired:
            out = {key + "_error": "timeout"}
        except Exception as e:  # pragma: no cover
            out = {key + "_error": f"{type(e).__name__}: {e}"[:200]}
        dt = now() - t0
        print(f"{label}: {out} [{dt:.0f}s]", file=sys.stderr, flush=True)
        return out

    failed = []
    for key in keys:
        out = attempt(key, key)
        if out is None:
            skipped.append(key)
            continue
        extras.update(out)
        if key + "_error" in out:
            failed.append(key)
    for key in failed:
        out = attempt(key, f"{key} (retry)")
        if out is None or key + "_error" in out:
            continue
        extras.pop(key + "_error", None)
        extras.update(out)
    if skipped:
        extras["skipped"] = skipped
        print(f"budget exhausted ({budget_s:.0f}s): skipped {skipped}",
              file=sys.stderr, flush=True)
    return extras


def _run_item_subprocess(key, timeout_s):
    """Production ``run_one``: crash-isolated child process per item."""
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--item", key],
        capture_output=True, text=True, timeout=timeout_s, cwd=_HERE,
    )
    line = proc.stdout.strip().splitlines()
    return json.loads(line[-1]) if line else {
        key + "_error": f"no output (rc={proc.returncode}): "
        + proc.stderr.strip()[-150:]
    }


def main():
    extras = _run_schedule(list(ITEMS), _run_item_subprocess, BENCH_BUDGET_S)

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
