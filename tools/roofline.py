"""Single-chip roofline for the headline kernels (VERDICT r3 next #5).

Measures, on the attached TPU:
  1. empirical peaks: VPU f32 FLOP/s (fma chain on a VMEM-resident block) and
     HBM GB/s (big streaming add) — self-calibrated, no spec sheets;
  2. the world8 640x480 forward frame's time split (cast / shadow occlusion /
     shading glue) via config deltas;
  3. the cast kernel's arithmetic intensity from its own node-visit counters
     (the LBVH walk exposes per-tile visit counts), giving achieved VPU
     utilization and the speed-of-light gap.

Prints one JSON line; prose goes to stderr.  Results feed BASELINE.md's
"single-chip roofline" section.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp


def t_ms(f, *a, n=5):
    """Time f by FETCHING its (scalar-reducible) result — on the TPU relay
    ``block_until_ready`` is not a trustworthy fence; a host transfer is."""
    def fetch():
        out = f(*a)
        return float(jnp.sum(jnp.asarray(
            jax.tree_util.tree_leaves(out)[0], jnp.float32)))

    fetch()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fetch()
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def vpu_peak_tflops():
    """f32 multiply-add chain over a [256, 1024] VMEM-resident block: a
    non-affine data-dependent recurrence (XLA cannot closed-form it), timed
    as one long in-jit loop (the TPU relay's block_until_ready is not a
    trustworthy fence for short programs)."""
    x = jnp.full((256, 1024), 1.0000001, jnp.float32)
    iters = 20000

    @jax.jit
    def run(x):
        def body(i, acc):
            # non-affine: acc <- acc*acc*eps + acc (2 mul + 1 add)
            return acc * acc * 1e-9 + acc
        return jnp.sum(jax.lax.fori_loop(0, iters, body, x))

    ms = t_ms(run, x)
    flops = x.size * iters * 3
    return flops / (ms * 1e-3) / 1e12


def hbm_peak_gbs():
    """Streaming sum-reduction over a 1 GB operand, 8 dependent passes
    in-jit (each pass must re-read the array from HBM)."""
    n = 256 * 1024 * 1024  # 1 GB f32
    a = jnp.ones((n,), jnp.float32)
    iters = 8

    @jax.jit
    def run(a):
        def body(i, carry):
            s, a_ = carry
            return s + jnp.sum(a_ + s * 1e-30), a_
        s, _ = jax.lax.fori_loop(0, iters, body, (jnp.float32(0), a))
        return s

    ms = t_ms(run, a)
    bytes_moved = n * 4 * iters
    return bytes_moved / (ms * 1e-3) / 1e9


def world8_split():
    """world8 640x480 forward: total, no-shadow, cast-only times."""
    from raytracer_tpu import generate
    from raytracer_tpu.render.engine import (make_cast, render_rays,
                                             _frame_rays_blocked)
    from raytracer_tpu.render.geometry import expand_geometry
    from raytracer_tpu.scene import device_scene

    w = generate("/root/reference/world8.json")
    scene = device_scene(w.scene)
    camera = jax.tree_util.tree_map(jnp.asarray, w.camera)
    cfg = w.config.replace(engine="pallas", pallas_kernel="scalar",
                           ray_chunk=8192)
    geom = expand_geometry(scene)
    cast = make_cast(scene, geom, cfg)
    ro, rd, hp, wp = _frame_rays_blocked(camera, cfg, None)
    R = ro.shape[0]

    def iterate(f, iters=20):
        @jax.jit
        def run(ro):
            def body(i, carry):
                csum, o = carry
                out = f(o + 1e-30 * csum)
                return jnp.sum(out) * 1e-30, o
            s, _ = jax.lax.fori_loop(0, iters, body, (jnp.float32(0), ro))
            return s
        return t_ms(run, ro) / iters

    full_ms = iterate(lambda o: render_rays(scene, geom, cast, cfg, o, rd))
    # lights stripped -> no shadow queries
    sc2 = dataclasses.replace(
        scene, lights=dataclasses.replace(
            scene.lights,
            point_pos=scene.lights.point_pos[:0],
            point_col=scene.lights.point_col[:0],
            dir_dir=scene.lights.dir_dir[:0],
            dir_col=scene.lights.dir_col[:0]))
    cast2 = make_cast(sc2, geom, cfg)
    noshadow_ms = iterate(
        lambda o: render_rays(sc2, geom, cast2, cfg, o, rd))
    cast_ms = iterate(lambda o: cast(o, rd).t)

    # LBVH walk node visits per tile (the kernel's own counter)
    from raytracer_tpu.render.pallas_engine import make_pallas_cast
    cfg_bvh = cfg.replace(pallas_traversal="bvh")
    pc = make_pallas_cast(scene, geom, cfg_bvh)
    visits = jax.jit(pc.visit_counts)(ro, rd)
    total_visits = int(jnp.sum(visits))
    n_tiles = int(visits.shape[0])
    cast_bvh = make_cast(scene, geom, cfg_bvh)
    cast_bvh_ms = iterate(lambda o: cast_bvh(o, rd).t)

    return dict(R=R, full_ms=full_ms, noshadow_ms=noshadow_ms,
                cast_ms=cast_ms, cast_bvh_ms=cast_bvh_ms,
                visits=total_visits, tiles=n_tiles)


def main():
    vpu = vpu_peak_tflops()
    hbm = hbm_peak_gbs()
    print(f"measured VPU f32 peak ~{vpu:.2f} Tflop/s, HBM ~{hbm:.0f} GB/s",
          file=sys.stderr)
    s = world8_split()
    shadow_ms = s["full_ms"] - s["noshadow_ms"]
    glue_ms = s["noshadow_ms"] - s["cast_ms"]
    # Arithmetic of the walk: per visited node, the whole tile (tile_rows x
    # 128 lanes) evaluates the slab test (~45 flops/lane incl. selects);
    # leaf instance hits add the box-face path (~120 flops/lane).  Leaves
    # are a ~third of preorder visits; count all visits at the slab cost +
    # leaves at box cost for a conservative (under)estimate of useful flops.
    from raytracer_tpu.scene import RenderConfig

    lanes = RenderConfig().tile_rows * 128
    slab_flops = 45
    leaf_flops = 120
    visits = s["visits"]
    est_flops = visits * lanes * slab_flops + (visits / 3) * lanes * leaf_flops
    achieved = est_flops / (s["cast_bvh_ms"] * 1e-3)
    util = achieved / (vpu * 1e12)
    # HBM side of the cast: rays in (24 B) + hit record out (~36 B)
    bytes_total = s["R"] * (24 + 36)
    hbm_used = bytes_total / (s["cast_bvh_ms"] * 1e-3) / 1e9
    out = {
        "vpu_peak_tflops": round(vpu, 2),
        "hbm_peak_gbs": round(hbm, 1),
        "world8_640x480": {
            "full_ms": round(s["full_ms"], 3),
            "cast_ms": round(s["cast_ms"], 3),
            "cast_bvh_ms": round(s["cast_bvh_ms"], 3),
            "shadow_ms": round(shadow_ms, 3),
            "glue_ms": round(glue_ms, 3),
        },
        "bvh_walk": {
            "node_visits": s["visits"],
            "tiles": s["tiles"],
            "est_useful_flops": int(est_flops),
            "achieved_tflops": round(achieved / 1e12, 3),
            "vpu_utilization": round(util, 4),
            "hbm_gbs_used": round(hbm_used, 2),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
