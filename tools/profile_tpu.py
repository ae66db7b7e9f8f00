"""Attribute world8 frame time to pipeline stages on the real TPU.

Times each stage via the checksum-fetch fence (see bench.py's _sync_ms note:
the TPU relay makes block_until_ready unreliable, so every timing fetches a
scalar derived from the result and subtracts the null-fetch latency).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from raytracer_tpu import generate
from raytracer_tpu.render import render_frame
from raytracer_tpu.render.engine import make_cast, BLOCK, _to_blocks
from raytracer_tpu.render.geometry import expand_geometry, camera_rays
from raytracer_tpu.render.pallas_engine import tile_candidates, build_tables
from raytracer_tpu.scene import device_scene

_NULL = None


def sync_ms():
    global _NULL
    if _NULL is None:
        f = jax.jit(lambda x: jnp.sum(x))
        x = jnp.ones((8,))
        float(f(x))
        _NULL = min(
            (lambda t0: (float(f(x)), time.perf_counter() - t0)[1])(time.perf_counter()) * 1e3
            for _ in range(5)
        )
        print(f"null fetch: {_NULL:.2f} ms", file=sys.stderr)
    return _NULL


def timeit(name, fn, *args, repeats=3):
    out = fn(*args)
    s = float(jnp.sum(out[0] if isinstance(out, tuple) else
                      jax.tree_util.tree_leaves(out)[0]))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else
                      jax.tree_util.tree_leaves(out)[0]))
        times.append((time.perf_counter() - t0) * 1e3)
    ms = max(min(times) - sync_ms(), 0.0)
    print(f"{name:36s} {ms:9.2f} ms   (checksum {s:.4g})")
    return ms


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    sync_ms()
    w = generate("/root/reference/world8.json")
    scene = device_scene(w.scene)
    camera = jax.tree_util.tree_map(jnp.asarray, w.camera)
    H, W = 480, 640

    base = w.config.replace(width=W, height=H, use_bvh=True, ray_chunk=8192)

    # primary rays in block layout (what the engine feeds the cast)
    geom = expand_geometry(scene)
    ro, rd = camera_rays(camera, W, H)
    hp = (H + BLOCK - 1) // BLOCK * BLOCK
    wp = (W + BLOCK - 1) // BLOCK * BLOCK
    ro = jnp.pad(ro, ((0, hp - H), (0, wp - W), (0, 0)))
    rd = jnp.pad(rd, ((0, hp - H), (0, wp - W), (0, 0)),
                 constant_values=1.0)
    ro_b = _to_blocks(ro, hp, wp).reshape(-1, 3)
    rd_b = _to_blocks(rd, hp, wp).reshape(-1, 3)
    print(f"rays: {ro_b.shape[0]}  world_tris: {geom.a.shape[0]}  "
          f"instances: {geom.aabb_min.shape[0]}")

    # stage: tile_candidates alone (mxu tile = 4*128)
    tables = build_tables(scene, geom)

    @jax.jit
    def cand_only(ro_f, rd_f):
        rows = ro_f.shape[0] // 128
        comps = [ro_f[:, 0].reshape(rows, 128), ro_f[:, 1].reshape(rows, 128),
                 ro_f[:, 2].reshape(rows, 128), rd_f[:, 0].reshape(rows, 128),
                 rd_f[:, 1].reshape(rows, 128), rd_f[:, 2].reshape(rows, 128)]
        cand, info = tile_candidates(comps, 4, tables.inst_f32, 32)
        return cand.astype(jnp.float32)

    timeit("tile_candidates (mxu tiles)", cand_only, ro_b, rd_b)

    for kernel in ("mxu", "scalar"):
        cfg = base.replace(engine="pallas", pallas_kernel=kernel)
        cast = make_cast(scene, geom, cfg)

        @jax.jit
        def cast_once(ro_f, rd_f):
            h = cast(ro_f, rd_f)
            return jnp.where(jnp.isfinite(h.t), h.t, 0.0)

        timeit(f"cast[{kernel}] primary 307k rays", cast_once, ro_b, rd_b)

        @jax.jit
        def frame(scene_, camera_):
            return render_frame(scene_, camera_, cfg)

        timeit(f"frame[pallas/{kernel}]", frame, scene, camera)

    # culled jnp cast for comparison
    cfg = base.replace(engine="jnp", use_bvh=True)
    cast = make_cast(scene, geom, cfg)

    @jax.jit
    def cast_jnp(ro_f, rd_f):
        h = cast(ro_f, rd_f)
        return jnp.where(jnp.isfinite(h.t), h.t, 0.0)

    timeit("cast[jnp culled] primary", cast_jnp, ro_b, rd_b)

    @jax.jit
    def frame_jnp(scene_, camera_):
        return render_frame(scene_, camera_, cfg)

    timeit("frame[jnp culled]", frame_jnp, scene, camera)


if __name__ == "__main__":
    main()
