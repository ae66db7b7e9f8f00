"""Attribute world8 frame overhead (non-cast) to engine stages on the TPU."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from raytracer_tpu import generate
from raytracer_tpu.render.engine import make_cast, BLOCK, _to_blocks
from raytracer_tpu.render.geometry import expand_geometry, camera_rays
from raytracer_tpu.render.cast import Hit, hit_shading_attrs
from raytracer_tpu.render.shading import illuminate, distance_attenuation, phong_term
from raytracer_tpu.scene import device_scene
from raytracer_tpu import raymath as rm

_NULL = None


def sync_ms():
    global _NULL
    if _NULL is None:
        f = jax.jit(lambda x: jnp.sum(x))
        x = jnp.ones((8,))
        float(f(x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(x))
            ts.append((time.perf_counter() - t0) * 1e3)
        _NULL = min(ts)
        print(f"null fetch: {_NULL:.2f} ms", file=sys.stderr)
    return _NULL


def timeit(name, fn, *args, repeats=3):
    out = fn(*args)
    s = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        times.append((time.perf_counter() - t0) * 1e3)
    ms = max(min(times) - sync_ms(), 0.0)
    print(f"{name:40s} {ms:9.2f} ms   (checksum {s:.4g})", flush=True)
    return ms


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    sync_ms()
    w = generate("/root/reference/world8.json")
    scene = device_scene(w.scene)
    camera = jax.tree_util.tree_map(jnp.asarray, w.camera)
    H, W = 480, 640
    cfg = w.config.replace(width=W, height=H, engine="pallas",
                           pallas_kernel="scalar")

    geom = expand_geometry(scene)
    cast = make_cast(scene, geom, cfg)

    @jax.jit
    def raygen():
        ro, rd = camera_rays(camera, W, H)
        hp = (H + BLOCK - 1) // BLOCK * BLOCK
        wp = (W + BLOCK - 1) // BLOCK * BLOCK
        ro = jnp.pad(ro, ((0, hp - H), (0, wp - W), (0, 0)))
        rd = jnp.pad(rd, ((0, hp - H), (0, wp - W), (0, 0)),
                     constant_values=1.0)
        return (_to_blocks(ro, hp, wp).reshape(-1, 3),
                _to_blocks(rd, hp, wp).reshape(-1, 3))

    timeit("raygen+blocks", raygen)
    ro_b, rd_b = jax.block_until_ready(raygen())

    @jax.jit
    def cast_only(ro, rd):
        h = cast(ro, rd)
        return jnp.where(jnp.isfinite(h.t), h.t, 0.0)

    timeit("primary cast", cast_only, ro_b, rd_b)

    hit0 = cast(ro_b, rd_b)
    hit0 = Hit(valid=hit0.valid, t=jnp.where(hit0.valid, hit0.t, 1.0),
               wtri=hit0.wtri, uv=hit0.uv)
    hit0 = jax.block_until_ready(hit0)

    @jax.jit
    def attrs_only(hit):
        n, m, i = hit_shading_attrs(geom, hit)
        return n + m[:, None]

    timeit("hit_shading_attrs (gathers)", attrs_only, hit0)

    normal, mat_idx, _ = jax.block_until_ready(
        jax.jit(lambda h: hit_shading_attrs(geom, h))(hit0))

    @jax.jit
    def shade_noshadow(hit, normal, mat_idx):
        mats = scene.materials
        hit_pos = ro_b + hit.t[:, None] * rd_b
        col = mats.ke[mat_idx] + mats.ka[mat_idx] * scene.ambience
        lpos = scene.lights.point_pos[0]
        lcol = scene.lights.point_col[0]
        disp = lpos - hit_pos
        dist = rm.norm(disp)
        datten = distance_attenuation(scene, dist)
        d2l = rm.normalize(disp)
        incoming = datten[..., None] * lcol
        col = col + phong_term(scene, mat_idx, incoming, rd_b, d2l, normal)
        ldir = scene.lights.dir_dir[0]
        col = col + phong_term(scene, mat_idx, scene.lights.dir_col[0],
                               rd_b, -ldir, normal)
        return col

    timeit("shade, NO shadow casts", shade_noshadow, hit0, normal, mat_idx)

    @jax.jit
    def shade_full(hit, normal, mat_idx):
        active = hit.valid
        return illuminate(scene, geom, cast, cfg, ro_b, rd_b, hit,
                          normal, mat_idx, active)

    timeit("illuminate (2 shadow casts)", shade_full, hit0, normal, mat_idx)

    # shadow casts alone, from the real hit points
    hit_pos = jax.block_until_ready(ro_b + hit0.t[:, None] * rd_b)

    @jax.jit
    def shadow_point(hp_):
        d2l = rm.normalize(scene.lights.point_pos[0] - hp_)
        h = cast(hp_ + rm.THRESHOLD * d2l, d2l)
        return jnp.where(jnp.isfinite(h.t), h.t, 0.0)

    timeit("shadow cast (point light)", shadow_point, hit_pos)

    @jax.jit
    def shadow_dir(hp_):
        d2l = rm.normalize(-scene.lights.dir_dir[0])
        d2l = jnp.broadcast_to(d2l, hp_.shape)
        h = cast(hp_ + rm.THRESHOLD * d2l, d2l)
        return jnp.where(jnp.isfinite(h.t), h.t, 0.0)

    timeit("shadow cast (dir light)", shadow_dir, hit_pos)

    from raytracer_tpu.render.engine import render_frame

    @jax.jit
    def frame(scene_, camera_):
        return render_frame(scene_, camera_, cfg)

    timeit("full frame", frame, scene, camera)


if __name__ == "__main__":
    main()
