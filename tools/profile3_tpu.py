"""Loop-timed decomposition of the world8 frame on the TPU."""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tools")
from tpu_timing import report

from raytracer_tpu import generate
from raytracer_tpu.render import shading
from raytracer_tpu.render.engine import make_cast, render_frame, BLOCK, _to_blocks
from raytracer_tpu.render.geometry import expand_geometry, camera_rays
from raytracer_tpu.render.cast import Hit, hit_shading_attrs
from raytracer_tpu.scene import device_scene
from raytracer_tpu import raymath as rm


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    w = generate("/root/reference/world8.json")
    scene = device_scene(w.scene)
    camera = jax.tree_util.tree_map(jnp.asarray, w.camera)
    H, W = 480, 640
    cfg = w.config.replace(width=W, height=H, engine="pallas",
                           pallas_kernel="scalar")

    geom = expand_geometry(scene)
    cast = make_cast(scene, geom, cfg)

    ro, rd = camera_rays(camera, W, H)
    hp = (H + BLOCK - 1) // BLOCK * BLOCK
    wp = (W + BLOCK - 1) // BLOCK * BLOCK
    ro = jnp.pad(ro, ((0, hp - H), (0, wp - W), (0, 0)))
    rd = jnp.pad(rd, ((0, hp - H), (0, wp - W), (0, 0)), constant_values=1.0)
    ro_b = jax.block_until_ready(_to_blocks(ro, hp, wp).reshape(-1, 3))
    rd_b = jax.block_until_ready(_to_blocks(rd, hp, wp).reshape(-1, 3))

    def cast_t(ro_, rd_):
        h = cast(ro_, rd_)
        return jnp.where(jnp.isfinite(h.t), h.t, 0.0)

    t_cast = report("primary cast", cast_t, ro_b, rd_b)

    hit0 = cast(ro_b, rd_b)
    hit0 = Hit(valid=hit0.valid, t=jnp.where(hit0.valid, hit0.t, 1.0),
               wtri=hit0.wtri, uv=hit0.uv)
    hit0 = jax.block_until_ready(hit0)
    hit_pos = jax.block_until_ready(ro_b + hit0.t[:, None] * rd_b)

    def shadow_point(hp_):
        d2l = rm.normalize(scene.lights.point_pos[0] - hp_)
        h = cast(hp_ + rm.THRESHOLD * d2l, d2l)
        return jnp.where(jnp.isfinite(h.t), h.t, 0.0)

    report("shadow cast (point light)", shadow_point, hit_pos)

    def shadow_dir(hp_):
        d2l = rm.normalize(-scene.lights.dir_dir[0])
        d2l = jnp.broadcast_to(d2l, hp_.shape)
        h = cast(hp_ + rm.THRESHOLD * d2l, d2l)
        return jnp.where(jnp.isfinite(h.t), h.t, 0.0)

    report("shadow cast (dir light)", shadow_dir, hit_pos)

    def three_casts(ro_, rd_):
        h = cast(ro_, rd_)
        t1 = jnp.where(jnp.isfinite(h.t), h.t, 1.0)
        hp1 = ro_ + t1[:, None] * rd_
        d2l = rm.normalize(scene.lights.point_pos[0] - hp1)
        h2 = cast(hp1 + rm.THRESHOLD * d2l, d2l)
        d3 = rm.normalize(-scene.lights.dir_dir[0])
        d3 = jnp.broadcast_to(d3, hp1.shape)
        h3 = cast(hp1 + rm.THRESHOLD * d3, d3)
        return (jnp.where(jnp.isfinite(h2.t), h2.t, 0.0)
                + jnp.where(jnp.isfinite(h3.t), h3.t, 0.0))

    report("3 casts chained", three_casts, ro_b, rd_b)

    # full frame (camera.pos is the float chain arg)
    def frame(cam_pos):
        import dataclasses

        cam = dataclasses.replace(camera, pos=cam_pos)
        return render_frame(scene, cam, cfg)

    report("full frame", frame, camera.pos, iters=5)

    # frame with shadow march stubbed out (lights fully lit)
    orig = shading._march_shadow

    def lit(scene_, geom_, cast_fn_, origin, dir_unit, max_t, light_col,
            cfg_, active):
        return jnp.broadcast_to(light_col, origin.shape[:-1] + (4,))

    shading._march_shadow = lit
    try:
        def frame_noshadow(cam_pos):
            import dataclasses

            cam = dataclasses.replace(camera, pos=cam_pos)
            return render_frame(scene, cam, cfg)

        report("frame, shadow march stubbed", frame_noshadow, camera.pos,
               iters=5)
    finally:
        shading._march_shadow = orig


if __name__ == "__main__":
    main()
