"""Attributed-stage TPU profile for one world/config (the consolidation of
the round-2 scratch profilers — VERDICT r2 weak #9).

Reports loop-timed (see tpu_timing.py) per-stage costs:

  primary cast         one closest-hit kernel launch over the blocked frame
  occlusion query      one any-hit launch (when the cast provides .occlude)
  shadow casts         point/dir-light closest-hit casts from hit points
  full frame           render_frame end to end
  frame, lit           render_frame with the shadow march stubbed fully lit
                       (frame minus shadow cost = shading+bounce share)
  fwd+bwd step         value_and_grad to materials/lights/camera (--train)

Usage (ambient TPU env — do NOT strip PYTHONPATH):
  python tools/profile_stages.py -c /root/reference/world8.json
  python tools/profile_stages.py -c /root/reference/world1.json --depth 2
  python tools/profile_stages.py -c /root/reference/world16.json \
      --traversal bvh --train
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tools")
from tpu_timing import report

from raytracer_tpu import diff, generate
from raytracer_tpu import raymath as rm
from raytracer_tpu.render import shading
from raytracer_tpu.render.engine import (BLOCK, _to_blocks, make_cast,
                                         render_frame)
from raytracer_tpu.render.geometry import camera_rays, expand_geometry
from raytracer_tpu.scene import device_scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", default="/root/reference/world8.json")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--engine", default="pallas")
    ap.add_argument("--kernel", default="scalar")
    ap.add_argument("--traversal", default="auto",
                    choices=["auto", "cull", "bvh"])
    ap.add_argument("--depth", type=int, default=None,
                    help="override recurse_depth")
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--train", action="store_true",
                    help="also time the fwd+bwd step")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    w = generate(args.config)
    scene = device_scene(w.scene)
    camera = jax.tree_util.tree_map(jnp.asarray, w.camera)
    H, W = args.height, args.width
    cfg = w.config.replace(width=W, height=H, engine=args.engine,
                           pallas_kernel=args.kernel,
                           pallas_traversal=args.traversal, spp=args.spp)
    if args.depth is not None:
        cfg = cfg.replace(recurse_depth=args.depth)

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

    report("primary cast", cast_t, ro_b, rd_b, iters=args.iters)

    occ = getattr(cast, "occlude", None)
    if occ is not None:
        def occl(ro_, rd_):
            return occ(ro_, rd_, jnp.float32(1e30)).astype(jnp.float32)

        report("occlusion query", occl, ro_b, rd_b, iters=args.iters)

    hit0 = cast(ro_b, rd_b)
    t0 = jnp.where(hit0.valid, hit0.t, 1.0)
    hit_pos = jax.block_until_ready(ro_b + t0[:, None] * rd_b)

    if scene.lights.point_pos.shape[0]:
        def shadow_point(hp_):
            d2l = rm.normalize(scene.lights.point_pos[0] - hp_)
            h = cast(hp_ + rm.THRESHOLD * d2l, d2l)
            return jnp.where(jnp.isfinite(h.t), h.t, 0.0)

        report("shadow cast (point light)", shadow_point, hit_pos,
               iters=args.iters)
    if scene.lights.dir_dir.shape[0]:
        def shadow_dir(hp_):
            d2l = rm.normalize(-scene.lights.dir_dir[0])
            d2l = jnp.broadcast_to(d2l, hp_.shape)
            h = cast(hp_ + rm.THRESHOLD * d2l, d2l)
            return jnp.where(jnp.isfinite(h.t), h.t, 0.0)

        report("shadow cast (dir light)", shadow_dir, hit_pos,
               iters=args.iters)

    def frame(cam_pos):
        cam = dataclasses.replace(camera, pos=cam_pos)
        return render_frame(scene, cam, cfg)

    report("full frame", frame, camera.pos, iters=max(3, args.iters // 2))

    orig = shading._march_shadow

    def lit(scene_, geom_, cast_fn_, origin, dir_unit, max_t, light_col,
            cfg_, active):
        return jnp.broadcast_to(light_col, origin.shape[:-1] + (4,))

    shading._march_shadow = lit
    try:
        report("frame, shadow march stubbed", frame, camera.pos,
               iters=max(3, args.iters // 2))
    finally:
        shading._march_shadow = orig

    if args.train:
        cfg_t = cfg.replace(early_exit=False)
        params = diff.trainable_params(scene, camera)
        target = jnp.zeros((H, W, 4), jnp.float32)

        def step(target_):
            def loss(p):
                return diff.l2_image_loss(
                    diff.render_with_params(scene, camera, cfg_t, p), target_
                )

            value, grads = jax.value_and_grad(loss)(params)
            return value, grads

        report("fwd+bwd step", step, target, iters=3)


if __name__ == "__main__":
    main()
