"""Command-line interface mirroring the reference app (src/main.cc:31-79).

Reference flags -> ours:
  -c/--config   : world JSON config (same files, parsed bit-compatibly)
  -b/--bench    : one-shot benchmark of a full frame (prints ``Time: <ms>``
                  plus a machine-readable JSON line)
  -r/--no-bvh   : disable acceleration structures (brute-force fallback)
  -s/--reference-impl : use the pure-jnp oracle engine (the analog of the
                  reference's serial CPU path)
  -d/--dim      : kept for CLI parity; on TPU this maps to the ray-chunk size
                  (kernel tile geometry is chosen by the engine)

The SDL window is replaced by a PNG framebuffer dump (``--out``); interactive
viewing on a TPU pod host is out of scope (SURVEY.md §7.9).  ``--debug-pixel X Y``
is the analog of the reference's click-to-debug single-ray probe (main.cc:181-186).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="raytracer-tpu", description="A TPU-accelerated differentiable ray tracer."
    )
    p.add_argument("-c", "--config", required=True, help="world config (json)")
    p.add_argument("-b", "--bench", action="store_true", help="benchmark mode")
    p.add_argument(
        "-r", "--no-bvh", action="store_true",
        help="disable optimizing data structures (brute force)",
    )
    p.add_argument(
        "-s", "--reference-impl", action="store_true",
        help="use the pure-jnp oracle engine",
    )
    p.add_argument("-d", "--dim", type=int, default=16, help="tile dimension hint")
    p.add_argument("-o", "--out", default=None, help="output PNG path")
    p.add_argument("--width", type=int, default=None, help="override canvas width")
    p.add_argument("--height", type=int, default=None, help="override canvas height")
    p.add_argument(
        "--debug-pixel", nargs=2, type=int, metavar=("X", "Y"),
        help="trace one pixel verbosely (single-ray probe)",
    )
    p.add_argument("--repeats", type=int, default=1, help="bench repetitions")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from . import generate
    from .render import render_frame
    from .scene import device_scene
    from .pngio import write_png

    world = generate(args.config)
    cfg = world.config
    if args.width:
        cfg = cfg.replace(width=args.width)
    if args.height:
        cfg = cfg.replace(height=args.height)
    # -s pins the brute-force oracle; default is the accelerated XLA path.
    # (The Pallas engine slots in here once cfg.engine == "pallas" exists.)
    cfg = cfg.replace(
        use_bvh=not args.no_bvh and not args.reference_impl,
        engine="jnp",
    )
    scene = device_scene(world.scene)
    camera = jax.tree_util.tree_map(jnp.asarray, world.camera)
    print(f"Loaded scene: {args.config} ({cfg.width}x{cfg.height})")

    if args.debug_pixel:
        from .debug import debug_cast

        x, y = args.debug_pixel
        debug_cast(scene, camera, cfg, x, y)
        return 0

    render = jax.jit(render_frame, static_argnames=("cfg",))

    if args.bench:
        # Warm-up compile (excluded, like the reference's already-warm GPU ctx).
        img = render(scene, camera, cfg)
        jax.block_until_ready(img)
        times = []
        for _ in range(max(1, args.repeats)):
            t0 = time.perf_counter()
            img = render(scene, camera, cfg)
            jax.block_until_ready(img)
            times.append((time.perf_counter() - t0) * 1e3)
        ms = min(times)
        rays = cfg.width * cfg.height
        print(f"Time: {ms:.3f} ms")
        print(json.dumps({
            "metric": "frame_ms",
            "value": ms,
            "unit": "ms",
            "config": args.config,
            "width": cfg.width,
            "height": cfg.height,
            "primary_mrays_per_s": rays / ms / 1e3,
        }))
    else:
        img = np.asarray(render(scene, camera, cfg))
        out = args.out or "frame.png"
        write_png(out, img[..., :3])
        print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
