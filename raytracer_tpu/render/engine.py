"""Top-level render engine: wavefront bounce propagation + frame assembly.

Replaces the reference's per-pixel recursion / explicit stack machine
(``propagate_ray``, src/rayenv/scene.cu:75-187 and the cleaner CPU recursion
scene.cu:222-268) with a **compacted wavefront**: one fixed-capacity work queue
of ray items (the SoA analog of ``RayFrame``), advanced one bounce round per
``lax.scan`` step.  Each round casts the whole queue, shades, scatter-adds into
the framebuffer, spawns reflect/refract children, and compacts the (up to 2x)
candidates back to queue capacity by sorting inactive items to the back — the
TPU-shaped replacement for per-thread recursion stacks and the
"sorted stream/queue formulation" called for in BASELINE.json.

Because round shapes are identical, the whole bounce loop compiles once
(a single cast + shade instance), instead of one copy per node of the
2^depth recursion tree.

Deviations from the reference's two (mutually inconsistent) recursion
implementations are documented in DEVIATIONS.md: each surface's own material
gates its reflect/refract spawning — equivalent to the CUDA path on every
fixture world (no fixture material has Kr and Kt simultaneously).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from .. import raymath as rm
from ..scene import Camera, RenderConfig, Scene
from .cast import CastFn, make_brute_cast, hit_shading_attrs
from .geometry import WorldGeometry, camera_rays, expand_geometry
from .shading import illuminate


def trans_attenuation(kt, time):
    """``time^Kt`` per channel (reference: src/rayenv/scene.cu:14-22).  Yes, the
    base is the *time*, not Kt — preserved verbatim."""
    return jnp.power(jnp.maximum(time, 0.0)[..., None], kt)


def radiance(scene: Scene, geom: WorldGeometry, cast_fn: CastFn, cfg: RenderConfig,
             ray_o, ray_d):
    """Accumulated RGBA radiance for a flat batch of primary rays [R, 3].

    Returns ``(acc [R,4], dropped)`` where ``dropped`` counts spawned children
    that exceeded queue capacity (0 for every fixture world; raise
    ``cfg.queue_factor`` if nonzero)."""
    mats = scene.materials
    R = ray_o.shape[0]
    C = int(R * cfg.queue_factor)

    def pad_to_c(x, fill=0):
        pad = [(0, C - R)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad, constant_values=fill)

    state = dict(
        o=pad_to_c(ray_o),
        d=pad_to_c(jnp.where(jnp.zeros((R, 1), bool), 0.0, ray_d)),
        atten=pad_to_c(jnp.ones((R, 4), dtype=jnp.float32)),
        in_obj=jnp.zeros((C,), dtype=bool),
        active=pad_to_c(jnp.ones((R,), dtype=bool)),
        pixel=pad_to_c(jnp.arange(R, dtype=jnp.int32)),
    )
    # Padding rays get a benign direction.
    state["d"] = jnp.where(state["active"][:, None], state["d"],
                           jnp.array([0.0, 0.0, 1.0]))

    acc0 = jnp.zeros((R, 4), dtype=jnp.float32)

    def round_body(carry, is_last_round):
        st, acc, dropped = carry
        hit = cast_fn(st["o"], st["d"])
        h_valid = st["active"] & hit.valid
        normal, mat_idx, _ = hit_shading_attrs(geom, hit)
        kt = mats.kt[mat_idx]
        kr = mats.kr[mat_idx]

        # Transmission attenuation applies on every hit while inside a medium,
        # using the *hit* material's Kt and segment length (scene.cu:112-115).
        atten_eff = jnp.where(
            (st["in_obj"] & h_valid)[:, None],
            st["atten"] * trans_attenuation(kt, hit.t),
            st["atten"],
        )

        lum = illuminate(scene, geom, cast_fn, cfg, st["o"], st["d"], hit,
                         normal, mat_idx, h_valid)
        contrib = jnp.where(h_valid[:, None], atten_eff * lum, 0.0)
        acc = acc.at[st["pixel"]].add(contrib, mode="drop")

        # ---- spawn children (masked when this is the final round) ----------
        spawn_ok = h_valid & jnp.logical_not(is_last_round)
        hit_pt = st["o"] + hit.t[:, None] * st["d"]
        reflective = jnp.any(kr > 0.0, axis=-1)
        refractive = jnp.any(kt > 0.0, axis=-1)

        refl_d = rm.normalize(rm.reflect(st["d"], normal))

        eta = mats.eta[mat_idx]
        n1 = jnp.where(st["in_obj"], eta, 1.0)
        n2 = jnp.where(st["in_obj"], 1.0, eta)
        refr_d, tir = rm.refract(st["d"], normal, n1, n2)
        refr_d = rm.normalize(refr_d)

        cand = dict(
            o=jnp.concatenate([hit_pt, hit_pt]),
            d=jnp.concatenate([refl_d, refr_d]),
            atten=jnp.concatenate([atten_eff * kr, atten_eff]),
            in_obj=jnp.concatenate([st["in_obj"], ~st["in_obj"]]),
            active=jnp.concatenate(
                [spawn_ok & reflective, spawn_ok & refractive & ~tir]
            ),
            pixel=jnp.concatenate([st["pixel"], st["pixel"]]),
        )

        # ---- compact 2C candidates back to C (actives first, stable) -------
        order = jnp.argsort(jnp.logical_not(cand["active"]), stable=True)
        keep = order[:C]
        new_state = {k: v[keep] for k, v in cand.items()}
        new_state["d"] = jnp.where(new_state["active"][:, None], new_state["d"],
                                   jnp.array([0.0, 0.0, 1.0]))
        dropped = dropped + jnp.sum(cand["active"]) - jnp.sum(new_state["active"])
        return (new_state, acc, dropped), None

    n_rounds = cfg.recurse_depth + 1
    is_last = jnp.arange(n_rounds) == (n_rounds - 1)
    (state, acc, dropped), _ = jax.lax.scan(
        round_body, (state, acc0, jnp.zeros((), jnp.int32)), is_last
    )
    return acc, dropped


def render_rays(scene: Scene, geom: WorldGeometry, cast_fn: CastFn,
                cfg: RenderConfig, ray_o, ray_d):
    """Radiance for arbitrary ray batches (flattened), clamped like the canvas
    write (raytracer.cc:55-58)."""
    acc, _ = radiance(scene, geom, cast_fn, cfg, ray_o.reshape(-1, 3),
                      ray_d.reshape(-1, 3))
    return jnp.minimum(acc, 1.0).reshape(ray_o.shape[:-1] + (4,))


def make_cast(scene: Scene, geom: WorldGeometry, cfg: RenderConfig) -> CastFn:
    from .cast import make_culled_cast

    if cfg.engine == "pallas":
        from .pallas_engine import make_pallas_cast

        return make_pallas_cast(scene, geom, cfg)
    if cfg.use_bvh:
        return make_culled_cast(
            geom,
            max_candidates=cfg.max_candidates,
            max_tris_per_mesh=cfg.max_tris_per_mesh,
            ray_chunk=cfg.ray_chunk,
        )
    return make_brute_cast(geom, ray_chunk=cfg.ray_chunk)


def render_frame(scene: Scene, camera: Camera, cfg: RenderConfig):
    """Render one RGBA float frame [H, W, 4] (values clamped to <= 1 like the
    reference's canvas write).  Pure function of its inputs — jit/grad/shard
    friendly."""
    geom = expand_geometry(scene)
    cast_fn = make_cast(scene, geom, cfg)
    ray_o, ray_d = camera_rays(camera, cfg.width, cfg.height)
    img = render_rays(scene, geom, cast_fn, cfg,
                      ray_o.reshape(-1, 3), ray_d.reshape(-1, 3))
    return img.reshape(cfg.height, cfg.width, 4)


def frame_to_u8(img) -> "jnp.ndarray":
    """Float RGBA -> RGBA8 with the reference's cast semantics: ``(u8)(255 * c)``
    truncation, no rounding (rayenv/color.h:38-46)."""
    return (jnp.clip(img, 0.0, 1.0) * 255.0).astype(jnp.uint8)
