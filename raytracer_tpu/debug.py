"""Single-ray debug probe — the analog of the reference's click-to-debug
``debug_cast`` (src/raytracer.cu:91-100, src/main.cc:181-186), which launches a
1-thread kernel and narrates the bounce state machine via device printf.

Here the probe traces one pixel through the CONFIGURED engine (``cfg.engine``
— the reference likewise runs debug through the same GPU path as rendering,
src/raytracer.cu:91-100, so the probe can narrate a production-kernel
discrepancy) and prints each bounce level's cast result, shading terms, and
spawned rays — host-side, so it also works under jit via the returned record
structure."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import raymath as rm
from .render.cast import hit_shading_attrs
from .render.geometry import camera_rays, expand_geometry
from .render.shading import illuminate
from .render.engine import make_cast, trans_attenuation
from .scene import Camera, RenderConfig, Scene


def _narrate_shadow_march(scene, geom, cast, cfg, origin, dir_unit, max_t,
                          label):
    """Per-light shadow-march narration — the analog of the reference's
    debug printfs inside ``attenuate`` (src/rayprimitives/light.cu:38-40):
    each step of the transmissive march prints what blocked (or passed)
    the shadow ray.  Mirrors shading._march_shadow's semantics."""
    mats = scene.materials
    cur_o = origin + rm.THRESHOLD * dir_unit
    remaining = float(max_t)
    atten = np.ones(4, np.float32)
    steps = max(1, cfg.shadow_steps)
    for step in range(steps):
        hit = cast(cur_o, dir_unit)
        if not bool(np.asarray(hit.valid)[0]):
            print(f"    [{label}] shadow ray escaped after {step} blockers "
                  f"-> lit (atten={atten})")
            return
        t = float(np.asarray(hit.t)[0])
        _, mat_idx, inst = hit_shading_attrs(geom, hit)
        mat = int(np.asarray(mat_idx)[0])
        print(f"    [{label}] shadow ray hit inst={int(np.asarray(inst)[0])} "
              f"mat={mat} at t={t:.6f}")
        if t > remaining:
            print(f"    [{label}] blocker beyond the light "
                  f"(t > {remaining:.6f}) -> lit")
            return
        kt = np.asarray(mats.kt[mat])
        if not (kt > 0).any():
            print(f"    [{label}] opaque blocker -> shadowed")
            return
        normal, _, _ = hit_shading_attrs(geom, hit)
        exiting = float(np.asarray(rm.dot(normal, dir_unit))[0]) > 0.0
        if exiting:
            atten = atten * np.asarray(kt) ** t
            print(f"    [{label}] exiting transmissive medium: "
                  f"atten *= Kt^{t:.4f} -> {atten}")
        else:
            print(f"    [{label}] entering transmissive blocker — "
                  f"continuing the march")
        cur_o = cur_o + t * dir_unit
        remaining -= t
    print(f"    [{label}] march budget ({steps} steps) exhausted "
          f"(shadow_steps)")


def debug_cast(scene: Scene, camera: Camera, cfg: RenderConfig, x: int, y: int):
    """Trace pixel (x, y) verbosely.

    Returns ``(records, color)``: per-bounce records plus the accumulated
    (clamped) pixel color.  The recursion here is INDEPENDENT of the
    wavefront engine (an explicit per-ray tree walk like the reference's
    propagate_helper, scene.cu:222-268), so tests use it as a second opinion
    on the queue disciplines — notably the mixed reflect+refract compacted
    stream, which spawns both children per hit exactly like this walk."""
    geom = expand_geometry(scene)
    cast = make_cast(scene, geom, cfg)
    ro, rd = camera_rays(camera, cfg.width, cfg.height)
    o = ro[y, x][None]
    d = rd[y, x][None]
    mats = scene.materials

    records = []
    items = [
        dict(o=o, d=d, atten=jnp.ones((1, 4)), in_obj=jnp.zeros(1, bool),
             active=jnp.ones(1, bool), kind="primary")
    ]
    total = np.zeros(4, dtype=np.float32)
    for level in range(cfg.recurse_depth + 1):
        nxt = []
        for it in items:
            if not bool(np.asarray(it["active"])[0]):
                continue
            print(f"[level {level}] shooting a {it['kind']} ray "
                  f"o={np.asarray(it['o'])[0]} d={np.asarray(it['d'])[0]}")
            hit = cast(it["o"], it["d"])
            rec = dict(level=level, kind=it["kind"],
                       o=np.asarray(it["o"])[0], d=np.asarray(it["d"])[0],
                       hit=bool(np.asarray(hit.valid)[0]),
                       t=float(np.asarray(hit.t)[0]))
            if not rec["hit"]:
                print("  miss")
                records.append(rec)
                continue
            normal, mat_idx, inst = hit_shading_attrs(geom, hit)
            from .render.shading import gather_material_rows

            rmats = gather_material_rows(scene.materials, mat_idx)
            kt = mats.kt[mat_idx]
            kr = mats.kr[mat_idx]
            atten_eff = jnp.where(
                it["in_obj"][..., None],
                it["atten"] * trans_attenuation(kt, hit.t),
                it["atten"],
            )
            # narrate each light's shadow march (light.cu:38-40 analog)
            hit_pt_n = it["o"] + hit.t[..., None] * it["d"]
            for li in range(scene.lights.point_pos.shape[0]):
                disp = scene.lights.point_pos[li] - hit_pt_n
                dist = float(np.asarray(rm.norm(disp))[0])
                _narrate_shadow_march(
                    scene, geom, cast, cfg, hit_pt_n, rm.normalize(disp),
                    dist, f"point light {li}")
            for li in range(scene.lights.dir_dir.shape[0]):
                mdir = rm.normalize(-scene.lights.dir_dir[li])[None, :]
                _narrate_shadow_march(scene, geom, cast, cfg, hit_pt_n,
                                      mdir, np.inf, f"dir light {li}")
            lum = illuminate(scene, geom, cast, cfg, it["o"], it["d"], hit,
                             normal, rmats, hit.valid)
            contrib = np.asarray(atten_eff * lum)[0]
            total += contrib
            rec.update(
                t=float(np.asarray(hit.t)[0]),
                inst=int(np.asarray(inst)[0]),
                mat=int(np.asarray(mat_idx)[0]),
                normal=np.asarray(normal)[0],
                contribution=contrib,
            )
            print(f"  hit inst={rec['inst']} mat={rec['mat']} t={rec['t']:.6f} "
                  f"n={rec['normal']}")
            print(f"  contribution={contrib}")
            records.append(rec)

            if level < cfg.recurse_depth:
                hit_pt = it["o"] + hit.t[..., None] * it["d"]
                if bool(np.asarray(jnp.any(kr > 0))):
                    print("  preparing to shoot a reflection ray")
                    nxt.append(dict(
                        o=hit_pt, d=rm.normalize(rm.reflect(it["d"], normal)),
                        atten=atten_eff * kr, in_obj=it["in_obj"],
                        active=hit.valid & jnp.any(kr > 0, -1), kind="reflection"))
                if bool(np.asarray(jnp.any(kt > 0))):
                    eta = mats.eta[mat_idx]
                    n1 = jnp.where(it["in_obj"], eta, 1.0)
                    n2 = jnp.where(it["in_obj"], 1.0, eta)
                    refr_d, tir = rm.refract(it["d"], normal, n1, n2)
                    if bool(np.asarray(tir)[0]):
                        print("  total internal reflection — dropping refraction")
                    else:
                        print("  preparing to shoot a refraction ray")
                        nxt.append(dict(
                            o=hit_pt, d=rm.normalize(refr_d), atten=atten_eff,
                            in_obj=~it["in_obj"],
                            active=hit.valid & ~tir, kind="refraction"))
        items = nxt
    color = np.minimum(total, 1.0)
    print(f"pixel ({x}, {y}) final color: {color}")
    return records, color
