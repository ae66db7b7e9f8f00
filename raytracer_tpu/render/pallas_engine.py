"""Pallas TPU cast kernel: tile-synchronous instance culling + template intersection.

This is the production TPU replacement for the reference's per-pixel megakernel
(src/raytracer.cu:17-43) and warp-synchronous BVH walk (src/rayenv/scene.cu:54-70).
Design notes:

* **Template instancing.** Instances of a mesh share identical mesh-local
  triangles, so the kernel stores one small *template table* (triangle vertices,
  precomputed plane normals/areas, vertex normals — a few KB) plus a per-instance
  table (world AABB, frame, triangle range — 64B/instance) entirely in VMEM.
  Rays are transformed into instance-local space per candidate (exactly the
  reference's ``cast_local`` structure, scene.cu:28-40) — no per-triangle world
  arrays, no gathers.
* **Tile-synchronous vote.** Each grid step owns a tile of rays (``tile_rows`` x
  128 VPU lanes).  Per instance, a slab test runs across the whole tile and a
  scalar ``any()`` vote gates the triangle loop — the 8x128-lane analog of the
  reference's ``__ballot_sync`` warp vote (scene.cu:65-69).  Coherent primary
  tiles skip almost every instance; incoherent tiles degrade to more work, never
  to wrong answers.
* **Closest hit semantics** match the oracle: the reference's plane +
  barycentric-area test (geometry.h:275-290) with THRESHOLD epsilons and strict
  ``t < best`` updates in scene order.

The kernel implements the shared CastFn interface, so the whole wavefront engine
(bounces, shadows, shading) runs unchanged on top of it.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import raymath as rm
from ..scene import RenderConfig, Scene
from .cast import CastFn, Hit
from .geometry import WorldGeometry

LANES = 128
F32_NEG_BIG = -3.0e38
F32_BIG = 3.0e38

# inst_f32 row layout
_IF_BMIN = 0   # 0:3 world AABB min
_IF_BMAX = 3   # 3:6 world AABB max
_IF_POS = 6    # 6:9 frame position
_IF_QUAT = 9   # 9:13 frame quaternion [x,y,z,w] (global->local, entity.cu:5-9)
_IF_WIDTH = 16

# inst_i32 row layout
_II_TMPL_START = 0  # first row in the template table
_II_TRI_COUNT = 1   # triangle count
_II_WTRI_START = 2  # global world-triangle index of this instance's first tri
_II_VALID = 3
_II_WIDTH = 8

# template row layout (per mesh-local triangle)
_TF_A = 0      # 0:3 vertex a
_TF_B = 3      # 3:6 vertex b
_TF_C = 6      # 6:9 vertex c
_TF_PNU = 9    # 9:12 unit plane normal (normalize(cross(b-a, c-a)))
_TF_AREA = 12  # |cross(b-a, c-a)| (twice the area)
_TF_WIDTH = 16


def _pytree_dataclass(cls):
    import dataclasses as _dc

    fields = [f.name for f in _dc.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree_dataclass
@dataclass
class PallasSceneTables:
    inst_f32: Any  # [Np, 16]
    inst_i32: Any  # [Np, 8]
    tmpl: Any  # [Mt, 16]


def build_tables(scene: Scene, geom: WorldGeometry) -> PallasSceneTables:
    """Build the VMEM-resident tables from the scene (trace-safe jnp ops)."""
    n = scene.inst_pos.shape[0]

    # Effective instance frame: the composition of Transformation and the mesh's
    # own entity frame.  to_local(v) = mesh_rot (inst_rot (v - inst_pos)) - ... ;
    # for the cube worlds mesh frames are identity.  We fold both by composing
    # quaternions and the offset: local = q_m (q_i (v - p_i)) - q_m? No: the
    # reference applies inst then mesh (hitable.cu:30-38):
    #   v_local = mesh.to_local(inst.to_local(v))
    #           = q_m * (q_i (v - p_i) - p_m)
    # Composed: q = q_m q_i;  offset p such that q (v - p) == q_m(q_i(v-p_i)-p_m)
    #   q_m q_i v - q_m q_i p_i - q_m p_m  =>  p = p_i + q_i^-1 p_m
    mesh = scene.inst_mesh
    q_i = scene.inst_rot
    q_m = scene.mesh_rot[mesh]
    p_i = scene.inst_pos
    p_m = scene.mesh_pos[mesh]
    q = rm.quat_mul(q_m, q_i)
    p = p_i + rm.quat_rotate_inv(q_i, p_m)

    inst_f32 = jnp.zeros((n, _IF_WIDTH), jnp.float32)
    inst_f32 = inst_f32.at[:, _IF_BMIN:_IF_BMIN + 3].set(geom.aabb_min)
    inst_f32 = inst_f32.at[:, _IF_BMAX:_IF_BMAX + 3].set(geom.aabb_max)
    inst_f32 = inst_f32.at[:, _IF_POS:_IF_POS + 3].set(p)
    inst_f32 = inst_f32.at[:, _IF_QUAT:_IF_QUAT + 4].set(q)

    counts = scene.mesh_tri_count[mesh]
    tmpl_start = scene.mesh_tri_start[mesh]
    wtri_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
    )
    inst_i32 = jnp.zeros((n, _II_WIDTH), jnp.int32)
    inst_i32 = inst_i32.at[:, _II_TMPL_START].set(tmpl_start)
    inst_i32 = inst_i32.at[:, _II_TRI_COUNT].set(counts)
    inst_i32 = inst_i32.at[:, _II_WTRI_START].set(wtri_start)
    inst_i32 = inst_i32.at[:, _II_VALID].set(1)

    # Template triangles in mesh-local space.
    va = scene.verts[scene.tri_v[:, 0]]
    vb = scene.verts[scene.tri_v[:, 1]]
    vc = scene.verts[scene.tri_v[:, 2]]
    pn = jnp.cross(vb - va, vc - va)
    area = jnp.sqrt(jnp.sum(pn * pn, axis=-1))
    pnu = rm.normalize(pn)
    t = scene.tri_v.shape[0]
    tmpl = jnp.zeros((t, _TF_WIDTH), jnp.float32)
    tmpl = tmpl.at[:, _TF_A:_TF_A + 3].set(va)
    tmpl = tmpl.at[:, _TF_B:_TF_B + 3].set(vb)
    tmpl = tmpl.at[:, _TF_C:_TF_C + 3].set(vc)
    tmpl = tmpl.at[:, _TF_PNU:_TF_PNU + 3].set(pnu)
    tmpl = tmpl.at[:, _TF_AREA].set(area)
    return PallasSceneTables(inst_f32=inst_f32, inst_i32=inst_i32, tmpl=tmpl)


def _quat_rotate_tile(qx, qy, qz, qw, vx, vy, vz):
    """Rotate tile vectors (vx,vy,vz) by the scalar quaternion (qx..qw)."""
    n2 = qx * qx + qy * qy + qz * qz + qw * qw
    s = jnp.where(n2 > 1e-12, 1.0 / n2, 0.0)
    xx, yy, zz = 2 * qx * qx * s, 2 * qy * qy * s, 2 * qz * qz * s
    wx, wy, wz = 2 * qw * qx * s, 2 * qw * qy * s, 2 * qw * qz * s
    xy, xz, yz = 2 * qx * qy * s, 2 * qx * qz * s, 2 * qy * qz * s
    rx = (1 - (yy + zz)) * vx + (xy - wz) * vy + (xz + wy) * vz
    ry = (xy + wz) * vx + (1 - (xx + zz)) * vy + (yz - wx) * vz
    rz = (xz - wy) * vx + (yz + wx) * vy + (1 - (xx + yy)) * vz
    return rx, ry, rz


def tile_candidates(comps, tile_rows, inst_f32, max_cand):
    """XLA-side hierarchical cull: conservative interval-arithmetic slab test of
    each ray TILE's bounds against every instance AABB, compacted to per-tile
    candidate lists for scalar prefetch.

    Returns ``(cand [T, C] i32, info [T, 2] i32)`` where ``info[:, 0]`` is the
    loop trip count and ``info[:, 1]`` flags overflow (loop all instances
    by index instead — correctness never depends on the cull)."""
    ox, oy, oz, dx, dy, dz = comps
    T_tiles = ox.shape[0] // tile_rows

    def bounds(c):
        cr = c.reshape(T_tiles, -1)
        return cr.min(axis=1), cr.max(axis=1)

    olo = jnp.stack([bounds(c)[0] for c in (ox, oy, oz)], -1)  # [T,3]
    ohi = jnp.stack([bounds(c)[1] for c in (ox, oy, oz)], -1)
    dlo = jnp.stack([bounds(c)[0] for c in (dx, dy, dz)], -1)
    dhi = jnp.stack([bounds(c)[1] for c in (dx, dy, dz)], -1)

    bmin = inst_f32[:, _IF_BMIN:_IF_BMIN + 3]  # [N,3]
    bmax = inst_f32[:, _IF_BMAX:_IF_BMAX + 3]

    # Per axis: if the direction interval spans 0 the axis cannot cull
    # (reference semantics skip exact-parallel axes anyway).  Otherwise the
    # extreme entry/exit times over (origin x direction) intervals bound every
    # ray in the tile.
    spans0 = (dlo <= 0.0) & (dhi >= 0.0)  # [T,3]
    inv_lo = 1.0 / jnp.where(spans0, 1.0, dlo)
    inv_hi = 1.0 / jnp.where(spans0, 1.0, dhi)

    def axis_times(bplane):  # bplane [N,3] -> [T,N,3] extremes
        num_lo = bplane[None] - ohi[:, None]  # [T,N,3]
        num_hi = bplane[None] - olo[:, None]
        cands = jnp.stack(
            [num_lo * inv_lo[:, None], num_lo * inv_hi[:, None],
             num_hi * inv_lo[:, None], num_hi * inv_hi[:, None]], 0
        )
        return cands.min(0), cands.max(0)

    lo1, hi1 = axis_times(bmin)
    lo2, hi2 = axis_times(bmax)
    near = jnp.minimum(lo1, lo2)
    far = jnp.maximum(hi1, hi2)
    near = jnp.where(spans0[:, None, :], F32_NEG_BIG, near)
    far = jnp.where(spans0[:, None, :], F32_BIG, far)
    tmin = near.max(-1)  # [T,N]
    tmax = far.min(-1)
    vote = (tmin <= tmax) & (tmax >= rm.THRESHOLD)

    count = vote.sum(-1).astype(jnp.int32)  # [T]
    n = vote.shape[-1]
    c = min(max_cand, n)
    # Near-to-far candidate order: early close hits let the kernel's
    # ``tmin < best_t`` prune skip far candidates' triangle loops entirely.
    # (Closest-hit results are order-independent, so this is purely a speedup.)
    order = jnp.argsort(jnp.where(vote, tmin, jnp.inf), axis=-1, stable=True)
    cand = order[:, :c].astype(jnp.int32)
    overflow = count > c
    loop_n = jnp.where(overflow, jnp.int32(n), jnp.minimum(count, c))
    info = jnp.stack([loop_n, overflow.astype(jnp.int32)], -1)
    return cand, info


def _cast_kernel(cand_ref, info_ref, inst_f_ref, inst_i_ref, tmpl_ref,
                 ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                 t_out, tri_out, u_out, v_out,
                 bt_ref, btri_ref, bu_ref, bv_ref,
                 *, n_inst: int, max_tris: int):
    tile_id = pl.program_id(0)
    loop_n = info_ref[tile_id, 0]
    overflow = info_ref[tile_id, 1]

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    # Safe reciprocal directions with the reference's skip-parallel semantics.
    par_x = dx == 0.0
    par_y = dy == 0.0
    par_z = dz == 0.0
    ix = 1.0 / jnp.where(par_x, 1.0, dx)
    iy = 1.0 / jnp.where(par_y, 1.0, dy)
    iz = 1.0 / jnp.where(par_z, 1.0, dz)

    bt_ref[:] = jnp.full_like(ox, jnp.inf)
    btri_ref[:] = jnp.zeros_like(ox, dtype=jnp.int32)
    bu_ref[:] = jnp.zeros_like(ox)
    bv_ref[:] = jnp.zeros_like(ox)

    def inst_body(k, _):
        i = jnp.where(overflow > 0, k, cand_ref[tile_id, jnp.minimum(k, cand_ref.shape[1] - 1)])
        valid = inst_i_ref[i, _II_VALID] > 0

        bx0 = inst_f_ref[i, _IF_BMIN + 0]
        by0 = inst_f_ref[i, _IF_BMIN + 1]
        bz0 = inst_f_ref[i, _IF_BMIN + 2]
        bx1 = inst_f_ref[i, _IF_BMAX + 0]
        by1 = inst_f_ref[i, _IF_BMAX + 1]
        bz1 = inst_f_ref[i, _IF_BMAX + 2]

        # Kay/Kajiya slab test (bounding_box.cu:63-104), parallel axes skipped.
        t1x = (bx0 - ox) * ix
        t2x = (bx1 - ox) * ix
        tnx = jnp.where(par_x, F32_NEG_BIG, jnp.minimum(t1x, t2x))
        tfx = jnp.where(par_x, F32_BIG, jnp.maximum(t1x, t2x))
        t1y = (by0 - oy) * iy
        t2y = (by1 - oy) * iy
        tny = jnp.where(par_y, F32_NEG_BIG, jnp.minimum(t1y, t2y))
        tfy = jnp.where(par_y, F32_BIG, jnp.maximum(t1y, t2y))
        t1z = (bz0 - oz) * iz
        t2z = (bz1 - oz) * iz
        tnz = jnp.where(par_z, F32_NEG_BIG, jnp.minimum(t1z, t2z))
        tfz = jnp.where(par_z, F32_BIG, jnp.maximum(t1z, t2z))
        tmin = jnp.maximum(jnp.maximum(tnx, tny), tnz)
        tmax = jnp.minimum(jnp.minimum(tfx, tfy), tfz)
        # Prune boxes no nearer than the current best (monotone optimization:
        # cannot change results, only skips provably-farther work).
        box_hit = (tmin <= tmax) & (tmax >= rm.THRESHOLD) & (tmin < bt_ref[:])
        vote = jnp.any(box_hit) & valid

        @pl.when(vote)
        def _():
            px = inst_f_ref[i, _IF_POS + 0]
            py = inst_f_ref[i, _IF_POS + 1]
            pz = inst_f_ref[i, _IF_POS + 2]
            qx = inst_f_ref[i, _IF_QUAT + 0]
            qy = inst_f_ref[i, _IF_QUAT + 1]
            qz = inst_f_ref[i, _IF_QUAT + 2]
            qw = inst_f_ref[i, _IF_QUAT + 3]

            # Ray to instance-local frame: o' = q (o - p); d' = q d
            # (entity.cu:5-9; rotations preserve |d| so no time rescale,
            # hitable.cu:16-25).
            lox, loy, loz = _quat_rotate_tile(qx, qy, qz, qw,
                                              ox - px, oy - py, oz - pz)
            ldx, ldy, ldz = _quat_rotate_tile(qx, qy, qz, qw, dx, dy, dz)

            tmpl_start = inst_i_ref[i, _II_TMPL_START]
            tri_count = inst_i_ref[i, _II_TRI_COUNT]
            wtri_start = inst_i_ref[i, _II_WTRI_START]

            def tri_body(j, _):
                @pl.when(j < tri_count)
                def _():
                    row = tmpl_start + j
                    ax = tmpl_ref[row, _TF_A + 0]
                    ay = tmpl_ref[row, _TF_A + 1]
                    az = tmpl_ref[row, _TF_A + 2]
                    bx = tmpl_ref[row, _TF_B + 0]
                    by = tmpl_ref[row, _TF_B + 1]
                    bz = tmpl_ref[row, _TF_B + 2]
                    cx = tmpl_ref[row, _TF_C + 0]
                    cy = tmpl_ref[row, _TF_C + 1]
                    cz = tmpl_ref[row, _TF_C + 2]
                    nx = tmpl_ref[row, _TF_PNU + 0]
                    ny = tmpl_ref[row, _TF_PNU + 1]
                    nz = tmpl_ref[row, _TF_PNU + 2]
                    area = tmpl_ref[row, _TF_AREA]

                    # Plane hit (geometry.h:254-261).
                    denom = ldx * nx + ldy * ny + ldz * nz
                    plane_ok = jnp.abs(denom) >= rm.THRESHOLD
                    tt = ((ax - lox) * nx + (ay - loy) * ny + (az - loz) * nz) / \
                        jnp.where(plane_ok, denom, 1.0)
                    hx = lox + tt * ldx
                    hy = loy + tt * ldy
                    hz = loz + tt * ldz

                    inv_area = 1.0 / jnp.where(area > 0.0, area, 1.0)

                    def edge_area(p0x, p0y, p0z, p1x, p1y, p1z):
                        ex = p0y * p1z - p0z * p1y
                        ey = p0z * p1x - p0x * p1z
                        ez = p0x * p1y - p0y * p1x
                        return jnp.sqrt(ex * ex + ey * ey + ez * ez)

                    # bary areas (geometry.h:279-284)
                    b0 = edge_area(cx - hx, cy - hy, cz - hz,
                                   bx - hx, by - hy, bz - hz) * inv_area
                    b1 = edge_area(cx - hx, cy - hy, cz - hz,
                                   ax - hx, ay - hy, az - hz) * inv_area
                    b2 = edge_area(ax - hx, ay - hy, az - hz,
                                   bx - hx, by - hy, bz - hz) * inv_area
                    inside = jnp.abs(b0 + b1 + b2 - 1.0) <= rm.THRESHOLD

                    ok = (plane_ok & inside & (area > 0.0)
                          & (tt >= rm.THRESHOLD) & (tt < bt_ref[:]))
                    bt_ref[:] = jnp.where(ok, tt, bt_ref[:])
                    btri_ref[:] = jnp.where(ok, wtri_start + j, btri_ref[:])
                    bu_ref[:] = jnp.where(ok, b1, bu_ref[:])
                    bv_ref[:] = jnp.where(ok, b2, bv_ref[:])

                return _

            jax.lax.fori_loop(0, max_tris, tri_body, None)

        return _

    jax.lax.fori_loop(0, loop_n, inst_body, None)

    t_out[:] = bt_ref[:]
    tri_out[:] = btri_ref[:]
    u_out[:] = bu_ref[:]
    v_out[:] = bv_ref[:]


def make_pallas_cast(scene: Scene, geom: WorldGeometry, cfg: RenderConfig,
                     tile_rows: int = 8, max_cand: int = 64) -> CastFn:
    """Build the Pallas cast; tables are computed from (scene, geom) at trace
    time and live in VMEM for the whole kernel.  Per-tile candidate lists from
    the XLA interval cull arrive via scalar prefetch."""
    tables = build_tables(scene, geom)
    n_inst = tables.inst_i32.shape[0]
    max_tris = int(cfg.max_tris_per_mesh)

    kernel = functools.partial(_cast_kernel, n_inst=n_inst, max_tris=max_tris)

    def cast(ro, rd):
        batch_shape = ro.shape[:-1]
        ro_f = ro.reshape(-1, 3)
        rd_f = rd.reshape(-1, 3)
        r = ro_f.shape[0]
        tile = tile_rows * LANES
        rp = (r + tile - 1) // tile * tile
        pad = rp - r
        ro_f = jnp.pad(ro_f, ((0, pad), (0, 0)))
        rd_f = jnp.pad(rd_f, ((0, pad), (0, 0)),
                       constant_values=0.0)
        pad_mask = jnp.arange(rp) >= r
        rd_f = jnp.where(pad_mask[:, None], jnp.array([0.0, 0.0, 1.0]), rd_f)

        rows = rp // LANES
        comps = [ro_f[:, 0], ro_f[:, 1], ro_f[:, 2],
                 rd_f[:, 0], rd_f[:, 1], rd_f[:, 2]]
        comps = [c.reshape(rows, LANES) for c in comps]

        cand, info = tile_candidates(comps, tile_rows, tables.inst_f32, max_cand)

        grid = (rows // tile_rows,)
        ray_spec = pl.BlockSpec((tile_rows, LANES), lambda i, *_: (i, 0),
                                memory_space=pltpu.VMEM)
        table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        out_specs = [
            pl.BlockSpec((tile_rows, LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[table_spec, table_spec, table_spec] + [ray_spec] * 6,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((tile_rows, LANES), jnp.float32),
                pltpu.VMEM((tile_rows, LANES), jnp.int32),
                pltpu.VMEM((tile_rows, LANES), jnp.float32),
                pltpu.VMEM((tile_rows, LANES), jnp.float32),
            ],
        )
        t, tri, u, v = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
                jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
                jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
                jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            ],
            # Mosaic targets TPUs; on CPU hosts (tests, oracle comparisons) the
            # kernel runs in the interpreter with identical semantics.
            interpret=(jax.default_backend() == "cpu"),
        )(cand, info, tables.inst_f32, tables.inst_i32, tables.tmpl, *comps)

        t = t.reshape(rp)[:r]
        tri = tri.reshape(rp)[:r]
        u = u.reshape(rp)[:r]
        v = v.reshape(rp)[:r]
        return Hit(
            valid=jnp.isfinite(t).reshape(batch_shape),
            t=t.reshape(batch_shape),
            wtri=tri.reshape(batch_shape),
            uv=jnp.stack([u, v], axis=-1).reshape(batch_shape + (2,)),
        )

    return cast
