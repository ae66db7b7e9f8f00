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


def interpret_mode() -> bool:
    """Whether Pallas kernels run in the interpreter.

    Default: interpret off-TPU (tests, oracle comparisons run on CPU with
    identical semantics).  ``RAYTRACER_TPU_INTERPRET=0/1`` overrides the
    backend probe explicitly — the probe is a global default-backend query at
    trace time, which can mislead under mixed-backend test setups."""
    import os

    env = os.environ.get("RAYTRACER_TPU_INTERPRET")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() == "cpu"

# inst_f32 row layout
_IF_BMIN = 0   # 0:3 world AABB min
_IF_BMAX = 3   # 3:6 world AABB max
_IF_POS = 6    # 6:9 frame position
_IF_QUAT = 9   # 9:13 frame quaternion [x,y,z,w] (global->local, entity.cu:5-9)
_IF_LMIN = 13  # 13:16 mesh-local AABB min (box fast path)
_IF_LMAX = 16  # 16:19 mesh-local AABB max
_IF_FNRM = 19  # 19:37 six world-space face normals, 3 floats per face
#                faces ordered f = axis*2 + side (x-,x+,y-,y+,z-,z+)
_IF_WIDTH = 40

# inst_i32 row layout
_II_TMPL_START = 0  # first row in the template table
_II_TRI_COUNT = 1   # triangle count
_II_WTRI_START = 2  # global world-triangle index of this instance's first tri
_II_VALID = 3
_II_IS_BOX = 4      # 1 when the mesh is a detected axis-aligned box (the slab
#                     entry/exit IS the closest triangle hit; no tri loop)
_II_MAT = 5         # material id (box meshes are single-material by detection)
_II_FACE_WTRI = 8   # 8:14 first world-tri id per face (f = axis*2 + side)
_II_FACE_WTRI2 = 14  # 14:20 second world-tri id per face (box_exact_uv: the
#                      box fast path picks whichever of the face's two
#                      triangles contains the hit and emits its true uv)
_II_WIDTH = 24

# template row layout (per mesh-local triangle)
_TF_A = 0      # 0:3 vertex a
_TF_B = 3      # 3:6 vertex b
_TF_C = 6      # 6:9 vertex c
_TF_PNU = 9    # 9:12 unit plane normal (normalize(cross(b-a, c-a)))
_TF_AREA = 12  # |cross(b-a, c-a)| (twice the area)
_TF_MAT = 13   # material id as f32 (exact for ids < 2^24)
_TF_NA = 16    # 16:19 vertex normal a (mesh-local)
_TF_NB = 19    # 19:22 vertex normal b
_TF_NC = 22    # 22:25 vertex normal c
_TF_WIDTH = 32


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


def _detect_box_meshes(scene: Scene):
    """Per-mesh axis-aligned-box detection (trace-safe jnp; values may be
    traced, so the result is runtime data consumed by the kernel via
    ``pl.when``).  A mesh is a "box" when its closest-hit is exactly the
    local-AABB slab entry/exit — i.e. 12 triangles, every vertex on an AABB
    corner, each AABB face carrying exactly 2 coplanar triangles, one
    material, and faceted per-face vertex normals.  ``build_cube`` meshes
    (scene_builder.cu:181-239) satisfy all of it; hand-built trimeshes fall
    back to the template triangle loop.

    Returns ``(is_box [M] bool, mat [M] i32, face_tri [M, 6] i32,
    face_of [T] i32)`` where ``face_tri[m, f]`` is the mesh-local
    triangle-table row of face f's first triangle (f = axis*2 + side) and
    ``face_of[t]`` is the face id each triangle lies on (meaningful only for
    box meshes; tests use it to compare hits at face granularity).
    """
    T = scene.tri_v.shape[0]
    M = scene.mesh_pos.shape[0]
    tol = 1e-5

    va = scene.verts[scene.tri_v[:, 0]]
    vb = scene.verts[scene.tri_v[:, 1]]
    vc = scene.verts[scene.tri_v[:, 2]]
    tri_rows = jnp.arange(T, dtype=jnp.int32)
    # mesh id per triangle row
    starts = scene.mesh_tri_start
    ends = starts + scene.mesh_tri_count
    in_mesh = (tri_rows[None, :] >= starts[:, None]) & (
        tri_rows[None, :] < ends[:, None]
    )  # [M, T]
    mesh_of = jnp.argmax(in_mesh, axis=0).astype(jnp.int32)  # [T]

    bmin = scene.mesh_aabb_min[mesh_of]  # [T,3]
    bmax = scene.mesh_aabb_max[mesh_of]
    scale = jnp.maximum(jnp.max(bmax - bmin, axis=-1, keepdims=True), 1e-8)

    def on_corner(v):
        lo = jnp.abs(v - bmin) <= tol * scale
        hi = jnp.abs(v - bmax) <= tol * scale
        return jnp.all(lo | hi, axis=-1)

    corners_ok = on_corner(va) & on_corner(vb) & on_corner(vc)  # [T]

    # face of each tri: the axis+side all 3 verts share (if any)
    def plane_flags(plane):  # [T,3] per-axis "all three verts on this plane"
        return (
            (jnp.abs(va - plane) <= tol * scale)
            & (jnp.abs(vb - plane) <= tol * scale)
            & (jnp.abs(vc - plane) <= tol * scale)
        )

    lo_f = plane_flags(bmin)  # [T,3]
    hi_f = plane_flags(bmax)
    flags = jnp.stack(
        [lo_f[:, 0], hi_f[:, 0], lo_f[:, 1], hi_f[:, 1], lo_f[:, 2],
         hi_f[:, 2]], -1,
    )  # [T, 6]
    one_face = jnp.sum(flags, axis=-1) == 1
    face_of = jnp.argmax(flags, axis=-1).astype(jnp.int32)  # [T]

    # faceted normals: all three vertex normals equal
    na = scene.norms[scene.tri_v[:, 0]]
    nb = scene.norms[scene.tri_v[:, 1]]
    nc = scene.norms[scene.tri_v[:, 2]]
    faceted = (
        jnp.all(jnp.abs(na - nb) <= 1e-5, axis=-1)
        & jnp.all(jnp.abs(na - nc) <= 1e-5, axis=-1)
    )

    tri_ok = corners_ok & one_face & faceted  # [T]

    # per (mesh, face) triangle counts and first row
    mf = mesh_of * 6 + face_of  # [T]
    counts = jnp.zeros((M * 6,), jnp.int32).at[mf].add(
        jnp.where(tri_ok, 1, 0)
    )
    first = jnp.full((M * 6,), T, jnp.int32).at[mf].min(
        jnp.where(tri_ok, tri_rows, T)
    )
    second = jnp.full((M * 6,), -1, jnp.int32).at[mf].max(
        jnp.where(tri_ok, tri_rows, -1)
    )
    counts = counts.reshape(M, 6)
    face_tri = jnp.clip(first.reshape(M, 6), 0, max(T - 1, 0))
    face_tri2 = jnp.clip(second.reshape(M, 6), 0, max(T - 1, 0))

    # both triangles of a face must agree on the (faceted) normal: the sum of
    # two equal unit normals has length 2, opposed windings give ~0.
    nsum = jnp.zeros((M * 6, 3), jnp.float32).at[mf].add(
        jnp.where(tri_ok[:, None], na, 0.0)
    )
    normals_agree = jnp.all(
        jnp.abs(jnp.sum(nsum * nsum, -1).reshape(M, 6) - 4.0) < 1e-3, axis=-1
    )

    # one material per mesh
    ref_mat = scene.tri_mat[jnp.clip(starts, 0, max(T - 1, 0))]
    same_mat = jnp.zeros((M,), jnp.int32).at[mesh_of].add(
        jnp.where(scene.tri_mat == ref_mat[mesh_of], 0, 1)
    ) == 0

    all_ok = jnp.zeros((M,), jnp.int32).at[mesh_of].add(
        jnp.where(tri_ok, 0, 1)
    ) == 0
    is_box = (
        (scene.mesh_tri_count == 12)
        & all_ok
        & jnp.all(counts == 2, axis=-1)
        & normals_agree
        & same_mat
    )
    return is_box, ref_mat.astype(jnp.int32), face_tri, face_of, face_tri2


def build_tables(scene: Scene, geom: WorldGeometry, *, exact_uv: bool = False,
                 texture_mapping: bool = False,
                 box_exact_uv: bool = False) -> PallasSceneTables:
    """Build the VMEM-resident tables from the scene (trace-safe jnp ops).

    ``exact_uv=True`` disables the box fast path entirely: the plain fast
    path reports a fixed uv=(1/3, 1/3) and a per-face representative
    triangle, which is fine for faceted Phong shading but wrong for any
    consumer of the true barycentric coordinates (texture sampling, the
    edge-aware silhouette band, the analytic uv-VJP).

    ``box_exact_uv=True`` (production edge-aware config) KEEPS the box fast
    path and instead fills the per-face second-triangle columns
    (_II_FACE_WTRI2) so the kernel can resolve the true containing triangle
    and its signed barycentrics in-kernel at box speed — the template loop
    costs ~12x the slab test and dominated the vertex-gradient benches.

    ``texture_mapping=True`` keeps the fast path only for meshes whose
    triangles are all texture-degenerate (untextured), since textured meshes
    need interpolated coordinates (ADVICE r2)."""
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
    inst_f32 = inst_f32.at[:, _IF_LMIN:_IF_LMIN + 3].set(
        scene.mesh_aabb_min[mesh]
    )
    inst_f32 = inst_f32.at[:, _IF_LMAX:_IF_LMAX + 3].set(
        scene.mesh_aabb_max[mesh]
    )

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

    # Box fast path metadata: detection + per-face representative world tri +
    # its faceted world normal (taken from geom so orientation matches the
    # reference winding bit-for-bit).  The fast path additionally requires an
    # identity composed rotation (cube-world instances are pure translations,
    # cube_world.cc:163) so the world-AABB slab IS the local box test;
    # rotated instances fall back to the template scan.
    is_box_m, mat_m, face_tri_m, _, face_tri2_m = _detect_box_meshes(scene)
    if exact_uv and not box_exact_uv:
        is_box_m = jnp.zeros_like(is_box_m)
    elif texture_mapping:
        # a textured box mesh must take the template path for real uv
        T = scene.tri_v.shape[0]
        tri_rows = jnp.arange(T, dtype=jnp.int32)
        starts_m = scene.mesh_tri_start
        in_mesh = (
            (tri_rows[None, :] >= starts_m[:, None])
            & (tri_rows[None, :] < (starts_m + scene.mesh_tri_count)[:, None])
        )
        any_tex = jnp.any(
            in_mesh & ~scene.tri_coord_degenerate[None, :], axis=1
        )
        is_box_m = is_box_m & ~any_tex
    ident_rot = (
        (jnp.abs(q[:, 0]) < 1e-6)
        & (jnp.abs(q[:, 1]) < 1e-6)
        & (jnp.abs(q[:, 2]) < 1e-6)
    )
    inst_i32 = inst_i32.at[:, _II_IS_BOX].set(
        (is_box_m[mesh] & ident_rot).astype(jnp.int32)
    )
    inst_i32 = inst_i32.at[:, _II_MAT].set(mat_m[mesh])
    # face triangle row (mesh-local) -> world tri id for this instance
    face_wtri = wtri_start[:, None] + (
        face_tri_m[mesh] - tmpl_start[:, None]
    )  # [n, 6]
    face_wtri = jnp.clip(face_wtri, 0, max(geom.a.shape[0] - 1, 0))
    inst_i32 = inst_i32.at[:, _II_FACE_WTRI:_II_FACE_WTRI + 6].set(face_wtri)
    face_wtri2 = wtri_start[:, None] + (
        face_tri2_m[mesh] - tmpl_start[:, None]
    )
    face_wtri2 = jnp.clip(face_wtri2, 0, max(geom.a.shape[0] - 1, 0))
    inst_i32 = inst_i32.at[:, _II_FACE_WTRI2:_II_FACE_WTRI2 + 6].set(
        face_wtri2
    )
    fnrm = geom.na[face_wtri]  # [n, 6, 3] world faceted face normals
    inst_f32 = inst_f32.at[:, _IF_FNRM:_IF_FNRM + 18].set(
        fnrm.reshape(n, 18)
    )

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
    tmpl = tmpl.at[:, _TF_MAT].set(scene.tri_mat.astype(jnp.float32))
    tmpl = tmpl.at[:, _TF_NA:_TF_NA + 3].set(scene.norms[scene.tri_v[:, 0]])
    tmpl = tmpl.at[:, _TF_NB:_TF_NB + 3].set(scene.norms[scene.tri_v[:, 1]])
    tmpl = tmpl.at[:, _TF_NC:_TF_NC + 3].set(scene.norms[scene.tri_v[:, 2]])
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
    # axes along which the WHOLE tile is parallel (e.g. axis-aligned shadow
    # rays) constrain by origin-interval containment instead — otherwise they
    # are unconstrained and every instance votes.  Exact zeros only, matching
    # _ray_recips / the oracle's ray_aabb (``d == 0`` skip, bounding_box.cu:75).
    all_par = (dlo == 0.0) & (dhi == 0.0)
    contained = (ohi[:, None] >= bmin[None]) & (olo[:, None] <= bmax[None])
    par_ok = jnp.all(~all_par[:, None] | contained, axis=-1)  # [T,N]
    vote = (tmin <= tmax) & (tmax >= rm.THRESHOLD) & par_ok

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


def _slab_terms(inst_f_ref, i, ox, oy, oz, ix, iy, iz, par_x, par_y, par_z,
                base: int):
    """Per-axis Kay/Kajiya slab times against the row-``i`` AABB stored at
    columns [base, base+6) (bounding_box.cu:63-104); parallel axes are
    unconstrained (the reference skips plane-parallel triangles)."""
    bx0 = inst_f_ref[i, base + 0]
    by0 = inst_f_ref[i, base + 1]
    bz0 = inst_f_ref[i, base + 2]
    bx1 = inst_f_ref[i, base + 3]
    by1 = inst_f_ref[i, base + 4]
    bz1 = inst_f_ref[i, base + 5]
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
    # parallel-axis containment: a ray parallel to an axis whose origin lies
    # outside that slab can never hit a face of the box (the reference's
    # per-triangle bary test rejects it; the slab alone would not).
    inside = (
        (~par_x | ((ox >= bx0) & (ox <= bx1)))
        & (~par_y | ((oy >= by0) & (oy <= by1)))
        & (~par_z | ((oz >= bz0) & (oz <= bz1)))
    )
    return (tnx, tny, tnz), (tfx, tfy, tfz), inside


def _box_face_hit(tns, tfs, inside, dx, dy, dz, inst_f_ref, inst_i_ref, i):
    """Closest-hit of a ray against an axis-aligned box from its slab times.

    For a closed box, the slab entry time IS the closest triangle hit (the
    entry face), and when the origin is inside (entry < THRESHOLD) the exit
    face is hit from within — exactly what the reference's 12-triangle scan
    computes (trimesh.cu:47-68), at ~1/15 the arithmetic.  Returns
    ``(ok, t, wtri, nx, ny, nz, mat)`` tiles."""
    tnx, tny, tnz = tns
    tfx, tfy, tfz = tfs
    t_entry = jnp.maximum(jnp.maximum(tnx, tny), tnz)
    t_exit = jnp.minimum(jnp.minimum(tfx, tfy), tfz)
    hit_box = (t_entry <= t_exit) & inside
    is_entry = t_entry >= rm.THRESHOLD
    t_hit = jnp.where(is_entry, t_entry, t_exit)
    ok = hit_box & (t_hit >= rm.THRESHOLD)

    tx = jnp.where(is_entry, tnx, tfx)
    ty = jnp.where(is_entry, tny, tfy)
    target = jnp.where(is_entry, t_entry, t_exit)
    ax_x = tx == target
    ax_y = ~ax_x & (ty == target)
    ax_z = ~ax_x & ~ax_y
    dsel = jnp.where(ax_x, dx, jnp.where(ax_y, dy, dz))
    # entry through the low face iff the ray moves up-axis; exit mirrors it
    # (xor form: Mosaic cannot select between i1 vectors)
    side_hi = (dsel >= 0.0) ^ is_entry
    axis = jnp.where(ax_x, 0, jnp.where(ax_y, 1, 2))
    face = axis * 2 + side_hi.astype(jnp.int32)

    wtri = jnp.zeros_like(face)
    nx = jnp.zeros_like(dx)
    ny = jnp.zeros_like(dx)
    nz = jnp.zeros_like(dx)
    for f in range(6):
        sel = face == f
        wtri = jnp.where(sel, inst_i_ref[i, _II_FACE_WTRI + f], wtri)
        nx = jnp.where(sel, inst_f_ref[i, _IF_FNRM + 3 * f + 0], nx)
        ny = jnp.where(sel, inst_f_ref[i, _IF_FNRM + 3 * f + 1], ny)
        nz = jnp.where(sel, inst_f_ref[i, _IF_FNRM + 3 * f + 2], nz)
    return ok, t_hit, wtri, nx, ny, nz, face


def _intersect_instance(i, any_hit, tns, tfs, inside, rays, refs, best,
                        max_tris: int, exact_uv: bool = False):
    """Closest-hit update of instance ``i`` against the ray tile — the shared
    body of the candidate-list kernel and the BVH-walk kernel.  ``tns/tfs/
    inside`` are the instance's (already computed) world slab terms.

    ``exact_uv`` (static): the box fast path additionally resolves the TRUE
    containing triangle of the hit face and its signed barycentrics — a
    per-face gated pair of bary evaluations (~2x the slab cost on hit faces)
    instead of demoting the whole mesh to the 12-triangle template loop
    (~12x).  Requires tables built with ``box_exact_uv=True`` (the
    _II_FACE_WTRI2 columns)."""
    ox, oy, oz, dx, dy, dz = rays
    inst_f_ref, inst_i_ref, tmpl_ref = refs
    (bt_ref, btri_ref, bu_ref, bv_ref, bnx_ref, bny_ref, bnz_ref,
     bmat_ref) = best
    is_box = inst_i_ref[i, _II_IS_BOX] > 0

    # ---- box fast path: identity-rotation box meshes hit exactly where
    # the (already computed) world slab enters/exits -----------------
    @pl.when(any_hit & is_box)
    def _():
        ok, t_hit, wtri, nx, ny, nz, face = _box_face_hit(
            tns, tfs, inside, dx, dy, dz, inst_f_ref, inst_i_ref, i
        )
        ok = ok & (t_hit < bt_ref[:])
        bt_ref[:] = jnp.where(ok, t_hit, bt_ref[:])
        btri_ref[:] = jnp.where(ok, wtri, btri_ref[:])
        bu_ref[:] = jnp.where(ok, 1.0 / 3.0, bu_ref[:])
        bv_ref[:] = jnp.where(ok, 1.0 / 3.0, bv_ref[:])
        bnx_ref[:] = jnp.where(ok, nx, bnx_ref[:])
        bny_ref[:] = jnp.where(ok, ny, bny_ref[:])
        bnz_ref[:] = jnp.where(ok, nz, bnz_ref[:])
        bmat_ref[:] = jnp.where(ok, inst_i_ref[i, _II_MAT], bmat_ref[:])

        if exact_uv:
            # Mesh-local hit point (identity composed rotation by the box
            # path's precondition): p = o + t d - pos.
            px_i = inst_f_ref[i, _IF_POS + 0]
            py_i = inst_f_ref[i, _IF_POS + 1]
            pz_i = inst_f_ref[i, _IF_POS + 2]
            hx = ox + t_hit * dx - px_i
            hy = oy + t_hit * dy - py_i
            hz = oz + t_hit * dz - pz_i
            tmpl_start = inst_i_ref[i, _II_TMPL_START]
            wtri_start = inst_i_ref[i, _II_WTRI_START]

            def bary(row):
                """Signed barycentrics (u = b-weight, v = c-weight) of the
                local hit point vs template triangle ``row`` — matches the
                analytic VJP reconstruction (cast_vjp._recon_plane_hit)."""
                ax = tmpl_ref[row, _TF_A + 0]
                ay = tmpl_ref[row, _TF_A + 1]
                az = tmpl_ref[row, _TF_A + 2]
                bx = tmpl_ref[row, _TF_B + 0]
                by = tmpl_ref[row, _TF_B + 1]
                bz = tmpl_ref[row, _TF_B + 2]
                cx = tmpl_ref[row, _TF_C + 0]
                cy = tmpl_ref[row, _TF_C + 1]
                cz = tmpl_ref[row, _TF_C + 2]
                pnx = tmpl_ref[row, _TF_PNU + 0]
                pny = tmpl_ref[row, _TF_PNU + 1]
                pnz = tmpl_ref[row, _TF_PNU + 2]
                area = tmpl_ref[row, _TF_AREA]
                inv = 1.0 / jnp.maximum(area, 1e-20)
                pax, pay, paz = hx - ax, hy - ay, hz - az
                cax, cay, caz = cx - ax, cy - ay, cz - az
                bax, bay, baz = bx - ax, by - ay, bz - az
                # u = ((p-a) x (c-a)) . n_hat / |n_raw|
                u = ((pay * caz - paz * cay) * pnx
                     + (paz * cax - pax * caz) * pny
                     + (pax * cay - pay * cax) * pnz) * inv
                # v = ((b-a) x (p-a)) . n_hat / |n_raw|
                v = ((bay * paz - baz * pay) * pnx
                     + (baz * pax - bax * paz) * pny
                     + (bax * pay - bay * pax) * pnz) * inv
                return u, v

            eps_b = 1e-5
            for f in range(6):
                sel = ok & (face == f)

                @pl.when(jnp.any(sel))
                def _(f=f, sel=sel):
                    w1 = inst_i_ref[i, _II_FACE_WTRI + f]
                    w2 = inst_i_ref[i, _II_FACE_WTRI2 + f]
                    u1, v1 = bary(w1 - wtri_start + tmpl_start)
                    u2, v2 = bary(w2 - wtri_start + tmpl_start)
                    in1 = ((u1 >= -eps_b) & (v1 >= -eps_b)
                           & (u1 + v1 <= 1.0 + eps_b))
                    in2 = ((u2 >= -eps_b) & (v2 >= -eps_b)
                           & (u2 + v2 <= 1.0 + eps_b))
                    use2 = ~in1 & in2
                    bu_ref[:] = jnp.where(
                        sel, jnp.where(use2, u2, u1), bu_ref[:])
                    bv_ref[:] = jnp.where(
                        sel, jnp.where(use2, v2, v1), bv_ref[:])
                    btri_ref[:] = jnp.where(
                        sel, jnp.where(use2, w2, w1), btri_ref[:])

    # ---- general template path: per-triangle scan in the instance-local
    # frame (cast_local, scene.cu:28-40) ------------------------------
    @pl.when(any_hit & ~is_box)
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
                    inside_t = jnp.abs(b0 + b1 + b2 - 1.0) <= rm.THRESHOLD

                    ok = (plane_ok & inside_t & (area > 0.0)
                          & (tt >= rm.THRESHOLD) & (tt < bt_ref[:]))

                    # interpolated mesh-local shading normal, rotated back to
                    # world by the inverse (conjugate) instance quat
                    # (trimesh.cu:59-63 + hitable.cu fix_isect)
                    snx = (b0 * tmpl_ref[row, _TF_NA + 0]
                           + b1 * tmpl_ref[row, _TF_NB + 0]
                           + b2 * tmpl_ref[row, _TF_NC + 0])
                    sny = (b0 * tmpl_ref[row, _TF_NA + 1]
                           + b1 * tmpl_ref[row, _TF_NB + 1]
                           + b2 * tmpl_ref[row, _TF_NC + 1])
                    snz = (b0 * tmpl_ref[row, _TF_NA + 2]
                           + b1 * tmpl_ref[row, _TF_NB + 2]
                           + b2 * tmpl_ref[row, _TF_NC + 2])
                    wnx, wny, wnz = _quat_rotate_tile(
                        -qx, -qy, -qz, qw, snx, sny, snz
                    )

                    bt_ref[:] = jnp.where(ok, tt, bt_ref[:])
                    btri_ref[:] = jnp.where(ok, wtri_start + j, btri_ref[:])
                    bu_ref[:] = jnp.where(ok, b1, bu_ref[:])
                    bv_ref[:] = jnp.where(ok, b2, bv_ref[:])
                    bnx_ref[:] = jnp.where(ok, wnx, bnx_ref[:])
                    bny_ref[:] = jnp.where(ok, wny, bny_ref[:])
                    bnz_ref[:] = jnp.where(ok, wnz, bnz_ref[:])
                    bmat_ref[:] = jnp.where(
                        ok, tmpl_ref[row, _TF_MAT].astype(jnp.int32),
                        bmat_ref[:],
                    )

                return _

            jax.lax.fori_loop(0, max_tris, tri_body, None)


def _skip_next(v):
    """Next preorder node after skipping v's subtree (bvh.cu:99-112): climb
    while v is a right child (odd), then step to the sibling; reaching the
    root ends the walk (0 == done sentinel)."""
    w = jax.lax.while_loop(
        lambda u: (u > 1) & (u % 2 == 1), lambda u: u // 2, v
    )
    return jnp.where(w == 1, jnp.int32(0), w + 1)


def _occlude_instance(i, active, tns, tfs, inside, rays, max_t, refs, blk,
                      max_tris: int):
    """Any-hit update of instance ``i`` against the ray tile: returns the new
    blocked mask (i32 — Mosaic cannot carry i1 vectors through regions).
    Shared body of the candidate-list and BVH-walk occlusion kernels;
    ``tns/tfs/inside`` are the instance's (already computed) world slab
    terms, ``active`` a scalar gate (instance validity + tile vote)."""
    ox, oy, oz, dx, dy, dz = rays
    inst_f_ref, inst_i_ref, tmpl_ref = refs
    is_box = inst_i_ref[i, _II_IS_BOX] > 0
    tnx, tny, tnz = tns
    tfx, tfy, tfz = tfs
    tmin = jnp.maximum(jnp.maximum(tnx, tny), tnz)
    tmax = jnp.minimum(jnp.minimum(tfx, tfy), tfz)

    # box: blocked iff the slab hit time lands within [THRESHOLD, max_t]
    hit_box = (tmin <= tmax) & inside
    t_hit = jnp.where(tmin >= rm.THRESHOLD, tmin, tmax)
    box_blocked = (hit_box & (t_hit >= rm.THRESHOLD) & (t_hit <= max_t)
                   & active & is_box)
    blk = jnp.maximum(blk, box_blocked.astype(jnp.int32))

    # template fallback for non-box meshes
    def template(blk):
        px = inst_f_ref[i, _IF_POS + 0]
        py = inst_f_ref[i, _IF_POS + 1]
        pz = inst_f_ref[i, _IF_POS + 2]
        qx = inst_f_ref[i, _IF_QUAT + 0]
        qy = inst_f_ref[i, _IF_QUAT + 1]
        qz = inst_f_ref[i, _IF_QUAT + 2]
        qw = inst_f_ref[i, _IF_QUAT + 3]
        lox, loy, loz = _quat_rotate_tile(qx, qy, qz, qw,
                                          ox - px, oy - py, oz - pz)
        ldx, ldy, ldz = _quat_rotate_tile(qx, qy, qz, qw, dx, dy, dz)
        tmpl_start = inst_i_ref[i, _II_TMPL_START]
        tri_count = inst_i_ref[i, _II_TRI_COUNT]

        def tri_body(j, blk):
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
            denom = ldx * nx + ldy * ny + ldz * nz
            plane_ok = jnp.abs(denom) >= rm.THRESHOLD
            tt = ((ax - lox) * nx + (ay - loy) * ny
                  + (az - loz) * nz) / jnp.where(plane_ok, denom, 1.0)
            hx = lox + tt * ldx
            hy = loy + tt * ldy
            hz = loz + tt * ldz
            inv_area = 1.0 / jnp.where(area > 0.0, area, 1.0)

            def edge_area(p0x, p0y, p0z, p1x, p1y, p1z):
                ex = p0y * p1z - p0z * p1y
                ey = p0z * p1x - p0x * p1z
                ez = p0x * p1y - p0y * p1x
                return jnp.sqrt(ex * ex + ey * ey + ez * ez)

            b0 = edge_area(cx - hx, cy - hy, cz - hz,
                           bx - hx, by - hy, bz - hz) * inv_area
            b1 = edge_area(cx - hx, cy - hy, cz - hz,
                           ax - hx, ay - hy, az - hz) * inv_area
            b2 = edge_area(ax - hx, ay - hy, az - hz,
                           bx - hx, by - hy, bz - hz) * inv_area
            inside_t = jnp.abs(b0 + b1 + b2 - 1.0) <= rm.THRESHOLD
            ok = (plane_ok & inside_t & (area > 0.0)
                  & (tt >= rm.THRESHOLD) & (tt <= max_t)
                  & (j < tri_count))
            return jnp.maximum(blk, ok.astype(jnp.int32))

        return jax.lax.fori_loop(0, max_tris, tri_body, blk)

    return jax.lax.cond(active & ~is_box, template, lambda b: b, blk)


def _init_best(ox, best):
    (bt_ref, btri_ref, bu_ref, bv_ref, bnx_ref, bny_ref, bnz_ref,
     bmat_ref) = best
    bt_ref[:] = jnp.full_like(ox, jnp.inf)
    btri_ref[:] = jnp.zeros_like(ox, dtype=jnp.int32)
    bu_ref[:] = jnp.zeros_like(ox)
    bv_ref[:] = jnp.zeros_like(ox)
    bnx_ref[:] = jnp.zeros_like(ox)
    bny_ref[:] = jnp.zeros_like(ox)
    bnz_ref[:] = jnp.ones_like(ox)
    bmat_ref[:] = jnp.zeros_like(ox, dtype=jnp.int32)


def _write_best(best, outs):
    (bt_ref, btri_ref, bu_ref, bv_ref, bnx_ref, bny_ref, bnz_ref,
     bmat_ref) = best
    t_out, tri_out, u_out, v_out, nx_out, ny_out, nz_out, mat_out = outs
    t_out[:] = bt_ref[:]
    tri_out[:] = btri_ref[:]
    u_out[:] = bu_ref[:]
    v_out[:] = bv_ref[:]
    # re-normalize the interpolated normal once per tile (reference
    # normalizes per hit, hitable.cu fix_isect)
    nlen = jnp.sqrt(bnx_ref[:] ** 2 + bny_ref[:] ** 2 + bnz_ref[:] ** 2)
    inv = 1.0 / jnp.maximum(nlen, rm.THRESHOLD)
    nx_out[:] = bnx_ref[:] * inv
    ny_out[:] = bny_ref[:] * inv
    nz_out[:] = bnz_ref[:] * inv
    mat_out[:] = bmat_ref[:]


def _ray_recips(dx, dy, dz):
    # Safe reciprocal directions with the reference's skip-parallel semantics:
    # only EXACT zeros count as parallel (bounding_box.cu:75's ``d == 0``
    # continue) — matching the jnp oracle's ray_aabb — so near-axis-parallel
    # rays (0 < |d| < eps) keep their true slab arithmetic instead of being
    # over-culled by the containment term (ADVICE r2).  Axis-aligned shadow
    # and camera rays have exact zero components, so the containment fix for
    # them is preserved.
    par_x = dx == 0.0
    par_y = dy == 0.0
    par_z = dz == 0.0
    ix = 1.0 / jnp.where(par_x, 1.0, dx)
    iy = 1.0 / jnp.where(par_y, 1.0, dy)
    iz = 1.0 / jnp.where(par_z, 1.0, dz)
    return (par_x, par_y, par_z), (ix, iy, iz)


def _cast_kernel(cand_ref, info_ref, inst_f_ref, inst_i_ref, tmpl_ref,
                 ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                 t_out, tri_out, u_out, v_out, nx_out, ny_out, nz_out,
                 mat_out,
                 bt_ref, btri_ref, bu_ref, bv_ref, bnx_ref, bny_ref, bnz_ref,
                 bmat_ref,
                 *, n_inst: int, max_tris: int, exact_uv: bool = False):
    tile_id = pl.program_id(0)
    loop_n = info_ref[tile_id, 0]
    overflow = info_ref[tile_id, 1]

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    (par_x, par_y, par_z), (ix, iy, iz) = _ray_recips(dx, dy, dz)

    best = (bt_ref, btri_ref, bu_ref, bv_ref, bnx_ref, bny_ref, bnz_ref,
            bmat_ref)
    _init_best(ox, best)
    rays = (ox, oy, oz, dx, dy, dz)
    refs = (inst_f_ref, inst_i_ref, tmpl_ref)

    def inst_body(k, _):
        i = jnp.where(overflow > 0, k, cand_ref[tile_id, jnp.minimum(k, cand_ref.shape[1] - 1)])
        valid = inst_i_ref[i, _II_VALID] > 0

        tns, tfs, inside = _slab_terms(
            inst_f_ref, i, ox, oy, oz, ix, iy, iz, par_x, par_y, par_z,
            _IF_BMIN,
        )
        tmin = jnp.maximum(jnp.maximum(tns[0], tns[1]), tns[2])
        tmax = jnp.minimum(jnp.minimum(tfs[0], tfs[1]), tfs[2])
        # Prune boxes no nearer than the current best (monotone optimization:
        # cannot change results, only skips provably-farther work).  `inside`
        # is the parallel-axis containment term: without it, axis-parallel
        # rays leave that axis unconstrained and every box votes.
        box_hit = ((tmin <= tmax) & (tmax >= rm.THRESHOLD)
                   & (tmin < bt_ref[:]) & inside)
        any_hit = jnp.any(box_hit) & valid
        _intersect_instance(i, any_hit, tns, tfs, inside, rays, refs, best,
                            max_tris, exact_uv=exact_uv)
        return _

    jax.lax.fori_loop(0, loop_n, inst_body, None)
    _write_best(best, (t_out, tri_out, u_out, v_out, nx_out, ny_out, nz_out,
                       mat_out))


def _bvh_cast_kernel(order_ref, nodes_ref, inst_f_ref, inst_i_ref, tmpl_ref,
                     ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                     t_out, tri_out, u_out, v_out, nx_out, ny_out, nz_out,
                     mat_out, visits_out,
                     bt_ref, btri_ref, bu_ref, bv_ref, bnx_ref, bny_ref,
                     bnz_ref, bmat_ref,
                     *, n_leaves: int, max_tris: int,
                     exact_uv: bool = False):
    """Tile-synchronous stackless LBVH traversal (production accel path).

    The TPU analog of the reference's warp-synchronous iterator
    (src/rayopt/bvh.cu:99-122 + src/rayenv/scene.cu:54-70): one cursor walks
    the implicit heap in preorder for the whole ray TILE; a tile-wide vote
    (``any`` over the 8x128 lanes — the __ballot_sync analog) decides descend
    vs skip; leaves run the shared instance intersector.  Nodes are
    O(log N) per occluder, so cast cost scales logarithmically in instance
    count (asserted by test_accel's visit-count test); ``visits_out`` reports
    the per-tile node-visit count for exactly that purpose.

    Virtual heap index v starts at 1 (root); children are 2v, 2v+1; leaves are
    v in [n, 2n); flat array index is (2n-1) - v (cpu/bvh.cc:48-50 layout).
    Skip-to-next: climb while v is a right child (odd), then step to the
    sibling; reaching the root ends the walk (bvh.cu:99-112)."""
    total = 2 * n_leaves - 1

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    (par_x, par_y, par_z), (ix, iy, iz) = _ray_recips(dx, dy, dz)

    best = (bt_ref, btri_ref, bu_ref, bv_ref, bnx_ref, bny_ref, bnz_ref,
            bmat_ref)
    _init_best(ox, best)
    rays = (ox, oy, oz, dx, dy, dz)
    refs = (inst_f_ref, inst_i_ref, tmpl_ref)

    def body(carry):
        v, cnt = carry
        flat = total - v
        node_ok = nodes_ref[flat, 6] > 0.0

        tns, tfs, inside = _slab_terms(
            nodes_ref, flat, ox, oy, oz, ix, iy, iz, par_x, par_y, par_z, 0
        )
        tmin = jnp.maximum(jnp.maximum(tns[0], tns[1]), tns[2])
        tmax = jnp.minimum(jnp.minimum(tfs[0], tfs[1]), tfs[2])
        box_hit = ((tmin <= tmax) & (tmax >= rm.THRESHOLD)
                   & (tmin < bt_ref[:]) & inside)
        vote = jnp.any(box_hit) & node_ok
        is_leaf = v >= n_leaves

        @pl.when(vote & is_leaf)
        def _():
            i = order_ref[flat]
            _intersect_instance(i, vote & (i >= 0), tns, tfs, inside, rays,
                                refs, best, max_tris, exact_uv=exact_uv)

        v_next = jnp.where(vote & ~is_leaf, 2 * v, _skip_next(v))
        return v_next, cnt + 1

    _, visits = jax.lax.while_loop(
        lambda c: c[0] > 0, body, (jnp.int32(1), jnp.int32(0))
    )
    _write_best(best, (t_out, tri_out, u_out, v_out, nx_out, ny_out, nz_out,
                       mat_out))
    visits_out[:] = jnp.full_like(btri_ref[:], visits)


def _bvh_occlude_kernel(order_ref, nodes_ref, inst_f_ref, inst_i_ref,
                        tmpl_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
                        dz_ref, mt_ref, blk_out, *, n_leaves: int,
                        max_tris: int):
    """Any-hit occlusion via the stackless LBVH walk — shadows stay
    O(log N) per occluder at scale instead of the candidate cull's
    O(tiles x N) list building (VERDICT r2 missing #4).  Same preorder
    walk as _bvh_cast_kernel with two any-hit twists: subtrees prune when
    their slab entry exceeds ``max_t`` or every still-unblocked lane misses
    the node box, and the whole walk exits as soon as all lanes block."""
    total = 2 * n_leaves - 1

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    (par_x, par_y, par_z), (ix, iy, iz) = _ray_recips(dx, dy, dz)
    max_t = mt_ref[:]
    rays = (ox, oy, oz, dx, dy, dz)
    refs = (inst_f_ref, inst_i_ref, tmpl_ref)

    def body(carry):
        v, blk = carry
        flat = total - v
        node_ok = nodes_ref[flat, 6] > 0.0

        tns, tfs, inside = _slab_terms(
            nodes_ref, flat, ox, oy, oz, ix, iy, iz, par_x, par_y, par_z, 0
        )
        tmin = jnp.maximum(jnp.maximum(tns[0], tns[1]), tns[2])
        tmax = jnp.minimum(jnp.minimum(tfs[0], tfs[1]), tfs[2])
        box_hit = ((tmin <= tmax) & (tmax >= rm.THRESHOLD) & (blk == 0)
                   & (tmin <= max_t) & inside)
        vote = jnp.any(box_hit) & node_ok
        is_leaf = v >= n_leaves

        i_raw = order_ref[jnp.minimum(flat, n_leaves - 1)]
        leaf_hit = vote & is_leaf & (i_raw >= 0)
        blk = _occlude_instance(jnp.maximum(i_raw, 0), leaf_hit, tns, tfs,
                                inside, rays, max_t, refs, blk, max_tris)
        v_next = jnp.where(vote & ~is_leaf, 2 * v, _skip_next(v))
        return v_next, blk

    def cond(carry):
        v, blk = carry
        return (v > 0) & jnp.any(blk == 0)

    blk0 = jnp.zeros_like(ox, dtype=jnp.int32)
    _, blk = jax.lax.while_loop(cond, body, (jnp.int32(1), blk0))
    blk_out[:] = blk


def _bvh_occlude2_kernel(order_ref, nodes_ref, inst_f_ref, inst_i_ref,
                         tmpl_ref, o1x_ref, o1y_ref, o1z_ref,
                         d1x_ref, d1y_ref, d1z_ref,
                         o2x_ref, o2y_ref, o2z_ref,
                         d2x_ref, d2y_ref, d2z_ref,
                         mt1_ref, mt2_ref, blk1_out, blk2_out,
                         *, n_leaves: int, max_tris: int):
    """FUSED dual-query any-hit LBVH walk: both shadow queries of a
    two-light round share ONE preorder node walk (the roofline's "fewer
    queries" lever — per-node stepping, node loads, and the subtree-skip
    logic amortize over both lights; the union of the two node sets is
    smaller than their sum when the lights see similar geometry).  The
    descend vote is the union of the per-query votes; each query's leaf
    update is gated by its own vote, so results are identical to two
    independent walks."""
    total = 2 * n_leaves - 1

    o1 = (o1x_ref[:], o1y_ref[:], o1z_ref[:])
    d1 = (d1x_ref[:], d1y_ref[:], d1z_ref[:])
    o2 = (o2x_ref[:], o2y_ref[:], o2z_ref[:])
    d2 = (d2x_ref[:], d2y_ref[:], d2z_ref[:])
    par1, inv1 = _ray_recips(*d1)
    par2, inv2 = _ray_recips(*d2)
    mt1 = mt1_ref[:]
    mt2 = mt2_ref[:]
    rays1 = o1 + d1
    rays2 = o2 + d2
    refs = (inst_f_ref, inst_i_ref, tmpl_ref)

    def body(carry):
        v, blk1, blk2 = carry
        flat = total - v
        node_ok = nodes_ref[flat, 6] > 0.0

        tns1, tfs1, in1 = _slab_terms(nodes_ref, flat, *o1, *inv1, *par1, 0)
        tmin1 = jnp.maximum(jnp.maximum(tns1[0], tns1[1]), tns1[2])
        tmax1 = jnp.minimum(jnp.minimum(tfs1[0], tfs1[1]), tfs1[2])
        hit1 = ((tmin1 <= tmax1) & (tmax1 >= rm.THRESHOLD) & (blk1 == 0)
                & (tmin1 <= mt1) & in1)
        tns2, tfs2, in2 = _slab_terms(nodes_ref, flat, *o2, *inv2, *par2, 0)
        tmin2 = jnp.maximum(jnp.maximum(tns2[0], tns2[1]), tns2[2])
        tmax2 = jnp.minimum(jnp.minimum(tfs2[0], tfs2[1]), tfs2[2])
        hit2 = ((tmin2 <= tmax2) & (tmax2 >= rm.THRESHOLD) & (blk2 == 0)
                & (tmin2 <= mt2) & in2)
        vote1 = jnp.any(hit1) & node_ok
        vote2 = jnp.any(hit2) & node_ok
        vote = vote1 | vote2
        is_leaf = v >= n_leaves

        i_raw = order_ref[jnp.minimum(flat, n_leaves - 1)]
        leaf_ok = is_leaf & (i_raw >= 0)
        i = jnp.maximum(i_raw, 0)
        blk1 = _occlude_instance(i, vote1 & leaf_ok, tns1, tfs1, in1, rays1,
                                 mt1, refs, blk1, max_tris)
        blk2 = _occlude_instance(i, vote2 & leaf_ok, tns2, tfs2, in2, rays2,
                                 mt2, refs, blk2, max_tris)
        v_next = jnp.where(vote & ~is_leaf, 2 * v, _skip_next(v))
        return v_next, blk1, blk2

    def cond(carry):
        v, blk1, blk2 = carry
        return (v > 0) & (jnp.any(blk1 == 0) | jnp.any(blk2 == 0))

    blk0 = jnp.zeros_like(o1x_ref[:], dtype=jnp.int32)
    _, blk1, blk2 = jax.lax.while_loop(cond, body, (jnp.int32(1), blk0, blk0))
    blk1_out[:] = blk1
    blk2_out[:] = blk2


def _occlude_kernel(cand_ref, info_ref, inst_f_ref, inst_i_ref, tmpl_ref,
                    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, mt_ref,
                    blk_out, *, n_inst: int, max_tris: int):
    """Any-hit occlusion query: blocked iff some hit has THRESHOLD <= t <=
    max_t.  Equivalent to the closest-hit test ``valid & t <= max_t`` (the
    closest hit is minimal), but the candidate loop exits as soon as every
    lane in the tile is blocked — the shadow-ray analog of the reference's
    early-out-free scan, minus all best-hit bookkeeping."""
    tile_id = pl.program_id(0)
    loop_n = info_ref[tile_id, 0]
    overflow = info_ref[tile_id, 1]

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    max_t = mt_ref[:]

    (par_x, par_y, par_z), (ix, iy, iz) = _ray_recips(dx, dy, dz)

    rays = (ox, oy, oz, dx, dy, dz)
    refs = (inst_f_ref, inst_i_ref, tmpl_ref)

    def body(carry):
        # the blocked mask is carried as i32 (Mosaic cannot yield i1 vectors
        # from scf.if/while regions)
        k, blk = carry
        i = jnp.where(overflow > 0, k,
                      cand_ref[tile_id, jnp.minimum(k, cand_ref.shape[1] - 1)])
        valid = inst_i_ref[i, _II_VALID] > 0

        tns, tfs, inside = _slab_terms(
            inst_f_ref, i, ox, oy, oz, ix, iy, iz, par_x, par_y, par_z,
            _IF_BMIN,
        )
        tmin = jnp.maximum(jnp.maximum(tns[0], tns[1]), tns[2])
        tmax = jnp.minimum(jnp.minimum(tfs[0], tfs[1]), tfs[2])
        box_hit = ((tmin <= tmax) & (tmax >= rm.THRESHOLD) & (blk == 0)
                   & (tmin <= max_t) & inside)
        any_hit = jnp.any(box_hit) & valid

        blk = _occlude_instance(i, any_hit, tns, tfs, inside, rays, max_t,
                                refs, blk, max_tris)
        return k + 1, blk

    def cond(carry):
        k, blk = carry
        return (k < loop_n) & jnp.any(blk == 0)

    blk0 = jnp.zeros_like(ox, dtype=jnp.int32)
    _, blk = jax.lax.while_loop(cond, body, (jnp.int32(0), blk0))
    blk_out[:] = blk


def _pad_rays(ro, rd, tile):
    ro_f = ro.reshape(-1, 3)
    rd_f = rd.reshape(-1, 3)
    r = ro_f.shape[0]
    rp = (r + tile - 1) // tile * tile
    pad = rp - r
    # pad rows park far outside the scene (origin 1e30) so their tiles fail
    # every vote — origin-0 ghosts can sit inside the scene and pay full
    # traversals
    ro_f = jnp.pad(ro_f, ((0, pad), (0, 0)), constant_values=1.0e30)
    rd_f = jnp.pad(rd_f, ((0, pad), (0, 0)), constant_values=0.0)
    pad_mask = jnp.arange(rp) >= r
    rd_f = jnp.where(pad_mask[:, None], jnp.array([0.0, 0.0, 1.0]), rd_f)
    rows = rp // LANES
    comps = [ro_f[:, 0], ro_f[:, 1], ro_f[:, 2],
             rd_f[:, 0], rd_f[:, 1], rd_f[:, 2]]
    return [c.reshape(rows, LANES) for c in comps], r, rp, rows


def _use_walk(cfg: RenderConfig, n_inst: int) -> bool:
    return cfg.pallas_traversal == "bvh" or (
        cfg.pallas_traversal == "auto" and n_inst > 256
    )


def prepare_pallas_cast(scene: Scene, geom: WorldGeometry, cfg: RenderConfig):
    """Build the cast's runtime data (scene tables + LBVH nodes) as an explicit
    PYTREE, separate from kernel binding.

    Rationale: when these arrays are *closed over* by the cast (and its
    custom_vjp wrappers) instead of being function arguments, any traced value
    among them (e.g. tables derived from a scene whose materials are being
    differentiated) becomes a tracer constant inside the staged jaxpr —
    which ``jax.checkpoint`` of the per-sample render body then fails to
    lower on TPU ("No constant handler for DynamicJaxprTracer", the round-3
    heavy-spp blocker).  Threading this pytree through explicit arguments
    (engine._sample_frame) keeps every staged jaxpr closure-free."""
    tables = build_tables(
        scene, geom,
        exact_uv=cfg.edge_aware_grads,
        box_exact_uv=cfg.edge_aware_grads,
        texture_mapping=cfg.texture_mapping,
    )
    aux = {"tables": tables, "nodes": None, "ordering": None,
           "tables_occl": None}
    if _use_walk(cfg, tables.inst_i32.shape[0]):
        from ..accel import build_lbvh

        lbvh = build_lbvh(geom.aabb_min, geom.aabb_max)
        total = 2 * lbvh.n_leaves - 1
        nodes = jnp.zeros((total, 8), jnp.float32)
        nodes = nodes.at[:, 0:3].set(lbvh.box_min)
        nodes = nodes.at[:, 3:6].set(lbvh.box_max)
        nodes = nodes.at[:, 6].set(lbvh.valid.astype(jnp.float32))
        aux["nodes"] = nodes
        aux["ordering"] = lbvh.ordering
    return aux


def auto_tile_rows(width: int, height: int) -> int:
    """Kernel tile size for ``cfg.tile_rows == 0`` (AUTO), by frame size:
    48 rows up to ~1M rays (8192 kernel rows after 32-alignment padding),
    64 above — the round-5 long-chain sweep's optima (scene.py tile_rows
    doc; a follow-up 1080p fwd+bwd trial showed 96/128 rows flat-to-worse
    than 64, so 64 is the large-frame plateau).  The padded FULL frame
    sizes the choice; compacted casts reuse the same kernel on fewer
    rows."""
    hp = -(-height // 32) * 32
    wp = -(-width // 32) * 32
    return 48 if hp * wp // LANES <= 8192 else 64


def make_pallas_cast(scene: Scene, geom: WorldGeometry, cfg: RenderConfig,
                     tile_rows: int = 0, max_cand: int = 64,
                     aux=None) -> CastFn:
    """Build the Pallas cast; tables are computed from (scene, geom) at trace
    time (or taken from a ``prepare_pallas_cast`` pytree) and live in VMEM for
    the whole kernel.

    Two traversal strategies share the instance intersector
    (``cfg.pallas_traversal``): ``"cull"`` consumes per-tile candidate lists
    from the XLA interval cull (scalar prefetch; O(N) cull work but MXU-cheap
    and near-to-far ordered — best for small scenes), ``"bvh"`` walks the
    implicit-heap LBVH in-kernel (O(log N) per occluder — required at scale);
    ``"auto"`` picks by instance count.

    The returned cast carries an ``occlude(ro, rd, max_t) -> bool`` attribute
    (the any-hit kernel) and, for the BVH path, ``visit_counts(ro, rd)``
    (per-tile node visits, used by the O(log N) scaling test)."""
    if aux is None:
        aux = prepare_pallas_cast(scene, geom, cfg)
    if tile_rows <= 0:
        tile_rows = int(cfg.tile_rows)
    if tile_rows <= 0:
        tile_rows = auto_tile_rows(cfg.width, cfg.height)
    if tile_rows % 8 != 0:
        # surface a clear error here rather than an opaque Mosaic lowering
        # failure deep inside pallas_call (ADVICE r4)
        raise ValueError(
            f"tile_rows must be a positive multiple of 8 (Mosaic sublane "
            f"requirement), got {tile_rows}")
    tables = aux["tables"]
    # occlusion may use box-fast-path tables even when casts need exact uv
    tables_o = aux.get("tables_occl")
    if tables_o is None:
        tables_o = tables
    n_inst = tables.inst_i32.shape[0]
    max_tris = int(cfg.max_tris_per_mesh)
    tile = tile_rows * LANES
    use_walk = _use_walk(cfg, n_inst)

    kernel = functools.partial(_cast_kernel, n_inst=n_inst,
                               max_tris=max_tris,
                               exact_uv=cfg.edge_aware_grads)
    occ_kernel = functools.partial(_occlude_kernel, n_inst=n_inst,
                                   max_tris=max_tris)

    ray_spec = pl.BlockSpec((tile_rows, LANES), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_rows, LANES), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    interp = interpret_mode()
    best_scratch = [
        pltpu.VMEM((tile_rows, LANES), jnp.float32),
        pltpu.VMEM((tile_rows, LANES), jnp.int32),
        pltpu.VMEM((tile_rows, LANES), jnp.float32),
        pltpu.VMEM((tile_rows, LANES), jnp.float32),
        pltpu.VMEM((tile_rows, LANES), jnp.float32),
        pltpu.VMEM((tile_rows, LANES), jnp.float32),
        pltpu.VMEM((tile_rows, LANES), jnp.float32),
        pltpu.VMEM((tile_rows, LANES), jnp.int32),
    ]
    def hit_outs(rows):
        f = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
        i = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
        return [f, i, f, f, f, f, f, i]

    if use_walk:
        nodes = aux["nodes"]
        ordering = aux["ordering"]
        n_leaves = (nodes.shape[0] + 1) // 2
        bvh_kernel = functools.partial(
            _bvh_cast_kernel, n_leaves=n_leaves, max_tris=max_tris,
            exact_uv=cfg.edge_aware_grads,
        )

    def _run_walk(ro, rd):
        batch_shape = ro.shape[:-1]
        comps, r, rp, rows = _pad_rays(ro, rd, tile)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(rows // tile_rows,),
            in_specs=[table_spec] * 4 + [ray_spec] * 6,
            out_specs=[out_spec] * 9,
            scratch_shapes=list(best_scratch),
        )
        outs = pl.pallas_call(
            bvh_kernel,
            grid_spec=grid_spec,
            out_shape=hit_outs(rows)
            + [jax.ShapeDtypeStruct((rows, LANES), jnp.int32)],
            interpret=interp,
        )(ordering, nodes, tables.inst_f32, tables.inst_i32, tables.tmpl,
          *comps)
        t, tri, u, v, nx, ny, nz, mat, visits = outs

        def unpack(x):
            return x.reshape(rp)[:r].reshape(batch_shape)

        t_u = unpack(t)
        hit = Hit(
            valid=jnp.isfinite(t_u),
            t=t_u,
            wtri=unpack(tri),
            uv=jnp.stack([unpack(u), unpack(v)], axis=-1),
            normal=jnp.stack([unpack(nx), unpack(ny), unpack(nz)], axis=-1),
            mat=unpack(mat),
        )
        per_tile_visits = visits.reshape(-1, tile)[:, 0]
        return hit, per_tile_visits

    def cast(ro, rd):
        if use_walk:
            return _run_walk(ro, rd)[0]
        batch_shape = ro.shape[:-1]
        comps, r, rp, rows = _pad_rays(ro, rd, tile)
        cand, info = tile_candidates(comps, tile_rows, tables.inst_f32,
                                     max_cand)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(rows // tile_rows,),
            in_specs=[table_spec, table_spec, table_spec] + [ray_spec] * 6,
            out_specs=[out_spec] * 8,
            scratch_shapes=list(best_scratch),
        )
        t, tri, u, v, nx, ny, nz, mat = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=hit_outs(rows),
            # Mosaic targets TPUs; on CPU hosts (tests, oracle comparisons) the
            # kernel runs in the interpreter with identical semantics.
            interpret=interp,
        )(cand, info, tables.inst_f32, tables.inst_i32, tables.tmpl, *comps)

        def unpack(x):
            return x.reshape(rp)[:r].reshape(batch_shape)

        t = unpack(t)
        return Hit(
            valid=jnp.isfinite(t),
            t=t,
            wtri=unpack(tri),
            uv=jnp.stack([unpack(u), unpack(v)], axis=-1),
            normal=jnp.stack([unpack(nx), unpack(ny), unpack(nz)], axis=-1),
            mat=unpack(mat),
        )

    if use_walk:
        cast.visit_counts = lambda ro, rd: _run_walk(ro, rd)[1]

    if use_walk:
        bvh_occ_kernel = functools.partial(
            _bvh_occlude_kernel, n_leaves=n_leaves, max_tris=max_tris
        )

    def occlude(ro, rd, max_t):
        batch_shape = ro.shape[:-1]
        comps, r, rp, rows = _pad_rays(ro, rd, tile)
        mt = jnp.broadcast_to(max_t, batch_shape).reshape(-1)
        mt = jnp.pad(mt, (0, rp - r)).reshape(rows, LANES)
        if use_walk:
            # Shadow queries walk the same LBVH as closest-hit casts:
            # O(log N) per occluder instead of the O(tiles x N)
            # candidate-list build below.
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(rows // tile_rows,),
                in_specs=[table_spec] * 4 + [ray_spec] * 7,
                out_specs=[out_spec],
            )
            (blk,) = pl.pallas_call(
                bvh_occ_kernel,
                grid_spec=grid_spec,
                out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.int32)],
                interpret=interp,
            )(ordering, nodes, tables_o.inst_f32, tables_o.inst_i32,
              tables_o.tmpl, *comps, mt)
            return (blk.reshape(rp)[:r] > 0).reshape(batch_shape)
        cand, info = tile_candidates(comps, tile_rows, tables.inst_f32,
                                     max_cand)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(rows // tile_rows,),
            in_specs=[table_spec, table_spec, table_spec] + [ray_spec] * 7,
            out_specs=[out_spec],
        )
        (blk,) = pl.pallas_call(
            occ_kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.int32)],
            interpret=interp,
        )(cand, info, tables_o.inst_f32, tables_o.inst_i32, tables_o.tmpl,
          *comps, mt)
        return (blk.reshape(rp)[:r] > 0).reshape(batch_shape)

    cast.occlude = occlude

    if use_walk:
        bvh_occ2_kernel = functools.partial(
            _bvh_occlude2_kernel, n_leaves=n_leaves, max_tris=max_tris
        )

        def occlude2(o1, d1, mt1, o2, d2, mt2):
            """Fused dual shadow query (see _bvh_occlude2_kernel); results
            equal two independent ``occlude`` calls."""
            batch_shape = o1.shape[:-1]
            c1, r, rp, rows = _pad_rays(o1, d1, tile)
            c2, _, _, _ = _pad_rays(o2, d2, tile)

            def padm(mt):
                m = jnp.broadcast_to(mt, batch_shape).reshape(-1)
                return jnp.pad(m, (0, rp - r)).reshape(rows, LANES)

            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(rows // tile_rows,),
                in_specs=[table_spec] * 4 + [ray_spec] * 14,
                out_specs=[out_spec] * 2,
            )
            blk1, blk2 = pl.pallas_call(
                bvh_occ2_kernel,
                grid_spec=grid_spec,
                out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.int32)] * 2,
                interpret=interp,
            )(ordering, nodes, tables_o.inst_f32, tables_o.inst_i32,
              tables_o.tmpl, *c1, *c2, padm(mt1), padm(mt2))
            return ((blk1.reshape(rp)[:r] > 0).reshape(batch_shape),
                    (blk2.reshape(rp)[:r] > 0).reshape(batch_shape))

        cast.occlude2 = occlude2
    return cast
