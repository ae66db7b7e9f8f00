"""MXU Pallas cast kernel: ray-triangle intersection as systolic-array matmuls.

The v2 kernel (pallas_engine) walks candidates with scalar loads and VPU tile
ops; its per-candidate cost is dominated by scalar traffic.  This kernel moves
the arithmetic onto the MXU using the Pluecker-coordinate formulation:

* A ray is the 6-vector ``[d, m]`` with moment ``m = o x d``; an edge (p -> q)
  carries ``[p x q, q - p]``.  The signed weight
  ``w = d . (p x q) + m . (q - p)`` is a *bilinear form* — so testing a tile of
  rays against a block of edges is one matmul ``[rays, 8] @ [8, K]`` on the MXU.
* The three edge weights of a triangle are (up to the common scale
  ``d . n_raw``) its barycentric coordinates: ``b_i = w_i / (w_a + w_b + w_c)``;
  inside iff all ``b_i >= -tol``.  The hit time comes from plane rows in
  numerator/denominator form (denominator uses the *unit* normal so the
  reference's plane-parallel epsilon applies unchanged, geometry.h:254-261).
* Per tile, the K candidate triangle rows are *gathered by XLA* into
  ``[T, 8, K]`` staged tensors (from the tile-candidate lists produced by the
  XLA interval cull, pallas_engine.tile_candidates) and pipelined into VMEM by
  the BlockSpec machinery — no in-kernel scalar staging loops.  Since
  instances' triangle rows are CONTIGUOUS in instance order, tiles whose
  candidate count overflows the staging width simply sweep the whole
  (column-major ``[8, Wp]``) table in K-column chunks through the same matmul
  path — a dense brute-force fallback sharing one code shape with the staged
  path.

Acceptance semantics: sign tests with a relative tolerance instead of the
reference's area-sum tolerance (geometry.h:275-290) — boundary behavior can
differ in the last ulp at triangle edges (like Moller-Trumbore); parity tests
budget a small rate of edge-pixel disagreement, and the jnp oracle remains the
reference formulation.
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
from .pallas_engine import tile_candidates, build_tables, interpret_mode

LANES = 128
F32_BIG = 3.0e38
BARY_TOL = 1e-5


def _pytree_dataclass(cls):
    import dataclasses as _dc

    fields = [f.name for f in _dc.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree_dataclass
@dataclass
class MxuSceneTables:
    edge_a: Any  # [Wp, 8] pluecker row of edge (b -> c)  (weight of vertex a)
    edge_b: Any  # [Wp, 8] edge (c -> a)                  (weight of vertex b)
    edge_c: Any  # [Wp, 8] edge (a -> b)                  (weight of vertex c)
    plane_num: Any  # [Wp, 8] row q: q . [o, d, 1, 0] = n.(a - o)   (unit n)
    plane_den: Any  # [Wp, 8] row q: q . [o, d, 1, 0] = n.d         (unit n)
    inst_f32: Any  # [N, 16] (AABB columns, for the tile cull)
    inst_start: Any  # [N] i32 first world-tri row of the instance
    inst_count: Any  # [N] i32


def build_mxu_tables(scene: Scene, geom: WorldGeometry, pad_tris: int
                     ) -> MxuSceneTables:
    """World-space matmul row tables (trace-safe jnp ops).  ``pad_tris`` zero
    rows at the end give the dense sweep's last chunk a safe region (zero rows
    have degenerate planes and are rejected by the epsilon tests)."""
    a, b, c = geom.a, geom.b, geom.c
    w = a.shape[0]

    def pluecker_edge(p, q):
        direction = q - p
        moment = jnp.cross(p, q)
        return jnp.concatenate(
            [moment, direction, jnp.zeros((w, 2), jnp.float32)], axis=-1
        )

    edge_a = pluecker_edge(b, c)
    edge_b = pluecker_edge(c, a)
    edge_c = pluecker_edge(a, b)

    n_raw = jnp.cross(b - a, c - a)
    n_unit = rm.normalize(n_raw)
    ndota = jnp.sum(n_unit * a, axis=-1, keepdims=True)
    zeros1 = jnp.zeros((w, 1), jnp.float32)
    zeros3 = jnp.zeros((w, 3), jnp.float32)
    plane_num = jnp.concatenate([-n_unit, zeros3, ndota, zeros1], axis=-1)
    plane_den = jnp.concatenate([zeros3, n_unit, zeros1, zeros1], axis=-1)

    def pad(x):
        return jnp.pad(x, ((0, pad_tris), (0, 0)))

    v2 = build_tables(scene, geom)
    return MxuSceneTables(
        edge_a=pad(edge_a),
        edge_b=pad(edge_b),
        edge_c=pad(edge_c),
        plane_num=pad(plane_num),
        plane_den=pad(plane_den),
        inst_f32=v2.inst_f32,
        inst_start=v2.inst_i32[:, 2],
        inst_count=v2.inst_i32[:, 1],
    )


def _mxu_kernel(info_ref,
                ea_t, eb_t, ec_t, pn_t, pd_t,
                sea, seb, sec, spn, spd, idrow_ref,
                rd6_ref, rp8_ref,
                t_out, id_out, u_out, v_out,
                *, tile: int, k: int, n_tris: int, n_chunks: int):
    tile_id = pl.program_id(0)
    overflow = info_ref[tile_id, 1]

    rd6 = rd6_ref[:]  # [tile, 8] = [d, m, 0, 0]  (pairs with edge rows [pxq, q-p])
    rp8 = rp8_ref[:]  # [tile, 8] = [o, d, 1, 0]

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, k), 1).astype(jnp.float32)

    def score_block(ea, eb, ec, pn, pd, id_row):
        """Intersect the ray tile against K columns; masked best-per-ray.
        Table operands are ``[8, K]`` so each product is a plain MXU matmul."""
        def mat(x, y):  # [tile, 8] @ [8, K] -> [tile, K]
            # HIGHEST: full-f32 MXU passes.  With the default (bf16 input
            # rounding) ~0.2% of hit/miss decisions flip at triangle edges
            # on-chip vs the f32 oracle — caught by bench.py's cross-engine
            # consistency gate; interpret mode never sees it.
            return jax.lax.dot_general(
                x, y, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        wa = mat(rd6, ea)
        wb = mat(rd6, eb)
        wc = mat(rd6, ec)
        num = mat(rp8, pn)
        den = mat(rp8, pd)

        s = wa + wb + wc
        s_ok = jnp.abs(s) > 1e-30
        inv_s = 1.0 / jnp.where(s_ok, s, 1.0)
        ba = wa * inv_s
        bb = wb * inv_s
        bc = wc * inv_s
        inside = (ba >= -BARY_TOL) & (bb >= -BARY_TOL) & (bc >= -BARY_TOL)

        den_ok = jnp.abs(den) >= rm.THRESHOLD
        tt = num / jnp.where(den_ok, den, 1.0)
        valid = inside & den_ok & s_ok & (tt >= rm.THRESHOLD) & (id_row >= 0.0)
        tt = jnp.where(valid, tt, jnp.inf)

        tmin = jnp.min(tt, axis=1, keepdims=True)  # [tile, 1]
        is_min = (tt == tmin)
        colmin = jnp.min(jnp.where(is_min, col_iota, F32_BIG), axis=1,
                         keepdims=True)
        pick = is_min & (col_iota == colmin)

        def select(x):
            return jnp.min(jnp.where(pick, x, F32_BIG), axis=1, keepdims=True)

        return tmin, select(id_row), select(bb), select(bc)

    def merge(best, cand):
        bt, bi, bu, bv = best
        ct, ci, cu, cv = cand
        better = ct < bt
        return (jnp.where(better, ct, bt), jnp.where(better, ci, bi),
                jnp.where(better, cu, bu), jnp.where(better, cv, bv))

    init = (
        jnp.full((tile, 1), jnp.inf, jnp.float32),
        jnp.zeros((tile, 1), jnp.float32),
        jnp.zeros((tile, 1), jnp.float32),
        jnp.zeros((tile, 1), jnp.float32),
    )

    # ---- staged candidate path (common case): rows pre-gathered by XLA ------
    def staged(best):
        cand = score_block(sea[0], seb[0], sec[0], spn[0], spd[0],
                           idrow_ref[0, 0:1, :])
        return merge(best, cand)

    # ---- dense sweep fallback (candidate overflow) --------------------------
    def dense(best):
        def chunk(ci, best):
            r0 = ci * k
            sl = pl.ds(r0, k)
            ids = col_iota[:1] + jnp.float32(1.0) * r0  # [1, k]
            ids = jnp.where(ids < n_tris, ids, -1.0)
            cand = score_block(ea_t[:, sl], eb_t[:, sl], ec_t[:, sl],
                               pn_t[:, sl], pd_t[:, sl], ids)
            return merge(best, cand)

        return jax.lax.fori_loop(0, n_chunks, chunk, best)

    best = jax.lax.cond(overflow > 0, dense, staged, init)

    t_out[:] = best[0]
    id_out[:] = best[1]
    u_out[:] = best[2]
    v_out[:] = best[3]


def make_mxu_cast(scene: Scene, geom: WorldGeometry, cfg: RenderConfig,
                  tile_rows: int = 4, k_cols: int = 384) -> CastFn:
    """Build the MXU cast.  ``k_cols`` (a multiple of 128) is the staged matmul
    width; it holds ``k_cols // max_tris`` candidate instances per tile."""
    max_tris = int(cfg.max_tris_per_mesh)
    slots = k_cols // max_tris
    n_tris_real = geom.a.shape[0]
    # pad the table so the dense sweep's last chunk stays in range
    wp = (n_tris_real + k_cols - 1) // k_cols * k_cols
    tables = build_mxu_tables(scene, geom, pad_tris=wp - n_tris_real)
    n_inst = tables.inst_f32.shape[0]
    n_chunks = wp // k_cols

    # Column-major [8, Wp] copies for the dense sweep (lane-dim chunk slices).
    tables_t = [tables.edge_a.T, tables.edge_b.T, tables.edge_c.T,
                tables.plane_num.T, tables.plane_den.T]

    tile = tile_rows * LANES
    kernel = functools.partial(
        _mxu_kernel, tile=tile, k=k_cols, n_tris=n_tris_real, n_chunks=n_chunks,
    )

    def cast(ro, rd):
        batch_shape = ro.shape[:-1]
        ro_f = ro.reshape(-1, 3)
        rd_f = rd.reshape(-1, 3)
        r = ro_f.shape[0]
        rp = (r + tile - 1) // tile * tile
        pad = rp - r
        ro_f = jnp.pad(ro_f, ((0, pad), (0, 0)))
        rd_f = jnp.pad(rd_f, ((0, pad), (0, 0)))
        pad_mask = jnp.arange(rp) >= r
        rd_f = jnp.where(pad_mask[:, None], jnp.array([0.0, 0.0, 1.0]), rd_f)

        rows = rp // LANES
        comps = [ro_f[:, 0].reshape(rows, LANES), ro_f[:, 1].reshape(rows, LANES),
                 ro_f[:, 2].reshape(rows, LANES), rd_f[:, 0].reshape(rows, LANES),
                 rd_f[:, 1].reshape(rows, LANES), rd_f[:, 2].reshape(rows, LANES)]
        cand, info = tile_candidates(comps, tile_rows, tables.inst_f32, slots)

        n_tiles = rp // tile
        # Per-tile candidate row ids [T, K]: slot s covers columns
        # [s*max_tris, (s+1)*max_tris) with the slot instance's triangle rows.
        slot_ids = jnp.arange(slots)[None, :]
        in_range = slot_ids < info[:, :1]  # [T, slots]
        cand_slots = cand[:, :slots]
        if cand_slots.shape[1] < slots:  # fewer instances than staging slots
            cand_slots = jnp.pad(
                cand_slots, ((0, 0), (0, slots - cand_slots.shape[1]))
            )
        cand_inst = jnp.clip(cand_slots, 0, max(n_inst - 1, 0))
        tri_in_slot = jnp.arange(k_cols)[None, :] // max_tris  # col -> slot
        tri_off = jnp.arange(k_cols)[None, :] % max_tris
        col_start = jnp.take_along_axis(
            tables.inst_start[cand_inst],
            jnp.broadcast_to(tri_in_slot, (n_tiles, k_cols)), axis=1,
        )
        col_live = (
            jnp.take_along_axis(
                in_range, jnp.broadcast_to(tri_in_slot, (n_tiles, k_cols)),
                axis=1)
            & (tri_off < jnp.take_along_axis(
                tables.inst_count[cand_inst],
                jnp.broadcast_to(tri_in_slot, (n_tiles, k_cols)), axis=1))
        )
        row_ids = col_start + tri_off  # [T, K] i32
        id_rows = jnp.where(col_live, row_ids.astype(jnp.float32), -1.0)
        safe_ids = jnp.clip(jnp.where(col_live, row_ids, 0), 0,
                            max(wp - 1, 0))

        # XLA-side staging: gather each table's candidate rows and lay them out
        # [T, 8, K] so each tile's block is one (8 x K) MXU operand; dead
        # columns are masked by id_rows < 0 in-kernel.
        def stage(table):  # [Wp, 8] -> [T, 8, K]
            return jnp.transpose(table[safe_ids], (0, 2, 1))

        staged = [stage(tables.edge_a), stage(tables.edge_b),
                  stage(tables.edge_c), stage(tables.plane_num),
                  stage(tables.plane_den)]
        # Mosaic block constraint: second-to-last dim divisible by 8 — carry the
        # per-tile id row as [T, 8, K] (row 0 used).
        id_rows = jnp.broadcast_to(id_rows[:, None, :], (n_tiles, 8, k_cols))

        # ray matmul vectors
        m = jnp.cross(ro_f, rd_f)
        # pluecker pairing: [d, m] . [p x q, q - p] = d.(pxq) + m.(q-p)
        rd6 = jnp.concatenate(
            [rd_f, m, jnp.zeros((rp, 2), jnp.float32)], axis=-1
        )
        rp8 = jnp.concatenate(
            [ro_f, rd_f, jnp.ones((rp, 1), jnp.float32),
             jnp.zeros((rp, 1), jnp.float32)], axis=-1
        )

        ray_spec = pl.BlockSpec((tile, 8), lambda i, *_: (i, 0),
                                memory_space=pltpu.VMEM)
        staged_spec = pl.BlockSpec((1, 8, k_cols), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
        table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((tile, 1), lambda i, *_: (i, 0),
                                memory_space=pltpu.VMEM)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[table_spec] * 5 + [staged_spec] * 6 + [ray_spec] * 2,
            out_specs=[out_spec] * 4,
        )
        t, tri_f, u, v = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((rp, 1), jnp.float32),
                jax.ShapeDtypeStruct((rp, 1), jnp.float32),
                jax.ShapeDtypeStruct((rp, 1), jnp.float32),
                jax.ShapeDtypeStruct((rp, 1), jnp.float32),
            ],
            interpret=interpret_mode(),
        )(info, *tables_t, *staged, id_rows, rd6, rp8)

        t = t.reshape(rp)[:r]
        tri = jnp.maximum(tri_f.reshape(rp)[:r], 0.0).astype(jnp.int32)
        u = u.reshape(rp)[:r]
        v = v.reshape(rp)[:r]
        return Hit(
            valid=jnp.isfinite(t).reshape(batch_shape),
            t=t.reshape(batch_shape),
            wtri=tri.reshape(batch_shape),
            uv=jnp.stack([u, v], axis=-1).reshape(batch_shape + (2,)),
        )

    return cast
