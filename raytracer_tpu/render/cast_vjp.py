"""Differentiation rule for Pallas casts.

A closest-hit query is piecewise-constant in its inputs almost everywhere: the
*identity* of the hit triangle only changes at visibility discontinuities, and
the continuous quantities (t, uv) are consumed downstream through gathered
per-triangle attributes that carry their own gradients.  Wrapping a Pallas cast
in this rule declares its outputs locally constant (zero cotangent), which:

* lets ``jax.grad`` flow through renders that use the TPU kernels — gradients
  to materials, lights, ambience, and shading normals are exact (they enter via
  gathers and shading math outside the kernel);
* drops the dt/d(origin) terms that the pure-jnp cast would propagate (exact
  camera/vertex gradients need those plus edge terms — use the jnp engine or a
  later edge-sampling round for geometry optimization).

This mirrors the standard "detached visibility" differentiable-rendering
baseline."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .cast import CastFn


def detach_visibility(cast_fn: CastFn) -> CastFn:
    """Wrap a cast in the detached-visibility differentiation rule.

    Discrete outputs (hit id, material, validity) stay constants, but the hit
    TIME gets its true local derivative: on the hit plane with unit normal n,
    ``t(o, d) = n.(a - o) / n.d``, so

        dt/do = -n / (n.d)        dt/dd = -t n / (n.d)

    which the backward applies analytically from the (already computed) hit
    normal — no differentiation through the kernel.  This carries camera-pose
    and hit-position gradients through Pallas renders exactly wherever the
    hit plane is locally smooth (for faceted box meshes the shading normal IS
    the plane normal); uv cotangents remain detached (they feed normal
    interpolation, which is constant on faceted meshes — use the jnp engine
    for smooth-mesh uv terms)."""

    @jax.custom_vjp
    def cast(ro, rd):
        return cast_fn(ro, rd)

    def fwd(ro, rd):
        hit = cast_fn(ro, rd)
        # Residuals: only what the analytic t-VJP needs.
        n = hit.normal if hit.normal is not None else jnp.zeros_like(ro)
        return hit, (rd, hit.valid, jnp.where(hit.valid, hit.t, 0.0), n)

    def bwd(res, g):
        rd, valid, t, n = res
        g_t = getattr(g, "t", None)
        if g_t is None:
            return jnp.zeros((0, 3)), jnp.zeros((0, 3))  # unreachable
        nd = jnp.sum(n * rd, axis=-1)
        ok = valid & (jnp.abs(nd) >= 1e-5)
        inv = jnp.where(ok, 1.0 / jnp.where(ok, nd, 1.0), 0.0)
        scale = jnp.where(ok, g_t, 0.0) * inv
        go = -scale[..., None] * n
        gd = -(scale * t)[..., None] * n
        return go, gd

    cast.defvjp(fwd, bwd)
    return cast


def reparam_cast(cast_fn: CastFn, geom):
    """Full local-derivative rule for Pallas casts (the vertex-gradient
    configuration, BASELINE stage 5).

    The hit *identity* (wtri, validity, material) stays frozen — exactly the
    detached-visibility convention — but every continuous output gets its
    exact local derivative with respect to the ray AND the hit triangle's
    geometry:

        t(o, d, a, b, c)          plane-hit time,  n = (b-a) x (c-a)
        u, v (o, d, a, b, c)      signed barycentrics of p = o + t d
        normal(u, v, na, nb, nc)  normalized vertex-normal blend

    The backward pass re-derives these in closed form at the hit (a few
    elementwise ops on gathered [R,3] rows — no differentiation through the
    kernel) and pulls the cotangents back with ``jax.vjp`` of the
    reconstruction, so the derivative is *definitionally consistent* with the
    jnp oracle cast's autodiff wherever the hit is locally smooth.  Vertex
    cotangents scatter-add back into the [W,3] world-triangle arrays, which
    the caller passes explicitly (they are traced values derived from
    ``scene.verts`` via expand_geometry, so ``jax.grad`` reaches vertex
    positions through the production engine).

    Returns a CastFn-shaped closure over ``geom``'s triangle arrays."""
    from .. import raymath as _rm

    rm_normalize = _rm.normalize
    THRESH = _rm.THRESHOLD
    W = geom.a.shape[0]
    has_normals = geom.na is not None

    def _recon(ro, rd, va, vb, vc, na, nb, nc):
        """Closed-form (t, uv, normal) of the plane hit — all inputs [R,3]."""
        n = jnp.cross(vb - va, vc - va)
        nd = jnp.sum(n * rd, axis=-1)
        denom = jnp.where(jnp.abs(nd) > 0, nd, 1.0)
        t = jnp.sum(n * (va - ro), axis=-1) / denom
        p = ro + t[..., None] * rd
        nn2 = jnp.maximum(jnp.sum(n * n, axis=-1), 1e-30)
        u = jnp.sum(jnp.cross(p - va, vc - va) * n, axis=-1) / nn2
        v = jnp.sum(jnp.cross(vb - va, p - va) * n, axis=-1) / nn2
        uv = jnp.stack([u, v], axis=-1)
        sn = (1.0 - u - v)[..., None] * na + u[..., None] * nb \
            + v[..., None] * nc
        return t, uv, rm_normalize(sn)

    @jax.custom_vjp
    def cast(ro, rd, a, b, c, na, nb, nc):
        return cast_fn(ro, rd)

    def fwd(ro, rd, a, b, c, na, nb, nc):
        hit = cast_fn(ro, rd)
        w = hit.wtri
        res = (ro, rd, hit.valid, w, a[w], b[w], c[w],
               na[w] if has_normals else jnp.zeros_like(a[w]),
               nb[w] if has_normals else jnp.zeros_like(a[w]),
               nc[w] if has_normals else jnp.zeros_like(a[w]))
        return hit, res

    def bwd(res, g):
        ro, rd, valid, w, va, vb, vc, na, nb, nc = res
        # Guard lanes where the reconstruction is singular (miss, grazing
        # plane, degenerate triangle): sanitize their inputs to a benign
        # unit-triangle hit so the vjp trace stays NaN-free, and zero their
        # cotangents so they contribute nothing.
        n = jnp.cross(vb - va, vc - va)
        nd = jnp.sum(n * rd, axis=-1)
        nn2 = jnp.sum(n * n, axis=-1)
        ok = valid & (jnp.abs(nd) >= THRESH) & (nn2 > 1e-20)
        okv = ok[..., None]
        ro_s = jnp.where(okv, ro, jnp.array([0.0, 0.0, -1.0]))
        rd_s = jnp.where(okv, rd, jnp.array([0.0, 0.0, 1.0]))
        va_s = jnp.where(okv, va, jnp.array([-1.0, -1.0, 0.0]))
        vb_s = jnp.where(okv, vb, jnp.array([3.0, -1.0, 0.0]))
        vc_s = jnp.where(okv, vc, jnp.array([-1.0, 3.0, 0.0]))
        z_up = jnp.array([0.0, 0.0, 1.0])
        na_s = jnp.where(okv, na, z_up)
        nb_s = jnp.where(okv, nb, z_up)
        nc_s = jnp.where(okv, nc, z_up)

        def _cot(x, shape):
            if x is None or getattr(x, "dtype", None) is None \
                    or x.dtype == jax.dtypes.float0:
                return jnp.zeros(shape, jnp.float32)
            return x

        g_t = jnp.where(ok, _cot(getattr(g, "t", None), ok.shape), 0.0)
        g_uv = jnp.where(okv, _cot(getattr(g, "uv", None),
                                   ok.shape + (2,)), 0.0)
        g_n = jnp.where(okv, _cot(getattr(g, "normal", None),
                                  ok.shape + (3,)), 0.0)

        _, pull = jax.vjp(_recon, ro_s, rd_s, va_s, vb_s, vc_s,
                          na_s, nb_s, nc_s)
        d_ro, d_rd, d_va, d_vb, d_vc, d_na, d_nb, d_nc = pull(
            (g_t, g_uv, g_n)
        )

        def scat(dv):
            return jnp.zeros((W, 3), jnp.float32).at[w].add(
                jnp.where(okv, dv, 0.0)
            )

        return (d_ro, d_rd, scat(d_va), scat(d_vb), scat(d_vc),
                scat(d_na), scat(d_nb), scat(d_nc))

    cast.defvjp(fwd, bwd)

    def bound(ro, rd):
        return cast(ro, rd, geom.a, geom.b, geom.c,
                    geom.na, geom.nb, geom.nc)

    return bound


# ---------------------------------------------------------------------------
# Module-level (closure-free) custom_vjp rules for the production Pallas cast.
#
# The wrappers above create a NEW jax.custom_vjp object per make_cast call,
# closing over the kernel and its tables.  Under ``jax.checkpoint`` of the
# per-sample render body (the heavy-spp production path), those per-trace
# closures leak tracers across the remat re-trace (UnexpectedTracerError /
# "No constant handler for DynamicJaxprTracer" — the round-3 blocker).  The
# functions below are defined ONCE at module scope; everything traced (rays,
# the prepare_pallas_cast aux pytree, geometry arrays) enters as explicit
# custom_vjp arguments, and the static RenderConfig rides nondiff_argnums.
# ---------------------------------------------------------------------------


def _zeros_cot(tree):
    """Zero cotangents for an arbitrary pytree (float0 for int/bool leaves,
    as custom_vjp requires for non-differentiable dtypes)."""

    def z(x):
        if x is None:
            return None
        dt = jnp.asarray(x).dtype
        if jnp.issubdtype(dt, jnp.floating) or jnp.issubdtype(
                dt, jnp.complexfloating):
            return jnp.zeros_like(x)
        return np.zeros(jnp.shape(x), jax.dtypes.float0)

    return jax.tree_util.tree_map(z, tree)


def _meta_of(tree):
    """Shape/dtype-only skeleton of a pytree — residual metadata for
    backward rules that emit pure-zero cotangents.  Saving the arrays
    themselves would keep frame-sized ray batches and the whole scene-table/
    LBVH pytree alive as residuals for no purpose (ADVICE r4)."""
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        tree)


def _zeros_from_meta(meta):
    """Zero cotangents from a ``_meta_of`` skeleton (float0 for int/bool)."""

    def z(s):
        if jnp.issubdtype(s.dtype, jnp.floating) or jnp.issubdtype(
                s.dtype, jnp.complexfloating):
            return jnp.zeros(s.shape, s.dtype)
        return np.zeros(s.shape, jax.dtypes.float0)

    return jax.tree_util.tree_map(z, meta)


def _pallas_chunked_cast(cfg, ro, rd, aux):
    from .cast import _chunked_over_rays
    from .pallas_engine import make_pallas_cast

    inner = make_pallas_cast(None, None, cfg, aux=aux)
    return _chunked_over_rays(cfg.pallas_ray_chunk, pad_origin=1.0e30)(
        inner)(ro, rd)


def _pallas_chunked_occlude(cfg, ro, rd, max_t, aux):
    from .cast import _chunked_over_rays
    from .pallas_engine import make_pallas_cast

    inner = make_pallas_cast(None, None, cfg, aux=aux)
    return _chunked_over_rays(cfg.pallas_ray_chunk, pad_origin=1.0e30)(
        inner.occlude)(ro, rd, max_t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def pallas_cast_detached(cfg, ro, rd, aux):
    """Pallas closest-hit cast under the detached-visibility rule with the
    analytic t-VJP (see ``detach_visibility`` for the math)."""
    return _pallas_chunked_cast(cfg, ro, rd, aux)


def _detached_fwd(cfg, ro, rd, aux):
    hit = _pallas_chunked_cast(cfg, ro, rd, aux)
    n = hit.normal if hit.normal is not None else jnp.zeros_like(ro)
    return hit, (rd, hit.valid, jnp.where(hit.valid, hit.t, 0.0), n, aux)


def _detached_bwd(cfg, res, g):
    rd, valid, t, n, aux = res
    g_t = getattr(g, "t", None)
    if g_t is None:  # pragma: no cover — Hit always carries t
        return jnp.zeros_like(rd), jnp.zeros_like(rd), _zeros_cot(aux)
    nd = jnp.sum(n * rd, axis=-1)
    ok = valid & (jnp.abs(nd) >= 1e-5)
    inv = jnp.where(ok, 1.0 / jnp.where(ok, nd, 1.0), 0.0)
    scale = jnp.where(ok, g_t, 0.0) * inv
    go = -scale[..., None] * n
    gd = -(scale * t)[..., None] * n
    return go, gd, _zeros_cot(aux)


pallas_cast_detached.defvjp(_detached_fwd, _detached_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def pallas_occlude_detached(cfg, ro, rd, max_t, aux):
    """Any-hit occlusion query as an autodiff constant (piecewise-constant
    boolean; see ``detach_occlusion``)."""
    return _pallas_chunked_occlude(cfg, ro, rd, max_t, aux)


def _occlude_fwd(cfg, ro, rd, max_t, aux):
    return (_pallas_chunked_occlude(cfg, ro, rd, max_t, aux),
            _meta_of((ro, rd, max_t, aux)))


def _occlude_bwd(cfg, res, _g):
    return _zeros_from_meta(res)


pallas_occlude_detached.defvjp(_occlude_fwd, _occlude_bwd)


def _recon_plane_hit(ro, rd, va, vb, vc, na, nb, nc):
    """Closed-form (t, uv, normal) of the plane hit — all inputs [R,3].
    Shared by the reparam rule's backward (see ``reparam_cast``)."""
    from .. import raymath as _rm

    n = jnp.cross(vb - va, vc - va)
    nd = jnp.sum(n * rd, axis=-1)
    denom = jnp.where(jnp.abs(nd) > 0, nd, 1.0)
    t = jnp.sum(n * (va - ro), axis=-1) / denom
    p = ro + t[..., None] * rd
    nn2 = jnp.maximum(jnp.sum(n * n, axis=-1), 1e-30)
    u = jnp.sum(jnp.cross(p - va, vc - va) * n, axis=-1) / nn2
    v = jnp.sum(jnp.cross(vb - va, p - va) * n, axis=-1) / nn2
    uv = jnp.stack([u, v], axis=-1)
    sn = (1.0 - u - v)[..., None] * na + u[..., None] * nb + v[..., None] * nc
    return t, uv, _rm.normalize(sn)


def _pallas_chunked_occlude2(cfg, o1, d1, mt1, o2, d2, mt2, aux):
    """Fused dual shadow query, chunked over rays; falls back to two
    independent queries when the traversal has no fused kernel (cull)."""
    from .pallas_engine import make_pallas_cast

    inner = make_pallas_cast(None, None, cfg, aux=aux)
    f = getattr(inner, "occlude2", None)
    if f is None:
        occ = _pallas_chunked_occlude
        return (occ(cfg, o1, d1, mt1, aux), occ(cfg, o2, d2, mt2, aux))

    batch_shape = o1.shape[:-1]

    def flat(x):
        return x.reshape(-1, 3)

    o1f, d1f, o2f, d2f = flat(o1), flat(d1), flat(o2), flat(d2)
    m1f = jnp.broadcast_to(mt1, batch_shape).reshape(-1)
    m2f = jnp.broadcast_to(mt2, batch_shape).reshape(-1)
    R = o1f.shape[0]
    chunk = min(cfg.pallas_ray_chunk, R) if R else 1
    Rp = -(-max(R, 1) // chunk) * chunk
    pad = Rp - R
    pad_mask = jnp.arange(Rp) >= R

    def pado(x):  # origins park at 1e30 (ghost rays, see _chunked_over_rays)
        return jnp.pad(x, ((0, pad), (0, 0)), constant_values=1.0e30)

    def padd(x):
        x = jnp.pad(x, ((0, pad), (0, 0)))
        return jnp.where(pad_mask[:, None], jnp.array([0.0, 0.0, 1.0]), x)

    o1f, d1f = pado(o1f), padd(d1f)
    o2f, d2f = pado(o2f), padd(d2f)
    m1f = jnp.pad(m1f, (0, pad))
    m2f = jnp.pad(m2f, (0, pad))
    n = Rp // chunk
    if n == 1:
        b1, b2 = f(o1f, d1f, m1f, o2f, d2f, m2f)
    else:
        def one(args):
            return f(*args)

        b1, b2 = jax.lax.map(
            one, tuple(x.reshape((n, chunk) + x.shape[1:])
                       for x in (o1f, d1f, m1f, o2f, d2f, m2f)))
        b1 = b1.reshape(Rp)
        b2 = b2.reshape(Rp)
    return (b1[:R].reshape(batch_shape), b2[:R].reshape(batch_shape))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def pallas_occlude2_detached(cfg, o1, d1, mt1, o2, d2, mt2, aux):
    """Fused dual any-hit query as an autodiff constant."""
    return _pallas_chunked_occlude2(cfg, o1, d1, mt1, o2, d2, mt2, aux)


def _occlude2_fwd(cfg, o1, d1, mt1, o2, d2, mt2, aux):
    out = _pallas_chunked_occlude2(cfg, o1, d1, mt1, o2, d2, mt2, aux)
    return out, _meta_of((o1, d1, mt1, o2, d2, mt2, aux))


def _occlude2_bwd(cfg, res, _g):
    return _zeros_from_meta(res)


pallas_occlude2_detached.defvjp(_occlude2_fwd, _occlude2_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def pallas_cast_reparam(cfg, ro, rd, aux, geo):
    """Pallas cast with the full analytic (t, uv, normal)-VJP including
    cotangents back to the triangle arrays (the vertex-gradient
    configuration; see ``reparam_cast`` for the math).

    ``geo`` is the PACKED per-world-triangle geometry matrix [W, 18]
    (columns a | b | c | na | nb | nc, built by ``pack_reparam_geo``): one
    matrix means the fwd pays ONE [R]-row gather and the bwd ONE [W]-row
    scatter-add instead of six of each — XLA row scatters cost ~5.5 us/1k
    rows on v5e, so the 6-array formulation dominated the vertex-gradient
    benches."""
    return _pallas_chunked_cast(cfg, ro, rd, aux)


def pack_reparam_geo(geom):
    """[W, 18] packed (a, b, c, na, nb, nc) for pallas_cast_reparam; a plain
    differentiable concat, so cotangents flow back to the geom arrays."""
    zeros = jnp.zeros_like(geom.a)
    return jnp.concatenate(
        [geom.a, geom.b, geom.c,
         geom.na if geom.na is not None else zeros,
         geom.nb if geom.nb is not None else zeros,
         geom.nc if geom.nc is not None else zeros], axis=1)


def _reparam_fwd(cfg, ro, rd, aux, geo):
    hit = _pallas_chunked_cast(cfg, ro, rd, aux)
    res = (ro, rd, hit.valid, hit.wtri, geo[hit.wtri], aux,
           jnp.zeros_like(geo))  # [W,18] zeros template for the scatter
    return hit, res


def _reparam_bwd(cfg, res, g):
    from .. import raymath as _rm

    ro, rd, valid, w, rows, aux, geo_template = res
    va, vb, vc = rows[..., 0:3], rows[..., 3:6], rows[..., 6:9]
    na, nb, nc = rows[..., 9:12], rows[..., 12:15], rows[..., 15:18]
    n = jnp.cross(vb - va, vc - va)
    nd = jnp.sum(n * rd, axis=-1)
    nn2 = jnp.sum(n * n, axis=-1)
    ok = valid & (jnp.abs(nd) >= _rm.THRESHOLD) & (nn2 > 1e-20)
    okv = ok[..., None]
    ro_s = jnp.where(okv, ro, jnp.array([0.0, 0.0, -1.0]))
    rd_s = jnp.where(okv, rd, jnp.array([0.0, 0.0, 1.0]))
    va_s = jnp.where(okv, va, jnp.array([-1.0, -1.0, 0.0]))
    vb_s = jnp.where(okv, vb, jnp.array([3.0, -1.0, 0.0]))
    vc_s = jnp.where(okv, vc, jnp.array([-1.0, 3.0, 0.0]))
    z_up = jnp.array([0.0, 0.0, 1.0])
    na_s = jnp.where(okv, na, z_up)
    nb_s = jnp.where(okv, nb, z_up)
    nc_s = jnp.where(okv, nc, z_up)

    def _cot(x, shape):
        if x is None or getattr(x, "dtype", None) is None \
                or x.dtype == jax.dtypes.float0:
            return jnp.zeros(shape, jnp.float32)
        return x

    g_t = jnp.where(ok, _cot(getattr(g, "t", None), ok.shape), 0.0)
    g_uv = jnp.where(okv, _cot(getattr(g, "uv", None), ok.shape + (2,)), 0.0)
    g_n = jnp.where(okv, _cot(getattr(g, "normal", None),
                              ok.shape + (3,)), 0.0)

    _, pull = jax.vjp(_recon_plane_hit, ro_s, rd_s, va_s, vb_s, vc_s,
                      na_s, nb_s, nc_s)
    d_ro, d_rd, d_va, d_vb, d_vc, d_na, d_nb, d_nc = pull((g_t, g_uv, g_n))

    d_rows = jnp.where(
        okv, jnp.concatenate([d_va, d_vb, d_vc, d_na, d_nb, d_nc], -1), 0.0
    )
    d_geo = geo_template.at[w].add(d_rows)  # ONE [W,18] scatter-add
    return d_ro, d_rd, _zeros_cot(aux), d_geo


pallas_cast_reparam.defvjp(_reparam_fwd, _reparam_bwd)


def detach_occlusion(occl_fn):
    """Wrap an any-hit query so autodiff treats its boolean as a constant
    (occlusion is piecewise-constant anyway; without the wrapper, jvp tracing
    still *visits* the pallas_call, which has no jvp rule)."""

    @jax.custom_vjp
    def occl(ro, rd, max_t):
        return occl_fn(ro, rd, max_t)

    def fwd(ro, rd, max_t):
        return occl_fn(ro, rd, max_t), (ro, rd, max_t)

    def bwd(res, _g):
        ro, rd, max_t = res
        return (jnp.zeros_like(ro), jnp.zeros_like(rd),
                jnp.zeros_like(max_t))

    occl.defvjp(fwd, bwd)
    return occl
