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

import jax
import jax.numpy as jnp

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
