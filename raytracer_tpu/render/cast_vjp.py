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
    """Wrap a cast so its outputs are treated as constants by autodiff."""

    @jax.custom_vjp
    def cast(ro, rd):
        return cast_fn(ro, rd)

    def fwd(ro, rd):
        # Residuals hold only shape/dtype information; the zeros_like in bwd
        # lets XLA drop the stored values entirely.
        return cast_fn(ro, rd), (ro, rd)

    def bwd(res, _g):
        ro, rd = res
        return jnp.zeros_like(ro), jnp.zeros_like(rd)

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
