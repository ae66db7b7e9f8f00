"""Differentiable rendering: parameter pytrees, losses, and gradient steps.

The reference has no autodiff (SURVEY.md §0); this is the framework's designed-
fresh capability per BASELINE.json: per-pixel gradients flow to materials
(Kd/Ks/Kr/Kt/alpha/eta/Ke/Ka), light colors/positions/directions, the camera
pose, and vertex positions via ``jax.grad`` through the pure render function.

Scope notes (round 1):
* Gradients through *shading, attenuation, and continuous hit quantities* are
  exact autodiff.  Discrete visibility decisions (which triangle is hit, shadow
  occlusion booleans) are treated as piecewise-constant — their gradient
  contribution at silhouette edges needs edge-aware/reparameterized sampling,
  which is staged for a later round (BASELINE stages 4-5).  Finite-difference
  validation therefore targets parameters that do not move silhouettes
  (materials, light colors, ambience), where autodiff is exact.
* ``trainable_params``/``merge_params`` split a Scene into an optimizable pytree
  and the static remainder, so optimizers and checkpoints see only parameters.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from .render.engine import render_frame
from .scene import Camera, RenderConfig, Scene


PARAM_FIELDS = ("materials",)  # scene-level subtrees that are trainable
LIGHT_FIELDS = ("point_pos", "point_col", "dir_dir", "dir_col")


def trainable_params(scene: Scene, camera: Camera,
                     include_lights: bool = True,
                     include_camera: bool = True,
                     include_vertices: bool = False) -> Dict[str, Any]:
    """Extract the optimizable parameter pytree from a scene + camera."""
    params: Dict[str, Any] = {"materials": scene.materials}
    if include_lights:
        params["lights"] = scene.lights
    if include_camera:
        params["cam_pos"] = camera.pos
        params["cam_rot"] = camera.rot
    if include_vertices:
        params["verts"] = scene.verts
    return params


def merge_params(scene: Scene, camera: Camera, params: Dict[str, Any]
                 ) -> Tuple[Scene, Camera]:
    """Rebuild (scene, camera) with ``params`` substituted in."""
    scene_kw = {}
    if "materials" in params:
        scene_kw["materials"] = params["materials"]
    if "lights" in params:
        scene_kw["lights"] = params["lights"]
    if "verts" in params:
        scene_kw["verts"] = params["verts"]
    if scene_kw:
        scene = dataclasses.replace(scene, **scene_kw)
    cam_kw = {}
    if "cam_pos" in params:
        cam_kw["pos"] = params["cam_pos"]
    if "cam_rot" in params:
        cam_kw["rot"] = params["cam_rot"]
    if cam_kw:
        camera = dataclasses.replace(camera, **cam_kw)
    return scene, camera


def render_with_params(scene: Scene, camera: Camera, cfg: RenderConfig,
                       params: Dict[str, Any]):
    s, c = merge_params(scene, camera, params)
    return render_frame(s, c, cfg)


def l2_image_loss(img, target):
    return jnp.mean((img - target) ** 2)


def make_loss_fn(scene: Scene, camera: Camera, cfg: RenderConfig, target,
                 loss: Callable = l2_image_loss):
    """Returns ``loss_fn(params) -> scalar`` for use with jax.value_and_grad."""

    def loss_fn(params):
        img = render_with_params(scene, camera, cfg, params)
        return loss(img, target)

    return loss_fn


def make_spp_grad_fn(scene: Scene, camera: Camera, cfg: RenderConfig,
                     spp: int, spp_chunk: int | None = None,
                     remat: bool = True,
                     with_stats: bool = False) -> Callable:
    """Build ``step(params, target) -> (loss, grads)`` computing the EXACT
    full-image L2 gradient at ``spp`` samples per pixel.

    ``with_stats=True`` returns ``(loss, grads, {"dropped": i32})`` instead:
    the summed wavefront/kept-tile drop counter across all spp samples.
    When ``cfg.static_tile_cap`` was probe-derived at the INITIAL camera and
    the camera/geometry then move during training, occupancy can exceed the
    cap and radiance is silently deleted inside the gradient — training
    loops should assert/log ``dropped == 0`` (ADVICE r4 medium; mirrors
    render_frame_with_stats).

    ``spp_chunk=None`` (or >= spp): ONE jitted ``value_and_grad`` program —
    the spp axis is a lax.scan with per-sample rematerialization
    (render_frame), so backward memory is O(1) in spp and compute is
    2F+B per sample (the remat recompute).  This is the production path now
    that the per-sample checkpoint stages on TPU (round-4 fix: cast tables
    thread through explicit arguments, see pallas_engine.prepare_pallas_cast).

    Smaller ``spp_chunk`` bounds single-program runtime instead (long device
    programs can trip the TPU runtime watchdog): gradient accumulation runs
    as a host loop of two jitted programs — pass 1 sums chunk frames into the
    image, pass 2 pulls dL/dimage back through each chunk with ``jax.vjp``.
    Same math (same jitter grid, same per-sample clamp), same 2F+B compute.
    """
    from .render.engine import render_frame_sum, spp_jitter_grid

    if spp_chunk is None or spp_chunk >= spp:
        spp_chunk = spp
    assert spp % spp_chunk == 0
    n_chunks = spp // spp_chunk
    offs, _ = spp_jitter_grid(spp, cfg.width, cfg.height)
    cfg1 = cfg.replace(spp=1)

    def render_chunk(p, offs_c):
        s, c = merge_params(scene, camera, p)
        return render_frame_sum(s, c, cfg1, offs_c, remat=remat,
                                with_stats=True)

    if n_chunks == 1:
        @jax.jit
        def step_stats(params, target):
            def loss_fn(p):
                img_sum, stats = render_chunk(p, offs)
                img = img_sum / spp
                return l2_image_loss(img, target), stats["dropped"]

            (loss, dropped), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            return loss, grads, {"dropped": dropped}

        if with_stats:
            return step_stats

        def step(params, target):
            loss, grads, _ = step_stats(params, target)
            return loss, grads

        return step

    chunks = offs.reshape(n_chunks, spp_chunk, 2)
    fwd = jax.jit(render_chunk)

    @jax.jit
    def bwd(p, offs_c, g_img):
        _, pull = jax.vjp(lambda p_: render_chunk(p_, offs_c)[0], p)
        return pull(g_img)[0]

    def step_stats(params, target):
        acc, st = fwd(params, chunks[0])
        dropped = st["dropped"]
        for i in range(1, n_chunks):
            a, st = fwd(params, chunks[i])
            acc = acc + a
            dropped = dropped + st["dropped"]
        img = acc / spp
        loss = l2_image_loss(img, target)
        g_img = 2.0 * (img - target) / (img.size * spp)
        grads = bwd(params, chunks[0], g_img)
        for i in range(1, n_chunks):
            grads = jax.tree_util.tree_map(
                jnp.add, grads, bwd(params, chunks[i], g_img)
            )
        return loss, grads, {"dropped": dropped}

    if with_stats:
        return step_stats

    def step(params, target):
        loss, grads, _ = step_stats(params, target)
        return loss, grads

    return step


def sgd_step(params, grads, lr: float):
    return jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)


def train_step(scene: Scene, camera: Camera, cfg: RenderConfig, target,
               params, lr: float = 1e-2):
    """One differentiable-rendering optimization step (value, grads, new params).

    Pure and jittable (``cfg`` static); under a sharded target/params layout the
    gradient reduction over ray shards becomes an XLA-inserted psum."""
    loss_fn = make_loss_fn(scene, camera, cfg, target)
    value, grads = jax.value_and_grad(loss_fn)(params)
    return value, grads, sgd_step(params, grads, lr)
