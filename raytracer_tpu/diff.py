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
