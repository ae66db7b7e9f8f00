"""Differentiable rendering: autodiff gradients vs central finite differences.

The BASELINE acceptance is "image+grad allclose vs ref" — the reference has no
gradients, so the ground truth here is numerical differentiation of our own
(image-parity-validated) renderer.  Material/light-color parameters do not move
silhouettes, so autodiff should match finite differences tightly; camera/vertex
gradients (visibility terms) are staged for the edge-sampling round."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raytracer_tpu import diff, generate
from raytracer_tpu.render.engine import render_frame
from raytracer_tpu.scene import device_scene


@pytest.fixture(scope="module")
def setup():
    from raytracer_tpu.builder import scale_camera

    w = generate("/root/reference/world1.json")
    scene = device_scene(w.scene)
    cam = scale_camera(w.camera, 64, w.config.width)  # full FOV at 64x48
    cam = jax.tree_util.tree_map(jnp.asarray, cam)
    # training path: no while_loops (reverse-mode differentiable)
    cfg = w.config.replace(width=64, height=48, use_bvh=False, early_exit=False,
                           shadow_steps=2)
    target = jnp.zeros((48, 64, 4), jnp.float32)
    return w, scene, cam, cfg, target


def test_grads_flow_and_are_finite(setup):
    w, scene, cam, cfg, target = setup
    params = diff.trainable_params(scene, cam)
    loss_fn = diff.make_loss_fn(scene, cam, cfg, target)
    value, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(value))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # Some gradient must be nonzero (the scene is visible at this resolution).
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total > 0.0


@pytest.mark.parametrize("field,idx", [
    ("kd", (1, 1)),       # green cube diffuse G
    ("ka", (1, 1)),       # ambient
    ("kt", (1, 0)),       # transmission (drives refraction attenuation)
])
def test_material_grad_matches_finite_difference(setup, field, idx):
    w, scene, cam, cfg, target = setup
    params = diff.trainable_params(scene, cam, include_lights=False,
                                   include_camera=False)
    loss_fn = diff.make_loss_fn(scene, cam, cfg, target)
    grads = jax.grad(loss_fn)(params)

    eps = 1e-3
    arr = np.asarray(getattr(params["materials"], field))

    def loss_with(v):
        p2 = jax.tree_util.tree_map(lambda x: x, params)
        a = arr.copy()
        a[idx] = v
        mats = p2["materials"]
        import dataclasses

        p2["materials"] = dataclasses.replace(mats, **{field: jnp.asarray(a)})
        return float(loss_fn(p2))

    v0 = arr[idx]
    fd = (loss_with(v0 + eps) - loss_with(v0 - eps)) / (2 * eps)
    ad = float(np.asarray(getattr(grads["materials"], field))[idx])
    assert np.isfinite(fd) and np.isfinite(ad)
    np.testing.assert_allclose(ad, fd, rtol=5e-2, atol=1e-5)


def test_train_step_reduces_loss(setup):
    w, scene, cam, cfg, _ = setup
    # target: the render with brighter diffuse; optimize toward it
    import dataclasses

    mats = scene.materials
    bright = dataclasses.replace(mats, kd=mats.kd * 1.5)
    scene_t = dataclasses.replace(scene, materials=bright)
    target = render_frame(scene_t, cam, cfg)

    params = diff.trainable_params(scene, cam, include_lights=False,
                                   include_camera=False)
    v0, grads, params = diff.train_step(scene, cam, cfg, target, params, lr=0.05)
    v1, _, params = diff.train_step(scene, cam, cfg, target, params, lr=0.05)
    assert float(v1) < float(v0)
