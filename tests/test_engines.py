"""Engine consistency: every accelerated cast must match the brute-force oracle
(the framework's formalization of the reference's -r flag differential testing,
SURVEY.md §4.2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raytracer_tpu import generate
from raytracer_tpu.render import render_frame
from raytracer_tpu.render.cast import make_brute_cast, make_culled_cast
from raytracer_tpu.render.geometry import camera_rays, expand_geometry
from raytracer_tpu.scene import device_scene


@pytest.fixture(scope="module")
def world8():
    w = generate("/root/reference/world8.json")
    scene = device_scene(w.scene)
    cam = jax.tree_util.tree_map(jnp.asarray, w.camera)
    return w, scene, cam


def test_culled_cast_matches_brute(world8):
    w, scene, cam = world8
    geom = expand_geometry(scene)
    ro, rd = camera_rays(cam, 160, 120)
    ro = ro.reshape(-1, 3)
    rd = rd.reshape(-1, 3)
    brute = make_brute_cast(geom)(ro, rd)
    culled = make_culled_cast(
        geom, max_candidates=w.config.max_candidates,
        max_tris_per_mesh=w.config.max_tris_per_mesh,
    )(ro, rd)
    bv = np.asarray(brute.valid)
    cv = np.asarray(culled.valid)
    assert (bv == cv).all()
    both = bv & cv
    np.testing.assert_allclose(
        np.asarray(brute.t)[both], np.asarray(culled.t)[both], rtol=1e-5, atol=1e-5
    )
    assert (np.asarray(brute.wtri)[both] == np.asarray(culled.wtri)[both]).mean() > 0.999


@pytest.mark.slow
def test_culled_render_matches_brute(world8):
    w, scene, cam = world8
    cfg_b = w.config.replace(width=160, height=120, use_bvh=False)
    cfg_c = w.config.replace(width=160, height=120, use_bvh=True)
    rf = jax.jit(render_frame, static_argnames=("cfg",))
    img_b = np.asarray(rf(scene, cam, cfg_b))
    img_c = np.asarray(rf(scene, cam, cfg_c))
    diff = np.abs(img_b - img_c).max()
    assert diff < 1e-4, f"engines diverge by {diff}"


def test_wavefront_queue_no_drops_world1():
    from raytracer_tpu.render.engine import make_cast, radiance
    from raytracer_tpu.render.geometry import expand_geometry

    w = generate("/root/reference/world1.json")
    scene = device_scene(w.scene)
    cam = jax.tree_util.tree_map(jnp.asarray, w.camera)
    cfg = w.config.replace(width=64, height=48, use_bvh=False)
    geom = expand_geometry(scene)
    cast = make_cast(scene, geom, cfg)
    ro, rd = camera_rays(cam, 64, 48)
    _, dropped = radiance(scene, geom, cast, cfg, ro.reshape(-1, 3), rd.reshape(-1, 3))
    assert int(dropped) == 0
