"""LBVH build + traversal reachability vs direct box tests."""

import numpy as np

import jax
import jax.numpy as jnp

from raytracer_tpu import generate, raymath as rm
from raytracer_tpu.accel import build_lbvh, leaf_instances, traverse_mask_reference
from raytracer_tpu.render.geometry import camera_rays, expand_geometry
from raytracer_tpu.scene import device_scene


def test_lbvh_layout_and_root():
    w = generate("/root/reference/world8.json")
    scene = device_scene(w.scene)
    geom = expand_geometry(scene)
    bvh = build_lbvh(geom.aabb_min, geom.aabb_max)
    n = bvh.n_leaves
    assert n >= scene.inst_pos.shape[0] and (n & (n - 1)) == 0
    assert bvh.box_min.shape[0] == 2 * n - 1
    # root (last box) bounds the whole scene
    root_min = np.asarray(bvh.box_min[-1])
    root_max = np.asarray(bvh.box_max[-1])
    assert (root_min <= np.asarray(geom.aabb_min).min(0) + 1e-5).all()
    assert (root_max >= np.asarray(geom.aabb_max).max(0) - 1e-5).all()
    # ordering is a permutation of instances (padding = -1)
    order = np.asarray(bvh.ordering)
    real = order[order >= 0]
    assert sorted(real.tolist()) == list(range(scene.inst_pos.shape[0]))


def test_lbvh_traversal_reaches_all_hit_instances():
    """Every instance whose AABB a ray hits must be reachable through the tree
    (ancestor boxes contain descendants, so the chain of box hits holds)."""
    w = generate("/root/reference/world8.json")
    scene = device_scene(w.scene)
    geom = expand_geometry(scene)
    bvh = build_lbvh(geom.aabb_min, geom.aabb_max)

    cam = jax.tree_util.tree_map(jnp.asarray, w.camera)
    ro, rd = camera_rays(cam, 64, 48)
    ro = ro.reshape(-1, 3)[::7]
    rd = rd.reshape(-1, 3)[::7]

    reach = traverse_mask_reference(bvh, ro, rd)  # [R, n_leaves]
    reached = leaf_instances(bvh, reach)  # [R, n] instance ids or -1

    direct, _ = rm.ray_aabb(
        ro[:, None, :], rd[:, None, :], geom.aabb_min[None], geom.aabb_max[None]
    )
    direct = np.asarray(direct)
    reached = np.asarray(reached)
    for r in range(direct.shape[0]):
        need = set(np.nonzero(direct[r])[0].tolist())
        got = set(x for x in reached[r].tolist() if x >= 0)
        assert need <= got, f"ray {r}: missing {need - got}"
