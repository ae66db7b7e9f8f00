"""Pallas cast kernel vs the jnp oracle (interpret mode on CPU).

The kernel's semantics must be bit-equal to the brute-force oracle: same hits,
same times, same triangle ids, same barycentrics — for coherent primary tiles
and for incoherent (shadow/bounce-like) ray batches."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raytracer_tpu import generate
from raytracer_tpu.render.cast import make_brute_cast
from raytracer_tpu.render.geometry import camera_rays, expand_geometry
from raytracer_tpu.render import pallas_engine as pe
from raytracer_tpu.scene import device_scene


@pytest.fixture(scope="module")
def world8():
    w = generate("/root/reference/world8.json")
    scene = device_scene(w.scene)
    cam = jax.tree_util.tree_map(jnp.asarray, w.camera)
    geom = expand_geometry(scene)
    return w, scene, cam, geom


def _compare(hit_p, hit_b, scene, geom):
    """Box-fast-path contract: identical hit mask, times, and everything
    shading consumes (faceted normal, material, instance) — the reported
    triangle id is a representative of the hit FACE (either of the face's two
    coplanar triangles shades identically; documented deviation in
    pallas_engine._box_face_hit)."""
    from raytracer_tpu.render.cast import hit_shading_attrs

    vp = np.asarray(hit_p.valid)
    vb = np.asarray(hit_b.valid)
    assert (vp == vb).all()
    both = vp & vb
    np.testing.assert_allclose(
        np.asarray(hit_p.t)[both], np.asarray(hit_b.t)[both], rtol=1e-5, atol=1e-5
    )
    # same face + same instance (tri id at face granularity)
    _, _, _, face_of, _ = pe._detect_box_meshes(scene)
    face_of = np.asarray(face_of)
    wtri_tri = np.asarray(scene.wtri_tri)
    inst = np.asarray(geom.inst)
    wp = np.asarray(hit_p.wtri)[both]
    wb = np.asarray(hit_b.wtri)[both]
    assert (inst[wp] == inst[wb]).all()
    assert (face_of[wtri_tri[wp]] == face_of[wtri_tri[wb]]).all()
    # shading attributes are exact
    n_p, m_p, _ = hit_shading_attrs(geom, hit_p)
    n_b, m_b, _ = hit_shading_attrs(geom, hit_b)
    np.testing.assert_allclose(
        np.asarray(n_p)[both], np.asarray(n_b)[both], atol=1e-5
    )
    assert (np.asarray(m_p)[both] == np.asarray(m_b)[both]).all()


def test_pallas_cast_matches_oracle_coherent(world8):
    w, scene, cam, geom = world8
    ro, rd = camera_rays(cam, 128, 96)
    ro = ro.reshape(-1, 3)
    rd = rd.reshape(-1, 3)
    hit_p = pe.make_pallas_cast(scene, geom, w.config)(ro, rd)
    hit_b = make_brute_cast(geom)(ro, rd)
    assert int(np.asarray(hit_b.valid).sum()) > 0
    _compare(hit_p, hit_b, scene, geom)


def test_pallas_cast_matches_oracle_incoherent(world8):
    w, scene, cam, geom = world8
    rng = np.random.RandomState(0)
    o = jnp.asarray(rng.uniform(-5, 5, (1024, 3)).astype(np.float32))
    d = rng.randn(1024, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    hit_p = pe.make_pallas_cast(scene, geom, w.config)(o, d)
    hit_b = make_brute_cast(geom)(o, d)
    assert int(np.asarray(hit_b.valid).sum()) > 0
    _compare(hit_p, hit_b, scene, geom)


def test_mxu_cast_matches_oracle_coherent(world8):
    from raytracer_tpu.render.pallas_mxu import make_mxu_cast

    w, scene, cam, geom = world8
    ro, rd = camera_rays(cam, 128, 96)
    ro = ro.reshape(-1, 3)
    rd = rd.reshape(-1, 3)
    hit_m = make_mxu_cast(scene, geom, w.config)(ro, rd)
    hit_b = make_brute_cast(geom)(ro, rd)
    vm = np.asarray(hit_m.valid)
    vb = np.asarray(hit_b.valid)
    # Different accept formulation (pluecker sign vs area-sum): allow a tiny
    # edge-pixel disagreement budget.
    assert (vm != vb).mean() < 0.001
    both = vm & vb
    np.testing.assert_allclose(
        np.asarray(hit_m.t)[both], np.asarray(hit_b.t)[both], rtol=1e-4, atol=1e-4
    )
    assert (np.asarray(hit_m.wtri)[both] == np.asarray(hit_b.wtri)[both]).mean() > 0.999


def test_mxu_cast_matches_oracle_incoherent(world8):
    from raytracer_tpu.render.pallas_mxu import make_mxu_cast

    w, scene, cam, geom = world8
    rng = np.random.RandomState(1)
    o = jnp.asarray(rng.uniform(-5, 5, (1024, 3)).astype(np.float32))
    d = rng.randn(1024, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    hit_m = make_mxu_cast(scene, geom, w.config)(o, d)
    hit_b = make_brute_cast(geom)(o, d)
    vm = np.asarray(hit_m.valid)
    vb = np.asarray(hit_b.valid)
    assert (vm != vb).mean() < 0.005
    both = vm & vb
    np.testing.assert_allclose(
        np.asarray(hit_m.t)[both], np.asarray(hit_b.t)[both], rtol=1e-4, atol=1e-4
    )


def test_tile_candidates_conservative(world8):
    """Every instance any ray of a tile overlaps must appear in the tile's
    candidate list (or the tile must be flagged overflow)."""
    from raytracer_tpu import raymath as rm

    w, scene, cam, geom = world8
    ro, rd = camera_rays(cam, 64, 64)
    ro = ro.reshape(-1, 3)
    rd = rd.reshape(-1, 3)
    tables = pe.build_tables(scene, geom)
    comps = [ro[:, 0].reshape(-1, 128), ro[:, 1].reshape(-1, 128),
             ro[:, 2].reshape(-1, 128), rd[:, 0].reshape(-1, 128),
             rd[:, 1].reshape(-1, 128), rd[:, 2].reshape(-1, 128)]
    tile_rows = 8
    cand, info = pe.tile_candidates(comps, tile_rows, tables.inst_f32, 64)
    cand = np.asarray(cand)
    info = np.asarray(info)

    hit, _ = rm.ray_aabb(
        ro[:, None, :], rd[:, None, :], geom.aabb_min[None], geom.aabb_max[None]
    )
    hit = np.asarray(hit)  # [R, N]
    tile = tile_rows * 128
    n_tiles = hit.shape[0] // tile
    for ti in range(n_tiles):
        per_tile = hit[ti * tile : (ti + 1) * tile].any(0)
        needed = set(np.nonzero(per_tile)[0])
        if info[ti, 1]:
            continue  # overflow: kernel loops everything
        listed = set(cand[ti, : info[ti, 0]])
        assert needed <= listed, f"tile {ti} missing {needed - listed}"


def test_occlude_matches_closest_hit(world8):
    """The any-hit occlusion kernel must agree with ``valid & t <= max_t`` of
    the closest-hit cast for every max_t (the closest hit is minimal)."""
    w, scene, cam, geom = world8
    cast = pe.make_pallas_cast(scene, geom, w.config)

    ro, rd = camera_rays(cam, 64, 64)
    ro = ro.reshape(-1, 3)
    rd = rd.reshape(-1, 3)
    hit = cast(ro, rd)
    t_fin = jnp.where(hit.valid, hit.t, jnp.inf)
    for max_t in (0.5, 2.0, jnp.inf):
        want = np.asarray(hit.valid & (t_fin <= max_t))
        got = np.asarray(cast.occlude(ro, rd, jnp.float32(max_t)))
        assert (want == got).all(), f"max_t={max_t}"

    rng = np.random.RandomState(7)
    o = jnp.asarray(rng.uniform(-5, 5, (512, 3)).astype(np.float32))
    d = rng.randn(512, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    mt = jnp.asarray(rng.uniform(0.1, 10.0, (512,)).astype(np.float32))
    hit = cast(o, d)
    t_fin = jnp.where(hit.valid, hit.t, jnp.inf)
    want = np.asarray(hit.valid & (t_fin <= mt))
    got = np.asarray(cast.occlude(o, d, mt))
    assert (want == got).all()


def test_bvh_occlude_matches_closest_hit():
    """The BVH-walk occlusion kernel (shadows at scale, O(log N) per
    occluder) must agree with ``valid & t <= max_t`` of the closest-hit cast
    — on a synthetic world large enough that the walk path is the production
    choice, with random incoherent shadow-style rays."""
    from raytracer_tpu.scene import device_scene
    from raytracer_tpu.synth import make_big_world

    scene, cam, cfg = make_big_world(300)
    scene = device_scene(scene)
    cfg = cfg.replace(pallas_traversal="bvh")
    geom = expand_geometry(scene)
    cast = pe.make_pallas_cast(scene, geom, cfg)

    cam = jax.tree_util.tree_map(jnp.asarray, cam)
    ro, rd = camera_rays(cam, 64, 64)
    ro = ro.reshape(-1, 3)
    rd = rd.reshape(-1, 3)
    hit = cast(ro, rd)
    t_fin = jnp.where(hit.valid, hit.t, jnp.inf)
    for max_t in (5.0, jnp.inf):
        want = np.asarray(hit.valid & (t_fin <= max_t))
        got = np.asarray(cast.occlude(ro, rd, jnp.float32(max_t)))
        assert (want == got).all(), f"max_t={max_t}"

    rng = np.random.RandomState(11)
    o = jnp.asarray(rng.uniform(-12, 12, (1024, 3)).astype(np.float32))
    d = rng.randn(1024, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    mt = jnp.asarray(rng.uniform(0.5, 30.0, (1024,)).astype(np.float32))
    hit = cast(o, d)
    t_fin = jnp.where(hit.valid, hit.t, jnp.inf)
    want = np.asarray(hit.valid & (t_fin <= mt))
    got = np.asarray(cast.occlude(o, d, mt))
    assert (want == got).all()


def test_bvh_render_matches_cull_big_world():
    """End-to-end render of the at-scale synthetic world: the BVH traversal
    (cast + the new occlusion walk, exercised via the shadow fast path) must
    reproduce the candidate-cull image."""
    from raytracer_tpu.render.engine import render_frame
    from raytracer_tpu.scene import device_scene
    from raytracer_tpu.synth import make_big_world

    scene, cam, cfg = make_big_world(300)
    scene = device_scene(scene)
    cam = jax.tree_util.tree_map(jnp.asarray, cam)
    cfg = cfg.replace(width=96, height=72, engine="pallas",
                      pallas_kernel="scalar")
    assert not cfg.any_refractive  # shadow march uses the occlude fast path
    img_cull = np.asarray(render_frame(scene, cam,
                                       cfg.replace(pallas_traversal="cull")))
    img_bvh = np.asarray(render_frame(scene, cam,
                                      cfg.replace(pallas_traversal="bvh")))
    np.testing.assert_allclose(img_bvh, img_cull, rtol=1e-5, atol=1e-5)


def test_box_detection_world8(world8):
    """Both cube-world meshes must be detected as boxes (build_cube layout,
    scene_builder.cu:181-239); a perturbed copy must not."""
    import dataclasses

    w, scene, cam, geom = world8
    is_box, mat, face_tri, face_of, _ = pe._detect_box_meshes(scene)
    assert bool(np.asarray(is_box).all())
    # perturb one vertex off its corner -> not a box anymore
    verts = np.asarray(scene.verts).copy()
    verts[0] += 0.05
    scene2 = dataclasses.replace(scene, verts=jnp.asarray(verts))
    is_box2, _, _, _, _ = pe._detect_box_meshes(scene2)
    assert not bool(np.asarray(is_box2)[0])


def test_fused_dual_light_occlusion_matches():
    """cfg.fused_shadows merges a two-light round's shadow queries into one
    dual-query LBVH walk; frames must be bit-identical to the per-light
    occlusion path (world8: 1 point + 1 dir light, opaque)."""
    from raytracer_tpu import generate
    from raytracer_tpu.render import render_frame
    from raytracer_tpu.scene import device_scene

    w = generate("/root/reference/world8.json")
    scene = device_scene(w.scene)
    cam = jax.tree_util.tree_map(jnp.asarray, w.camera)
    cfg = w.config.replace(width=160, height=96, engine="pallas",
                           pallas_kernel="scalar", pallas_traversal="bvh")
    base = np.asarray(render_frame(
        scene, cam, cfg.replace(fused_shadows=False)))
    fused = np.asarray(render_frame(
        scene, cam, cfg.replace(fused_shadows=True)))
    np.testing.assert_array_equal(base, fused)


def test_fused_dual_light_occlusion_gradients_match():
    """The fused dual-query shadow path must also agree in REVERSE mode: the
    gradient of the mean image wrt materials + light colors + camera pose is
    identical (to f32 tolerance) whether the two shadow queries run fused
    (pallas_occlude2_detached, with its scalar jnp.inf max_t cotangent) or
    per-light.  Guards the occlude2 custom_vjp zero-cotangent rule, which a
    forward bit-identity test cannot see (ADVICE r4)."""
    from raytracer_tpu import diff
    from raytracer_tpu.scene import device_scene

    w = generate("/root/reference/world8.json")
    scene = device_scene(w.scene)
    cam = jax.tree_util.tree_map(jnp.asarray, w.camera)
    cfg = w.config.replace(width=96, height=64, engine="pallas",
                           pallas_kernel="scalar", pallas_traversal="bvh")
    params = diff.trainable_params(scene, cam)
    target = jnp.zeros((cfg.height, cfg.width, 4), jnp.float32)

    def grads_for(c):
        loss_fn = diff.make_loss_fn(scene, cam, c, target)
        return jax.jit(jax.grad(loss_fn))(params)

    g_base = grads_for(cfg.replace(fused_shadows=False))
    g_fused = grads_for(cfg.replace(fused_shadows=True))
    for leaf_b, leaf_f in zip(jax.tree_util.tree_leaves(g_base),
                              jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(leaf_b), np.asarray(leaf_f),
                                   rtol=1e-5, atol=1e-6)


def test_auto_tile_rows_by_frame_size():
    """cfg.tile_rows == 0 auto-selects the kernel tile: 48 rows up to ~1M
    rays (8192 padded kernel rows), 64 above — the round-5 sweep optima.
    Pins the 32-alignment padding in the ray-count estimate and the two
    headline frame sizes."""
    assert pe.auto_tile_rows(640, 480) == 48      # 2400 kernel rows
    assert pe.auto_tile_rows(1024, 1024) == 48    # exactly 8192 rows
    assert pe.auto_tile_rows(1920, 1080) == 64    # ~16k rows
    # padding matters: 1025x1024 pads to 1056x1024 -> 8448 rows -> 64
    assert pe.auto_tile_rows(1025, 1024) == 64
    # both autoselected values satisfy the Mosaic sublane constraint
    assert pe.auto_tile_rows(64, 64) % 8 == 0
    assert pe.auto_tile_rows(4096, 4096) % 8 == 0
