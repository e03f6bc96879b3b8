"""BVH build + stackless traversal vs brute-force closest hit.

The reference's bvh_node (hittable.h:41-140) is broken and never used; this
validates the working replacement (ops/bvh.py) against the brute-force scan
on randomized scenes, including motion blur and negative radii.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracingweekend_tpu.models.builder import SceneBuilder
from raytracingweekend_tpu.models.scenes import make_scene
from raytracingweekend_tpu.ops import bvh as bvh_mod
from raytracingweekend_tpu.ops import geometry


def _random_rays(key, n, lo=-12.0, hi=12.0):
    k1, k2 = jax.random.split(key)
    o = jax.random.uniform(k1, (n, 3), minval=lo, maxval=hi)
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.zeros((n,))
    return o, d, t


def _compare(spheres, moving, key, n=2048):
    o, d, t = _random_rays(key, n)
    bt_ref, bi_ref = geometry._hit_spheres_xla(o, d, t, 0.001, spheres,
                                               moving)
    tree = bvh_mod.build_sphere_bvh(spheres)
    bt, bi = jax.jit(
        lambda o, d, t: bvh_mod.hit_spheres_bvh(o, d, t, 0.001, spheres,
                                                tree, moving))(o, d, t)
    bt, bi = np.asarray(bt), np.asarray(bi)
    bt_ref, bi_ref = np.asarray(bt_ref), np.asarray(bi_ref)
    hit = bt_ref < 1e37
    assert (bt < 1e37).sum() == hit.sum()
    # rtol 2e-3: huge spheres (r=1000 ground) lose ~4 digits to float32
    # cancellation in |oc|^2 - r^2, and the two paths round differently.
    np.testing.assert_allclose(bt[hit], bt_ref[hit], rtol=2e-3, atol=1e-5)
    # indices may differ only at exact-tie distances; require 99.9% match
    assert (bi[hit] == bi_ref[hit]).mean() > 0.999


def test_bvh_matches_bruteforce_random_scene():
    rng = np.random.default_rng(0)
    b = SceneBuilder()
    mat = b.lambertian(b.constant((0.5, 0.5, 0.5)))
    for _ in range(300):
        c = rng.uniform(-10, 10, 3)
        b.sphere(tuple(c), float(rng.uniform(0.1, 1.0)), mat)
    b.camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 60.0, 1.0, 0.0, 1.0)
    scene = b.build()
    _compare(scene.spheres, False, jax.random.key(1))


def test_bvh_matches_bruteforce_moving_spheres():
    rng = np.random.default_rng(2)
    b = SceneBuilder()
    mat = b.lambertian(b.constant((0.5, 0.5, 0.5)))
    for _ in range(100):
        c = rng.uniform(-8, 8, 3)
        c1 = c + rng.uniform(-0.5, 0.5, 3)
        b.sphere(tuple(c), float(rng.uniform(0.2, 0.8)), mat,
                 center1=tuple(c1))
    b.camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 60.0, 1.0, 0.0, 1.0)
    scene = b.build()
    o, d, _ = _random_rays(jax.random.key(3), 2048)
    t = jax.random.uniform(jax.random.key(4), (2048,))
    bt_ref, bi_ref = geometry._hit_spheres_xla(o, d, t, 0.001, scene.spheres,
                                               True)
    tree = bvh_mod.build_sphere_bvh(scene.spheres)
    bt, bi = jax.jit(lambda o, d, t: bvh_mod.hit_spheres_bvh(
        o, d, t, 0.001, scene.spheres, tree, True))(o, d, t)
    hit = np.asarray(bt_ref) < 1e37
    np.testing.assert_allclose(np.asarray(bt)[hit], np.asarray(bt_ref)[hit],
                               rtol=2e-3, atol=1e-5)


def test_bvh_random_balls_scene():
    scene = make_scene("random_balls", 1.5)
    _compare(scene.spheres, True, jax.random.key(5), n=1024)


def test_bvh_negative_radius_hollow_sphere():
    b = SceneBuilder()
    mat = b.dielectric(1.5)
    b.sphere((0, 0, -3), 1.0, mat)
    b.sphere((0, 0, -3), -0.9, mat)  # hollow inner shell
    b.camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 60.0, 1.0, 0.0, 1.0)
    scene = b.build()
    _compare(scene.spheres, False, jax.random.key(6), n=512)


def test_bvh_structure_invariants():
    scene = make_scene("random_balls", 1.5)
    tree = bvh_mod.build_sphere_bvh(scene.spheres)
    M = tree.num_nodes()
    skip = np.asarray(tree.skip)
    count = np.asarray(tree.count)
    order = np.asarray(tree.order)
    # every active sphere appears exactly once in leaf order
    n_active = int(np.asarray(scene.spheres.active).sum())
    assert len(order) == n_active
    assert len(np.unique(order)) == n_active
    # skip links strictly increase past the node and never exceed M
    assert (skip > np.arange(M)).all()
    assert (skip <= M).all()
    # leaf sizes bounded
    assert count.max() <= bvh_mod.LEAF_SIZE
    # total leaf content = active spheres
    assert count.sum() == n_active


def test_bvh_scene_integration_renders_same():
    """build(use_bvh=True) routes closest_hit through the BVH; images must
    match the brute-force scan bitwise (same RNG keys, same estimator)."""
    from raytracingweekend_tpu.render import render
    from raytracingweekend_tpu.utils.config import RenderConfig

    rng = np.random.default_rng(9)

    def build(use_bvh):
        b = SceneBuilder()
        mat = b.lambertian(b.constant((0.6, 0.4, 0.3)))
        for _ in range(60):
            c = rng.uniform(-4, 4, 3) - (0, 0, 8)
            b.sphere(tuple(c), float(rng.uniform(0.2, 0.7)), mat)
        b.camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 60.0, 1.0, 0.0, 1.0)
        return b.build(use_bvh=use_bvh)

    rng = np.random.default_rng(9)
    s_brute = build(False)
    rng = np.random.default_rng(9)
    s_bvh = build(True)
    assert s_bvh.bvh is not None and s_brute.bvh is None

    cfg = RenderConfig(nx=16, ny=16, spp=8, max_depth=5,
                       samples_per_launch=8, seed=2, loop_mode="while")
    img_a = render(s_brute, cfg)
    img_b = render(s_bvh, cfg)
    np.testing.assert_allclose(img_a, img_b, rtol=2e-3, atol=1e-5)
