"""Scene-construction parity tests (reference oracle: Scene/scene.h)."""
import numpy as np

from raytracingweekend_tpu.models import scene_types as st
from raytracingweekend_tpu.models.scenes import SCENES, make_scene


def test_registry_has_reference_scenes():
    for name in ("light_sample", "dielectric", "random_balls", "cornell_box"):
        assert name in SCENES


def test_dielectric_scene_contents():
    s = make_scene("dielectric", 1.0)
    assert int(s.spheres.active.sum()) == 5  # scene.h:77-86
    assert s.lights.num == 0
    assert s.background == st.BG_GRADIENT
    # hollow shell: one negative radius
    radii = np.asarray(s.spheres.radius)[np.asarray(s.spheres.active)]
    assert (radii < 0).sum() == 1
    # vfov 120 wide-angle camera (scene.h:92): |horizontal| = 2*tan(60)*10
    h = np.linalg.norm(np.asarray(s.camera.horizontal))
    np.testing.assert_allclose(h, 2 * np.tan(np.radians(60.0)) * 10.0,
                               rtol=1e-5)


def test_cornell_box_contents():
    s = make_scene("cornell_box", 1.0)
    # 5 walls + light rect + 6 tall-box faces = 12 rects; 1 glass sphere.
    assert int(s.rects.active.sum()) == 12
    assert int(s.spheres.active.sum()) == 1
    assert s.lights.num == 2  # light rect + glass sphere (scene.h:195,224)
    assert s.background == st.BG_BLACK
    assert s.has_rect_transforms
    # tall box rotate_y(15 deg) baked in
    sins = np.asarray(s.rects.sin_t)[np.asarray(s.rects.active)]
    assert np.isclose(sins.max(), np.sin(np.radians(15.0)))


def test_cornell_box_two_box_variant():
    s = make_scene("cornell_box", 1.0, glass_sphere=False)
    assert int(s.rects.active.sum()) == 18  # 6 + short box faces
    assert int(s.spheres.active.sum()) == 0
    assert s.lights.num == 1
    sins = np.asarray(s.rects.sin_t)[np.asarray(s.rects.active)]
    assert np.isclose(sins.min(), np.sin(np.radians(-18.0)))


def test_cornell_aluminum_variant():
    s = make_scene("cornell_box", 1.0, aluminum_box=True)
    mt = np.asarray(s.materials.mtype)
    assert (mt == st.MAT_METAL).any()


def test_random_balls_scene_layout():
    s = make_scene("random_balls", 1.5)
    n = int(s.spheres.active.sum())
    # ground + ~22*22 grid (minus exclusion zone) + 3 big ones
    assert 400 <= n <= 489
    assert s.has_moving_spheres
    assert s.lights.num == 0
    # deterministic: same scene twice
    s2 = make_scene("random_balls", 1.5)
    np.testing.assert_array_equal(np.asarray(s.spheres.center0),
                                  np.asarray(s2.spheres.center0))
    # moving diffuse balls move straight up by <= 0.5 (scene.h:131)
    c0 = np.asarray(s.spheres.center0)
    c1 = np.asarray(s.spheres.center1)
    act = np.asarray(s.spheres.active)
    dc = (c1 - c0)[act]
    assert np.abs(dc[:, 0]).max() == 0.0
    assert np.abs(dc[:, 2]).max() == 0.0
    assert dc[:, 1].max() <= 0.5 and dc[:, 1].min() >= 0.0
    moving_count = (dc[:, 1] > 0).sum()
    assert moving_count > 200  # ~80% of ~440 grid balls are diffuse


def test_random_balls_static_variant():
    s = make_scene("random_balls", 1.5, moving=False)
    assert not s.has_moving_spheres


def test_light_sample_scene():
    s = make_scene("light_sample", 1.0)
    assert int(s.spheres.active.sum()) == 3
    assert int(s.rects.active.sum()) == 1
    assert s.has_noise_tex
    assert s.lights.num == 0  # reference registers none (scene.h:50-59)
    # aperture 0.2 -> lens_radius 0.1 (camera.h:19)
    np.testing.assert_allclose(float(s.camera.lens_radius), 0.1, rtol=1e-6)


def test_cornell_smoke_scene():
    s = make_scene("cornell_smoke", 1.0)
    assert s.has_media
    assert int(s.media.active.sum()) == 2
    mt = np.asarray(s.materials.mtype)
    assert (mt == st.MAT_ISOTROPIC).sum() == 2


def test_sphere_table_padding_and_masks():
    s = make_scene("random_balls", 1.5)
    S = s.spheres.count()
    assert S % 256 == 0 or S <= 256
    act = np.asarray(s.spheres.active)
    assert not act[int(act.sum()):].any()


def test_earth_scene_image_texture():
    """The earth scene must decode the reference's earth.jpg through the
    native runtime (or fall back procedurally) and shade the globe with it."""
    import jax
    from raytracingweekend_tpu.render import render
    from raytracingweekend_tpu.utils.config import RenderConfig

    scene = make_scene("earth", 1.0)
    assert scene.has_image_tex
    assert scene.textures.images is not None
    img = render(scene, RenderConfig(nx=12, ny=12, spp=4, max_depth=3,
                                     samples_per_launch=4))
    assert np.isfinite(img).all()
    # globe pixels must show texture variation, not a constant color
    assert img.std() > 0.01


def test_random_balls_large_builds_with_bvh():
    s = make_scene("random_balls_large", 1.0, n=10, use_bvh=True)
    import numpy as np
    assert int(np.asarray(s.spheres.active).sum()) >= 100
    assert s.bvh is not None  # the registered scene really uses the tree
    s2 = make_scene("random_balls_large", 1.0, n=10, use_bvh=False)
    assert s2.bvh is None
