"""Differentiable-megakernel tests: tape+replay parity and FD gradients.

The gradient story of BASELINE.md (pixel gradients allclose vs finite
differences) at megakernel speed: ops/mega_grad.py records a per-bounce
winner tape in the Pallas kernel and differentiates a pure-XLA replay.
Finite differences here go through the KERNEL forward (re-taped at the
perturbed parameters, same key), so these tests certify the gradient of
the production path itself — not of a stand-in integrator.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracingweekend_tpu.models.scenes import make_scene
from raytracingweekend_tpu.ops import mega_grad as mg


def _loss(img):
    return jnp.mean(img ** 2)


def _kernel_loss(scene, ctx, key):
    c2 = mg._retabbed(ctx, scene)
    img, _, _ = mg.tape_forward(key, c2, interpret=True)
    return float(_loss(img))


@pytest.mark.parametrize("name", ["random_balls", "cornell_box",
                                  "cornell_smoke"])
def test_replay_matches_kernel(name):
    """The XLA replay reproduces the tape-mode kernel's image to float
    round-off (same counter RNG, same decisions, same masked math)."""
    scene = make_scene(name, 1.0)
    ctx = mg.plan_tape(scene, 16, 16, 4, max_depth=5, T=256)
    img, tape, seed = mg.tape_forward(jax.random.key(3), ctx,
                                      interpret=True)
    replay = mg.make_replay(ctx)
    img2 = replay(scene, tape, seed)
    # Round-off, not decision flips: the replay mirrors the kernel's
    # sign-flipped fma quadratic and rsqrt root (shared rounding on the
    # same backend), but hit points / scattered directions accumulate
    # ~1-ulp divergence per bounce through the rest of the shading chain,
    # and 5 bounces compound it (measured max 4.2e-4 rel on ONE pixel of
    # 256; a flipped discrete decision would show as an O(1) diff).
    np.testing.assert_allclose(np.asarray(img), np.asarray(img2),
                               rtol=1e-3, atol=5e-5)


def test_replay_perlin_multi_tile():
    """Perlin-noise replay parity at n_tiles > 1 (ADVICE r3 high): the
    noise helpers' two-level lookup one-hots are shaped for (1, T) rows,
    so multi-tile coordinates must be flattened into the lane axis —
    unflattened they crash for most n_tiles and silently mis-broadcast at
    exactly n_tiles == 16."""
    scene = make_scene("two_perlin_spheres", 1.0)
    ctx = mg.plan_tape(scene, 32, 32, 2, max_depth=4, T=512)
    assert ctx["n_tiles"] >= 2
    img, tape, seed = mg.tape_forward(jax.random.key(7), ctx,
                                      interpret=True)
    replay = mg.make_replay(ctx)
    img2 = replay(scene, tape, seed)
    # Looser than the other parity tests: marble is sin(scale*z +
    # 10*turb(p)), so the ~1-ulp hit-point divergence between kernel and
    # replay roots is amplified ~10x through the 7-octave turbulence
    # (measured identically at n_tiles == 1; the flattened noise call is
    # bitwise equal to per-tile evaluation). Mean error stays at float
    # noise.
    a, b = np.asarray(img), np.asarray(img2)
    np.testing.assert_allclose(a, b, rtol=0.1, atol=4e-3)
    assert np.abs(a - b).mean() < 1e-4


def _fd_check(scene, ctx, key, get_p, set_p, picks, eps, rtol, atol):
    img0, tape, seed = mg.tape_forward(key, ctx, interpret=True)
    replay = mg.make_replay(ctx)

    def loss_p(p):
        return _loss(replay(set_p(scene, p), tape, seed))

    g = jax.grad(loss_p)(get_p(scene))
    p0 = np.asarray(get_p(scene))
    fd_list, an_list = [], []
    for idx in picks:
        pp = p0.copy()
        pp[idx] += eps
        pm = p0.copy()
        pm[idx] -= eps
        fd = (_kernel_loss(set_p(scene, jnp.asarray(pp)), ctx, key)
              - _kernel_loss(set_p(scene, jnp.asarray(pm)), ctx, key)
              ) / (2 * eps)
        fd_list.append(fd)
        an_list.append(float(np.asarray(g)[idx]))
    np.testing.assert_allclose(fd_list, an_list, rtol=rtol, atol=atol)
    return g


def test_fd_texture_colors_cornell():
    """Texture-color pixel gradients through the mega forward FD-validate
    on the flagship Cornell box (rects + MIS lights + glass sphere)."""
    scene = make_scene("cornell_box", 1.0)
    ctx = mg.plan_tape(scene, 16, 16, 4, max_depth=5, T=256)
    g = _fd_check(
        scene, ctx, jax.random.key(3),
        lambda sc: sc.textures.color,
        lambda sc, p: sc.replace(textures=sc.textures.replace(color=p)),
        picks=[(1, 0), (1, 1), (3, 2), (0, 0)],
        eps=1e-3, rtol=2e-3, atol=1e-6)
    assert float(jnp.sum(jnp.abs(g))) > 0.0


def _mis_fd_scene():
    """Constant-lambertian sphere + rect light + black background: strong,
    SMOOTH center gradients through the one-sample MIS machinery (cosine
    pdf mixed with hittable_pdf light probes). The cornell glass ball's
    center gradient is below the f32 FD noise floor and the perlin scenes
    oscillate; this scene was scanned for a seed/eps where no silhouette
    winner flips and FD matches to <1% on all three axes."""
    from raytracingweekend_tpu.models import scene_types as st
    from raytracingweekend_tpu.models.builder import SceneBuilder

    b = SceneBuilder()
    red = b.lambertian(b.constant((0.8, 0.2, 0.2)))
    lightm = b.diffuse_light(b.constant((4.0, 4.0, 4.0)))
    b.sphere((0.0, 0.0, 0.0), 1.0, red)
    h = b.rect("xz", -1.0, 1.0, -1.0, 1.0, 2.5, lightm)
    b.add_light(h)
    b.camera((0, 1, 6), (0, 0, 0), (0, 1, 0), 30.0, 1.0, 0.0, 6.0,
             0.0, 1.0)
    return b.build(background=st.BG_BLACK, name="fd_mis")


def test_fd_sphere_center_through_mis():
    """Scene-level sphere-CENTER gradient through the lights-MIS path:
    BASELINE.md's inverse-geometry config, FD-checked end to end at 16x16
    through the mega forward (VERDICT r2 #7)."""
    scene = _mis_fd_scene()
    ctx = mg.plan_tape(scene, 16, 16, 6, max_depth=5, T=256)
    _fd_check(
        scene, ctx, jax.random.key(5),
        lambda sc: sc.spheres.center0,
        lambda sc, p: sc.replace(spheres=sc.spheres.replace(
            center0=p, center1=p)),
        picks=[(0, 0), (0, 1), (0, 2)],
        eps=5e-4, rtol=3e-2, atol=1e-7)


def test_fd_ior_scene_level():
    """Scene-level dielectric IOR gradient: FD through the full mega
    forward on the book-1 glass trio (VERDICT r2 #7's missing check —
    the shade-level Snell/Schlick test in test_grad.py pins the branch;
    this one drives the whole integrator)."""
    scene = make_scene("dielectric", 2.0)
    ctx = mg.plan_tape(scene, 24, 12, 6, max_depth=6, T=256)
    _fd_check(
        scene, ctx, jax.random.key(11),
        lambda sc: sc.materials.ref_idx,
        lambda sc, p: sc.replace(materials=sc.materials.replace(ref_idx=p)),
        picks=[(2,)],
        eps=2e-3, rtol=5e-2, atol=1e-7)


def test_fd_radius_and_fuzz():
    """Radius and metal-fuzz gradients through the mega forward on the
    book-1 trio — the remaining BASELINE.md inverse-rendering axes.

    Radius moves silhouettes: a perturbation that flips any lane's taped
    winner adds a visibility boundary term the detached-decision gradient
    (by design, SURVEY.md §7 step 7) does not model, so eps is small
    enough that this seed flips nothing (seed/eps scanned; the same
    semantics grad.render_diff's FD tests rely on). Fuzz changes no
    visibility, so its eps can be coarser."""
    scene = make_scene("dielectric", 2.0)
    ctx = mg.plan_tape(scene, 24, 12, 4, max_depth=5, T=256)
    _fd_check(
        scene, ctx, jax.random.key(2),
        lambda sc: sc.spheres.radius,
        lambda sc, p: sc.replace(spheres=sc.spheres.replace(radius=p)),
        picks=[(1,)],
        eps=1e-4, rtol=8e-2, atol=1e-7)
    _fd_check(
        scene, ctx, jax.random.key(2),
        lambda sc: sc.materials.fuzz,
        lambda sc, p: sc.replace(materials=sc.materials.replace(fuzz=p)),
        picks=[(3,)],
        eps=2e-3, rtol=5e-2, atol=1e-7)


def test_fd_camera_origin():
    """Camera-vector gradient (mega_grad.py docstring axis 1): FD through
    the kernel forward w.r.t. the camera ORIGIN on the smooth MIS scene.
    Moving the origin shifts EVERY primary ray, so most seeds flip a
    silhouette winner somewhere (visibility terms are out of scope by the
    detached-decision design); seed/eps scanned for a flip-free pair."""
    scene = _mis_fd_scene()
    ctx = mg.plan_tape(scene, 16, 16, 6, max_depth=5, T=256)
    _fd_check(
        scene, ctx, jax.random.key(13),
        lambda sc: sc.camera.origin,
        lambda sc, p: sc.replace(camera=sc.camera.replace(origin=p)),
        picks=[(0,), (1,), (2,)],
        eps=3e-3, rtol=3e-2, atol=1e-7)


def _rho_fd_scene():
    """Marble-textured isotropic medium + ground sphere + gradient sky:
    the density FD scene. With a CONSTANT-albedo medium (cornell_smoke),
    radiance is albedo^k * background(final dir) — independent of the
    scatter positions given the taped decisions — so the analytic rho
    gradient is ~0 and FD sees pure winner-flip noise. A noise texture
    couples rho to radiance smoothly: t_m = m_in - log(U)/rho moves the
    scatter point, which moves the marble albedo."""
    from raytracingweekend_tpu.models import scene_types as st
    from raytracingweekend_tpu.models.builder import SceneBuilder

    b = SceneBuilder()
    iso = b.isotropic(b.noise(scale=2.0, mode=st.NOISE_MARBLE))
    b.constant_medium_sphere((0.0, 0.0, 0.0), 1.5, 1.2, iso)
    ground = b.lambertian(b.constant((0.4, 0.5, 0.6)))
    b.sphere((0.0, -101.5, 0.0), 100.0, ground)
    b.camera((0, 0.5, 6), (0, 0, 0), (0, 1, 0), 30.0, 1.0, 0.0, 6.0,
             0.0, 1.0)
    return b.build(background=st.BG_GRADIENT, name="fd_rho")


def test_fd_medium_density():
    """Medium-density gradient (docstring axis 2): the replay's scatter
    distance is m_in - log(U)/rho with the taped winner frozen, so
    d(loss)/d(rho) is smooth between winner flips (seed/eps scanned)."""
    scene = _rho_fd_scene()
    ctx = mg.plan_tape(scene, 16, 16, 4, max_depth=5, T=256)
    _fd_check(
        scene, ctx, jax.random.key(17),
        lambda sc: sc.media.density,
        lambda sc, p: sc.replace(media=sc.media.replace(density=p)),
        picks=[(0,)],
        eps=1e-4, rtol=3e-2, atol=1e-7)


def test_fd_noise_scale():
    """Noise-scale gradient (docstring axis 3) on the perlin spheres: no
    path decision depends on albedo, so the marble chain
    sin(scale*z + 10*turb) differentiates cleanly."""
    scene = make_scene("two_perlin_spheres", 1.0)
    ctx = mg.plan_tape(scene, 16, 16, 4, max_depth=4, T=256)
    _fd_check(
        scene, ctx, jax.random.key(8),
        lambda sc: sc.textures.scale,
        lambda sc, p: sc.replace(textures=sc.textures.replace(scale=p)),
        picks=[(0,)],
        eps=1e-3, rtol=5e-2, atol=1e-6)


def test_fd_image_texels():
    """Image-texel gradient (docstring axis 4) on the earth globe: texels
    enter only through albedo (no decisions), so analytic == FD at the
    hottest texels. Picks are the two largest-|g| atlas entries."""
    scene = make_scene("earth", 1.0)
    assert scene.textures.images is not None
    ctx = mg.plan_tape(scene, 16, 16, 4, max_depth=4, T=256)
    key = jax.random.key(6)
    img0, tape, seed = mg.tape_forward(key, ctx, interpret=True)
    replay = mg.make_replay(ctx)

    def loss_p(p):
        sc = scene.replace(textures=scene.textures.replace(images=p))
        return _loss(replay(sc, tape, seed))

    g = np.asarray(jax.grad(loss_p)(scene.textures.images))
    assert np.abs(g).sum() > 0.0
    flat = np.argsort(np.abs(g).ravel())[::-1][:2]
    eps = 5e-3
    p0 = np.asarray(scene.textures.images)
    for fi in flat:
        idx = np.unravel_index(fi, g.shape)
        pp, pm = p0.copy(), p0.copy()
        pp[idx] += eps
        pm[idx] -= eps
        set_im = lambda arr: scene.replace(
            textures=scene.textures.replace(images=jnp.asarray(arr)))
        fd = (_kernel_loss(set_im(pp), ctx, key)
              - _kernel_loss(set_im(pm), ctx, key)) / (2 * eps)
        np.testing.assert_allclose(fd, g[idx], rtol=3e-2, atol=1e-9)


@pytest.mark.parametrize("name", ["random_balls", "cornell_box",
                                  "cornell_smoke", "two_perlin_spheres",
                                  "earth", "light_sample"])
def test_build_tables_traced_matches_eager(name):
    """The traced table builder (device-resident inverse rendering)
    reproduces megakernel.build_tables bit-for-bit under the pinned
    layout — same pad fills, guarded reciprocals, cluster AABBs, and
    hi/lo-bf16 atlas planes."""
    scene = make_scene(name, 1.0)
    ctx = mg.plan_tape(scene, 8, 8, 2, max_depth=3, T=128)
    eager = ctx["tabs"][:8]
    traced = jax.jit(lambda sc: mg.build_tables_traced(
        sc, scene, ctx["meta"]))(scene)
    names = ("sph", "attr", "clus", "rect", "light", "med", "img", "cam")
    for nm, a, b in zip(names, eager, traced):
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            err_msg=f"{name}:{nm}")


def test_retab_pins_slot_layout():
    """Geometry updates must not reshuffle tape slot codes mid-fit
    (ADVICE r3 medium): build_tables' Morton sort and biggest-radius
    block reorder depend on centers/radii, so _retabbed pins the original
    slot layout — the rebuilt tables keep slot_to_orig bit-identical even
    under a perturbation that WOULD change the unpinned ordering, while
    the replay still matches the re-taped kernel."""
    scene = make_scene("random_balls", 1.0)
    ctx = mg.plan_tape(scene, 8, 8, 2, max_depth=3, T=128)
    # shove one sphere across the scene: unpinned Morton order changes
    c0 = np.asarray(scene.spheres.center0).copy()
    live = np.nonzero(np.asarray(scene.spheres.active))[0]
    c0[live[3]] = c0[live[-1]] + np.asarray([0.5, 0.0, 0.5])
    moved = scene.replace(spheres=scene.spheres.replace(
        center0=jnp.asarray(c0), center1=jnp.asarray(
            c0 + (np.asarray(scene.spheres.center1)
                  - np.asarray(scene.spheres.center0)))))
    unpinned_meta = mg.mk.build_tables(moved, ctx["cfg"].SB)[-1]
    assert not np.array_equal(unpinned_meta["slot_to_orig"],
                              ctx["meta"]["slot_to_orig"]), \
        "perturbation too weak to exercise the reorder hazard"
    c2 = mg._retabbed(ctx, moved)
    np.testing.assert_array_equal(c2["tabs"][-1]["slot_to_orig"],
                                  ctx["meta"]["slot_to_orig"])
    # and the replay (closed over the ORIGINAL meta) still reproduces the
    # re-taped kernel at the moved geometry
    img, tape, seed = mg.tape_forward(jax.random.key(1), c2,
                                      interpret=True)
    img2 = mg.make_replay(ctx)(moved, tape, seed)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img2),
                               rtol=2e-4, atol=2e-5)


def test_sharded_mega_grad_matches_single_device():
    """The (dp, sp)-sharded tape+replay value_and_grad (VERDICT r3 #3)
    equals a single-device emulation that runs each shard's tape/replay
    sequentially and combines them with the same arithmetic — pinning the
    psum plumbing (lanes over sp, squared error over dp, grad transpose
    over both) to the math it claims to distribute."""
    from raytracingweekend_tpu.parallel.mesh import make_mesh

    dp, sp = 2, 2
    scene = make_scene("cornell_box", 1.0)
    nx, ny, spp, md, T = 12, 12, 4, 3, 128
    key = jax.random.key(0)
    target = jnp.zeros((ny, nx, 3), jnp.float32)
    set_p = lambda sc, p: sc.replace(
        textures=sc.textures.replace(color=p))
    mesh = make_mesh(dp, sp)
    vg, aux = mg.make_sharded_value_and_grad(
        scene, mesh, target, nx=nx, ny=ny, spp=spp, max_depth=md, T=T,
        set_params=set_p, interpret=True)
    seed = jax.random.randint(key, (1, 1), 0, np.int32(2 ** 31 - 1),
                              dtype=jnp.int32)
    params = scene.textures.color
    loss_sh, g_sh = jax.jit(vg)(params, seed)

    # single-device emulation with the identical per-shard seeds/layout
    ctx, replay = aux["ctx"], aux["replay"]
    rows, n_tiles_l = aux["rows"], aux["n_tiles_l"]
    pixf_l, tgt, valid = aux["pixf_l"], aux["tgt"], aux["valid"]

    def emu_loss(p):
        total = 0.0
        for di in range(dp):
            pixf_dev = pixf_l.at[:, 1, :].add(float(di * rows))
            img = 0.0
            for si in range(sp):
                seed_dev = (seed + np.int32(di) * mg._DP_SEED
                            + np.int32(si) * mg._SP_SEED)
                tabs8 = jax.tree_util.tree_map(
                    jax.lax.stop_gradient,
                    mg.build_tables_traced(set_p(scene, p), scene,
                                           ctx["meta"]))
                tape = mg._tape_launch(tabs8, pixf_dev, seed_dev,
                                       ctx["cfg"], n_tiles_l, True)
                img = img + replay.lanes(set_p(scene, p), tape,
                                         seed_dev, pixf_dev)
            img = img / float(spp)
            diff = jnp.where(valid[..., None], img - tgt[di], 0.0)
            total = total + jnp.sum(diff * diff)
        return total / float(ny * nx * 3)

    loss_emu, g_emu = jax.value_and_grad(emu_loss)(params)
    np.testing.assert_allclose(float(loss_sh), float(loss_emu),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_emu),
                               rtol=1e-5, atol=1e-8)
    assert float(jnp.abs(g_sh).sum()) > 0.0


def test_fit_scene_params_mega_converges_mesh():
    """fit_scene_params_mega(mesh=...) trains the megakernel under a
    (2, 2) mesh: wall-color recovery converges, completing BASELINE.md's
    inverse-rendering axis at scale."""
    from raytracingweekend_tpu.parallel.mesh import make_mesh

    scene = make_scene("cornell_box", 1.0)
    key = jax.random.key(0)
    mesh = make_mesh(2, 2)
    ctx = mg.plan_tape(scene, 12, 12, 4, max_depth=4, T=256)
    target, _, _ = mg.tape_forward(key, ctx, interpret=True)
    bad = scene.replace(textures=scene.textures.replace(
        color=scene.textures.color.at[1].set(
            jnp.asarray([0.2, 0.2, 0.2]))))
    losses = []
    fitted, final = mg.fit_scene_params_mega(
        bad, target,
        get_params=lambda sc: sc.textures.color,
        set_params=lambda sc, p: sc.replace(
            textures=sc.textures.replace(color=p)),
        key=key, nx=12, ny=12, spp=4, max_depth=4, T=256,
        steps=25, lr=0.08,
        postprocess=lambda p: jnp.clip(p, 0.0, None),
        log_fn=lambda i, l: losses.append(l), interpret=True, mesh=mesh)
    # the sharded estimator samples different (seed, layout) streams than
    # the single-device target render, so the loss has an MC noise floor;
    # what must hold is steady descent and parameter recovery
    assert final < losses[0] * 0.75, (losses[0], final)
    rec = np.asarray(fitted.textures.color[1])
    ref = np.asarray(scene.textures.color[1])
    assert np.abs(rec - ref).max() < 0.25, (rec, ref)
    assert np.abs(rec - ref).max() < np.abs(0.2 - ref.max()) * 0.5


def test_fit_scene_params_mega_converges():
    """Inverse rendering on the mega path: recover a perturbed wall color
    by gradient descent (one tape launch + one replay grad per step)."""
    scene = make_scene("cornell_box", 1.0)
    target_scene = scene
    key = jax.random.key(0)
    ctx = mg.plan_tape(scene, 12, 12, 4, max_depth=4, T=256)
    target, _, _ = mg.tape_forward(key, ctx, interpret=True)

    bad = scene.replace(textures=scene.textures.replace(
        color=scene.textures.color.at[1].set(
            jnp.asarray([0.2, 0.2, 0.2]))))

    losses = []
    fitted, final = mg.fit_scene_params_mega(
        bad, target,
        get_params=lambda sc: sc.textures.color,
        set_params=lambda sc, p: sc.replace(
            textures=sc.textures.replace(color=p)),
        key=key, nx=12, ny=12, spp=4, max_depth=4, T=256,
        steps=12, lr=0.08,
        postprocess=lambda p: jnp.clip(p, 0.0, None),
        log_fn=lambda i, l: losses.append(l), interpret=True)
    assert final < losses[0] * 0.5, (losses[0], final)
    rec = np.asarray(fitted.textures.color[1])
    ref = np.asarray(target_scene.textures.color[1])
    assert np.abs(rec - ref).max() < 0.25, (rec, ref)
