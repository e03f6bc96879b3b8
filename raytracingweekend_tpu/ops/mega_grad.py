"""Differentiable megakernel rendering: decision tape + XLA replay VJP.

The fused Pallas megakernel (ops/megakernel.py) is the production forward
path but Pallas kernels have no automatic reverse-mode. The round-2 gradient
story therefore rode the ~16 M seg/s wavefront (grad.render_diff). This
module closes that gap with a winner-replay design:

1. **Tape forward** — the megakernel runs in `tape` mode (overdraw off, one
   lane == one pixel tracing exactly spp samples) and records, per (lane,
   bounce iteration), ONE number: the winning primitive
   (-1 miss / sphere slot / rect row / medium row). Everything else the
   backward needs — every uniform draw, branch coin, quadratic root — is
   *recomputable* from the stateless counter RNG (megakernel._uniforms) and
   the scene parameters. The winner is the one quantity whose recomputation
   would cost the full O(S) intersection scan per bounce.

2. **XLA replay** — a pure-jnp mirror of the kernel's bounce loop where the
   O(S) scan is replaced by O(1) tape-driven gathers of the winner's
   parameters. With the tape fixed (the stop-gradient through discrete
   sampling decisions of SURVEY.md §7 step 7), the replay is reverse-mode
   differentiable w.r.t. every continuous scene parameter: sphere
   centers/radii/times, rect extents and transforms, texture colors and
   noise scales, image texels, metal fuzz, dielectric IOR, medium density,
   camera vectors.

Because the RNG is counter-based and decisions are deterministic functions
of (params, uniforms), the replay reproduces the kernel's radiance to float
round-off (XLA and Mosaic may contract FMAs differently); fixed-key finite
differences through the KERNEL forward therefore match the replay's
gradients wherever the perturbation flips no discrete decision — exactly
the semantics grad.render_diff already proves for the wavefront
(reference math being differentiated: material.h:142-225, sphere.h:46-81).

Cost model: per optimization step, one kernel launch at megakernel speed
(tape rows add ~n_iters (1, T) stores) + one replay value_and_grad whose
work is O(lanes x iterations) with ONE one-hot extraction dot per winner
class per step (no O(S) scan, no per-element gathers — the chip's gathers
cost ~3.6 ms/M and dominated a jnp.take-based replay 13x; the dot's
transpose makes the backward matmuls instead of scatter-adds). Measured
on-chip (docs/grad_bench_r03.jsonl): 88-118 ms per 128x128x32spp
inverse-rendering step, 4.4-4.9x the wavefront grad path.
"""
from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..models import scene_types as st
from . import megakernel as mk

_BC = lax.bitcast_convert_type
BIG = mk.BIG


def plan_tape(scene: st.Scene, nx: int, ny: int, spp: int,
              max_depth: int = 8, T: int = 1024):
    """Static launch plan for the tape-mode kernel + the replay.

    Returns a dict ctx consumed by tape_forward / make_replay. Requires a
    concrete (non-traced) scene; gradients later flow through a *traced*
    scene handed to the replay."""
    tabs, cfg, T, _k = mk.make_plan(scene, nx, ny, spp,
                                    max_depth=max_depth, rr_depth=None,
                                    T=T, tape=True)
    meta = tabs[-1]
    pixf, inv = mk._pixel_layout(nx, ny, T, 1)
    return dict(tabs=tabs, cfg=cfg, meta=meta, pixf=pixf,
                inv=jnp.asarray(inv), n_tiles=pixf.shape[0], T=T,
                nx=nx, ny=ny, spp=spp, max_depth=max_depth)


@partial(jax.jit, static_argnames=("cfg", "n_tiles", "T", "ny", "nx",
                                   "spp", "interpret"))
def _tape_call(pixf, inv, tabs12, key, *, cfg, n_tiles, T, ny, nx, spp,
               interpret):
    """One jit for the kernel launch + epilogue slicing (each eager op
    outside jit pays a full tunnel dispatch round-trip)."""
    (sph_tab, attr_tab, clus_tab, rect_tab, light_tab, med_tab,
     img_tab, cam_vec) = tabs12
    seed = jax.random.randint(key, (1, 1), 0, np.int32(2 ** 31 - 1),
                              dtype=jnp.int32)
    out = mk._mega_call(pixf, cam_vec, sph_tab, attr_tab, clus_tab,
                        rect_tab, light_tab, med_tab,
                        jnp.asarray(mk._PERM_B), jnp.asarray(mk._RV_HI),
                        jnp.asarray(mk._RV_LO), img_tab, seed,
                        cfg=cfg, n_tiles=n_tiles, interpret=interpret)
    sums = out[:, 0:3, :].transpose(0, 2, 1).reshape(n_tiles * T, 3)
    image = sums[inv].reshape(ny, nx, 3) / spp
    tape = out[:, 8:, :]  # (n_tiles, n_iters, T)
    # scalar checksum so callers can force device completion with ONE
    # host transfer (block_until_ready is a no-op through the tunnel)
    return image, tape, seed, jnp.sum(image)


def tape_forward(key, ctx, interpret: bool = False):
    """Run the megakernel in tape mode. Returns (image, tape, seed):
    image is the spp-averaged (ny, nx, 3) canvas, tape the (n_tiles,
    n_iters, T) winner codes, seed the (1, 1) int32 the replay reuses."""
    image, tape, seed, _ = _tape_call(
        ctx["pixf"], ctx["inv"], tuple(ctx["tabs"][:8]), key,
        cfg=ctx["cfg"], n_tiles=ctx["n_tiles"], T=ctx["T"],
        ny=ctx["ny"], nx=ctx["nx"], spp=ctx["spp"], interpret=interpret)
    return image, tape, seed


def tape_forward_sync(key, ctx, interpret: bool = False):
    """tape_forward variant returning (image, tape, seed, checksum) for
    one-transfer syncs in benchmarks."""
    return _tape_call(ctx["pixf"], ctx["inv"], tuple(ctx["tabs"][:8]), key,
                      cfg=ctx["cfg"], n_tiles=ctx["n_tiles"], T=ctx["T"],
                      ny=ctx["ny"], nx=ctx["nx"], spp=ctx["spp"],
                      interpret=interpret)


def make_replay(ctx):
    """Build the differentiable replay: a jit-able
    replay(scene, tape, seed) -> (ny, nx, 3) spp-averaged image that
    mirrors the tape-mode kernel's bounce loop op-for-op, with tape-driven
    gathers standing in for the intersection scan.

    The returned function also exposes `replay.lanes(scene, tape, seed,
    pixf)` — the same computation over an ARBITRARY (n, 4, T) pixel-lane
    block (e.g. one dp shard's row tile, j pre-offset to absolute rows),
    returning the raw (n, T, 3) radiance sums without the image gather.
    The kernel's RNG streams are (seed, local tile index)-keyed in both
    paths, so a shard running tiles 0..n-1 with its own seed replays
    exactly."""
    cfg = ctx["cfg"]
    meta = ctx["meta"]
    T = ctx["T"]
    n_tiles = ctx["n_tiles"]
    S, R, V, L = cfg.S, cfg.R, cfg.V, cfg.L
    spp = float(cfg.spp)
    t_min = cfg.t_min
    nx, ny = ctx["nx"], ctx["ny"]
    n_iters = cfg.n_iters
    slot_to_orig = jnp.asarray(meta["slot_to_orig"])            # (S,)
    rect_rows = meta["rect_rows"]
    med_rows = meta["med_rows"]
    rect_map = jnp.asarray(np.asarray(rect_rows + (0,))[:max(R, 1)]
                           if R else np.zeros(1, np.int64)).astype(jnp.int32)
    med_map = jnp.asarray(np.asarray(med_rows + (0,))[:max(V, 1)]
                          if V else np.zeros(1, np.int64)).astype(jnp.int32)
    inv = ctx["inv"]
    # f64 twin (round-5, VERDICT #7): ctx["f64"] promotes every
    # continuous replay value to float64 (pass an f64-cast scene and
    # enable jax_enable_x64). The tape fixes every discrete decision
    # from the f32 kernel forward, so the f64 replay re-walks the
    # IDENTICAL paths with ~2^-52 arithmetic - the tightened-
    # tolerance self-validation mode of the flagship path
    # (tests/test_f64.py::test_f64_mega_replay_twin). RNG uniforms
    # stay bit-identical to the kernel (f32 values promoted exactly).
    RT = jnp.float64 if ctx.get("f64") else jnp.float32

    def safe(pred, x, alt=1.0):
        return jnp.where(pred, x, alt)

    def pack(d):
        """Stack a dict of (K,) rows into a (P, K) matrix + name index."""
        names = list(d)
        return (jnp.stack([jnp.asarray(d[n], RT) for n in names],
                          axis=0),
                {n: i for i, n in enumerate(names)})

    def _mat_rows(mats, tex, mi):
        """Per-primitive material/texture rows (the traced analogue of
        build_tables' attribute baking), gathered ONCE per replay call."""
        ti = mats.tex[mi]
        col = tex.color[ti]
        tt = tex.ttype[ti]
        evc = tex.color[tex.even[ti]]
        odc = tex.color[tex.odd[ti]]
        return dict(
            mt=mats.mtype[mi].astype(RT),
            albx=col[:, 0], alby=col[:, 1], albz=col[:, 2],
            fz=mats.fuzz[mi], ri=mats.ref_idx[mi],
            noi=jnp.where(tt == st.TEX_NOISE,
                          1.0 + tex.noise_mode[ti].astype(RT),
                          0.0),
            nsc=tex.scale[ti],
            chk=(tt == st.TEX_CHECKER).astype(RT),
            evx=evc[:, 0], evy=evc[:, 1], evz=evc[:, 2],
            odx=odc[:, 0], ody=odc[:, 1], odz=odc[:, 2],
            img=jnp.where(tt == st.TEX_IMAGE,
                          1.0 + tex.image_id[ti].astype(RT),
                          0.0))

    def replay_lanes(scene: st.Scene, tape, seed_arr, pixf):
        n_t = pixf.shape[0]
        M_ = n_t * T
        px_i = pixf[:, 0, :]   # (n_t, T)
        px_j = pixf[:, 1, :]
        valid = pixf[:, 2, :] > 0.0
        tile_ids = jnp.arange(n_t, dtype=jnp.int32)
        n_tiles = n_t  # shadow the full-image count: all shapes below are
        # per-block so replay_lanes works on any shard's lane block

        def uni(n_rows, salt, seed, it):
            """(n_t, n_rows, T) uniforms, bit-identical to the kernel's
            (f32 values, promoted exactly under the f64 twin)."""
            return jax.vmap(
                lambda tl: mk._uniforms(n_rows, T, seed, tl, it, salt,
                                        bitcast=_BC))(tile_ids).astype(RT)

        def extract(matx, idx_dict, idx):
            """One-hot MXU extraction of matx's columns at per-lane
            indices — the replay-side twin of the kernel's fused
            extraction. Gathers measure ~3.6 ms per million elements on
            this chip (CLAUDE.md) and the scan runs hundreds of steps, so
            per-step jnp.take was the whole replay cost (595 of 669 ms at
            128x128x32); one (P, K)@(K, M) dot per winner class replaces
            ~25 of them, and its transpose (the backward) is a matmul
            instead of a scatter-add. HIGHEST precision = 6-pass bf16 =
            bit-exact for a one-hot RHS (3 bf16 terms span the full f32
            mantissa)."""
            K = matx.shape[1]
            oh = (jax.lax.broadcasted_iota(jnp.int32, (K, M_), 0)
                  == idx.reshape(1, M_)).astype(RT)
            out = jax.lax.dot_general(
                matx, oh, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=RT)
            out = out.reshape(matx.shape[0], n_tiles, T)
            return lambda name: out[idx_dict[name]]

        seed = seed_arr[0, 0]
        cam = scene.camera
        sph = scene.spheres
        rects = scene.rects
        media = scene.media
        mats = scene.materials
        tex = scene.textures

        c_o = cam.origin
        c_ll = cam.lower_left_corner
        c_h = cam.horizontal
        c_v = cam.vertical
        c_u = cam.u
        c_vv = cam.v

        # ---- packed per-class attribute matrices (differentiable; the
        # table gathers run ONCE here, never inside the scan) ----
        if meta["has_spheres"]:
            c0s = sph.center0[slot_to_orig]
            c1s = sph.center1[slot_to_orig]
            t0s = sph.time0[slot_to_orig]
            t1s = sph.time1[slot_to_orig]
            dts = t1s - t0s
            ds = dict(cx=c0s[:, 0], cy=c0s[:, 1], cz=c0s[:, 2],
                      dcx=c1s[:, 0] - c0s[:, 0],
                      dcy=c1s[:, 1] - c0s[:, 1],
                      dcz=c1s[:, 2] - c0s[:, 2],
                      t0=t0s,
                      idt=jnp.where(dts != 0.0,
                                    1.0 / jnp.where(dts != 0.0, dts, 1.0),
                                    0.0),
                      rad=sph.radius[slot_to_orig])
            ds.update(_mat_rows(mats, tex, sph.mat[slot_to_orig]))
            sph_m, SIx = pack(ds)
        if R:
            roff_r = rects.offset[rect_map]
            dr = dict(a0=rects.a0[rect_map], a1=rects.a1[rect_map],
                      b0=rects.b0[rect_map], b1=rects.b1[rect_map],
                      k=rects.k[rect_map],
                      cth=rects.cos_t[rect_map],
                      sth=rects.sin_t[rect_map],
                      offx=roff_r[:, 0], offy=roff_r[:, 1],
                      offz=roff_r[:, 2],
                      ax=rects.axis[rect_map].astype(RT),
                      fl=rects.flip[rect_map])
            dr.update(_mat_rows(mats, tex, rects.mat[rect_map]))
            rect_m, RIx = pack(dr)
        if V:
            mp0 = media.p0[med_map]
            mp1 = media.p1[med_map]
            moff_v = media.offset[med_map]
            dv = dict(kind=media.kind[med_map].astype(RT),
                      p0x=mp0[:, 0], p0y=mp0[:, 1], p0z=mp0[:, 2],
                      p1x=mp1[:, 0], p1y=mp1[:, 1], p1z=mp1[:, 2],
                      cth=media.cos_t[med_map], sth=media.sin_t[med_map],
                      offx=moff_v[:, 0], offy=moff_v[:, 1],
                      offz=moff_v[:, 2],
                      rho=media.density[med_map])
            dv.update(_mat_rows(mats, tex, media.mat[med_map]))
            med_m, VIx = pack(dv)

        def gen_rays(it):
            u = uni(8, 1, seed, it)
            s = (px_i + u[:, 0, :]) * (1.0 / cfg.nx)
            t = (px_j + u[:, 1, :]) * (1.0 / cfg.ny)
            time = cam.time0 + u[:, 2, :] * (cam.time1 - cam.time0)
            if cfg.lens:
                r = cam.lens_radius * jnp.sqrt(u[:, 3, :])
                cph, sph2 = mk._cossin2pi(u[:, 4, :])
                rdx = r * cph
                rdy = r * sph2
                offx = c_u[0] * rdx + c_vv[0] * rdy
                offy = c_u[1] * rdx + c_vv[1] * rdy
                offz = c_u[2] * rdx + c_vv[2] * rdy
            else:
                offx = offy = offz = jnp.zeros((n_tiles, T), RT)
            ox = c_o[0] + offx
            oy = c_o[1] + offy
            oz = c_o[2] + offz
            dx = c_ll[0] + s * c_h[0] + t * c_v[0] - ox
            dy = c_ll[1] + s * c_h[1] + t * c_v[1] - oy
            dz = c_ll[2] + s * c_h[2] + t * c_v[2] - oz
            inv_n = lax.rsqrt(dx * dx + dy * dy + dz * dz)
            return ox, oy, oz, dx * inv_n, dy * inv_n, dz * inv_n, time

        def step(state, xs):
            it, w = xs
            (ox, oy, oz, dx, dy, dz, time, tpx, tpy, tpz,
             rx, ry, rz, depth, done, ax, ay, az) = state
            active = valid & (done < spp)
            wi = w.astype(jnp.int32)
            hit = active & (w >= 0.0)
            is_sph = hit & (wi < S) if meta["has_spheres"] else (hit & False)
            is_rect = (hit & (wi >= S) & (wi < S + R)) if R else (hit & False)
            is_med = (hit & (wi >= S + R)) if V else (hit & False)

            one = jnp.ones((n_tiles, T), RT)
            zero = jnp.zeros((n_tiles, T), RT)
            best_t = jnp.full((n_tiles, T), BIG, RT)
            nx_ = zero
            ny_ = one
            nz_ = zero
            mtype = zero
            albx = alby = albz = zero
            fuzz_v = ridx_v = zero
            nf_v = nsc_v = zero
            chk_v = zero
            evx_v = evy_v = evz_v = zero
            odx_v = ody_v = odz_v = zero
            img_v = zero

            # ---- sphere winner: analytic root + normal (sphere.h:46-81,
            # same formula as the kernel's quadratic block); params via
            # ONE one-hot extraction dot ----
            if meta["has_spheres"]:
                slot = jnp.clip(wi, 0, S - 1)
                at_s = extract(sph_m, SIx, slot)
                rad = at_s("rad")
                scx = at_s("cx")
                scy = at_s("cy")
                scz = at_s("cz")
                if meta["moving"]:
                    frac = (time - at_s("t0")) * at_s("idt")
                    scx = scx + frac * at_s("dcx")
                    scy = scy + frac * at_s("dcy")
                    scz = scz + frac * at_s("dcz")
                # Sign-flipped fma chain + rsqrt root, mirroring the
                # kernel forward bit-for-bit on the same backend
                # (megakernel.py quadratic block: co = c - o, nb = -b,
                # cc seeded by -r^2, sq = disc * rsqrt(disc)): forward
                # and replay share rounding so near-boundary root
                # selects cannot flip between tape and replay. The
                # maximum() guard only changes lanes where disc <= tiny
                # (non-winners / tangency) and keeps reverse-mode
                # gradients finite where the kernel's unguarded NaN
                # funnel would poison them.
                cox = scx - ox
                coy = scy - oy
                coz = scz - oz
                nb = cox * dx + coy * dy + coz * dz
                nr2 = -(rad * rad)
                cc = cox * cox + (coy * coy + (coz * coz + nr2))
                disc = safe(is_sph, nb * nb - cc, 1.0)
                disc = jnp.maximum(disc, 1e-30)
                sq = disc * lax.rsqrt(disc)
                tn = nb - sq
                t_s = jnp.where(tn > t_min, tn, nb + sq)
                best_t = jnp.where(is_sph, t_s, best_t)
                rinv = 1.0 / safe(is_sph, rad)

            # ---- rect winner: plane root through the baked transform
            # (hittable.h:142-267; axis is data here, selects in kernel
            # are static unrolls — same arithmetic) ----
            if R:
                ri_r = jnp.clip(wi - S, 0, max(R - 1, 0))
                at_r = extract(rect_m, RIx, ri_r)
                ra0 = at_r("a0")
                ra1 = at_r("a1")
                rb0 = at_r("b0")
                rb1 = at_r("b1")
                rk = at_r("k")
                rfl = at_r("fl")
                rct = at_r("cth")
                rst = at_r("sth")
                shx = ox - at_r("offx")
                roy = oy - at_r("offy")
                shz = oz - at_r("offz")
                rox = rct * shx - rst * shz
                roz = rst * shx + rct * shz
                rdx = rct * dx - rst * dz
                rdz = rst * dx + rct * dz
                rdy = dy
                rax = at_r("ax")
                is_xy = rax < 0.5
                is_xz = (rax > 0.5) & (rax < 1.5)
                o_n = jnp.where(is_xy, roz, jnp.where(is_xz, roy, rox))
                d_n = jnp.where(is_xy, rdz, jnp.where(is_xz, rdy, rdx))
                t_r = (rk - o_n) * (1.0 / safe(is_rect, d_n))
                best_t = jnp.where(is_rect, t_r, best_t)
                # object normal by axis * flip, rotated object->world
                n_ox = jnp.where(rax > 1.5, rfl, 0.0)
                n_oy = jnp.where(is_xz, rfl, 0.0)
                n_oz = jnp.where(is_xy, rfl, 0.0)
                rnx = rct * n_ox + rst * n_oz
                rnz = -rst * n_ox + rct * n_oz
                rny = n_oy
                # rect planar uv (hittable.h:160-172) for image textures
                o_a = jnp.where(is_xy | is_xz, rox, roy)
                o_b = jnp.where(is_xy, roy, roz)
                d_a = jnp.where(is_xy | is_xz, rdx, rdy)
                d_b = jnp.where(is_xy, rdy, rdz)
                pa_r = o_a + t_r * d_a
                pb_r = o_b + t_r * d_b
                da_r = ra1 - ra0
                db_r = rb1 - rb0
                ru_r = (pa_r - ra0) * jnp.where(
                    da_r != 0.0, 1.0 / safe(da_r != 0.0, da_r), 0.0)
                rv_r = (pb_r - rb0) * jnp.where(
                    db_r != 0.0, 1.0 / safe(db_r != 0.0, db_r), 0.0)

            # ---- medium winner: boundary + stochastic scatter distance
            # (hittable.h:430-479) ----
            if V:
                vi = jnp.clip(wi - S - R, 0, max(V - 1, 0))
                at_v = extract(med_m, VIx, vi)
                mkind = at_v("kind")
                mct = at_v("cth")
                mst = at_v("sth")
                mrho = at_v("rho")
                vshx = ox - at_v("offx")
                moy = oy - at_v("offy")
                vshz = oz - at_v("offz")
                mox = mct * vshx - mst * vshz
                moz = mst * vshx + mct * vshz
                mdx = mct * dx - mst * dz
                mdz = mst * dx + mct * dz
                mdy = dy
                # sphere boundary
                socx = mox - at_v("p0x")
                socy = moy - at_v("p0y")
                socz = moz - at_v("p0z")
                bq = socx * mdx + socy * mdy + socz * mdz
                rq = at_v("p1x")
                dq = bq * bq - (socx * socx + socy * socy + socz * socz
                                - rq * rq)
                sqq = jnp.sqrt(jnp.maximum(dq, 1e-30))
                sph_in = -bq - sqq
                # box boundary (exit planes are the kernel's validity
                # checks — the taped winner already passed them)
                ivx = 1.0 / safe(is_med, mdx)
                ivy = 1.0 / safe(is_med, mdy)
                ivz = 1.0 / safe(is_med, mdz)
                tx0 = (at_v("p0x") - mox) * ivx
                tx1 = (at_v("p1x") - mox) * ivx
                ty0 = (at_v("p0y") - moy) * ivy
                ty1 = (at_v("p1y") - moy) * ivy
                tz0 = (at_v("p0z") - moz) * ivz
                tz1 = (at_v("p1z") - moz) * ivz
                box_in = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                                 jnp.minimum(ty0, ty1)),
                                     jnp.minimum(tz0, tz1))
                m_in = jnp.where(mkind < 0.5, sph_in, box_in)
                m_in = jnp.maximum(m_in, t_min)
                um = uni(V, 4, seed, it)                 # (n_tiles, V, T)
                um_v = um[:, 0, :]
                for li in range(1, V):
                    um_v = jnp.where(vi == li, um[:, li, :], um_v)
                t_m = m_in + (-1.0 / safe(is_med, mrho)) * jnp.log(
                    jnp.maximum(um_v, 1e-38))
                best_t = jnp.where(is_med, t_m, best_t)

            # Miss lanes keep best_t == BIG in the kernel; every use of the
            # hit point there is masked, but 3e37-scale coordinates square
            # to inf in the MIS light probes and inf * 0-cotangent = NaN in
            # reverse mode. Finite-but-arbitrary t on miss lanes is
            # invisible to the image and keeps the backward clean.
            best_t = jnp.where(hit, best_t, 1.0)
            px_ = ox + best_t * dx
            py_ = oy + best_t * dy
            pz_ = oz + best_t * dz

            # ---- merge winner attributes (mirrors the kernel's one-hot
            # extraction + rect/media selects) ----
            if meta["has_spheres"]:
                nrm_inv = rinv
                nx_ = jnp.where(is_sph, (px_ - scx) * nrm_inv, nx_)
                ny_ = jnp.where(is_sph, (py_ - scy) * nrm_inv, ny_)
                nz_ = jnp.where(is_sph, (pz_ - scz) * nrm_inv, nz_)
                mtype = jnp.where(is_sph, at_s("mt"), mtype)
                albx = jnp.where(is_sph, at_s("albx"), albx)
                alby = jnp.where(is_sph, at_s("alby"), alby)
                albz = jnp.where(is_sph, at_s("albz"), albz)
                fuzz_v = jnp.where(is_sph, at_s("fz"), fuzz_v)
                ridx_v = jnp.where(is_sph, at_s("ri"), ridx_v)
                nf_v = jnp.where(is_sph, at_s("noi"), nf_v)
                nsc_v = jnp.where(is_sph, at_s("nsc"), nsc_v)
                chk_v = jnp.where(is_sph, at_s("chk"), chk_v)
                evx_v = jnp.where(is_sph, at_s("evx"), evx_v)
                evy_v = jnp.where(is_sph, at_s("evy"), evy_v)
                evz_v = jnp.where(is_sph, at_s("evz"), evz_v)
                odx_v = jnp.where(is_sph, at_s("odx"), odx_v)
                ody_v = jnp.where(is_sph, at_s("ody"), ody_v)
                odz_v = jnp.where(is_sph, at_s("odz"), odz_v)
                img_v = jnp.where(is_sph, at_s("img"), img_v)
            if R:
                nx_ = jnp.where(is_rect, rnx, nx_)
                ny_ = jnp.where(is_rect, rny, ny_)
                nz_ = jnp.where(is_rect, rnz, nz_)
                mtype = jnp.where(is_rect, at_r("mt"), mtype)
                albx = jnp.where(is_rect, at_r("albx"), albx)
                alby = jnp.where(is_rect, at_r("alby"), alby)
                albz = jnp.where(is_rect, at_r("albz"), albz)
                fuzz_v = jnp.where(is_rect, at_r("fz"), fuzz_v)
                ridx_v = jnp.where(is_rect, at_r("ri"), ridx_v)
                nf_v = jnp.where(is_rect, at_r("noi"), nf_v)
                nsc_v = jnp.where(is_rect, at_r("nsc"), nsc_v)
                chk_v = jnp.where(is_rect, at_r("chk"), chk_v)
                evx_v = jnp.where(is_rect, at_r("evx"), evx_v)
                evy_v = jnp.where(is_rect, at_r("evy"), evy_v)
                evz_v = jnp.where(is_rect, at_r("evz"), evz_v)
                odx_v = jnp.where(is_rect, at_r("odx"), odx_v)
                ody_v = jnp.where(is_rect, at_r("ody"), ody_v)
                odz_v = jnp.where(is_rect, at_r("odz"), odz_v)
                img_v = jnp.where(is_rect, at_r("img"), img_v)
            if V:
                mtype = jnp.where(is_med, 4.0, mtype)
                albx = jnp.where(is_med, at_v("albx"), albx)
                alby = jnp.where(is_med, at_v("alby"), alby)
                albz = jnp.where(is_med, at_v("albz"), albz)
                nf_v = jnp.where(is_med, at_v("noi"), nf_v)
                nsc_v = jnp.where(is_med, at_v("nsc"), nsc_v)
                chk_v = jnp.where(is_med, 0.0, chk_v)
                img_v = jnp.where(is_med, at_v("img"), img_v)

            # ---- texture overrides, same order as the kernel ----
            if cfg.has_noise:
                # mk's noise helpers build their two-level lookup one-hots
                # from a (16, T) iota shaped for a SINGLE (1, T) coordinate
                # row (the kernel evaluates per tile); flatten the tile axis
                # into the lane axis so the replay evaluates all tiles in
                # one call — (n_tiles, T) inputs would mis-broadcast (crash
                # for most n_tiles, silently wrong at n_tiles == 16).
                def _fl(a):
                    return a.reshape(1, M_)

                mval = jnp.zeros((n_tiles, T), RT)
                if st.NOISE_MARBLE in cfg.noise_modes:
                    mar = mk._marble(_fl(px_), _fl(py_), _fl(pz_),
                                     _fl(nsc_v), M_).reshape(n_tiles, T)
                    mval = jnp.where(nf_v == float(1 + st.NOISE_MARBLE),
                                     mar, mval)
                if st.NOISE_SMOOTH in cfg.noise_modes:
                    smv = 0.5 * (1.0 + mk._perlin_noise(
                        _fl(px_ * nsc_v), _fl(py_ * nsc_v),
                        _fl(pz_ * nsc_v), M_)).reshape(n_tiles, T)
                    mval = jnp.where(nf_v == float(1 + st.NOISE_SMOOTH),
                                     smv, mval)
                if st.NOISE_TURB in cfg.noise_modes:
                    tbv = mk._turb(_fl(px_ * nsc_v), _fl(py_ * nsc_v),
                                   _fl(pz_ * nsc_v),
                                   M_).reshape(n_tiles, T)
                    mval = jnp.where(nf_v == float(1 + st.NOISE_TURB),
                                     tbv, mval)
                use_n = nf_v > 0.5
                albx = jnp.where(use_n, mval, albx)
                alby = jnp.where(use_n, mval, alby)
                albz = jnp.where(use_n, mval, albz)
            if cfg.has_checker:
                sines = (jnp.sin(10.0 * px_) * jnp.sin(10.0 * py_)
                         * jnp.sin(10.0 * pz_))
                is_chk = chk_v > 0.5
                use_odd = is_chk & (sines < 0.0)
                albx = jnp.where(use_odd, odx_v,
                                 jnp.where(is_chk, evx_v, albx))
                alby = jnp.where(use_odd, ody_v,
                                 jnp.where(is_chk, evy_v, alby))
                albz = jnp.where(use_odd, odz_v,
                                 jnp.where(is_chk, evz_v, albz))
            if cfg.has_image:
                # sphere UV from the unit normal (sphere.h:115-122), exact
                # nearest-texel gather from the scene's image atlas —
                # differentiable w.r.t. the texel values themselves
                phi = mk._atan2(nz_, nx_)
                theta = mk._asin(ny_)
                u_img = 1.0 - (phi + mk._PI) * (0.5 / mk._PI)
                v_img = (theta + 0.5 * mk._PI) * (1.0 / mk._PI)
                if R:
                    u_img = jnp.where(is_rect, ru_r, u_img)
                    v_img = jnp.where(is_rect, rv_r, v_img)
                if V:
                    u_img = jnp.where(is_med, 0.0, u_img)
                    v_img = jnp.where(is_med, 0.0, v_img)
                use_img = img_v > 0.5
                iid = jnp.clip(img_v.astype(jnp.int32) - 1, 0,
                               max(cfg.n_img - 1, 0))
                hw = jnp.asarray(np.asarray(
                    [[h, w] for (h, w) in cfg.img_hw] or [[1, 1]],
                    np.int32))
                nyi = jnp.take(hw, iid, axis=0)[..., 0]
                nxi = jnp.take(hw, iid, axis=0)[..., 1]
                i_t = (u_img * nxi.astype(RT)).astype(jnp.int32)
                j_t = ((1.0 - v_img) * nyi.astype(RT)
                       - 0.001).astype(jnp.int32)
                i_t = jnp.clip(i_t, 0, nxi - 1)
                j_t = jnp.clip(j_t, 0, nyi - 1)
                texel = tex.images[iid, j_t, i_t]       # (n_tiles, T, 3)
                albx = jnp.where(use_img, texel[..., 0], albx)
                alby = jnp.where(use_img, texel[..., 1], alby)
                albz = jnp.where(use_img, texel[..., 2], albz)

            u = uni(8, 2, seed, it)

            # ---- lambertian cosine sample (material.h:77-122) ----
            r2 = u[:, 1, :]
            z = jnp.sqrt(jnp.maximum(1.0 - r2, 0.0))
            sq_ = jnp.sqrt(r2)
            cphi, sphi = mk._cossin2pi(u[:, 0, :])
            lx_t = cphi * sq_
            ly_t = sphi * sq_
            ux_, uy_, uz_, vx, vy, vz = mk._onb(nx_, ny_, nz_)
            lamx = lx_t * ux_ + ly_t * vx + z * nx_
            lamy = lx_t * uy_ + ly_t * vy + z * ny_
            lamz = lx_t * uz_ + ly_t * vz + z * nz_
            lam_ok = z > 0.0
            lam_w = None

            if L:
                # ---- one-sample MIS (RayTracingWeekend.cpp:117-124),
                # static per-light unroll reading the rect/sphere params
                # from the traced scene (differentiable light geometry) ----
                ul = uni(4, 3, seed, it)
                pickf = ul[:, 0, :] * float(L)
                ldx = ldy = ldz = jnp.zeros((n_tiles, T), RT)
                lrows = meta["light_rows"]
                for li in range(L):
                    if cfg.light_kinds[li] == 0:
                        rr = lrows[li]
                        a0 = rects.a0[rr]
                        a1 = rects.a1[rr]
                        b0 = rects.b0[rr]
                        b1 = rects.b1[rr]
                        kk = rects.k[rr]
                        pa_s = a0 + ul[:, 1, :] * (a1 - a0)
                        pb_s = b0 + ul[:, 2, :] * (b1 - b0)
                        one_t = jnp.ones((n_tiles, T), RT)
                        axl = cfg.light_axes[li]
                        if axl == 0:
                            ppx, ppy, ppz = pa_s, pb_s, kk * one_t
                        elif axl == 1:
                            ppx, ppy, ppz = pa_s, kk * one_t, pb_s
                        else:
                            ppx, ppy, ppz = kk * one_t, pa_s, pb_s
                        if cfg.light_rot[li]:
                            cth = rects.cos_t[rr]
                            sth = rects.sin_t[rr]
                            wpx = cth * ppx + sth * ppz
                            wpz = -sth * ppx + cth * ppz
                            ppx, ppz = wpx, wpz
                        if cfg.light_trans[li]:
                            ppx = ppx + rects.offset[rr, 0]
                            ppy = ppy + rects.offset[rr, 1]
                            ppz = ppz + rects.offset[rr, 2]
                        dlx = ppx - px_
                        dly = ppy - py_
                        dlz = ppz - pz_
                    else:
                        si = lrows[li]
                        lcx = sph.center0[si, 0]
                        lcy = sph.center0[si, 1]
                        lcz = sph.center0[si, 2]
                        radl = sph.radius[si]
                        tcx = lcx - px_
                        tcy = lcy - py_
                        tcz = lcz - pz_
                        dist2 = tcx * tcx + tcy * tcy + tcz * tcz
                        ctm = jnp.sqrt(jnp.maximum(
                            1.0 - radl * radl / jnp.maximum(dist2, 1e-20),
                            1e-20))
                        zc = 1.0 + ul[:, 2, :] * (ctm - 1.0)
                        cpl, spl = mk._cossin2pi(ul[:, 1, :])
                        sc = jnp.sqrt(jnp.maximum(1.0 - zc * zc, 1e-20))
                        winv = lax.rsqrt(jnp.maximum(dist2, 1e-20))
                        wlx = tcx * winv
                        wly = tcy * winv
                        wlz = tcz * winv
                        lux, luy, luz, lvx, lvy, lvz = mk._onb(wlx, wly, wlz)
                        cph = cpl * sc
                        sph_ = spl * sc
                        dlx = cph * lux + sph_ * lvx + zc * wlx
                        dly = cph * luy + sph_ * lvy + zc * wly
                        dlz = cph * luz + sph_ * lvz + zc * wlz
                    if L == 1:
                        ldx, ldy, ldz = dlx, dly, dlz
                    else:
                        sel = (pickf >= float(li)) & (pickf < float(li + 1))
                        ldx = jnp.where(sel, dlx, ldx)
                        ldy = jnp.where(sel, dly, ldy)
                        ldz = jnp.where(sel, dlz, ldz)
                coin_l = ul[:, 3, :] < 0.5
                mdx = jnp.where(coin_l, lamx, ldx)
                mdy = jnp.where(coin_l, lamy, ldy)
                mdz = jnp.where(coin_l, lamz, ldz)
                minv = lax.rsqrt(
                    jnp.maximum(mdx * mdx + mdy * mdy + mdz * mdz, 1e-30))
                mux = mdx * minv
                muy = mdy * minv
                muz = mdz * minv
                cosi = mux * nx_ + muy * ny_ + muz * nz_
                cpdf = jnp.where(cosi <= 0.0, 0.0, cosi * (1.0 / math.pi))
                acc_pdf = jnp.zeros((n_tiles, T), RT)
                for li in range(L):
                    if cfg.light_kinds[li] == 0:
                        rr = lrows[li]
                        if cfg.light_rot[li]:
                            cth = rects.cos_t[rr]
                            sth = rects.sin_t[rr]
                            shx2 = px_ - rects.offset[rr, 0]
                            qoy = py_ - rects.offset[rr, 1]
                            shz2 = pz_ - rects.offset[rr, 2]
                            qox = cth * shx2 - sth * shz2
                            qoz = sth * shx2 + cth * shz2
                            qdx = cth * mux - sth * muz
                            qdz = sth * mux + cth * muz
                            qdy = muy
                        elif cfg.light_trans[li]:
                            qox = px_ - rects.offset[rr, 0]
                            qoy = py_ - rects.offset[rr, 1]
                            qoz = pz_ - rects.offset[rr, 2]
                            qdx, qdy, qdz = mux, muy, muz
                        else:
                            qox, qoy, qoz = px_, py_, pz_
                            qdx, qdy, qdz = mux, muy, muz
                        axl = cfg.light_axes[li]
                        if axl == 0:
                            q_a, q_b, q_n = qox, qoy, qoz
                            w_a, w_b, w_n = qdx, qdy, qdz
                        elif axl == 1:
                            q_a, q_b, q_n = qox, qoz, qoy
                            w_a, w_b, w_n = qdx, qdz, qdy
                        else:
                            q_a, q_b, q_n = qoy, qoz, qox
                            w_a, w_b, w_n = qdy, qdz, qdx
                        # guarded division: the kernel's t_l = inf on
                        # plane-parallel probes is masked in the forward
                        # but would 0*inf -> NaN the backward
                        wn_ok = jnp.abs(w_n) > 1e-20
                        t_l = (rects.k[rr] - q_n) / jnp.where(wn_ok, w_n,
                                                              1.0)
                        # near-parallel probes make t_l astronomically
                        # large; the kernel's inf pdf is masked by lh, but
                        # a forward inf turns masked reverse-mode
                        # cotangents into 0*inf = NaN. Clipping preserves
                        # every geometrically-possible hit (scene scale
                        # << 1e9) and keeps the pdf finite.
                        t_l = jnp.clip(t_l, -1e9, 1e9)
                        hpa = q_a + t_l * w_a
                        hpb = q_b + t_l * w_b
                        lh = (wn_ok & (t_l > t_min)
                              & (hpa >= rects.a0[rr]) & (hpa <= rects.a1[rr])
                              & (hpb >= rects.b0[rr]) & (hpb <= rects.b1[rr]))
                        area = ((rects.a1[rr] - rects.a0[rr])
                                * (rects.b1[rr] - rects.b0[rr]))
                        pdf_l = jnp.minimum(t_l * t_l, 1e30) / jnp.maximum(
                            jnp.abs(w_n) * area, 1e-8)
                    else:
                        si = lrows[li]
                        ocxl = px_ - sph.center0[si, 0]
                        ocyl = py_ - sph.center0[si, 1]
                        oczl = pz_ - sph.center0[si, 2]
                        radl = sph.radius[si]
                        b_l = ocxl * mux + ocyl * muy + oczl * muz
                        d2l = ocxl * ocxl + ocyl * ocyl + oczl * oczl
                        cc_l = d2l - radl * radl
                        disc_l = b_l * b_l - cc_l
                        sq_l = jnp.sqrt(jnp.maximum(disc_l, 1e-30))
                        tn_l = -b_l - sq_l
                        t_l = jnp.where(tn_l > t_min, tn_l, -b_l + sq_l)
                        lh = (disc_l > 0.0) & (t_l > t_min)
                        ctm = jnp.sqrt(jnp.maximum(
                            1.0 - radl * radl / jnp.maximum(d2l, 1e-20),
                            1e-20))
                        solid = (2.0 * math.pi) * (1.0 - ctm)
                        pdf_l = 1.0 / jnp.maximum(solid, 1e-20)
                    acc_pdf = acc_pdf + jnp.where(lh, pdf_l, 0.0)
                pdf_val = 0.5 * cpdf + 0.5 * acc_pdf * (1.0 / L)
                lam_ok = pdf_val > 0.0
                lam_w = jnp.where(lam_ok,
                                  cpdf / jnp.where(lam_ok, pdf_val, 1.0),
                                  0.0)
                lamx, lamy, lamz = mdx, mdy, mdz

            # ---- mirror reflection + metal/iso ball + dielectric ----
            ddn = dx * nx_ + dy * ny_ + dz * nz_
            rfx = dx - 2.0 * ddn * nx_
            rfy = dy - 2.0 * ddn * ny_
            rfz = dz - 2.0 * ddn * nz_
            if cfg.has_metal or cfg.has_iso:
                zb = 1.0 - 2.0 * u[:, 2, :]
                rb = jnp.sqrt(jnp.maximum(1.0 - zb * zb, 0.0))
                cpb, spb = mk._cossin2pi(u[:, 3, :])
                radb = jnp.exp(jnp.log(jnp.maximum(u[:, 4, :], 1e-30))
                               * (1.0 / 3.0))
                ballx = rb * cpb * radb
                bally = rb * spb * radb
                ballz = zb * radb
            if cfg.has_metal:
                mex = rfx + fuzz_v * ballx
                mey = rfy + fuzz_v * bally
                mez = rfz + fuzz_v * ballz
            else:
                mex, mey, mez = rfx, rfy, rfz
            if cfg.has_dielectric:
                ridx = ridx_v
                inside = ddn > 0.0
                sgn = jnp.where(inside, -1.0, 1.0)
                onx = sgn * nx_
                ony = sgn * ny_
                onz = sgn * nz_
                nint = jnp.where(inside, ridx,
                                 1.0 / jnp.maximum(ridx, 1e-6))
                cos_exit2 = 1.0 - ridx * ridx * (1.0 - ddn * ddn)
                cos_exit = jnp.sqrt(jnp.maximum(cos_exit2, 1e-30))
                cosine = jnp.where(inside, cos_exit, -ddn)
                dt_ = dx * onx + dy * ony + dz * onz
                disc_r = 1.0 - nint * nint * (1.0 - dt_ * dt_)
                canr = disc_r > 0.0
                sqr = jnp.sqrt(jnp.maximum(disc_r, 1e-30))
                refx = nint * (dx - onx * dt_) - onx * sqr
                refy = nint * (dy - ony * dt_) - ony * sqr
                refz = nint * (dz - onz * dt_) - onz * sqr
                r0 = (1.0 - ridx) / (1.0 + ridx)
                r0 = r0 * r0
                omc = 1.0 - cosine
                omc2 = omc * omc
                schl = r0 + (1.0 - r0) * omc2 * omc2 * omc
                rp = jnp.where(canr, schl, 1.0)
                coin = u[:, 5, :] < rp
                dex = jnp.where(coin, rfx, refx)
                dey = jnp.where(coin, rfy, refy)
                dez = jnp.where(coin, rfz, refz)
            else:
                dex, dey, dez = rfx, rfy, rfz

            # ---- material select + throughput + termination (mirrors the
            # kernel's masked branches) ----
            is_lam = mtype < 0.5
            is_metal = (mtype > 0.5) & (mtype < 1.5)
            is_diel = ((mtype > 1.5) & (mtype < 2.5)
                       if (cfg.has_light or cfg.has_iso) else mtype > 1.5)
            ndx = jnp.where(is_lam, lamx, jnp.where(is_metal, mex, dex))
            ndy = jnp.where(is_lam, lamy, jnp.where(is_metal, mey, dey))
            ndz = jnp.where(is_lam, lamz, jnp.where(is_metal, mez, dez))
            if cfg.has_iso:
                is_iso = mtype > 3.5
                ndx = jnp.where(is_iso, ballx, ndx)
                ndy = jnp.where(is_iso, bally, ndy)
                ndz = jnp.where(is_iso, ballz, ndz)
            ninv = lax.rsqrt(ndx * ndx + ndy * ndy + ndz * ndz + 1e-30)
            ndx = ndx * ninv
            ndy = ndy * ninv
            ndz = ndz * ninv
            if lam_w is not None:
                albx = jnp.where(is_lam, albx * lam_w, albx)
                alby = jnp.where(is_lam, alby * lam_w, alby)
                albz = jnp.where(is_lam, albz * lam_w, albz)
            wx = jnp.where(is_diel, 1.0, albx)
            wy = jnp.where(is_diel, 1.0, alby)
            wz = jnp.where(is_diel, 1.0, albz)
            scatter_ok = jnp.logical_or(jnp.logical_not(is_lam), lam_ok)
            if cfg.has_light:
                is_li = ((mtype > 2.5) & (mtype < 3.5) if cfg.has_iso
                         else mtype > 2.5)
                emitm = active & hit & is_li & (ddn > 0.0)
                rx = rx + jnp.where(emitm, tpx * albx, 0.0)
                ry = ry + jnp.where(emitm, tpy * alby, 0.0)
                rz = rz + jnp.where(emitm, tpz * albz, 0.0)
                scatter_ok = scatter_ok & jnp.logical_not(is_li)
            miss = active & jnp.logical_not(hit)
            if cfg.bg_gradient:
                tbg = 0.5 * (dy + 1.0)
                bgx = (1.0 - tbg) + tbg * 0.5
                bgy = (1.0 - tbg) + tbg * 0.7
                bgz = jnp.ones_like(tbg)
                rx = rx + jnp.where(miss, tpx * bgx, 0.0)
                ry = ry + jnp.where(miss, tpy * bgy, 0.0)
                rz = rz + jnp.where(miss, tpz * bgz, 0.0)
            live = active & hit
            tpx = jnp.where(live, tpx * wx, tpx)
            tpy = jnp.where(live, tpy * wy, tpy)
            tpz = jnp.where(live, tpz * wz, tpz)
            tpmax = jnp.maximum(tpx, jnp.maximum(tpy, tpz))
            alive = live & scatter_ok & (tpmax > 0.0)
            assert cfg.rr_depth is None, "tape replay assumes no RR"
            depth = depth + 1.0
            alive = alive & (depth < float(cfg.max_depth))
            finished = active & jnp.logical_not(alive)
            ax = ax + jnp.where(finished, rx, 0.0)
            ay = ay + jnp.where(finished, ry, 0.0)
            az = az + jnp.where(finished, rz, 0.0)
            done = done + jnp.where(finished, 1.0, 0.0)
            gox, goy, goz, gdx, gdy, gdz, gtm = gen_rays(it)
            ox = jnp.where(alive, px_, gox)
            oy = jnp.where(alive, py_, goy)
            oz = jnp.where(alive, pz_, goz)
            dx = jnp.where(alive, ndx, gdx)
            dy = jnp.where(alive, ndy, gdy)
            dz = jnp.where(alive, ndz, gdz)
            time = jnp.where(alive, time, gtm)
            tpx = jnp.where(alive, tpx, 1.0)
            tpy = jnp.where(alive, tpy, 1.0)
            tpz = jnp.where(alive, tpz, 1.0)
            rx = jnp.where(alive, rx, 0.0)
            ry = jnp.where(alive, ry, 0.0)
            rz = jnp.where(alive, rz, 0.0)
            depth = jnp.where(alive, depth, 0.0)
            return (ox, oy, oz, dx, dy, dz, time, tpx, tpy, tpz,
                    rx, ry, rz, depth, done, ax, ay, az), None

        ox0, oy0, oz0, dx0, dy0, dz0, tm0 = gen_rays(jnp.int32(-1))
        one = jnp.ones((n_tiles, T), RT)
        zero = jnp.zeros((n_tiles, T), RT)
        state0 = (ox0, oy0, oz0, dx0, dy0, dz0, tm0, one, one, one,
                  zero, zero, zero, zero,
                  jnp.where(valid, 0.0, spp), zero, zero, zero)
        its = jnp.arange(n_iters, dtype=jnp.int32)
        tape_t = tape.transpose(1, 0, 2)           # (n_iters, n_t, T)
        state, _ = lax.scan(step, state0, (its, tape_t))
        ax, ay, az = state[-3], state[-2], state[-1]
        return jnp.stack([ax, ay, az], axis=-1)    # (n_t, T, 3) raw sums

    def replay(scene: st.Scene, tape, seed_arr):
        sums = replay_lanes(scene, tape, seed_arr, ctx["pixf"])
        image = (sums.reshape(n_tiles * T, 3)[inv].reshape(ny, nx, 3)
                 / float(ctx["spp"]))
        return image

    replay.lanes = replay_lanes
    return replay


def build_tables_traced(scene: st.Scene, base: st.Scene, meta: dict):
    """Traced (jit-able, differentiable) twin of megakernel.build_tables
    under meta's pinned slot layout: the 8 kernel tables as jnp values of
    the TRACED scene's parameters, with every structural decision (slot
    order, material/texture indices, axis codes, light kinds) read from
    the CONCRETE `base` scene the plan was built on.

    This is what makes a fully device-resident inverse-rendering step
    possible: the eager build_tables pulls the scene to the host and
    re-uploads 8 arrays per step — through a remote TPU tunnel that is
    ~28 ms per transfer and measured as ~2x the whole step
    (docs/inverse_render_tpu_r03.json). Here the tables are ordinary XLA
    ops inside the step's jit, so re-taping at updated parameters costs a
    few fused gathers. Numerics mirror build_tables row for row (pad
    fills, guarded reciprocals, hi/lo-bf16 atlas split) so the kernel
    consumes identical tables either way."""
    slot = np.asarray(meta["slot_ext"], np.int64)          # (S,) static
    S = slot.size
    actm = slot >= 0
    safe_i = np.where(actm, slot, 0)
    actf = jnp.asarray(actm.astype(np.float32))

    def pad(x, fill=0.0):
        x = jnp.asarray(x, jnp.float32)
        if not actm.any() or x.shape[0] == 0:  # no live spheres: all fill
            return jnp.full((S,) + x.shape[1:], jnp.float32(fill))
        g = jnp.take(x, safe_i, axis=0)
        m = actm if g.ndim == 1 else actm[:, None]
        return jnp.where(jnp.asarray(m), g, jnp.float32(fill))

    sph = scene.spheres
    mats = scene.materials
    tex = scene.textures
    c0p = pad(sph.center0)
    c1p = pad(sph.center1)
    t0p = pad(sph.time0)
    t1p = pad(sph.time1, 1.0)
    radp = pad(sph.radius)
    dt = t1p - t0p
    idt = jnp.where(dt != 0.0, 1.0 / jnp.where(dt != 0.0, dt, 1.0), 0.0)
    dc = c1p - c0p
    r2 = jnp.where(actf > 0, radp * radp, -1.0)

    sph_tab = jnp.zeros((S, mk.SPH_LANES), jnp.float32)
    for lane, v in ((mk.C_CX, c0p[:, 0]), (mk.C_CY, c0p[:, 1]),
                    (mk.C_CZ, c0p[:, 2]), (mk.C_DCX, dc[:, 0]),
                    (mk.C_DCY, dc[:, 1]), (mk.C_DCZ, dc[:, 2]),
                    (mk.C_T0, t0p), (mk.C_IDT, idt), (mk.C_R2, r2),
                    (mk.C_ACT, actf), (mk.C_NR2, -r2)):
        sph_tab = sph_tab.at[:, lane].set(v)

    # ---- attribute table: structure from base, values traced ----
    base_mat = np.asarray(base.spheres.mat, np.int64)
    matp = (np.where(actm, base_mat[safe_i], 0) if base_mat.size
            else np.zeros(S, np.int64))                    # static (S,)
    ti = np.asarray(base.materials.tex, np.int64)[matp]
    ttype_np = np.asarray(base.textures.ttype, np.int64)
    nmode_np = np.asarray(base.textures.noise_mode)
    mtype_np = np.asarray(base.materials.mtype, np.int64)[matp]
    mtype = jnp.asarray(mtype_np.astype(np.float32))
    alb = jnp.take(tex.color, jnp.asarray(ti), axis=0)
    fuzz = jnp.take(mats.fuzz, jnp.asarray(matp))
    ridx = jnp.take(mats.ref_idx, jnp.asarray(matp))
    rinv = jnp.where(radp != 0.0,
                     1.0 / jnp.where(radp != 0.0, radp, 1.0), 0.0)
    chk = jnp.asarray((ttype_np[ti] == st.TEX_CHECKER)
                      .astype(np.float32))
    evc = jnp.take(tex.color,
                   jnp.asarray(np.asarray(base.textures.even,
                                          np.int64)[ti]), axis=0)
    odc = jnp.take(tex.color,
                   jnp.asarray(np.asarray(base.textures.odd,
                                          np.int64)[ti]), axis=0)
    is_noi = ttype_np[ti] == st.TEX_NOISE
    noi = jnp.asarray(np.where(is_noi, 1.0 + nmode_np[ti], 0.0)
                      .astype(np.float32))
    nscale = jnp.take(tex.scale, jnp.asarray(ti))
    is_img = ttype_np[ti] == st.TEX_IMAGE
    imgf = np.where(is_img,
                    1.0 + np.asarray(base.textures.image_id)[ti], 0.0)
    imgf = jnp.asarray(np.where(actm, imgf, 0.0).astype(np.float32))
    mparam = jnp.where(jnp.asarray(mtype_np == st.MAT_METAL), fuzz,
                       jnp.where(jnp.asarray(
                           mtype_np == st.MAT_DIELECTRIC), ridx, 0.0))
    attr_tab = jnp.zeros((mk.A_ROWS, S), jnp.float32)
    for row, v in ((mk.A_CX, c0p[:, 0]), (mk.A_CY, c0p[:, 1]),
                   (mk.A_CZ, c0p[:, 2]), (mk.A_DCX, dc[:, 0]),
                   (mk.A_DCY, dc[:, 1]), (mk.A_DCZ, dc[:, 2]),
                   (mk.A_T0, t0p), (mk.A_IDT, idt), (mk.A_RINV, rinv),
                   (mk.A_MTYPE, mtype),
                   (mk.A_ALBX, alb[:, 0]), (mk.A_ALBY, alb[:, 1]),
                   (mk.A_ALBZ, alb[:, 2]), (mk.A_MPARAM, mparam),
                   (mk.A_CHK, chk), (mk.A_NSCALE, nscale),
                   (mk.A_NOISE, noi),
                   (mk.A_EVENX, evc[:, 0]), (mk.A_EVENY, evc[:, 1]),
                   (mk.A_EVENZ, evc[:, 2]),
                   (mk.A_ODDX, odc[:, 0]), (mk.A_ODDY, odc[:, 1]),
                   (mk.A_ODDZ, odc[:, 2]), (mk.A_IMG, imgf)):
        attr_tab = attr_tab.at[row].set(v)

    # ---- cluster AABBs from the CURRENT (traced) geometry ----
    C, SB = meta["C"], meta["SB"]
    absr = jnp.abs(radp)
    los = jnp.minimum(c0p, c1p) - absr[:, None]
    his = jnp.maximum(c0p, c1p) + absr[:, None]
    los = jnp.where(actf[:, None] > 0, los, jnp.inf)
    his = jnp.where(actf[:, None] > 0, his, -jnp.inf)
    lmin = los.reshape(C, SB, 3).min(axis=1)
    lmax = his.reshape(C, SB, 3).max(axis=1)
    Cg, sg = meta["Cg"], meta["sg"]
    clus_tab = jnp.zeros((C + Cg, mk.CLUS_LANES), jnp.float32)
    clus_tab = clus_tab.at[:C, mk.K_MINX:mk.K_MINZ + 1].set(lmin)
    clus_tab = clus_tab.at[:C, mk.K_MAXX:mk.K_MAXZ + 1].set(lmax)
    if Cg:
        padg = Cg * sg - C
        gmin = jnp.pad(lmin, ((0, padg), (0, 0)),
                       constant_values=np.inf).reshape(Cg, sg, 3).min(1)
        gmax = jnp.pad(lmax, ((0, padg), (0, 0)),
                       constant_values=-np.inf).reshape(Cg, sg, 3).max(1)
        clus_tab = clus_tab.at[C:, mk.K_MINX:mk.K_MINZ + 1].set(gmin)
        clus_tab = clus_tab.at[C:, mk.K_MAXX:mk.K_MAXZ + 1].set(gmax)

    # ---- rect table (rows static via meta["rect_rows"]) ----
    rects = scene.rects
    R = meta["R"]
    rect_tab = jnp.zeros((max(R, 1), mk.RECT_LANES), jnp.float32)
    if R:
        rr = np.asarray(meta["rect_rows"], np.int64)
        rj = jnp.asarray(rr)
        a0 = jnp.take(rects.a0, rj)
        a1 = jnp.take(rects.a1, rj)
        b0 = jnp.take(rects.b0, rj)
        b1 = jnp.take(rects.b1, rj)
        kk = jnp.take(rects.k, rj)
        ct = jnp.take(rects.cos_t, rj)
        st_ = jnp.take(rects.sin_t, rj)
        off = jnp.take(rects.offset, rj, axis=0)
        fl = jnp.take(rects.flip, rj)
        ax_np = np.asarray(base.rects.axis, np.int64)[rr]
        mi = np.asarray(base.rects.mat, np.int64)[rr]
        ti_r = np.asarray(base.materials.tex, np.int64)[mi]
        tt_r = ttype_np[ti_r]
        # object normal by static axis code * traced flip, rotated
        n_ox = fl * jnp.asarray((ax_np == 2).astype(np.float32))
        n_oy = fl * jnp.asarray((ax_np == 1).astype(np.float32))
        n_oz = fl * jnp.asarray((ax_np == 0).astype(np.float32))
        nwx = ct * n_ox + st_ * n_oz
        nwz = -st_ * n_ox + ct * n_oz
        da = a1 - a0
        db = b1 - b0
        ida = jnp.where(da != 0.0,
                        1.0 / jnp.where(da != 0.0, da, 1.0), 0.0)
        idb = jnp.where(db != 0.0,
                        1.0 / jnp.where(db != 0.0, db, 1.0), 0.0)
        alb_r = jnp.take(tex.color, jnp.asarray(ti_r), axis=0)
        chk_m = jnp.asarray((tt_r == st.TEX_CHECKER)
                            .astype(np.float32))
        ev_r = jnp.take(tex.color, jnp.asarray(
            np.asarray(base.textures.even, np.int64)[ti_r]), axis=0)
        od_r = jnp.take(tex.color, jnp.asarray(
            np.asarray(base.textures.odd, np.int64)[ti_r]), axis=0)
        noi_r = jnp.asarray(np.where(tt_r == st.TEX_NOISE,
                                     1.0 + nmode_np[ti_r], 0.0)
                            .astype(np.float32))
        nsc_r = jnp.where(jnp.asarray(tt_r == st.TEX_NOISE),
                          jnp.take(tex.scale, jnp.asarray(ti_r)), 0.0)
        img_r = jnp.asarray(np.where(
            tt_r == st.TEX_IMAGE,
            1.0 + np.asarray(base.textures.image_id)[ti_r],
            0.0).astype(np.float32))
        for lane, v in ((mk.RT_A0, a0), (mk.RT_A1, a1), (mk.RT_B0, b0),
                        (mk.RT_B1, b1), (mk.RT_K, kk), (mk.RT_COS, ct),
                        (mk.RT_SIN, st_),
                        (mk.RT_OFFX, off[:, 0]), (mk.RT_OFFY, off[:, 1]),
                        (mk.RT_OFFZ, off[:, 2]),
                        (mk.RT_NX, nwx), (mk.RT_NY, n_oy),
                        (mk.RT_NZ, nwz),
                        (mk.RT_MTYPE, jnp.asarray(
                            np.asarray(base.materials.mtype)[mi]
                            .astype(np.float32))),
                        (mk.RT_ALBX, alb_r[:, 0]),
                        (mk.RT_ALBY, alb_r[:, 1]),
                        (mk.RT_ALBZ, alb_r[:, 2]),
                        (mk.RT_FUZZ, jnp.take(mats.fuzz,
                                              jnp.asarray(mi))),
                        (mk.RT_RIDX, jnp.take(mats.ref_idx,
                                              jnp.asarray(mi))),
                        (mk.RT_CHK, chk_m),
                        (mk.RT_EVENX, ev_r[:, 0] * chk_m),
                        (mk.RT_EVENY, ev_r[:, 1] * chk_m),
                        (mk.RT_EVENZ, ev_r[:, 2] * chk_m),
                        (mk.RT_ODDX, od_r[:, 0] * chk_m),
                        (mk.RT_ODDY, od_r[:, 1] * chk_m),
                        (mk.RT_ODDZ, od_r[:, 2] * chk_m),
                        (mk.RT_NOI, noi_r), (mk.RT_NSC, nsc_r),
                        (mk.RT_IMG, img_r),
                        (mk.RT_IDA, ida), (mk.RT_IDB, idb)):
            rect_tab = rect_tab.at[:R, lane].set(v)

    # ---- light table (kinds/rows static) ----
    L = meta["L"]
    light_tab = jnp.zeros((max(L, 1), mk.LIGHT_LANES), jnp.float32)
    for i in range(L):
        li = int(meta["light_rows"][i])
        if meta["light_kinds"][i] == st.LIGHT_RECT:
            la0, la1 = rects.a0[li], rects.a1[li]
            lb0, lb1 = rects.b0[li], rects.b1[li]
            for lane, v in ((mk.LT_A0, la0), (mk.LT_A1, la1),
                            (mk.LT_B0, lb0), (mk.LT_B1, lb1),
                            (mk.LT_K, rects.k[li]),
                            (mk.LT_COS, rects.cos_t[li]),
                            (mk.LT_SIN, rects.sin_t[li]),
                            (mk.LT_OFFX, rects.offset[li, 0]),
                            (mk.LT_OFFY, rects.offset[li, 1]),
                            (mk.LT_OFFZ, rects.offset[li, 2]),
                            (mk.LT_AREA, (la1 - la0) * (lb1 - lb0))):
                light_tab = light_tab.at[i, lane].set(v)
        else:
            for lane, v in ((mk.LT_CX, sph.center0[li, 0]),
                            (mk.LT_CY, sph.center0[li, 1]),
                            (mk.LT_CZ, sph.center0[li, 2]),
                            (mk.LT_RAD, sph.radius[li])):
                light_tab = light_tab.at[i, lane].set(v)

    # ---- medium table (rows/kinds static) ----
    V = meta["V"]
    media = scene.media
    med_tab = jnp.zeros((max(V, 1), mk.MED_LANES), jnp.float32)
    if V:
        vr = np.asarray(meta["med_rows"], np.int64)
        vj = jnp.asarray(vr)
        p0 = jnp.take(media.p0, vj, axis=0)
        p1 = jnp.take(media.p1, vj, axis=0)
        moff = jnp.take(media.offset, vj, axis=0)
        mi_v = np.asarray(base.media.mat, np.int64)[vr]
        ti_v = np.asarray(base.materials.tex, np.int64)[mi_v]
        tt_v = ttype_np[ti_v]
        alb_v = jnp.take(tex.color, jnp.asarray(ti_v), axis=0)
        noi_v = jnp.asarray(np.where(tt_v == st.TEX_NOISE,
                                     1.0 + nmode_np[ti_v], 0.0)
                            .astype(np.float32))
        nsc_v = jnp.where(jnp.asarray(tt_v == st.TEX_NOISE),
                          jnp.take(tex.scale, jnp.asarray(ti_v)), 0.0)
        img_v = jnp.asarray(np.where(
            tt_v == st.TEX_IMAGE,
            1.0 + np.asarray(base.textures.image_id)[ti_v],
            0.0).astype(np.float32))
        for lane, v in ((mk.MD_P0X, p0[:, 0]), (mk.MD_P0Y, p0[:, 1]),
                        (mk.MD_P0Z, p0[:, 2]), (mk.MD_P1X, p1[:, 0]),
                        (mk.MD_P1Y, p1[:, 1]), (mk.MD_P1Z, p1[:, 2]),
                        (mk.MD_COS, jnp.take(media.cos_t, vj)),
                        (mk.MD_SIN, jnp.take(media.sin_t, vj)),
                        (mk.MD_OFFX, moff[:, 0]),
                        (mk.MD_OFFY, moff[:, 1]),
                        (mk.MD_OFFZ, moff[:, 2]),
                        (mk.MD_NIRHO,
                         -1.0 / jnp.take(media.density, vj)),
                        (mk.MD_ALBX, alb_v[:, 0]),
                        (mk.MD_ALBY, alb_v[:, 1]),
                        (mk.MD_ALBZ, alb_v[:, 2]),
                        (mk.MD_NOI, noi_v), (mk.MD_NSC, nsc_v),
                        (mk.MD_IMG, img_v)):
            med_tab = med_tab.at[:V, lane].set(v)

    # ---- image atlas (hi/lo-bf16 planes, same layout as build_tables
    # under byte_ok=False — tape plans never take the byte atlas, so the
    # traced twin only mirrors the hi/lo split) ----
    if meta["has_image"]:
        n_img, Hp, Wp = meta["n_img"], meta["img_hp"], meta["img_wp"]
        imgs = tex.images.astype(jnp.float32)          # (I, Hm, Wm, 3)
        h_m, w_m = imgs.shape[1], imgs.shape[2]
        hi = imgs.astype(jnp.bfloat16)
        lo = (imgs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        planes = jnp.concatenate([hi.transpose(0, 3, 1, 2),
                                  lo.transpose(0, 3, 1, 2)],
                                 axis=1)               # (I, 6, Hm, Wm)
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, Hp - h_m),
                                  (0, Wp - w_m)))
        img_tab = planes.reshape(n_img * 6 * Hp, Wp)
    else:
        img_tab = jnp.zeros((16, 128), jnp.bfloat16)

    cam = scene.camera
    cam_vec = jnp.zeros((1, 128), jnp.float32)
    for lane, v in ((mk.CAM_OX, cam.origin),
                    (mk.CAM_LLX, cam.lower_left_corner),
                    (mk.CAM_HX, cam.horizontal),
                    (mk.CAM_VX, cam.vertical),
                    (mk.CAM_UX, cam.u), (mk.CAM_WX, cam.v)):
        cam_vec = cam_vec.at[0, lane:lane + 3].set(
            jnp.asarray(v, jnp.float32))
    cam_vec = cam_vec.at[0, mk.CAM_LENS].set(cam.lens_radius)
    cam_vec = cam_vec.at[0, mk.CAM_T0].set(cam.time0)
    cam_vec = cam_vec.at[0, mk.CAM_T1].set(cam.time1)

    return (sph_tab, attr_tab, clus_tab, rect_tab, light_tab, med_tab,
            img_tab, cam_vec)


def render_diff_mega(scene: st.Scene, key, nx: int, ny: int, spp: int,
                     max_depth: int = 8, T: int = 1024,
                     interpret: bool | None = None):
    """Value + differentiable-closure convenience: runs the tape forward
    once on the CONCRETE scene, returns (image, diff_fn) where
    diff_fn(traced_scene) -> image is reverse-mode differentiable with the
    path decisions frozen at `scene` (the detached-decision semantics of
    grad.render_diff, at megakernel speed)."""
    if interpret is None:
        interpret = jax.default_backend() in ("cpu", "gpu")
    ctx = plan_tape(scene, nx, ny, spp, max_depth=max_depth, T=T)
    image, tape, seed = tape_forward(key, ctx, interpret=interpret)
    replay = make_replay(ctx)
    return image, partial(replay, tape=tape, seed_arr=seed)


def _tape_launch(tabs8, pixf, seed, cfg, n_tiles, interpret):
    """Kernel tape launch from (already stop-gradient'd) traced tables."""
    (sph_t, attr_t, clus_t, rect_t, light_t, med_t, img_t, cam_v) = tabs8
    out = mk._mega_call(pixf, cam_v, sph_t, attr_t, clus_t, rect_t,
                        light_t, med_t, jnp.asarray(mk._PERM_B),
                        jnp.asarray(mk._RV_HI), jnp.asarray(mk._RV_LO),
                        img_t, seed, cfg=cfg, n_tiles=n_tiles,
                        interpret=interpret)
    return out[:, 8:, :]                      # (n_tiles, n_iters, T)


def fit_scene_params_mega(scene: st.Scene, target, *, get_params,
                          set_params, key, nx: int, ny: int, spp: int,
                          max_depth: int = 8, steps: int = 50,
                          lr: float = 0.05, T: int = 1024,
                          postprocess=None, log_fn=None,
                          interpret: bool | None = None, mesh=None):
    """Inverse rendering on the megakernel path, fully device-resident:
    the WHOLE optimization (per step: traced table rebuild at the current
    params -> one tape-mode kernel launch re-freezing the path decisions
    -> one replay value_and_grad -> the Adam update) runs as a single
    lax.scan inside one jit. Round 3's loop re-taped eagerly on the host
    — build_tables + 8 device uploads per step through a ~28 ms-per-
    transfer tunnel measured as ~2x the step itself
    (docs/inverse_render_tpu_r03.json); build_tables_traced removes every
    per-step host round-trip. Returns (fitted scene, final loss).

    `postprocess` (if given) runs inside the jit — it must be traceable.
    `log_fn(i, loss)` is called after the fit with the recorded per-step
    losses (the loop itself never syncs with the host).

    With `mesh` (a (dp, sp) jax.sharding.Mesh), the step is sharded:
    image row-tiles over "dp", samples over "sp" (each sp shard traces
    spp/sp samples under its own seed), one psum of the radiance lanes
    over "sp" and of the squared error over "dp", gradients pmean'd by
    the same psums' transposes — BASELINE.md's inverse-rendering axis at
    multi-chip scale (reference math: material.h:142-225)."""
    import optax

    if interpret is None:
        interpret = jax.default_backend() in ("cpu", "gpu")
    opt = optax.adam(lr)
    params0 = get_params(scene)
    target = jnp.asarray(target, jnp.float32)
    seed = jax.random.randint(key, (1, 1), 0, np.int32(2 ** 31 - 1),
                              dtype=jnp.int32)
    base = scene

    if mesh is not None:
        vg, aux = make_sharded_value_and_grad(
            scene, mesh, target, nx=nx, ny=ny, spp=spp,
            max_depth=max_depth, T=T, set_params=set_params,
            interpret=interpret)

        def one_step(carry, _):
            params, opt_state = carry
            loss, g = vg(params, seed)
            updates, opt_state = opt.update(g, opt_state)
            params = optax.apply_updates(params, updates)
            if postprocess is not None:
                params = postprocess(params)
            return (params, opt_state), loss

        @jax.jit
        def run(p0, s0):
            return lax.scan(one_step, (p0, s0), None, length=steps)

        (params, _), losses = run(params0, opt.init(params0))
    else:
        ctx = plan_tape(scene, nx, ny, spp, max_depth=max_depth, T=T)
        replay = make_replay(ctx)
        cfg, n_tiles, pixf = ctx["cfg"], ctx["n_tiles"], ctx["pixf"]
        meta = ctx["meta"]

        def one_step(carry, _):
            params, opt_state = carry
            tabs8 = jax.tree_util.tree_map(
                lax.stop_gradient,
                build_tables_traced(set_params(base, params), base, meta))
            tape = _tape_launch(tabs8, pixf, seed, cfg, n_tiles, interpret)

            def loss_fn(p):
                img = replay(set_params(base, p), tape, seed)
                return jnp.mean((img - target) ** 2)

            loss, g = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(g, opt_state)
            params = optax.apply_updates(params, updates)
            if postprocess is not None:
                params = postprocess(params)
            return (params, opt_state), loss

        @jax.jit
        def run(p0, s0):
            return lax.scan(one_step, (p0, s0), None, length=steps)

        (params, _), losses = run(params0, opt.init(params0))

    losses = np.asarray(losses)
    if log_fn is not None:
        for i in range(steps):
            log_fn(i, float(losses[i]))
    return set_params(scene, params), float(losses[-1])


# distinct per-shard RNG stream offsets (any odd constants work: the
# in-kernel lowbias32 hash fully avalanches the seed)
_DP_SEED = np.int32(7919)
_SP_SEED = np.int32(104729)


def make_sharded_value_and_grad(scene: st.Scene, mesh, target, *, nx: int,
                                ny: int, spp: int, max_depth: int = 8,
                                T: int = 1024, set_params,
                                interpret: bool | None = None):
    """Build the (dp, sp)-sharded tape+replay value_and_grad:
    vg(params, seed) -> (loss, grads), both replicated. Per device: its
    row tile's tape-mode kernel launch (spp/sp samples, per-shard seed),
    its replay lanes, one psum of lanes over "sp" (the spp-sharded pixel
    accumulation of SURVEY.md §2.3), one psum of squared error over "dp",
    and a psum-transpose gradient all-reduce over both axes. Also returns
    an aux dict (ctx pieces) for tests."""
    from functools import partial
    from jax.sharding import PartitionSpec as P

    if interpret is None:
        interpret = jax.default_backend() in ("cpu", "gpu")
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    assert ny % dp == 0, f"ny={ny} must divide by dp={dp}"
    assert spp % sp == 0, f"spp={spp} must divide by sp={sp}"
    rows = ny // dp
    spp_shard = spp // sp
    # full-image cfg (camera u/v need absolute pixel coords and full ny);
    # per-device pixel layout covers one rows-tall tile, j offset inside
    # shard_map by the device's "dp" index (as render_sharded_mega does)
    tabs, cfg, T_, _k = mk.make_plan(scene, nx, ny, spp_shard,
                                     max_depth=max_depth, rr_depth=None,
                                     T=T, tape=True)
    meta = tabs[-1]
    pixf_l, _inv = mk._pixel_layout(nx, rows, T_, 1)
    n_tiles_l = pixf_l.shape[0]
    ctx = dict(tabs=tabs, cfg=cfg, meta=meta, pixf=pixf_l, inv=None,
               n_tiles=n_tiles_l, T=T_, nx=nx, ny=ny, spp=spp_shard,
               max_depth=max_depth)
    replay = make_replay(ctx)

    # per-dp-shard target in lane layout (pad lanes zeroed)
    pix_np = np.asarray(pixf_l)
    ii = pix_np[:, 0, :].astype(np.int64)
    jj = pix_np[:, 1, :].astype(np.int64)
    val = pix_np[:, 2, :] > 0
    tgt_np = np.asarray(target, np.float32)
    tgt = np.zeros((dp, n_tiles_l, T_, 3), np.float32)
    for di in range(dp):
        tl = tgt_np[np.clip(jj + di * rows, 0, ny - 1),
                    np.clip(ii, 0, nx - 1)]
        tgt[di] = np.where(val[..., None], tl, 0.0)
    tgt = jnp.asarray(tgt)
    valid_l = jnp.asarray(val)
    pixf_j = jnp.asarray(pixf_l)
    base = scene
    denom = float(ny * nx * 3)
    spp_total = float(spp)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P("dp"), P()), out_specs=(P(), P()),
             check_vma=False)
    def vg_sharded(params, tgt_sh, seed):
        tgt_dev = tgt_sh[0]                        # (n_tiles_l, T, 3)
        di = lax.axis_index("dp")
        si = lax.axis_index("sp")
        seed_dev = seed + di * _DP_SEED + si * _SP_SEED
        pixf_dev = pixf_j.at[:, 1, :].add((di * rows)
                                          .astype(jnp.float32))
        tabs8 = jax.tree_util.tree_map(
            lax.stop_gradient,
            build_tables_traced(set_params(base, params), base, meta))
        tape = _tape_launch(tabs8, pixf_dev, seed_dev, cfg, n_tiles_l,
                            interpret)

        def loss_fn(p):
            lanes = replay.lanes(set_params(base, p), tape, seed_dev,
                                 pixf_dev)
            img = lax.psum(lanes, "sp") / spp_total
            diff = jnp.where(valid_l[..., None], img - tgt_dev, 0.0)
            return lax.psum(jnp.sum(diff * diff), "dp") / denom

        loss, g = jax.value_and_grad(loss_fn)(params)
        # the in-loss psums transpose to psums, so g is ALREADY the full
        # cross-shard gradient on every device (verified against the
        # sequential emulation in tests); pmean is the idempotent
        # all-reduce that keeps it replicated without re-summing
        g = jax.tree_util.tree_map(
            lambda x: lax.pmean(lax.pmean(x, "dp"), "sp"), g)
        return loss, g

    def vg(params, seed):
        return vg_sharded(params, tgt, seed)

    aux = dict(ctx=ctx, replay=replay, pixf_l=pixf_j, tgt=tgt,
               valid=valid_l, rows=rows, spp_shard=spp_shard, dp=dp,
               sp=sp, cfg=cfg, meta=meta, n_tiles_l=n_tiles_l)
    return vg, aux


# meta fields the launch cfg was specialized on: a re-tape whose rebuilt
# meta disagrees here would run the kernel with stale static branches
_CFG_STATIC_KEYS = ("S", "C", "SB", "sg", "Cg", "uniform_time",
                    "clus_moving", "moving", "lens", "has_metal",
                    "has_dielectric", "bg_gradient", "has_spheres",
                    "has_light", "has_checker", "has_noise", "noise_modes",
                    "has_image", "n_img", "img_hw", "has_iso", "R", "L",
                    "V", "light_kinds", "light_axes", "light_rot",
                    "light_trans", "med_kinds", "med_rot", "med_trans")


def _retabbed(ctx, scene):
    """ctx with tables rebuilt for an updated concrete scene under the
    ORIGINAL slot layout (meta["slot_ext"] pins build_tables' ordering:
    the Morton sort and radius block reorder depend on geometry, so an
    unpinned rebuild could reshuffle slots mid-fit while the replay
    closure still decodes the tape with the original maps). Cluster AABBs
    are recomputed from the current geometry, so culling stays correct;
    the cfg-specialized static flags are asserted unchanged."""
    meta = ctx["meta"]
    # byte_ok=False: tape plans keep the hi/lo atlas (continuous texel
    # response for FD-validated texel gradients; megakernel._atlas_dims)
    tabs = mk.build_tables(scene, ctx["cfg"].SB, meta.get("sg", 0),
                           order_override=meta["slot_ext"],
                           byte_ok=False)
    new_meta = tabs[-1]
    for k in _CFG_STATIC_KEYS:
        if new_meta[k] != meta[k]:
            raise ValueError(
                f"re-tape changed static plan field {k!r}: "
                f"{meta[k]!r} -> {new_meta[k]!r}; parameter updates that "
                "flip kernel specialization (e.g. introducing motion or a "
                "new texture mode) need a fresh plan_tape")
    new = dict(ctx)
    new["tabs"] = tabs
    return new
