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
    gathers standing in for the intersection scan."""
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
    pixf = ctx["pixf"]
    px_i = pixf[:, 0, :]   # (n_tiles, T)
    px_j = pixf[:, 1, :]
    valid = pixf[:, 2, :] > 0.0
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    inv = ctx["inv"]

    def uni(n_rows, salt, seed, it):
        """(n_tiles, n_rows, T) uniforms, bit-identical to the kernel's."""
        return jax.vmap(
            lambda tl: mk._uniforms(n_rows, T, seed, tl, it, salt,
                                    bitcast=_BC))(tile_ids)

    def safe(pred, x, alt=1.0):
        return jnp.where(pred, x, alt)

    M_ = n_tiles * T

    def pack(d):
        """Stack a dict of (K,) rows into a (P, K) matrix + name index."""
        names = list(d)
        return (jnp.stack([jnp.asarray(d[n], jnp.float32) for n in names],
                          axis=0),
                {n: i for i, n in enumerate(names)})

    def extract(matx, idx_dict, idx):
        """One-hot MXU extraction of matx's columns at per-lane indices —
        the replay-side twin of the kernel's fused extraction. Gathers
        measure ~3.6 ms per million elements on this chip (CLAUDE.md) and
        the scan runs hundreds of steps, so per-step jnp.take was the
        whole replay cost (595 of 669 ms at 128x128x32); one (P, K)@(K, M)
        dot per winner class replaces ~25 of them, and its transpose (the
        backward) is a matmul instead of a scatter-add. HIGHEST precision
        = 6-pass bf16 = bit-exact for a one-hot RHS (3 bf16 terms span the
        full f32 mantissa)."""
        K = matx.shape[1]
        oh = (jax.lax.broadcasted_iota(jnp.int32, (K, M_), 0)
              == idx.reshape(1, M_)).astype(jnp.float32)
        out = jax.lax.dot_general(
            matx, oh, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        out = out.reshape(matx.shape[0], n_tiles, T)
        return lambda name: out[idx_dict[name]]

    def _mat_rows(mats, tex, mi):
        """Per-primitive material/texture rows (the traced analogue of
        build_tables' attribute baking), gathered ONCE per replay call."""
        ti = mats.tex[mi]
        col = tex.color[ti]
        tt = tex.ttype[ti]
        evc = tex.color[tex.even[ti]]
        odc = tex.color[tex.odd[ti]]
        return dict(
            mt=mats.mtype[mi].astype(jnp.float32),
            albx=col[:, 0], alby=col[:, 1], albz=col[:, 2],
            fz=mats.fuzz[mi], ri=mats.ref_idx[mi],
            noi=jnp.where(tt == st.TEX_NOISE,
                          1.0 + tex.noise_mode[ti].astype(jnp.float32),
                          0.0),
            nsc=tex.scale[ti],
            chk=(tt == st.TEX_CHECKER).astype(jnp.float32),
            evx=evc[:, 0], evy=evc[:, 1], evz=evc[:, 2],
            odx=odc[:, 0], ody=odc[:, 1], odz=odc[:, 2],
            img=jnp.where(tt == st.TEX_IMAGE,
                          1.0 + tex.image_id[ti].astype(jnp.float32),
                          0.0))

    def replay(scene: st.Scene, tape, seed_arr):
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
                      ax=rects.axis[rect_map].astype(jnp.float32),
                      fl=rects.flip[rect_map])
            dr.update(_mat_rows(mats, tex, rects.mat[rect_map]))
            rect_m, RIx = pack(dr)
        if V:
            mp0 = media.p0[med_map]
            mp1 = media.p1[med_map]
            moff_v = media.offset[med_map]
            dv = dict(kind=media.kind[med_map].astype(jnp.float32),
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
                offx = offy = offz = jnp.zeros((n_tiles, T), jnp.float32)
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

            one = jnp.ones((n_tiles, T), jnp.float32)
            zero = jnp.zeros((n_tiles, T), jnp.float32)
            best_t = jnp.full((n_tiles, T), BIG, jnp.float32)
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
                ocx = ox - scx
                ocy = oy - scy
                ocz = oz - scz
                b = ocx * dx + ocy * dy + ocz * dz
                cc = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
                disc = safe(is_sph, b * b - cc, 1.0)
                sq = jnp.sqrt(jnp.maximum(disc, 1e-30))
                tn = -b - sq
                t_s = jnp.where(tn > t_min, tn, -b + sq)
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

                mval = jnp.zeros((n_tiles, T), jnp.float32)
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
                i_t = (u_img * nxi.astype(jnp.float32)).astype(jnp.int32)
                j_t = ((1.0 - v_img) * nyi.astype(jnp.float32)
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
                ldx = ldy = ldz = jnp.zeros((n_tiles, T), jnp.float32)
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
                        one_t = jnp.ones((n_tiles, T), jnp.float32)
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
                acc_pdf = jnp.zeros((n_tiles, T), jnp.float32)
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
        one = jnp.ones((n_tiles, T), jnp.float32)
        zero = jnp.zeros((n_tiles, T), jnp.float32)
        state0 = (ox0, oy0, oz0, dx0, dy0, dz0, tm0, one, one, one,
                  zero, zero, zero, zero,
                  jnp.where(valid, 0.0, spp), zero, zero, zero)
        its = jnp.arange(n_iters, dtype=jnp.int32)
        tape_t = tape.transpose(1, 0, 2)           # (n_iters, n_tiles, T)
        state, _ = lax.scan(step, state0, (its, tape_t))
        ax, ay, az = state[-3], state[-2], state[-1]
        sums = jnp.stack([ax, ay, az], axis=-1).reshape(n_tiles * T, 3)
        image = sums[inv].reshape(ny, nx, 3) / float(ctx["spp"])
        return image

    return replay


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


def fit_scene_params_mega(scene: st.Scene, target, *, get_params,
                          set_params, key, nx: int, ny: int, spp: int,
                          max_depth: int = 8, steps: int = 50,
                          lr: float = 0.05, T: int = 1024,
                          postprocess=None, log_fn=None,
                          interpret: bool | None = None):
    """Inverse rendering on the megakernel path: per step, ONE tape-mode
    kernel launch at the current params (re-freezing the path decisions)
    plus one jit'd replay value_and_grad — the mega-backed counterpart of
    grad.fit_scene_params. Returns (fitted scene, final loss)."""
    import optax

    if interpret is None:
        interpret = jax.default_backend() in ("cpu", "gpu")
    ctx = plan_tape(scene, nx, ny, spp, max_depth=max_depth, T=T)
    replay = make_replay(ctx)

    @jax.jit
    def step_fn(params, base_scene, tape, seed):
        def loss_fn(p):
            img = replay(set_params(base_scene, p), tape, seed)
            return jnp.mean((img - target) ** 2)
        return jax.value_and_grad(loss_fn)(params)

    params = get_params(scene)
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    loss = None
    cur = scene
    for it in range(steps):
        # One key for every step keeps the per-step loss deterministic in
        # the params (the fixed-sample objective gradient descent actually
        # minimizes); pass a pre-split key stream via `key` folding if
        # fresh samples per step are wanted instead.
        k = key
        # re-tape at the current params: the kernel re-decides winners
        _img, tape, seed = tape_forward(k, _retabbed(ctx, cur),
                                        interpret=interpret)
        loss, g = step_fn(params, cur, tape, seed)
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        if postprocess is not None:
            params = postprocess(params)
        cur = set_params(scene, params)
        if log_fn is not None:
            log_fn(it, float(loss))
    return cur, float(loss)


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
    tabs = mk.build_tables(scene, ctx["cfg"].SB, meta.get("sg", 0),
                           order_override=meta["slot_ext"])
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
