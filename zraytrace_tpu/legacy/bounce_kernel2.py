"""Pallas TPU bounce megakernel, round 2: dual-path lanes, dynamic-length
launches, texel-stall batching (sphere scenes).

The round-1 kernel ran ONE wavefront iteration per launch: per-iteration
state round-tripped HBM, and the texture-atlas gather (a hardware
per-row cost of ~5 ns/row that Mosaic cannot beat in-kernel — dim-0
dynamic_gather does not lower on this backend, tools/gather_probe3.py)
was paid every iteration for every lane.

This kernel keeps lane state in VMEM across many in-kernel iterations:

- **Texel-stall batching**: a path that scatters off an image-textured
  material records the texel index in its ``pend`` slot and stalls; the
  XLA glue resolves every pending texel with ONE batched gather per
  launch and multiplies it into throughput. The gather floor is paid per
  LAUNCH instead of per iteration.
- **Dual-path lanes**: each physical lane time-multiplexes TWO virtual
  lanes (pixel sets ``base`` and ``base + N``). When one path stalls on
  a texel the other keeps tracing, hiding most of the stall latency
  (~11% of rays on 7-spheres need a texel; both paths stalled is rare).
- **Dynamic launch length**: the in-kernel loop runs until the runnable
  fraction drops below half of the live lanes (or ``n_bounce``
  iterations), so launches stretch long when stalls are rare (tails,
  const-color scenes) and exit early when texel stalls pile up.

Virtual-lane semantics make all of this exact: the stateless PCG4D
streams are keyed by (pixel, sample, bounce), so a stalled or
time-multiplexed path consumes the identical stream, and every counter
(rays/reflections/background/recursion/samples) counts the same events
as the XLA wavefront — tests compare them directly.

Reference call-outs as in render.py: rayColor loop raytrace.zig:62-100,
sphere hit sphere.zig:31-69, materials material.zig:43-128, texture
texture.zig:52-74, camera camera.zig:46-52, sky raytrace.zig:53-58.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zraytrace_tpu import rng as zrng
from zraytrace_tpu import scene as sc
from zraytrace_tpu.ops.common import (
    LANE,
    P_ATLASW, P_HEIGHT, P_MAXDEPTH, P_NPIX, P_NSLOTS, P_SEED, P_SEND,
    P_SSTART, P_STRIDE, P_WIDTH,
    SceneTables,
    _acos, _atan2, _dot, _normalize,
    prepare_tables,
)

N_COUNTS = 8

# Lane rows per grid block: 64 measured best (tools/pallas2_bench.py —
# small blocks pay per-grid-step overhead, 128 rows pays VMEM pressure).
R_BLK = 64
# Max bounce iterations per launch (the dynamic exit usually fires first
# on textured scenes; const-color scenes run the full length).
B_DEFAULT = 24

VMEM_LIMIT = 100 * 1024 * 1024

# number of per-path state arrays carried per virtual lane
_N_PATH = 17  # o(3) d(3) thr(3) acc(3) dep samp slot pend + base is extra


def make_bounce_kernel2(n_spheres: int, n_mats: int, shape, n_slots: int,
                        n_bounce: int, r_blk: int = R_BLK,
                        exit_frac: tuple = (1, 2)):
    """Build the pallas_call: up to ``n_bounce`` wavefront iterations over
    two sets of ``(R, 128)`` virtual-lane state, gridded in ``r_blk``-row
    blocks. Sphere and material counts are static (unrolled
    where-chains)."""
    R_total, L = shape
    assert L == LANE
    R = min(r_blk, R_total)
    assert R_total % R == 0, (R_total, R)
    n_blocks = R_total // R
    blk = (R, L)
    exit_num, exit_den = exit_frac

    def kernel(*refs):
        (params_ref, cam_ref, sph_ref, mat_ref,
         base_a_ref, base_b_ref) = refs[:6]
        # inputs: 30 path-state arrays (15 per path)
        state_in = refs[6:36]
        outs = refs[36:]
        # outputs: 15 A state, pend_a, 15 B state, pend_b, then per-path
        # launch-commit records (rgb + slot, -1 = none) and counters
        state_out = outs[:32]
        commit_out = outs[32:40]
        counts_o = outs[40]

        width = params_ref[P_WIDTH]
        height = params_ref[P_HEIGHT]
        sample_end = params_ref[P_SEND]
        max_depth = params_ref[P_MAXDEPTH]
        seed = params_ref[P_SEED]
        n_pixels = params_ref[P_NPIX]
        stride = params_ref[P_STRIDE]
        sample_start = params_ref[P_SSTART]
        atlas_w = params_ref[P_ATLASW]
        n_slots_t = params_ref[P_NSLOTS]
        fw = width.astype(jnp.float32)
        fh = height.astype(jnp.float32)
        # stream-xored seeds as int32 (uniform4_i32 is the Mosaic-fast,
        # bit-identical form of uniform4 — see rng.py / tools/rng_probe.py)
        as_i32 = lambda u: jnp.int32(u - (1 << 32) if u >= (1 << 31) else u)
        seed_i = jnp.asarray(seed, jnp.int32)
        seed_sc = seed_i ^ as_i32(int(zrng.STREAM_SCATTER))
        seed_cam = seed_i ^ as_i32(int(zrng.STREAM_CAMERA))

        base_a = base_a_ref[:]
        base_b = base_b_ref[:]

        def flags(slot, pend, cslot, base):
            pixel = base + slot * stride
            alive = (slot < n_slots_t) & (pixel < n_pixels)
            # a path with a pending texel OR an unflushed pixel commit
            # stalls until the glue resolves it (commits are flushed per
            # launch, so any spp is handled exactly)
            return alive, alive & (pend < 0) & (cslot < 0)

        def iter_body(carry):
            (it,
             oxa, oya, oza, dxa, dya, dza, tra, tga, tba, ara, aga, aba,
             depa, sampa, slota, penda,
             oxb, oyb, ozb, dxb, dyb, dzb, trb, tgb, tbb, arb, agb, abb,
             depb, sampb, slotb, pendb,
             cra, cga, cba, csla, crb, cgb, cbb_, cslb,
             n_rays, n_refl, n_miss, n_rec, n_samp, n_tex) = carry

            alive_a, avail_a = flags(slota, penda, csla, base_a)
            alive_b, avail_b = flags(slotb, pendb, cslb, base_b)
            use_b = ~avail_a & avail_b
            run = avail_a | avail_b

            s_f = lambda A, B: jnp.where(use_b, B, A)
            ox = s_f(oxa, oxb)
            oy = s_f(oya, oyb)
            oz = s_f(oza, ozb)
            dx = s_f(dxa, dxb)
            dy = s_f(dya, dyb)
            dz = s_f(dza, dzb)
            tr = s_f(tra, trb)
            tg = s_f(tga, tgb)
            tb = s_f(tba, tbb)
            ar = s_f(ara, arb)
            ag = s_f(aga, agb)
            ab = s_f(aba, abb)
            dep = s_f(depa, depb)
            samp = s_f(sampa, sampb)
            slot = s_f(slota, slotb)
            base = s_f(base_a, base_b)

            pixel = base + slot * stride
            exhausted = run & (dep >= max_depth)
            processing = run & ~exhausted

            # ---- closest sphere (fused running winner; sphere.zig:31-69)
            BIG = jnp.float32(3.4e38)
            o_dot_d = _dot(ox, oy, oz, dx, dy, dz)
            o_sq = _dot(ox, oy, oz, ox, oy, oz)
            t_best = jnp.full(blk, BIG)
            cxs = jnp.zeros(blk, jnp.float32)
            cys = jnp.zeros(blk, jnp.float32)
            czs = jnp.zeros(blk, jnp.float32)
            rs = jnp.ones(blk, jnp.float32)
            ms = jnp.zeros(blk, jnp.int32)
            t_min = jnp.float32(1e-3)
            for s in range(n_spheres):
                cx = sph_ref[s, 0]
                cy = sph_ref[s, 1]
                cz = sph_ref[s, 2]
                r = sph_ref[s, 3]
                mid = sph_ref[s, 4].astype(jnp.int32)
                half_b = o_dot_d - (dx * cx + dy * cy + dz * cz)
                cc = o_sq - 2.0 * (ox * cx + oy * cy + oz * cz) + (
                    cx * cx + cy * cy + cz * cz - r * r)
                disc = half_b * half_b - cc
                pos = disc > 0.0
                root = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)),
                                 0.0)
                t1 = -half_b - root
                t2 = -half_b + root
                ok1 = (t1 > t_min) & (t1 < BIG)
                ok2 = (t2 > t_min) & (t2 < BIG)
                t = jnp.where(ok1, t1, t2)
                valid = (disc >= 0.0) & (ok1 | ok2)
                better = valid & (t < t_best)
                t_best = jnp.where(better, t, t_best)
                cxs = jnp.where(better, cx, cxs)
                cys = jnp.where(better, cy, cys)
                czs = jnp.where(better, cz, czs)
                rs = jnp.where(better, r, rs)
                ms = jnp.where(better, mid, ms)

            hit = t_best < BIG
            t_attr = jnp.where(hit, t_best, 1.0)
            px_ = ox + t_attr * dx
            py_ = oy + t_attr * dy
            pz_ = oz + t_attr * dz
            safe_r = jnp.where(jnp.abs(rs) > 1e-8, rs, 1e-8)
            nx = (px_ - cxs) / safe_r
            ny = (py_ - cys) / safe_r
            nz = (pz_ - czs) / safe_r
            # front-face flip (hit_record.zig:28-41)
            front = _dot(dx, dy, dz, nx, ny, nz) <= 0.0
            fsign = jnp.where(front, 1.0, -1.0)
            nx, ny, nz = nx * fsign, ny * fsign, nz * fsign
            # spherical uv (sphere.zig:47-51) on the outward normal
            ony = jnp.clip(ny * fsign, -1.0 + 1e-7, 1.0 - 1e-7)
            theta = _acos(-ony)
            onx = nx * fsign
            onz = nz * fsign
            pole = (jnp.abs(onx) + jnp.abs(onz)) < 1e-12
            onx = jnp.where(pole, 1e-12, onx)
            phi = _atan2(-onz, -onx) + jnp.float32(np.pi)
            uu_ = phi * jnp.float32(1.0 / (2.0 * np.pi))
            vv_ = theta * jnp.float32(1.0 / np.pi)

            # ---- material attrs (where-chain over the M-row table)
            r0_, r1_, r2_, _ = zrng.uniform4_i32(seed_sc, pixel, samp, dep)

            def sel(col):
                out = jnp.zeros(blk, jnp.float32)
                for m in range(n_mats):
                    out = jnp.where(ms == m, mat_ref[m, col], out)
                return out

            mtype = sel(0)
            ior = sel(1)
            textype = sel(2)
            col_r = sel(3)
            col_g = sel(4)
            col_b = sel(5)
            tbase = sel(6)
            uoff = sel(7)
            voff = sel(8)
            th = sel(9)
            tw = sel(10)

            # texel index (texture.zig:52-74): u flip + offset + wrap
            def wrap(x):
                x = jnp.where(x > 1.0, x - 1.0, x)
                return jnp.where(x < 0.0, x + 1.0, x)

            uu = wrap(1.0 - uu_ + uoff)
            vv = wrap(vv_ + voff)
            ix = jnp.clip((uu * tw).astype(jnp.int32), 0,
                          tw.astype(jnp.int32) - 1)
            iy = jnp.clip((vv * th).astype(jnp.int32), 0,
                          th.astype(jnp.int32) - 1)
            texflat = tbase.astype(jnp.int32) + iy * atlas_w + ix

            # ---- scatter (material.zig:71-128)
            zr = r0_ * 2.0 - 1.0
            phi_l = jnp.float32(2.0 * np.pi) * r1_
            rad = jnp.sqrt(jnp.maximum(0.0, 1.0 - zr * zr))
            rux = rad * jnp.cos(phi_l)
            ruy = rad * jnp.sin(phi_l)
            ruz = zr
            lx, ly, lz = nx + rux, ny + ruy, nz + ruz
            degen = (lx * lx + ly * ly + lz * lz) < 1e-12
            lx = jnp.where(degen, nx, lx)
            ly = jnp.where(degen, ny, ly)
            lz = jnp.where(degen, nz, lz)
            ddn = _dot(dx, dy, dz, nx, ny, nz)
            mx = dx - 2.0 * ddn * nx
            my = dy - 2.0 * ddn * ny
            mz = dz - 2.0 * ddn * nz
            met_absorb = _dot(mx, my, mz, nx, ny, nz) <= 0.0
            ratio = jnp.where(front, 1.0 / ior, ior)
            cos_t = jnp.minimum(-ddn, 1.0)
            sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
            cannot = ratio * sin_t > 1.0
            r0s = (1.0 - ratio) / (1.0 + ratio)
            schl = r0s + (1.0 - r0s) * (1.0 - cos_t) ** 5
            reflect_now = cannot | (schl > r2_)
            rpx = ratio * (dx + cos_t * nx)
            rpy = ratio * (dy + cos_t * ny)
            rpz = ratio * (dz + cos_t * nz)
            kk = jnp.abs(1.0 - (rpx * rpx + rpy * rpy + rpz * rpz))
            kpos = kk > 0.0
            kroot = jnp.where(kpos, jnp.sqrt(jnp.where(kpos, kk, 1.0)), 0.0)
            fx = rpx - kroot * nx
            fy = rpy - kroot * ny
            fz = rpz - kroot * nz
            gx = jnp.where(reflect_now, mx, fx)
            gy = jnp.where(reflect_now, my, fy)
            gz = jnp.where(reflect_now, mz, fz)

            is_lam = mtype < 0.5
            is_met = (mtype >= 0.5) & (mtype < 1.5)
            sx = jnp.where(is_lam, lx, jnp.where(is_met, mx, gx))
            sy = jnp.where(is_lam, ly, jnp.where(is_met, my, gy))
            sz = jnp.where(is_lam, lz, jnp.where(is_met, mz, gz))
            sx, sy, sz = _normalize(sx, sy, sz)

            absorbed = is_met & met_absorb
            miss = processing & ~hit
            sc_ = processing & hit & ~absorbed
            path_done = miss | (processing & hit & absorbed) | exhausted

            # sky radiance on escape (raytrace.zig:53-58)
            tsky = 0.5 * (dy + 1.0)
            skyr = (1.0 - tsky) + tsky * 0.5
            skyg = (1.0 - tsky) + tsky * 0.7
            skyb = (1.0 - tsky) + tsky * 1.0
            mf = miss.astype(jnp.float32)
            ar = ar + mf * tr * skyr
            ag = ag + mf * tg * skyg
            ab = ab + mf * tb * skyb

            # throughput: const albedo applied here; image texels recorded
            # in pend and resolved by the glue (the path stalls meanwhile)
            use_img = textype > 0.5
            alr = jnp.where(is_lam | is_met,
                            jnp.where(use_img, 1.0, col_r), 1.0)
            alg = jnp.where(is_lam | is_met,
                            jnp.where(use_img, 1.0, col_g), 1.0)
            alb = jnp.where(is_lam | is_met,
                            jnp.where(use_img, 1.0, col_b), 1.0)
            tr = jnp.where(sc_, tr * alr, tr)
            tg = jnp.where(sc_, tg * alg, tg)
            tb = jnp.where(sc_, tb * alb, tb)
            texneed = sc_ & (is_lam | is_met) & use_img
            pend_new = jnp.where(texneed, texflat, jnp.int32(-1))

            ox = jnp.where(sc_, px_, ox)
            oy = jnp.where(sc_, py_, oy)
            oz = jnp.where(sc_, pz_, oz)
            dx = jnp.where(sc_, sx, dx)
            dy = jnp.where(sc_, sy, dy)
            dz = jnp.where(sc_, sz, dz)
            dep = jnp.where(sc_, dep + 1, dep)

            # sample/pixel bookkeeping; the finished pixel's sum is
            # recorded in the launch-commit slot (flushed by the glue —
            # the path stalls until then, so one record per launch
            # suffices for any spp)
            samp2 = samp + path_done.astype(jnp.int32)
            finished = path_done & (samp2 >= sample_end)
            com_r, com_g, com_b, com_slot = ar, ag, ab, slot
            ar = jnp.where(finished, 0.0, ar)
            ag = jnp.where(finished, 0.0, ag)
            ab = jnp.where(finished, 0.0, ab)
            slot2 = slot + finished.astype(jnp.int32)
            samp2 = jnp.where(finished, sample_start, samp2)

            # camera regeneration (camera.zig:46-52; raytrace.zig:174)
            pixel2 = base + slot2 * stride
            j0, j1, _, _ = zrng.uniform4_i32(seed_cam, pixel2, samp2,
                                             jnp.zeros_like(dep))
            pxf = (pixel2 % width).astype(jnp.float32)
            pyf = (pixel2 // width).astype(jnp.float32)
            cu = (pxf + j0 - 0.5) / fw
            cv = (pyf + j1 - 0.5) / fh
            cox = cam_ref[0]
            coy = cam_ref[1]
            coz = cam_ref[2]
            ndx = cam_ref[3] + cu * cam_ref[6] + cv * cam_ref[9] - cox
            ndy = cam_ref[4] + cu * cam_ref[7] + cv * cam_ref[10] - coy
            ndz = cam_ref[5] + cu * cam_ref[8] + cv * cam_ref[11] - coz
            ndx, ndy, ndz = _normalize(ndx, ndy, ndz)

            pd = path_done
            ox = jnp.where(pd, cox, ox)
            oy = jnp.where(pd, coy, oy)
            oz = jnp.where(pd, coz, oz)
            dx = jnp.where(pd, ndx, dx)
            dy = jnp.where(pd, ndy, dy)
            dz = jnp.where(pd, ndz, dz)
            tr = jnp.where(pd, 1.0, tr)
            tg = jnp.where(pd, 1.0, tg)
            tb = jnp.where(pd, 1.0, tb)
            dep = jnp.where(pd, 0, dep)

            # write back to the path that ran
            wa = run & ~use_b
            wb = run & use_b
            fina = wa & finished
            finb = wb & finished
            pa = lambda A, new: jnp.where(wa, new, A)
            pb = lambda B, new: jnp.where(wb, new, B)
            carry_out = (
                it + 1,
                pa(oxa, ox), pa(oya, oy), pa(oza, oz),
                pa(dxa, dx), pa(dya, dy), pa(dza, dz),
                pa(tra, tr), pa(tga, tg), pa(tba, tb),
                pa(ara, ar), pa(aga, ag), pa(aba, ab),
                pa(depa, dep), pa(sampa, samp2), pa(slota, slot2),
                jnp.where(wa, pend_new, penda),
                pb(oxb, ox), pb(oyb, oy), pb(ozb, oz),
                pb(dxb, dx), pb(dyb, dy), pb(dzb, dz),
                pb(trb, tr), pb(tgb, tg), pb(tbb, tb),
                pb(arb, ar), pb(agb, ag), pb(abb, ab),
                pb(depb, dep), pb(sampb, samp2), pb(slotb, slot2),
                jnp.where(wb, pend_new, pendb),
                jnp.where(fina, com_r, cra),
                jnp.where(fina, com_g, cga),
                jnp.where(fina, com_b, cba),
                jnp.where(fina, com_slot, csla),
                jnp.where(finb, com_r, crb),
                jnp.where(finb, com_g, cgb),
                jnp.where(finb, com_b, cbb_),
                jnp.where(finb, com_slot, cslb),
            )
            cnt = lambda m: jnp.sum(m.astype(jnp.int32))
            return carry_out + (
                n_rays + cnt(processing), n_refl + cnt(sc_),
                n_miss + cnt(miss), n_rec + cnt(exhausted),
                n_samp + cnt(path_done), n_tex + cnt(texneed))

        def cond(carry):
            it = carry[0]
            slota, penda, csla = carry[15], carry[16], carry[36]
            slotb, pendb, cslb = carry[31], carry[32], carry[40]
            alive_a, avail_a = flags(slota, penda, csla, base_a)
            alive_b, avail_b = flags(slotb, pendb, cslb, base_b)
            n_avail = jnp.sum((avail_a | avail_b).astype(jnp.int32))
            n_alive = jnp.sum((alive_a | alive_b).astype(jnp.int32))
            # run while the runnable fraction of live physical lanes
            # stays above exit_num/exit_den
            return ((it < n_bounce)
                    & (n_avail * exit_den > n_alive * exit_num)
                    & (n_avail > 0))

        zero = jnp.int32(0)
        fz = jnp.zeros(blk, jnp.float32)
        neg1 = jnp.full(blk, -1, jnp.int32)
        init = (zero,) + tuple(r[:] for r in state_in[:15]) + (neg1,) \
            + tuple(r[:] for r in state_in[15:30]) + (neg1,) \
            + (fz, fz, fz, neg1, fz, fz, fz, neg1) \
            + (zero, zero, zero, zero, zero, zero)
        # state_in layout: 15 path-A arrays then 15 path-B arrays (pend
        # and the commit record are launch-local, reset each launch)
        fin = jax.lax.while_loop(cond, iter_body, init)
        it_done = fin[0]
        for r, v in zip(state_out, fin[1:33]):
            r[:] = v
        for r, v in zip(commit_out, fin[33:41]):
            r[:] = v
        n_rays, n_refl, n_miss, n_rec, n_samp, n_tex = fin[41:]

        i = pl.program_id(0)
        counts_o[i, 0] = n_rays
        counts_o[i, 1] = n_refl
        counts_o[i, 2] = n_miss
        counts_o[i, 3] = n_rec
        counts_o[i, 4] = n_samp
        counts_o[i, 5] = it_done
        counts_o[i, 6] = n_tex
        counts_o[i, 7] = jnp.int32(0)

    f32 = jnp.float32
    i32 = jnp.int32
    st = lambda dt: jax.ShapeDtypeStruct((R_total, L), dt)
    # outputs: A state (15) + A pend, B state (15) + B pend, commit
    # records (A rgb+slot, B rgb+slot), counters
    out_shape = tuple(
        [st(f32)] * 12 + [st(i32)] * 3 + [st(i32)]
        + [st(f32)] * 12 + [st(i32)] * 3 + [st(i32)]
        + [st(f32)] * 3 + [st(i32)] + [st(f32)] * 3 + [st(i32)]
        + [jax.ShapeDtypeStruct((n_blocks, N_COUNTS), i32)]
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    lane_blk = lambda: pl.BlockSpec((R, L), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
    in_specs = [smem()] * 4 + [lane_blk()] * 2 + [lane_blk()] * 30
    out_specs = tuple(
        [lane_blk()] * 40
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
    )
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret_mode(),
    )


def _interpret_mode() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# XLA glue: while_loop over launches + one texel gather per launch
# ---------------------------------------------------------------------------


def wavefront_trace_pallas2(
    scene: sc.Scene,
    camera,
    pixel_base: jnp.ndarray,  # (N,) int32, N divisible by 256
    seed,
    width,
    height,
    spp,
    max_depth,
    sample_start=0,
    n_slots: int = 1,
    pixel_stride=None,
    n_pixels=None,
    n_bounce: int = B_DEFAULT,
    r_blk: int = R_BLK,
    exit_frac: tuple = (1, 2),
):
    """Same contract as render.wavefront_trace (sphere-only scenes):
    lane ``i`` of ``pixel_base`` traces pixels ``base[i] + k*stride``.
    Internally the N virtual lanes pack into N/2 physical lanes (two
    paths per lane). Returns ``(slot_sums (n_slots, N, 3), counters
    (6, 2))`` — identical layout and bit-identical sums/counters to the
    XLA wavefront at matched arguments."""
    from zraytrace_tpu import camera as cam_mod
    from zraytrace_tpu.render import N_COUNTERS, _u64_add

    assert scene.n_triangles == 0 and scene.n_spheres > 0
    n = pixel_base.shape[0]
    assert n % (2 * LANE) == 0, n
    half = n // 2
    R = half // LANE
    assert R % min(r_blk, R) == 0, (R, r_blk)
    shape = (R, LANE)

    tables = prepare_tables(scene, camera)
    S = int(tables.spheres.shape[0])
    M = int(tables.mats.shape[0])
    kernel = make_bounce_kernel2(S, M, shape, n_slots, n_bounce, r_blk,
                                 exit_frac)

    width_i = jnp.asarray(width, jnp.int32)
    height_i = jnp.asarray(height, jnp.int32)
    spp_i = jnp.asarray(spp, jnp.int32)
    sstart_i = jnp.asarray(sample_start, jnp.int32)
    stride_i = jnp.asarray(n if pixel_stride is None else pixel_stride,
                           jnp.int32)
    npix_i = (width_i * height_i if n_pixels is None
              else jnp.asarray(n_pixels, jnp.int32))
    atlas_w = scene.atlas.shape[2]
    params = jnp.stack([
        width_i, height_i, sstart_i + spp_i,
        jnp.asarray(max_depth, jnp.int32),
        jnp.asarray(seed, jnp.int32), npix_i, stride_i, sstart_i,
        jnp.asarray(atlas_w, jnp.int32), jnp.asarray(n_slots, jnp.int32),
    ])

    j = zrng.uniform4(seed, pixel_base, sstart_i, 0, zrng.STREAM_CAMERA)
    px = (pixel_base % width_i).astype(jnp.float32)
    py = (pixel_base // width_i).astype(jnp.float32)
    u, v = cam_mod.pixel_uv(px, py, j[:, 0], j[:, 1],
                            width_i.astype(jnp.float32),
                            height_i.astype(jnp.float32))
    o0, d0 = cam_mod.get_rays(camera, u, v)

    def path_state(sl):
        r2 = lambda x: x[sl].reshape(shape)
        return dict(
            ox=r2(o0[:, 0]), oy=r2(o0[:, 1]), oz=r2(o0[:, 2]),
            dx=r2(d0[:, 0]), dy=r2(d0[:, 1]), dz=r2(d0[:, 2]),
            tr=jnp.ones(shape), tg=jnp.ones(shape), tb=jnp.ones(shape),
            ar=jnp.zeros(shape), ag=jnp.zeros(shape), ab=jnp.zeros(shape),
            dep=jnp.zeros(shape, jnp.int32),
            samp=jnp.full(shape, sstart_i, jnp.int32),
            slot=jnp.zeros(shape, jnp.int32),
        )

    KEYS = ("ox", "oy", "oz", "dx", "dy", "dz", "tr", "tg", "tb",
            "ar", "ag", "ab", "dep", "samp", "slot")
    base_a = pixel_base[:half].reshape(shape)
    base_b = pixel_base[half:].reshape(shape)
    state = dict(
        a=path_state(slice(0, half)), b=path_state(slice(half, None)),
        ss_a=jnp.zeros((3 * n_slots, R, LANE), jnp.float32),
        ss_b=jnp.zeros((3 * n_slots, R, LANE), jnp.float32),
        counters=jnp.zeros((N_COUNTERS, 2), jnp.uint32),
    )
    atlas_flat = scene.atlas.reshape(-1, 3)

    def any_alive(p, base):
        return jnp.any((p["slot"] < n_slots)
                       & (base + p["slot"] * stride_i < npix_i))

    def cond(s):
        return any_alive(s["a"], base_a) | any_alive(s["b"], base_b)

    def body(s):
        args = [params, tables.cam, tables.spheres, tables.mats,
                base_a, base_b]
        args += [s["a"][k] for k in KEYS]
        args += [s["b"][k] for k in KEYS]
        outs = kernel(*args)
        a_out = dict(zip(KEYS, outs[0:15]))
        pend_a = outs[15]
        b_out = dict(zip(KEYS, outs[16:31]))
        pend_b = outs[31]
        (cra, cga, cba, csla, crb, cgb, cbb, cslb) = outs[32:40]
        counts = outs[40]

        # the one gather per launch: resolve both paths' pending texels
        def resolve(p, pend):
            texel = atlas_flat[jnp.maximum(pend, 0)]  # (R, 128, 3)
            need = pend >= 0
            p = dict(p)
            p["tr"] = jnp.where(need, p["tr"] * texel[..., 0], p["tr"])
            p["tg"] = jnp.where(need, p["tg"] * texel[..., 1], p["tg"])
            p["tb"] = jnp.where(need, p["tb"] * texel[..., 2], p["tb"])
            return p

        a_out = resolve(a_out, pend_a)
        b_out = resolve(b_out, pend_b)

        # flush the launch's pixel commits into the slot planes
        def flush(ss, cr, cg, cb, csl):
            for k in range(n_slots):
                m = csl == k
                ss = ss.at[3 * k + 0].add(jnp.where(m, cr, 0.0))
                ss = ss.at[3 * k + 1].add(jnp.where(m, cg, 0.0))
                ss = ss.at[3 * k + 2].add(jnp.where(m, cb, 0.0))
            return ss

        ss_a = flush(s["ss_a"], cra, cga, cba, csla)
        ss_b = flush(s["ss_b"], crb, cgb, cbb, cslb)

        counters = s["counters"]
        totals = counts.sum(axis=0)
        # slot 5: average in-kernel iterations over blocks (telemetry)
        totals = totals.at[5].set(totals[5] // jnp.int32(counts.shape[0]))
        for slot_i in range(6):
            counters = counters.at[slot_i].set(
                _u64_add(counters[slot_i], totals[slot_i].astype(jnp.uint32))
            )

        return dict(a=a_out, b=b_out, ss_a=ss_a, ss_b=ss_b,
                    counters=counters)

    final = jax.lax.while_loop(cond, body, state)
    # (3*n_slots, R, 128) per path -> (n_slots, N, 3); virtual lane i is
    # physical (path A) for i < N/2 else path B.
    def unpack(ss):
        return jnp.transpose(ss.reshape(n_slots, 3, half), (0, 2, 1))

    sums = jnp.concatenate([unpack(final["ss_a"]), unpack(final["ss_b"])],
                           axis=1)
    return sums, final["counters"]


_wavefront_pallas2_jit = jax.jit(
    wavefront_trace_pallas2,
    static_argnames=("n_slots", "n_bounce", "r_blk", "exit_frac"),
)
