"""Pallas TPU bounce megakernel, round 3: single-path lanes with
DEFERRED texel factors (sphere scenes).

Round 2 (ops/bounce_kernel2) kept float multiply order bit-exact by
stalling a path the moment it scattered off an image-textured material:
the texel value is only available to the XLA glue (in-kernel gathers do
not lower / do not beat the ~5 ns/row hardware cost), so the path waited
for the per-launch batched gather. On 7-spheres ~11% of segments need a
texel, so launches effectively ended after ~8 in-kernel iterations and
TWO virtual paths per physical lane were time-multiplexed to hide the
stalls — the per-iteration select/writeback overhead of that
multiplexing plus the per-launch gather were measured as the two
dominant costs (PERF.md round-2 decomposition).

This kernel exploits an algebraic fact instead: a sample's radiance is

    radiance = (product of all albedo factors along the path) * sky

and the path's GEOMETRY (and its stateless PCG4D streams, keyed by
(pixel, sample, bounce)) never depends on throughput. Products commute,
so a texel factor may be applied out of order:

- **pend**: a path that needs a texel records the flat atlas index and
  KEEPS TRACING with the factor outstanding (throughput multiplied by
  the constant part only).
- **trec**: if the texeled sample escapes to the sky before the factor
  resolves, its contribution ``thr * sky`` parks in a per-path record
  tagged with the pixel slot; the glue adds ``texel * trec`` into the
  slot sums. If the sample is absorbed or hits the depth limit its
  contribution is zero and the pend is simply dropped.
- a path only **blocks** when it needs a SECOND texel while one is
  outstanding, or when a finished pixel finds the per-launch commit
  record occupied — both rare, so launches run near ``n_bounce``
  iterations instead of ~8, which cuts both the number of per-launch
  atlas gathers and the launch fixed cost. A blocked path's segment is
  suppressed entirely (no state writes, no counter increments) and
  replays exactly after the glue resolves — stateless RNG makes the
  replay bit-identical.

Event counters are bit-exact vs the XLA wavefront (stalling and
deferral change timing, never events). Radiance differs from the XLA
wavefront only in float rounding order (a texel factor applied after
instead of before later albedo factors), which is far below the test
image tolerance already used for the polynomial atan2.

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
from zraytrace_tpu.ops.bounce_kernel import (
    LANE,
    P_ATLASW, P_HEIGHT, P_MAXDEPTH, P_NPIX, P_NSLOTS, P_SEED, P_SEND,
    P_SSTART, P_STRIDE, P_WIDTH,
    _acos, _atan2, _dot, _normalize,
    prepare_tables,
)

# kernel3-only params slots (appended after the shared 10):
# pixel-stripe count P, group rotation shift, lane count N, per-group
# spp, smallest lane pixel id (rotation is modulo [lo, lo+N))
P_NSTRIPES, P_SHIFT, P_NLANES, P_GSPP, P_BASELO = 10, 11, 12, 13, 14

N_COUNTS = 8

# timing probe (bench only): skip the per-launch atlas gather to
# measure its wall share; counters stay exact, the image goes gray.
import os as _os

_NOGATHER = _os.environ.get("ZRAYTRACE_K3_NOGATHER", "0") == "1"
# A/B knobs for the two glue variants (measured, PERF.md round 3):
# the u32-packed 1D gather is ~0.32 ms/launch SLOWER than the (F,3) f32
# row gather on this TPU — packed stays off; state-plane aliasing is
# neutral-to-slightly-positive and stays on.
_ALIAS = _os.environ.get("ZRAYTRACE_K3_ALIAS", "1") == "1"
_PACKED = _os.environ.get("ZRAYTRACE_K3_PACKED", "0") == "1"
# (F,3) f32 row gather with flat indices + promise_in_bounds (skips the
# clamp); A/B'd on hardware before flipping the default.
_PROMISE = _os.environ.get("ZRAYTRACE_K3_PROMISE", "0") == "1"
# gather from a 16-byte-aligned (F, 4) zero-padded atlas instead of the
# (F, 3) one (row width is free per the probes; alignment might not be)
_PAD4 = _os.environ.get("ZRAYTRACE_K3_PAD4", "0") == "1"

R_BLK = 64
# Launches now stretch until the rare blocks accumulate; 32 in-kernel
# iterations per launch is the starting point (tuned on hardware).
B_DEFAULT = 32

VMEM_LIMIT = 100 * 1024 * 1024

# per-lane state planes carried across launches:
# o(3) d(3) thr(3) acc(3) dep samp slot pidx baseg swin pend trec(3)
# trec_slot + N_CACHE x (cache_idx cache_rgb(3)).
#
# The cache planes implement an N_CACHE-entry TEXEL-VALUE CACHE
# (round 3): launches are pinned by second-texel blocks, and
# consecutive samples of the same pixel hit texels from the pixel's
# small (~2x2 texel) footprint — often repeating or alternating across
# a boundary as the sub-pixel jitter moves. A texneed whose flat index
# matches any cached index multiplies the cached f32 value in-kernel —
# bit-identical to what the gather would return, so only float
# multiply ORDER changes — and neither occupies the pend slot nor
# forces a launch exit. The glue refreshes entry 0 with every resolved
# pend and shifts older entries down (FIFO by last-resolve; no
# in-kernel promotion — a K-texel working set still hits steady-state
# while K <= N_CACHE because hits don't need refreshing).
#
# pidx/baseg/swin implement the SAMPLE-INTERLEAVED slot schedule
# (round 3): launch count is pinned by the heaviest lane's texel-event
# total (one resolve per launch), and with whole-pixel lanes the
# texture-dominated pixels concentrate ~12k events on a lane. Slot k
# now means (pixel stripe p = k mod P, sample group g = k div P): the
# lane traces pixel ((base - lo + g*shift) mod n_lanes + lo) + p*stride
# for the g-th spp/G window, so one heavy pixel's samples spread over G
# lanes and the per-lane maximum drops toward the 244M/131k average.
# Carried as planes (advance is add/compare) so the hot loop needs no
# div/mod. PCG4D streams are keyed by (pixel, sample) — event counters
# stay bit-exact under any schedule; pixel sums change only in float
# summation order (group partial sums).
N_CACHE = int(_os.environ.get("ZRAYTRACE_K3_CACHE", "4"))
N_STATE = 23 + 4 * N_CACHE


def make_bounce_kernel3(n_spheres: int, n_mats: int, shape,
                        n_bounce: int, r_blk: int = R_BLK,
                        exit_frac: tuple = (3, 5), mat_classes=None):
    """Build the pallas_call: up to ``n_bounce`` wavefront iterations
    over ``(R, 128)`` single-path lane state, gridded in ``r_blk``-row
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
        (params_ref, cam_ref, sph_ref, mat_ref, base_ref) = refs[:5]
        state_in = refs[5:5 + N_STATE]
        outs = refs[5 + N_STATE:]
        state_out = outs[:N_STATE]
        commit_out = outs[N_STATE:N_STATE + 4]
        counts_o = outs[N_STATE + 4]

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
        n_stripes = params_ref[P_NSTRIPES]
        g_shift = params_ref[P_SHIFT]
        n_lanes_t = params_ref[P_NLANES]
        gspp = params_ref[P_GSPP]
        base_lo = params_ref[P_BASELO]
        fw = width.astype(jnp.float32)
        fh = height.astype(jnp.float32)
        as_i32 = lambda u: jnp.int32(u - (1 << 32) if u >= (1 << 31) else u)
        seed_i = jnp.asarray(seed, jnp.int32)
        seed_sc = seed_i ^ as_i32(int(zrng.STREAM_SCATTER))
        seed_cam = seed_i ^ as_i32(int(zrng.STREAM_CAMERA))

        base = base_ref[:]

        def iter_body(carry):
            (it,
             ox, oy, oz, dx, dy, dz, tr, tg, tb, ar, ag, ab,
             dep, samp, slot, pidx, baseg, swin, pend,
             wr, wg, wb_, wslot) = carry[:24]
            cache = carry[24:24 + 4 * N_CACHE]
            (blocked,
             cr, cg, cb_, cslot,
             n_rays, n_refl, n_miss, n_rec, n_samp, n_tex) \
                = carry[24 + 4 * N_CACHE:]

            pixel = baseg + pidx * stride
            alive = (slot < n_slots_t) & (pixel < n_pixels)
            run = alive & (blocked == 0)
            exhausted = run & (dep >= max_depth)
            processing = run & ~exhausted
            # a rotated slot may land on an invalid pixel while LATER
            # slots are valid (n_pixels not a multiple of n_lanes), and
            # a sample window may be empty (spp < G*gspp): both advance
            # without tracing or counting
            swin_end = jnp.minimum(swin + gspp, sample_end)
            skip = ((blocked == 0) & (slot < n_slots_t)
                    & ((pixel >= n_pixels) | (samp >= swin_end)))
            run = run & (samp < swin_end)
            exhausted = exhausted & (samp < swin_end)
            processing = processing & (samp < swin_end)

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

            # where-chains restricted by static material class
            # (scene.material_classes): each column only visits rows
            # whose value can matter — defaults are safe because every
            # consumer is masked by the material/texture type anyway
            if mat_classes is None:
                tex_ids = die_ids = col_ids = tuple(range(n_mats))
            else:
                tex_ids, die_ids, col_ids = mat_classes

            def sel(col, ids=None, default=0.0):
                out = jnp.full(blk, jnp.float32(default))
                for m in (range(n_mats) if ids is None else ids):
                    out = jnp.where(ms == m, mat_ref[m, col], out)
                return out

            mtype = sel(0)
            ior = sel(1, die_ids, 1.0)
            textype = sel(2, tex_ids)
            col_r = sel(3, col_ids)
            col_g = sel(4, col_ids)
            col_b = sel(5, col_ids)
            tbase = sel(6, tex_ids)
            uoff = sel(7, tex_ids)
            voff = sel(8, tex_ids)
            th = sel(9, tex_ids, 1.0)
            tw = sel(10, tex_ids, 1.0)

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

            use_img = textype > 0.5
            texneed = sc_ & (is_lam | is_met) & use_img
            # texel-value cache: a matching index resolves in-kernel
            # with the EXACT f32 the gather would return — no pend, no
            # block, no launch consumed
            hitc = jnp.zeros(blk, jnp.bool_)
            cvr = jnp.zeros(blk, jnp.float32)
            cvg = jnp.zeros(blk, jnp.float32)
            cvb = jnp.zeros(blk, jnp.float32)
            for k in range(N_CACHE):
                ck, ckr, ckg, ckb = cache[4 * k:4 * k + 4]
                hk = texneed & ~hitc & (texflat == ck)
                cvr = jnp.where(hk, ckr, cvr)
                cvg = jnp.where(hk, ckg, cvg)
                cvb = jnp.where(hk, ckb, cvb)
                hitc = hitc | hk
            texmiss = texneed & ~hitc
            samp2 = samp + path_done.astype(jnp.int32)
            finished = path_done & (samp2 >= swin_end)

            # ---- deferral bookkeeping: a lane blocks (segment fully
            # suppressed, replayed after the glue resolves) when it needs
            # a texel slot or a commit record that is occupied.
            pend_free = pend < 0
            trec_free = wslot < 0
            # pend belongs to the in-flight sample iff trec is empty
            # (a parked trec owns the pend otherwise)
            pend_in_flight = ~pend_free & trec_free
            block_now = run & ((texmiss & ~pend_free)
                               | (finished & (cslot >= 0)))
            # effective mask: traced segments plus invalid-slot skips
            w = (run & ~block_now) | skip

            # sky radiance on escape (raytrace.zig:53-58); a texeled
            # sample's contribution parks in trec instead of acc
            tsky = 0.5 * (dy + 1.0)
            skyr = (1.0 - tsky) + tsky * 0.5
            skyg = (1.0 - tsky) + tsky * 0.7
            skyb = (1.0 - tsky) + tsky * 1.0
            to_trec = miss & pend_in_flight
            mf = (miss & ~to_trec).astype(jnp.float32)
            ar2 = ar + mf * tr * skyr
            ag2 = ag + mf * tg * skyg
            ab2 = ab + mf * tb * skyb

            # throughput: const albedo (and cache-hit texels) applied
            # now; missed image texels recorded in pend (factor
            # outstanding, path keeps tracing)
            alr = jnp.where(is_lam | is_met,
                            jnp.where(use_img,
                                      jnp.where(hitc, cvr, 1.0), col_r),
                            1.0)
            alg = jnp.where(is_lam | is_met,
                            jnp.where(use_img,
                                      jnp.where(hitc, cvg, 1.0), col_g),
                            1.0)
            alb = jnp.where(is_lam | is_met,
                            jnp.where(use_img,
                                      jnp.where(hitc, cvb, 1.0), col_b),
                            1.0)
            tr2 = jnp.where(sc_, tr * alr, tr)
            tg2 = jnp.where(sc_, tg * alg, tg)
            tb2 = jnp.where(sc_, tb * alb, tb)

            # pend transitions: record on cache miss (slot free under
            # ~block), drop when the owning sample dies with zero
            # contribution
            pend2 = jnp.where(texmiss, texflat, pend)
            pend2 = jnp.where(pend_in_flight & path_done & ~miss,
                              jnp.int32(-1), pend2)
            # trec capture: texeled sample escapes -> park thr*sky + slot
            wr2 = jnp.where(to_trec, tr * skyr, wr)
            wg2 = jnp.where(to_trec, tg * skyg, wg)
            wb2 = jnp.where(to_trec, tb * skyb, wb_)
            wslot2 = jnp.where(to_trec, slot, wslot)

            ox2 = jnp.where(sc_, px_, ox)
            oy2 = jnp.where(sc_, py_, oy)
            oz2 = jnp.where(sc_, pz_, oz)
            dx2 = jnp.where(sc_, sx, dx)
            dy2 = jnp.where(sc_, sy, dy)
            dz2 = jnp.where(sc_, sz, dz)
            dep2 = jnp.where(sc_, dep + 1, dep)

            # pixel bookkeeping: the finished slot's sum goes to the
            # per-launch commit record (cslot occupancy gates via block)
            com_r, com_g, com_b, com_slot = ar2, ag2, ab2, slot
            ar2 = jnp.where(finished, 0.0, ar2)
            ag2 = jnp.where(finished, 0.0, ag2)
            ab2 = jnp.where(finished, 0.0, ab2)
            adv = finished | skip
            fin_i = adv.astype(jnp.int32)
            slot2 = slot + fin_i
            # slot advance sweeps pixel stripes first, then rotates to
            # the next sample group's pixel set (interleave docstring)
            pidx2 = pidx + fin_i
            wrapm = adv & (pidx2 >= n_stripes)
            pidx2 = jnp.where(wrapm, 0, pidx2)
            baseg2 = jnp.where(wrapm, baseg + g_shift, baseg)
            baseg2 = jnp.where(baseg2 - base_lo >= n_lanes_t,
                               baseg2 - n_lanes_t, baseg2)
            swin2 = jnp.where(wrapm, swin + gspp, swin)
            samp2 = jnp.where(adv, swin2, samp2)

            # camera regeneration (camera.zig:46-52; raytrace.zig:174)
            pixel2 = baseg2 + pidx2 * stride
            j0, j1, _, _ = zrng.uniform4_i32(seed_cam, pixel2, samp2,
                                             jnp.zeros_like(dep))
            # pixel -> (px, py) without integer div (measured ~37% of
            # the body's sum-of-parts): f32 reciprocal estimate + exact
            # correction. Valid while pixel < 2^24 (f32-exact ints);
            # n_pixels is far below that for every reference config.
            pf = pixel2.astype(jnp.float32)
            py_i = (pf * (1.0 / fw)).astype(jnp.int32)
            rem = pixel2 - py_i * width
            for _ in range(2):  # estimate is off by <=1 per 4M pixels
                under = rem < 0
                over = rem >= width
                py_i = py_i + jnp.where(over, 1, 0) - jnp.where(under, 1, 0)
                rem = rem - jnp.where(over, width, 0) \
                    + jnp.where(under, width, 0)
            pxf = rem.astype(jnp.float32)
            pyf = py_i.astype(jnp.float32)
            cu = (pxf + j0 - 0.5) / fw
            cv = (pyf + j1 - 0.5) / fh
            cox = cam_ref[0]
            coy = cam_ref[1]
            coz = cam_ref[2]
            ndx = cam_ref[3] + cu * cam_ref[6] + cv * cam_ref[9] - cox
            ndy = cam_ref[4] + cu * cam_ref[7] + cv * cam_ref[10] - coy
            ndz = cam_ref[5] + cu * cam_ref[8] + cv * cam_ref[11] - coz
            ndx, ndy, ndz = _normalize(ndx, ndy, ndz)

            pd = path_done | skip
            ox2 = jnp.where(pd, cox, ox2)
            oy2 = jnp.where(pd, coy, oy2)
            oz2 = jnp.where(pd, coz, oz2)
            dx2 = jnp.where(pd, ndx, dx2)
            dy2 = jnp.where(pd, ndy, dy2)
            dz2 = jnp.where(pd, ndz, dz2)
            tr2 = jnp.where(pd, 1.0, tr2)
            tg2 = jnp.where(pd, 1.0, tg2)
            tb2 = jnp.where(pd, 1.0, tb2)
            dep2 = jnp.where(pd, 0, dep2)

            # single writeback per plane, gated by the effective mask
            fin = w & finished
            up = lambda old, new: jnp.where(w, new, old)
            carry_out = (
                it + 1,
                up(ox, ox2), up(oy, oy2), up(oz, oz2),
                up(dx, dx2), up(dy, dy2), up(dz, dz2),
                up(tr, tr2), up(tg, tg2), up(tb, tb2),
                up(ar, ar2), up(ag, ag2), up(ab, ab2),
                up(dep, dep2), up(samp, samp2), up(slot, slot2),
                up(pidx, pidx2), up(baseg, baseg2), up(swin, swin2),
                up(pend, pend2),
                up(wr, wr2), up(wg, wg2), up(wb_, wb2), up(wslot, wslot2),
            ) + tuple(cache) + (
                blocked | block_now.astype(jnp.int32),
                jnp.where(fin, com_r, cr),
                jnp.where(fin, com_g, cg),
                jnp.where(fin, com_b, cb_),
                jnp.where(fin, com_slot, cslot),
            )
            cnt = lambda m: jnp.sum((m & w).astype(jnp.int32))
            return carry_out + (
                n_rays + cnt(processing), n_refl + cnt(sc_),
                n_miss + cnt(miss), n_rec + cnt(exhausted),
                n_samp + cnt(path_done), n_tex + cnt(texneed))

        def cond(carry):
            it, slot, blocked = carry[0], carry[15], carry[1 + N_STATE]
            n_slots_t = params_ref[P_NSLOTS]
            # slot-based (not pixel-validity) so lanes skipping through
            # invalid rotated slots keep the launch running
            alive = slot < n_slots_t
            avail = alive & (blocked == 0)
            n_avail = jnp.sum(avail.astype(jnp.int32))
            n_alive = jnp.sum(alive.astype(jnp.int32))
            return ((it < n_bounce)
                    & (n_avail * exit_den > n_alive * exit_num)
                    & (n_avail > 0))

        zero = jnp.int32(0)
        fz = jnp.zeros(blk, jnp.float32)
        neg1 = jnp.full(blk, -1, jnp.int32)
        iz = jnp.zeros(blk, jnp.int32)
        init = (zero,) + tuple(r[:] for r in state_in) \
            + (iz,) + (fz, fz, fz, neg1) \
            + (zero, zero, zero, zero, zero, zero)
        fin = jax.lax.while_loop(cond, iter_body, init)
        it_done = fin[0]
        for r, v in zip(state_out, fin[1:1 + N_STATE]):
            r[:] = v
        for r, v in zip(commit_out, fin[2 + N_STATE:6 + N_STATE]):
            r[:] = v
        n_rays, n_refl, n_miss, n_rec, n_samp, n_tex = fin[6 + N_STATE:]

        i = pl.program_id(0)
        counts_o[i, 0] = n_rays
        counts_o[i, 1] = n_refl
        counts_o[i, 2] = n_miss
        counts_o[i, 3] = n_rec
        counts_o[i, 4] = n_samp
        counts_o[i, 5] = it_done
        counts_o[i, 6] = n_tex
        # diagnostic: lanes blocked when the launch exited
        counts_o[i, 7] = jnp.sum((fin[1 + N_STATE] != 0).astype(jnp.int32))

    f32 = jnp.float32
    i32 = jnp.int32
    st = lambda dt: jax.ShapeDtypeStruct((R_total, L), dt)
    # state planes: 12 f32 + dep/samp/slot/pidx/baseg/swin/pend i32 +
    # trec rgb f32 + trec_slot i32 + cache_idx i32 + cache rgb f32;
    # then commit rgb f32 + cslot i32; counters
    state_dts = ([st(f32)] * 12 + [st(i32)] * 7 + [st(f32)] * 3
                 + [st(i32)]
                 + [st(i32), st(f32), st(f32), st(f32)] * N_CACHE)
    out_shape = tuple(
        state_dts + [st(f32)] * 3 + [st(i32)]
        + [jax.ShapeDtypeStruct((n_blocks, N_COUNTS), i32)]
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    lane_blk = lambda: pl.BlockSpec((R, L), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
    in_specs = [smem()] * 4 + [lane_blk()] * (1 + N_STATE)
    out_specs = tuple(
        [lane_blk()] * (N_STATE + 4)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
    )
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        # state planes update in place: input k+5 donates its buffer to
        # output k
        input_output_aliases=(
            {5 + k: k for k in range(N_STATE)} if _ALIAS else {}),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret_mode(),
    )


def _interpret_mode() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# XLA glue: while_loop over launches + one texel gather per launch
# ---------------------------------------------------------------------------


def wavefront_trace_pallas3(
    scene: sc.Scene,
    camera,
    pixel_base: jnp.ndarray,  # (N,) int32, N divisible by 128
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
    exit_frac: tuple = (3, 5),
    return_launches: bool = False,
    sample_groups: int = 1,
    mat_classes=None,
):
    """Same contract as render.wavefront_trace (sphere-only scenes):
    lane ``i`` of ``pixel_base`` traces pixels ``base[i] + k*stride``.
    Returns ``(slot_sums (n_slots, N, 3), counters (6, 2))`` — identical
    layout to the XLA wavefront; counters bit-exact, sums equal up to
    texel-factor multiply order (see module docstring).

    ``sample_groups`` > 1 splits each pixel's spp into G windows traced
    by G different lanes (rotated base mapping, N_STATE docstring) —
    cuts the per-lane texel-event maximum and with it the launch count.
    The returned slot planes keep the caller-visible pixel mapping
    (group planes are rolled back and summed), so only float summation
    order changes; counters stay bit-exact. Requires ``pixel_base`` to
    be a contiguous range (lane i traces base_lo + i)."""
    from zraytrace_tpu import camera as cam_mod
    from zraytrace_tpu.render import N_COUNTERS, _u64_add

    assert scene.n_triangles == 0 and scene.n_spheres > 0
    n = pixel_base.shape[0]
    assert n % LANE == 0, n
    R = n // LANE
    assert R % min(r_blk, R) == 0, (R, r_blk)
    shape = (R, LANE)
    G = int(sample_groups)
    assert G >= 1

    tables = prepare_tables(scene, camera)
    S = int(tables.spheres.shape[0])
    M = int(tables.mats.shape[0])
    kernel = make_bounce_kernel3(S, M, shape, n_bounce, r_blk, exit_frac,
                                 mat_classes)

    width_i = jnp.asarray(width, jnp.int32)
    height_i = jnp.asarray(height, jnp.int32)
    spp_i = jnp.asarray(spp, jnp.int32)
    sstart_i = jnp.asarray(sample_start, jnp.int32)
    stride_i = jnp.asarray(n if pixel_stride is None else pixel_stride,
                           jnp.int32)
    npix_i = (width_i * height_i if n_pixels is None
              else jnp.asarray(n_pixels, jnp.int32))
    atlas_w = scene.atlas.shape[2]
    # interleave geometry: group g of stripe p is traced by the lane
    # whose rotated base hits the pixel; shift n/G spreads a pixel's
    # groups evenly over the lane-id space
    base_lo_i = jnp.min(pixel_base).astype(jnp.int32)
    shift_i = jnp.asarray(n // G if G > 1 else 0, jnp.int32)
    gspp_i = (spp_i + G - 1) // G
    params = jnp.stack([
        width_i, height_i, sstart_i + spp_i,
        jnp.asarray(max_depth, jnp.int32),
        jnp.asarray(seed, jnp.int32), npix_i, stride_i, sstart_i,
        jnp.asarray(atlas_w, jnp.int32),
        jnp.asarray(n_slots * G, jnp.int32),
        jnp.asarray(n_slots, jnp.int32), shift_i,
        jnp.asarray(n, jnp.int32), gspp_i, base_lo_i,
    ])

    j = zrng.uniform4(seed, pixel_base, sstart_i, 0, zrng.STREAM_CAMERA)
    px = (pixel_base % width_i).astype(jnp.float32)
    py = (pixel_base // width_i).astype(jnp.float32)
    u, v = cam_mod.pixel_uv(px, py, j[:, 0], j[:, 1],
                            width_i.astype(jnp.float32),
                            height_i.astype(jnp.float32))
    o0, d0 = cam_mod.get_rays(camera, u, v)

    r2 = lambda x: x.reshape(shape)
    KEYS = ("ox", "oy", "oz", "dx", "dy", "dz", "tr", "tg", "tb",
            "ar", "ag", "ab", "dep", "samp", "slot", "pidx", "baseg",
            "swin", "pend", "wr", "wg", "wb", "wslot") + tuple(
        f"c{k}{f}" for k in range(N_CACHE) for f in ("idx", "r", "g", "b"))
    base = pixel_base.reshape(shape)
    n_slots_t = n_slots * G
    state = dict(
        p=dict(
            ox=r2(o0[:, 0]), oy=r2(o0[:, 1]), oz=r2(o0[:, 2]),
            dx=r2(d0[:, 0]), dy=r2(d0[:, 1]), dz=r2(d0[:, 2]),
            tr=jnp.ones(shape), tg=jnp.ones(shape), tb=jnp.ones(shape),
            ar=jnp.zeros(shape), ag=jnp.zeros(shape), ab=jnp.zeros(shape),
            dep=jnp.zeros(shape, jnp.int32),
            samp=jnp.full(shape, sstart_i, jnp.int32),
            slot=jnp.zeros(shape, jnp.int32),
            pidx=jnp.zeros(shape, jnp.int32),
            baseg=base,
            swin=jnp.full(shape, sstart_i, jnp.int32),
            pend=jnp.full(shape, -1, jnp.int32),
            wr=jnp.zeros(shape), wg=jnp.zeros(shape), wb=jnp.zeros(shape),
            wslot=jnp.full(shape, -1, jnp.int32),
            **{f"c{k}{f}": (jnp.full(shape, -1, jnp.int32) if f == "idx"
                            else jnp.zeros(shape))
               for k in range(N_CACHE) for f in ("idx", "r", "g", "b")},
        ),
        ss=jnp.zeros((3 * n_slots, R, LANE), jnp.float32),
        counters=jnp.zeros((N_COUNTERS, 2), jnp.uint32),
        launches=jnp.uint32(0),
    )
    # The per-launch texel resolve is the wall (measured 65% of bench
    # wall at 11.8 ns/row for the naive 2D-indexed (F, 3) f32 gather).
    # Pack RGB into ONE int32 row (atlas texels are exactly u8/255 —
    # io/png.py:23 — so round-trip is bit-exact: f32(k)/255.0 is the
    # same IEEE op on both sides), gather with flat 1D indices and
    # promise_in_bounds, and unpack with int32 shifts.
    atlas_flat = scene.atlas.reshape(-1, 3)
    atlas_pad4 = jnp.concatenate(
        [atlas_flat, jnp.zeros((atlas_flat.shape[0], 1), jnp.float32)], 1)
    _au8 = jnp.round(atlas_flat * 255.0).astype(jnp.int32)
    atlas_packed = (_au8[:, 0] << 16) | (_au8[:, 1] << 8) | _au8[:, 2]

    def cond(s):
        # slot-based: a lane on an invalid rotated slot still has work
        # (it skip-advances in-kernel)
        return jnp.any(s["p"]["slot"] < n_slots_t)

    def body(s):
        args = [params, tables.cam, tables.spheres, tables.mats, base]
        args += [s["p"][k] for k in KEYS]
        outs = kernel(*args)
        p = dict(zip(KEYS, outs[:N_STATE]))
        cr, cg, cb, cslot = outs[N_STATE:N_STATE + 4]
        counts = outs[N_STATE + 4]

        # the one gather per launch resolves every outstanding texel:
        # in-flight pends multiply throughput; parked trecs flush
        # texel * trec into their slot plane
        if _NOGATHER:  # timing probe: constant texel, image wrong
            tex_r = tex_g = tex_b = jnp.full(shape, 0.5, jnp.float32)
        elif _PACKED:
            idx = jnp.maximum(p["pend"], 0).reshape(-1)
            packed = atlas_packed.at[idx].get(
                mode="promise_in_bounds").reshape(shape)
            tex_r = ((packed >> 16) & 255).astype(jnp.float32) / 255.0
            tex_g = ((packed >> 8) & 255).astype(jnp.float32) / 255.0
            tex_b = (packed & 255).astype(jnp.float32) / 255.0
        elif _PAD4:
            texel = atlas_pad4[jnp.maximum(p["pend"], 0)]  # (R, 128, 4)
            tex_r = texel[..., 0]
            tex_g = texel[..., 1]
            tex_b = texel[..., 2]
        elif _PROMISE:
            idx = jnp.maximum(p["pend"], 0).reshape(-1)
            texel = atlas_flat.at[idx].get(
                mode="promise_in_bounds").reshape(shape + (3,))
            tex_r = texel[..., 0]
            tex_g = texel[..., 1]
            tex_b = texel[..., 2]
        else:
            texel = atlas_flat[jnp.maximum(p["pend"], 0)]  # (R, 128, 3)
            tex_r = texel[..., 0]
            tex_g = texel[..., 1]
            tex_b = texel[..., 2]
        has_pend = p["pend"] >= 0
        has_trec = p["wslot"] >= 0
        in_flight = has_pend & ~has_trec
        p["tr"] = jnp.where(in_flight, p["tr"] * tex_r, p["tr"])
        p["tg"] = jnp.where(in_flight, p["tg"] * tex_g, p["tg"])
        p["tb"] = jnp.where(in_flight, p["tb"] * tex_b, p["tb"])
        # refresh the in-kernel texel cache with the resolved value:
        # entry 0 takes the new texel, older entries shift down (FIFO)
        new_vals = {"idx": p["pend"], "r": tex_r, "g": tex_g, "b": tex_b}
        for k in range(N_CACHE - 1, 0, -1):
            for f in ("idx", "r", "g", "b"):
                p[f"c{k}{f}"] = jnp.where(
                    has_pend, p[f"c{k - 1}{f}"], p[f"c{k}{f}"])
        for f in ("idx", "r", "g", "b"):
            p[f"c0{f}"] = jnp.where(has_pend, new_vals[f], p[f"c0{f}"])

        # fold records straight into the CALLER's P pixel planes: group
        # g's contribution at lane i belongs to pixel i + g*shift, i.e.
        # the g-plane rolled forward — the G rolls are static slices XLA
        # fuses into the one add per stripe, so ss traffic stays 3*P
        # planes per launch instead of 3*P*G
        ss = s["ss"]
        trr = p["wr"] * tex_r
        trg = p["wg"] * tex_g
        trb = p["wb"] * tex_b
        shift = n // G if G > 1 else 0

        def rollg(x, g):
            if g == 0 or shift == 0:
                return x
            return jnp.roll(x.reshape(-1), g * shift).reshape(shape)

        for pstripe in range(n_slots):
            acc_r = acc_g = acc_b = jnp.zeros(shape, jnp.float32)
            for g in range(G):
                k = g * n_slots + pstripe
                mt = has_trec & (p["wslot"] == k)
                mc = cslot == k
                acc_r += rollg(jnp.where(mt, trr, 0.0)
                               + jnp.where(mc, cr, 0.0), g)
                acc_g += rollg(jnp.where(mt, trg, 0.0)
                               + jnp.where(mc, cg, 0.0), g)
                acc_b += rollg(jnp.where(mt, trb, 0.0)
                               + jnp.where(mc, cb, 0.0), g)
            ss = ss.at[3 * pstripe + 0].add(acc_r)
            ss = ss.at[3 * pstripe + 1].add(acc_g)
            ss = ss.at[3 * pstripe + 2].add(acc_b)
        p["pend"] = jnp.full(shape, -1, jnp.int32)
        p["wslot"] = jnp.full(shape, -1, jnp.int32)

        counters = s["counters"]
        totals = counts.sum(axis=0)
        totals = totals.at[5].set(totals[5] // jnp.int32(counts.shape[0]))
        for slot_i in range(6):
            counters = counters.at[slot_i].set(
                _u64_add(counters[slot_i], totals[slot_i].astype(jnp.uint32))
            )
        return dict(p=p, ss=ss, counters=counters,
                    launches=s["launches"] + jnp.uint32(1))

    final = jax.lax.while_loop(cond, body, state)
    # (3*n_slots, R, 128) -> (n_slots, N, 3); already in the caller's
    # pixel mapping (group rolls happen per launch)
    sums = jnp.transpose(final["ss"].reshape(n_slots, 3, n), (0, 2, 1))
    if return_launches:
        return sums, final["counters"], final["launches"]
    return sums, final["counters"]


_wavefront_pallas3_jit = jax.jit(
    wavefront_trace_pallas3,
    static_argnames=("n_slots", "n_bounce", "r_blk", "exit_frac",
                     "return_launches", "sample_groups", "mat_classes"),
)
