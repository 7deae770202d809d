"""Pallas TPU bounce megakernel (sphere-only scenes).

One wavefront iteration — intersect, shade, terminate, regenerate,
count — fused into a single Mosaic kernel over ``(R, 128)``-shaped lane
state (SoA by vector component, the VPU-native layout). Only the texture
atlas fetch stays outside: random texel access is a hardware
per-row-cost gather (~4.7 ns/row, tools/gather_probe*.py) with no Mosaic
in-kernel equivalent for >8k-entry tables, so the kernel emits flat
texel indices and the XLA glue gathers + multiplies throughput.

Semantics are identical to render.wavefront_trace (same formulas, same
stateless PCG4D streams — rng.pcg4d compiles inside Mosaic bit-exactly);
tests compare the two paths directly.

Reference call-outs as in render.py: rayColor loop raytrace.zig:62-100,
sphere hit sphere.zig:31-69, materials material.zig:43-128, texture
texture.zig:52-74, camera camera.zig:46-52, sky raytrace.zig:53-58.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zraytrace_tpu import rng as zrng
from zraytrace_tpu import scene as sc

LANE = 128

# int-parameter slots
(P_WIDTH, P_HEIGHT, P_SEND, P_MAXDEPTH, P_SEED, P_NPIX, P_STRIDE,
 P_SSTART, P_ATLASW, P_NSLOTS) = range(10)

# counter-output slots (match render.py C_* order)
N_COUNTS = 8


class SceneTables(NamedTuple):
    """Host-prepared SMEM tables."""

    cam: jnp.ndarray  # (12,) f32: origin, lower_left, horizontal, vertical
    spheres: jnp.ndarray  # (S, 5) f32: cx, cy, cz, radius, mat_id
    mats: jnp.ndarray  # (M, 11) f32: [type, ior, textype, r, g, b,
    #                                  base, uoff, voff, th, tw]
    atlas_flat: jnp.ndarray  # (F, 3) f32 flattened atlas (HBM side)


def prepare_tables(scene: sc.Scene, camera) -> SceneTables:
    cam = jnp.concatenate([
        camera.origin, camera.lower_left, camera.horizontal, camera.vertical
    ]).astype(jnp.float32)
    spheres = jnp.concatenate(
        [scene.sph_center,
         scene.sph_radius[:, None],
         scene.sph_mat.astype(jnp.float32)[:, None]], axis=1)
    a_h, a_w = scene.atlas.shape[1], scene.atlas.shape[2]
    tex_id = scene.mat_tex
    aid = scene.tex_image[tex_id]
    hw = scene.atlas_hw[aid].astype(jnp.float32)
    mats = jnp.concatenate(
        [scene.mat_type.astype(jnp.float32)[:, None],
         scene.mat_ior[:, None],
         scene.tex_type[tex_id].astype(jnp.float32)[:, None],
         scene.tex_color[tex_id],
         (aid * (a_h * a_w)).astype(jnp.float32)[:, None],
         scene.tex_offset[tex_id],
         hw], axis=1)
    return SceneTables(
        cam=cam, spheres=spheres, mats=mats,
        atlas_flat=scene.atlas.reshape(-1, 3),
    )


def _dot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _normalize(x, y, z):
    inv = jax.lax.rsqrt(x * x + y * y + z * z)
    return x * inv, y * inv, z * inv


def _atan_core(z):
    """atan for |z| <= 1, Cephes atanf minimax polynomial (~2 ulp f32)."""
    z2 = z * z
    p = jnp.float32(8.05374449538e-2)
    p = p * z2 - jnp.float32(1.38776856032e-1)
    p = p * z2 + jnp.float32(1.99777106478e-1)
    p = p * z2 - jnp.float32(3.33329491539e-1)
    return p * z2 * z + z


def _atan2(y, x):
    """atan2 built from the poly core (Mosaic has no inverse trig).

    Accuracy ~1e-7 rad; the only consumer is the spherical-uv texel
    index, where this is far below one texel."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    big = ay > ax
    num = jnp.where(big, ax, ay)
    den = jnp.where(big, ay, ax)
    den = jnp.where(den > 0.0, den, 1.0)  # (0,0) -> 0
    a = _atan_core(num / den)
    a = jnp.where(big, jnp.float32(np.pi / 2) - a, a)
    a = jnp.where(x < 0.0, jnp.float32(np.pi) - a, a)
    return jnp.where(y < 0.0, -a, a)


def _acos(x):
    """acos via atan2(sqrt(1-x^2), x); |x| must be < 1 (callers clip)."""
    s = jnp.sqrt(jnp.maximum(0.0, (1.0 - x) * (1.0 + x)))
    return _atan2(s, x)


def _uniform4(seed_c, pix, samp, dep):
    """pcg4d over (R,128) int32 lanes -> four U[0,1) floats."""
    u = lambda v: v.astype(jnp.uint32)
    ctr = jnp.stack([u(pix), u(samp), u(dep), jnp.broadcast_to(seed_c, pix.shape)],
                    axis=-1)
    bits = zrng.pcg4d(ctr)
    f = lambda k: (bits[..., k] >> 8).astype(jnp.int32).astype(jnp.float32) * (
        jnp.float32(1.0 / 16777216.0))
    return f(0), f(1), f(2), f(3)


# Lane rows per grid block: bounds the kernel's scoped-VMEM stack (the
# straight-line body holds many live (R,128) temporaries; 64 rows needs
# ~24 MB, above the 16 MB default scoped limit, hence CompilerParams).
R_BLK = 64
VMEM_LIMIT = 100 * 1024 * 1024


def make_bounce_kernel(n_spheres: int, n_mats: int, shape):
    """Build the pallas_call for a given sphere/material count and lane
    shape (R, 128), gridded over R_BLK-row lane blocks. All counts are
    static (unrolled loops)."""
    R_total, L = shape
    assert L == LANE
    assert R_total % R_BLK == 0 or R_total < R_BLK, R_total
    R = min(R_BLK, R_total)
    n_blocks = -(-R_total // R)

    def kernel(
        # scalar-prefetch / SMEM inputs
        params_ref, cam_ref, sph_ref, mat_ref,
        # VMEM state inputs
        pix_ref,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
        tr_ref, tg_ref, tb_ref,
        ar_ref, ag_ref, ab_ref,
        dep_ref, samp_ref, slot_ref,
        # outputs
        ox_o, oy_o, oz_o, dx_o, dy_o, dz_o,
        tr_o, tg_o, tb_o,
        ar_o, ag_o, ab_o,
        dep_o, samp_o, slot_o,
        texidx_o, texneed_o,
        commit_o, commit_slot_o, cr_o, cg_o, cb_o,
        counts_o,
    ):
        width = params_ref[P_WIDTH]
        height = params_ref[P_HEIGHT]
        sample_end = params_ref[P_SEND]
        max_depth = params_ref[P_MAXDEPTH]
        seed = params_ref[P_SEED]
        n_pixels = params_ref[P_NPIX]
        stride = params_ref[P_STRIDE]
        sample_start = params_ref[P_SSTART]
        fw = width.astype(jnp.float32)
        fh = height.astype(jnp.float32)

        atlas_w = params_ref[P_ATLASW]
        n_slots = params_ref[P_NSLOTS]
        base = pix_ref[:]
        slot = slot_ref[:]
        pixel = base + slot * stride
        alive = (slot < n_slots) & (pixel < n_pixels)
        dep = dep_ref[:]
        samp = samp_ref[:]
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        tr, tg, tb = tr_ref[:], tg_ref[:], tb_ref[:]
        ar, ag, ab = ar_ref[:], ag_ref[:], ab_ref[:]

        exhausted = alive & (dep >= max_depth)
        processing = alive & ~exhausted

        # ---- closest sphere hit (fused running winner; sphere.zig:31-69)
        BIG = jnp.float32(3.4e38)
        o_dot_d = _dot(ox, oy, oz, dx, dy, dz)
        o_sq = _dot(ox, oy, oz, ox, oy, oz)
        blk = pix_ref.shape
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
            root = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)), 0.0)
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
        seed_sc = jnp.uint32(0) + jnp.uint32(int(zrng.STREAM_SCATTER))
        seed_c = jnp.asarray(seed, jnp.int32).astype(jnp.uint32) ^ seed_sc
        r0_, r1_, r2_, _ = _uniform4(seed_c, pixel, samp, dep)

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

        # texel index (texture.zig:52-74): u flip + offset + one-step wrap
        def wrap(x):
            x = jnp.where(x > 1.0, x - 1.0, x)
            return jnp.where(x < 0.0, x + 1.0, x)

        uu = wrap(1.0 - uu_ + uoff)
        vv = wrap(vv_ + voff)
        ix = jnp.clip((uu * tw).astype(jnp.int32), 0, tw.astype(jnp.int32) - 1)
        iy = jnp.clip((vv * th).astype(jnp.int32), 0, th.astype(jnp.int32) - 1)
        texflat = tbase.astype(jnp.int32) + iy * atlas_w + ix

        # ---- scatter (material.zig:71-128)
        # lambertian
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
        # metal: mirror
        ddn = _dot(dx, dy, dz, nx, ny, nz)
        mx = dx - 2.0 * ddn * nx
        my = dy - 2.0 * ddn * ny
        mz = dz - 2.0 * ddn * nz
        met_absorb = _dot(mx, my, mz, nx, ny, nz) <= 0.0
        # dielectric
        ratio = jnp.where(front, 1.0 / ior, ior)
        cos_t = jnp.minimum(-ddn, 1.0)
        sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
        cannot = ratio * sin_t > 1.0
        r0s = (1.0 - ratio) / (1.0 + ratio)
        schl = r0s + (1.0 - r0s) * (1.0 - cos_t) ** 5
        reflect_now = cannot | (schl > r2_)
        # refract (vector.zig:134-139)
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
        scattered = processing & hit & ~absorbed
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

        # throughput: const albedo applied here; image texels deferred to
        # the XLA glue (texneed). dielectric attenuation is white.
        use_img = textype > 0.5
        alr = jnp.where(is_lam | is_met, jnp.where(use_img, 1.0, col_r), 1.0)
        alg = jnp.where(is_lam | is_met, jnp.where(use_img, 1.0, col_g), 1.0)
        alb = jnp.where(is_lam | is_met, jnp.where(use_img, 1.0, col_b), 1.0)
        scf = scattered.astype(jnp.float32)
        sc_ = scattered
        tr = jnp.where(sc_, tr * alr, tr)
        tg = jnp.where(sc_, tg * alg, tg)
        tb = jnp.where(sc_, tb * alb, tb)
        texneed = sc_ & (is_lam | is_met) & use_img

        ox = jnp.where(sc_, px_, ox)
        oy = jnp.where(sc_, py_, oy)
        oz = jnp.where(sc_, pz_, oz)
        dx = jnp.where(sc_, sx, dx)
        dy = jnp.where(sc_, sy, dy)
        dz = jnp.where(sc_, sz, dz)
        dep = jnp.where(sc_, dep + 1, dep)

        # sample/pixel bookkeeping
        samp2 = samp + path_done.astype(jnp.int32)
        finished = path_done & (samp2 >= sample_end)
        commit_o[:] = finished.astype(jnp.int32)
        commit_slot_o[:] = slot
        fmask = finished.astype(jnp.float32)
        cr_o[:] = ar * fmask
        cg_o[:] = ag * fmask
        cb_o[:] = ab * fmask
        ar = jnp.where(finished, 0.0, ar)
        ag = jnp.where(finished, 0.0, ag)
        ab = jnp.where(finished, 0.0, ab)
        slot2 = slot + finished.astype(jnp.int32)
        samp2 = jnp.where(finished, sample_start, samp2)

        # camera regeneration (camera.zig:46-52; jitter raytrace.zig:174)
        pixel2 = base + slot2 * stride
        seed_cam = jnp.asarray(seed, jnp.int32).astype(jnp.uint32) ^ jnp.uint32(
            int(zrng.STREAM_CAMERA))
        j0, j1, _, _ = _uniform4(seed_cam, pixel2, samp2, jnp.zeros_like(dep))
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

        # outputs
        ox_o[:] = ox
        oy_o[:] = oy
        oz_o[:] = oz
        dx_o[:] = dx
        dy_o[:] = dy
        dz_o[:] = dz
        tr_o[:] = tr
        tg_o[:] = tg
        tb_o[:] = tb
        ar_o[:] = ar
        ag_o[:] = ag
        ab_o[:] = ab
        dep_o[:] = dep
        samp_o[:] = samp2
        slot_o[:] = slot2
        texidx_o[:] = jnp.where(texneed, texflat, 0)
        texneed_o[:] = texneed.astype(jnp.int32)

        cnt = lambda m: jnp.sum(m.astype(jnp.int32))
        blk_i = pl.program_id(0)
        counts_o[blk_i, 0] = cnt(processing)
        counts_o[blk_i, 1] = cnt(scattered)
        counts_o[blk_i, 2] = cnt(miss)
        counts_o[blk_i, 3] = cnt(exhausted)
        counts_o[blk_i, 4] = cnt(path_done)
        counts_o[blk_i, 5] = jnp.int32(1)
        counts_o[blk_i, 6] = cnt(texneed)
        counts_o[blk_i, 7] = jnp.int32(0)

    f32 = jnp.float32
    i32 = jnp.int32
    st = lambda dt: jax.ShapeDtypeStruct((R_total, L), dt)
    out_shape = (
        [st(f32)] * 12 + [st(i32)] * 3
        + [st(i32), st(i32)]
        + [st(i32), st(i32), st(f32), st(f32), st(f32)]
        + [jax.ShapeDtypeStruct((n_blocks, N_COUNTS), i32)]
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    lane_blk = lambda: pl.BlockSpec((R, L), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
    in_specs = [smem(), smem(), smem(), smem()] + [lane_blk()] * 16
    out_specs = tuple(
        [lane_blk()] * 22
        # counters: whole (n_blocks, 8) SMEM buffer, each grid step
        # writes its own row (blocked specs need 8/128-divisible tiles)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
    )
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret_mode(),
    )


def _interpret_mode() -> bool:
    import jax as _j

    return _j.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# XLA glue: while_loop around the kernel + the one atlas gather
# ---------------------------------------------------------------------------


def wavefront_trace_pallas(
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
):
    """Same contract as render.wavefront_trace, driven by the Pallas
    bounce kernel. Sphere-only scenes (the megakernel path); callers fall
    back to the XLA wavefront otherwise."""
    from zraytrace_tpu import camera as cam_mod
    from zraytrace_tpu.render import (
        C_ITERS, N_COUNTERS, _u64_add,
    )

    assert scene.n_triangles == 0 and scene.n_spheres > 0
    n = pixel_base.shape[0]
    assert n % LANE == 0, f"lane count {n} must be a multiple of {LANE}"
    R = n // LANE
    shape = (R, LANE)

    tables = prepare_tables(scene, camera)
    S = int(tables.spheres.shape[0])
    M = int(tables.mats.shape[0])
    kernel = make_bounce_kernel(S, M, shape)

    width_i = jnp.asarray(width, jnp.int32)
    height_i = jnp.asarray(height, jnp.int32)
    spp_i = jnp.asarray(spp, jnp.int32)
    sstart_i = jnp.asarray(sample_start, jnp.int32)
    stride_i = jnp.asarray(n if pixel_stride is None else pixel_stride, jnp.int32)
    npix_i = (width_i * height_i if n_pixels is None
              else jnp.asarray(n_pixels, jnp.int32))
    atlas_w = scene.atlas.shape[2]
    params = jnp.stack([
        width_i, height_i, sstart_i + spp_i,
        jnp.asarray(max_depth, jnp.int32),
        jnp.asarray(seed, jnp.int32), npix_i, stride_i, sstart_i,
        jnp.asarray(atlas_w, jnp.int32), jnp.asarray(n_slots, jnp.int32),
    ])

    base2 = pixel_base.reshape(shape)
    # initial camera rays via the shared XLA helpers (identical streams)
    j = zrng.uniform4(seed, pixel_base, sstart_i, 0, zrng.STREAM_CAMERA)
    px = (pixel_base % width_i).astype(jnp.float32)
    py = (pixel_base // width_i).astype(jnp.float32)
    u, v = cam_mod.pixel_uv(px, py, j[:, 0], j[:, 1],
                            width_i.astype(jnp.float32),
                            height_i.astype(jnp.float32))
    o0, d0 = cam_mod.get_rays(camera, u, v)
    r2 = lambda x: x.reshape(shape)

    state = dict(
        ox=r2(o0[:, 0]), oy=r2(o0[:, 1]), oz=r2(o0[:, 2]),
        dx=r2(d0[:, 0]), dy=r2(d0[:, 1]), dz=r2(d0[:, 2]),
        tr=jnp.ones(shape), tg=jnp.ones(shape), tb=jnp.ones(shape),
        ar=jnp.zeros(shape), ag=jnp.zeros(shape), ab=jnp.zeros(shape),
        dep=jnp.zeros(shape, jnp.int32),
        samp=jnp.full(shape, sstart_i, jnp.int32),
        slot=jnp.zeros(shape, jnp.int32),
        slot_sums=jnp.zeros((n_slots, R, LANE, 3), jnp.float32),
        counters=jnp.zeros((N_COUNTERS, 2), jnp.uint32),
    )

    def cond(s):
        return jnp.any((s["slot"] < n_slots) & (base2 + s["slot"] * stride_i < npix_i))

    def body(s):
        outs = kernel(
            params, tables.cam, tables.spheres, tables.mats, base2,
            s["ox"], s["oy"], s["oz"], s["dx"], s["dy"], s["dz"],
            s["tr"], s["tg"], s["tb"], s["ar"], s["ag"], s["ab"],
            s["dep"], s["samp"], s["slot"],
        )
        (ox, oy, oz, dx, dy, dz, tr, tg, tb, ar, ag, ab,
         dep, samp, slot, texidx, texneed,
         commit, commit_slot, cr, cg, cb, counts) = outs

        # the one per-iteration gather: image-texture albedo
        texel = tables.atlas_flat[texidx]  # (R, 128, 3)
        need = texneed > 0
        tr = jnp.where(need, tr * texel[..., 0], tr)
        tg = jnp.where(need, tg * texel[..., 1], tg)
        tb = jnp.where(need, tb * texel[..., 2], tb)

        slot_sums = s["slot_sums"]
        cm = commit > 0
        for k in range(n_slots):
            mk = (cm & (commit_slot == k)).astype(jnp.float32)
            add = jnp.stack([cr * mk, cg * mk, cb * mk], axis=-1)
            slot_sums = slot_sums.at[k].set(slot_sums[k] + add)

        counters = s["counters"]
        totals = counts.sum(axis=0)  # (N_COUNTS,) over lane blocks
        # the iteration counter is per-block 1; count once
        totals = totals.at[5].set(jnp.int32(1))
        for slot_i in range(6):
            counters = counters.at[slot_i].set(
                _u64_add(counters[slot_i], totals[slot_i].astype(jnp.uint32))
            )

        return dict(
            ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
            tr=tr, tg=tg, tb=tb, ar=ar, ag=ag, ab=ab,
            dep=dep, samp=samp, slot=slot,
            slot_sums=slot_sums, counters=counters,
        )

    final = jax.lax.while_loop(cond, body, state)
    sums = final["slot_sums"].reshape(n_slots, n, 3)
    return sums, final["counters"]


_wavefront_pallas_jit = jax.jit(
    wavefront_trace_pallas, static_argnames=("n_slots",)
)
