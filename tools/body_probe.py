#!/usr/bin/env python
"""Isolate what makes the bounce-kernel body slow on TPU.

Each variant is the same pallas plumbing (16 (R,128) state arrays in/out,
R_BLK=8 grid blocks, B in-kernel iterations) with a different slice of
the real body. Timing: K sequential launches chained inside one jit, so
relay RPC latency (~25 ms/execution) amortizes away; variant 'pass'
(no-op) is the launch+DMA baseline to subtract.

Usage: python tools/body_probe.py [variant ...]
"""

import sys
import time

from zraytrace_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zraytrace_tpu import rng as zrng
from zraytrace_tpu.ops.common import (
    _acos, _atan2, _dot, _normalize, _uniform4, prepare_tables,
)
from zraytrace_tpu.scenes import three_balls

R_TOT, L = 1024, 128
R_BLK = 8
B = 8
K = 24  # chained launches per timing
N_SPH, N_MAT = 7, 5
blk = (R_BLK, L)


def body_full(c, sph_ref, mat_ref, cam_ref, base, consts):
    """The real per-iteration body (sans slot commit/pend)."""
    (ox, oy, oz, dx, dy, dz, tr, tg, tb, ar, ag, ab, dep, samp, slot) = c
    width, height, seed_sc, seed_cam, stride, npix, n_slots, sample_end, sample_start, max_depth, atlas_w = consts
    pixel = base + slot * stride
    alive = (slot < n_slots) & (pixel < npix)
    exhausted = alive & (dep >= max_depth)
    processing = alive & ~exhausted

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
    for s in range(N_SPH):
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
    front = _dot(dx, dy, dz, nx, ny, nz) <= 0.0
    fsign = jnp.where(front, 1.0, -1.0)
    nx, ny, nz = nx * fsign, ny * fsign, nz * fsign
    ony = jnp.clip(ny * fsign, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = _acos(-ony)
    onx = nx * fsign
    onz = nz * fsign
    pole = (jnp.abs(onx) + jnp.abs(onz)) < 1e-12
    onx = jnp.where(pole, 1e-12, onx)
    phi = _atan2(-onz, -onx) + jnp.float32(np.pi)
    uu_ = phi * jnp.float32(1.0 / (2.0 * np.pi))
    vv_ = theta * jnp.float32(1.0 / np.pi)

    r0_, r1_, r2_, _ = _uniform4(seed_sc, pixel, samp, dep)

    def sel(col):
        out = jnp.zeros(blk, jnp.float32)
        for m in range(N_MAT):
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

    def wrap(x):
        x = jnp.where(x > 1.0, x - 1.0, x)
        return jnp.where(x < 0.0, x + 1.0, x)

    uu = wrap(1.0 - uu_ + uoff)
    vv = wrap(vv_ + voff)
    ix = jnp.clip((uu * tw).astype(jnp.int32), 0, tw.astype(jnp.int32) - 1)
    iy = jnp.clip((vv * th).astype(jnp.int32), 0, th.astype(jnp.int32) - 1)
    texflat = tbase.astype(jnp.int32) + iy * atlas_w + ix

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

    tsky = 0.5 * (dy + 1.0)
    skyr = (1.0 - tsky) + tsky * 0.5
    skyg = (1.0 - tsky) + tsky * 0.7
    skyb = (1.0 - tsky) + tsky * 1.0
    mf = miss.astype(jnp.float32)
    ar = ar + mf * tr * skyr
    ag = ag + mf * tg * skyg
    ab = ab + mf * tb * skyb

    use_img = textype > 0.5
    alr = jnp.where(is_lam | is_met, jnp.where(use_img, 1.0, col_r), 1.0)
    alg = jnp.where(is_lam | is_met, jnp.where(use_img, 1.0, col_g), 1.0)
    alb = jnp.where(is_lam | is_met, jnp.where(use_img, 1.0, col_b), 1.0)
    tr = jnp.where(sc_, tr * alr, tr)
    tg = jnp.where(sc_, tg * alg, tg)
    tb = jnp.where(sc_, tb * alb, tb)

    ox = jnp.where(sc_, px_, ox)
    oy = jnp.where(sc_, py_, oy)
    oz = jnp.where(sc_, pz_, oz)
    dx = jnp.where(sc_, sx, dx)
    dy = jnp.where(sc_, sy, dy)
    dz = jnp.where(sc_, sz, dz)
    dep = jnp.where(sc_, dep + 1, dep) + (texflat & 0)  # keep texflat live

    samp2 = samp + path_done.astype(jnp.int32)
    finished = path_done & (samp2 >= sample_end)
    ar = jnp.where(finished, 0.0, ar)
    ag = jnp.where(finished, 0.0, ag)
    ab = jnp.where(finished, 0.0, ab)
    slot2 = slot + finished.astype(jnp.int32)
    samp2 = jnp.where(finished, sample_start, samp2)

    pixel2 = base + slot2 * stride
    j0, j1, _, _ = _uniform4(seed_cam, pixel2, samp2, jnp.zeros_like(dep))
    pxf = (pixel2 % width).astype(jnp.float32)
    pyf = (pixel2 // width).astype(jnp.float32)
    cu = (pxf + j0 - 0.5) / width.astype(jnp.float32)
    cv = (pyf + j1 - 0.5) / height.astype(jnp.float32)
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
    dep2 = jnp.where(pd, 0, dep)
    return (ox, oy, oz, dx, dy, dz, tr, tg, tb, ar, ag, ab,
            dep2, samp2, slot2)


def body_pass(c, *a):
    return c


def body_spheres(c, sph_ref, mat_ref, cam_ref, base, consts):
    (ox, oy, oz, dx, dy, dz, tr, tg, tb, ar, ag, ab, dep, samp, slot) = c
    BIG = jnp.float32(3.4e38)
    o_dot_d = _dot(ox, oy, oz, dx, dy, dz)
    o_sq = _dot(ox, oy, oz, ox, oy, oz)
    t_best = jnp.full(blk, BIG)
    ms = jnp.zeros(blk, jnp.int32)
    t_min = jnp.float32(1e-3)
    for s in range(N_SPH):
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
        ms = jnp.where(better, mid, ms)
    return (ox, oy, oz, dx, dy, dz, jnp.where(t_best < BIG, tr, t_best),
            tg, tb + ms.astype(jnp.float32), ar, ag, ab, dep, samp, slot)


def body_rng(c, sph_ref, mat_ref, cam_ref, base, consts):
    (ox, oy, oz, dx, dy, dz, tr, tg, tb, ar, ag, ab, dep, samp, slot) = c
    _, _, seed_sc, seed_cam, stride, *_ = consts
    pixel = base + slot * stride
    r0, r1, r2, _ = _uniform4(seed_sc, pixel, samp, dep)
    j0, j1, _, _ = _uniform4(seed_cam, pixel, samp, dep)
    return (ox + r0, oy + r1, oz + r2, dx + j0, dy + j1, dz, tr, tg, tb,
            ar, ag, ab, dep, samp, slot)


def body_trig(c, sph_ref, mat_ref, cam_ref, base, consts):
    (ox, oy, oz, dx, dy, dz, tr, tg, tb, ar, ag, ab, dep, samp, slot) = c
    ony = jnp.clip(dy, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = _acos(-ony)
    phi = _atan2(-dz, -dx) + jnp.float32(np.pi)
    s = jnp.sin(theta * 2.0)
    co = jnp.cos(phi)
    return (ox + s, oy + co, oz + theta, dx, dy, dz, tr, tg, tb,
            ar, ag, ab, dep, samp, slot)


def body_intdiv(c, sph_ref, mat_ref, cam_ref, base, consts):
    (ox, oy, oz, dx, dy, dz, tr, tg, tb, ar, ag, ab, dep, samp, slot) = c
    width, *_ = consts
    pixel = base + slot
    pxf = (pixel % width).astype(jnp.float32)
    pyf = (pixel // width).astype(jnp.float32)
    return (ox + pxf, oy + pyf, oz, dx, dy, dz, tr, tg, tb,
            ar, ag, ab, dep, samp, slot)


def body_mats(c, sph_ref, mat_ref, cam_ref, base, consts):
    (ox, oy, oz, dx, dy, dz, tr, tg, tb, ar, ag, ab, dep, samp, slot) = c
    ms = dep % N_MAT

    def sel(col):
        out = jnp.zeros(blk, jnp.float32)
        for m in range(N_MAT):
            out = jnp.where(ms == m, mat_ref[m, col], out)
        return out

    acc = jnp.zeros(blk, jnp.float32)
    for col in range(11):
        acc = acc + sel(col)
    return (ox + acc, oy, oz, dx, dy, dz, tr, tg, tb,
            ar, ag, ab, dep, samp, slot)


VARIANTS = dict(pass_=body_pass, spheres=body_spheres, rng=body_rng,
                trig=body_trig, intdiv=body_intdiv, mats=body_mats,
                full=body_full)


def build(body_fn):
    n_blocks = R_TOT // R_BLK

    def kernel(params_ref, cam_ref, sph_ref, mat_ref, pix_ref, *refs):
        ins, outs = refs[:15], refs[15:]
        consts = (params_ref[0], params_ref[1],
                  params_ref[4].astype(jnp.uint32) ^ jnp.uint32(int(zrng.STREAM_SCATTER)),
                  params_ref[4].astype(jnp.uint32) ^ jnp.uint32(int(zrng.STREAM_CAMERA)),
                  params_ref[6], params_ref[5], params_ref[9],
                  params_ref[2], params_ref[7], params_ref[3],
                  params_ref[8])
        base = pix_ref[:]
        c = tuple(r[:] for r in ins)

        def it(_, c):
            return body_fn(c, sph_ref, mat_ref, cam_ref, base, consts)

        c = jax.lax.fori_loop(0, B, it, c)
        for r, v in zip(outs, c):
            r[:] = v

    f32, i32 = jnp.float32, jnp.int32
    st = lambda dt: jax.ShapeDtypeStruct((R_TOT, L), dt)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    lane = lambda: pl.BlockSpec((R_BLK, L), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=tuple([st(f32)] * 12 + [st(i32)] * 3),
        in_specs=[smem()] * 4 + [lane()] * 16,
        out_specs=tuple([lane()] * 15),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )


def main():
    sel = [a for a in sys.argv[1:]] or list(VARIANTS)
    built = three_balls()
    tables = prepare_tables(built.scene, built.camera)
    params = jnp.asarray([1000, 1000, 21, 30, 42, 1000000, R_TOT * L, 1,
                          built.scene.atlas.shape[2], 8], jnp.int32)
    rng = np.random.default_rng(0)
    f = lambda: jnp.asarray(rng.standard_normal((R_TOT, L)), jnp.float32)
    i = lambda hi: jnp.asarray(rng.integers(0, hi, (R_TOT, L)), jnp.int32)
    state = tuple([f() for _ in range(12)] + [i(5), i(10), i(2)])
    base = jnp.arange(R_TOT * L, dtype=jnp.int32).reshape(R_TOT, L) % (1 << 20)

    results = {}
    for name in sel:
        body = VARIANTS[name]
        kern = build(body)

        @jax.jit
        def chained(state):
            def step(_, c):
                outs = kern(params, tables.cam, tables.spheres, tables.mats,
                            base, *c)
                return tuple(outs)

            return jax.lax.fori_loop(0, K, step, state)

        try:
            t0 = time.time()
            out = chained(state)
            _ = float(jnp.sum(out[6]).astype(jnp.float32))
            compile_s = time.time() - t0
            t0 = time.time()
            out = chained(state)
            _ = float(jnp.sum(out[6]).astype(jnp.float32))
            dt = time.time() - t0
            per_iter = dt / (K * B) * 1e3
            results[name] = per_iter
            print(f"[OK] {name:<10} {per_iter:8.4f} ms/iter "
                  f"({per_iter/ (R_TOT*L) * 1e6:6.2f} ns/lane) "
                  f"compile={compile_s:.0f}s", flush=True)
        except Exception as e:
            msg = " / ".join(str(e).split("\n")[:2])[:240]
            print(f"[FAIL] {name}: {type(e).__name__}: {msg}", flush=True)
    if "pass_" in results:
        base_t = results["pass_"]
        for k, v in results.items():
            if k != "pass_":
                print(f"  {k:<10} net {v - base_t:8.4f} ms/iter")


if __name__ == "__main__":
    main()
