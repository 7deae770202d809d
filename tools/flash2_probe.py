#!/usr/bin/env python
"""Probe the MXU-matmul triangle-intersection structure for flash2.

The existing flash kernel streams 128-triangle chunks through VPU
broadcast arithmetic — measured near its op-count bound (~35 ops/pair).
flash2 computes all four Moller numerators as ONE (R,16)@(16,4G) matmul
per triangle group, putting the heavy lifting on the MXU.

Variants:
  mm         — the matmul alone, (512,16)@(16,6400)
  mm_elem    — matmul + 15-op elementwise postprocess + min-reduce
  full       — complete intersect block vs numpy oracle (correctness)
  flash1     — current flash kernel chunk-loop cost for comparison
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

R = 512          # rays per block
G = 1600         # triangles per matmul group
NG = 4           # groups
T = G * NG       # triangles total (teapot-scale: 6320 -> 6400)
K = 16           # padded contraction dim (o,d,oxd,1 = 10 -> 16)
REPS = 16


def _force(x):
    return float(jnp.asarray(x).ravel()[0].astype(jnp.float32))


def probe_mm():
    def kernel(lhs_ref, rhs_ref, o_ref):
        def body(i, acc):
            return acc + jnp.dot(lhs_ref[:], rhs_ref[:],
                                 preferred_element_type=jnp.float32)[:, :128]

        o_ref[:] = jax.lax.fori_loop(0, REPS, body,
                                     jnp.zeros((R, 128), jnp.float32))

    rng = np.random.default_rng(0)
    lhs = jnp.asarray(rng.random((R, K)), jnp.float32)
    rhs = jnp.asarray(rng.random((K, 4 * G)), jnp.float32)
    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    ))
    _force(f(lhs, rhs))
    t0 = time.time()
    for _ in range(3):
        _force(f(lhs, rhs))
    dt = (time.time() - t0) / 3 / REPS
    return f"{dt*1e6:.2f} us per (512,16)@(16,{4*G}) matmul"


def probe_mm_elem():
    def kernel(lhs_ref, rhs_ref, o_ref):
        def body(i, carry):
            t_best, i_best = carry
            out = jnp.dot(lhs_ref[:], rhs_ref[:],
                          preferred_element_type=jnp.float32)
            det = out[:, 0 * G:1 * G]
            un = out[:, 1 * G:2 * G]
            vn = out[:, 2 * G:3 * G]
            tn = out[:, 3 * G:4 * G]
            safe = jnp.abs(det) > 1e-12
            inv = 1.0 / jnp.where(safe, det, 1.0)
            u = un * inv
            v = vn * inv
            t = tn * inv
            hit = ((det >= 1e-6) & (t > 1e-3) & (u >= 0.0) & (v >= 0.0)
                   & (u + v <= 1.0))
            t = jnp.where(hit, t, 3.4e38)
            tc = jnp.min(t, axis=1)
            ids = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            lane = jnp.min(jnp.where(t == tc[:, None], ids, jnp.int32(G)),
                           axis=1)
            better = tc < t_best
            return (jnp.where(better, tc, t_best),
                    jnp.where(better, lane + i, i_best))

        t_best, i_best = jax.lax.fori_loop(
            0, REPS, body,
            (jnp.full((R,), 3.4e38), jnp.zeros((R,), jnp.int32)))
        o_ref[:] = jnp.stack([t_best, i_best.astype(jnp.float32)], axis=-1)

    rng = np.random.default_rng(0)
    lhs = jnp.asarray(rng.random((R, K)), jnp.float32)
    rhs = jnp.asarray(rng.random((K, 4 * G)), jnp.float32)
    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, 2), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    ))
    _force(f(lhs, rhs))
    t0 = time.time()
    for _ in range(3):
        _force(f(lhs, rhs))
    dt = (time.time() - t0) / 3 / REPS
    per_block = dt * NG
    return (f"{dt*1e6:.2f} us per group -> {per_block*1e6:.1f} us per "
            f"512-ray x {T}-tri block (flash1 ~137 us)")


def probe_flash1():
    from zraytrace_tpu.ops.flash_intersect import (
        flash_intersect_triangles, pack_tri_planes,
    )
    from zraytrace_tpu.scenes import teapot_and_ball

    built = teapot_and_ball()
    sc = built.scene
    planes = pack_tri_planes(sc.tri_a, sc.tri_b, sc.tri_c)
    rng = np.random.default_rng(0)
    n = 1 << 16
    o = jnp.asarray(rng.random((n, 3)) * 4 - 2, jnp.float32)
    d0 = rng.standard_normal((n, 3))
    d = jnp.asarray(d0 / np.linalg.norm(d0, axis=1, keepdims=True),
                    jnp.float32)
    f = jax.jit(lambda o, d: flash_intersect_triangles(planes, o, d, 1e-3))
    _force(f(o, d)[0])
    t0 = time.time()
    for _ in range(3):
        _force(f(o, d)[0])
    dt = (time.time() - t0) / 3
    per_block = dt / (n // 512)
    return f"{dt*1e3:.2f} ms per {n} rays = {per_block*1e6:.1f} us/512-ray block"


def main():
    sel = sys.argv[1:] or ["mm", "mm_elem", "flash1"]
    for name in sel:
        fn = globals()[f"probe_{name}"]
        try:
            t0 = time.time()
            out = fn()
            print(f"[OK] {name:<10} {out} [compile+run {time.time()-t0:.0f}s]",
                  flush=True)
        except Exception as e:
            msg = " / ".join(str(e).split("\n")[:2])[:240]
            print(f"[FAIL] {name}: {type(e).__name__}: {msg}", flush=True)


def probe_mm128():
    KK = 128

    def kernel(lhs_ref, rhs_ref, o_ref):
        def body(i, acc):
            return acc + jnp.dot(lhs_ref[:], rhs_ref[:],
                                 preferred_element_type=jnp.float32)[:, :128]

        o_ref[:] = jax.lax.fori_loop(0, REPS, body,
                                     jnp.zeros((R, 128), jnp.float32))

    rng = np.random.default_rng(0)
    lhs = jnp.asarray(rng.random((R, KK)), jnp.float32)
    rhs = jnp.asarray(rng.random((KK, 4 * G)), jnp.float32)
    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    ))
    _force(f(lhs, rhs))
    t0 = time.time()
    for _ in range(3):
        _force(f(lhs, rhs))
    dt = (time.time() - t0) / 3 / REPS
    gf = R * 4 * G * KK * 2 / dt / 1e9
    return f"{dt*1e6:.2f} us per (512,128)@(128,{4*G}) = {gf:.0f} GFLOP/s"


def probe_mm_xla():
    """Same matmul OUTSIDE pallas (pure XLA) for comparison."""
    rng = np.random.default_rng(0)
    lhs = jnp.asarray(rng.random((R, K)), jnp.float32)
    rhs = jnp.asarray(rng.random((K, 4 * G)), jnp.float32)

    @jax.jit
    def f(lhs, rhs):
        def body(i, acc):
            return acc + jnp.dot(lhs + i * 0.0, rhs)[:, :128]

        return jax.lax.fori_loop(0, REPS, body,
                                 jnp.zeros((R, 128), jnp.float32))

    _force(f(lhs, rhs))
    t0 = time.time()
    for _ in range(3):
        _force(f(lhs, rhs))
    dt = (time.time() - t0) / 3 / REPS
    return f"{dt*1e6:.2f} us per (512,{K})@({K},{4*G}) in XLA"




def probe_cull():
    """If chunk culling truly skips, rays aimed away from the scene
    should run ~10x faster than rays into it."""
    from zraytrace_tpu.geometry.bvh import build_tri_bvh
    from zraytrace_tpu.ops.flash_intersect import (
        flash_intersect_triangles, pack_tri_planes,
    )
    from zraytrace_tpu.scenes import teapot_and_ball

    built = teapot_and_ball()
    sc = built.scene
    order = build_tri_bvh(sc.tri_a, sc.tri_b, sc.tri_c).prim_order
    planes = pack_tri_planes(sc.tri_a, sc.tri_b, sc.tri_c, order=order)
    rng = np.random.default_rng(0)
    n = 1 << 16
    o = jnp.asarray(rng.random((n, 3)) * 4 - 2, jnp.float32)
    d0 = rng.standard_normal((n, 3))
    d_in = jnp.asarray(d0 / np.linalg.norm(d0, axis=1, keepdims=True),
                       jnp.float32)
    # away: origins far above, directions straight up
    o_away = o + jnp.asarray([0.0, 100.0, 0.0])
    d_away = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (n, 3))
    f = jax.jit(lambda o, d: flash_intersect_triangles(planes, o, d, 1e-3))
    out = []
    for name, oo, dd in (("into", o, d_in), ("away", o_away, d_away)):
        _force(f(oo, dd)[0])
        t0 = time.time()
        for _ in range(3):
            _force(f(oo, dd)[0])
        dt = (time.time() - t0) / 3
        out.append(f"{name}={dt*1e3:.1f}ms")
    return " ".join(out)




def probe_cullwhen():
    """pl.when + out_ref mutation instead of lax.cond carries: does
    Mosaic generate a real branch?"""
    from zraytrace_tpu.geometry.bvh import build_tri_bvh
    from zraytrace_tpu.ops.flash_intersect import (
        LANE, N_COMP, pack_tri_planes,
    )
    from zraytrace_tpu.scenes import teapot_and_ball

    built = teapot_and_ball()
    sc = built.scene
    order = build_tri_bvh(sc.tri_a, sc.tri_b, sc.tri_c).prim_order
    planes = pack_tri_planes(sc.tri_a, sc.tri_b, sc.tri_c, order=order)
    RB = 512

    def kernel(planes_ref, bounds_ref, o_ref, d_ref, out_ref):
        n_chunks = planes_ref.shape[1]
        ox = o_ref[:, 0:1]
        oy = o_ref[:, 1:2]
        oz = o_ref[:, 2:3]
        dx = d_ref[:, 0:1]
        dy = d_ref[:, 1:2]
        dz = d_ref[:, 2:3]
        pxv = oy * dz - oz * dy
        pyv = oz * dx - ox * dz
        pzv = ox * dy - oy * dx
        omin = [jnp.min(o_ref[:, k]) for k in range(3)]
        omax = [jnp.max(o_ref[:, k]) for k in range(3)]
        dmin = [jnp.min(d_ref[:, k]) for k in range(3)]
        dmax = [jnp.max(d_ref[:, k]) for k in range(3)]

        def reach(ci):
            near = jnp.float32(0.0)
            far = jnp.float32(3.4e38)
            for ax in range(3):
                lo = bounds_ref[ci, ax]
                hi = bounds_ref[ci, 3 + ax]
                dl, dh = dmin[ax], dmax[ax]
                spans = (dl <= 0.0) & (dh >= 0.0)
                il = 1.0 / jnp.where(spans, 1.0, dl)
                ih = 1.0 / jnp.where(spans, 1.0, dh)
                cs = [(lo - omax[ax]) * il, (lo - omax[ax]) * ih,
                      (lo - omin[ax]) * il, (lo - omin[ax]) * ih,
                      (hi - omax[ax]) * il, (hi - omax[ax]) * ih,
                      (hi - omin[ax]) * il, (hi - omin[ax]) * ih]
                lo_t = cs[0]
                hi_t = cs[0]
                for cc in cs[1:]:
                    lo_t = jnp.minimum(lo_t, cc)
                    hi_t = jnp.maximum(hi_t, cc)
                near = jnp.where(spans, near, jnp.maximum(near, lo_t))
                far = jnp.where(spans, far, jnp.minimum(far, hi_t))
            return near <= far

        out_ref[:, 0] = jnp.full((RB,), 3.4e38)

        def chunk_body(ci, _):
            @pl.when(reach(ci))
            def _():
                pr = lambda k: planes_ref[k, ci, :][None, :]
                e1x, e1y, e1z = pr(0), pr(1), pr(2)
                e2x, e2y, e2z = pr(3), pr(4), pr(5)
                fnx, fny, fnz = pr(6), pr(7), pr(8)
                qax, qay, qaz = pr(9), pr(10), pr(11)
                rax, ray_, raz = pr(12), pr(13), pr(14)
                adf = pr(15)
                valid = pr(16)
                t_best = out_ref[:, 0]
                det = -(dx * fnx + dy * fny + dz * fnz)
                safe = jnp.abs(det) > 1e-12
                inv_det = 1.0 / jnp.where(safe, det, 1.0)
                u = (pxv * e2x + pyv * e2y + pzv * e2z
                     - (dx * qax + dy * qay + dz * qaz)) * inv_det
                v = -(pxv * e1x + pyv * e1y + pzv * e1z
                      - (dx * rax + dy * ray_ + dz * raz)) * inv_det
                t = (ox * fnx + oy * fny + oz * fnz - adf) * inv_det
                is_hit = ((det >= 1e-6) & (t > 1e-3)
                          & (t < t_best[:, None])
                          & (u >= 0.0) & (v >= 0.0)
                          & (u + v <= 1.0) & (valid > 0.5))
                t = jnp.where(is_hit, t, 3.4e38)
                tc = jnp.min(t, axis=1)
                out_ref[:, 0] = jnp.minimum(t_best, tc)
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    f = jax.jit(pl.pallas_call(
        kernel,
        grid=(1 << 16) // RB,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((RB, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RB, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1 << 16, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    ))
    rng = np.random.default_rng(0)
    n = 1 << 16
    o = jnp.asarray(rng.random((n, 3)) * 4 - 2, jnp.float32)
    d0 = rng.standard_normal((n, 3))
    d_in = jnp.asarray(d0 / np.linalg.norm(d0, axis=1, keepdims=True),
                       jnp.float32)
    o_away = o + jnp.asarray([0.0, 100.0, 0.0])
    d_away = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (n, 3))
    out = []
    for name, oo, dd in (("into", o, d_in), ("away", o_away, d_away)):
        _force(f(planes.planes, planes.bounds, oo, dd))
        t0 = time.time()
        for _ in range(3):
            _force(f(planes.planes, planes.bounds, oo, dd))
        dt = (time.time() - t0) / 3
        out.append(f"{name}={dt*1e3:.1f}ms")
    return " ".join(out)


if __name__ == "__main__":
    main()
