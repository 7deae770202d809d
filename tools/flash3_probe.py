#!/usr/bin/env python
"""Flash chunk-body restructures: where do the broadcast relayouts cost?

  base   — current flash1 inner loop ((512,1) x (1,128) implicit bcast)
  hoist  — ray components pre-broadcast to (512,128) once per block
  both   — ray comps AND plane rows pre-broadcast per chunk
  r8     — 8-sublane ray tiles: (8,128) ops, rays on sublanes, loop 64
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

R = 512
LANE = 128
NCHUNK = 50  # teapot-scale
REPS = 8


def _force(x):
    return float(jnp.asarray(x).ravel()[0].astype(jnp.float32))


def _chunk_math(ox, oy, oz, dx, dy, dz, pxv, pyv, pzv, pr, t_best):
    e1x, e1y, e1z = pr(0), pr(1), pr(2)
    e2x, e2y, e2z = pr(3), pr(4), pr(5)
    fnx, fny, fnz = pr(6), pr(7), pr(8)
    qax, qay, qaz = pr(9), pr(10), pr(11)
    rax, ray_, raz = pr(12), pr(13), pr(14)
    adf = pr(15)
    valid = pr(16)
    det = -(dx * fnx + dy * fny + dz * fnz)
    safe = jnp.abs(det) > 1e-12
    inv_det = 1.0 / jnp.where(safe, det, 1.0)
    u = (pxv * e2x + pyv * e2y + pzv * e2z
         - (dx * qax + dy * qay + dz * qaz)) * inv_det
    v = -(pxv * e1x + pyv * e1y + pzv * e1z
          - (dx * rax + dy * ray_ + dz * raz)) * inv_det
    t = (ox * fnx + oy * fny + oz * fnz - adf) * inv_det
    is_hit = ((det >= 1e-6) & (t > 1e-3) & (t < t_best)
              & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (valid > 0.5))
    return jnp.where(is_hit, t, 3.4e38)


def build(mode):
    RR = 8 if mode == "r8" else R
    n_sub = R // RR

    def kernel(planes_ref, o_ref, d_ref, out_ref):
        def sub_block(si):
            sl = slice(si * RR, (si + 1) * RR) if mode == "r8" else slice(None)
            ox = o_ref[sl, 0:1]
            oy = o_ref[sl, 1:2]
            oz = o_ref[sl, 2:3]
            dx = d_ref[sl, 0:1]
            dy = d_ref[sl, 1:2]
            dz = d_ref[sl, 2:3]
            if mode in ("hoist", "both"):
                bc = lambda x: jnp.broadcast_to(x, (RR, LANE))
                ox, oy, oz = bc(ox), bc(oy), bc(oz)
                dx, dy, dz = bc(dx), bc(dy), bc(dz)
            pxv = oy * dz - oz * dy
            pyv = oz * dx - ox * dz
            pzv = ox * dy - oy * dx

            def chunk_body(ci, t_best):
                if mode == "both":
                    pr = lambda k: jnp.broadcast_to(
                        planes_ref[k, ci, :][None, :], (RR, LANE))
                else:
                    pr = lambda k: planes_ref[k, ci, :][None, :]
                t = _chunk_math(ox, oy, oz, dx, dy, dz, pxv, pyv, pzv,
                                pr, t_best)
                return jnp.minimum(t_best, jnp.min(t, axis=1, keepdims=True))

            return jax.lax.fori_loop(
                0, NCHUNK, chunk_body, jnp.full((RR, 1), 3.4e38))

        def rep(i, acc):
            if mode == "r8":
                parts = [sub_block(si) for si in range(n_sub)]
                tb = jnp.concatenate(parts, axis=0)
            else:
                tb = sub_block(0)
            return acc + tb[:, 0]

        out_ref[:] = jax.lax.fori_loop(0, REPS, rep,
                                       jnp.zeros((R,), jnp.float32))

    return kernel


def run(mode):
    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.random((17, NCHUNK, LANE)), jnp.float32)
    o = jnp.asarray(rng.random((R, 3)) * 4 - 2, jnp.float32)
    d0 = rng.standard_normal((R, 3))
    d = jnp.asarray(d0 / np.linalg.norm(d0, axis=1, keepdims=True),
                    jnp.float32)
    f = jax.jit(pl.pallas_call(
        build(mode),
        out_shape=jax.ShapeDtypeStruct((R,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    ))
    _force(f(planes, o, d))
    t0 = time.time()
    for _ in range(5):
        _force(f(planes, o, d))
    dt = (time.time() - t0) / 5 / REPS
    pairs = R * NCHUNK * LANE
    return f"{dt*1e6:8.1f} us per {R}-ray x {NCHUNK*LANE}-tri block " \
           f"({dt/pairs*1e12:6.1f} ps/pair)"


def main():
    for mode in (sys.argv[1:] or ["base", "hoist", "both", "r8"]):
        try:
            t0 = time.time()
            print(f"[OK] {mode:<6} {run(mode)} [total {time.time()-t0:.0f}s]",
                  flush=True)
        except Exception as e:
            msg = " / ".join(str(e).split("\n")[:2])[:240]
            print(f"[FAIL] {mode}: {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
