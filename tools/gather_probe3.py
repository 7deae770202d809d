#!/usr/bin/env python
"""Round-2 probe: in-kernel gather primitive costs for the texture attack.

Measures, on real TPU (or CPU interpret with --cpu for correctness only):

  dg0_RxL     — tpu.dynamic_gather along sublanes (take_along_axis axis=0,
                operand shape == index shape), R in {1024, 4096}
  dg1_RxL     — same along lanes (axis=1)
  roll_RxL    — pltpu.roll by a static shift
  roll_dyn    — pltpu.roll by a traced shift (compile test)
  tex128      — full 128-round rotate-gather: out[i,l] = tbl[q[i,l], c[i,l]]
                for a (R,128) u32-packed table, R-row lane block
  xla_gather  — XLA row-gather baseline at the same lane count
  vmem_cap    — largest scratch allocation that compiles+runs

Usage: python tools/gather_probe3.py [--cpu] [names...]
"""

import functools
import sys
import time

CPU = "--cpu" in sys.argv
if CPU:
    import jax

    jax.config.update("jax_platforms", "cpu")

from zraytrace_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = CPU
L = 128
K = 32  # in-kernel repeat count for timing


def _force(x):
    return float(jnp.asarray(x).ravel()[0].astype(jnp.float32))


def run(name, fn):
    sel = [a for a in sys.argv[1:] if not a.startswith("-")]
    if sel and not any(s in name for s in sel):
        return
    try:
        t0 = time.time()
        out, per_op_ms = fn()
        print(f"[OK]   {name:<16} {per_op_ms:9.5f} ms/op   ({out})  "
              f"[total {time.time()-t0:.1f}s incl compile]", flush=True)
    except Exception as e:
        msg = " / ".join(str(e).split("\n")[:2])[:300]
        print(f"[FAIL] {name:<16} {type(e).__name__}: {msg}", flush=True)


def _time_kernel(kfn, args, out_shape, in_specs, n_ops, reps=3):
    f = pl.pallas_call(
        kfn,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=INTERPRET,
    )
    g = jax.jit(f)
    _force(g(*args))  # compile+warm
    t0 = time.time()
    r = 1 if CPU else reps
    for _ in range(r):
        v = _force(g(*args))
    dt = (time.time() - t0) / r
    return v, dt * 1e3 / n_ops


def probe_dg(R, axis):
    def kernel(tbl_ref, idx_ref, o_ref):
        tbl = tbl_ref[:]
        idx = idx_ref[:]

        def body(i, acc):
            ix = jnp.bitwise_and(idx + i, R - 1 if axis == 0 else L - 1)
            g = jnp.take_along_axis(tbl, ix, axis=axis)
            return acc + g

        o_ref[:] = jax.lax.fori_loop(0, K, body, jnp.zeros_like(tbl))

    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.random((R, L)), jnp.float32)
    hi = R if axis == 0 else L
    idx = jnp.asarray(rng.integers(0, hi, (R, L)), jnp.int32)

    def go():
        v, per = _time_kernel(
            kernel, (tbl, idx),
            jax.ShapeDtypeStruct((R, L), jnp.float32),
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            n_ops=K,
        )
        return f"sum0={v:.3f}", per

    return go


def probe_roll(R, dynamic):
    def kernel(x_ref, o_ref):
        x = x_ref[:]

        def body(i, acc):
            sh = i if dynamic else 1
            return acc + pltpu.roll(x, sh, 1)

        o_ref[:] = jax.lax.fori_loop(0, K, body, jnp.zeros_like(x))

    x = jnp.asarray(np.random.default_rng(0).random((R, L)), jnp.float32)

    def go():
        v, per = _time_kernel(
            kernel, (x,), jax.ShapeDtypeStruct((R, L), jnp.float32),
            [pl.BlockSpec(memory_space=pltpu.VMEM)], n_ops=K,
        )
        return f"v={v:.3f}", per

    return go


def _tex128_kernel(R):
    """128-round rotate-gather. tbl (R,128) i32-packed; per lane row q<R,
    lane column c<128. out[i,l] = tbl[q[i,l], c[i,l]]."""

    def kernel(tbl_ref, q_ref, c_ref, o_ref):
        tbl = tbl_ref[:]
        q = q_ref[:]
        c = c_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
        delta = jnp.bitwise_and(c - lane, L - 1)
        out = jnp.zeros((R, L), jnp.int32)

        def body(r, carry):
            out, q_roll = carry
            # q_roll = roll(q, r): request of lane l sits at column (l+r)&127
            a = jnp.take_along_axis(tbl, q_roll, axis=0)
            b = pltpu.roll(a, L - r, 1)  # value for lane l back at column l
            out = jnp.where(delta == r, b, out)
            return out, pltpu.roll(q_roll, 1, 1)

        out, _ = jax.lax.fori_loop(0, L, body, (out, q))
        o_ref[:] = out

    return kernel


def probe_tex128(R):
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, 1 << 24, (R, L)), jnp.int32)
    q = jnp.asarray(rng.integers(0, R, (R, L)), jnp.int32)
    c = jnp.asarray(rng.integers(0, L, (R, L)), jnp.int32)

    def go():
        f = pl.pallas_call(
            _tex128_kernel(R),
            out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=INTERPRET,
        )
        g = jax.jit(f)
        out = g(tbl, q, c)
        ref = np.asarray(tbl)[np.asarray(q), np.asarray(c)]
        np.testing.assert_array_equal(np.asarray(out), ref)
        _force(out)
        t0 = time.time()
        reps = 1 if CPU else 5
        for _ in range(reps):
            _force(g(tbl, q, c))
        dt = (time.time() - t0) / reps
        lanes = R * L
        return f"CORRECT, {dt*1e3:.3f} ms per {lanes} fetches " \
               f"= {dt/lanes*1e9:.2f} ns/fetch", dt * 1e3

    return go


def probe_xla_gather(n_lanes):
    rng = np.random.default_rng(0)
    F = 533000
    tbl = jnp.asarray(rng.random((F, 3)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, F, n_lanes), jnp.int32)

    @jax.jit
    def g(idx):
        def body(i, acc):
            t = tbl[(idx + i) % F]
            return acc + t[:, 0]

        return jax.lax.fori_loop(0, K, body, jnp.zeros((n_lanes,), jnp.float32))

    def go():
        _force(g(idx))
        t0 = time.time()
        reps = 1 if CPU else 3
        for _ in range(reps):
            _force(g(idx))
        dt = (time.time() - t0) / reps / K
        return f"{dt/n_lanes*1e9:.2f} ns/row", dt * 1e3

    return go


def probe_vmem(mb):
    n_rows = mb * 1024 * 1024 // (4 * L)

    def kernel(x_ref, o_ref, scratch):
        scratch[0, :] = x_ref[0, :]
        scratch[n_rows - 1, :] = x_ref[0, :] * 2.0
        o_ref[:] = scratch[n_rows - 1, :][None, :] + scratch[0, :][None, :]

    x = jnp.ones((8, L), jnp.float32)

    def go():
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, L), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((n_rows, L), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=130 * 1024 * 1024),
            interpret=INTERPRET,
        )
        v = _force(jax.jit(f)(x))
        assert v == 3.0, v
        return f"{mb}MB scratch ok", 0.0

    return go


def main():
    print(f"device: {jax.devices()[0]} interpret={INTERPRET}", flush=True)
    run("dg0_1024", probe_dg(1024, 0))
    run("dg0_4096", probe_dg(4096, 0))
    run("dg1_1024", probe_dg(1024, 1))
    run("roll_1024", probe_roll(1024, dynamic=False))
    run("roll_dyn_1024", probe_roll(1024, dynamic=True))
    run("tex128_1024", probe_tex128(1024))
    run("xla_gather", probe_xla_gather(1024 * L))
    for mb in (16, 32, 64, 100):
        run(f"vmem_{mb}", probe_vmem(mb))


if __name__ == "__main__":
    main()
