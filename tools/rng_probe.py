#!/usr/bin/env python
"""Why is pcg4d 20x slower in Mosaic than in XLA? Isolate int-multiply
lowering cost and evaluate exact/bit-compatible alternatives.

Usage: python tools/rng_probe.py [variant ...]
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

R_TOT, L = 1024, 128
R_BLK = 8
B = 8
K = 24


def v_u32mul(x, i):
    u = pltpu.bitcast(x, jnp.uint32) if x.dtype != jnp.uint32 else x
    for _ in range(10):
        u = u * jnp.uint32(1664525)
    return u.astype(jnp.int32)


def v_u32mulvar(x, i):
    u = pltpu.bitcast(x, jnp.uint32)
    v = u ^ jnp.uint32(0x9E3779B9)
    for _ in range(5):
        u = u * v
        v = v + u
    return u.astype(jnp.int32)


def v_i32mul(x, i):
    u = x
    for _ in range(10):
        u = u * jnp.int32(1664525)
    return u


def v_i32mulvar(x, i):
    u = x
    v = x ^ jnp.int32(0x1E377909)
    for _ in range(5):
        u = u * v
        v = v + u
    return u


def v_f32mul(x, i):
    u = x.astype(jnp.float32)
    for _ in range(10):
        u = u * jnp.float32(1.0001)
    return u.astype(jnp.int32)


def v_shifts(x, i):
    u = x
    for _ in range(10):
        u = u ^ ((u >> 13) & 0x7FFFF)
        u = u + (u << 7)
    return u


def _pcg4d_u32(px, sa, dp, sd):
    from zraytrace_tpu.rng import pcg4d

    ctr = jnp.stack([px.astype(jnp.uint32), sa.astype(jnp.uint32),
                     dp.astype(jnp.uint32),
                     jnp.broadcast_to(sd, px.shape)], axis=-1)
    bits = pcg4d(ctr)
    return (bits[..., 0] >> 8).astype(jnp.int32)


def v_pcg4d(x, i):
    return _pcg4d_u32(x, x + 1, x + i, jnp.uint32(42)) + \
        _pcg4d_u32(x + 2, x + 3, x + i, jnp.uint32(7))


def _mul_i32(a, b):
    """32x32 -> low 32 multiply via 16-bit halves (exact, int32)."""
    a_lo = a & 0xFFFF
    a_hi = (a >> 16) & 0xFFFF
    b_lo = b & 0xFFFF
    b_hi = (b >> 16) & 0xFFFF
    lo = a_lo * b_lo
    mid = (a_lo * b_hi + a_hi * b_lo) << 16
    return lo + mid


def _pcg4d_i32(px, sa, dp, sd):
    """pcg4d with int32 arithmetic; bit-identical to the uint32 version
    (mul/add wrap the same; logical shifts via masked arithmetic)."""
    M = jnp.int32(1664525)
    A = jnp.int32(1013904223)
    x = px * M + A
    y = sa * M + A
    z = dp * M + A
    w = sd * M + A

    def rsh16(v):
        return (v >> 16) & 0xFFFF

    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x = x ^ rsh16(x)
    y = y ^ rsh16(y)
    z = z ^ rsh16(z)
    w = w ^ rsh16(w)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return (x >> 8) & 0xFFFFFF


def v_pcg4d_i32(x, i):
    sd = jnp.int32(42)
    return _pcg4d_i32(x, x + 1, x + i, jnp.broadcast_to(sd, x.shape)) + \
        _pcg4d_i32(x + 2, x + 3, x + i, jnp.broadcast_to(jnp.int32(7), x.shape))


def v_pcg4d_16b(x, i):
    M = jnp.int32(1664525)
    A = jnp.int32(1013904223)

    def pcg(px, sa, dp, sd):
        xx = _mul_i32(px, M) + A
        y = _mul_i32(sa, M) + A
        z = _mul_i32(dp, M) + A
        w = _mul_i32(sd, M) + A
        rsh16 = lambda v: (v >> 16) & 0xFFFF
        xx = xx + _mul_i32(y, w)
        y = y + _mul_i32(z, xx)
        z = z + _mul_i32(xx, y)
        w = w + _mul_i32(y, z)
        xx = xx ^ rsh16(xx)
        y = y ^ rsh16(y)
        z = z ^ rsh16(z)
        w = w ^ rsh16(w)
        xx = xx + _mul_i32(y, w)
        y = y + _mul_i32(z, xx)
        z = z + _mul_i32(xx, y)
        w = w + _mul_i32(y, z)
        return (xx >> 8) & 0xFFFFFF

    sd = jnp.broadcast_to(jnp.int32(42), x.shape)
    return pcg(x, x + 1, x + i, sd) + pcg(x + 2, x + 3, x + i, sd)


def v_threefry13(x, i):
    """Threefry-2x32, 13 rounds: add/xor/rotate only (mult-free)."""
    rot = (13, 15, 26, 6, 17, 29, 16, 24)

    def rotl(v, r):
        return ((v << r) | ((v >> (32 - r)) & ((1 << (32 - r)) - 1))) \
            if r else v

    def tf(k0, k1, c0, c1):
        ks2 = k0 ^ k1 ^ jnp.int32(0x1BD11BDA)
        x0 = c0 + k0
        x1 = c1 + k1
        for r in range(13):
            x0 = x0 + x1
            x1 = rotl(x1, rot[r % 8]) ^ x0
            if r % 4 == 3:
                j = r // 4 + 1
                keys = [k0, k1, ks2]
                x0 = x0 + keys[j % 3]
                x1 = x1 + keys[(j + 1) % 3] + jnp.int32(j)
        return x0

    sd = jnp.broadcast_to(jnp.int32(42), x.shape)
    return tf(x, x + i, sd, x + 1) + tf(x + 2, x + i, sd, x + 3)


VARIANTS = dict(
    u32mul=v_u32mul, u32mulvar=v_u32mulvar, i32mul=v_i32mul,
    i32mulvar=v_i32mulvar, f32mul=v_f32mul, shifts=v_shifts,
    pcg4d=v_pcg4d, pcg4d_i32=v_pcg4d_i32, pcg4d_16b=v_pcg4d_16b,
    threefry13=v_threefry13,
)


def build(fn):
    n_blocks = R_TOT // R_BLK

    def kernel(x_ref, o_ref):
        def it(i, c):
            return c + fn(c, i)

        o_ref[:] = jax.lax.fori_loop(0, B, it, x_ref[:])

    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=jax.ShapeDtypeStruct((R_TOT, L), jnp.int32),
        in_specs=[pl.BlockSpec((R_BLK, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R_BLK, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )


def main():
    # correctness of the i32 reimplementations vs the u32 reference
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2**32, (64,), dtype=np.uint32)
    from zraytrace_tpu.rng import pcg4d
    ctr = jnp.stack([jnp.asarray(a), jnp.asarray(a + 1),
                     jnp.asarray(a + 2),
                     jnp.full((64,), 42, jnp.uint32)], axis=-1)
    ref = (np.asarray(pcg4d(ctr))[:, 0] >> 8).astype(np.int64)
    ai = jnp.asarray(a.astype(np.int32))
    got = np.asarray(_pcg4d_i32(ai, ai + 1, ai + 2,
                                jnp.full((64,), 42, jnp.int32))).astype(np.int64)
    assert np.array_equal(ref, got), "i32 pcg4d mismatch"
    print("pcg4d_i32 bit-exact vs u32 reference: OK", flush=True)

    sel = sys.argv[1:] or list(VARIANTS)
    x = jnp.asarray(rng.integers(0, 1 << 20, (R_TOT, L)), jnp.int32)
    results = {}
    for name in sel:
        kern = build(VARIANTS[name])

        @jax.jit
        def chained(x):
            return jax.lax.fori_loop(0, K, lambda _, c: kern(c), x)

        try:
            t0 = time.time()
            _ = int(jnp.sum(chained(x))[()])
            compile_s = time.time() - t0
            t0 = time.time()
            _ = int(jnp.sum(chained(x))[()])
            dt = time.time() - t0
            per = dt / (K * B) * 1e3
            results[name] = per
            print(f"[OK] {name:<12} {per:8.4f} ms/iter "
                  f"({per/(R_TOT*L)*1e6:6.3f} ns/lane) compile={compile_s:.0f}s",
                  flush=True)
        except Exception as e:
            msg = " / ".join(str(e).split("\n")[:2])[:240]
            print(f"[FAIL] {name}: {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
