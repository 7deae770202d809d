#!/usr/bin/env python
"""Decompose the wavefront per-iteration cost on real hardware.

Times fori_loops over stripped bodies at 1M lanes:
  baseline   — representative fused elementwise chain (~sphere loop cost)
  +gather    — adds one (N,) row gather from a 1M x 3 table (texture fetch)
  +hash      — adds two pcg4d uniform4 evaluations (camera + scatter RNG)
  +counters  — adds 6 full-lane reductions (progress counters)
  while_any  — the elementwise chain under while_loop with jnp.any cond
"""

import sys
import time

from zraytrace_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from zraytrace_tpu import rng as zrng

N = 1 << 20
K = 200  # loop trip count


def _force(out):
    # host readback: through the axon relay, block_until_ready on a tuple
    # has been observed not to wait; a scalar fetch always does.
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.asarray(leaves[0]).ravel()[0])


def timeit(name, fn, *args):
    _force(fn(*args))  # compile + warm
    t0 = time.time()
    _force(fn(*args))
    dt = time.time() - t0
    print(f"{name:<12} {dt / K * 1e3:8.4f} ms/iter  total={dt:.3f}s", file=sys.stderr)
    return dt


def elementwise_chain(x, y, z, i):
    # ~40 flops of the kind the sphere loop does, data-dependent on i
    a = x * y + z + jnp.float32(1e-6) * i.astype(jnp.float32)
    b = jnp.where(a > 0.5, a * a - y, a + z * 0.5)
    c = jnp.sqrt(jnp.abs(b) + 1e-6)
    d = jnp.minimum(c, 1.0) * jnp.maximum(b, -1.0)
    e = d - 2.0 * (d * y) * y
    f = jnp.where(e > 0, e, d * 0.3 + c * 0.2)
    return f, a


@jax.jit
def run_baseline(x, y, z):
    def body(i, s):
        x, y, z = s
        f, a = elementwise_chain(x, y, z, i)
        return (f, jnp.where(a > 1.0, y, f * 0.5 + y * 0.5), z)

    return jax.lax.fori_loop(0, K, body, (x, y, z))


@jax.jit
def run_gather(x, y, z, table):
    def body(i, s):
        x, y, z = s
        f, a = elementwise_chain(x, y, z, i)
        idx = (jnp.abs(f) * 1e6).astype(jnp.int32) % table.shape[0]
        tex = table[idx]  # (N, 3) row gather
        return (f + tex[:, 0], jnp.where(a > 1.0, y, tex[:, 1]), z + 0.0 * tex[:, 2])

    return jax.lax.fori_loop(0, K, body, (x, y, z))


@jax.jit
def run_hash(x, y, z, pix):
    def body(i, s):
        x, y, z = s
        f, a = elementwise_chain(x, y, z, i)
        r1 = zrng.uniform4(42, pix, i, i, zrng.STREAM_CAMERA)
        r2 = zrng.uniform4(42, pix, i, i, zrng.STREAM_SCATTER)
        return (f + r1[:, 0], y + r2[:, 1] * 1e-6, z)

    return jax.lax.fori_loop(0, K, body, (x, y, z))


@jax.jit
def run_counters(x, y, z, counters):
    def body(i, s):
        x, y, z, cnt = s
        f, a = elementwise_chain(x, y, z, i)
        for k in range(6):
            cnt = cnt.at[k].add(jnp.sum((a > 0.1 * k).astype(jnp.uint32)))
        return (f, y, z, cnt)

    return jax.lax.fori_loop(0, K, body, (x, y, z, counters))


@jax.jit
def run_while_any(x, y, z):
    def cond(s):
        i, x, y, z = s
        return (i < K) & jnp.any(x < 1e30)

    def body(s):
        i, x, y, z = s
        f, a = elementwise_chain(x, y, z, i)
        return (i + 1, f, jnp.where(a > 1.0, y, f * 0.5 + y * 0.5), z)

    return jax.lax.while_loop(cond, body, (0, x, y, z))


def main():
    print(f"device: {jax.devices()[0]}  N={N} K={K}", file=sys.stderr)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(N), jnp.float32)
    y = jnp.asarray(rng.random(N), jnp.float32)
    z = jnp.asarray(rng.random(N), jnp.float32)
    table = jnp.asarray(rng.random((N, 3)), jnp.float32)
    pix = jnp.arange(N, dtype=jnp.uint32)
    counters = jnp.zeros((6,), jnp.uint32)

    timeit("baseline", run_baseline, x, y, z)
    timeit("gather", run_gather, x, y, z, table)
    timeit("hash", run_hash, x, y, z, pix)
    timeit("counters", run_counters, x, y, z, counters)
    timeit("while_any", run_while_any, x, y, z)


if __name__ == "__main__":
    main()
