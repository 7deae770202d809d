#!/usr/bin/env python
"""Measure TPU gather cost vs table element width and index distribution.

The texture fetch dominates the wavefront iteration (tools/cost_probe.py:
4.8 ms of 7.3 ms at 1M lanes). Variants:
  row3_rand    — (1M,3) f32 rows, uniform random indices (the current path)
  row3_zeros   — same, 75% of indices are 0 (masked lanes)
  scal_f32     — (1M,) f32 scalars, random
  scal_u32     — (1M,) uint32 packed RGB, random
  scal_u32_z   — packed, 75% zeros
  scal_u32_coh — packed, indices clustered in a 4K-entry window (coherence)
"""

import sys
import time

from zraytrace_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 20
K = 200


def _force(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.asarray(leaves[0]).ravel()[0].astype(jnp.float32))


def timeit(name, fn, *args):
    _force(fn(*args))
    t0 = time.time()
    _force(fn(*args))
    dt = time.time() - t0
    print(f"{name:<14} {dt / K * 1e3:8.4f} ms/iter", file=sys.stderr)


def make_loop(table, width):
    @jax.jit
    def run(x, idx):
        def body(i, s):
            x, acc = s
            j = (idx + i) % table.shape[0]
            if width == 3:
                t = table[j]
                acc = acc + t[:, 0] + t[:, 1]
            else:
                t = table[j]
                acc = acc + t.astype(jnp.float32)
            return (x, acc)

        return jax.lax.fori_loop(0, K, body, (x, jnp.zeros_like(x)))

    return run


def main():
    print(f"device: {jax.devices()[0]}  N={N} K={K}", file=sys.stderr)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(N), jnp.float32)
    idx_rand = jnp.asarray(rng.integers(0, N, N), jnp.int32)
    mask = rng.random(N) < 0.75
    idx_zeros = jnp.asarray(np.where(mask, 0, np.asarray(idx_rand)), jnp.int32)
    idx_coh = jnp.asarray(rng.integers(0, 4096, N), jnp.int32)

    tbl3 = jnp.asarray(rng.random((N, 3)), jnp.float32)
    tblf = jnp.asarray(rng.random(N), jnp.float32)
    tblu = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))

    timeit("row3_rand", make_loop(tbl3, 3), x, idx_rand)
    timeit("row3_zeros", make_loop(tbl3, 3), x, idx_zeros)
    timeit("scal_f32", make_loop(tblf, 1), x, idx_rand)
    timeit("scal_u32", make_loop(tblu, 1), x, idx_rand)
    timeit("scal_u32_z", make_loop(tblu, 1), x, idx_zeros)
    timeit("scal_u32_coh", make_loop(tblu, 1), x, idx_coh)


if __name__ == "__main__":
    main()
