#!/usr/bin/env python
"""Gather cost vs table size + fast-path API variants at 1M lanes.

If the 4.7 ns/row cost is table-size dependent, splitting textures wins;
if 'promise_in_bounds' skips clamping overhead, that wins for free.
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
    return float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])


def timeit(name, fn, *args):
    _force(fn(*args))
    t0 = time.time()
    _force(fn(*args))
    print(f"{name:<22} {(time.time() - t0) / K * 1e3:8.4f} ms/iter", file=sys.stderr)


def make(table, mode=None):
    T = table.shape[0]

    @jax.jit
    def run(x, idx):
        def body(i, s):
            x, acc = s
            j = (idx + i) % T
            if mode is None:
                t = table[j]
            else:
                t = table.at[j].get(mode=mode)
            return (x, acc + t[:, 0])

        return jax.lax.fori_loop(0, K, body, (x, jnp.zeros_like(x)))

    return run


def main():
    print(f"device: {jax.devices()[0]}  N={N} K={K}", file=sys.stderr)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(N), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 1024, N), jnp.int32)

    for T in (1024, 8192, 65536, 1 << 20):
        tbl = jnp.asarray(rng.random((T, 3)), jnp.float32)
        timeit(f"tbl_{T}", make(tbl), x, idx)
    tbl = jnp.asarray(rng.random((1 << 20, 3)), jnp.float32)
    timeit("tbl_1M_promise", make(tbl, mode="promise_in_bounds"), x, idx)
    # padded-to-4 rows (alignment)
    tbl4 = jnp.asarray(rng.random((1 << 20, 4)), jnp.float32)
    timeit("tbl_1M_rows4", make(tbl4), x, idx)
    # 2D layout: gather rows of 128 then pick? just row gather of (8192,128)
    tblw = jnp.asarray(rng.random((8192, 128)), jnp.float32)
    idx2 = jnp.asarray(rng.integers(0, 8192, N), jnp.int32)

    @jax.jit
    def run_wide(x, idxw):
        def body(i, s):
            x, acc = s
            j = (idxw + i) % 8192
            rows = tblw[j]  # (N, 128) row gather!? memory blowup check
            return (x, acc + rows[:, 0])

        return jax.lax.fori_loop(0, K // 10, body, (x, jnp.zeros_like(x)))

    # NOTE: (1M, 128) intermediate = 512MB; only 20 iters
    try:
        _force(run_wide(x, idx2))
        t0 = time.time()
        _force(run_wide(x, idx2))
        print(f"{'tbl_8192x128_rows':<22} {(time.time() - t0) / (K // 10) * 1e3:8.4f} ms/iter",
              file=sys.stderr)
    except Exception as e:
        print(f"tbl_8192x128_rows FAILED: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
