#!/usr/bin/env python
"""Probe Mosaic/Pallas TPU capabilities needed by the bounce megakernel:

1. while_loop with (R,128)-shaped carried state inside a kernel
2. dynamic vector gather from a VMEM table (texture fetch)
3. pltpu PRNG
4. strided/modular integer ops on (R,128) int32

Run: PYTHONPATH=. python tools/pallas_probe.py [--cpu]
"""

import sys

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = "--cpu" in sys.argv
R, L = 64, 128  # 8192 lanes as (64, 128)


def report(name, fn):
    try:
        out = fn()
        print(f"[OK]   {name}: {out}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
        return False


def probe_while_loop():
    def kernel(x_ref, o_ref):
        def cond(s):
            i, acc = s
            return i < 10

        def body(s):
            i, acc = s
            return i + 1, acc + x_ref[:]

        _, acc = jax.lax.while_loop(cond, body, (0, jnp.zeros((R, L), jnp.float32)))
        o_ref[:] = acc

    x = jnp.ones((R, L), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(x)
    assert float(out[0, 0]) == 10.0
    return "sum=10 ok"


def probe_vmem_gather():
    T = 4096

    def kernel(tbl_ref, idx_ref, o_ref):
        o_ref[:] = tbl_ref[idx_ref[:]]

    tbl = jnp.arange(T, dtype=jnp.float32)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, T, (R, L)), jnp.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(tbl, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(tbl)[np.asarray(idx)])
    return "1d-table vector gather ok"


def probe_vmem_gather_2d():
    T = 4096

    def kernel(tbl_ref, idx_ref, o_ref):
        flat = tbl_ref[:].reshape(-1)
        o_ref[:] = flat[idx_ref[:]]

    tbl = jnp.arange(T, dtype=jnp.float32).reshape(32, 128)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, T, (R, L)), jnp.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(tbl, idx)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(tbl).reshape(-1)[np.asarray(idx)]
    )
    return "reshaped 2d-table vector gather ok"


def probe_prng():
    def kernel(seed_ref, o_ref):
        pltpu.prng_seed(seed_ref[0])
        o_ref[:] = pltpu.bitcast(pltpu.prng_random_bits((R, L)), jnp.uint32)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(jnp.asarray([7], jnp.int32))
    u = np.asarray(out)
    assert u.std() > 0
    return "prng ok"


def probe_int_hash():
    # the pcg4d hash used for stream-parity RNG
    from zraytrace_tpu import rng as zrng

    def kernel(px_ref, o_ref):
        r = zrng.uniform4(42, px_ref[:], 3, 1, zrng.STREAM_SCATTER)
        o_ref[:] = r[..., 0]

    px = jnp.arange(R * L, dtype=jnp.uint32).reshape(R, L)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(px)
    ref = zrng.uniform4(42, px, 3, 1, zrng.STREAM_SCATTER)[..., 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))
    return "pcg4d matches XLA bitwise"


def main():
    print(f"device: {jax.devices()[0]}, interpret={INTERPRET}")
    results = {}
    for name, fn in [
        ("while_loop", probe_while_loop),
        ("vmem_gather_1d", probe_vmem_gather),
        ("vmem_gather_2d_reshape", probe_vmem_gather_2d),
        ("prng", probe_prng),
        ("pcg4d_parity", probe_int_hash),
    ]:
        results[name] = report(name, fn)
    print("summary:", results)


if __name__ == "__main__":
    main()
