"""Probe: does this TPU overlap an XLA gather with an independent
Pallas kernel?

The megakernel launch loop is kernel -> gather -> kernel (the gather
resolves slots the next launch consumes). If resolution were delayed by
one launch, gather(t) and kernel(t+1) would be data-independent; this
probe measures whether the hardware/XLA would actually run them
concurrently, by timing (a) gather alone, (b) kernel alone, (c) both
chained with no dependence between them. Overlap exists iff
t(c) < t(a) + t(b) - noise.
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from zraytrace_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

L = 131072
N = 4 * L
F = 512 * 1024
REPS = 30
ITERS = 760  # in-kernel compute iterations per rep (sized ~ gather cost)

key = jax.random.PRNGKey(0)
ids = jax.random.randint(key, (N,), 0, F)
atlas = jax.random.uniform(key, (F, 3), jnp.float32)
x = jax.random.uniform(key, (1024, 128), jnp.float32)


def _kernel(x_ref, o_ref):
    def body(i, v):
        return v * 1.000001 + jnp.sin(v) * 0.0001

    o_ref[:, :] = jax.lax.fori_loop(0, ITERS, body, x_ref[:, :])


def kern(x):
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(8,),
        in_specs=[pl.BlockSpec((128, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((128, 128), lambda i: (i, 0)),
    )(x)


def bench(fn, *args):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out)
              .astype(jnp.float32))
    t0 = time.time()
    out = jfn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out)
              .astype(jnp.float32))
    return time.time() - t0


def chain(with_gather, with_kernel):
    def run(ids, atlas, x):
        def body(c, _):
            i, xs, acc = c
            idx = jnp.where(ids >= 0, ids + (i & 1), ids)
            g = atlas[idx] if with_gather else jnp.zeros((1, 3))
            xs2 = kern(xs) if with_kernel else xs
            return (i + 1, xs2, acc + g.sum()), None

        (i, xs, acc), _ = jax.lax.scan(
            body, (jnp.int32(0), x, 0.0), None, length=REPS)
        return acc + xs.sum()
    return run


t_none = bench(chain(False, False), ids, atlas, x)
t_g = bench(chain(True, False), ids, atlas, x)
t_k = bench(chain(False, True), ids, atlas, x)
t_both = bench(chain(True, True), ids, atlas, x)
ms = lambda t: (t - t_none) / REPS * 1e3
print(f"baseline total {t_none*1e3:.1f} ms")
print(f"gather alone:  {ms(t_g):.3f} ms/rep")
print(f"kernel alone:  {ms(t_k):.3f} ms/rep")
print(f"both chained:  {ms(t_both):.3f} ms/rep  "
      f"(sum would be {ms(t_g) + ms(t_k):.3f})")
