"""Probe: cost of argsort-based gather compaction on the TPU.

The megakernel's per-launch atlas gather fetches K_TEX*131k rows but
only ~37% are occupied (ZRAYTRACE_K3_DIAG). Compaction would cost one
argsort of K*L keys plus 3 gathers/scatters of E_pad rows. This probe
measures: (a) argsort of 524k i32, (b) the full compact-resolve round
trip, vs (c) the dense 524k-row gather — all chained K_REP times inside
one jit with a passthrough baseline subtracted (relay RPC ~25 ms).
"""
import time

import jax
import jax.numpy as jnp

from zraytrace_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

K, L = 4, 131072
N = K * L
E_PAD = L
F = 512 * 1024
REPS = 30


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


key = jax.random.PRNGKey(0)
occ = jax.random.uniform(key, (N,)) < 0.37
ids = jnp.where(occ, jax.random.randint(key, (N,), 0, F), -1)
atlas = jax.random.uniform(key, (F, 3), jnp.float32)


def chain(step):
    def run(ids, atlas):
        def body(c, _):
            # carry-dependent indices so XLA cannot hoist the step out
            # of the scan (c[0] stays 0 or 1, indices stay in range)
            out = step(jnp.where(ids >= 0, ids + (c[0] & 1), ids), atlas)
            return (c[0] + 1, out.sum() + c[1]), None
        (cnt, acc), _ = jax.lax.scan(body, (jnp.int32(0), 0.0),
                                     None, length=REPS)
        return acc
    return run


def passthrough(ids, atlas):
    return jnp.zeros((1,), jnp.float32)


def dense(ids, atlas):
    return atlas[jnp.maximum(ids, 0)]


def sort_only(ids, atlas):
    perm = jnp.argsort(-ids)
    return perm[:E_PAD].astype(jnp.float32).reshape(-1, 1)


def compact(ids, atlas):
    perm = jnp.argsort(-ids)          # occupied first
    sel = perm[:E_PAD]                 # (E,) source positions
    sel_ids = ids[sel]                 # E rows
    vals = atlas[jnp.maximum(sel_ids, 0)]  # E rows
    out = jnp.zeros((N, 3), jnp.float32)
    out = out.at[sel].set(vals)        # E-row scatter
    return out


t_pass = bench(chain(passthrough), ids, atlas)
t_dense = bench(chain(dense), ids, atlas)
t_sort = bench(chain(sort_only), ids, atlas)
t_comp = bench(chain(compact), ids, atlas)
ms = lambda t: (t - t_pass) / REPS * 1e3
print(f"passthrough total {t_pass*1e3:.1f} ms")
print(f"dense 524k-row gather: {ms(t_dense):.3f} ms")
print(f"argsort(524k):         {ms(t_sort):.3f} ms")
print(f"full compact resolve:  {ms(t_comp):.3f} ms")
