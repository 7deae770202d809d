"""Probe 2: sort-sandwich gather compaction (no scatter).

compact_probe found: dense 524k-row gather 2.18 ms, argsort(524k)
0.06 ms, but scatter-based delivery 7.2 ms (TPU scatter ~10x gather per
row). This variant never scatters:

  sort1: key = occupied ? id : BIG, payload = position  (occupied first)
  slice: ids arrive sorted — no gather for them
  gather: atlas rows for the first E_PAD entries only
  sort2: key = position, payload = r,g,b  (restores lane order)

Cost = 2 sorts + E_PAD gather rows vs K*L dense gather rows.
"""
import time

import jax
import jax.numpy as jnp

from zraytrace_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

K, L = 4, 131072
N = K * L
F = 512 * 1024
REPS = 30
BIG = jnp.int32(2 ** 30)

key = jax.random.PRNGKey(0)
occ = jax.random.uniform(key, (N,)) < 0.37
ids = jnp.where(occ, jax.random.randint(key, (N,), 0, F), -1)
atlas = jax.random.uniform(key, (F, 3), jnp.float32)


def bench(fn, *args):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    _ = float(jnp.sum(out).astype(jnp.float32))
    t0 = time.time()
    out = jfn(*args)
    _ = float(jnp.sum(out).astype(jnp.float32))
    return time.time() - t0


def chain(step):
    def run(ids, atlas):
        def body(c, _):
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


def make_sandwich(e_pad):
    def sandwich(ids, atlas):
        pos = jax.lax.iota(jnp.int32, N)
        skey = jnp.where(ids >= 0, ids, BIG)
        skey_s, pos_s = jax.lax.sort((skey, pos), num_keys=1)
        sel_ids = skey_s[:e_pad]
        vals = atlas[jnp.minimum(sel_ids, F - 1)]          # E rows
        zpad = jnp.zeros((N - e_pad, 3), jnp.float32)
        vfull = jnp.concatenate([vals, zpad], axis=0)
        _, r, g, b = jax.lax.sort(
            (pos_s, vfull[:, 0], vfull[:, 1], vfull[:, 2]), num_keys=1)
        return jnp.stack([r, g, b], axis=-1)
    return sandwich


def sort2_only(ids, atlas):
    pos = jax.lax.iota(jnp.int32, N)
    skey = jnp.where(ids >= 0, ids, BIG)
    skey_s, pos_s = jax.lax.sort((skey, pos), num_keys=1)
    f = skey_s.astype(jnp.float32)
    _, r, g, b = jax.lax.sort((pos_s, f, f, f), num_keys=1)
    return r + g + b


t_pass = bench(chain(passthrough), ids, atlas)
t_dense = bench(chain(dense), ids, atlas)
t_sorts = bench(chain(sort2_only), ids, atlas)
ms = lambda t: (t - t_pass) / REPS * 1e3
print(f"passthrough total {t_pass*1e3:.1f} ms")
print(f"dense {N//1024}k-row gather: {ms(t_dense):.3f} ms")
print(f"two sorts only:          {ms(t_sorts):.3f} ms")
for e_pad in (L, 2 * L, 3 * L):
    t = bench(chain(make_sandwich(e_pad)), ids, atlas)
    print(f"sandwich E_PAD={e_pad//1024}k:     {ms(t):.3f} ms")
