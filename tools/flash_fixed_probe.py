"""Probe: where do 8.26 ms/iteration of flash-kernel FIXED cost go?

Teapot ablations (PERF.md round 3): XLA body 1.32 ms, prepass 0.15 ms,
chunk work ~4.3 ms — but the pallas_call with EMPTY work lists still
costs 8.26 ms. This probe times the real flash_intersect_triangles call
on teapot-sized random data with n_work forced to 0 via
ZRAYTRACE_FLASH_NOWORK=1 (set by the harness), and variants, chained
REPS times inside one jit.

Run:  ZRAYTRACE_FLASH_NOWORK=1 python tools/flash_fixed_probe.py
"""
import time

import jax
import jax.numpy as jnp

from zraytrace_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import numpy as np

from zraytrace_tpu.geometry.bvh import build_tri_bvh
from zraytrace_tpu.ops.flash_intersect import (
    flash_intersect_triangles, pack_tri_planes,
)
from zraytrace_tpu.scene import mesh_materials_const
from zraytrace_tpu.scenes import build_scene

N = 131072
REPS = 30

built = build_scene(3)
scene = built.scene
order = build_tri_bvh(scene.tri_a, scene.tri_b, scene.tri_c).prim_order
planes = pack_tri_planes(scene.tri_a, scene.tri_b, scene.tri_c,
                         order=order, tri_mat=scene.tri_mat,
                         const_materials=mesh_materials_const(scene))
print("planes:", planes.planes.shape, "bounds:", planes.bounds.shape,
      "attrs:", None if planes.attrs is None else planes.attrs.shape)

key = jax.random.PRNGKey(0)
o = jax.random.uniform(key, (N, 3), jnp.float32) * 4.0 - 2.0
d = jax.random.uniform(key, (N, 3), jnp.float32) - 0.5
ti = jnp.full((N,), 1e9, jnp.float32)


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
    def run(o, d, ti):
        def body(c, _):
            i, acc = c
            t, idx, hit, uv = step(o + i * 1e-12, d, ti)
            return (i + 1.0, acc + t.sum()), None
        (_, acc), _ = jax.lax.scan(body, (0.0, 0.0), None, length=REPS)
        return acc
    return run


def passthrough(o, d, ti):
    return ti, jnp.zeros((N,), jnp.int32), jnp.zeros((N,), jnp.bool_), o[:, :2]


t_pass = bench(chain(passthrough), o, d, ti)
t_call = bench(chain(
    lambda o, d, ti: flash_intersect_triangles(planes, o, d, 1e-3, ti)),
    o, d, ti)
ms = lambda t: (t - t_pass) / REPS * 1e3
print(f"passthrough total {t_pass*1e3:.1f} ms")
print(f"flash call (NOWORK={jnp.asarray(0)}): {ms(t_call):.3f} ms/rep")


def chain_carried(step):
    """Operands live in the loop carry, as in the render's while body."""
    def run(o, d, ti):
        def body(c, _):
            o_c, d_c, ti_c, acc = c
            t, idx, hit, uv = step(o_c, d_c, ti_c)
            o2 = o_c + t[:, None] * 1e-12
            d2 = d_c * 1.0000001
            return (o2, d2, ti_c, acc + t.sum()), None
        (_, _, _, acc), _ = jax.lax.scan(
            body, (o, d, ti, 0.0), None, length=REPS)
        return acc
    return run


t_pass2 = bench(chain_carried(passthrough), o, d, ti)
t_call2 = bench(chain_carried(
    lambda o, d, ti: flash_intersect_triangles(planes, o, d, 1e-3, ti)),
    o, d, ti)
ms2 = lambda t: (t - t_pass2) / REPS * 1e3
print(f"carried passthrough total {t_pass2*1e3:.1f} ms")
print(f"carried flash call: {ms2(t_call2):.3f} ms/rep")


def chain_while(step):
    """Dynamic while_loop, as the render's wavefront actually runs."""
    def run(o, d, ti):
        def cond(c):
            return c[0] < REPS

        def body(c):
            i, o_c, acc = c
            t, idx, hit, uv = step(o_c, d, ti)
            return (i + 1, o_c + t[:, None] * 1e-12, acc + t.sum())

        _, _, acc = jax.lax.while_loop(
            cond, body, (jnp.int32(0), o, 0.0))
        return acc
    return run


t_pass3 = bench(chain_while(passthrough), o, d, ti)
t_call3 = bench(chain_while(
    lambda o, d, ti: flash_intersect_triangles(planes, o, d, 1e-3, ti)),
    o, d, ti)
ms3 = lambda t: (t - t_pass3) / REPS * 1e3
print(f"while passthrough total {t_pass3*1e3:.1f} ms")
print(f"while flash call: {ms3(t_call3):.3f} ms/rep")


def chain_while_carry(step):
    """while_loop + a render-sized extra carry (slot_sums analogue)."""
    big0 = jnp.zeros((8, N, 3), jnp.float32)

    def run(o, d, ti):
        def cond(c):
            return c[0] < REPS

        def body(c):
            i, o_c, big, acc = c
            t, idx, hit, uv = step(o_c, d, ti)
            big = big.at[0].add(jnp.stack([t, t, t], -1))
            return (i + 1, o_c + t[:, None] * 1e-12, big, acc + t.sum())

        _, _, big, acc = jax.lax.while_loop(
            cond, body, (jnp.int32(0), o, big0, 0.0))
        return acc + big.sum()
    return run


t_pass4 = bench(chain_while_carry(passthrough), o, d, ti)
t_call4 = bench(chain_while_carry(
    lambda o, d, ti: flash_intersect_triangles(planes, o, d, 1e-3, ti)),
    o, d, ti)
ms4 = lambda t: (t - t_pass4) / REPS * 1e3
print(f"while+carry passthrough total {t_pass4*1e3:.1f} ms")
print(f"while+carry flash call: {ms4(t_call4):.3f} ms/rep")


def chain_arg(step):
    """planes passed as a jit ARGUMENT (as the render does), not a
    closed-over constant."""
    def run(planes_arg, o, d, ti):
        def body(c, _):
            i, acc = c
            t, idx, hit, uv = step(planes_arg, o + i * 1e-12, d, ti)
            return (i + 1.0, acc + t.sum()), None
        (_, acc), _ = jax.lax.scan(body, (0.0, 0.0), None, length=REPS)
        return acc
    return run


def pass_arg(planes_arg, o, d, ti):
    return ti, jnp.zeros((N,), jnp.int32), jnp.zeros((N,), jnp.bool_), o[:, :2]


t_pass5 = bench(chain_arg(lambda p, o, d, ti: pass_arg(p, o, d, ti)),
                planes, o, d, ti)
t_call5 = bench(chain_arg(
    lambda p, o, d, ti: flash_intersect_triangles(p, o, d, 1e-3, ti)),
    planes, o, d, ti)
ms5 = lambda t: (t - t_pass5) / REPS * 1e3
print(f"arg passthrough total {t_pass5*1e3:.1f} ms")
print(f"arg flash call: {ms5(t_call5):.3f} ms/rep")
