#!/usr/bin/env python
"""Round-4 probe: can the texel resolve move INSIDE the megakernel?

The per-launch XLA atlas gather costs ~1.26 s of the 2.9 s official
bench (281 M lane-shaped rows x ~4.5 ns; PERF.md round-3 decomposition)
and pins the launch count. CLAUDE.md's round-2 probes recorded that
dim-0 dynamic gather does not lower in Mosaic but "dim-1 works at
gather-like cost" — measured only for index range < 128. This probe
answers the questions that decide whether an in-kernel VMEM-resident
atlas gather (texture.zig:52-74 semantics) can replace the XLA glue:

  wide_dg1_W    take_along_axis(tbl (8, W), idx (8, 512), axis=1) for
                W in {1k, 8k, 64k, 512k} — does a LANE gather with
                index range >> 128 lower, and does its cost scale O(1)
                or O(W/128)?
  blk_dg1_W     same with 64 sublane rows (tbl (64, W), idx (64, 128))
                — the megakernel's natural block shape.
  row1_dg1_F    tbl (1, F=2^19) packed-u32 atlas row, idx (1, 8192):
                the full-atlas fetch for one 64x128 lane block.
  reshape_rt    (64, 128) -> (1, 8192) -> (64, 128) relayout roundtrip
                cost (needed to feed row1 form from lane state).
  e2e_atlas     full composition, correctness-checked vs numpy:
                (64,128) i32 flat texel ids -> reshape -> u32 gather
                from a (1, 2^19) VMEM atlas -> reshape back -> shift
                unpack to 3 f32 channels.
  xla_ref       XLA (F,3) f32 row gather at the same request count
                (the mechanism being replaced), same timing harness.

Decision rule (VERDICT round 3 item 1): if e2e lands well under
~4.5 ns/texel, rebuild kernel3's resolve in-kernel (launches unpinned,
glue gather gone); if it fails to lower or costs >= the XLA path,
record the loss + cost term in PERF.md and the best-achievable claim
stands on it.

Usage: python tools/inkernel_texel_probe.py [--cpu] [names...]
"""

import sys
import time

sys.path.insert(0, ".")

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
K = 32  # in-kernel repeat count for timing (idx rotates to defeat CSE)


def _force(x):
    return float(jnp.asarray(x).ravel()[0].astype(jnp.float32))


def run(name, fn):
    sel = [a for a in sys.argv[1:] if not a.startswith("-")]
    if sel and not any(s in name for s in sel):
        return
    try:
        t0 = time.time()
        msg = fn()
        print(f"[OK]   {name:<16} {msg}  "
              f"[total {time.time()-t0:.1f}s incl compile]", flush=True)
    except Exception as e:
        msg = " / ".join(str(e).split("\n")[:2])[:300]
        print(f"[FAIL] {name:<16} {type(e).__name__}: {msg}", flush=True)


def _pallas(kfn, out_shape, n_in):
    return pl.pallas_call(
        kfn,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=INTERPRET,
    )


def _time(g, args, reps=3):
    _force(g(*args))  # compile+warm
    t0 = time.time()
    r = 1 if CPU else reps
    for _ in range(r):
        v = _force(g(*args))
    return v, (time.time() - t0) / r


def probe_dg1(R, W, NI):
    """take_along_axis(tbl (R, W), idx (R, NI), axis=1), K reps."""

    def kernel(tbl_ref, idx_ref, o_ref):
        tbl = tbl_ref[:]
        idx = idx_ref[:]

        def body(i, acc):
            ix = jnp.bitwise_and(idx + i, W - 1)
            g = jnp.take_along_axis(tbl, ix, axis=1)
            return acc + g

        o_ref[:] = jax.lax.fori_loop(0, K, body,
                                     jnp.zeros((R, NI), jnp.float32))

    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.random((R, W)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, W, (R, NI)), jnp.int32)

    def go():
        g = jax.jit(_pallas(kernel,
                            jax.ShapeDtypeStruct((R, NI), jnp.float32), 2))
        v, dt = _time(g, (tbl, idx))
        n_el = R * NI * K
        return f"{dt/n_el*1e9:7.3f} ns/elem  ({dt*1e3:.3f} ms/call, sum0={v:.2f})"

    return go


def probe_reshape_rt(R=64):
    def kernel(x_ref, o_ref):
        x = x_ref[:]

        def body(i, acc):
            flat = (acc + x).reshape(1, R * L)
            return (flat * 1.0000001).reshape(R, L)

        o_ref[:] = jax.lax.fori_loop(0, K, body, jnp.zeros((R, L),
                                                           jnp.float32))

    x = jnp.asarray(np.random.default_rng(0).random((R, L)), jnp.float32)

    def go():
        g = jax.jit(_pallas(kernel,
                            jax.ShapeDtypeStruct((R, L), jnp.float32), 1))
        v, dt = _time(g, (x,))
        return f"{dt/K*1e6:7.2f} us/roundtrip ({R}x{L}, v={v:.3f})"

    return go


F_ATLAS = 1 << 19  # 524288 texels ~ the 7-spheres atlas scale


def probe_e2e(R=64):
    """Full in-kernel atlas fetch for one lane block, correctness-checked.

    atlas: (1, F) u32 (r<<16|g<<8|b); requests: (R, 128) i32 flat ids.
    out: 3 f32 channel planes (R, 128) summed over K rotated rounds."""

    def kernel(tbl_ref, idx_ref, o_ref):
        tbl = tbl_ref[:]
        idx = idx_ref[:]

        def body(i, accs):
            ar, ag, ab = accs
            ix = jnp.bitwise_and(idx + i, F_ATLAS - 1)
            flat = ix.reshape(1, R * L)
            got = jnp.take_along_axis(tbl, flat, axis=1).reshape(R, L)
            fr = ((got >> 16) & 255).astype(jnp.float32) / 255.0
            fg = ((got >> 8) & 255).astype(jnp.float32) / 255.0
            fb = (got & 255).astype(jnp.float32) / 255.0
            return (ar + fr, ag + fg, ab + fb)

        z = jnp.zeros((R, L), jnp.float32)
        ar, ag, ab = jax.lax.fori_loop(0, K, body, (z, z, z))
        o_ref[:] = jnp.stack([ar, ag, ab])

    rng = np.random.default_rng(0)
    tbl_np = rng.integers(0, 1 << 24, (1, F_ATLAS)).astype(np.int32)
    idx_np = rng.integers(0, F_ATLAS, (R, L)).astype(np.int32)
    tbl = jnp.asarray(tbl_np)
    idx = jnp.asarray(idx_np)

    def go():
        g = jax.jit(_pallas(
            kernel, jax.ShapeDtypeStruct((3, R, L), jnp.float32), 2))
        out = np.asarray(g(tbl, idx))
        # correctness: replay the K rounds in numpy
        ref = np.zeros((3, R, L), np.float32)
        for i in range(K):
            got = tbl_np[0, (idx_np + i) & (F_ATLAS - 1)]
            ref[0] += ((got >> 16) & 255).astype(np.float32) / 255.0
            ref[1] += ((got >> 8) & 255).astype(np.float32) / 255.0
            ref[2] += (got & 255).astype(np.float32) / 255.0
        np.testing.assert_allclose(out, ref, rtol=1e-6)
        _, dt = _time(g, (tbl, idx))
        n_el = R * L * K
        return f"CORRECT, {dt/n_el*1e9:7.3f} ns/texel ({dt*1e3:.3f} ms/call)"

    return go


def probe_xla_ref(n_req=64 * L):
    """The mechanism being replaced: XLA (F,3) f32 row gather."""
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.random((F_ATLAS, 3)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, F_ATLAS, n_req), jnp.int32)

    @jax.jit
    def g(idx):
        def body(i, acc):
            t = tbl[jnp.bitwise_and(idx + i, F_ATLAS - 1)]
            return acc + t[:, 0]

        return jax.lax.fori_loop(0, K, body,
                                 jnp.zeros((n_req,), jnp.float32))

    def go():
        _, dt = _time(g, (idx,))
        n_el = n_req * K
        return f"{dt/n_el*1e9:7.3f} ns/row ({dt*1e3:.3f} ms/call)"

    return go


def main():
    print(f"device: {jax.devices()[0]} interpret={INTERPRET}", flush=True)
    for W in (1024, 8192, 65536, 524288):
        run(f"wide_dg1_{W}", probe_dg1(8, W, 512))
    for W in (1024, 8192):
        run(f"blk_dg1_{W}", probe_dg1(64, W, 128))
    run("row1_dg1", probe_dg1(1, F_ATLAS, 8192))
    run("reshape_rt", probe_reshape_rt())
    run("e2e_atlas", probe_e2e())
    run("xla_ref", probe_xla_ref())


if __name__ == "__main__":
    main()
