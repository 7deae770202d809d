#!/usr/bin/env python
"""Compare the Pallas bounce-kernel path vs the XLA wavefront on TPU."""

import sys
import time

from zraytrace_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from zraytrace_tpu.ops.bounce_kernel import _wavefront_pallas_jit
from zraytrace_tpu.render import _counters_to_ints, _wavefront_jit, C_ITERS, C_RAYS
from zraytrace_tpu.scenes import three_balls


def force(x):
    return float(jnp.asarray(x).ravel()[0].astype(jnp.float32))


def main():
    built = three_balls()
    scene, camera = built.scene, built.camera
    size = 1000
    n_lanes = 1 << 18
    n_slots = 4
    base = jnp.arange(n_lanes, dtype=jnp.int32)
    n_pix = size * size
    print(f"device {jax.devices()[0]} lanes={n_lanes} slots={n_slots}",
          file=sys.stderr)

    def run_xla(spp):
        s, c = _wavefront_jit(scene, camera, base, 42, size, size, spp, 30,
                              0, None, n_lanes, n_pix, n_slots)
        force(c)
        return c

    def run_pal(spp):
        s, c = _wavefront_pallas_jit(scene, camera, base, 42, size, size,
                                     spp, 30, 0, n_slots, n_lanes, n_pix)
        force(c)
        return c

    for name, fn in [("pallas", run_pal), ("xla", run_xla)]:
        try:
            t0 = time.time()
            fn(1)
            print(f"{name}: compile+warm {time.time()-t0:.1f}s", file=sys.stderr)
            t0 = time.time()
            c = fn(20)
            dt = time.time() - t0
            ints = _counters_to_ints(np.asarray(c))
            rays, iters = ints[C_RAYS], ints[C_ITERS]
            print(f"{name}: spp=20 {dt:.3f}s rays={rays} iters={iters} "
                  f"rays/s={rays/dt:.3e} ms/iter={dt/iters*1e3:.3f}",
                  file=sys.stderr)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:400]}",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
