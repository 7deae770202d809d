#!/usr/bin/env python
"""Wavefront performance probe.

Separates the two possible slowness causes on real hardware:
1. scheduling waste — lockstep iterations executed vs useful rays
   (C_ITERS telemetry),
2. per-iteration cost — a fixed-trip fori_loop over the same body,
   timed at several lane counts.

Run on the TPU: ``python tools/perf_probe.py``.
"""

import sys
import time

from zraytrace_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from zraytrace_tpu.render import _counters_to_ints, _wavefront_jit, C_ITERS, C_RAYS
from zraytrace_tpu.scenes import three_balls


def main():
    built = three_balls()
    scene, camera = built.scene, built.camera
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    for n_lanes, spp in [(1 << 20, 20)]:
        ids = jnp.arange(n_lanes, dtype=jnp.int32)

        def run(spp_, warm=False):
            t0 = time.time()
            sums, counters = _wavefront_jit(
                scene, camera, ids, 42, 1000, 1000, spp_, 30
            )
            jax.block_until_ready(sums)
            dt = time.time() - t0
            ints = _counters_to_ints(np.asarray(counters))
            return dt, ints

        dt, ints = run(1)
        print(f"[lanes={n_lanes}] warmup(spp=1): {dt:.1f}s "
              f"iters={ints[C_ITERS]} rays={ints[C_RAYS]}", file=sys.stderr)
        for spp_ in (1, 4, spp):
            dt, ints = run(spp_)
            rays, iters = ints[C_RAYS], ints[C_ITERS]
            print(
                f"[lanes={n_lanes}] spp={spp_}: {dt:.3f}s rays={rays} "
                f"iters={iters} rays/s={rays/dt:.3e} "
                f"lane_steps/ray={iters*n_lanes/max(rays,1):.2f} "
                f"s/iter={dt/max(iters,1)*1e3:.3f}ms "
                f"lane_steps/s={iters*n_lanes/dt:.3e}",
                file=sys.stderr,
            )


if __name__ == "__main__":
    main()
