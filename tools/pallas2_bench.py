#!/usr/bin/env python
"""Bench the round-2 bounce megakernel (bounce_kernel2) on real TPU.

Usage: python tools/pallas2_bench.py [rblk,B[,exit_num,exit_den] ...]
(default: 64,24). Env: ZRAYTRACE_PROBE_SPP/_SIZE, ZRAYTRACE_PROBE_LANES.

Renders 7-spheres at 1000x1000 depth 30 with a probe spp (default 20,
ZRAYTRACE_PROBE_SPP) on 2^17 lanes x 8 slots — the official bench
geometry — and reports rays/s plus stall-adjusted occupancy. spp is
traced, so the compiled program is the same one bench.py would run at
spp=1000.
"""

import os
import sys
import time

from zraytrace_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from zraytrace_tpu.render import _counters_to_ints
from zraytrace_tpu.scenes import three_balls

SIZE = int(os.environ.get("ZRAYTRACE_PROBE_SIZE", "1000"))
DEPTH = 30
SPP = int(os.environ.get("ZRAYTRACE_PROBE_SPP", "20"))
N_LANES = int(os.environ.get("ZRAYTRACE_PROBE_LANES", str(1 << 17)))


def main():
    from zraytrace_tpu.legacy.bounce_kernel2 import _wavefront_pallas2_jit

    combos = []
    for a in sys.argv[1:]:
        if "," not in a:
            continue
        parts = [int(x) for x in a.split(",")]
        combos.append((parts[0], parts[1],
                       tuple(parts[2:4]) if len(parts) >= 4 else (1, 4)))
    combos = combos or [(64, 24, (1, 4))]
    built = three_balls()
    scene, camera = built.scene, built.camera
    n_pixels = SIZE * SIZE
    n_slots = -(-n_pixels // N_LANES)
    ids = jnp.arange(N_LANES, dtype=jnp.int32)
    print(f"device={jax.devices()[0].device_kind} lanes={N_LANES} "
          f"slots={n_slots} size={SIZE} depth={DEPTH} spp={SPP}",
          file=sys.stderr, flush=True)

    for r_blk, B, efrac in combos:
        def run(spp, sample_start=0):
            sums, counters = _wavefront_pallas2_jit(
                scene, camera, ids, 42, SIZE, SIZE, spp, DEPTH,
                sample_start, n_slots, N_LANES, n_pixels,
                n_bounce=B, r_blk=r_blk, exit_frac=efrac,
            )
            _ = float(jnp.sum(counters[0]).astype(jnp.float32))
            return counters

        t0 = time.time()
        try:
            run(1)
        except Exception as e:
            msg = " / ".join(str(e).split("\n")[:2])[:300]
            print(f"[FAIL] rblk={r_blk} B={B} exit={efrac}: "
                  f"{type(e).__name__}: {msg}", flush=True)
            continue
        compile_s = time.time() - t0
        t0 = time.time()
        counters = run(SPP, sample_start=1)
        elapsed = time.time() - t0
        ints = _counters_to_ints(np.asarray(counters, np.uint64))
        rays, iters = ints[0], ints[5]
        print(f"[OK] rblk={r_blk} B={B} exit={efrac}: {rays/elapsed/1e6:8.1f}M rays/s "
              f"rays={rays} iters={iters} "
              f"lane_steps_per_ray={iters*N_LANES/max(rays,1):.2f} "
              f"elapsed={elapsed:.3f}s compile={compile_s:.0f}s", flush=True)


if __name__ == "__main__":
    main()
