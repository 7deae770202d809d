#!/usr/bin/env python
"""Render showcase images (reuses the bench-shaped compiled program for
the 7-spheres scene so a cached TPU compile is enough).

    python tools/render_showcase.py out/showcase [--spp 500] [--size 1000]
"""

import argparse
import sys
import time
from pathlib import Path

from zraytrace_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--spp", type=int, default=500)
    ap.add_argument("--size", type=int, default=1000)
    ap.add_argument("--depth", type=int, default=30)
    ap.add_argument("--lanes", type=int, default=1 << 18)
    args = ap.parse_args()

    from zraytrace_tpu.io.png import write_png
    from zraytrace_tpu.render import _wavefront_jit
    from zraytrace_tpu.scenes import three_balls

    out = Path(args.outdir)
    out.mkdir(parents=True, exist_ok=True)

    built = three_balls()
    size = args.size
    n_pix = size * size
    n_lanes = min(args.lanes, n_pix)
    n_slots = -(-n_pix // n_lanes)
    base = jnp.arange(n_lanes, dtype=jnp.int32)

    t0 = time.time()
    sums, counters = _wavefront_jit(
        built.scene, built.camera, base, 42, size, size, args.spp,
        args.depth, 0, None, n_lanes, n_pix, n_slots,
    )
    sums = np.asarray(sums).reshape(n_slots * n_lanes, 3)[:n_pix]
    dt = time.time() - t0
    img = (sums / args.spp).reshape(size, size, 3)
    path = out / f"threeBalls_{size}x{size}_{args.spp}spp.png"
    write_png(path, img)
    print(f"wrote {path} in {dt:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
