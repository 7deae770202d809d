#!/usr/bin/env python
"""Render showcase images on the TPU, reusing the bench-shaped compiled
programs (warm compile cache).

    python tools/render_showcase.py out/showcase --scene 1 --spp 1000
    python tools/render_showcase.py out/showcase --scene 3 --spp 100
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
    ap.add_argument("--scene", type=int, default=1)
    ap.add_argument("--spp", type=int, default=None)
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--depth", type=int, default=None)
    ap.add_argument("--lanes", type=int, default=1 << 17)
    ap.add_argument("--chunk-spp", type=int, default=25)
    args = ap.parse_args()

    from zraytrace_tpu.io.png import write_png
    from zraytrace_tpu.render import _wavefront_jit
    from zraytrace_tpu.scenes import build_scene

    # bench-matching defaults per scene
    if args.scene == 3:
        size = args.size or 700
        spp = args.spp or 100
        depth = args.depth or 20
    else:
        size = args.size or 1000
        spp = args.spp or 1000
        depth = args.depth or 30

    out = Path(args.outdir)
    out.mkdir(parents=True, exist_ok=True)

    built = build_scene(args.scene)
    scene = built.scene
    tri_flash = None
    if scene.n_triangles > 0:
        from zraytrace_tpu.ops.flash_intersect import pack_tri_planes

        tri_flash = pack_tri_planes(scene.tri_a, scene.tri_b, scene.tri_c)

    n_pix = size * size
    n_lanes = min(args.lanes, n_pix)
    n_slots = -(-n_pix // n_lanes)
    base = jnp.arange(n_lanes, dtype=jnp.int32)

    t0 = time.time()
    total = np.zeros((n_slots, n_lanes, 3), np.float64)
    done = 0
    while done < spp:
        step = min(args.chunk_spp, spp - done)
        sums, counters = _wavefront_jit(
            built.scene, built.camera, base, 42, size, size, step, depth,
            done, None, n_lanes, n_pix, n_slots, tri_flash,
        )
        jax.block_until_ready(counters)
        total += np.asarray(sums, np.float64)
        done += step
    dt = time.time() - t0

    sums = total.reshape(n_slots * n_lanes, 3)[:n_pix]
    img = (sums / spp).reshape(size, size, 3).astype(np.float32)
    path = out / f"{built.name}_{size}x{size}_{spp}spp.png"
    write_png(path, img)
    print(f"wrote {path} in {dt:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
