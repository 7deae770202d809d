#!/usr/bin/env python
"""Render showcase images on the TPU and record render stats.

    python tools/render_showcase.py showcase --scene 1 --spp 1000
    python tools/render_showcase.py showcase --scene 0 --scene 2 --scene 4

Mesh scenes route through the chunk-culled flash kernel with BVH-ordered
triangles and tile-coherent lanes — the same engine bench.py measures.
Appends a stats line per render to <outdir>/SWEEP.md.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

from zraytrace_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def render_scene(scene_idx, outdir, spp=None, size=None, depth=None,
                 lanes=None, chunk_spp=25):
    from zraytrace_tpu.config import RenderParams
    from zraytrace_tpu.geometry.bvh import build_tri_bvh
    from zraytrace_tpu.io.png import write_png
    from zraytrace_tpu.render import _counters_to_ints, _wavefront_jit
    from zraytrace_tpu.scenes import build_scene

    dflt = RenderParams(width=1, height=1, samples_per_pixel=1, max_depth=1)

    if scene_idx == 1:
        size = size or 1000
        spp = spp or 1000
        depth = depth or 30
    else:
        size = size or 700
        spp = spp or 100
        depth = depth or 20

    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)

    built = build_scene(scene_idx)
    scene = built.scene
    use_pallas = scene.n_triangles == 0  # megakernel: the bench engine

    # render() is a SINGLE dispatch; through the relay, executions past
    # ~2 min fault (CLAUDE.md). Mixed scenes run ~10M rays/s, so cap
    # the product path at ~250 spp there and fall back to the chunked
    # hand-built path above that; sphere scenes are ~75x faster and
    # never get near the deadline at plausible spp.
    within_deadline = scene.n_triangles == 0 or spp <= 250
    if lanes is None and within_deadline:
        # Every scene goes through the PRODUCT entry point render()
        # itself (round-4 verdict item 4: the sweep's recorded rate is
        # the user-facing engine's, not a hand-built twin). render()
        # resolves the megakernel knobs (sphere scenes AND the
        # deferred-mesh-hit mixed-scene path, auto-ON on TPU), the
        # cached balanced lane map, and the single dispatch bench.py
        # times — all mixed reference scenes fit the relay's ~2 min
        # execution deadline in one dispatch at the sweep configs
        # (scene 3 8.6 s, scene 4 8.4 s; PERF.md round 4). Pass an
        # explicit --lanes to fall back to the hand-built XLA path.
        from zraytrace_tpu.io.png import write_png as _write_png
        from zraytrace_tpu.render import render as _render_full

        n_pix = size * size
        rp = RenderParams(width=size, height=size, samples_per_pixel=spp,
                          max_depth=depth, seed=42)
        _render_full(built.scene, built.camera, rp)  # compile + calib
        img, st = _render_full(built.scene, built.camera, rp)
        dt = st.render_seconds
        path = out / f"{built.name}_{size}x{size}_{spp}spp.png"
        _write_png(path, img)
        line = (f"| {scene_idx} {built.name} | {size}x{size} | {spp} "
                f"| {depth} | {st.rays} | {st.reflections} "
                f"| {st.background_hits} | {st.recursion_depth_hits} "
                f"| {st.rays/dt/1e6:.2f}M | {dt:.1f}s |")
        assert st.samples == n_pix * spp, (st.samples, n_pix * spp)
        assert st.rays == st.reflections + st.samples \
            - st.recursion_depth_hits, "counter identity"
        with open(out / "SWEEP.md", "a") as f:
            f.write(line + "\n")
        print(f"wrote {path}  {st.rays/dt/1e6:.2f}M rays/s device "
              f"({dt:.1f}s render + {st.transfer_seconds:.1f}s fetch; "
              f"render() product path)", file=sys.stderr, flush=True)
        return
    # from here down: the hand-built chunked XLA-engine path, reachable
    # with an explicit --lanes or when a long mesh render would exceed
    # the relay execution deadline in render()'s single dispatch
    if lanes is None:
        lanes = dflt.pallas_max_wavefront if use_pallas else 1 << 17
    tri_flash = None
    tile = False
    if scene.n_triangles > 0:
        from zraytrace_tpu.ops.flash_intersect import pack_tri_planes

        order = build_tri_bvh(scene.tri_a, scene.tri_b,
                              scene.tri_c).prim_order
        from zraytrace_tpu.scene import mesh_materials_const

        tri_flash = pack_tri_planes(
            scene.tri_a, scene.tri_b, scene.tri_c, order=order,
            tri_mat=scene.tri_mat,
            const_materials=mesh_materials_const(scene))
        tile = True

    if not tile and chunk_spp == 25:
        # sphere scenes finish far inside the ~2-min relay deadline:
        # one dispatch, one image fetch. The old 25-spp default paid
        # ~40 x 12 MB slot-sum transfers through the relay tunnel —
        # the whole "render() is 15% below bench" gap (round-3
        # verdict) was this tool's methodology, not the engine.
        chunk_spp = spp

    n_pix = size * size
    if tile:
        from zraytrace_tpu.render import TILE_H, TILE_W

        tx, ty = -(-size // TILE_W), -(-size // TILE_H)
        padded = tx * ty * 512
        n_lanes = min(padded, -(-min(lanes, n_pix) // 512) * 512)
        n_slots = -(-padded // n_lanes)
    else:
        n_lanes = min(lanes, n_pix)
        n_slots = -(-n_pix // n_lanes)
    base = jnp.arange(n_lanes, dtype=jnp.int32)

    total = np.zeros((n_slots, n_lanes, 3), np.float64)
    counters = np.zeros((6, 2), np.uint64)
    done = 0
    def call(step, start):
        if use_pallas:
            from zraytrace_tpu.ops.bounce_kernel3 import (
                _wavefront_pallas3_jit,
            )
            from zraytrace_tpu.scene import material_classes

            # Knobs come from RenderParams' locked defaults, and
            # return_launches=True matches bench.py's traced program, so
            # the persistent compile cache is shared between the tools.
            from zraytrace_tpu.render import pallas_r_blk

            sums, cnts = _wavefront_pallas3_jit(
                built.scene, built.camera, base, 42, size, size, step,
                depth, start, n_slots, n_lanes, n_pix,
                n_bounce=dflt.pallas_bounces,
                r_blk=pallas_r_blk(n_lanes, dflt.pallas_r_blk),
                exit_frac=(1, 2),
                return_launches=True,
                sample_groups=max(1, min(dflt.pallas_sample_groups,
                                         chunk_spp)),
                mat_classes=material_classes(built.scene),
            )[:2]
        else:
            sums, cnts = _wavefront_jit(
                built.scene, built.camera, base, 42, size, size, step,
                depth, start, None, n_lanes, n_pix, n_slots, tri_flash,
                tile,
            )
        jax.block_until_ready(cnts)
        _ = float(jnp.sum(cnts[0]).astype(jnp.float32))
        return sums, cnts

    # Warm-up at an out-of-range sample index: compiles / loads the
    # cached program so the timed loop measures render speed only.
    call(1, spp)
    t0 = time.time()
    while done < spp:
        step = min(chunk_spp, spp - done)
        sums, cnts = call(step, done)
        total += np.asarray(sums, np.float64)
        counters += np.asarray(cnts, np.uint64)
        done += step
    dt = time.time() - t0

    flat = total.reshape(n_slots * n_lanes, 3)
    if tile:
        from zraytrace_tpu.render import untile_pixels

        flat = untile_pixels(flat, size, size)
    else:
        flat = flat[:n_pix]
    img = (flat / spp).reshape(size, size, 3).astype(np.float32)
    path = out / f"{built.name}_{size}x{size}_{spp}spp.png"
    write_png(path, img)

    rays, refl, bg, rec, samples, iters = _counters_to_ints(counters)
    line = (f"| {scene_idx} {built.name} | {size}x{size} | {spp} | {depth} "
            f"| {rays} | {refl} | {bg} | {rec} | {rays/dt/1e6:.2f}M | "
            f"{dt:.1f}s |")
    assert samples == n_pix * spp, (samples, n_pix * spp)
    assert rays == refl + samples - rec, "counter identity"
    with open(out / "SWEEP.md", "a") as f:
        f.write(line + "\n")
    print(f"wrote {path} in {dt:.1f}s  {rays/dt/1e6:.2f}M rays/s",
          file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--scene", type=int, action="append", required=True)
    ap.add_argument("--spp", type=int, default=None)
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--depth", type=int, default=None)
    ap.add_argument("--lanes", type=int, default=None)
    ap.add_argument("--chunk-spp", type=int, default=25)
    args = ap.parse_args()
    for sidx in args.scene:
        render_scene(sidx, args.outdir, args.spp, args.size, args.depth,
                     args.lanes, args.chunk_spp)


if __name__ == "__main__":
    main()
