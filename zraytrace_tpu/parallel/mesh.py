"""Device-mesh parallelism.

The reference is strictly single-threaded (README.md:11; the pixel loop at
raytrace.zig:162-187 is sequential), so everything here is new design per
SURVEY.md §2:

- mesh axes ``('data', 'sample')``: pixel tiles shard over ``data``
  (the per-pixel loop, raytrace.zig:163-168), sample batches shard over
  ``sample`` (the spp loop, raytrace.zig:172-179). The sample mean
  (raytrace.zig:182) is associative, so partial pixel sums ``psum`` over
  the ``sample`` axis.
- scene/BVH arrays are replicated; gradient reductions (inverse.py) psum
  over both axes.
- collectives are XLA's over ICI/DCN — expressed with ``shard_map`` —
  never hand-rolled transport.

Multi-host: the same SPMD program runs on every host after
``jax.distributed.initialize()``; nothing here is host-count-specific.
"""

from __future__ import annotations

import functools
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from zraytrace_tpu import camera as cam
from zraytrace_tpu.config import RenderParams
from zraytrace_tpu.render import (
    N_COUNTERS,
    RenderStats,
    _counters_to_ints,
    wavefront_trace,
)
from zraytrace_tpu.scene import Scene

DATA_AXIS = "data"
SAMPLE_AXIS = "sample"


def make_mesh(n_data: int | None = None, n_sample: int = 1, devices=None) -> Mesh:
    """Mesh over ``('data', 'sample')``. Defaults to all devices on data."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devices.size // n_sample
    assert n_data * n_sample == devices.size, (
        f"{devices.size} devices cannot form a {n_data}x{n_sample} mesh"
    )
    return Mesh(devices.reshape(n_data, n_sample), (DATA_AXIS, SAMPLE_AXIS))


def replicate(tree, mesh: Mesh):
    """Place every leaf replicated on the mesh (scene/BVH arrays)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_lanes(lanes: jnp.ndarray, mesh: Mesh):
    """Shard a flat lane array over the data axis."""
    return jax.device_put(lanes, NamedSharding(mesh, P(DATA_AXIS)))


@functools.lru_cache(maxsize=32)
def _sharded_wavefront(mesh: Mesh, n_slots: int, use_pallas: bool,
                       n_bounce: int, r_blk: int = 32,
                       sample_groups: int = 1, mat_classes=None,
                       mesh_pallas: bool = False,
                       tile_coherent: bool = False,
                       wavefront_groups: int = 1,
                       permuted_base: bool = False):
    """shard_map'd wavefront: each shard traces its lane slice (with
    strided multi-pixel slots, exactly like the single-chip engine) for
    its sample slice; pixel sums psum over the sample axis.

    ``tri_bvh`` / ``tri_flash`` route the same fast intersection paths as
    ``render()``; ``use_pallas`` routes sphere-only scenes through the
    bounce megakernel per shard, ``mesh_pallas`` mixed scenes through
    the deferred-mesh-hit megakernel (render.mesh_pallas_wanted policy),
    and the XLA mesh fallback gets the same tile-coherent lane map +
    sample interleave as ``render()`` (the knob set whose absence cost
    2-8x in PERF.md's measurements — VERDICT round 2 item 3).

    lru_cached on the static config (round 4): without it every
    ``render_sharded`` call built a fresh jitted closure, so each call
    re-traced and went through the relay's warm-compile path (~10 s) —
    measured as a 0.07 rate ratio vs ``render()`` before the fix."""

    def fn(scene, camera, pixel_ids, seed, width, height, spp_local,
           max_depth, sample_starts, stride, n_pixels, tri_bvh, tri_flash):
        # pixel_ids: (N/d,) local; sample_starts: (1,) local slice start.
        if use_pallas:
            from zraytrace_tpu.ops.bounce_kernel3 import (
                wavefront_trace_pallas3,
            )

            slot_sums, counters = wavefront_trace_pallas3(
                scene, camera, pixel_ids, seed, width, height,
                spp_local, max_depth, sample_start=sample_starts[0],
                n_slots=n_slots, pixel_stride=stride, n_pixels=n_pixels,
                n_bounce=n_bounce, r_blk=r_blk,
                sample_groups=sample_groups, mat_classes=mat_classes,
                tri_flash=tri_flash if mesh_pallas else None,
                permuted_base=permuted_base,
            )
        else:
            slot_sums, counters = wavefront_trace(
                scene, camera, pixel_ids, seed, width, height,
                spp_local, max_depth, sample_start=sample_starts[0],
                tri_bvh=tri_bvh, tri_flash=tri_flash,
                pixel_stride=stride, n_pixels=n_pixels, n_slots=n_slots,
                tile_coherent=tile_coherent,
                sample_groups=wavefront_groups,
            )
        sums = jax.lax.psum(slot_sums, SAMPLE_AXIS)
        return sums, counters[None]

    return jax.jit(
        jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(
                P(),  # scene (replicated)
                P(),  # camera
                P(DATA_AXIS),  # pixel lanes
                P(),  # seed
                P(),  # width
                P(),  # height
                P(),  # spp per sample-shard
                P(),  # max depth
                P(SAMPLE_AXIS),  # per-shard sample offsets
                P(),  # lane stride (global)
                P(),  # n_pixels
                P(),  # tri_bvh (replicated or None)
                P(),  # tri_flash (replicated or None)
            ),
            out_specs=(P(None, DATA_AXIS), P((DATA_AXIS, SAMPLE_AXIS))),
            check_vma=False,
        )
    )


def render_sharded(
    scene: Scene, camera: cam.Camera, params: RenderParams, mesh: Mesh,
    sample_start: int = 0,
):
    """Distributed forward render. Returns ``(image (H,W,3), RenderStats)``.

    Pixels shard over ``data`` (padding lanes idle), spp splits over
    ``sample`` (must divide evenly). The per-shard engine is the same one
    ``render()`` picks: strided multi-pixel slots, flash-intersect /
    BVH triangle routing, optional Pallas megakernel — so per-chip
    throughput matches the single-chip engine.

    ``sample_start`` offsets the global sample range (streams are keyed
    by absolute sample index) — checkpoint.render_sharded_checkpointed
    chunks long distributed renders with it; the offset rides in the
    traced per-shard start array, so chunking costs no recompiles.
    """
    import time

    n_data = mesh.shape[DATA_AXIS]
    n_sample = mesh.shape[SAMPLE_AXIS]
    w, h, spp = params.width, params.height, params.samples_per_pixel
    if spp % n_sample:
        raise ValueError(f"spp={spp} must divide over sample axis {n_sample}")
    spp_local = spp // n_sample
    n_pixels = w * h

    t0 = time.perf_counter()
    from zraytrace_tpu.render import (
        TILE_H, TILE_W, mesh_routing, pallas_wanted,
    )

    # Mesh routing mirrors render() exactly (the sharded path once
    # dropped the BVH chunk order and tile-coherent knobs — the exact
    # regressions measured at 2-8x in PERF.md; VERDICT round 2 item 3):
    # BVH-leaf-ordered chunk packing + const-material attrs, deferred
    # -mesh-hit megakernel on TPU (mesh_pallas_wanted), else the
    # tile-coherent XLA wavefront with sample interleave.
    tri_bvh, tri_flash, mesh_pallas = mesh_routing(params, scene,
                                                   n_pixels)
    tile_coherent = tri_flash is not None and not mesh_pallas

    use_pallas = pallas_wanted(params, scene, n_pixels) or mesh_pallas

    # Shard-local lane-count granularity: flash kernel needs 512-ray
    # blocks, the megakernel 128-lane rows.
    gran = n_data * (512 if tri_flash is not None else
                     256 if use_pallas else 1)
    n_lanes = min(n_pixels, params.max_wavefront)
    if use_pallas:
        # per-shard megakernel sweet spot (config.pallas_max_wavefront)
        n_lanes = min(n_lanes, params.pallas_max_wavefront * n_data)
    n_lanes = math.ceil(n_lanes / gran) * gran
    if tile_coherent:
        # lanes cover the padded tile grid; partial-tile positions map
        # past n_pixels and idle (render.untile_pixels drops them)
        padded = (-(-w // TILE_W)) * (-(-h // TILE_H)) * 512
        padded = math.ceil(padded / gran) * gran
        n_lanes = min(padded, n_lanes)
        n_slots = math.ceil(padded / n_lanes)
    else:
        n_slots = math.ceil(n_pixels / n_lanes)
    ids = np.arange(n_lanes, dtype=np.int32)
    if not use_pallas and not tile_coherent:
        # Padding lanes get an id >= n_pixels: lane_alive() is false from
        # the start, so they stay idle and contribute nothing to image or
        # counters (re-tracing pixel 0 would over-report RenderStats).
        # The megakernel instead REQUIRES each shard's base to be a
        # contiguous range (its sample-interleave rotation wraps within
        # [lo, lo+n)); ids beyond n_pixels idle through the same
        # pixel-validity check, so it keeps the raw arange — as does the
        # tile-coherent map (validity lives in the tile positions).
        ids[n_pixels:] = n_pixels
    sample_starts = (jnp.int32(sample_start)
                     + jnp.arange(n_sample, dtype=jnp.int32) * spp_local)

    scene_r = replicate(scene, mesh)
    camera_r = replicate(camera, mesh)
    tri_bvh_r = replicate(tri_bvh, mesh) if tri_bvh is not None else None
    tri_flash_r = (replicate(tri_flash, mesh)
                   if tri_flash is not None else None)
    ids_s = shard_lanes(jnp.asarray(ids), mesh)
    mat_classes = None
    if use_pallas:
        from zraytrace_tpu.render import pallas_r_blk
        from zraytrace_tpu.scene import material_classes

        mat_classes = material_classes(scene)
    from zraytrace_tpu.render import balanced_base, wavefront_groups

    # profile-balanced lane map: single-device meshes only (the orbit
    # rotation needs the full contiguous lane space; a sharded base
    # splits it) — the 1-device sharded engine stays bit-identical to
    # render() by resolving through the same helper + cache
    permuted = False
    ids_j = jnp.asarray(ids)
    g_eff = max(1, min(params.pallas_sample_groups, spp_local))
    if use_pallas and not mesh_pallas and mesh.devices.size == 1:
        ids_j, permuted = balanced_base(
            params, scene, camera, w, h, spp_local, n_lanes, n_slots,
            g_eff, pallas_r_blk(n_lanes, params.pallas_r_blk),
            mesh_pallas, ids_j)
    ids_s = shard_lanes(ids_j, mesh) if permuted else ids_s

    xg = wavefront_groups(params, scene, spp_local, tile_coherent)
    fn = _sharded_wavefront(
        mesh, n_slots, use_pallas, params.pallas_bounces,
        r_blk=(pallas_r_blk(n_lanes // n_data, params.pallas_r_blk)
               if use_pallas else 32),
        sample_groups=g_eff,
        mat_classes=mat_classes,
        mesh_pallas=mesh_pallas, tile_coherent=tile_coherent,
        wavefront_groups=xg,
        permuted_base=permuted,
    )
    t1 = time.perf_counter()
    sums, counters = fn(
        scene_r, camera_r, ids_s, params.seed, w, h, spp_local,
        params.max_depth, sample_starts, n_lanes, n_pixels,
        tri_bvh_r, tri_flash_r,
    )
    if jax.process_count() > 1:
        # Multi-controller: outputs are global arrays whose shards live on
        # other hosts; gather them so every host returns the full image.
        from jax.experimental import multihost_utils

        sums = multihost_utils.process_allgather(sums, tiled=True)
        counters = multihost_utils.process_allgather(counters, tiled=True)
    # counters first: the tiny fetch is the device-completion sync
    # (same split as render() — the slot-sum fetch through the relay
    # costs ~0.4-0.5 s and is transfer, not render)
    c = np.asarray(counters).astype(np.uint64)
    t_dev = time.perf_counter()
    s_np = np.asarray(sums)
    if xg > 1:
        # fold the interleaved group planes back per SHARD: group g of
        # lane i (shard-local) traced position (i + g*shift_local) mod
        # n_local (render() does the same fold globally)
        from zraytrace_tpu.render import _interleave_shift

        n_local = n_lanes // n_data
        shift_local = _interleave_shift(n_local, xg, tile_coherent)
        s4 = s_np.reshape(n_slots * xg, n_data, n_local, 3)
        folded = np.zeros((n_slots, n_data, n_local, 3), s_np.dtype)
        for g in range(xg):
            for p in range(n_slots):
                folded[p] += np.roll(s4[g * n_slots + p],
                                     g * shift_local, axis=1)
        s_np = folded.reshape(n_slots, n_lanes, 3)
    if permuted:
        # balanced lane map: lane l traced pixel ids_j[l] + p*n —
        # invert before the positional reshape (render() does the same)
        from zraytrace_tpu.render import unpermute_lanes

        s_np = unpermute_lanes(s_np.reshape(n_slots, n_lanes, 3), ids_j)
    sums = s_np.reshape(n_slots * n_lanes, 3)
    if tile_coherent:
        from zraytrace_tpu.render import untile_pixels

        sums = untile_pixels(sums, w, h)
    else:
        # pixel p lives at (slot p // n_lanes, lane p % n_lanes)
        sums = sums[:n_pixels]
    # (grid, 6, 2) two-limb uint32 -> per-shard ints -> totals (carries
    # cannot be summed limb-wise).
    totals = (c[..., 0] * (1 << 32) + c[..., 1]).sum(axis=0)
    t2 = time.perf_counter()

    image = (sums / spp).reshape(h, w, 3)
    rays, refl, bg, rec, samples, iters = (int(x) for x in totals)
    stats = RenderStats(
        rays=rays, reflections=refl, background_hits=bg,
        recursion_depth_hits=rec, samples=samples, pixels=n_pixels,
        wavefront_iterations=iters,
        preprocess_seconds=t1 - t0, render_seconds=t_dev - t1,
        transfer_seconds=t2 - t_dev,
    )
    return image, stats
