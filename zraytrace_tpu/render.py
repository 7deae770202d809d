"""Wavefront path-tracing engine.

The reference renders one pixel at a time with a recursive ``rayColor``
(raytrace.zig:62-100, 163-187). Here the whole image is a *wavefront*: one
lane per pixel, every lane tracing its own sample stream. A single
``lax.while_loop`` advances all lanes one bounce per iteration; when a
lane's path terminates (background / absorb / depth exhausted) the lane
immediately regenerates the next camera sample for its pixel — occupancy
stays near 100% with zero scatter/compaction, because accumulation is
lane-local.

Radiance identity (there are no emitters; the sky gradient is the only
light, raytrace.zig:53-58): a path's contribution is
``prod(attenuations) * background(last_dir)`` if it escapes, else black
(absorb, raytrace.zig:91-94, or depth exhaustion, raytrace.zig:64-67).

The reference's progress counters (raytrace.zig:20-34) are reproduced as
on-device two-limb uint32 accumulators (totals exceed int32 range at the
published workloads, README.md:58).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from zraytrace_tpu import camera as cam
from zraytrace_tpu import materials as mat
from zraytrace_tpu import rng as zrng
from zraytrace_tpu import vecmath as vm
from zraytrace_tpu.config import RenderParams, T_MIN
from zraytrace_tpu.geometry.sphere import intersect_spheres, sphere_surface
from zraytrace_tpu.geometry.triangle import intersect_triangles, triangle_surface
from zraytrace_tpu.scene import Scene

_BIG = np.float32(3.4e38)  # numpy scalar: no backend init at import

# Tile-coherent lane order: consecutive 512-lane groups map to
# TILE_W x TILE_H pixel tiles (TILE_W * TILE_H == 512). Pixel ids (and
# so RNG streams / counters / sums) are identical for any shape; the
# shape only sets the screen footprint of the flash kernel's ray
# blocks. Teapot sweep with R_RAYS=128 blocks (each block covers a
# TILE_W x (128/TILE_W * TILE_H/4)-ish strip): 64x8 5.07M, 32x16
# 5.40M, 16x32 5.28M rays/s (PERF.md round 3).
import os as _os

# 16x32 tiles locked in round 3: teapot 10.75M vs 10.60M (the +1%
# repeatable round-2 lead, now default) and goat-class +4% (1793k vs
# 1723k) — the cache-churn concern that deferred it is gone (the cache
# rebuilds each round anyway).
TILE_W = int(_os.environ.get("ZRAYTRACE_TILE_W", "16"))
TILE_H = 512 // TILE_W
assert TILE_W * TILE_H == 512, TILE_W

# Counter slots, mirroring Progress (raytrace.zig:20-34), plus wavefront
# iteration telemetry (lockstep steps executed; the ratio iterations *
# lanes / rays is the occupancy waste factor).
N_COUNTERS = 6
C_RAYS, C_REFLECTIONS, C_BACKGROUND, C_RECURSION, C_SAMPLES, C_ITERS = range(
    N_COUNTERS
)


@dataclasses.dataclass
class RenderStats:
    """Totals as published by the reference (raytrace.zig:188-201)."""

    rays: int = 0
    reflections: int = 0
    background_hits: int = 0
    recursion_depth_hits: int = 0
    samples: int = 0
    pixels: int = 0
    wavefront_iterations: int = 0
    preprocess_seconds: float = 0.0
    render_seconds: float = 0.0
    # Device -> host image readback, timed separately from
    # render_seconds (round 4): through this environment's TPU relay
    # a 12 MB slot-sum fetch costs ~0.4 s — comparable to the whole
    # 7-spheres render — while on a directly attached host it is
    # PCIe-speed noise. rays_per_second reports device throughput.
    transfer_seconds: float = 0.0

    @property
    def rays_per_second(self) -> float:
        return self.rays / self.render_seconds if self.render_seconds else 0.0

    @property
    def pixels_per_second(self) -> float:
        return self.pixels / self.render_seconds if self.render_seconds else 0.0


def background_color(d: jnp.ndarray) -> jnp.ndarray:
    """Sky gradient for escaping rays (raytrace.zig:53-58). ``d`` unit."""
    t = 0.5 * (d[..., 1] + 1.0)
    white = jnp.array([1.0, 1.0, 1.0], jnp.float32)
    blue = jnp.array([0.5, 0.7, 1.0], jnp.float32)
    return (1.0 - t)[..., None] * white + t[..., None] * blue


def trace_closest(scene: Scene, o, d, t_min=T_MIN, t_max=_BIG, tri_bvh=None,
                  tri_flash=None):
    """Closest-hit query over all primitives.

    The reference's linear surface scan with t_max tightening
    (raytrace.zig:75-81) becomes two typed batch intersections merged by
    min-t; spheres win exact ties because every reference scene inserts
    spheres before mesh triangles.

    ``tri_bvh``: optional flattened BVH (geometry/bvh.py). When given,
    triangles are found by stackless traversal instead of the brute-force
    scan — like the reference, the BVH is only built for larger scenes
    (raytrace.zig:124-133).

    Returns dict with: hit (N,), t, point (N,3), normal (N,3) flipped
    against the ray, front_face (N,), uv (N,2), mat_id (N,).
    """
    n = o.shape[0]

    # Sphere-only scenes (the 7-spheres showcase class) take a fully
    # fused path: an unrolled running-winner loop with zero gathers,
    # matmuls or argmins — everything one VPU elementwise chain.
    if scene.n_triangles == 0 and 0 < scene.n_spheres <= 32:
        from zraytrace_tpu.geometry.sphere import (
            intersect_spheres_fused,
            sphere_attributes,
        )

        fs = intersect_spheres_fused(
            o, d, scene.sph_center, scene.sph_radius, scene.sph_mat,
            t_min, t_max,
        )
        hit = fs["hit"]
        t_attr = jnp.where(hit, fs["t"], 1.0)
        point, outward, uv = sphere_attributes(
            o, d, t_attr, fs["center"], fs["radius"]
        )
        front_face = vm.dot(d, outward) <= 0.0
        normal = jnp.where(front_face[:, None], outward, -outward)
        return dict(
            hit=hit, t=fs["t"], point=point, normal=normal,
            front_face=front_face, uv=uv, mat_id=fs["mat_id"],
        )
    if scene.n_spheres > 0:
        ts, si, _ = intersect_spheres(
            o, d, scene.sph_center, scene.sph_radius, t_min, t_max
        )
    else:
        ts = jnp.full((n,), _BIG)
        si = jnp.zeros((n,), jnp.int32)
    flash_attrs = False
    if tri_bvh is not None and scene.n_triangles > 0:
        from zraytrace_tpu.geometry.bvh import bvh_closest_triangle

        tt, ti, _, uv_t = bvh_closest_triangle(
            tri_bvh, scene.tri_a, scene.tri_b, scene.tri_c, o, d, t_min, t_max
        )
    elif tri_flash is not None and scene.n_triangles > 0 and n % 512 == 0:
        from zraytrace_tpu.ops.flash_intersect import flash_intersect_triangles

        # sphere distance seeds the winner + caps chunk reachability
        # (triangles past the closest sphere lose anyway; strict < in
        # the merge below keeps exact ties on the sphere)
        tt, ti, _, uv_t = flash_intersect_triangles(tri_flash, o, d, t_min,
                                                    t_init=ts)
        # ti is a packed sorted id in attrs mode — only valid against
        # tri_flash.attrs, which only this branch produces
        flash_attrs = tri_flash.attrs is not None
    else:
        tt, ti, _, uv_t = intersect_triangles(
            o, d, scene.tri_a, scene.tri_b, scene.tri_c, t_min, t_max
        )

    use_tri = tt < ts
    t = jnp.where(use_tri, tt, ts)
    hit = t < _BIG
    # Miss lanes carry t = _BIG; computing attributes at that distance
    # overflows to inf and NaN-poisons reverse-mode gradients through the
    # masked selects below. Attributes are evaluated at a safe t instead
    # (their values are ignored for miss lanes).
    t_attr = jnp.where(hit, t, 1.0)

    if scene.n_spheres > 0:
        p_s, n_s, uv_s = sphere_surface(o, d, t_attr, si, scene.sph_center, scene.sph_radius)
        from zraytrace_tpu.geometry.sphere import onehot_rows

        # gather-free material id (see perf_probe: TPU gathers serialize)
        mat_s = jnp.round(onehot_rows(si, scene.sph_mat)).astype(jnp.int32)
    else:
        p_s = n_s = jnp.zeros_like(o)
        uv_s = jnp.zeros((n, 2), jnp.float32)
        mat_s = jnp.zeros((n,), jnp.int32)
    if scene.n_triangles > 0:
        if flash_attrs:
            # const-material mesh: ONE gather row [unit_fn, mat] per
            # lane (indexed by the kernel's packed sorted id) replaces
            # three vertex rows + the mat row (gathers cost ~5 ns per
            # ROW regardless of width). The packed unit normal is
            # bit-identical to triangle_surface's (same f32 ops,
            # precomputed per triangle at pack time).
            at = tri_flash.attrs[ti]
            n_t = at[:, :3]
            mat_t = at[:, 3].astype(jnp.int32)
            p_t = vm.ray_at(o, d, t_attr)
        else:
            p_t, n_t = triangle_surface(
                o, d, t_attr, ti, scene.tri_a, scene.tri_b, scene.tri_c)
            mat_t = scene.tri_mat[ti]
    else:
        p_t = n_t = jnp.zeros_like(o)
        mat_t = jnp.zeros((n,), jnp.int32)

    use_tri3 = use_tri[:, None]
    point = jnp.where(use_tri3, p_t, p_s)
    outward = jnp.where(use_tri3, n_t, n_s)
    uv = jnp.where(use_tri[:, None], uv_t, uv_s)
    mat_id = jnp.where(use_tri, mat_t, mat_s)

    # Front-face flip (hit_record.zig:28-41).
    front_face = vm.dot(d, outward) <= 0.0
    normal = jnp.where(front_face[:, None], outward, -outward)
    return dict(
        hit=hit, t=t, point=point, normal=normal,
        front_face=front_face, uv=uv, mat_id=mat_id,
    )


def _u64_add(acc, delta):
    """Two-limb uint32 add: acc (..., 2) [hi, lo] += delta (uint32)."""
    lo = acc[..., 1] + delta
    carry = (lo < delta).astype(jnp.uint32)
    return jnp.stack([acc[..., 0] + carry, lo], axis=-1)


def _count(mask) -> jnp.ndarray:
    return jnp.sum(mask, dtype=jnp.uint32)


def _interleave_shift(n: int, G: int, tile_coherent: bool) -> int:
    """Lane-space rotation per sample group. A multiple of 512 keeps
    the tile-coherent 512-lane blocks intact (each group lands on whole
    tiles); any value is correct — (i + g*shift) mod n is a bijection."""
    if G <= 1:
        return 0
    s = n // G
    if tile_coherent and s >= 512:
        s = s // 512 * 512
    return s


def wavefront_trace(
    scene: Scene,
    camera: cam.Camera,
    pixel_base: jnp.ndarray,  # (N,) int32 first pixel id per lane
    seed,
    width,
    height,
    spp,
    max_depth,
    sample_start=0,
    tri_bvh=None,
    pixel_stride=None,
    n_pixels=None,
    n_slots: int = 1,
    tri_flash=None,
    tile_coherent: bool = False,
    sample_groups: int = 1,
):
    """Trace samples ``[sample_start, sample_start + spp)`` for a set of
    pixels per lane. Returns (slot_sums (n_slots*G, N, 3), counters (6,2)).

    Lane ``i`` processes pixels ``pixel_base[i] + k * pixel_stride`` for
    ``k in [0, n_slots)`` (skipping ids >= n_pixels), one sample stream
    after another. Multi-pixel lanes average out per-pixel path-length
    variance, cutting the lockstep tail waste (heavy glass pixels no
    longer pin a whole lane for the entire render), and shrink resident
    state. ``n_slots`` is static (it shapes the output); everything else
    is traced, so one compiled program serves every resolution/spp/depth
    at a given lane count.

    ``sample_groups`` (G) > 1 additionally splits each pixel's spp into
    G windows traced by G DIFFERENT lanes (the megakernel's rotated-base
    interleave, ops/bounce_kernel3): slot k means (pixel stripe
    p = k mod n_slots, group g = k div n_slots), and the lane traces
    pixel position ``(i + g*shift) mod n + p*stride`` for the g-th
    spp/G window. Heavy pixels spread over G lanes, cutting the
    lockstep occupancy waste. Counters stay bit-exact (PCG4D streams
    are keyed by (pixel, sample)); pixel sums change only in float
    summation order. The caller folds group planes back with
    ``np.roll`` (render()).

    ``sample_start`` offsets the per-lane sample stream — the 'sample'
    mesh axis shards this range and psums the pixel sums (the sample mean
    at raytrace.zig:182 is associative).
    """
    n = pixel_base.shape[0]
    G = int(sample_groups)
    n_slots_t = n_slots * G
    shift = _interleave_shift(n, G, tile_coherent)
    width = jnp.asarray(width, jnp.int32)
    height = jnp.asarray(height, jnp.int32)
    spp = jnp.asarray(spp, jnp.int32)
    max_depth = jnp.asarray(max_depth, jnp.int32)
    sample_start = jnp.asarray(sample_start, jnp.int32)
    sample_end = sample_start + spp
    pixel_stride = jnp.asarray(
        n if pixel_stride is None else pixel_stride, jnp.int32
    )
    n_pixels = (
        width * height if n_pixels is None else jnp.asarray(n_pixels, jnp.int32)
    )
    fw = width.astype(jnp.float32)
    fh = height.astype(jnp.float32)
    tiles_x = (width + TILE_W - 1) // TILE_W
    gspp = (spp + G - 1) // G if G > 1 else spp

    def camera_rays(pixel_ids, sample_idx):
        j = zrng.uniform4(seed, pixel_ids, sample_idx, 0, zrng.STREAM_CAMERA)
        px = (pixel_ids % width).astype(jnp.float32)
        py = (pixel_ids // width).astype(jnp.float32)
        u, v = cam.pixel_uv(px, py, j[:, 0], j[:, 1], fw, fh)
        return cam.get_rays(camera, u, v)

    def win_bounds(slot):
        # the sample window of slot k: group g = k div n_slots traces
        # samples [start + g*gspp, min(start + (g+1)*gspp, end))
        if G == 1:
            return sample_start, sample_end
        g = slot // n_slots
        ws = sample_start + g * gspp
        return ws, jnp.minimum(ws + gspp, sample_end)

    # Interleave rotates lanes within THIS call's lane block: under
    # shard_map each shard's pixel_base is the contiguous slice
    # [lo, lo + n), so the rotation must wrap relative to lo (lo = 0 for
    # the single-device arange — results bit-identical there).
    base_lo = jnp.min(pixel_base) if G > 1 else jnp.int32(0)

    def lane_pixel(slot):
        if G > 1:
            g_grp = slot // n_slots
            p_str = slot - g_grp * n_slots
            rot = pixel_base - base_lo + g_grp * shift
            rot = jnp.where(rot >= n, rot - n, rot)
            g = rot + base_lo + p_str * pixel_stride
        else:
            g = pixel_base + slot * pixel_stride
        if not tile_coherent:
            return g
        # Tile-coherent order: consecutive 512-lane groups map to
        # TILE_W x TILE_H pixel tiles instead of image rows. Pixel IDS
        # are unchanged (RNG streams, counters and per-pixel sums are
        # bit-identical); only which lane traces which pixel moves,
        # which makes ray blocks spatially tight so the flash kernel's
        # chunk culling bites (PERF.md round 2). Out-of-image positions
        # of partial tiles map to n_pixels (idle lanes).
        blk = g // 512
        within = g % 512
        bx = blk % tiles_x
        by = blk // tiles_x
        px = bx * TILE_W + within % TILE_W
        py = by * TILE_H + within // TILE_W
        return jnp.where((px < width) & (py < height),
                         py * width + px, n_pixels)

    pixel0 = lane_pixel(jnp.zeros((n,), jnp.int32))
    o0, d0 = camera_rays(pixel0, jnp.full((n,), sample_start, jnp.int32))
    state = dict(
        o=o0,
        d=d0,
        throughput=jnp.ones((n, 3), jnp.float32),
        acc=jnp.zeros((n, 3), jnp.float32),  # current pixel's sample sum
        path_depth=jnp.zeros((n,), jnp.int32),
        sample_idx=jnp.full((n,), sample_start, jnp.int32),
        slot=jnp.zeros((n,), jnp.int32),
        slot_sums=jnp.zeros((n_slots_t, n, 3), jnp.float32),
        counters=jnp.zeros((N_COUNTERS, 2), jnp.uint32),
    )

    def lane_alive(slot):
        return (slot < n_slots_t) & (lane_pixel(slot) < n_pixels)

    def cond(s):
        if tile_coherent or G > 1:
            # invalid (partial-tile padding) positions and empty sample
            # windows interleave with valid ones across a lane's slot
            # sequence; a lane parked on one advances a slot per
            # iteration (see body) and must stay in the loop until its
            # slots are exhausted
            return jnp.any(s["slot"] < n_slots_t)
        return jnp.any(lane_alive(s["slot"]))

    def body(s):
        pixel_ids = lane_pixel(s["slot"])
        ws_cur, we_cur = win_bounds(s["slot"])
        active = lane_alive(s["slot"]) & (s["sample_idx"] < we_cur)
        # Depth check happens before tracing, exactly like the recursion
        # guard at raytrace.zig:64-67.
        exhausted = active & (s["path_depth"] >= max_depth)
        processing = active & ~exhausted

        h = trace_closest(scene, s["o"], s["d"], tri_bvh=tri_bvh,
                          tri_flash=tri_flash)
        rnd = zrng.uniform4(
            seed, pixel_ids, s["sample_idx"], s["path_depth"], zrng.STREAM_SCATTER
        )
        new_dir, atten, absorbed = mat.scatter(
            scene, s["d"], h["normal"], h["front_face"], h["uv"], h["mat_id"], rnd
        )

        miss = processing & ~h["hit"]
        absorb_end = processing & h["hit"] & absorbed
        scattered = processing & h["hit"] & ~absorbed
        path_done = miss | absorb_end | exhausted

        # Radiance: only escaping paths contribute (sky is the only light).
        radiance = jnp.where(
            miss[:, None], s["throughput"] * background_color(s["d"]), 0.0
        )
        acc = s["acc"] + radiance

        counters = s["counters"]
        counters = counters.at[C_RAYS].set(_u64_add(counters[C_RAYS], _count(processing)))
        counters = counters.at[C_REFLECTIONS].set(
            _u64_add(counters[C_REFLECTIONS], _count(scattered))
        )
        counters = counters.at[C_BACKGROUND].set(
            _u64_add(counters[C_BACKGROUND], _count(miss))
        )
        counters = counters.at[C_RECURSION].set(
            _u64_add(counters[C_RECURSION], _count(exhausted))
        )
        counters = counters.at[C_SAMPLES].set(
            _u64_add(counters[C_SAMPLES], _count(path_done))
        )
        counters = counters.at[C_ITERS].set(
            _u64_add(counters[C_ITERS], jnp.uint32(1))
        )

        # Continue scattered paths.
        sc3 = scattered[:, None]
        throughput = jnp.where(sc3, s["throughput"] * atten, s["throughput"])
        o = jnp.where(sc3, h["point"], s["o"])
        d = jnp.where(sc3, new_dir, s["d"])
        path_depth = jnp.where(scattered, s["path_depth"] + 1, s["path_depth"])

        # Sample bookkeeping: advance the sample; when the pixel's spp is
        # complete, commit its sum into the slot output and move the lane
        # to its next pixel.
        sample_idx = s["sample_idx"] + path_done.astype(jnp.int32)
        pixel_finished = path_done & (sample_idx >= we_cur)
        # NOTE: a single stacked where-add over all slot planes was
        # A/B'd against this per-k DUS chain and measured SLOWER on
        # hardware (71.4s vs 68.9s teapot) — XLA already fuses the DUS
        # chain in place. Keep the loop.
        slot_sums = s["slot_sums"]
        for k in range(n_slots_t):
            commit_k = (pixel_finished & (s["slot"] == k))[:, None]
            slot_sums = slot_sums.at[k].set(
                slot_sums[k] + jnp.where(commit_k, acc, 0.0)
            )
        acc = jnp.where(pixel_finished[:, None], 0.0, acc)
        advance = pixel_finished
        if tile_coherent:
            # a lane whose CURRENT slot maps to an invalid padding
            # position skips it (one slot per iteration) — later slots
            # may still map to real pixels
            advance = advance | (
                (s["slot"] < n_slots_t) & (pixel_ids >= n_pixels))
        if G > 1:
            # an empty sample window (spp < G*gspp tail) skips the same
            # way
            advance = advance | (
                (s["slot"] < n_slots_t) & (s["sample_idx"] >= we_cur))
        slot = s["slot"] + advance.astype(jnp.int32)
        ws_next, _ = win_bounds(slot)
        sample_idx = jnp.where(advance, ws_next, sample_idx)

        # Regenerate the next camera sample on lanes whose path just
        # ended (or that just skipped an invalid padding slot).
        regen = path_done | advance
        new_pixel = lane_pixel(slot)
        o_new, d_new = camera_rays(new_pixel, sample_idx)
        pd3 = regen[:, None]
        o = jnp.where(pd3, o_new, o)
        d = jnp.where(pd3, d_new, d)
        throughput = jnp.where(pd3, 1.0, throughput)
        path_depth = jnp.where(regen, 0, path_depth)

        return dict(
            o=o, d=d, throughput=throughput, acc=acc, path_depth=path_depth,
            sample_idx=sample_idx, slot=slot, slot_sums=slot_sums,
            counters=counters,
        )

    final = jax.lax.while_loop(cond, body, state)
    return final["slot_sums"], final["counters"]


_wavefront_jit = jax.jit(
    wavefront_trace,
    static_argnames=("n_slots", "tile_coherent", "sample_groups"),
)


def _counters_to_ints(counters: np.ndarray) -> list[int]:
    return [int(hi) * (1 << 32) + int(lo) for hi, lo in counters]


def maybe_build_bvh(scene: Scene, params: RenderParams):
    """BVH build policy. The reference enables it above 10 surfaces
    (raytrace.zig:124-133); on TPU the gather-bound traversal only beats
    brute-force matmul intersection for much larger meshes
    (params.bvh_min_triangles; see PERF.md), so the threshold is a
    RenderParams knob."""
    if params.bvh and scene.n_triangles > params.bvh_min_triangles:
        from zraytrace_tpu.geometry.bvh import build_tri_bvh

        return build_tri_bvh(scene.tri_a, scene.tri_b, scene.tri_c)
    return None


def pallas_wanted(params: RenderParams, scene: Scene, n_pixels: int) -> bool:
    """Resolve the tri-state ``use_pallas`` policy (config.py) — shared
    by ``render()`` and ``render_sharded`` so the two entry points never
    drift: sphere-only scenes on a real TPU by default, bounded by the
    megakernel's div-free pixel-decode range."""
    want = (params.use_pallas if params.use_pallas is not None
            else jax.default_backend() == "tpu")
    return (want and scene.n_triangles == 0 and scene.n_spheres > 0
            # the kernel's div-free pixel->(x,y) needs f32-exact pixel ids
            and n_pixels < (1 << 22))


_FLASH_MEMO: dict = {}


def flash_pack_cached(scene: Scene):
    """BVH-leaf-ordered flash planes for a scene's mesh, memoized by
    CONTENT hash (a few ms for 158k triangles, vs tens of seconds for
    the binned-SAH build it skips). Shared by render(),
    render_sharded (whose checkpointed chunk loop calls it per chunk)
    and render_checkpointed so the three entry points can never pack
    differently again."""
    import hashlib

    from zraytrace_tpu.geometry.bvh import build_tri_bvh
    from zraytrace_tpu.ops.flash_intersect import pack_tri_planes

    from zraytrace_tpu.scene import mesh_materials_const

    const = mesh_materials_const(scene)
    h = hashlib.sha256()
    for a in (scene.tri_a, scene.tri_b, scene.tri_c, scene.tri_mat):
        h.update(np.ascontiguousarray(np.asarray(a)).tobytes())
    h.update(b"c" if const else b"n")
    key = h.hexdigest()
    hit = _FLASH_MEMO.get(key)
    if hit is not None:
        return hit
    order = build_tri_bvh(scene.tri_a, scene.tri_b,
                          scene.tri_c).prim_order
    planes = pack_tri_planes(scene.tri_a, scene.tri_b, scene.tri_c,
                             order=order, tri_mat=scene.tri_mat,
                             const_materials=const)
    while len(_FLASH_MEMO) >= 4:
        _FLASH_MEMO.pop(next(iter(_FLASH_MEMO)))
    _FLASH_MEMO[key] = planes
    return planes


def mesh_routing(params: RenderParams, scene: Scene, n_pixels: int):
    """Resolve the shared mesh fast-path routing: returns
    ``(tri_bvh, tri_flash, mesh_pallas)``. ``tri_flash`` is packed
    (flash_pack_cached) only when the BVH traversal is not selected and
    a fast path wants it; ``mesh_pallas`` is the RESOLVED deferred-
    mesh-hit megakernel decision (requires const-material attrs). One
    definition for render(), render_sharded and render_checkpointed —
    the per-entry-point copies had already drifted once (round-4
    review: the checkpoint copy dropped the tri_bvh gate)."""
    tri_bvh = maybe_build_bvh(scene, params)
    mesh_pallas = mesh_pallas_wanted(params, scene, n_pixels)
    tri_flash = None
    if (tri_bvh is None and scene.n_triangles > 0
            and (jax.default_backend() == "tpu" or mesh_pallas)):
        tri_flash = flash_pack_cached(scene)
    mesh_pallas = (mesh_pallas and tri_flash is not None
                   and tri_flash.attrs is not None)
    return tri_bvh, tri_flash, mesh_pallas


def mesh_pallas_wanted(params: RenderParams, scene: Scene,
                       n_pixels: int) -> bool:
    """Resolve the ``pallas_mesh`` policy (config.py): route a MIXED
    scene (spheres + const-material mesh) through the bounce megakernel
    with the deferred mesh-hit stall (ops/bounce_kernel3 docstring).

    Auto = ON for a real TPU: hardware-measured faster than the XLA
    wavefront + per-bounce flash path on every mixed reference scene at
    700x700x100spp d20 — scene 0 65.9M vs 17.2M, scene 2 24.0M vs
    21.0M, scene 3 9.3M vs 8.5M, scene 4 9.7M vs 6.9M rays/s
    (tools/mesh_pallas_probe.py, 2026-08-19; PERF.md round 3) — and at
    goat scale: 158k triangles 2.61M vs the reach-sorted XLA champion's
    2.09M at 512x512x64spp d8 (tools/goat_probe.py --engine megakernel,
    2026-08-20; PERF.md round 4), so the policy holds with no size cap.
    True forces it (interpret mode on CPU — tests); False keeps the XLA
    path."""
    from zraytrace_tpu.scene import mesh_materials_const

    if params.pallas_mesh is None:
        want = jax.default_backend() == "tpu"
    else:
        want = params.pallas_mesh
    return (want and scene.n_triangles > 0 and scene.n_spheres > 0
            and mesh_materials_const(scene)
            and n_pixels < (1 << 22))


def wavefront_groups(params: RenderParams, scene: Scene, spp: int,
                     tile_coherent: bool = True) -> int:
    """Resolve the XLA-wavefront sample-interleave policy (config.py),
    shared by ``render()`` and ``render_sharded`` so the two entry
    points never drift: auto (None) interleaves G=4 at goat scale
    (>= 32768 triangles — straggler-bound dispatches, hardware-measured
    +11%), G=1 below; an explicit int forces. Clamped to spp.

    Non-tile-coherent paths (CPU brute, BVH traversal) always resolve
    G=1 — render_sharded's padded lane ids break the rotation's
    contiguous-base requirement there, so a G>1 single-device render
    would differ from the sharded one in float summation order. Gating
    BOTH entry points here keeps them bit-identical (the interleave's
    +11% was measured on the tile-coherent flash path only)."""
    if not tile_coherent:
        return 1
    g = params.wavefront_sample_groups
    if g is None:
        g = 4 if scene.n_triangles >= 32768 else 1
    return max(1, min(g, spp))


def pallas_r_blk(n_lanes: int, r_blk: int) -> int:
    """Largest megakernel grid-block row count <= ``r_blk`` that divides
    the wavefront's lane rows (rows = n_lanes // 128) AND satisfies
    Mosaic's lowering rule: a block's sublane dimension must be
    divisible by 8 or equal the whole array (interpret mode does not
    enforce this — only real-TPU lowering does). 96x64 images give 48
    rows -> 16-row blocks; when no 8-divisible divisor exists (e.g. 20
    rows) the whole wavefront becomes one block."""
    rows = max(1, n_lanes // 128)
    if rows <= r_blk:
        return rows  # block == array: always lowers
    for cand in range(min(r_blk, rows), 7, -1):
        if rows % cand == 0 and cand % 8 == 0:
            return cand
    return rows


def untile_pixels(flat, w, h):
    """Invert the TILE_W x TILE_H tile-coherent lane map.

    ``flat`` has one row per (slot, lane) position in tile order (each
    consecutive block of 512 rows is one pixel tile); returns ``(w*h,
    ...)`` in row-major pixel order, dropping padding positions. The
    single source of truth for the inverse map — render(), the showcase
    tool and the goat probe all go through here (a stale hand-copied
    64x8 unmap once scrambled every mesh showcase image).
    """
    n = flat.shape[0]
    g = np.arange(n, dtype=np.int64)
    blk, within = g // 512, g % 512
    tx = -(-w // TILE_W)
    px = (blk % tx) * TILE_W + within % TILE_W
    py = (blk // tx) * TILE_H + within // TILE_W
    valid = (px < w) & (py < h)
    out = np.zeros((w * h,) + flat.shape[1:], flat.dtype)
    out[py[valid] * w + px[valid]] = flat[valid]
    return out


def unpermute_lanes(sums, perm):
    """Invert a profile-balanced (permuted) lane map on decoded slot
    sums: lane ``l`` of slot ``p`` traced pixel ``perm[l] + p*n``, so
    plain ``reshape`` decoding needs lane ``inv[j]`` at position ``j``
    (``perm[inv[j]] == j``). ``sums`` is ``(n_slots, n, 3)``."""
    perm = np.asarray(perm)
    inv = np.empty(perm.shape[0], np.int64)
    inv[perm] = np.arange(perm.shape[0])
    return np.asarray(sums)[:, inv]


def balanced_base(params: RenderParams, scene: Scene, camera, w, h, spp,
                  n_lanes, n_slots, sample_groups, r_blk, mesh_pallas,
                  base):
    """Resolve the profile-balanced megakernel lane map
    (config.pallas_balance; balance.balanced_base_cached). Returns
    ``(base ids, permuted_base flag)`` — the identity map when the
    feature is off or the scene/config does not qualify."""
    # hard requirements (even under an explicit True): the orbit
    # rotation assumes the contiguous sphere-scene lane space — the
    # mesh megakernel's tiled/padded lane ids are not permutable
    if (mesh_pallas or scene.n_triangles > 0
            or n_lanes % max(sample_groups, 1)):
        return base, False
    want = params.pallas_balance
    if want is None:
        want = (sample_groups > 1
                and jax.default_backend() == "tpu"
                and w * h * spp >= 100_000_000)
    if not want:
        return base, False
    from zraytrace_tpu.balance import balanced_base_cached

    perm, _stats = balanced_base_cached(
        scene, camera, w, h, params.max_depth, n_lanes, n_slots,
        sample_groups, calib_spp=64, seed=params.seed,
        n_bounce=params.pallas_bounces, r_blk=r_blk)
    return jnp.asarray(perm), True


def render(scene: Scene, camera: cam.Camera, params: RenderParams):
    """Render a full image. Returns ``(image (H, W, 3) f32, RenderStats)``.

    Row 0 of the returned array is the image *bottom* (the reference's
    pixel buffer convention; the PNG writer flips, png_image.zig:136).
    Images with more pixels than ``params.max_wavefront`` assign several
    strided pixels per lane (slots); pixel ids stay global so RNG streams
    are layout-invariant.
    """
    import time

    t0 = time.perf_counter()
    w, h, spp = params.width, params.height, params.samples_per_pixel
    n_pixels = w * h
    n_lanes = min(n_pixels, params.max_wavefront)
    n_slots = math.ceil(n_pixels / n_lanes)

    # Flash-intersect kernel: streaming VMEM triangle intersection
    # (ops/flash_intersect.py) — the fast mesh path on real TPUs; the
    # interpreter-mode kernel is slow, so CPU uses the XLA brute path.
    # Triangles are sorted into BVH-leaf order so the kernel's chunk
    # AABBs are spatially tight, and lanes map to 64x8 pixel tiles so
    # ray blocks are coherent enough for chunk culling to bite.
    tri_bvh, tri_flash, mesh_pallas = mesh_routing(params, scene,
                                                  n_pixels)
    tile_coherent = False
    if tri_flash is not None and not mesh_pallas:
        # XLA wavefront path: tile-coherent lanes so the flash
        # kernel's per-block chunk culling bites. The megakernel
        # path keeps the contiguous mapping (its rotated-base
        # interleave needs it; blocked-lane bounce rays are
        # incoherent anyway).
        tile_coherent = True
        padded = (-(-w // TILE_W)) * (-(-h // TILE_H)) * 512
        n_lanes = min(padded, -(-n_lanes // 512) * 512)
        n_slots = math.ceil(padded / n_lanes)

    stats = RenderStats(pixels=n_pixels)
    want_pallas = pallas_wanted(params, scene, n_pixels) or mesh_pallas
    # Megakernel sweet spot: narrower lanes, more slots (config.py).
    # Any cap value works — it rounds down to the kernel's 256-lane grain.
    pl_cap = params.pallas_max_wavefront // 256 * 256
    if want_pallas and pl_cap >= 256 and n_lanes > pl_cap:
        n_lanes = pl_cap
        n_slots = math.ceil(n_pixels / n_lanes)
    if want_pallas and n_lanes % 256:
        # Round the wavefront UP to the kernel's 256-lane grain: padding
        # lanes (pixel ids beyond n_pixels at every slot) idle through
        # the same validity check partial windows use, so counters and
        # pixels are unaffected — any image size gets the megakernel.
        n_lanes = -(-n_lanes // 256) * 256
        n_slots = math.ceil(n_pixels / n_lanes)
    base = jnp.arange(n_lanes, dtype=jnp.int32)
    use_pallas = want_pallas and n_lanes % 256 == 0
    if use_pallas:
        from zraytrace_tpu.ops.bounce_kernel3 import _wavefront_pallas3_jit

        from zraytrace_tpu.scene import material_classes

        g_eff = max(1, min(params.pallas_sample_groups, spp))
        r_eff = pallas_r_blk(n_lanes, params.pallas_r_blk)
        # balance calibration is scene PREPROCESSING (cached on disk —
        # like the BVH build); it must not land in render_seconds
        base, permuted = balanced_base(params, scene, camera, w, h, spp,
                                       n_lanes, n_slots, g_eff, r_eff,
                                       mesh_pallas, base)
        t1 = time.perf_counter()
        sums, counters = _wavefront_pallas3_jit(
            scene, camera, base, params.seed, w, h, spp, params.max_depth,
            0, n_slots, n_lanes, n_pixels,
            n_bounce=params.pallas_bounces,
            r_blk=r_eff,
            sample_groups=g_eff,
            mat_classes=material_classes(scene),
            tri_flash=tri_flash if mesh_pallas else None,
            permuted_base=permuted,
        )
        permuted_ids = base if permuted else None
        # counters are tiny: fetching them first marks DEVICE completion
        # (all outputs materialize together; scalar readback is the
        # reliable sync through the relay — CLAUDE.md); everything after
        # t_dev is host transfer + decode
        totals = np.asarray(counters, np.uint64)
        t_dev = time.perf_counter()
    else:
        permuted_ids = None
        xg = wavefront_groups(params, scene, spp, tile_coherent)
        t1 = time.perf_counter()
        sums, counters = _wavefront_jit(
            scene, camera, base, params.seed, w, h, spp, params.max_depth,
            0, tri_bvh, n_lanes, n_pixels, n_slots, tri_flash,
            tile_coherent, xg,
        )
        totals = np.asarray(counters, np.uint64)  # device sync (above)
        t_dev = time.perf_counter()
        if xg > 1:
            # fold group planes back onto the caller's positions: group
            # g's lane i traced position (i + g*shift) mod n + p*stride
            shf = _interleave_shift(n_lanes, xg, tile_coherent)
            s_np = np.asarray(sums)
            folded = np.zeros((n_slots, n_lanes, 3), s_np.dtype)
            for g in range(xg):
                for p in range(n_slots):
                    folded[p] += np.roll(s_np[g * n_slots + p],
                                         g * shf, axis=0)
            sums = folded
    sums = np.asarray(sums).reshape(n_slots, n_lanes, 3)
    if permuted_ids is not None:
        sums = unpermute_lanes(sums, permuted_ids)
    sums = sums.reshape(n_slots * n_lanes, 3)
    if tile_coherent:
        sums = untile_pixels(sums, w, h)
    else:
        # pixel p lives at (slot p // n_lanes, lane p % n_lanes)
        sums = sums[:n_pixels]
    image_np = (sums / spp).reshape(h, w, 3)
    t2 = time.perf_counter()

    rays, refl, bg, rec, samples, iters = _counters_to_ints(totals)
    stats.rays = rays
    stats.reflections = refl
    stats.background_hits = bg
    stats.recursion_depth_hits = rec
    stats.samples = samples
    stats.wavefront_iterations = iters
    stats.preprocess_seconds = t1 - t0
    stats.render_seconds = t_dev - t1
    stats.transfer_seconds = t2 - t_dev
    return image_np, stats
