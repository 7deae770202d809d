"""Flash-style streaming triangle intersection (Pallas TPU).

The XLA brute-force path materializes (N, C) matmul outputs in HBM
(hundreds of MB per buffer at wavefront sizes); this kernel streams
triangle chunks through VMEM with a running per-ray winner — the
flash-attention structure applied to closest-hit:

- rays live on SUBLANES: a grid block processes (R_rays, 128-tri-chunk)
  tiles entirely in VMEM/registers,
- triangles live on LANES: per-triangle constants are laid out as
  (n_chunks, 128) component planes, so every term of the determinant
  form (triangle.zig:48-71 via the scalar-triple-product decomposition,
  geometry/triangle.py) is a rank-1 broadcast multiply — pure VPU, no
  MXU (measured unusable here: ~0.36 TFLOP/s f32, tools/flash2_probe.py),
- **work-list chunk culling** (round 3): triangles are sorted into
  spatially tight chunks (BVH-leaf order) and each chunk carries an
  AABB. Round 2 guarded each chunk with lax.cond inside the kernel, but
  Mosaic does NOT skip a cond body (an all-cullable workload still ran
  at ~60% cost, tools/flash2_probe.py), capping the win at 1.34x.
  Mosaic DOES honor data-dependent ``while_loop`` trip counts (the
  bounce megakernel's dynamic exit threshold is measured doing exactly
  that), so the kernel now runs a cheap scalar pre-scan — a
  conservative interval test of the block's ray bounds vs each chunk
  AABB — that compacts reachable chunk ids into an SMEM work list
  (branch-free: store unconditionally at the write cursor, advance the
  cursor only when reachable), then a while_loop executes the heavy
  vector body over exactly that list. Skipped chunks cost ~50 scalar
  ops instead of the full (R x 128) VPU tile. (A front-to-back
  counting-sorted list with a max(t_best) early-exit cond was measured
  SLOWER on both teapot and goat — the per-chunk cross-lane max plus
  the extra scalar passes outweigh pruning, which rarely fires because
  one sky/ground ray keeps the block cap huge.) With tile-coherent ray
  blocks (render.py) primary rays touch ~5% of the teapot's chunks,
  bounce rays ~50%,
- **sphere-seeded t_max** (round 3): callers that intersect spheres
  first pass the per-ray sphere distance as ``t_init``; it seeds the
  running winner (triangles beyond the sphere lose anyway, and exact
  ties keep going to the sphere because the winner test is strict) and
  its block max caps the chunk reachability window — the reference's
  t_max tightening (raytrace.zig:79, bvh.zig:196-203) applied across
  primitive types,
- outputs one packed (R, 8) row per ray: [t, u, v, orig_idx, hit, ...].

Semantics match intersect_triangles exactly (same one-sidedness, same
first-wins tie-break — the chunk order changes, so ties between
DIFFERENT triangles at bit-equal t may pick differently; exact ties of
distinct triangles do not occur in the reference scenes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zraytrace_tpu import vecmath as vm

# plain python floats: jnp scalars would be captured device constants,
# which pallas kernels reject
_BIG = 3.4e38
DET_EPS = 1e-6

import os as _os

LANE = 128
# rays (sublanes) per grid block. Callers align ray counts to 512, so
# any divisor of 512 is safe; smaller blocks cull chunks more tightly
# (the per-block reachable-chunk union shrinks) at more per-block fixed
# cost. With the exact XLA work lists 128 won the teapot sweep
# (5.07M vs 4.86M at 256, 4.80M at 64; PERF.md round 3).
R_RAYS = int(_os.environ.get("ZRAYTRACE_FLASH_RAYS", "128"))
assert 512 % R_RAYS == 0, R_RAYS
# exact XLA-side per-ray chunk culling (see _ray_chunk_worklists) vs
# the in-kernel conservative interval prescan
_XLA_WL = _os.environ.get("ZRAYTRACE_FLASH_XLA_WL", "1") == "1"
# timing probe (bench only): force every work list empty to measure the
# non-intersection share of the wall; hits vanish, images go wrong
_NOWORK = _os.environ.get("ZRAYTRACE_FLASH_NOWORK", "0") == "1"
# more bench-only ablations (image wrong, timing decomposition only):
# _SKIP returns the seeded winner without prepass or kernel (isolates
# the XLA wavefront body); _NOPRE feeds a full dense work list without
# computing reachability (isolates the prepass cost).
_SKIP = _os.environ.get("ZRAYTRACE_FLASH_SKIP", "0") == "1"
_NOPRE = _os.environ.get("ZRAYTRACE_FLASH_NOPRE", "0") == "1"
# _SKIPK keeps the prepass AND produces data-dependent fake winners (so
# the caller's attribute/merge path stays live) but never invokes the
# pallas kernel — isolates the kernel's in-context cost.
_SKIPK = _os.environ.get("ZRAYTRACE_FLASH_SKIPK", "0") in ("1", "2")
# RAYS-ON-LANES kernel variant (DEFAULT; round 3): profiling showed the
# XLA graph around the custom call costs ~8 ms/iteration vs ~1.5 ms for
# the same logical ops without it — the call's narrow (n, 3)/(n, 8)
# operands pin padded minor-dim-3/8 layouts on the surrounding fusions
# (2-6% lane utilization). The RL kernel swaps the axes: rays on LANES
# (operands are dense (n/128, 1, 128) component planes), triangle
# chunks on SUBLANES (planes repacked per chunk as (128, 1) columns),
# output a dense (n/128, 8, 128) block — no narrow tensor crosses the
# boundary. Teapot official: 5.98M -> 10.10M rays/s (856x reference).
_RL = _os.environ.get("ZRAYTRACE_FLASH_RL", "1") == "1"
# max chunks for the (C, 128, N_COMP) RL row packing (~66 KB VMEM per
# chunk after lane padding)
_RL_ROWS_MAX_CHUNKS = int(_os.environ.get("ZRAYTRACE_FLASH_RL_ROWS", "1400"))

# packed triangle component planes, each (n_chunks, 128):
# e1(3) e2(3) fn(3) e2xa(3) e1xa(3) a_dot_fn(1) valid(1) orig_id(1)
N_COMP = 18

# Two-level chunk culling (round 3): above _GRP_MIN_CHUNKS chunks,
# consecutive BVH-ordered chunks are grouped _GRP at a time under a
# group AABB; the exact per-ray slab test runs at GROUP granularity
# (C/_GRP wide) and the kernel expands each reachable group with an
# unrolled inner loop over its _GRP chunks. Culling a group no ray in
# the block can reach inside its own (t_min, t_init] window cannot
# change any winner (same argument as per-chunk lists).
# DEFAULT OFF (hardware-measured LOSS on the goat-class probe:
# 612k -> 416k rays/s at GRP=8, 491k at GRP=4 — chunk-visit inflation
# from group expansion outweighs the prepass/argsort savings because
# the prepass is only ~10% of goat wall; PERF.md round 3).
_GRP = int(_os.environ.get("ZRAYTRACE_FLASH_GRP", "0"))
_GRP_MIN_CHUNKS = int(_os.environ.get("ZRAYTRACE_FLASH_GRP_MIN", "256"))

# Ray sorting (round 3): at goat scale the kernel cost is the per-block
# reachable-chunk UNION — 128 incoherent bounce rays each drag their
# own chunks into the block's work list. Sorting rays by origin morton
# cell + direction octant before the call groups rays whose reachable
# sets overlap; inputs are permuted, outputs inverse-permuted (winner
# values are ray-local, so results are exactly permutation-invariant).
# Costs two argsorts + ~12 n-row gathers per call (~7 ms at 131k lanes)
# — noise next to goat-scale chunk streaming, a loss at teapot scale,
# so it engages above _SORT_MIN_CHUNKS chunks only.
_SORT_MIN_CHUNKS = int(_os.environ.get("ZRAYTRACE_FLASH_SORT_MIN", "256"))
_SORT = _os.environ.get("ZRAYTRACE_FLASH_SORT", "1") == "1"
# Near-ordered work lists + in-kernel early exit (round 5, verdict
# item 2): block work lists sort by earliest entry distance (the SAME
# argsort the compaction already pays, different key) and the RL visit
# loop stops when the next entry distance exceeds every ray's current
# winner. Engages with the same chunk-count gate as the ray sort.
_NEAR_EXIT = _os.environ.get("ZRAYTRACE_FLASH_NEAR_EXIT", "0") == "1"
# "reach": sort rays by the centroid of their own reachable-chunk set
# (the exact signal the block union depends on — computed from the
# reach matrix the prepass produces anyway). "morton": origin cell +
# direction octant (cheaper key, weaker clustering).
_SORT_MODE = _os.environ.get("ZRAYTRACE_FLASH_SORT_MODE", "reach")

# Conservative two-phase occlusion culling (round 3): the per-ray
# reachability window (t_min, t_init] is capped by the closest SPHERE
# only — at goat scale (25 occluding sub-meshes) a bounce ray credits
# reachability to every chunk along its line all the way to the ground
# sphere, so the work lists cull only ~40% of visits (hardware
# ablation). Phase 1 intersects a 1/_COARSE_STEP systematic sample of
# the triangles (a SUBSET, so its hit t is a VALID upper bound on the
# true winner's t — subset hits are real hits); the tightened cap
# feeds phase 2's reachability while the running winner still starts
# at the sphere seed, so outputs are unchanged. Rays that slip through
# the subset's holes keep the sphere cap (conservative, never wrong).
# DEFAULT OFF (hardware-measured LOSS on the goat-class probe: 1455k
# (sort only) -> 1299k rays/s with coarse16 — the phase-1 kernel +
# its prepass cost more than the visit reduction buys; PERF.md r3).
_COARSE = _os.environ.get("ZRAYTRACE_FLASH_COARSE", "0") == "1"
_COARSE_STEP = int(_os.environ.get("ZRAYTRACE_FLASH_COARSE_STEP", "16"))
_COARSE_MIN_CHUNKS = int(_os.environ.get("ZRAYTRACE_FLASH_COARSE_MIN",
                                         "256"))


class TriPlanes(NamedTuple):
    planes: jnp.ndarray  # (N_COMP, n_chunks, 128) f32
    bounds: jnp.ndarray  # (n_chunks, 8) f32 chunk AABB [lo3, hi3, 0, 0]
    n_tris: int
    # rays-on-lanes marker (non-None only when ZRAYTRACE_FLASH_RL=1 at
    # pack time): the RL kernel reads ``planes`` directly with one
    # in-kernel (18, 128) -> (128, 18) transpose per chunk.
    planes_rl: jnp.ndarray = None
    # Optional (n_chunks*128, 4) [unit_fn xyz, mat_id] table indexed by
    # PACKED SORTED id (chunk*128 + lane). Present only for
    # const-material meshes (no textured triangle materials — true for
    # every reference scene): its presence statically (pytree
    # structure) switches the kernel to a lean winner reduction (no
    # u/v picks, and the winner id is chunk*128+lane — a scalar+iota
    # expression instead of a third cross-lane masked-sum reduction)
    # and lets trace_closest fetch the hit normal + material with ONE
    # gather row instead of four (TPU gathers cost ~5 ns per ROW
    # regardless of width, PERF.md).
    attrs: jnp.ndarray = None
    # Optional (n_groups, 8) group AABBs over _GRP consecutive chunks
    # (two-level culling, see _GRP above). Non-None only when the mesh
    # exceeded _GRP_MIN_CHUNKS chunks at pack time; the group size is
    # recovered statically as ceil(n_chunks / n_groups).
    group_bounds: jnp.ndarray = None
    # Optional nested TriPlanes over a 1/_COARSE_STEP triangle subset
    # (conservative occlusion cap, see _COARSE above).
    coarse: "TriPlanes" = None


def pack_tri_planes(a, b, c, order=None, tri_mat=None,
                    const_materials=False) -> TriPlanes:
    """Host/trace-time packing of per-triangle constants into lane
    planes. ``order`` (e.g. a BVH's prim_order) sorts triangles into
    spatially tight chunks so chunk AABBs cull well; the original
    triangle id rides along as a plane so callers always see original
    indices. Padding triangles have valid=0 (and fn=0 => det=0).

    ``tri_mat`` + ``const_materials=True`` additionally pack the (T, 4)
    attrs table (see TriPlanes). The unit normal is normalize_safe(
    cross(b-a, c-a)) — the exact f32 ops triangle_surface performs per
    ray (triangle.zig:44-46,67-69), so results are bit-identical."""
    T = a.shape[0]
    if order is not None:
        order = jnp.asarray(order, jnp.int32)
        a, b, c = a[order], b[order], c[order]
        orig = order.astype(jnp.float32)
    else:
        orig = jnp.arange(T, dtype=jnp.float32)
    n_chunks = -(-T // LANE)
    pad = n_chunks * LANE - T

    def p3(x):
        return jnp.concatenate([x, jnp.zeros((pad, 3), x.dtype)], axis=0)

    a_, b_, c_ = p3(a), p3(b), p3(c)
    e1 = b_ - a_
    e2 = c_ - a_
    fn = vm.cross(e1, e2)
    e2xa = vm.cross(e2, a_)
    e1xa = vm.cross(e1, a_)
    adf = vm.dot(a_, fn)
    valid = jnp.concatenate(
        [jnp.ones((T,), jnp.float32), jnp.zeros((pad,), jnp.float32)]
    )
    orig = jnp.concatenate([orig, jnp.zeros((pad,), jnp.float32)])
    comps = [e1[:, 0], e1[:, 1], e1[:, 2],
             e2[:, 0], e2[:, 1], e2[:, 2],
             fn[:, 0], fn[:, 1], fn[:, 2],
             e2xa[:, 0], e2xa[:, 1], e2xa[:, 2],
             e1xa[:, 0], e1xa[:, 1], e1xa[:, 2],
             adf, valid, orig]
    planes = jnp.stack([comp.reshape(n_chunks, LANE) for comp in comps])

    # chunk AABBs; padding rows inherit the last real triangle's bounds
    lo = jnp.minimum(jnp.minimum(a_, b_), c_)
    hi = jnp.maximum(jnp.maximum(a_, b_), c_)
    if pad:
        lo = lo.at[T:].set(lo[T - 1])
        hi = hi.at[T:].set(hi[T - 1])
    lo_c = lo.reshape(n_chunks, LANE, 3).min(axis=1)
    hi_c = hi.reshape(n_chunks, LANE, 3).max(axis=1)
    bounds = jnp.concatenate(
        [lo_c, hi_c, jnp.zeros((n_chunks, 2), jnp.float32)], axis=1)

    attrs = None
    if tri_mat is not None and const_materials:
        # packed-sorted-id attrs table: row chunk*128+lane describes the
        # triangle at that kernel position. The unit normal repeats the
        # exact f32 ops triangle_surface performs per ray
        # (triangle.zig:44-46,67-69) so renders are bit-identical;
        # padding rows are never winners (valid=0 => no hit).
        fn_unit = vm.normalize_safe(vm.cross(b_ - a_, c_ - a_))
        tm = jnp.asarray(tri_mat, jnp.float32)
        if order is not None:
            tm = tm[order]
        tm = jnp.concatenate([tm, jnp.zeros((pad,), jnp.float32)])
        attrs = jnp.concatenate([fn_unit, tm[:, None]], axis=1)
    # RL packing: (C, 128, N_COMP) rows — chunk ci reads as a direct
    # (128, N_COMP) block, components as (128, 1) column slices, no
    # in-kernel transpose. The lane dim pads N_COMP->128 in VMEM
    # (~66 KB/chunk), fitting ~1500 chunks (~190k triangles) in the
    # 100 MB budget; beyond that a 1-element marker makes the kernel
    # read the dense (N_COMP, C, 128) planes with one (18,128)->(128,18)
    # transpose per chunk visit.
    planes_rl = None
    if _RL:
        if n_chunks <= _RL_ROWS_MAX_CHUNKS:
            planes_rl = jnp.transpose(planes, (1, 2, 0))
        else:
            planes_rl = jnp.zeros((1,), jnp.float32)
    # two-level culling: group AABBs over _GRP consecutive chunks
    group_bounds = None
    if n_chunks >= _GRP_MIN_CHUNKS and _GRP > 1:
        n_groups = -(-n_chunks // _GRP)
        gpad = n_groups * _GRP - n_chunks
        lo_g = jnp.concatenate(
            [lo_c, jnp.broadcast_to(lo_c[-1:], (gpad, 3))], axis=0
        ).reshape(n_groups, _GRP, 3).min(axis=1)
        hi_g = jnp.concatenate(
            [hi_c, jnp.broadcast_to(hi_c[-1:], (gpad, 3))], axis=0
        ).reshape(n_groups, _GRP, 3).max(axis=1)
        group_bounds = jnp.concatenate(
            [lo_g, hi_g, jnp.zeros((n_groups, 2), jnp.float32)], axis=1)
    # conservative occlusion cap: systematic triangle subsample (packed
    # lean — a zero attrs table skips the u/v reductions; only its t is
    # consumed). Sampled AFTER the BVH ordering so coarse chunks stay
    # spatially tight.
    coarse = None
    if _COARSE and n_chunks >= _COARSE_MIN_CHUNKS and _COARSE_STEP > 1:
        ca, cb, cc = (x[:T][::_COARSE_STEP] for x in (a_, b_, c_))
        coarse = pack_tri_planes(
            ca, cb, cc, tri_mat=jnp.zeros((ca.shape[0],), jnp.float32),
            const_materials=True)
    return TriPlanes(planes=planes, bounds=bounds, n_tris=T,
                     planes_rl=planes_rl, attrs=attrs,
                     group_bounds=group_bounds, coarse=coarse)


def _ray_chunk_reach(bounds, o, d, ti, t_min):
    """EXACT per-ray chunk reachability ``(n, C)`` bool: per (ray,
    chunk) a slab test of the chunk AABB against the ray's own window
    (t_min, t_init]. The in-kernel scalar prescan (see _kernel) is
    conservative over the block's ORIGIN x DIRECTION interval family —
    for bounce blocks the direction interval spans zero on every axis,
    so it degenerates to "everything within t_cap" and one sky ray
    keeps t_cap huge. The exact per-ray test is dramatically tighter
    for rays far from the mesh (it subtends a small solid angle
    there)."""
    lo = bounds[None, :, 0:3]
    hi = bounds[None, :, 3:6]
    # |d| < 1e-30 (incl. +-0) is replaced by +1e-30: movement along such
    # an axis within any in-scene t is negligible either way, so the
    # test degenerates to "origin inside slab" — conservative (see near
    # <= far with +-huge candidates), never excludes a reachable chunk.
    safe_d = jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
    # NOTE: a per-axis (n, C)-plane accumulation variant was A/B'd and
    # measured SLOWER on hardware (70.2s vs 68.9s teapot) — XLA fuses
    # this (n, C, 3) form better. Keep it.
    inv = (1.0 / safe_d)[:, None, :]
    t1 = (lo - o[:, None, :]) * inv  # (n, C, 3)
    t2 = (hi - o[:, None, :]) * inv
    near = jnp.max(jnp.minimum(t1, t2), axis=-1)
    far = jnp.min(jnp.maximum(t1, t2), axis=-1)
    return (near <= far) & (far > t_min) & (near <= ti[:, None])


def _ray_chunk_reach_near(bounds, o, d, ti, t_min):
    """`_ray_chunk_reach` plus the per-(ray, chunk) entry distance
    ``near`` (meaningful only where reach is True)."""
    lo = bounds[None, :, 0:3]
    hi = bounds[None, :, 3:6]
    safe_d = jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
    inv = (1.0 / safe_d)[:, None, :]
    t1 = (lo - o[:, None, :]) * inv
    t2 = (hi - o[:, None, :]) * inv
    near = jnp.max(jnp.minimum(t1, t2), axis=-1)
    far = jnp.min(jnp.maximum(t1, t2), axis=-1)
    reach = (near <= far) & (far > t_min) & (near <= ti[:, None])
    return reach, near


def _block_worklists_near(reach, near, n_blocks):
    """NEAR-ORDERED work lists (round 5): like `_block_worklists` but
    each block's reachable chunk ids are sorted by the block's earliest
    entry distance (min over its reaching rays of ``near``) instead of
    ascending id — the same single argsort, a different key. Visiting
    near chunks first lets the kernel's running winner tighten early so
    the in-kernel early exit (``_kernel_rl`` near_ref) can cut the tail
    of the list: once the sorted entry distance exceeds every ray's
    current winner, no remaining chunk can produce a strictly closer
    hit. Returns ``(wl, n_work, near_sorted)``; near_sorted is +inf
    past n_work. Chunk-visit ORDER changes, so bit-equal-t ties between
    DISTINCT triangles may resolve differently (the same borderline
    class as chunked dispatch, PERF.md round 4); exact ties do not
    occur in the reference scenes."""
    C = reach.shape[1]
    reach_r = reach.reshape(n_blocks, -1, C)
    reach_b = jnp.any(reach_r, axis=1)
    n_work = jnp.sum(reach_b, axis=1, dtype=jnp.int32)[:, None]
    if _NOWORK:
        n_work = jnp.zeros_like(n_work)
    INF = jnp.float32(3.4e38)
    near_b = jnp.min(
        jnp.where(reach_r, near.reshape(n_blocks, -1, C), INF), axis=1)
    key = jnp.where(reach_b, near_b, INF)
    wl = jnp.argsort(key, axis=1, stable=True).astype(jnp.int32)
    near_sorted = jnp.take_along_axis(key, wl, axis=1)
    return wl, n_work, near_sorted


def _block_worklists(reach, n_blocks):
    """OR-reduce per-ray reachability over ray blocks and compact into
    SMEM work lists: (wl (n_blocks, C) i32 — reachable chunk ids first,
    ascending; n_work (n_blocks, 1) i32). Skipping a chunk no ray in
    the block can reach inside its own (t_min, t_init] window cannot
    change any winner: a seeded winner is only displaced by a strictly
    closer hit, and hits need t <= far and t > t_min."""
    C = reach.shape[1]
    reach_b = jnp.any(reach.reshape(n_blocks, -1, C), axis=1)
    n_work = jnp.sum(reach_b, axis=1, dtype=jnp.int32)[:, None]
    if _NOWORK:
        n_work = jnp.zeros_like(n_work)
    # stable argsort on ~reach puts reachable ids first, ascending
    wl = jnp.argsort(~reach_b, axis=1, stable=True).astype(jnp.int32)
    return wl, n_work


def _ray_chunk_worklists(bounds, o, d, ti, t_min, n_blocks):
    """reach + block compaction (see _ray_chunk_reach/_block_worklists)."""
    return _block_worklists(
        _ray_chunk_reach(bounds, o, d, ti, t_min), n_blocks)


def _kernel(*refs, need_uv=True, xla_wl=False):
    if xla_wl:
        (planes_ref, o_ref, d_ref, ti_ref, tmin_ref, wl_in, nw_ref,
         out_ref) = refs
    else:
        (planes_ref, bounds_ref, o_ref, d_ref, ti_ref, tmin_ref,
         out_ref, wl_ref) = refs
    n_chunks = planes_ref.shape[1]
    t_min = tmin_ref[0]
    t_init = ti_ref[:, 0]

    if xla_wl:
        # work list precomputed in XLA (_ray_chunk_worklists): exact
        # per-ray reachability OR-reduced per block, delivered via SMEM
        n_work = nw_ref[0, 0, 0]
        read_wl = lambda i: wl_in[0, 0, i]
        return _winner_scan(planes_ref, o_ref, d_ref, read_wl, n_work,
                            t_min, t_init, out_ref, need_uv)
    t_cap = jnp.max(t_init)

    # conservative per-block ray bounds for chunk culling: the block's
    # rays all start inside [omin, omax] with direction components
    # inside [dmin, dmax]; a chunk whose AABB the whole interval family
    # cannot reach before t_cap is excluded from the work list.
    omin = [jnp.min(o_ref[:, k]) for k in range(3)]
    omax = [jnp.max(o_ref[:, k]) for k in range(3)]
    dmin = [jnp.min(d_ref[:, k]) for k in range(3)]
    dmax = [jnp.max(d_ref[:, k]) for k in range(3)]

    def chunk_interval(ci):
        near = jnp.float32(0.0)
        far = t_cap
        for ax in range(3):
            lo = bounds_ref[ci, ax]
            hi = bounds_ref[ci, 3 + ax]
            dl, dh = dmin[ax], dmax[ax]
            # numerator intervals of (bound - o)
            n1a = lo - omax[ax]
            n1b = lo - omin[ax]
            n2a = hi - omax[ax]
            n2b = hi - omin[ax]
            # if the direction interval spans 0 this axis constrains
            # nothing (conservative)
            spans = (dl <= 0.0) & (dh >= 0.0)
            inv_l = 1.0 / jnp.where(spans, 1.0, dl)
            inv_h = 1.0 / jnp.where(spans, 1.0, dh)
            c0 = n1a * inv_l
            c1 = n1a * inv_h
            c2 = n1b * inv_l
            c3 = n1b * inv_h
            c4 = n2a * inv_l
            c5 = n2a * inv_h
            c6 = n2b * inv_l
            c7 = n2b * inv_h
            ax_near = jnp.minimum(
                jnp.minimum(jnp.minimum(c0, c1), jnp.minimum(c2, c3)),
                jnp.minimum(jnp.minimum(c4, c5), jnp.minimum(c6, c7)))
            ax_far = jnp.maximum(
                jnp.maximum(jnp.maximum(c0, c1), jnp.maximum(c2, c3)),
                jnp.maximum(jnp.maximum(c4, c5), jnp.maximum(c6, c7)))
            near = jnp.where(spans, near, jnp.maximum(near, ax_near))
            far = jnp.where(spans, far, jnp.minimum(far, ax_far))
        return near, far

    # scalar pre-scan: compact reachable chunk ids into the SMEM work
    # list. Branch-free: store at the cursor every step, advance the
    # cursor only on reachable — unreachable candidates are overwritten
    # by the next store and slots past n_work are never read.
    def scan_body(ci, j):
        near, far = chunk_interval(ci)
        wl_ref[j] = ci
        return j + (near <= far).astype(jnp.int32)

    n_work = jax.lax.fori_loop(0, n_chunks, scan_body, jnp.int32(0))
    return _winner_scan(planes_ref, o_ref, d_ref, lambda i: wl_ref[i],
                        n_work, t_min, t_init, out_ref, need_uv)


def _winner_scan(planes_ref, o_ref, d_ref, read_wl, n_work, t_min,
                 t_init, out_ref, need_uv):
    R = o_ref.shape[0]
    ox = o_ref[:, 0:1]  # (R, 1) broadcast against (1, 128) tri planes
    oy = o_ref[:, 1:2]
    oz = o_ref[:, 2:3]
    dx = d_ref[:, 0:1]
    dy = d_ref[:, 1:2]
    dz = d_ref[:, 2:3]
    # o x d per ray
    pxv = oy * dz - oz * dy
    pyv = oz * dx - ox * dz
    pzv = ox * dy - oy * dx

    # COLUMNWISE running winners (round 3): the per-chunk cross-lane
    # min + lane_of_min reductions (plus three masked-sum picks in uv
    # mode) were ~1/3 of the chunk body. Each lane COLUMN now tracks
    # its own best-t (strict <, so the earliest chunk keeps ties within
    # a column) and the cross-lane reduction happens ONCE per block
    # after the chunk loop. The winning (t, id, u, v) values are
    # bit-identical to the per-chunk form (min is exact and the same
    # candidates compete); only which of two bit-equal-t DISTINCT
    # triangles wins can change (lane-first instead of chunk-first
    # order) — exact ties of distinct triangles do not occur in the
    # reference scenes (module docstring).
    shape = (R, LANE)
    tb0 = jnp.zeros(shape, jnp.float32) + t_init[:, None]

    def work_body(carry):
        if need_uv:
            i, tb, ub, vb, ob = carry
        else:
            i, tb, cb = carry
        ci = read_wl(i)
        pr = lambda k: planes_ref[k, ci, :][None, :]  # (1, 128)
        e1x, e1y, e1z = pr(0), pr(1), pr(2)
        e2x, e2y, e2z = pr(3), pr(4), pr(5)
        fnx, fny, fnz = pr(6), pr(7), pr(8)
        qax, qay, qaz = pr(9), pr(10), pr(11)  # e2 x a
        rax, ray_, raz = pr(12), pr(13), pr(14)  # e1 x a
        adf = pr(15)

        det = -(dx * fnx + dy * fny + dz * fnz)
        safe = jnp.abs(det) > 1e-12
        inv_det = 1.0 / jnp.where(safe, det, 1.0)
        # u = (oxd).e2 - d.(e2 x a); v = -((oxd).e1 - d.(e1 x a))
        u = (pxv * e2x + pyv * e2y + pzv * e2z
             - (dx * qax + dy * qay + dz * qaz)) * inv_det
        v = -(pxv * e1x + pyv * e1y + pzv * e1z
              - (dx * rax + dy * ray_ + dz * raz)) * inv_det
        t = (ox * fnx + oy * fny + oz * fnz - adf) * inv_det
        # the padding-triangle `valid` plane is not tested: padding rows
        # pack fn = 0, so det = -(d . 0) = +-0 < DET_EPS never hits.
        # tb tightens the window across chunks like the reference's
        # recursive t_max tightening (bvh.zig:196-203), per column.
        better = ((det >= DET_EPS) & (t > t_min)
                  & (u >= 0.0) & (v >= 0.0)
                  & (u + v <= 1.0) & (t < tb))
        tb = jnp.where(better, t, tb)
        if need_uv:
            ub = jnp.where(better, u, ub)
            vb = jnp.where(better, v, vb)
            ob = jnp.where(better, jnp.zeros(shape) + pr(17), ob)
            return i + 1, tb, ub, vb, ob
        cb = jnp.where(better, ci, cb)
        return i + 1, tb, cb

    fzs = lambda: jnp.zeros(shape, jnp.float32)
    if need_uv:
        init = (jnp.int32(0), tb0, fzs(), fzs(), fzs())
        _, tb, ub, vb, ob = jax.lax.while_loop(
            lambda c: c[0] < n_work, work_body, init)
        cb = None
    else:
        init = (jnp.int32(0), tb0, jnp.zeros(shape, jnp.int32))
        _, tb, cb = jax.lax.while_loop(
            lambda c: c[0] < n_work, work_body, init)

    # one cross-lane reduction pass per block
    t_best = jnp.min(tb, axis=1)  # (R,)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    sel = tb == t_best[:, None]  # may tie; lowest packed id wins below
    if need_uv:
        # ORIGINAL ids + uv mode: the winning column's u/v/orig values
        # (tracked columnwise) are picked with masked-sum reductions —
        # once per block, not per chunk
        lane_of_min = jnp.min(
            jnp.where(sel, lane_ids, jnp.int32(LANE)), axis=1,
            keepdims=True)
        sel2 = lane_ids == lane_of_min
        pick = lambda x: jnp.sum(jnp.where(sel2, x, 0.0), axis=1)
        u_best = pick(ub)
        v_best = pick(vb)
        i_best = pick(ob).astype(jnp.int32)
    else:
        # attrs fast path: the winner id IS the packed sorted id
        # chunk*128 + lane; ties resolve to the lowest packed id
        idc = cb * LANE + lane_ids
        i_best = jnp.min(
            jnp.where(sel, idc, jnp.int32(0x7FFFFFFF)), axis=1)
        u_best = jnp.zeros((R,), jnp.float32)
        v_best = jnp.zeros((R,), jnp.float32)
    hit = (t_best < t_init).astype(jnp.float32)
    out_ref[:] = jnp.stack(
        [t_best, u_best, v_best, i_best.astype(jnp.float32), hit,
         jnp.zeros_like(t_best), jnp.zeros_like(t_best), jnp.zeros_like(t_best)],
        axis=-1,
    )


def _kernel_rl(planes_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
               dz_ref, ti_ref, tmin_ref, wl_in, nw_ref, *rest,
               need_uv=True, use_cols=False, grp=1, n_chunks=0,
               near_exit=False):
    """Rays-on-lanes winner scan (see _RL): one grid block = 128 rays
    as a dense (1, 128) lane row; triangle chunks stream as (128, 1)
    sublane columns; the winner state is (128 tri-slots, 128 rays) and
    the final reduction runs over SUBLANES. Same arithmetic as
    _winner_scan — values bit-identical, only bit-equal-t ties between
    DISTINCT triangles can resolve differently (sublane-first).

    ``grp > 1``: two-level mode — work-list entries are GROUP ids and
    each visit unrolls the group's ``grp`` chunks (see _GRP). Ragged
    tail groups clamp to the last chunk; revisiting a chunk cannot
    change winners (strict ``t < tb``).

    ``near_exit`` (round 5): work lists are NEAR-ORDERED
    (_block_worklists_near) and an extra SMEM input carries the sorted
    block entry distances; the visit loop stops once the next entry
    distance exceeds every ray's current winner (max over rays of the
    column-min of tb) — no remaining chunk can then beat any winner
    (each ray's own entry distance is >= the block min, and a hit in a
    chunk needs t >= that ray's entry distance)."""
    if near_exit:
        near_ref, out_ref = rest
    else:
        (out_ref,) = rest
    t_min = tmin_ref[0]
    n_work = nw_ref[0, 0, 0]
    row = lambda r: r[0, 0, :][None, :]  # (1, 128) rays on lanes
    ox, oy, oz = row(ox_ref), row(oy_ref), row(oz_ref)
    dx, dy, dz = row(dx_ref), row(dy_ref), row(dz_ref)
    ti = row(ti_ref)
    pxv = oy * dz - oz * dy
    pyv = oz * dx - ox * dz
    pzv = ox * dy - oy * dx

    shape = (LANE, LANE)  # (tri sublane, ray lane)
    tb0 = jnp.zeros(shape, jnp.float32) + ti

    def visit(ci, tb, ub, vb, ob, cb):
        if use_cols:
            blk_t = planes_ref[ci]  # (128, N_COMP) row block
        else:
            # giant meshes: dense planes + one transpose per visit
            blk_t = planes_ref[:, ci, :].T  # (128, 18)
        pr = lambda k: blk_t[:, k:k + 1]
        e1x, e1y, e1z = pr(0), pr(1), pr(2)
        e2x, e2y, e2z = pr(3), pr(4), pr(5)
        fnx, fny, fnz = pr(6), pr(7), pr(8)
        qax, qay, qaz = pr(9), pr(10), pr(11)
        rax, ray_, raz = pr(12), pr(13), pr(14)
        adf = pr(15)

        det = -(dx * fnx + dy * fny + dz * fnz)
        safe = jnp.abs(det) > 1e-12
        inv_det = 1.0 / jnp.where(safe, det, 1.0)
        u = (pxv * e2x + pyv * e2y + pzv * e2z
             - (dx * qax + dy * qay + dz * qaz)) * inv_det
        v = -(pxv * e1x + pyv * e1y + pzv * e1z
              - (dx * rax + dy * ray_ + dz * raz)) * inv_det
        t = (ox * fnx + oy * fny + oz * fnz - adf) * inv_det
        better = ((det >= DET_EPS) & (t > t_min)
                  & (u >= 0.0) & (v >= 0.0)
                  & (u + v <= 1.0) & (t < tb))
        tb = jnp.where(better, t, tb)
        if need_uv:
            ub = jnp.where(better, u, ub)
            vb = jnp.where(better, v, vb)
            ob = jnp.where(better, jnp.zeros(shape) + pr(17), ob)
        else:
            cb = jnp.where(better, ci, cb)
        return tb, ub, vb, ob, cb

    wl_width = wl_in.shape[2]

    def cont_flag(i2, tb):
        """True while position i2 exists AND its (near-sorted) entry
        distance can still beat some ray's current winner."""
        in_range = i2 < n_work
        cap = jnp.max(jnp.min(tb, axis=0))  # best-so-far, worst ray
        nxt = near_ref[0, 0, jnp.minimum(i2, wl_width - 1)]
        return in_range & (nxt <= cap)

    def work_body(carry):
        if need_uv:
            i, tb, ub, vb, ob = carry[:5]
            cb = None
        else:
            i, tb, cb = carry[:3]
            ub = vb = ob = None
        wi = wl_in[0, 0, i]
        if grp > 1:
            for j in range(grp):
                ci = jnp.minimum(wi * grp + j, n_chunks - 1)
                tb, ub, vb, ob, cb = visit(ci, tb, ub, vb, ob, cb)
        else:
            tb, ub, vb, ob, cb = visit(wi, tb, ub, vb, ob, cb)
        if need_uv:
            out = (i + 1, tb, ub, vb, ob)
        else:
            out = (i + 1, tb, cb)
        if near_exit:
            out = out + (cont_flag(i + 1, tb),)
        return out

    if near_exit:
        cond = lambda c: c[-1]
    else:
        cond = lambda c: c[0] < n_work

    fzs = lambda: jnp.zeros(shape, jnp.float32)
    if need_uv:
        init = (jnp.int32(0), tb0, fzs(), fzs(), fzs())
        if near_exit:
            init = init + (cont_flag(jnp.int32(0), tb0),)
        fin = jax.lax.while_loop(cond, work_body, init)
        _, tb, ub, vb, ob = fin[:5]
        cb = None
    else:
        init = (jnp.int32(0), tb0, jnp.zeros(shape, jnp.int32))
        if near_exit:
            init = init + (cont_flag(jnp.int32(0), tb0),)
        fin = jax.lax.while_loop(cond, work_body, init)
        _, tb, cb = fin[:3]

    # one cross-SUBLANE reduction pass per block
    t_best = jnp.min(tb, axis=0, keepdims=True)  # (1, 128)
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    sel = tb == t_best
    if need_uv:
        sub_of_min = jnp.min(
            jnp.where(sel, sub_ids, jnp.int32(LANE)), axis=0,
            keepdims=True)
        sel2 = sub_ids == sub_of_min
        pick = lambda x: jnp.sum(jnp.where(sel2, x, 0.0), axis=0,
                                 keepdims=True)
        u_best = pick(ub)
        v_best = pick(vb)
        i_best = pick(ob)
    else:
        idc = cb * LANE + sub_ids
        i_best = jnp.min(
            jnp.where(sel, idc, jnp.int32(0x7FFFFFFF)), axis=0,
            keepdims=True).astype(jnp.float32)
        u_best = jnp.zeros((1, LANE), jnp.float32)
        v_best = jnp.zeros((1, LANE), jnp.float32)
    hit = (t_best < ti).astype(jnp.float32)
    zr = jnp.zeros((1, LANE), jnp.float32)
    out_ref[0] = jnp.concatenate(
        [t_best, u_best, v_best, i_best, hit, zr, zr, zr], axis=0)


def _ray_sort_perm(bounds, o, d):
    """Coherence permutation: origin morton cell (6 bits/axis over the
    mesh AABB) then direction octant. Stable, so equal-key rays (e.g.
    tile-coherent primaries, which share the camera origin) keep their
    incoming order."""
    lo = jnp.min(bounds[:, 0:3], axis=0)
    hi = jnp.max(bounds[:, 3:6], axis=0)
    span = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip((o - lo) / span * 64.0, 0.0, 63.0).astype(jnp.int32)

    def part1by2(x):  # spread 6 bits with 2-bit gaps (fits int32)
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    morton = (part1by2(q[:, 0]) | (part1by2(q[:, 1]) << 1)
              | (part1by2(q[:, 2]) << 2))
    octant = ((d[:, 0] < 0).astype(jnp.int32) * 4
              + (d[:, 1] < 0).astype(jnp.int32) * 2
              + (d[:, 2] < 0).astype(jnp.int32))
    key = morton * 8 + octant
    perm = jnp.argsort(key, stable=True).astype(jnp.int32)
    inv = jnp.zeros_like(perm).at[perm].set(
        jax.lax.iota(jnp.int32, perm.shape[0]))
    return perm, inv


def _flash_rl(planes: TriPlanes, o, d, t_min, ti, reach_cap=None,
              worklists=None):
    """Rays-on-lanes dispatch: dense (n/128, 128) boundary tensors.

    ``reach_cap``: optional per-ray upper bound on the winner t used
    ONLY for work-list reachability (e.g. the coarse-phase occlusion
    cap); the kernel's running winner still starts at ``ti`` so the
    outputs are identical to an uncapped run.

    ``worklists``: optional precomputed ``(wl, nw, grp)`` per-block
    work lists (e.g. from the reach-sorted prepass); entries are chunk
    ids when grp == 1, else group ids the kernel expands. reach_cap
    and the group path are then bypassed."""
    n = o.shape[0]
    assert n % LANE == 0, n
    n_blocks = n // LANE
    n_chunks = planes.planes.shape[1]
    need_uv = planes.attrs is None
    tmin_arr = jnp.full((1,), t_min, jnp.float32)
    cap = ti if reach_cap is None else reach_cap
    near_exit = (_NEAR_EXIT and worklists is None
                 and planes.group_bounds is None
                 and n_chunks >= _SORT_MIN_CHUNKS)
    near_sorted = None
    if near_exit:
        grp = 1
        reach, near = _ray_chunk_reach_near(planes.bounds, o, d, cap,
                                            t_min)
        wl, nw, near_sorted = _block_worklists_near(reach, near,
                                                    n_blocks)
        wl_width = n_chunks
    elif worklists is not None:
        wl, nw, grp = worklists
        wl_width = wl.shape[1]
    elif planes.group_bounds is not None:
        # two-level culling: exact per-ray reachability at GROUP
        # granularity (prepass + argsort shrink by the group factor);
        # the kernel unrolls each group's chunks
        n_groups = planes.group_bounds.shape[0]
        grp = -(-n_chunks // n_groups)
        wl, nw = _ray_chunk_worklists(planes.group_bounds, o, d, cap,
                                      t_min, n_blocks)
        wl_width = n_groups
    else:
        grp = 1
        wl, nw = _ray_chunk_worklists(planes.bounds, o, d, cap, t_min,
                                      n_blocks)
        wl_width = n_chunks
    wl = wl[:, None, :]
    nw = nw[:, :, None]
    use_cols = planes.planes_rl.ndim == 3
    dense = lambda x: x.reshape(n_blocks, 1, LANE)
    args = [planes.planes_rl if use_cols else planes.planes,
            dense(o[:, 0]), dense(o[:, 1]), dense(o[:, 2]),
            dense(d[:, 0]), dense(d[:, 1]), dense(d[:, 2]),
            dense(ti), tmin_arr, wl, nw]
    near_specs = []
    if near_exit:
        args.append(near_sorted[:, None, :])
        near_specs = [pl.BlockSpec((1, 1, wl_width), lambda i: (i, 0, 0),
                                   memory_space=pltpu.SMEM)]

    def kern(*refs):
        return _kernel_rl(*refs, need_uv=need_uv, use_cols=use_cols,
                          grp=grp, n_chunks=n_chunks,
                          near_exit=near_exit)

    row_spec = pl.BlockSpec((1, 1, LANE), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [row_spec] * 7
        + [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, wl_width), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ]
        + near_specs,
        out_specs=pl.BlockSpec((1, 8, LANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, 8, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",),
        ),
        interpret=jax.default_backend() == "cpu",
    )(*args)

    flat = lambda k: out[:, k, :].reshape(n)
    t = flat(0)
    uv = jnp.stack([flat(1), flat(2)], axis=-1)
    idx = flat(3).astype(jnp.int32)
    hit = flat(4) > 0.5
    return t, idx, hit, uv


def _kernel_rl_margins(planes_ref, ox_ref, oy_ref, oz_ref, dx_ref,
                       dy_ref, dz_ref, tc_ref, tmin_ref, wl_in, nw_ref,
                       out_ref, use_cols=False):
    """Silhouette-margin SELECTION kernel (round 5): per ray, find

    - the NEAR-MISS argmax: the triangle with the largest (negative)
      barycentric margin among valid front crossings in (t_min, t_cap),
    - the OCCLUSION argmin: the interior crossing with the smallest t
      strictly behind the winner (t > t_cap * (1 + 1e-5)),
    - the WINNER id: the interior crossing matching t_cap within the
      1e-5 relative guard,

    as ORIGINAL triangle ids (+ sentinel -1). Same RL layout and
    per-visit math as _kernel_rl; all inputs are stop-gradded by the
    caller — edge_grad recomputes the margins differentiably on the
    selected triangles only (PERF.md round 5: the brute selection scan
    was 50% of the teapot fit step). t_cap rides per ray (BIG on miss
    rays, which therefore select no occlusion/winner candidates)."""
    t_min = tmin_ref[0]
    row = lambda r: r[0, 0, :][None, :]
    ox, oy, oz = row(ox_ref), row(oy_ref), row(oz_ref)
    dx, dy, dz = row(dx_ref), row(dy_ref), row(dz_ref)
    tcap = row(tc_ref)
    texcl = tcap * (1.0 + 1e-5)
    tlow = tcap * (1.0 - 1e-5)
    pxv = oy * dz - oz * dy
    pyv = oz * dx - ox * dz
    pzv = ox * dy - oy * dx

    shape = (LANE, LANE)
    NEG = jnp.float32(-3.4e38)
    BIG = jnp.float32(3.4e38)
    n_work = nw_ref[0, 0, 0]

    def work_body(carry):
        i, mb, nib, tob, oib, twb, wib = carry
        ci = wl_in[0, 0, i]
        if use_cols:
            blk_t = planes_ref[ci]
        else:
            blk_t = planes_ref[:, ci, :].T
        pr = lambda k: blk_t[:, k:k + 1]
        e1x, e1y, e1z = pr(0), pr(1), pr(2)
        e2x, e2y, e2z = pr(3), pr(4), pr(5)
        fnx, fny, fnz = pr(6), pr(7), pr(8)
        qax, qay, qaz = pr(9), pr(10), pr(11)
        rax, ray_, raz = pr(12), pr(13), pr(14)
        adf = pr(15)
        oid = pr(17)

        det = -(dx * fnx + dy * fny + dz * fnz)
        safe = jnp.abs(det) > 1e-12
        inv_det = 1.0 / jnp.where(safe, det, 1.0)
        u = (pxv * e2x + pyv * e2y + pzv * e2z
             - (dx * qax + dy * qay + dz * qaz)) * inv_det
        v = -(pxv * e1x + pyv * e1y + pzv * e1z
              - (dx * rax + dy * ray_ + dz * raz)) * inv_det
        t = (ox * fnx + oy * fny + oz * fnz - adf) * inv_det
        m = jnp.minimum(jnp.minimum(u, v), 1.0 - u - v)
        ok = det >= DET_EPS
        # t < tcap (NOT a 1e-5-guarded shell — a guard was tried
        # and reverted, edge_grad near-mask note): contact-line
        # silhouettes live at t ~ tcap. Winner-adjacent candidates at
        # f32-borderline t can therefore select differently than the
        # brute scan (same class as the cross-engine drift).
        near = ok & (t > t_min) & (t < tcap) & (m < 0.0)
        mc = jnp.where(near, m, NEG)
        bet = mc > mb
        mb = jnp.where(bet, mc, mb)
        nib = jnp.where(bet, oid + jnp.zeros(shape), nib)
        occ = ok & (m >= 0.0) & (t > texcl)
        tc_ = jnp.where(occ, t, BIG)
        bet2 = tc_ < tob
        tob = jnp.where(bet2, tc_, tob)
        oib = jnp.where(bet2, oid + jnp.zeros(shape), oib)
        win = ok & (m >= 0.0) & (t > t_min) & (t <= texcl) & (t >= tlow)
        tw = jnp.where(win, t, BIG)
        bet3 = tw < twb
        twb = jnp.where(bet3, tw, twb)
        wib = jnp.where(bet3, oid + jnp.zeros(shape), wib)
        return i + 1, mb, nib, tob, oib, twb, wib

    fz = lambda v: jnp.full(shape, v, jnp.float32)
    init = (jnp.int32(0), fz(NEG), fz(-1.0), fz(BIG), fz(-1.0),
            fz(BIG), fz(-1.0))
    _, mb, nib, tob, oib, twb, wib = jax.lax.while_loop(
        lambda c: c[0] < n_work, work_body, init)

    sub_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 0)

    def pick_arg(val, ids, red, empty):
        """Reduce over tri-slot sublanes: the id of the extreme value
        (lowest sublane on ties); -1 where no candidate qualified."""
        best = red(val, axis=0, keepdims=True)
        sel = val == best
        sub = jnp.min(jnp.where(sel, sub_ids, jnp.int32(LANE)), axis=0,
                      keepdims=True)
        sel2 = sub_ids == sub
        out = jnp.sum(jnp.where(sel2, ids, 0.0), axis=0, keepdims=True)
        return jnp.where(empty(best), jnp.float32(-1.0), out), best

    near_id, near_m = pick_arg(mb, nib, jnp.max,
                               lambda b: b <= NEG / 2)
    occ_id, occ_t = pick_arg(tob, oib, jnp.min,
                             lambda b: b >= BIG / 2)
    win_id, win_t = pick_arg(twb, wib, jnp.min,
                             lambda b: b >= BIG / 2)
    zr = jnp.zeros((1, LANE), jnp.float32)
    out_ref[0] = jnp.concatenate(
        [near_id, occ_id, win_id, near_m, occ_t, win_t, zr, zr], axis=0)


def flash_margin_select(planes: TriPlanes, o, d, t_cap, t_min):
    """Dispatch the margin-selection kernel: returns
    ``(near_id, occ_id, win_id)`` — (N,) i32 ORIGINAL triangle ids,
    -1 where no candidate qualified.

    Requires ``planes.attrs is None`` (original-id packing, e.g.
    diff_trace.pack_for_diff). Reachability uses the window
    ``(t_min, 2 * t_cap]``: occlusion candidates beyond twice the
    winner distance have relative margin >= 0.5 — their occlusion
    sigmoid is saturated flat at every practical bandwidth, so
    skipping them changes no gradient within f32."""
    assert planes.attrs is None, "margin selection needs original ids"
    n = o.shape[0]
    assert n % LANE == 0, n
    n_blocks = n // LANE
    n_chunks = planes.planes.shape[1]
    cap = jnp.where(t_cap >= jnp.float32(1e30), t_cap,
                    2.0 * t_cap)
    # DILATED chunk bounds: a near-MISSING ray can pass entirely
    # outside the chunk AABB while its barycentric margin is small —
    # the winner-pass reach test would cull exactly the triangles the
    # near-miss term needs. Half-extent dilation (+ an absolute floor)
    # covers every band where the sigmoid is not saturated flat;
    # farther misses carry ~zero gradient either way, so culling them
    # matches the brute selection within f32.
    lo = planes.bounds[:, 0:3]
    hi = planes.bounds[:, 3:6]
    pad = 0.5 * (hi - lo) + jnp.float32(1e-3)
    bounds_d = jnp.concatenate(
        [lo - pad, hi + pad, planes.bounds[:, 6:8]], axis=1)
    wl, nw = _ray_chunk_worklists(bounds_d, o, d, cap, t_min,
                                  n_blocks)
    wl = wl[:, None, :]
    nw = nw[:, :, None]
    use_cols = planes.planes_rl.ndim == 3
    dense = lambda x: x.reshape(n_blocks, 1, LANE)
    tmin_arr = jnp.full((1,), t_min, jnp.float32)
    args = [planes.planes_rl if use_cols else planes.planes,
            dense(o[:, 0]), dense(o[:, 1]), dense(o[:, 2]),
            dense(d[:, 0]), dense(d[:, 1]), dense(d[:, 2]),
            dense(t_cap), tmin_arr, wl, nw]

    def kern(*refs):
        return _kernel_rl_margins(*refs, use_cols=use_cols)

    row_spec = pl.BlockSpec((1, 1, LANE), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [row_spec] * 7
        + [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_chunks), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, LANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, 8, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",),
        ),
        interpret=jax.default_backend() == "cpu",
    )(*args)
    flat = lambda k: out[:, k, :].reshape(n)
    to_id = lambda x: x.astype(jnp.int32)
    return to_id(flat(0)), to_id(flat(1)), to_id(flat(2))


def flash_intersect_triangles(planes: TriPlanes, o, d, t_min, t_init=None):
    """Closest triangle per ray; same contract as intersect_triangles:
    returns (t (N,), idx (N,) i32, hit (N,) bool, uv (N,2)).
    N must be a multiple of R_RAYS.

    ``idx`` holds ORIGINAL triangle ids and ``uv`` real barycentrics —
    EXCEPT when ``planes.attrs`` is present (const-material fast path):
    then ``idx`` is the PACKED SORTED id (chunk*128 + lane) indexing
    ``planes.attrs`` and ``uv`` is zeros (const materials never read
    it).

    ``t_init`` (N,) optionally seeds the per-ray running winner (e.g.
    the closest sphere hit): returned t equals t_init where no triangle
    beat it (callers merge with a strict ``<`` so the sphere keeps
    ties), and ``hit`` is True only for rays a triangle won."""
    n = o.shape[0]
    assert n % R_RAYS == 0, n
    n_blocks = n // R_RAYS
    tmin_arr = jnp.full((1,), t_min, jnp.float32)
    if t_init is None:
        ti = jnp.full((n, 1), _BIG, jnp.float32)
    else:
        ti = jnp.minimum(t_init, _BIG).reshape(n, 1).astype(jnp.float32)
    n_chunks = planes.planes.shape[1]
    need_uv = planes.attrs is None

    if _SKIP:  # timing ablation: XLA body alone
        return (ti[:, 0], jnp.zeros((n,), jnp.int32),
                jnp.zeros((n,), jnp.bool_), jnp.zeros((n, 2), jnp.float32))
    if _RL and planes.planes_rl is not None and not _SKIPK:
        sort_on = _SORT and planes.planes.shape[1] >= _SORT_MIN_CHUNKS

        def coarse_cap(o_, d_, ti_):
            if planes.coarse is None:
                return None
            # phase 1: subset intersection — its t is a valid upper
            # bound on the true winner's t (see _COARSE)
            return _flash_rl(planes.coarse, o_, d_, t_min, ti_)[0]

        if sort_on and _SORT_MODE == "reach":
            # Reach-sort: the block work list is the UNION of its 128
            # rays' reachable sets; at goat scale unions saturate (~85%
            # of chunks even with exact per-ray culling — hardware
            # ablation, PERF.md r3) because 128 divergent rays x ~tens
            # of chunks each covers everything. Sorting rays by the
            # CENTROID of their own reachable-chunk ids (BVH order =
            # spatial order) packs rays with overlapping sets into the
            # same block — the union collapses toward the per-ray set
            # size. The reach matrix is what the prepass computes
            # anyway; the extra cost is its n-row permute + the key.
            # Per-ray results are exactly permutation-invariant
            # (ascending-chunk-id tie-break holds in every block).
            cap = coarse_cap(o, d, ti[:, 0])
            # group-granular reach when group bounds exist: the (n, G)
            # slab matrix is _GRP x cheaper to compute, key and permute
            # than (n, C), and with reach-coherent blocks the group
            # expansion's chunk-visit inflation is small
            if planes.group_bounds is not None:
                rbounds = planes.group_bounds
                grp = -(-planes.planes.shape[1]
                        // planes.group_bounds.shape[0])
            else:
                rbounds, grp = planes.bounds, 1
            reach = _ray_chunk_reach(
                rbounds, o, d, ti[:, 0] if cap is None else cap, t_min)
            C = reach.shape[1]
            iota = jnp.arange(C, dtype=jnp.float32)[None, :]
            cnt = jnp.sum(reach, axis=1)
            cen = (jnp.sum(jnp.where(reach, iota, 0.0), axis=1)
                   / jnp.maximum(cnt.astype(jnp.float32), 1.0))
            key = (jnp.round(cen).astype(jnp.int32) * 2048
                   + jnp.minimum(cnt, 2047))
            perm = jnp.argsort(key, stable=True).astype(jnp.int32)
            inv = jnp.zeros_like(perm).at[perm].set(
                jax.lax.iota(jnp.int32, perm.shape[0]))
            wl, nw = _block_worklists(reach[perm], o.shape[0] // LANE)
            t, idx, hit, uv = _flash_rl(
                planes, o[perm], d[perm], t_min, ti[perm, 0],
                worklists=(wl, nw, grp))
            return t[inv], idx[inv], hit[inv], uv[inv]
        if sort_on:
            # morton mode: origin cell + direction octant key (see
            # _ray_sort_perm); weaker clustering, cheaper key
            perm, inv = _ray_sort_perm(planes.bounds, o, d)
            o_, d_, ti_ = o[perm], d[perm], ti[perm, 0]
            t, idx, hit, uv = _flash_rl(
                planes, o_, d_, t_min, ti_,
                reach_cap=coarse_cap(o_, d_, ti_))
            return t[inv], idx[inv], hit[inv], uv[inv]
        return _flash_rl(planes, o, d, t_min, ti[:, 0],
                         reach_cap=coarse_cap(o, d, ti[:, 0]))
    if _XLA_WL:
        # exact per-ray chunk reachability computed in XLA, OR-reduced
        # per block and fed in as an SMEM work list (one (1, C) row per
        # grid block) — see _ray_chunk_worklists
        if _NOPRE:  # timing ablation: dense lists, no reachability pass
            wl = jnp.broadcast_to(
                jnp.arange(n_chunks, dtype=jnp.int32)[None],
                (n_blocks, n_chunks)) + (ti[:n_blocks, :1] * 0).astype(
                    jnp.int32)
            nw = jnp.zeros((n_blocks, 1), jnp.int32)
        else:
            wl, nw = _ray_chunk_worklists(planes.bounds, o, d, ti[:, 0],
                                          t_min, n_blocks)
        # 3D with a singleton middle dim: Mosaic requires the last two
        # block dims to equal the array dims for SMEM inputs
        wl = wl[:, None, :]
        nw = nw[:, :, None]

        if _SKIPK:  # timing ablation: prepass + post-path, no kernel
            npool = (planes.attrs.shape[0] if planes.attrs is not None
                     else max(planes.planes.shape[1] * LANE, 1))
            # mode "2": triangles never win (t == t_init) — identical
            # path dynamics to the NOWORK run, so per-iteration costs
            # subtract cleanly. mode "1": triangles always win.
            fac = (1.0 if _os.environ.get("ZRAYTRACE_FLASH_SKIPK") == "2"
                   else 0.99999)
            t = ti[:, 0] * fac + nw.sum().astype(jnp.float32) * 0.0
            idx = jax.lax.iota(jnp.int32, n) % jnp.int32(npool)
            hit = t < ti[:, 0]
            z3 = jnp.full((n,), 0.3, jnp.float32)
            return t, idx, hit, jnp.stack([z3, z3], axis=-1)

        def kern(*refs):
            return _kernel(*refs, need_uv=need_uv, xla_wl=True)

        out = pl.pallas_call(
            kern,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # planes, full
                pl.BlockSpec((R_RAYS, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R_RAYS, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R_RAYS, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, n_chunks), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((R_RAYS, 8), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, 8), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                # ray blocks are independent: a parallel grid lets
                # Mosaic pipeline block DMA against compute
                dimension_semantics=("parallel",),
            ),
            interpret=jax.default_backend() == "cpu",
        )(planes.planes, o, d, ti, tmin_arr, wl, nw)
    else:
        def kern(*refs):
            return _kernel(*refs, need_uv=need_uv)

        out = pl.pallas_call(
            kern,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # planes, full
                pl.BlockSpec(memory_space=pltpu.VMEM),  # chunk bounds
                pl.BlockSpec((R_RAYS, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R_RAYS, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R_RAYS, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((R_RAYS, 8), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, 8), jnp.float32),
            scratch_shapes=[pltpu.SMEM((n_chunks,), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=jax.default_backend() == "cpu",
        )(planes.planes, planes.bounds, o, d, ti, tmin_arr)

    t = out[:, 0]
    uv = out[:, 1:3]
    idx = out[:, 3].astype(jnp.int32)
    hit = out[:, 4] > 0.5
    return t, idx, hit, uv
