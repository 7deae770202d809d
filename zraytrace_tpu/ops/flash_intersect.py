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
# (per-block ray bounds shrink) at more per-block fixed cost. 256 won
# the teapot sweep (1.82M vs 1.77M rays/s; PERF.md round 3).
R_RAYS = int(_os.environ.get("ZRAYTRACE_FLASH_RAYS", "256"))
assert 512 % R_RAYS == 0, R_RAYS

# packed triangle component planes, each (n_chunks, 128):
# e1(3) e2(3) fn(3) e2xa(3) e1xa(3) a_dot_fn(1) valid(1) orig_id(1)
N_COMP = 18


class TriPlanes(NamedTuple):
    planes: jnp.ndarray  # (N_COMP, n_chunks, 128) f32
    bounds: jnp.ndarray  # (n_chunks, 8) f32 chunk AABB [lo3, hi3, 0, 0]
    n_tris: int
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
    return TriPlanes(planes=planes, bounds=bounds, n_tris=T, attrs=attrs)


def _kernel(planes_ref, bounds_ref, o_ref, d_ref, ti_ref, tmin_ref,
            out_ref, wl_ref, need_uv=True):
    n_chunks = planes_ref.shape[1]
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
    t_min = tmin_ref[0]
    t_init = ti_ref[:, 0]
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

    def work_body(carry):
        i, t_best, u_best, v_best, i_best = carry
        ci = wl_ref[i]
        pr = lambda k: planes_ref[k, ci, :][None, :]  # (1, 128)
        e1x, e1y, e1z = pr(0), pr(1), pr(2)
        e2x, e2y, e2z = pr(3), pr(4), pr(5)
        fnx, fny, fnz = pr(6), pr(7), pr(8)
        qax, qay, qaz = pr(9), pr(10), pr(11)  # e2 x a
        rax, ray_, raz = pr(12), pr(13), pr(14)  # e1 x a
        adf = pr(15)
        valid = pr(16)
        orig = pr(17) if need_uv else None

        det = -(dx * fnx + dy * fny + dz * fnz)
        safe = jnp.abs(det) > 1e-12
        inv_det = 1.0 / jnp.where(safe, det, 1.0)
        # u = (oxd).e2 - d.(e2 x a); v = -((oxd).e1 - d.(e1 x a))
        u = (pxv * e2x + pyv * e2y + pzv * e2z
             - (dx * qax + dy * qay + dz * qaz)) * inv_det
        v = -(pxv * e1x + pyv * e1y + pzv * e1z
              - (dx * rax + dy * ray_ + dz * raz)) * inv_det
        t = (ox * fnx + oy * fny + oz * fnz - adf) * inv_det
        # t_best tightens the window across chunks like the
        # reference's recursive t_max tightening (bvh.zig:196-203)
        is_hit = ((det >= DET_EPS) & (t > t_min)
                  & (t < t_best[:, None])
                  & (u >= 0.0) & (v >= 0.0)
                  & (u + v <= 1.0) & (valid > 0.5))
        t = jnp.where(is_hit, t, _BIG)

        tc = jnp.min(t, axis=1, keepdims=True)  # (R, 1)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        first = t == tc  # may tie; argmin-by-lowest-lane below
        lane_of_min = jnp.min(
            jnp.where(first, lane_ids, jnp.int32(LANE)), axis=1,
            keepdims=True)

        better = tc[:, 0] < t_best
        t_best = jnp.where(better, tc[:, 0], t_best)
        if need_uv:
            # each pick is a full cross-lane masked-sum reduction —
            # this mode returns ORIGINAL triangle ids and uv
            sel = lane_ids == lane_of_min
            pick = lambda x: jnp.sum(jnp.where(sel, x, 0.0), axis=1,
                                     keepdims=True)
            ic = pick(jnp.broadcast_to(orig, t.shape)).astype(jnp.int32)
            uc = pick(u)
            vc = pick(v)
            u_best = jnp.where(better, uc[:, 0], u_best)
            v_best = jnp.where(better, vc[:, 0], v_best)
        else:
            # attrs fast path: the winner id is the PACKED SORTED id
            # chunk*128 + lane — no reduction needed beyond lane_of_min
            ic = ci * LANE + lane_of_min
        i_best = jnp.where(better, ic[:, 0], i_best)
        return i + 1, t_best, u_best, v_best, i_best

    init = (
        jnp.int32(0),
        t_init,  # sphere-seeded running winner (or _BIG)
        jnp.zeros((R,), jnp.float32),
        jnp.zeros((R,), jnp.float32),
        jnp.zeros((R,), jnp.int32),
    )
    _, t_best, u_best, v_best, i_best = jax.lax.while_loop(
        lambda c: c[0] < n_work, work_body, init
    )
    hit = (t_best < t_init).astype(jnp.float32)
    out_ref[:] = jnp.stack(
        [t_best, u_best, v_best, i_best.astype(jnp.float32), hit,
         jnp.zeros_like(t_best), jnp.zeros_like(t_best), jnp.zeros_like(t_best)],
        axis=-1,
    )


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
