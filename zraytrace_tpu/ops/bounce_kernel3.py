"""Pallas TPU bounce megakernel, round 3: single-path lanes with
DEFERRED texel factors (sphere scenes).

Round 2 (ops/bounce_kernel2) kept float multiply order bit-exact by
stalling a path the moment it scattered off an image-textured material:
the texel value is only available to the XLA glue (in-kernel gathers do
not lower / do not beat the ~5 ns/row hardware cost), so the path waited
for the per-launch batched gather. On 7-spheres ~11% of segments need a
texel, so launches effectively ended after ~8 in-kernel iterations and
TWO virtual paths per physical lane were time-multiplexed to hide the
stalls — the per-iteration select/writeback overhead of that
multiplexing plus the per-launch gather were measured as the two
dominant costs (PERF.md round-2 decomposition).

This kernel exploits an algebraic fact instead: a sample's radiance is

    radiance = (product of all albedo factors along the path) * sky

and the path's GEOMETRY (and its stateless PCG4D streams, keyed by
(pixel, sample, bounce)) never depends on throughput. Products commute,
so a texel factor may be applied out of order:

- **texel slots** (K_TEX per lane): a path that needs a texel records
  the flat atlas index in a free slot and KEEPS TRACING with the factor
  outstanding; ``tmask`` tracks which slots the in-flight sample still
  owes. A repeat need of an index already in a slot just sets the
  slot's bit (the resolved value is shared).
- **contribution records** (M_REC per lane): a sample that escapes to
  the sky with outstanding factors parks ``(thr * sky, pixel slot,
  tmask)`` in a free record; a finished pixel window parks its
  accumulated sum with mask 0. The glue resolves every texel slot with
  ONE batched gather per launch, multiplies each record by the texels
  its mask references, and adds it into the slot sums. A sample
  absorbed or depth-exhausted owes nothing — its mask is simply
  dropped.
- a path only **blocks** when every texel slot (on a new texel need) or
  every record (on park/finish) is occupied — rare with K=M=4, so
  launches stretch and both the per-launch atlas gather count and the
  launch fixed cost drop. A blocked path's segment is suppressed
  entirely (no state writes, no counter increments) and replays exactly
  after the glue resolves — stateless RNG makes the replay
  bit-identical.

Event counters are bit-exact vs the XLA wavefront (stalling and
deferral change timing, never events). Radiance differs from the XLA
wavefront only in float rounding order (a texel factor applied after
instead of before later albedo factors), which is far below the test
image tolerance already used for the polynomial atan2.

Reference call-outs as in render.py: rayColor loop raytrace.zig:62-100,
sphere hit sphere.zig:31-69, materials material.zig:43-128, texture
texture.zig:52-74, camera camera.zig:46-52, sky raytrace.zig:53-58.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zraytrace_tpu import rng as zrng
from zraytrace_tpu import scene as sc
from zraytrace_tpu.ops.common import (
    LANE,
    P_ATLASW, P_HEIGHT, P_MAXDEPTH, P_NPIX, P_NSLOTS, P_SEED, P_SEND,
    P_SSTART, P_STRIDE, P_WIDTH,
    _acos, _atan2, _dot, _normalize,
    prepare_tables,
)

# kernel3-only params slots (appended after the shared 10):
# pixel-stripe count P, group rotation shift, lane count N, per-group
# spp, smallest lane pixel id (rotation is modulo [lo, lo+N))
P_NSTRIPES, P_SHIFT, P_NLANES, P_GSPP, P_BASELO = 10, 11, 12, 13, 14

N_COUNTS = 8

# timing probe (bench only): skip the per-launch atlas gather to
# measure its wall share; counters stay exact, the image goes gray.
import os as _os

_NOGATHER = _os.environ.get("ZRAYTRACE_K3_NOGATHER", "0") == "1"
# A/B knobs for the two glue variants (measured, PERF.md round 3):
# the u32-packed 1D gather is ~0.32 ms/launch SLOWER than the (F,3) f32
# row gather on this TPU — packed stays off; state-plane aliasing is
# neutral-to-slightly-positive and stays on.
_ALIAS = _os.environ.get("ZRAYTRACE_K3_ALIAS", "1") == "1"
_PACKED = _os.environ.get("ZRAYTRACE_K3_PACKED", "0") == "1"
# (F,3) f32 row gather with flat indices + promise_in_bounds (skips the
# clamp); A/B'd on hardware before flipping the default.
_PROMISE = _os.environ.get("ZRAYTRACE_K3_PROMISE", "0") == "1"
# Per-slot cond-gated gathers: slot k's (N,) atlas row gather is wrapped
# in a lax.cond on "any lane occupies slot k" — a launch whose later
# slots are empty everywhere skips those 131k-row gathers entirely (XLA
# conditionals branch at runtime on this backend; teapot's cond guard
# measured a real 1.34x). Bit-exact: empty slots are never referenced
# by any mask bit.
_CONDGATHER = _os.environ.get("ZRAYTRACE_K3_CONDGATHER", "0") == "1"
# Cross-group texel-cache SHARING: with sample_groups G > 1 a pixel's
# spp windows are traced by G different lanes (offset multiples of
# n/G in flat lane space), each with a PRIVATE cache — the pixel's
# texel footprint used to be gathered up to G times. After each launch
# the glue rolls every lane's newest resolved (idx, rgb) across the
# G-1 group offsets and FIFO-pushes it (dedup-checked) into the
# receiving lanes' caches. Values are exact atlas texels, so images
# stay equal up to multiply order and counters bit-exact; only the
# hit/miss schedule changes.
_SHARE = _os.environ.get("ZRAYTRACE_K3_SHARE", "0") == "1"
# Rotating share: push ONE rolled neighbor per launch, its group offset
# cycling over launches (d = 1 + launch mod (G-1)) — 1/(G-1) of the
# per-launch share cost, slower cross-group propagation.
_SHARE_ROT = _os.environ.get("ZRAYTRACE_K3_SHARE_ROT", "0") == "1"
# diagnostics (bench only; changes the program shape): report total
# occupied texel slots and per-slot any-occupied launch counts.
_DIAG = _os.environ.get("ZRAYTRACE_K3_DIAG", "0") == "1"
# QUAD-PACKED texel slots (round 5): the per-launch gather costs
# ~3-5 ns per ROW regardless of row width (PERF.md), so the atlas is
# reshaped (F, 3) -> (F/4, 12) and a slot resolves FOUR consecutive
# texels (one quad row) instead of one. Slots are keyed by quad
# (texflat >> 2; the stored index stays the exact first-need texflat),
# so a lane's ~2x2-texel footprint that used to occupy up to 4 slots
# now shares 1-2 — fewer slot-exhaustion blocks, longer launches —
# and K_TEX can drop with it, shrinking gather rows per launch too.
# The outstanding-factor mask widens to 4 bits per slot (bit 4k+s =
# sub-texel s of slot k owed): values fetched are the EXACT same
# atlas f32s, so images change only in multiply order (the deferral's
# existing deviation class) and counters stay bit-exact. Requires
# atlas_w % 4 == 0 (quads must not straddle atlas rows) — true for
# every padded atlas (scene.py pads to the max image width; the
# shipped atlases are 1024 wide).
_QUAD = _os.environ.get("ZRAYTRACE_K3_QUAD", "0") == "1"

R_BLK = 64
# Launches now stretch until the rare blocks accumulate; 32 in-kernel
# iterations per launch is the starting point (tuned on hardware).
B_DEFAULT = 32

VMEM_LIMIT = 100 * 1024 * 1024

# PERSISTENT per-lane state planes carried across launches:
# o(3) d(3) thr(3) acc(3) dep samp slot pidx baseg swin
# + N_CACHE x (cache_idx cache_rgb(3)).
#
# The cache planes implement an N_CACHE-entry TEXEL-VALUE CACHE
# (round 3): launches are pinned by texel-slot exhaustion, and
# consecutive samples of the same pixel hit texels from the pixel's
# small (~2x2 texel) footprint — often repeating or alternating across
# a boundary as the sub-pixel jitter moves. A texneed whose flat index
# matches any cached index multiplies the cached f32 value in-kernel —
# bit-identical to what the gather would return, so only float
# multiply ORDER changes — and consumes no texel slot. The glue
# refreshes entry 0 with every resolved slot and shifts older entries
# down (FIFO by last-resolve; no in-kernel promotion — a working set
# still hits steady-state while it fits because hits don't need
# refreshing).
#
# LAUNCH-LOCAL planes (initialized in-kernel, resolved by the glue
# every launch, never streamed in): tmask, K_TEX texel-slot indices,
# M_REC contribution records (rgb, pixel slot, texel-slot mask).
#
# pidx/baseg/swin implement the SAMPLE-INTERLEAVED slot schedule
# (round 3): launch count is pinned by the heaviest lane's texel-event
# total, and with whole-pixel lanes the texture-dominated pixels
# concentrate ~12k events on a lane. Slot k now means (pixel stripe
# p = k mod P, sample group g = k div P): the lane traces pixel
# ((base - lo + g*shift) mod n_lanes + lo) + p*stride for the g-th
# spp/G window, so one heavy pixel's samples spread over G lanes and
# the per-lane maximum drops toward the 244M/131k average. Carried as
# planes (advance is add/compare) so the hot loop needs no div/mod.
# PCG4D streams are keyed by (pixel, sample) — event counters stay
# bit-exact under any schedule; pixel sums change only in float
# summation order (group partial sums).
# Cache size tracks the slot count: with K_TEX=4 the round-3 sweep had
# 6 FIFO entries winning (727.3M; 8 regressed on compare-chain cost),
# but the round-4 park-fold/packed-record kernel at K_TEX=6 stretches
# launches far enough that 8 entries pay for their chain (755.4M vs
# 737.5M at 6 — PERF.md round 4; K_TEX=8 loses, the wider per-launch
# gather outcosts its launch savings).
N_CACHE = int(_os.environ.get("ZRAYTRACE_K3_CACHE", "8"))
K_TEX = int(_os.environ.get("ZRAYTRACE_K3_TEX", "6"))
M_REC = int(_os.environ.get("ZRAYTRACE_K3_REC", "4"))
# Launch early-exit threshold (blocked-lane fraction); env override for
# A/B sweeps without touching call sites. 1/2 with K_TEX=6 won the
# round-4 repeat sweep (PERF.md).
EXIT_FRAC = (int(_os.environ.get("ZRAYTRACE_K3_EXIT_NUM", "1")),
             int(_os.environ.get("ZRAYTRACE_K3_EXIT_DEN", "2")))
# NEIGHBOR-SHARED cache entries (appended after the own-FIFO entries):
# entry N_CACHE+j holds the newest resolve of the lane at flat offset
# SHARE_OFFS[j]. Lanes ±1 trace ADJACENT PIXELS concurrently (same
# stripe/group phase), and adjacent pixels' texel footprints overlap
# heavily (the logo sphere spans ~12x12 pixels per texel), so a lane's
# per-window FIRST TOUCH — the dominant miss class: ~64 windows per
# pixel each pay their own first-touch misses — can hit the neighbor's
# resolve instead of consuming a texel slot. Values are exact atlas
# texels (bit-exact images up to multiply order, counters unchanged).
# Assignment is direct (keep-last-known, no FIFO shift), so own FIFO
# entries are never thrashed — the failure mode of the rolled-push
# share (_SHARE above, PERF.md round 3).
N_SHARE = int(_os.environ.get("ZRAYTRACE_K3_NSHARE", "0"))
SHARE_OFFS = tuple(
    int(x) for x in _os.environ.get(
        "ZRAYTRACE_K3_SHARE_OFFS", "1,-1,2,-2,3,-3,4,-4")
    .split(","))[:max(N_SHARE, 0)]
N_CTOT = N_CACHE + N_SHARE
N_STATE = 18 + 4 * N_CTOT
# Packed-record layout (r, g, b, slot | mask << SLOT_SHIFT; -1 free):
# quad mode needs 4 bits of mask per texel slot, so the mask field
# widens and the slot field shrinks to what's left of the i32. The
# sign bit may land inside the mask — records therefore test free
# with == -1 (valid packs can never be all-ones: the slot guard keeps
# the slot field below all-ones) and decode with explicit field masks.
MASK_BITS = 4 * K_TEX if _QUAD else K_TEX
SLOT_SHIFT = min(16, 32 - MASK_BITS)
# Records are 4 planes since round 4: (r, g, b, packed) with
# packed = pixel slot | texel mask << 16 (-1 = free). One equality
# drives both the free test and the PARK FOLD below.
N_LOCAL = 1 + K_TEX + 4 * M_REC


def make_bounce_kernel3(n_spheres: int, n_mats: int, shape,
                        n_bounce: int, r_blk: int = R_BLK,
                        exit_frac: tuple = EXIT_FRAC, mat_classes=None,
                        has_mesh: bool = False, n_gb: int = 0):
    """Build the pallas_call: up to ``n_bounce`` wavefront iterations
    over ``(R, 128)`` single-path lane state, gridded in ``r_blk``-row
    blocks. Sphere and material counts are static (unrolled
    where-chains).

    ``has_mesh`` adds the DEFERRED MESH-HIT mechanism (mixed scenes,
    triangle meshes with const-color materials): triangle intersection
    does not lower usefully in-kernel (the chunk-streaming work belongs
    to the flash RL kernel, ops/flash_intersect.py), so a segment whose
    ray can reach the mesh root AABB within its sphere-winner distance
    BLOCKS — exactly the existing slot-exhaustion suppress-and-replay
    mechanism — and the glue batch-resolves every blocked lane's closest
    triangle with ONE flash call per launch. The replayed segment merges
    the answer by strict ``t < t_best`` (sphere keeps exact ties,
    raytrace.zig:75-81 insertion-order semantics) and shades with the
    triangle's const material + precomputed unit normal — bit-identical
    values to the XLA mesh path (render.trace_closest flash-attrs
    branch), so event counters stay bit-exact.

    Mesh inputs (after ``base``): box SMEM [lo3, hi3]; per-lane answer
    planes m_have, m_t, m_nx, m_ny, m_nz, m_mid. Extra local outputs:
    m_req (lanes awaiting a mesh answer), m_tbest (their sphere-winner
    t, seeding the flash running winner + chunk-reach cull)."""
    R_total, L = shape
    assert L == LANE
    R = min(r_blk, R_total)
    assert R_total % R == 0, (R_total, R)
    n_blocks = R_total // R
    blk = (R, L)
    exit_num, exit_den = exit_frac
    # carry layout offsets (after the leading iteration counter)
    Q_GB = 1 + 18               # n_gb future group-base planes
    Q_CACHE = Q_GB + n_gb
    Q_LOCAL = Q_CACHE + 4 * N_CTOT          # tmask
    Q_TEX = Q_LOCAL + 1                      # K_TEX slot indices
    Q_REC = Q_TEX + K_TEX                    # M_REC x (r, g, b, packed)
    Q_BLOCKED = Q_REC + 4 * M_REC
    # mesh carry (has_mesh only): m_have (answer available for the
    # lane's current segment), m_req (sticky: blocked awaiting answer),
    # m_tbest (sphere-winner t at block time)
    Q_MESH = Q_BLOCKED + 1
    Q_COUNT = Q_MESH + (3 if has_mesh else 0)

    n_state = N_STATE + n_gb

    def kernel(*refs):
        (params_ref, cam_ref, sph_ref, mat_ref, base_ref) = refs[:5]
        k0 = 5
        if has_mesh:
            (box_ref, mh_ref, mta_ref, mnx_ref, mny_ref, mnz_ref,
             mmid_ref) = refs[5:12]
            k0 = 12
        state_in = refs[k0:k0 + n_state]
        outs = refs[k0 + n_state:]
        n_local = N_LOCAL + (2 if has_mesh else 0)
        state_out = outs[:n_state]
        local_out = outs[n_state:n_state + n_local]
        counts_o = outs[n_state + n_local]

        width = params_ref[P_WIDTH]
        height = params_ref[P_HEIGHT]
        sample_end = params_ref[P_SEND]
        max_depth = params_ref[P_MAXDEPTH]
        seed = params_ref[P_SEED]
        n_pixels = params_ref[P_NPIX]
        stride = params_ref[P_STRIDE]
        sample_start = params_ref[P_SSTART]
        atlas_w = params_ref[P_ATLASW]
        n_slots_t = params_ref[P_NSLOTS]
        n_stripes = params_ref[P_NSTRIPES]
        g_shift = params_ref[P_SHIFT]
        n_lanes_t = params_ref[P_NLANES]
        gspp = params_ref[P_GSPP]
        base_lo = params_ref[P_BASELO]
        fw = width.astype(jnp.float32)
        fh = height.astype(jnp.float32)
        as_i32 = lambda u: jnp.int32(u - (1 << 32) if u >= (1 << 31) else u)
        seed_i = jnp.asarray(seed, jnp.int32)
        seed_sc = seed_i ^ as_i32(int(zrng.STREAM_SCATTER))
        seed_cam = seed_i ^ as_i32(int(zrng.STREAM_CAMERA))

        base = base_ref[:]

        def iter_body(carry):
            (it,
             ox, oy, oz, dx, dy, dz, tr, tg, tb, ar, ag, ab,
             dep, samp, slot, pidx, baseg, swin) = carry[:Q_GB]
            gbs = carry[Q_GB:Q_CACHE]
            cache = carry[Q_CACHE:Q_LOCAL]
            tmask = carry[Q_LOCAL]
            texidx = carry[Q_TEX:Q_REC]
            recs = carry[Q_REC:Q_BLOCKED]
            blocked = carry[Q_BLOCKED]
            if has_mesh:
                m_have, m_req, m_tbest = carry[Q_MESH:Q_COUNT]
            (n_rays, n_refl, n_miss, n_rec, n_samp, n_tex) = carry[Q_COUNT:]

            pixel = baseg + pidx * stride
            alive = (slot < n_slots_t) & (pixel < n_pixels)
            run = alive & (blocked == 0)
            exhausted = run & (dep >= max_depth)
            processing = run & ~exhausted
            # a rotated slot may land on an invalid pixel while LATER
            # slots are valid (n_pixels not a multiple of n_lanes), and
            # a sample window may be empty (spp < G*gspp): both advance
            # without tracing or counting
            swin_end = jnp.minimum(swin + gspp, sample_end)
            skip = ((blocked == 0) & (slot < n_slots_t)
                    & ((pixel >= n_pixels) | (samp >= swin_end)))
            run = run & (samp < swin_end)
            exhausted = exhausted & (samp < swin_end)
            processing = processing & (samp < swin_end)

            # ---- closest sphere (fused running winner; sphere.zig:31-69)
            BIG = jnp.float32(3.4e38)
            o_dot_d = _dot(ox, oy, oz, dx, dy, dz)
            o_sq = _dot(ox, oy, oz, ox, oy, oz)
            t_best = jnp.full(blk, BIG)
            cxs = jnp.zeros(blk, jnp.float32)
            cys = jnp.zeros(blk, jnp.float32)
            czs = jnp.zeros(blk, jnp.float32)
            rs = jnp.ones(blk, jnp.float32)
            ms = jnp.zeros(blk, jnp.int32)
            t_min = jnp.float32(1e-3)
            for s in range(n_spheres):
                cx = sph_ref[s, 0]
                cy = sph_ref[s, 1]
                cz = sph_ref[s, 2]
                r = sph_ref[s, 3]
                mid = sph_ref[s, 4].astype(jnp.int32)
                half_b = o_dot_d - (dx * cx + dy * cy + dz * cz)
                cc = o_sq - 2.0 * (ox * cx + oy * cy + oz * cz) + (
                    cx * cx + cy * cy + cz * cz - r * r)
                disc = half_b * half_b - cc
                pos = disc > 0.0
                root = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)),
                                 0.0)
                t1 = -half_b - root
                t2 = -half_b + root
                ok1 = (t1 > t_min) & (t1 < BIG)
                ok2 = (t2 > t_min) & (t2 < BIG)
                t = jnp.where(ok1, t1, t2)
                valid = (disc >= 0.0) & (ok1 | ok2)
                better = valid & (t < t_best)
                t_best = jnp.where(better, t, t_best)
                cxs = jnp.where(better, cx, cxs)
                cys = jnp.where(better, cy, cys)
                czs = jnp.where(better, cz, czs)
                rs = jnp.where(better, r, rs)
                ms = jnp.where(better, mid, ms)

            # ---- deferred mesh hit (docstring): a segment whose ray
            # can reach the mesh root AABB closer than its sphere
            # winner either merges the glue's answer (strict <, sphere
            # keeps ties like trace_closest) or blocks awaiting one.
            mesh_win = jnp.zeros(blk, jnp.bool_)
            mesh_block = jnp.zeros(blk, jnp.bool_)
            if has_mesh:
                # conservative slab reach test over (t_min, t_best);
                # |d| = 1 so a clamped ~0 component keeps the interval
                # a superset of the true one (false stalls only)
                def slab(o_c, d_c, lo_i, hi_i):
                    ds = jnp.where(jnp.abs(d_c) < 1e-12,
                                   jnp.float32(1e-12), d_c)
                    t0 = (box_ref[lo_i] - o_c) / ds
                    t1 = (box_ref[hi_i] - o_c) / ds
                    return jnp.minimum(t0, t1), jnp.maximum(t0, t1)
                lx0, hx0 = slab(ox, dx, 0, 3)
                ly0, hy0 = slab(oy, dy, 1, 4)
                lz0, hz0 = slab(oz, dz, 2, 5)
                enter = jnp.maximum(jnp.maximum(lx0, ly0), lz0)
                exit_ = jnp.minimum(jnp.minimum(hx0, hy0), hz0)
                reach = ((exit_ >= enter) & (exit_ > t_min)
                         & (enter < t_best))
                need_mesh = processing & reach
                m_ans = m_have != 0
                mesh_block = need_mesh & ~m_ans
                m_t_in = mta_ref[:]
                mesh_win = need_mesh & m_ans & (m_t_in < t_best)
                # record the request (written even though the lane's
                # segment is suppressed — these are the glue's inputs)
                m_tbest = jnp.where(mesh_block, t_best, m_tbest)
                m_req = m_req | mesh_block.astype(jnp.int32)
                t_best = jnp.where(mesh_win, m_t_in, t_best)
                ms = jnp.where(mesh_win, mmid_ref[:], ms)

            hit = t_best < BIG
            t_attr = jnp.where(hit, t_best, 1.0)
            px_ = ox + t_attr * dx
            py_ = oy + t_attr * dy
            pz_ = oz + t_attr * dz
            safe_r = jnp.where(jnp.abs(rs) > 1e-8, rs, 1e-8)
            nx = (px_ - cxs) / safe_r
            ny = (py_ - cys) / safe_r
            nz = (pz_ - czs) / safe_r
            if has_mesh:
                # winning triangle: precomputed unit geometric normal
                # (bit-identical to triangle_surface's, pack_tri_planes)
                nx = jnp.where(mesh_win, mnx_ref[:], nx)
                ny = jnp.where(mesh_win, mny_ref[:], ny)
                nz = jnp.where(mesh_win, mnz_ref[:], nz)
            # front-face flip (hit_record.zig:28-41)
            front = _dot(dx, dy, dz, nx, ny, nz) <= 0.0
            fsign = jnp.where(front, 1.0, -1.0)
            nx, ny, nz = nx * fsign, ny * fsign, nz * fsign
            # spherical uv (sphere.zig:47-51) on the outward normal
            ony = jnp.clip(ny * fsign, -1.0 + 1e-7, 1.0 - 1e-7)
            theta = _acos(-ony)
            onx = nx * fsign
            onz = nz * fsign
            pole = (jnp.abs(onx) + jnp.abs(onz)) < 1e-12
            onx = jnp.where(pole, 1e-12, onx)
            phi = _atan2(-onz, -onx) + jnp.float32(np.pi)
            uu_ = phi * jnp.float32(1.0 / (2.0 * np.pi))
            vv_ = theta * jnp.float32(1.0 / np.pi)

            # ---- material attrs (where-chain over the M-row table)
            r0_, r1_, r2_, _ = zrng.uniform4_i32(seed_sc, pixel, samp, dep)

            # where-chains restricted by static material class
            # (scene.material_classes): each column only visits rows
            # whose value can matter — defaults are safe because every
            # consumer is masked by the material/texture type anyway
            if mat_classes is None:
                tex_ids = die_ids = col_ids = tuple(range(n_mats))
            else:
                tex_ids, die_ids, col_ids = mat_classes

            def sel(col, ids=None, default=0.0):
                out = jnp.full(blk, jnp.float32(default))
                for m in (range(n_mats) if ids is None else ids):
                    out = jnp.where(ms == m, mat_ref[m, col], out)
                return out

            mtype = sel(0)
            ior = sel(1, die_ids, 1.0)
            textype = sel(2, tex_ids)
            col_r = sel(3, col_ids)
            col_g = sel(4, col_ids)
            col_b = sel(5, col_ids)
            tbase = sel(6, tex_ids)
            uoff = sel(7, tex_ids)
            voff = sel(8, tex_ids)
            th = sel(9, tex_ids, 1.0)
            tw = sel(10, tex_ids, 1.0)

            # texel index (texture.zig:52-74): u flip + offset + wrap
            def wrap(x):
                x = jnp.where(x > 1.0, x - 1.0, x)
                return jnp.where(x < 0.0, x + 1.0, x)

            uu = wrap(1.0 - uu_ + uoff)
            vv = wrap(vv_ + voff)
            ix = jnp.clip((uu * tw).astype(jnp.int32), 0,
                          tw.astype(jnp.int32) - 1)
            iy = jnp.clip((vv * th).astype(jnp.int32), 0,
                          th.astype(jnp.int32) - 1)
            texflat = tbase.astype(jnp.int32) + iy * atlas_w + ix

            # ---- scatter (material.zig:71-128)
            zr = r0_ * 2.0 - 1.0
            phi_l = jnp.float32(2.0 * np.pi) * r1_
            rad = jnp.sqrt(jnp.maximum(0.0, 1.0 - zr * zr))
            rux = rad * jnp.cos(phi_l)
            ruy = rad * jnp.sin(phi_l)
            ruz = zr
            lx, ly, lz = nx + rux, ny + ruy, nz + ruz
            degen = (lx * lx + ly * ly + lz * lz) < 1e-12
            lx = jnp.where(degen, nx, lx)
            ly = jnp.where(degen, ny, ly)
            lz = jnp.where(degen, nz, lz)
            ddn = _dot(dx, dy, dz, nx, ny, nz)
            mx = dx - 2.0 * ddn * nx
            my = dy - 2.0 * ddn * ny
            mz = dz - 2.0 * ddn * nz
            met_absorb = _dot(mx, my, mz, nx, ny, nz) <= 0.0
            ratio = jnp.where(front, 1.0 / ior, ior)
            cos_t = jnp.minimum(-ddn, 1.0)
            sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
            cannot = ratio * sin_t > 1.0
            r0s = (1.0 - ratio) / (1.0 + ratio)
            schl = r0s + (1.0 - r0s) * (1.0 - cos_t) ** 5
            reflect_now = cannot | (schl > r2_)
            rpx = ratio * (dx + cos_t * nx)
            rpy = ratio * (dy + cos_t * ny)
            rpz = ratio * (dz + cos_t * nz)
            kk = jnp.abs(1.0 - (rpx * rpx + rpy * rpy + rpz * rpz))
            kpos = kk > 0.0
            kroot = jnp.where(kpos, jnp.sqrt(jnp.where(kpos, kk, 1.0)), 0.0)
            fx = rpx - kroot * nx
            fy = rpy - kroot * ny
            fz = rpz - kroot * nz
            gx = jnp.where(reflect_now, mx, fx)
            gy = jnp.where(reflect_now, my, fy)
            gz = jnp.where(reflect_now, mz, fz)

            is_lam = mtype < 0.5
            is_met = (mtype >= 0.5) & (mtype < 1.5)
            sx = jnp.where(is_lam, lx, jnp.where(is_met, mx, gx))
            sy = jnp.where(is_lam, ly, jnp.where(is_met, my, gy))
            sz = jnp.where(is_lam, lz, jnp.where(is_met, mz, gz))
            sx, sy, sz = _normalize(sx, sy, sz)

            absorbed = is_met & met_absorb
            miss = processing & ~hit
            sc_ = processing & hit & ~absorbed
            path_done = miss | (processing & hit & absorbed) | exhausted

            use_img = textype > 0.5
            texneed = sc_ & (is_lam | is_met) & use_img
            # texel-value cache: a matching index resolves in-kernel
            # with the EXACT f32 the gather would return — no slot, no
            # block, no launch consumed
            hitc = jnp.zeros(blk, jnp.bool_)
            cvr = jnp.zeros(blk, jnp.float32)
            cvg = jnp.zeros(blk, jnp.float32)
            cvb = jnp.zeros(blk, jnp.float32)
            for k in range(N_CTOT):
                ck, ckr, ckg, ckb = cache[4 * k:4 * k + 4]
                hk = texneed & ~hitc & (texflat == ck)
                cvr = jnp.where(hk, ckr, cvr)
                cvg = jnp.where(hk, ckg, cvg)
                cvb = jnp.where(hk, ckb, cvb)
                hitc = hitc | hk
            texmiss = texneed & ~hitc
            samp2 = samp + path_done.astype(jnp.int32)
            finished = path_done & (samp2 >= swin_end)

            # ---- deferral bookkeeping: K_TEX texel slots + M_REC
            # contribution records; a lane blocks (segment fully
            # suppressed, replayed after the glue resolves) only when
            # every slot / record it needs is occupied.
            # A texmiss whose index already sits in a slot shares it
            # (the resolved value is the same); otherwise allocate the
            # first free slot.
            # single pass (round 4): slots fill in order and are never
            # freed mid-launch, so occupied slots are a PREFIX — any
            # match precedes every free slot, and "check reuse
            # everywhere, else first free" collapses to one ascending
            # scan: match-or-free at slot k settles the miss.
            handled = jnp.zeros(blk, jnp.bool_)
            slot_bit = jnp.zeros(blk, jnp.int32)
            texidx2 = list(texidx)
            if _QUAD:
                # slots are keyed by quad row; the mask bit encodes
                # which sub-texel of the row this need owes (module
                # docstring). -1 >> 2 == -1 never matches a real quad.
                subbit = jnp.left_shift(jnp.int32(1), texflat & 3)
            for k in range(K_TEX):
                if _QUAD:
                    match_k = (texflat >> 2) == (texidx[k] >> 2)
                else:
                    match_k = texflat == texidx[k]
                free_k = texidx[k] < 0
                take = texmiss & ~handled & (match_k | free_k)
                texidx2[k] = jnp.where(take & free_k, texflat, texidx[k])
                if _QUAD:
                    slot_bit = jnp.where(take, subbit << (4 * k), slot_bit)
                else:
                    slot_bit = jnp.where(take, jnp.int32(1 << k), slot_bit)
                handled = handled | take
            tex_block = texmiss & ~handled

            # sky radiance on escape (raytrace.zig:53-58); a sample
            # with outstanding factors parks in a record instead of acc
            tsky = 0.5 * (dy + 1.0)
            skyr = (1.0 - tsky) + tsky * 0.5
            skyg = (1.0 - tsky) + tsky * 0.7
            skyb = (1.0 - tsky) + tsky * 1.0
            park = miss & (tmask != 0)
            mf = (miss & ~park).astype(jnp.float32)
            ar2 = ar + mf * tr * skyr
            ag2 = ag + mf * tg * skyg
            ab2 = ab + mf * tb * skyb

            # throughput: const albedo (and cache-hit texels) applied
            # now; missed image texels ride in the slot mask (factor
            # outstanding, path keeps tracing)
            alr = jnp.where(is_lam | is_met,
                            jnp.where(use_img,
                                      jnp.where(hitc, cvr, 1.0), col_r),
                            1.0)
            alg = jnp.where(is_lam | is_met,
                            jnp.where(use_img,
                                      jnp.where(hitc, cvg, 1.0), col_g),
                            1.0)
            alb = jnp.where(is_lam | is_met,
                            jnp.where(use_img,
                                      jnp.where(hitc, cvb, 1.0), col_b),
                            1.0)
            tr2 = jnp.where(sc_, tr * alr, tr)
            tg2 = jnp.where(sc_, tg * alg, tg)
            tb2 = jnp.where(sc_, tb * alb, tb)

            # tmask transitions: texmiss adds its slot bit (texmiss and
            # path_done are mutually exclusive — a texmiss implies a
            # scatter); park or drop (absorb/exhaust) clears
            tmask2 = tmask | slot_bit
            tmask2 = jnp.where(park | (path_done & ~miss),
                               jnp.int32(0), tmask2)

            ox2 = jnp.where(sc_, px_, ox)
            oy2 = jnp.where(sc_, py_, oy)
            oz2 = jnp.where(sc_, pz_, oz)
            dx2 = jnp.where(sc_, sx, dx)
            dy2 = jnp.where(sc_, sy, dy)
            dz2 = jnp.where(sc_, sz, dz)
            dep2 = jnp.where(sc_, dep + 1, dep)

            # pixel bookkeeping: a finished window's sum goes to a
            # record with mask 0 (record occupancy gates via block)
            com_r, com_g, com_b = ar2, ag2, ab2
            commit = finished
            ar2 = jnp.where(finished, 0.0, ar2)
            ag2 = jnp.where(finished, 0.0, ag2)
            ab2 = jnp.where(finished, 0.0, ab2)

            # record chains: PARK FOLD, then park/commit allocation.
            #
            # A record's identity is packed = slot | mask << 16 (slot
            # <= a few hundred, mask < 2^K_TEX; -1 = free). A park
            # whose (slot, tmask) matches a live record SUMS its
            # contribution into that record instead of allocating:
            # the glue computes rgb * prod(tex[mask]) per record, and
            # (A + B) * t vs A*t + B*t is the same multiply-order-only
            # deviation class as the deferral itself (module
            # docstring); counters and streams are untouched. This is
            # the round-4 launch-stretch mechanism: a texture-dominated
            # pixel's lane used to park once per ESCAPED SAMPLE with an
            # identical mask — records filled within ~a dozen samples
            # and pinned the launch; folded, those collapse to one
            # record per distinct outstanding-mask pattern.
            # Records also fill as a prefix (resolved all-at-once at
            # launch end), so fold-match and first-free collapse into
            # the same single ascending scan as the texel slots: a
            # park folds into a matching occupied record or takes the
            # first free one; a commit (packed id = slot, mask 0 —
            # never collides with a park's nonzero mask) takes the
            # next free record.
            want_p = slot | (tmask << SLOT_SHIFT)
            parked = jnp.zeros(blk, jnp.bool_)
            committed = jnp.zeros(blk, jnp.bool_)
            recs2 = list(recs)
            for m in range(M_REC):
                rr, rg, rb, rp = recs[4 * m:4 * m + 4]
                # == -1, not < 0: in quad mode the widened mask can set
                # the sign bit of an occupied record (MASK_BITS note)
                free_m = rp == -1
                fold_m = park & ~parked & (rp == want_p)
                take_p = park & ~parked & free_m
                pk = fold_m | take_p
                free_m2 = free_m & ~take_p
                take_c = commit & ~committed & free_m2
                recs2[4 * m + 0] = jnp.where(
                    pk, jnp.where(fold_m, rr, 0.0) + tr * skyr,
                    jnp.where(take_c, com_r, rr))
                recs2[4 * m + 1] = jnp.where(
                    pk, jnp.where(fold_m, rg, 0.0) + tg * skyg,
                    jnp.where(take_c, com_g, rg))
                recs2[4 * m + 2] = jnp.where(
                    pk, jnp.where(fold_m, rb, 0.0) + tb * skyb,
                    jnp.where(take_c, com_b, rb))
                recs2[4 * m + 3] = jnp.where(
                    take_p, want_p, jnp.where(take_c, slot, rp))
                parked = parked | pk
                committed = committed | take_c
            park_block = park & ~parked
            commit_block = commit & ~committed

            block_now = run & (tex_block | park_block | commit_block
                               | mesh_block)
            # effective mask: traced segments plus invalid-slot skips
            w = (run & ~block_now) | skip

            adv = finished | skip
            fin_i = adv.astype(jnp.int32)
            slot2 = slot + fin_i
            # slot advance sweeps pixel stripes first, then rotates to
            # the next sample group's pixel set (interleave docstring)
            pidx2 = pidx + fin_i
            wrapm = adv & (pidx2 >= n_stripes)
            pidx2 = jnp.where(wrapm, 0, pidx2)
            if n_gb:
                # balanced map: the next group's base was precomputed
                # on the host; shift the future-base FIFO down
                baseg2 = jnp.where(wrapm, gbs[0], baseg)
                gbs2 = [jnp.where(wrapm, gbs[k + 1], gbs[k])
                        for k in range(n_gb - 1)] + [gbs[-1]]
            else:
                gbs2 = []
                baseg2 = jnp.where(wrapm, baseg + g_shift, baseg)
                baseg2 = jnp.where(baseg2 - base_lo >= n_lanes_t,
                                   baseg2 - n_lanes_t, baseg2)
            swin2 = jnp.where(wrapm, swin + gspp, swin)
            samp2 = jnp.where(adv, swin2, samp2)

            # camera regeneration (camera.zig:46-52; raytrace.zig:174)
            pixel2 = baseg2 + pidx2 * stride
            j0, j1, _, _ = zrng.uniform4_i32(seed_cam, pixel2, samp2,
                                             jnp.zeros_like(dep))
            # pixel -> (px, py) without integer div (measured ~37% of
            # the body's sum-of-parts): f32 reciprocal estimate + exact
            # correction. Valid while pixel < 2^24 (f32-exact ints);
            # n_pixels is far below that for every reference config.
            pf = pixel2.astype(jnp.float32)
            py_i = (pf * (1.0 / fw)).astype(jnp.int32)
            rem = pixel2 - py_i * width
            for _ in range(2):  # estimate is off by <=1 per 4M pixels
                under = rem < 0
                over = rem >= width
                py_i = py_i + jnp.where(over, 1, 0) - jnp.where(under, 1, 0)
                rem = rem - jnp.where(over, width, 0) \
                    + jnp.where(under, width, 0)
            pxf = rem.astype(jnp.float32)
            pyf = py_i.astype(jnp.float32)
            cu = (pxf + j0 - 0.5) / fw
            cv = (pyf + j1 - 0.5) / fh
            cox = cam_ref[0]
            coy = cam_ref[1]
            coz = cam_ref[2]
            ndx = cam_ref[3] + cu * cam_ref[6] + cv * cam_ref[9] - cox
            ndy = cam_ref[4] + cu * cam_ref[7] + cv * cam_ref[10] - coy
            ndz = cam_ref[5] + cu * cam_ref[8] + cv * cam_ref[11] - coz
            ndx, ndy, ndz = _normalize(ndx, ndy, ndz)

            pd = path_done | skip
            ox2 = jnp.where(pd, cox, ox2)
            oy2 = jnp.where(pd, coy, oy2)
            oz2 = jnp.where(pd, coz, oz2)
            dx2 = jnp.where(pd, ndx, dx2)
            dy2 = jnp.where(pd, ndy, dy2)
            dz2 = jnp.where(pd, ndz, dz2)
            tr2 = jnp.where(pd, 1.0, tr2)
            tg2 = jnp.where(pd, 1.0, tg2)
            tb2 = jnp.where(pd, 1.0, tb2)
            dep2 = jnp.where(pd, 0, dep2)

            # single writeback per plane, gated by the effective mask
            up = lambda old, new: jnp.where(w, new, old)
            carry_out = (
                it + 1,
                up(ox, ox2), up(oy, oy2), up(oz, oz2),
                up(dx, dx2), up(dy, dy2), up(dz, dz2),
                up(tr, tr2), up(tg, tg2), up(tb, tb2),
                up(ar, ar2), up(ag, ag2), up(ab, ab2),
                up(dep, dep2), up(samp, samp2), up(slot, slot2),
                up(pidx, pidx2), up(baseg, baseg2), up(swin, swin2),
            ) + tuple(up(o, v) for o, v in zip(gbs, gbs2)) \
              + tuple(cache) + (
                up(tmask, tmask2),
            ) + tuple(up(o, n) for o, n in zip(texidx, texidx2)) \
              + tuple(up(o, n) for o, n in zip(recs, recs2)) + (
                blocked | block_now.astype(jnp.int32),
            )
            if has_mesh:
                # a traced segment consumes/staleifies its answer (the
                # ray advances); skip lanes keep it; blocked lanes are
                # outside w, so an answer pending a texel-slot replay
                # survives. m_req/m_tbest are written UNGATED — blocked
                # lanes must record their request for the glue.
                carry_out = carry_out + (
                    up(m_have, jnp.where(skip, m_have, jnp.int32(0))),
                    m_req, m_tbest,
                )
            cnt = lambda m: jnp.sum((m & w).astype(jnp.int32))
            return carry_out + (
                n_rays + cnt(processing), n_refl + cnt(sc_),
                n_miss + cnt(miss), n_rec + cnt(exhausted),
                n_samp + cnt(path_done), n_tex + cnt(texneed))

        def cond(carry):
            it, slot, blocked = carry[0], carry[15], carry[Q_BLOCKED]
            n_slots_t = params_ref[P_NSLOTS]
            # slot-based (not pixel-validity) so lanes skipping through
            # invalid rotated slots keep the launch running
            alive = slot < n_slots_t
            avail = alive & (blocked == 0)
            n_avail = jnp.sum(avail.astype(jnp.int32))
            n_alive = jnp.sum(alive.astype(jnp.int32))
            return ((it < n_bounce)
                    & (n_avail * exit_den > n_alive * exit_num)
                    & (n_avail > 0))

        zero = jnp.int32(0)
        fz = jnp.zeros(blk, jnp.float32)
        neg1 = jnp.full(blk, -1, jnp.int32)
        iz = jnp.zeros(blk, jnp.int32)
        init = (zero,) + tuple(r[:] for r in state_in) \
            + (iz,) + (neg1,) * K_TEX \
            + (fz, fz, fz, neg1) * M_REC \
            + (iz,) \
            + ((mh_ref[:], iz, fz) if has_mesh else ()) \
            + (zero,) * 6
        fin = jax.lax.while_loop(cond, iter_body, init)
        it_done = fin[0]
        for r, v in zip(state_out, fin[1:1 + n_state]):
            r[:] = v
        local_vals = list(fin[Q_LOCAL:Q_BLOCKED])
        if has_mesh:  # m_req, m_tbest ride after the shared locals
            local_vals += [fin[Q_MESH + 1], fin[Q_MESH + 2]]
        for r, v in zip(local_out, local_vals):
            r[:] = v
        n_rays, n_refl, n_miss, n_rec, n_samp, n_tex = fin[Q_COUNT:]

        i = pl.program_id(0)
        counts_o[i, 0] = n_rays
        counts_o[i, 1] = n_refl
        counts_o[i, 2] = n_miss
        counts_o[i, 3] = n_rec
        counts_o[i, 4] = n_samp
        counts_o[i, 5] = it_done
        counts_o[i, 6] = n_tex
        # diagnostic: lanes blocked when the launch exited
        counts_o[i, 7] = jnp.sum((fin[Q_BLOCKED] != 0).astype(jnp.int32))

    f32 = jnp.float32
    i32 = jnp.int32
    st = lambda dt: jax.ShapeDtypeStruct((R_total, L), dt)
    # persistent state planes: 12 f32 + dep/samp/slot/pidx/baseg/swin
    # i32 + cache (idx i32 + rgb f32) x N_CACHE; then launch-local
    # tmask i32 + texidx i32 x K_TEX + (rgb f32, packed slot|mask i32)
    # x M_REC; counters
    state_dts = ([st(f32)] * 12 + [st(i32)] * (6 + n_gb)
                 + [st(i32), st(f32), st(f32), st(f32)] * N_CTOT)
    local_dts = ([st(i32)] + [st(i32)] * K_TEX
                 + [st(f32), st(f32), st(f32), st(i32)] * M_REC)
    if has_mesh:
        local_dts = local_dts + [st(i32), st(f32)]  # m_req, m_tbest
    out_shape = tuple(
        state_dts + local_dts
        + [jax.ShapeDtypeStruct((n_blocks, N_COUNTS), i32)]
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    lane_blk = lambda: pl.BlockSpec((R, L), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
    # mesh inputs sit between base and the state planes: box SMEM + 6
    # per-lane answer planes (m_have, m_t, m_nx, m_ny, m_nz, m_mid)
    mesh_in = ([smem()] + [lane_blk()] * 6) if has_mesh else []
    in_specs = [smem()] * 4 + [lane_blk()] + mesh_in \
        + [lane_blk()] * n_state
    out_specs = tuple(
        [lane_blk()] * (n_state + len(local_dts))
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
    )
    st0 = 5 + (7 if has_mesh else 0)  # first state-plane input index
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        # state planes update in place: input st0+k donates its buffer
        # to output k
        input_output_aliases=(
            {st0 + k: k for k in range(n_state)} if _ALIAS else {}),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret_mode(),
    )


def _interpret_mode() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# XLA glue: while_loop over launches + one texel gather per launch
# ---------------------------------------------------------------------------


def wavefront_trace_pallas3(
    scene: sc.Scene,
    camera,
    pixel_base: jnp.ndarray,  # (N,) int32, N divisible by 128
    seed,
    width,
    height,
    spp,
    max_depth,
    sample_start=0,
    n_slots: int = 1,
    pixel_stride=None,
    n_pixels=None,
    n_bounce: int = B_DEFAULT,
    r_blk: int = R_BLK,
    exit_frac: tuple = EXIT_FRAC,
    return_launches: bool = False,
    sample_groups: int = 1,
    mat_classes=None,
    tri_flash=None,
    permuted_base: bool = False,
    return_misses: bool = False,
):
    """Same contract as render.wavefront_trace (sphere-only scenes):
    lane ``i`` of ``pixel_base`` traces pixels ``base[i] + k*stride``.
    Returns ``(slot_sums (n_slots, N, 3), counters (6, 2))`` — identical
    layout to the XLA wavefront; counters bit-exact, sums equal up to
    texel-factor multiply order (see module docstring).

    ``sample_groups`` > 1 splits each pixel's spp into G windows traced
    by G different lanes (rotated base mapping, N_STATE docstring) —
    cuts the per-lane texel-event maximum and with it the launch count.
    The returned slot planes keep the caller-visible pixel mapping
    (group planes are rolled back and summed), so only float summation
    order changes; counters stay bit-exact. Requires ``pixel_base`` to
    be a contiguous range (lane i traces base_lo + i).

    ``tri_flash`` (ops/flash_intersect.TriPlanes with the const-material
    ``attrs`` table) enables MIXED scenes: segments that can reach the
    mesh root AABB block in-kernel and are batch-resolved here with one
    flash RL call per launch, seeded by each lane's sphere-winner t
    (non-requesting lanes seed 0, so their chunk work lists are empty).
    Counters are bit-exact vs the XLA mesh wavefront in interpret mode
    (identical logic; blocking changes timing, never events) and
    KNOB-STABLE on hardware (any K_TEX/N_CACHE/exit_frac combination
    reproduces the same events bit-for-bit). Across ENGINES on
    hardware, Mosaic and XLA codegen fuse the borderline f32
    comparisons (triangle ``det`` cutoff, t-winner near-ties)
    differently: events diverge at ~2e-5/segment on mesh scenes,
    ~2.5e-8 on sphere scenes — each engine individually deterministic
    (tools/mesh_parity_probe.py, PERF.md round 4).

    ``n_gb`` in the kernel builder / ``permuted_base`` here enable the
    PROFILE-BALANCED lane map (balance.py): ``pixel_base`` may be any
    permutation of ``[0, N)`` — group g's base for lane i becomes
    ``pixel_base[(i + g*shift) mod N]`` (the analytic identity map is
    the special case perm = arange). The G-1 future group bases ride as
    extra persistent planes and FIFO-shift on window wrap, so the hot
    loop never needs a table lookup; the roll-fold below is unchanged
    because the group rotation still happens in LANE space. Purpose:
    the per-launch atlas gather is pinned by the heaviest lane's texel
    -miss total (the conservation law, PERF.md); assigning pixel
    columns to lane orbits by measured miss cost flattens that maximum
    toward the mean. Counters stay bit-exact (windows keep their
    (pixel, sample-range) identity; only which lane traces them moves).

    ``return_misses`` appends a per-lane texel-slot-occupancy total
    (the calibration signal for balance.py) to the return tuple."""
    from zraytrace_tpu import camera as cam_mod
    from zraytrace_tpu.render import N_COUNTERS, _u64_add

    has_mesh = tri_flash is not None
    if has_mesh:
        assert tri_flash.attrs is not None, (
            "mesh megakernel needs the const-material attrs table")
    else:
        assert scene.n_triangles == 0
    assert scene.n_spheres > 0
    n = pixel_base.shape[0]
    assert n % LANE == 0, n
    R = n // LANE
    assert R % min(r_blk, R) == 0, (R, r_blk)
    shape = (R, LANE)
    G = int(sample_groups)
    assert G >= 1
    # The packed record id is slot | tmask << SLOT_SHIFT (records
    # section of make_bounce_kernel3): the slot counter sweeps pixel
    # stripes x sample groups and must fit the slot field or record
    # sums decode into the wrong stripe/texel. Reachable only with a
    # pathologically narrow wavefront on a huge image (e.g. 256 lanes x
    # 4M pixels) — or quad mode at K_TEX > 4, whose widened mask
    # shrinks the slot field; every product configuration is ~16 slots
    # x G=8.
    if n_slots * G >= (1 << SLOT_SHIFT):  # ValueError: must survive -O
        raise ValueError(
            f"slot counter {n_slots}x{G} overflows the {SLOT_SHIFT}-bit "
            "packed record id — widen the wavefront (n_lanes) for this "
            "image" + (" or disable ZRAYTRACE_K3_QUAD" if _QUAD else ""))
    if _QUAD and scene.atlas.shape[2] % 4 != 0:
        raise ValueError(
            f"quad texel slots need atlas width % 4 == 0, got "
            f"{scene.atlas.shape[2]}")

    n_gb = G - 1 if (permuted_base and G > 1) else 0
    n_state = N_STATE + n_gb

    tables = prepare_tables(scene, camera)
    S = int(tables.spheres.shape[0])
    M = int(tables.mats.shape[0])
    kernel = make_bounce_kernel3(S, M, shape, n_bounce, r_blk, exit_frac,
                                 mat_classes, has_mesh=has_mesh, n_gb=n_gb)

    width_i = jnp.asarray(width, jnp.int32)
    height_i = jnp.asarray(height, jnp.int32)
    spp_i = jnp.asarray(spp, jnp.int32)
    sstart_i = jnp.asarray(sample_start, jnp.int32)
    stride_i = jnp.asarray(n if pixel_stride is None else pixel_stride,
                           jnp.int32)
    npix_i = (width_i * height_i if n_pixels is None
              else jnp.asarray(n_pixels, jnp.int32))
    atlas_w = scene.atlas.shape[2]
    # interleave geometry: group g of stripe p is traced by the lane
    # whose rotated base hits the pixel; shift n/G spreads a pixel's
    # groups evenly over the lane-id space
    base_lo_i = jnp.min(pixel_base).astype(jnp.int32)
    shift_i = jnp.asarray(n // G if G > 1 else 0, jnp.int32)
    gspp_i = (spp_i + G - 1) // G
    params = jnp.stack([
        width_i, height_i, sstart_i + spp_i,
        jnp.asarray(max_depth, jnp.int32),
        jnp.asarray(seed, jnp.int32), npix_i, stride_i, sstart_i,
        jnp.asarray(atlas_w, jnp.int32),
        jnp.asarray(n_slots * G, jnp.int32),
        jnp.asarray(n_slots, jnp.int32), shift_i,
        jnp.asarray(n, jnp.int32), gspp_i, base_lo_i,
    ])

    j = zrng.uniform4(seed, pixel_base, sstart_i, 0, zrng.STREAM_CAMERA)
    px = (pixel_base % width_i).astype(jnp.float32)
    py = (pixel_base // width_i).astype(jnp.float32)
    u, v = cam_mod.pixel_uv(px, py, j[:, 0], j[:, 1],
                            width_i.astype(jnp.float32),
                            height_i.astype(jnp.float32))
    o0, d0 = cam_mod.get_rays(camera, u, v)

    r2 = lambda x: x.reshape(shape)
    KEYS = ("ox", "oy", "oz", "dx", "dy", "dz", "tr", "tg", "tb",
            "ar", "ag", "ab", "dep", "samp", "slot", "pidx", "baseg",
            "swin") + tuple(f"gb{k}" for k in range(1, n_gb + 1)) + tuple(
        f"c{k}{f}" for k in range(N_CTOT) for f in ("idx", "r", "g", "b"))
    base = pixel_base.reshape(shape)
    n_slots_t = n_slots * G
    state = dict(
        p=dict(
            ox=r2(o0[:, 0]), oy=r2(o0[:, 1]), oz=r2(o0[:, 2]),
            dx=r2(d0[:, 0]), dy=r2(d0[:, 1]), dz=r2(d0[:, 2]),
            tr=jnp.ones(shape), tg=jnp.ones(shape), tb=jnp.ones(shape),
            ar=jnp.zeros(shape), ag=jnp.zeros(shape), ab=jnp.zeros(shape),
            dep=jnp.zeros(shape, jnp.int32),
            samp=jnp.full(shape, sstart_i, jnp.int32),
            slot=jnp.zeros(shape, jnp.int32),
            pidx=jnp.zeros(shape, jnp.int32),
            baseg=base,
            swin=jnp.full(shape, sstart_i, jnp.int32),
            # balanced map: group g's base for lane i is
            # pixel_base[(i + g*shift) mod n] = roll(pixel_base, -g*s)
            **{f"gb{k}": r2(jnp.roll(pixel_base, -k * (n // G)))
               for k in range(1, n_gb + 1)},
            **{f"c{k}{f}": (jnp.full(shape, -1, jnp.int32) if f == "idx"
                            else jnp.zeros(shape))
               for k in range(N_CTOT) for f in ("idx", "r", "g", "b")},
        ),
        ss=jnp.zeros((3 * n_slots, R, LANE), jnp.float32),
        counters=jnp.zeros((N_COUNTERS, 2), jnp.uint32),
        launches=jnp.uint32(0),
    )
    if has_mesh:
        # mesh root AABB (padding chunk rows inherit real bounds —
        # still a subset) + per-launch answer planes, all initially
        # unanswered: every mesh-reaching lane blocks once in launch 0
        box = jnp.concatenate([tri_flash.bounds[:, 0:3].min(axis=0),
                               tri_flash.bounds[:, 3:6].max(axis=0)])
        state["m"] = dict(
            have=jnp.zeros(shape, jnp.int32),
            t=jnp.full(shape, 3.4e38, jnp.float32),
            nx=jnp.zeros(shape), ny=jnp.zeros(shape), nz=jnp.zeros(shape),
            mid=jnp.zeros(shape, jnp.int32),
        )
    if _DIAG:
        # [0]: total occupied texel slots over all launches (gather rows
        # actually needed); [1+k]: launches where slot k was occupied
        # anywhere (cond-gated gathers actually executed).
        state["diag"] = jnp.zeros((1 + K_TEX,), jnp.uint32)
    if _DIAG or return_misses:
        # per-lane cache-miss totals: launch count is pinned by the
        # heaviest lane's miss count / K_TEX — max/mean is the
        # imbalance factor; balance.py feeds these back as the
        # profile-balanced lane map's cost signal.
        state["misses"] = jnp.zeros(shape, jnp.int32)
    # The per-launch texel resolve is the wall (measured 65% of bench
    # wall at 11.8 ns/row for the naive 2D-indexed (F, 3) f32 gather).
    # Pack RGB into ONE int32 row (atlas texels are exactly u8/255 —
    # io/png.py:23 — so round-trip is bit-exact: f32(k)/255.0 is the
    # same IEEE op on both sides), gather with flat 1D indices and
    # promise_in_bounds, and unpack with int32 shifts.
    atlas_flat = scene.atlas.reshape(-1, 3)
    _au8 = jnp.round(atlas_flat * 255.0).astype(jnp.int32)
    atlas_packed = (_au8[:, 0] << 16) | (_au8[:, 1] << 8) | _au8[:, 2]
    # quad mode: one gathered ROW carries four consecutive texels —
    # same per-row gather cost (width-independent, PERF.md), 4x the
    # texels. atlas_w % 4 == 0 keeps quads inside one atlas row.
    atlas_quad = (atlas_flat.reshape(-1, 12) if _QUAD else None)

    def cond(s):
        # slot-based: a lane on an invalid rotated slot still has work
        # (it skip-advances in-kernel)
        return jnp.any(s["p"]["slot"] < n_slots_t)

    n_local = N_LOCAL + (2 if has_mesh else 0)

    def body(s):
        args = [params, tables.cam, tables.spheres, tables.mats, base]
        if has_mesh:
            m = s["m"]
            args += [box, m["have"], m["t"], m["nx"], m["ny"], m["nz"],
                     m["mid"]]
        args += [s["p"][k] for k in KEYS]
        outs = kernel(*args)
        p = dict(zip(KEYS, outs[:n_state]))
        ll = outs[n_state:n_state + n_local]
        tmask_o = ll[0]
        tex_o = ll[1:1 + K_TEX]
        recs_o = ll[1 + K_TEX:1 + K_TEX + 4 * M_REC]
        counts = outs[n_state + n_local]

        # the one gather per launch resolves every outstanding texel
        # slot: thr multiplies the slots its mask references; records
        # flush (rgb x their referenced texels) into their slot plane
        idx_all = jnp.stack(tex_o)  # (K, R, 128)
        if _NOGATHER:  # timing probe: constant texel, image wrong
            tex_rgb = jnp.full(
                (K_TEX,) + shape + ((12,) if _QUAD else (3,)), 0.5,
                jnp.float32)
        elif _QUAD:
            # (K, R, 128, 12): slot k's quad row; sub-texel s occupies
            # channels 3s..3s+2 (exact atlas f32 values)
            tex_rgb = atlas_quad[jnp.maximum(idx_all, 0) >> 2]
        elif _PACKED:
            flat = jnp.maximum(idx_all, 0).reshape(-1)
            packed = atlas_packed.at[flat].get(
                mode="promise_in_bounds").reshape((K_TEX,) + shape)
            tex_rgb = jnp.stack([
                ((packed >> 16) & 255).astype(jnp.float32) / 255.0,
                ((packed >> 8) & 255).astype(jnp.float32) / 255.0,
                (packed & 255).astype(jnp.float32) / 255.0,
            ], axis=-1)
        elif _PROMISE:
            flat = jnp.maximum(idx_all, 0).reshape(-1)
            tex_rgb = atlas_flat.at[flat].get(
                mode="promise_in_bounds").reshape((K_TEX,) + shape + (3,))
        elif _CONDGATHER:
            def _gk(k):
                return jax.lax.cond(
                    jnp.any(tex_o[k] >= 0),
                    lambda: atlas_flat[jnp.maximum(tex_o[k], 0)],
                    lambda: jnp.zeros(shape + (3,), jnp.float32))
            tex_rgb = jnp.stack([_gk(k) for k in range(K_TEX)])
        else:
            tex_rgb = atlas_flat[jnp.maximum(idx_all, 0)]

        def mask_mul(rgb_r, rgb_g, rgb_b, mask):
            if _QUAD:
                for k in range(K_TEX):
                    for s_ in range(4):
                        bit = ((mask >> (4 * k + s_)) & 1) == 1
                        rgb_r = jnp.where(
                            bit, rgb_r * tex_rgb[k, ..., 3 * s_ + 0], rgb_r)
                        rgb_g = jnp.where(
                            bit, rgb_g * tex_rgb[k, ..., 3 * s_ + 1], rgb_g)
                        rgb_b = jnp.where(
                            bit, rgb_b * tex_rgb[k, ..., 3 * s_ + 2], rgb_b)
                return rgb_r, rgb_g, rgb_b
            for k in range(K_TEX):
                bit = ((mask >> k) & 1) == 1
                rgb_r = jnp.where(bit, rgb_r * tex_rgb[k, ..., 0], rgb_r)
                rgb_g = jnp.where(bit, rgb_g * tex_rgb[k, ..., 1], rgb_g)
                rgb_b = jnp.where(bit, rgb_b * tex_rgb[k, ..., 2], rgb_b)
            return rgb_r, rgb_g, rgb_b

        p["tr"], p["tg"], p["tb"] = mask_mul(
            p["tr"], p["tg"], p["tb"], tmask_o)
        resolved = []
        mbits_all = (1 << (4 * K_TEX if _QUAD else K_TEX)) - 1
        sbits_all = (1 << SLOT_SHIFT) - 1
        for m in range(M_REC):
            rr, rg, rb, rp = recs_o[4 * m:4 * m + 4]
            # unpack slot | mask << SLOT_SHIFT (-1 = free -> slot -1,
            # mask 0); == -1 / field masks because a quad-mode mask may
            # occupy the sign bit (MASK_BITS note at top)
            occ = rp != -1
            rs_ = jnp.where(occ, rp & sbits_all, -1)
            rk = jnp.where(occ, (rp >> SLOT_SHIFT) & mbits_all, 0)
            rr, rg, rb = mask_mul(rr, rg, rb, rk)
            resolved.append((rr, rg, rb, rs_))

        def texel_rgb(k):
            """Slot k's EXACT resolved texel (the stored first-need
            index): in quad mode select its sub-texel channels from
            the fetched quad row."""
            if not _QUAD:
                return (tex_rgb[k, ..., 0], tex_rgb[k, ..., 1],
                        tex_rgb[k, ..., 2])
            sub = tex_o[k] & 3
            out = []
            for c in range(3):
                v = tex_rgb[k, ..., c]
                for s_ in range(1, 4):
                    v = jnp.where(sub == s_, tex_rgb[k, ..., 3 * s_ + c], v)
                out.append(v)
            return tuple(out)

        # refresh the in-kernel texel cache with the resolved values:
        # entry 0 takes the newest texel, older entries shift (FIFO)
        for k in range(K_TEX):
            has = tex_o[k] >= 0
            vr_, vg_, vb_ = texel_rgb(k)
            for c in range(N_CACHE - 1, 0, -1):
                for f in ("idx", "r", "g", "b"):
                    p[f"c{c}{f}"] = jnp.where(
                        has, p[f"c{c - 1}{f}"], p[f"c{c}{f}"])
            p["c0idx"] = jnp.where(has, tex_o[k], p["c0idx"])
            p["c0r"] = jnp.where(has, vr_, p["c0r"])
            p["c0g"] = jnp.where(has, vg_, p["c0g"])
            p["c0b"] = jnp.where(has, vb_, p["c0b"])

        # newest-resolve planes feed both share mechanisms below
        if (_SHARE and G > 1) or N_SHARE > 0:
            nh = jnp.zeros(shape, jnp.bool_)
            nidx = jnp.full(shape, -1, jnp.int32)
            nr = jnp.zeros(shape, jnp.float32)
            ng_ = jnp.zeros(shape, jnp.float32)
            nb = jnp.zeros(shape, jnp.float32)
            for k in range(K_TEX):
                hk = tex_o[k] >= 0
                vr_, vg_, vb_ = texel_rgb(k)
                nh = nh | hk
                nidx = jnp.where(hk, tex_o[k], nidx)
                nr = jnp.where(hk, vr_, nr)
                ng_ = jnp.where(hk, vg_, ng_)
                nb = jnp.where(hk, vb_, nb)

            def _rollg(x, off):
                return jnp.roll(x.reshape(-1), off).reshape(shape)

        # neighbor-shared entries (N_SHARE docstring at top): entry
        # N_CACHE+j keeps the last-known newest resolve of the lane at
        # flat offset SHARE_OFFS[j] — direct assignment, own FIFO
        # untouched.
        for j, doff in enumerate(SHARE_OFFS):
            rh = _rollg(nh, doff)
            key = f"c{N_CACHE + j}"
            p[key + "idx"] = jnp.where(rh, _rollg(nidx, doff),
                                       p[key + "idx"])
            p[key + "r"] = jnp.where(rh, _rollg(nr, doff), p[key + "r"])
            p[key + "g"] = jnp.where(rh, _rollg(ng_, doff), p[key + "g"])
            p[key + "b"] = jnp.where(rh, _rollg(nb, doff), p[key + "b"])

        # cross-group cache share (_SHARE docstring at top): roll each
        # lane's NEWEST resolved (idx, rgb) across the G-1 group
        # offsets and push it — dedup-checked so repeated footprint
        # texels don't thrash the FIFO — into the lanes that trace the
        # same pixel's other sample windows.
        if _SHARE and G > 1:
            share_shift = n // G

            def _push(has, idx, vr, vg, vb):
                dup = jnp.zeros(shape, jnp.bool_)
                for c in range(N_CACHE):
                    dup = dup | (p[f"c{c}idx"] == idx)
                do = has & ~dup
                for c in range(N_CACHE - 1, 0, -1):
                    for f in ("idx", "r", "g", "b"):
                        p[f"c{c}{f}"] = jnp.where(
                            do, p[f"c{c - 1}{f}"], p[f"c{c}{f}"])
                p["c0idx"] = jnp.where(do, idx, p["c0idx"])
                p["c0r"] = jnp.where(do, vr, p["c0r"])
                p["c0g"] = jnp.where(do, vg, p["c0g"])
                p["c0b"] = jnp.where(do, vb, p["c0b"])

            def _rollp(x, off):
                return jnp.roll(x.reshape(-1), off).reshape(shape)

            if _SHARE_ROT and G > 2:
                dsel = 1 + (s["launches"] % jnp.uint32(G - 1)).astype(
                    jnp.int32)
                off = dsel * jnp.int32(share_shift)
                _push(_rollp(nh, off), _rollp(nidx, off),
                      _rollp(nr, off), _rollp(ng_, off), _rollp(nb, off))
            else:
                for d in range(1, G):
                    off = d * share_shift
                    _push(_rollp(nh, off), _rollp(nidx, off),
                          _rollp(nr, off), _rollp(ng_, off), _rollp(nb, off))

        # fold records straight into the CALLER's P pixel planes: group
        # g's contribution at lane i belongs to pixel i + g*shift, i.e.
        # the g-plane rolled forward — the G rolls are static slices XLA
        # fuses into the one add per stripe, so ss traffic stays 3*P
        # planes per launch instead of 3*P*G
        ss = s["ss"]
        shift = n // G if G > 1 else 0

        def rollg(x, g):
            if g == 0 or shift == 0:
                return x
            return jnp.roll(x.reshape(-1), g * shift).reshape(shape)

        for pstripe in range(n_slots):
            acc_r = acc_g = acc_b = jnp.zeros(shape, jnp.float32)
            for g in range(G):
                k = g * n_slots + pstripe
                gr = gg = gb = jnp.zeros(shape, jnp.float32)
                for rr, rg, rb, rs_ in resolved:
                    mm = rs_ == k
                    gr = gr + jnp.where(mm, rr, 0.0)
                    gg = gg + jnp.where(mm, rg, 0.0)
                    gb = gb + jnp.where(mm, rb, 0.0)
                acc_r += rollg(gr, g)
                acc_g += rollg(gg, g)
                acc_b += rollg(gb, g)
            ss = ss.at[3 * pstripe + 0].add(acc_r)
            ss = ss.at[3 * pstripe + 1].add(acc_g)
            ss = ss.at[3 * pstripe + 2].add(acc_b)

        counters = s["counters"]
        totals = counts.sum(axis=0)
        totals = totals.at[5].set(totals[5] // jnp.int32(counts.shape[0]))
        for slot_i in range(6):
            counters = counters.at[slot_i].set(
                _u64_add(counters[slot_i], totals[slot_i].astype(jnp.uint32))
            )
        out = dict(p=p, ss=ss, counters=counters,
                   launches=s["launches"] + jnp.uint32(1))
        if has_mesh:
            # batch-resolve the blocked lanes' closest triangle: ONE
            # flash RL call over all lanes, running winner seeded with
            # each requester's sphere-winner t (strict <, so the sphere
            # keeps exact ties exactly like trace_closest); lanes that
            # didn't request seed 0, making their chunk work lists
            # empty. One attrs row gather per lane fetches the winner's
            # unit normal + material id (render.py flash-attrs path).
            from zraytrace_tpu.ops.flash_intersect import (
                flash_intersect_triangles,
            )

            mreq_o = ll[1 + K_TEX + 4 * M_REC]
            mtb_o = ll[2 + K_TEX + 4 * M_REC]
            req = mreq_o.reshape(-1) > 0
            o3 = jnp.stack([p["ox"].reshape(-1), p["oy"].reshape(-1),
                            p["oz"].reshape(-1)], axis=-1)
            d3 = jnp.stack([p["dx"].reshape(-1), p["dy"].reshape(-1),
                            p["dz"].reshape(-1)], axis=-1)
            seed_t = jnp.where(req, mtb_o.reshape(-1), jnp.float32(0.0))
            tt, tidx, thit, _ = flash_intersect_triangles(
                tri_flash, o3, d3, jnp.float32(1e-3), t_init=seed_t)
            at = tri_flash.attrs[tidx]
            win = thit & req
            out["m"] = dict(
                have=mreq_o,
                t=jnp.where(win, tt, 3.4e38).reshape(shape),
                nx=jnp.where(win, at[:, 0], 0.0).reshape(shape),
                ny=jnp.where(win, at[:, 1], 0.0).reshape(shape),
                nz=jnp.where(win, at[:, 2], 0.0).reshape(shape),
                mid=jnp.where(win, at[:, 3], 0.0)
                    .astype(jnp.int32).reshape(shape),
            )
        if _DIAG:
            diag = s["diag"]
            for k in range(K_TEX):
                occ_k = jnp.sum((tex_o[k] >= 0).astype(jnp.uint32))
                diag = diag.at[0].add(occ_k)
                diag = diag.at[1 + k].add((occ_k > 0).astype(jnp.uint32))
            out["diag"] = diag
        if _DIAG or return_misses:
            miss = s["misses"]
            for k in range(K_TEX):
                miss = miss + (tex_o[k] >= 0).astype(jnp.int32)
            out["misses"] = miss
        return out

    final = jax.lax.while_loop(cond, body, state)
    # (3*n_slots, R, 128) -> (n_slots, N, 3); already in the caller's
    # pixel mapping (group rolls happen per launch)
    sums = jnp.transpose(final["ss"].reshape(n_slots, 3, n), (0, 2, 1))
    extra = ()
    if return_launches:
        extra = (final["launches"],)
        if _DIAG:
            extra = extra + (final["diag"], final["misses"])
    if return_misses:
        extra = extra + (final["misses"].reshape(-1),)
    if extra:
        return (sums, final["counters"]) + extra
    return sums, final["counters"]


_wavefront_pallas3_jit = jax.jit(
    wavefront_trace_pallas3,
    static_argnames=("n_slots", "n_bounce", "r_blk", "exit_frac",
                     "return_launches", "sample_groups", "mat_classes",
                     "permuted_base", "return_misses"),
)
