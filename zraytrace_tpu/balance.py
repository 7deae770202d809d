"""Profile-guided balanced lane assignment for the bounce megakernel.

The megakernel's per-launch atlas gather obeys a conservation law
(PERF.md): gather rows >= max_lane_texel_misses x lanes, because every
launch gathers K_TEX rows for EVERY lane and a launch resolves at most
K_TEX misses per lane. The pixel->lane map therefore sets the gather
floor through the heaviest lane, and the measured imbalance
(max/mean ~ 1.9) sits exactly at the iid-random level — a cost-blind
map cannot do better, but a cost-AWARE one can.

Texel-miss cost is statistically pinned to the pixel (paths from pixels
over the textured spheres re-need texels; sky pixels never do), so a
cheap low-spp calibration render measuring each lane column's miss
count predicts the full render's per-column cost well. This module
turns those measurements into a lane permutation:

- Under the sample-interleave schedule (ops/bounce_kernel3), lane i's
  windows are the pixel columns ``{(i + g*shift) mod n : g in [0, G)}``
  with ``shift = n // G`` — the orbit of ``i`` under +shift is exactly
  the residue class ``i mod shift``, so lanes ``i`` and ``i + shift``
  trace the SAME column set and there are only ``shift`` distinct lane
  cost classes, each taking ``G`` columns.
- Balancing is therefore a G-way multiway partition: assign the n
  measured column costs to ``shift`` classes of exactly ``G`` columns
  with near-equal sums (greedy largest-first; residual error is far
  below sampling noise).
- The permutation ``perm`` places class r's columns at lane-space
  positions ``{r + k*shift}``; the kernel traces pixel ``perm[l]`` for
  lane-space position ``l`` (``permuted_base=True`` carries the G
  future bases as planes, so the hot loop stays table-free).

Counters are bit-exact under any assignment (PCG4D streams are keyed
by (pixel, sample)); pixel sums change only in float summation order.

Reference: the pixel loop this redistributes is raytrace.zig:163-187;
the reference has no analogue (single thread, no assignment problem).
"""

from __future__ import annotations

import heapq

import numpy as np


def balance_perm(column_cost: np.ndarray, sample_groups: int) -> np.ndarray:
    """Permutation of ``[0, n)`` placing pixel columns so that every
    lane orbit (residue class mod ``n // G``) has near-equal total cost.

    ``column_cost[j]``: measured cost of pixel column ``j`` (per-lane
    texel-miss counts from a calibration render with the identity map
    and G=1). Returns ``perm`` with ``perm[l]`` = pixel-column id for
    lane-space position ``l``.
    """
    cost = np.asarray(column_cost, np.float64)
    n = cost.shape[0]
    G = int(sample_groups)
    if G <= 1 or n % G:
        return np.arange(n, dtype=np.int32)
    shift = n // G

    order = np.argsort(-cost, kind="stable")
    # greedy largest-first into `shift` bins of capacity G
    heap = [(0.0, r) for r in range(shift)]
    heapq.heapify(heap)
    bins = [[] for _ in range(shift)]
    for j in order:
        while True:
            s, r = heapq.heappop(heap)
            if len(bins[r]) < G:
                break
        bins[r].append(j)
        if len(bins[r]) < G:
            heapq.heappush(heap, (s + cost[j], r))
    perm = np.empty(n, np.int32)
    for r in range(shift):
        for k, j in enumerate(bins[r]):
            perm[r + k * shift] = j
    return perm


def orbit_sums(column_cost: np.ndarray, perm: np.ndarray,
               sample_groups: int) -> np.ndarray:
    """Per-lane-class cost totals under ``perm`` (diagnostic)."""
    cost = np.asarray(column_cost, np.float64)
    n = cost.shape[0]
    G = int(sample_groups)
    shift = n // G
    c = cost[perm].reshape(G, shift)
    return c.sum(axis=0)


def calibrate_column_costs(
    scene,
    camera,
    width: int,
    height: int,
    max_depth: int,
    n_lanes: int,
    n_slots: int,
    spp: int = 32,
    seed: int = 42,
    n_bounce: int = 160,
    r_blk: int = 32,
) -> np.ndarray:
    """Measure per-column texel-miss costs with a short identity-map
    G=1 render (``return_misses``). One extra compiled program shape;
    the result depends only on (scene, camera, resolution), so callers
    can cache it across spp/depth variations.
    """
    import jax.numpy as jnp

    from zraytrace_tpu.ops.bounce_kernel3 import _wavefront_pallas3_jit
    from zraytrace_tpu.scene import material_classes

    ids = jnp.arange(n_lanes, dtype=jnp.int32)
    out = _wavefront_pallas3_jit(
        scene, camera, ids, seed, width, height, spp, max_depth,
        0, n_slots, n_lanes, width * height,
        n_bounce=n_bounce, r_blk=r_blk, sample_groups=1,
        mat_classes=material_classes(scene), return_misses=True,
    )
    return np.asarray(out[-1], np.int64)


def balanced_pixel_base(scene, camera, width, height, max_depth,
                        n_lanes, n_slots, sample_groups,
                        calib_spp: int = 32, seed: int = 42,
                        n_bounce: int = 160, r_blk: int = 32):
    """Calibrate + partition; returns ``(perm (n,) int32, stats dict)``."""
    cost = calibrate_column_costs(
        scene, camera, width, height, max_depth, n_lanes, n_slots,
        spp=calib_spp, seed=seed, n_bounce=n_bounce, r_blk=r_blk)
    perm = balance_perm(cost, sample_groups)
    t_new = orbit_sums(cost, perm, sample_groups)
    t_old = orbit_sums(cost, np.arange(n_lanes, dtype=np.int32),
                       sample_groups)
    stats = dict(
        max_over_mean_before=float(t_old.max() / max(t_old.mean(), 1e-9)),
        max_over_mean_after=float(t_new.max() / max(t_new.mean(), 1e-9)),
        total_misses=int(cost.sum()),
    )
    return perm, stats


def balanced_base_cached(scene, camera, width, height, max_depth,
                         n_lanes, n_slots, sample_groups,
                         calib_spp: int = 64, seed: int = 42,
                         n_bounce: int = 160, r_blk: int = 32,
                         cache_dir=None):
    """Disk-cached balanced lane map — scene preprocessing for
    ``render()`` (round 4). The calibration render costs a few seconds
    of device time but depends only on (scene, camera, resolution,
    schedule geometry), so it is computed once and keyed like the XLA
    compile cache. At the round-4 operating point (exit 1/2, K_TEX=6)
    launches stretch deep enough that the per-lane miss imbalance is
    worth ~3-4% end to end (PERF.md) — no longer bench-only polish.

    Returns ``(perm (n,) int32, stats | None)`` — stats is None on a
    cache hit.
    """
    import hashlib
    import os
    import tempfile

    # every Scene leaf that shapes the texel-miss profile the
    # calibration measures: geometry, material routing, AND the full
    # texture tables (tex_type flips color<->image, tex_image/
    # tex_offset move which texels a pixel touches, atlas_hw changes
    # the flat indices) — omitting any of these silently reuses a perm
    # calibrated for a different miss profile
    parts = [np.asarray(x).tobytes() for x in (
        scene.sph_center, scene.sph_radius, scene.sph_mat,
        scene.mat_type, scene.mat_ior, scene.mat_tex, scene.tex_type,
        scene.tex_color, scene.tex_image, scene.tex_offset,
        scene.atlas_hw, scene.atlas)]
    for v in camera:
        parts.append(np.asarray(v).tobytes())
    # kernel knobs that reshape the miss profile the calibration
    # measures: K_TEX/N_CACHE move the slot/cache schedule; quad mode
    # (round 5) changes what a "miss" even keys on (quad rows)
    from zraytrace_tpu.ops import bounce_kernel3 as _k3

    parts.append(np.asarray(
        [width, height, max_depth, n_lanes, n_slots, sample_groups,
         calib_spp, seed, n_bounce, r_blk,
         _k3.K_TEX, _k3.N_CACHE, int(_k3._QUAD)], np.int64).tobytes())
    key = hashlib.sha256(b"".join(parts)).hexdigest()[:24]
    cdir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "zraytrace_tpu", "balance")
    path = os.path.join(cdir, f"{key}.npy")
    if os.path.exists(path):
        return np.load(path).astype(np.int32), None
    perm, stats = balanced_pixel_base(
        scene, camera, width, height, max_depth, n_lanes, n_slots,
        sample_groups, calib_spp=calib_spp, seed=seed,
        n_bounce=n_bounce, r_blk=r_blk)
    os.makedirs(cdir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=cdir, suffix=".npy")
    os.close(fd)
    np.save(tmp, perm)  # tmp ends in .npy, so np.save writes exactly tmp
    os.replace(tmp, path)
    return perm, stats
