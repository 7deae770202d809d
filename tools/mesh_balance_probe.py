#!/usr/bin/env python
"""Does the profile-balanced lane map pay on MIXED scenes?

Scene 4 (teapotAndBallCircle: earthmap Lambertian + teapot) is the
texel-heavy mixed scene — its megakernel launches block on BOTH texel
misses and mesh stalls. This probe runs the balance pipeline against
the mesh megakernel: calibrate per-column texel-miss costs with
tri_flash attached, partition, then render identity-base vs
balanced-base and compare device rates (counters must stay bit-exact:
streams are keyed by pixel).

    python tools/mesh_balance_probe.py [--scene 4] [--spp 100]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

from zraytrace_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp
import numpy as np

from zraytrace_tpu.balance import balance_perm, orbit_sums
from zraytrace_tpu.config import RenderParams
from zraytrace_tpu.geometry.bvh import build_tri_bvh
from zraytrace_tpu.ops.bounce_kernel3 import _wavefront_pallas3_jit
from zraytrace_tpu.ops.flash_intersect import pack_tri_planes
from zraytrace_tpu.render import pallas_r_blk
from zraytrace_tpu.scene import material_classes, mesh_materials_const
from zraytrace_tpu.scenes import build_scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", type=int, default=4)
    ap.add_argument("--size", type=int, default=700)
    ap.add_argument("--spp", type=int, default=100)
    ap.add_argument("--depth", type=int, default=20)
    ap.add_argument("--calib-spp", type=int, default=16)
    args = ap.parse_args()

    built = build_scene(args.scene)
    scene, camera = built.scene, built.camera
    order = build_tri_bvh(scene.tri_a, scene.tri_b, scene.tri_c).prim_order
    planes = pack_tri_planes(scene.tri_a, scene.tri_b, scene.tri_c,
                             order=order, tri_mat=scene.tri_mat,
                             const_materials=mesh_materials_const(scene))
    dflt = RenderParams(width=1, height=1, samples_per_pixel=1, max_depth=1)
    n_pix = args.size * args.size
    n_lanes = min(-(-n_pix // 256) * 256, dflt.pallas_max_wavefront)
    n_slots = -(-n_pix // n_lanes)
    r_blk = pallas_r_blk(n_lanes, dflt.pallas_r_blk)
    G = dflt.pallas_sample_groups
    mc = material_classes(scene)
    common = dict(n_bounce=dflt.pallas_bounces, r_blk=r_blk,
                  mat_classes=mc, tri_flash=planes)

    # calibration: identity base, G=1, short spp, texel-miss counts
    ids = jnp.arange(n_lanes, dtype=jnp.int32)
    out = _wavefront_pallas3_jit(
        scene, camera, ids, 42, args.size, args.size, args.calib_spp,
        args.depth, 0, n_slots, n_lanes, n_pix, sample_groups=1,
        return_misses=True, **common)
    cost = np.asarray(out[-1], np.int64)
    perm = balance_perm(cost, G)
    t_old = orbit_sums(cost, np.arange(n_lanes, dtype=np.int32), G)
    t_new = orbit_sums(cost, perm, G)
    print(f"calib: total_misses={cost.sum()} max/mean "
          f"{t_old.max()/max(t_old.mean(),1e-9):.3f} -> "
          f"{t_new.max()/max(t_new.mean(),1e-9):.3f}", flush=True)

    def run(base, permuted, label):
        def once():
            sums, cnts = _wavefront_pallas3_jit(
                scene, camera, base, 42, args.size, args.size, args.spp,
                args.depth, 0, n_slots, n_lanes, n_pix,
                sample_groups=min(G, args.spp), permuted_base=permuted,
                **common)
            c = np.asarray(cnts, np.uint64)  # sync
            return c
        once()  # compile + first-execution penalty
        t0 = time.time()
        c = once()
        dt = time.time() - t0
        totals = (c[..., 0] * (1 << 32) + c[..., 1])
        rays = int(totals[0])
        print(f"{label}: {rays} rays in {dt:.2f}s = "
              f"{rays/dt/1e6:.2f}M rays/s", flush=True)
        return rays, dt

    r_id, _ = run(ids, False, "identity ")
    r_bal, _ = run(jnp.asarray(perm), True, "balanced ")
    assert r_id == r_bal, (r_id, r_bal)  # streams keyed by pixel


if __name__ == "__main__":
    main()
