"""Hardware measurement: mesh megakernel (pallas_mesh) vs XLA wavefront.

VERDICT round-2 item 2: the deferred-mesh-hit megakernel
(ops/bounce_kernel3, has_mesh=True) exists and is interpreter-tested but
was default-OFF "pending hardware measurement". This probe renders the
mixed scenes (0 manAndBall, 2 bunnyAndBall, 4 teapotAndBallCircle) at
the reference config (700x700, depth 20; scenes.zig:26,102,168) through
BOTH engines on the real chip, checks the counters are bit-identical,
and prints rays/s for each so the auto policy (render.mesh_pallas_wanted)
can be locked to the measured winner.

Usage: python tools/mesh_pallas_probe.py [scene ...] [--spp N]
"""

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")

from zraytrace_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

from zraytrace_tpu.config import RenderParams
from zraytrace_tpu.render import render
from zraytrace_tpu.scenes import build_scene


def run(scene_idx: int, spp: int, mesh_pallas: bool):
    built = build_scene(scene_idx)
    params = RenderParams(
        width=700, height=700, samples_per_pixel=spp, max_depth=20,
        pallas_mesh=mesh_pallas,
    )
    t0 = time.time()
    img, stats = render(built.scene, built.camera, params)
    wall = time.time() - t0
    print(
        f"scene={scene_idx} spp={spp} pallas_mesh={mesh_pallas} "
        f"rays={stats.rays} refl={stats.reflections} "
        f"bg={stats.background_hits} rec={stats.recursion_depth_hits} "
        f"samples={stats.samples} iters={stats.wavefront_iterations} "
        f"render_s={stats.render_seconds:.3f} wall={wall:.1f} "
        f"rays_per_s={stats.rays / max(stats.render_seconds, 1e-9):.3e}",
        flush=True,
    )
    return img, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scenes", nargs="*", type=int, default=None)
    ap.add_argument("--spp", type=int, default=20)
    ap.add_argument("--full-spp", type=int, default=100)
    args = ap.parse_args()
    scenes = args.scenes or [4, 0, 2]

    for s in scenes:
        # warm/short run first (compile + sanity), then the full config
        img_p, st_p = run(s, args.spp, True)
        img_x, st_x = run(s, args.spp, False)
        match = (
            st_p.rays == st_x.rays
            and st_p.reflections == st_x.reflections
            and st_p.background_hits == st_x.background_hits
            and st_p.recursion_depth_hits == st_x.recursion_depth_hits
        )
        import numpy as np

        dimg = float(np.max(np.abs(img_p - img_x)))
        # cross-engine event drift is EXPECTED on hardware (~2e-5 per
        # segment on mesh scenes: Mosaic vs XLA fusion of borderline
        # f32 comparisons — tools/mesh_parity_probe.py, PERF.md round
        # 4); each engine is individually deterministic and bit-exact
        # vs the other in interpret mode
        drift = abs(st_p.rays - st_x.rays) / max(st_x.rays, 1)
        print(f"scene={s} spp={args.spp} counters_match={match} "
              f"ray_drift={drift:.1e} max_img_diff={dimg:.2e}",
              flush=True)
        if args.full_spp > args.spp:
            run(s, args.full_spp, True)
            run(s, args.full_spp, False)


if __name__ == "__main__":
    main()
