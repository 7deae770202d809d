#!/usr/bin/env python
"""Hardware A/B for the mesh megakernel (deferred mesh-hit stall).

Renders a mesh scene at its reference config through the megakernel
path (pallas_mesh=True) and prints stats + rays/s. Counter totals are
cross-checked against the XLA-engine sweep (showcase/SWEEP.md) — the
stall mechanism must change timing, never events.

Usage: python tools/mesh_megakernel_probe.py SCENE [spp] [--xla]
       [--lanes N] [--bounces B] [--groups G]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zraytrace_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import numpy as np  # noqa: E402

from zraytrace_tpu.config import RenderParams  # noqa: E402
from zraytrace_tpu.render import render  # noqa: E402
from zraytrace_tpu.scenes import build_scene  # noqa: E402

# XLA-engine counter totals at 700x700, 100 spp, depth 20 (SWEEP.md)
SWEEP = {
    0: dict(rays=70794584, reflections=21794776, background=48999808,
            recursion=192),
    2: dict(rays=77508318, reflections=28508327, background=48999991,
            recursion=9),
    3: dict(rays=82484798, reflections=33484817, background=48999981,
            recursion=19),
    4: dict(rays=85161542, reflections=36162018, background=48999524,
            recursion=476),
}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    scene_idx = int(args[0]) if args else 0
    spp = int(args[1]) if len(args) > 1 else 100
    use_xla = "--xla" in sys.argv

    def opt(name, default):
        for a in sys.argv:
            if a.startswith(f"--{name}="):
                return int(a.split("=")[1])
        return default

    built = build_scene(scene_idx)
    kw = dict(width=700, height=700, samples_per_pixel=spp, max_depth=20)
    if use_xla:
        params = RenderParams(**kw, pallas_mesh=False)
    else:
        params = RenderParams(
            **kw, pallas_mesh=True,
            pallas_max_wavefront=opt("lanes", 65536),
            pallas_bounces=opt("bounces", 160),
            pallas_sample_groups=opt("groups", 8),
        )

    t0 = time.perf_counter()
    img, st = render(built.scene, built.camera, params)
    wall = time.perf_counter() - t0
    rate = st.rays / st.render_seconds
    print(f"scene {scene_idx} ({built.name}) spp={spp} "
          f"engine={'xla' if use_xla else 'mesh-megakernel'}")
    print(f"rays={st.rays} refl={st.reflections} bg={st.background_hits} "
          f"rec={st.recursion_depth_hits} samples={st.samples}")
    print(f"render {st.render_seconds:.2f}s (wall {wall:.1f}s) "
          f"=> {rate / 1e6:.2f}M rays/s")
    ident = (st.rays
             == st.reflections + st.samples - st.recursion_depth_hits)
    print(f"counter identity: {ident}")
    if spp == 100 and scene_idx in SWEEP:
        ref = SWEEP[scene_idx]
        ok = (st.rays == ref["rays"]
              and st.reflections == ref["reflections"]
              and st.background_hits == ref["background"]
              and st.recursion_depth_hits == ref["recursion"])
        print(f"SWEEP counter match: {ok}")
        if not ok:
            print(f"  expected {ref}")
    assert not np.isnan(img).any()


if __name__ == "__main__":
    main()
