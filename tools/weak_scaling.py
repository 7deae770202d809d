#!/usr/bin/env python
"""Weak-scaling harness on the virtual CPU mesh (round-5 verdict item 8).

The >= 85% multi-host scaling target (BASELINE.md) cannot be measured
here (one physical chip; the driver validates multi-chip only via the
8-virtual-device dryrun). This harness makes the efficiency claim ONE
COMMAND away when hardware exists: it runs the real sharded engine
(parallel.mesh.render_sharded — the same program a TPU pod would run)
at constant work PER DEVICE while the device count grows, and reports

- per-device render_seconds (steady state: the SECOND run of each
  compiled program is timed — first executions pay compile/warm costs,
  the same discipline as every hardware number in PERF.md), and
- the collective/imbalance share: weak-scaling efficiency
  eff(N) = t(1) / t(N) (ideal: the per-device time does not grow), for
  BOTH mesh axes — `data` (pixel tiles; no inner collective, measures
  SPMD overhead + imbalance) and `sample` (spp shards; pixel sums psum
  over the axis, measures the collective).

CAVEAT printed with the numbers: on this host the N virtual devices
share 4 physical cores, so absolute efficiency is core-oversubscription
noise, not ICI behavior — the harness's value is the rehearsed
measurement path + the JSON artifact shape. On real hardware the same
command gives the honest number. Reference analogue: the per-scanline
throughput counters (raytrace.zig:37-50) are the reference's only
scaling story.

Usage: python tools/weak_scaling.py [--out WEAK_SCALING.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from zraytrace_tpu.config import RenderParams
from zraytrace_tpu.parallel.mesh import make_mesh, render_sharded
from zraytrace_tpu.scenes import build_scene


def steady(scene, camera, params, mesh):
    """Second-run wall time of the sharded render (compile excluded)."""
    render_sharded(scene, camera, params, mesh)  # compile + warm
    t0 = time.perf_counter()
    img, st = render_sharded(scene, camera, params, mesh)
    wall = time.perf_counter() - t0
    return wall, img, st


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="WEAK_SCALING.json")
    ap.add_argument("--scene", type=int, default=1)
    ap.add_argument("--base", type=int, default=96,
                    help="per-device pixel rows (data axis run)")
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--spp", type=int, default=16)
    args = ap.parse_args()

    built = build_scene(args.scene)
    devs = jax.devices()
    counts = [n for n in (1, 2, 4, 8) if n <= len(devs)]
    report = {"host_cores": os.cpu_count(), "n_virtual_devices": len(devs),
              "caveat": "virtual CPU devices share host cores; run the "
                        "same command on real hardware for the honest "
                        "efficiency number", "axes": {}}

    for axis in ("data", "sample"):
        rows = []
        for nd in counts:
            if axis == "data":
                mesh = make_mesh(n_data=nd, n_sample=1,
                                 devices=devs[:nd])
                # constant pixels/device: the image grows with N
                params = RenderParams(
                    width=args.width, height=args.base * nd,
                    samples_per_pixel=args.spp, max_depth=8)
            else:
                mesh = make_mesh(n_data=1, n_sample=nd,
                                 devices=devs[:nd])
                # constant samples/device: spp grows with N; the psum
                # over the sample axis is the collective under test
                params = RenderParams(
                    width=args.width, height=args.base,
                    samples_per_pixel=args.spp * nd, max_depth=8)
            wall, img, st = steady(built.scene, built.camera, params, mesh)
            rows.append({
                "n_devices": nd,
                "wall_seconds": round(wall, 4),
                "rays": st.rays,
                "rays_per_sec_total": round(st.rays / wall),
                "rays_per_sec_per_device": round(st.rays / wall / nd),
            })
            print(f"{axis}: N={nd} wall={wall:.3f}s rays={st.rays} "
                  f"({st.rays / wall / nd / 1e6:.2f}M rays/s/dev)",
                  flush=True)
        t1 = rows[0]["wall_seconds"]
        for r in rows:
            r["weak_scaling_efficiency"] = round(t1 / r["wall_seconds"], 4)
        report["axes"][axis] = rows

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({
        "metric": "weak_scaling_efficiency_max_devices",
        "data": report["axes"]["data"][-1]["weak_scaling_efficiency"],
        "sample": report["axes"]["sample"][-1]["weak_scaling_efficiency"],
        "caveat": "virtual-device rehearsal, not hardware",
    }))


if __name__ == "__main__":
    main()
