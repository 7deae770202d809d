#!/usr/bin/env python
"""Occlusion-term gradient quality at mesh scale (VERDICT r3 item 7).

At a given pose offset, compare d(loss)/d(off) from the edge-aware
analytic estimator under occlusion = off / camera / all against
central finite differences of the UNRELAXED forward (edge_eps=None;
exact under the stateless RNG — the same streams make FD correlated
and low-variance). Prints per-axis values, direction cosine, and
magnitude ratio so the failure mode (bias vs variance vs wrong basin)
is identifiable.

    python tools/occl_grad_probe.py [--scale 1.0 0.5] [--spp 8]
"""

import argparse
import sys

sys.path.insert(0, ".")

from zraytrace_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from zraytrace_tpu.geometry.bvh import build_tri_bvh
from zraytrace_tpu.io.obj import read_obj
from zraytrace_tpu.ops.flash_intersect import pack_tri_planes
from zraytrace_tpu.render_diff import render_diff
from zraytrace_tpu.scene import COLOR_GREEN, SceneBuilder
from zraytrace_tpu.scenes import assets_dir
from zraytrace_tpu.camera import make_camera


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, nargs="*", default=[1.0, 0.5])
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--eps", type=float, default=0.015)
    ap.add_argument("--fd-h", type=float, default=0.02)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    model = read_obj(assets_dir() / "teapot/teapot.obj")
    bld = SceneBuilder()
    green = bld.add_lambertian_color(COLOR_GREEN)
    bld.add_sphere((0.0, -102.33, 7.0), 100.0, green)
    red = bld.add_lambertian_color((0.7, 0.15, 0.1))
    a, b, c = (np.asarray(x) for x in model.tri_vertices)
    bld.add_triangles(a, b, c, red)
    base = bld.build()
    camera = make_camera((0.0, 3.0, -9.0), (0.0, 1.0, 5.0),
                         (0.0, 1.0, 0.0), 50.0, 1.0)
    order = build_tri_bvh(base.tri_a, base.tri_b, base.tri_c).prim_order

    def scene_at(off):
        return base._replace(tri_a=base.tri_a + off,
                             tri_b=base.tri_b + off,
                             tri_c=base.tri_c + off)

    def image(off, occ, eps):
        scene = scene_at(off)
        tf = pack_tri_planes(scene.tri_a, scene.tri_b, scene.tri_c,
                             order=order)
        return render_diff(scene, camera, args.size, args.size,
                           args.spp, args.depth, mesh_fast=True,
                           tri_flash=tf, edge_eps=eps,
                           edge_occlusion=occ)

    target = jax.lax.stop_gradient(
        image(jnp.zeros(3, jnp.float32), False, None))

    def loss(off, occ, eps):
        return jnp.mean((image(off, occ, eps) - target) ** 2)

    eps_pair = (args.eps, 2 * args.eps)
    grads = {
        k: jax.jit(jax.grad(lambda o, _k=kv: loss(o, _k, eps_pair)))
        for k, kv in (("off", False), ("camera", "camera"), ("all", True))
    }
    loss_plain = jax.jit(lambda o: loss(o, False, None))

    for s in args.scale:
        off = jnp.asarray([0.5, -0.35, 0.45], jnp.float32) * s
        fd = []
        h = args.fd_h
        for ax in range(3):
            e = jnp.zeros(3, jnp.float32).at[ax].set(h)
            fd.append((float(loss_plain(off + e))
                       - float(loss_plain(off - e))) / (2 * h))
        fd = np.asarray(fd)
        print(f"scale={s}  fd={np.array2string(fd, precision=5)}",
              flush=True)
        for k, g in grads.items():
            gv = np.asarray(g(off))
            cos = float(gv @ fd / (np.linalg.norm(gv)
                                   * np.linalg.norm(fd) + 1e-30))
            ratio = float(np.linalg.norm(gv) / (np.linalg.norm(fd)
                                                + 1e-30))
            print(f"  occ={k:6s} g={np.array2string(gv, precision=5)} "
                  f"cos={cos:+.3f} |g|/|fd|={ratio:.2f}", flush=True)


if __name__ == "__main__":
    main()
