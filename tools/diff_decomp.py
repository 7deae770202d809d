#!/usr/bin/env python
"""Decompose one sphere_albedo_fit step (round-5 verdict item 4).

DIFF_BENCH records 0.297 s/step (128x128x8spp d10, grads into every
Scene leaf) — ~1/800 of forward throughput — but PERF.md never said
WHERE the time goes. This probe times jitted variants of the exact
DIFF_BENCH workload, each isolating one suspect:

  full          the DIFF_BENCH step (value_and_grad, adam)       [base]
  value_only    forward scan only, no grad                 [fwd cost]
  no_edge       grad without edge_factor passes          [edge share]
  no_branch     grad without the REINFORCE branch term [branch share]
  no_remat      grad without jax.checkpoint on bounce  [remat share]
  no_atlas      grads into every leaf EXCEPT the (A,H,W,3) atlas
                (12.6 MB adjoint accumulator riding the spp+depth
                scans, scatter-add per bilinear fetch)  [atlas share]
  geom_only     grads into sph_center/sph_radius only
  flat_samples  all spp as extra LANES (one depth scan over n*spp
                lanes) instead of the sequential spp scan — tests
                whether the 16k-lane arrays underutilize the VPU

Timing discipline: compile + first step excluded; mean of --steps warm
steps with a scalar-readback sync (the relay ignores bare
block_until_ready). Run on hardware for the real decomposition; --cpu
for a smoke test.

Usage: python tools/diff_decomp.py [--cpu] [--steps 5] [--out -]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def teapot_decomp(args):
    """Decompose the teapot_pose_fit step (DIFF_BENCH: 311 ms): the
    trace itself rides the flash winner pass, but edge_factor's
    silhouette/near-miss margins brute-chunk ALL 6320 triangles per
    bounce — the prime suspect."""
    import jax
    import jax.numpy as jnp

    from zraytrace_tpu import scene as sc
    from zraytrace_tpu.camera import make_camera
    from zraytrace_tpu.geometry.bvh import build_tri_bvh
    from zraytrace_tpu.io.obj import read_obj
    from zraytrace_tpu.ops.flash_intersect import pack_tri_planes
    from zraytrace_tpu.render_diff import render_diff
    from zraytrace_tpu.scene import SceneBuilder
    from zraytrace_tpu.scenes import assets_dir

    size, spp, depth, seed = 64, 8, 4, 42
    model = read_obj(assets_dir() / "teapot/teapot.obj")
    import numpy as _np

    a0, b0, c0 = (_np.asarray(x) for x in model.tri_vertices)
    bld = SceneBuilder()
    green = bld.add_lambertian_color(sc.COLOR_GREEN)
    bld.add_sphere((0.0, -102.33, 7.0), 100.0, green)
    red = bld.add_lambertian_color((0.7, 0.15, 0.1))
    bld.add_triangles(a0, b0, c0, red)
    base = bld.build()
    camera = make_camera((0.0, 3.0, -9.0), (0.0, 1.0, 5.0),
                         (0.0, 1.0, 0.0), 50.0, 1.0)
    order = build_tri_bvh(base.tri_a, base.tri_b, base.tri_c).prim_order

    def image_at(off, edge, occ=False, screen=None):
        scene = base._replace(tri_a=base.tri_a + off,
                              tri_b=base.tri_b + off,
                              tri_c=base.tri_c + off)
        tf = pack_tri_planes(scene.tri_a, scene.tri_b, scene.tri_c,
                             order=order)
        return render_diff(scene, camera, size, size, spp, depth,
                           seed=seed, mesh_fast=True, tri_flash=tf,
                           edge_eps=edge, edge_occlusion=occ,
                           edge_screen=screen)

    target = jax.lax.stop_gradient(
        image_at(jnp.zeros((3,), jnp.float32), None))

    def make_loss(edge, occ=False, screen=None):
        def loss(off):
            return jnp.mean((image_at(off, edge, occ, screen)
                             - target) ** 2)
        return loss

    def timed(fn, arg):
        jfn = jax.jit(fn)
        t0 = time.time()
        out = jfn(arg)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        compile_s = time.time() - t0
        t0 = time.time()
        for _i in range(args.steps):
            out = jfn(arg)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        return compile_s, (time.time() - t0) / args.steps

    off0 = jnp.asarray([0.25, -0.18, 0.22], jnp.float32)
    variants = [
        ("value_only", make_loss((0.015, 0.03))),
        ("full", jax.value_and_grad(make_loss((0.015, 0.03)))),
        ("no_edge", jax.value_and_grad(make_loss(None))),
        ("one_eps", jax.value_and_grad(make_loss(0.015))),
        ("occl_on", jax.value_and_grad(make_loss((0.015, 0.03),
                                                 occ="camera"))),
        ("screen", jax.value_and_grad(make_loss((5e-4, 1e-3),
                                                screen=True))),
    ]
    out = {}
    for name, fn in variants:
        try:
            compile_s, step_s = timed(fn, off0)
            out[name] = dict(step_seconds=round(step_s, 4),
                             compile_seconds=round(compile_s, 1))
            print(f"{name:14s} {step_s * 1e3:8.1f} ms/step "
                  f"(compile {compile_s:.1f}s)", flush=True)
        except Exception as e:
            out[name] = dict(error=str(e)[:200])
            print(f"{name:14s} ERROR {str(e)[:120]}", flush=True)
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--teapot", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from zraytrace_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    if args.teapot:
        return teapot_decomp(args)
    import jax
    import jax.numpy as jnp

    from zraytrace_tpu.inverse import image_loss, merge_scene, split_scene
    from zraytrace_tpu.render_diff import render_diff, trace_paths
    from zraytrace_tpu.scenes import build_scene

    size, spp, depth, seed = args.size, args.spp, args.depth, 42
    built = build_scene(1)
    scene, camera = built.scene, built.camera
    params, static = split_scene(scene)
    target = jnp.zeros((size, size, 3), jnp.float32)
    n = size * size

    def make_loss(edge=(0.01, 0.02), branch=True, remat=True,
                  flat=False, bilinear=True):
        def loss(p):
            s = merge_scene(p, static)
            if not flat and remat:
                img = render_diff(s, camera, size, size, spp, depth,
                                  seed=seed, edge_eps=edge,
                                  branch_grad=branch,
                                  bilinear_textures=bilinear)
                return image_loss(img, target)
            # direct trace_paths variants (remat off / flat samples)
            pixel_ids = jnp.arange(n, dtype=jnp.int32)
            if flat:
                pix = jnp.tile(pixel_ids, spp)
                samp = jnp.repeat(jnp.arange(spp, dtype=jnp.int32), n)
                r = trace_paths(s, camera, pix, samp, seed, size, size,
                                depth, edge_eps=edge, remat=remat,
                                branch_grad=branch)
                img = r.reshape(spp, n, 3).sum(0) / spp
                return image_loss(img.reshape(size, size, 3), target)

            def one_spp(tot, s_i):
                r = trace_paths(s, camera, pixel_ids,
                                jnp.full((n,), s_i, jnp.int32), seed,
                                size, size, depth, edge_eps=edge,
                                remat=remat, branch_grad=branch)
                return tot + r, None

            tot, _ = jax.lax.scan(
                one_spp, jnp.zeros((n, 3), jnp.float32),
                jnp.arange(spp, dtype=jnp.int32))
            return image_loss((tot / spp).reshape(size, size, 3), target)
        return loss

    def timed(fn, arg):
        jfn = jax.jit(fn)
        t0 = time.time()
        out = jfn(arg)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        compile_s = time.time() - t0
        t0 = time.time()
        for _i in range(args.steps):
            out = jfn(arg)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        return compile_s, (time.time() - t0) / args.steps

    no_atlas_params = {k: v for k, v in params.items() if k != "atlas"}
    static_a = dict(static, atlas=params["atlas"])
    geom_params = {k: params[k] for k in ("sph_center", "sph_radius")}
    static_g = dict(static, **{k: v for k, v in params.items()
                               if k not in geom_params})

    base = make_loss()
    variants = [
        ("value_only", base, params),
        ("full", jax.value_and_grad(base), params),
        ("no_edge", jax.value_and_grad(make_loss(edge=None)), params),
        ("no_branch", jax.value_and_grad(make_loss(branch=False)), params),
        ("no_remat", jax.value_and_grad(make_loss(remat=False)), params),
        ("no_atlas", jax.value_and_grad(
            lambda p: make_loss()(dict(p, atlas=static_a["atlas"]))),
         no_atlas_params),
        ("geom_only", jax.value_and_grad(
            lambda p: make_loss()(dict(
                p, **{k: static_g[k] for k in params if k not in p}))),
         geom_params),
        ("flat_samples", jax.value_and_grad(make_loss(flat=True)), params),
        # nearest-neighbor texel fetches: 1 gather/scatter per hit
        # instead of bilinear's 4 — isolates the scatter-row share of
        # the atlas-gradient cost (grads differ; timing probe only)
        ("nearest_tex", jax.value_and_grad(make_loss(bilinear=False)),
         params),
        # the shipped recovery workload (fit() round-5 policy: only
        # centers/radii/tex_color differentiated) with the spp scan
        # flattened into lanes — the all-leaves flat variant measured
        # no-help because the atlas adjoint dominated; restricted it
        # might not
        ("flat_restricted", jax.value_and_grad(
            lambda p: make_loss(flat=True)(dict(
                p, **{k: static_g.get(k, no_atlas_params.get(k))
                      for k in params
                      if k not in ("sph_center", "sph_radius",
                                   "tex_color")}))),
         {k: params[k] for k in ("sph_center", "sph_radius",
                                 "tex_color")}),
    ]
    out = {}
    for name, fn, arg in variants:
        try:
            compile_s, step_s = timed(fn, arg)
            out[name] = dict(step_seconds=round(step_s, 4),
                             compile_seconds=round(compile_s, 1))
            print(f"{name:14s} {step_s * 1e3:8.1f} ms/step "
                  f"(compile {compile_s:.1f}s)", flush=True)
        except Exception as e:  # record and continue
            out[name] = dict(error=str(e)[:200])
            print(f"{name:14s} ERROR {str(e)[:120]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
