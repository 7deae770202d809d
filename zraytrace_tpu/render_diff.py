"""Differentiable render path.

The fast wavefront renderer uses ``lax.while_loop`` (not reverse-mode
differentiable). This module re-expresses the identical light transport as
a fixed-trip ``lax.scan`` over bounce depth — reverse-differentiable — so
pixel gradients flow to every float leaf of the ``Scene`` pytree (sphere
centers/radii, triangle vertices, IORs, texture colors, atlas texels) and
to camera parameters.

Because RNG is a stateless hash of (pixel, sample, bounce), this path
draws bitwise-identical sample streams to the wavefront renderer: both
produce the same image for the same seed.

Gradient semantics (SURVEY.md §7.7):
- discrete choices (which primitive is hit, reflect-vs-refract, front
  face, absorb) are piecewise-constant: gradients flow through the
  *continuous* quantities (t, point, normal, uv, attenuation) at fixed
  topology; visibility/silhouette gradients are not modeled.
- all masked branches use "double-where" guards so no NaN/Inf from
  inactive lanes poisons the backward pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from zraytrace_tpu import camera as cam
from zraytrace_tpu import materials as mat
from zraytrace_tpu import rng as zrng
from zraytrace_tpu.render import background_color, trace_closest
from zraytrace_tpu.scene import Scene


def trace_paths(
    scene: Scene,
    camera: cam.Camera,
    pixel_ids: jnp.ndarray,  # (N,) int32
    sample_ids: jnp.ndarray,  # (N,) int32
    seed,
    width,
    height,
    max_depth: int,  # static: scan trip count
    bilinear_textures: bool = True,
    remat: bool = True,
    edge_eps: float | None = None,
    edge_occlusion: bool = True,
    mesh_fast: bool | None = None,
    tri_flash=None,
    branch_grad: bool = False,
):
    """Radiance of one path per lane, ``(N, 3)``.

    ``max_depth`` is static (it is the scan length); everything else is
    traced. ``bilinear_textures`` defaults on — nearest-neighbor lookups
    have zero gradient w.r.t. the hit position.

    ``edge_eps``: when set, multiply the throughput each bounce by the
    edge_grad factor — forward-identical (factor == 1.0) but the
    backward pass gains silhouette/visibility gradients with relative
    bandwidth ``edge_eps`` (see edge_grad.py). Replaces the round-1
    finite-difference hybrid for coverage terms.

    ``mesh_fast``: route triangles through the winner-recompute split
    (diff_trace.py) — the stop-gradient winner pass plus an O(N)
    differentiable recompute on the winning triangle, instead of
    differentiating the brute O(N*T) scan. Gradients are identical at
    fixed topology (tests/test_diff_mesh.py); default auto: on when the
    scene has >= 64 triangles. ``tri_flash`` (pack via
    diff_trace.pack_for_diff) additionally runs the winner pass through
    the flash kernel when the lane count is 512-aligned — the TPU mesh
    fast path.
    """
    width = jnp.asarray(width, jnp.int32)
    fw = jnp.asarray(width, jnp.float32)
    fh = jnp.asarray(height, jnp.float32)
    px = (pixel_ids % width).astype(jnp.float32)
    py = (pixel_ids // width).astype(jnp.float32)

    j = zrng.uniform4(seed, pixel_ids, sample_ids, 0, zrng.STREAM_CAMERA)
    u, v = cam.pixel_uv(px, py, j[:, 0], j[:, 1], fw, fh)
    o, d = cam.get_rays(camera, u, v)

    n = pixel_ids.shape[0]
    init = dict(
        o=o,
        d=d,
        throughput=jnp.ones((n, 3), jnp.float32),
        radiance=jnp.zeros((n, 3), jnp.float32),
        alive=jnp.ones((n,), bool),
    )

    fast = mesh_fast if mesh_fast is not None else scene.n_triangles >= 64
    if fast and scene.n_triangles > 0:
        from zraytrace_tpu.diff_trace import trace_closest_diff

        trace = functools.partial(trace_closest_diff, tri_flash=tri_flash)
    else:
        trace = trace_closest

    def bounce(state, depth_idx):
        h = trace(scene, state["o"], state["d"])
        throughput = state["throughput"]
        if edge_eps is not None:
            from zraytrace_tpu.edge_grad import edge_factor

            f = edge_factor(scene, state["o"], state["d"], h, edge_eps,
                            occlusion=edge_occlusion)
            throughput = throughput * jnp.where(
                state["alive"], f, 1.0)[:, None]
        rnd = zrng.uniform4(seed, pixel_ids, sample_ids, depth_idx, zrng.STREAM_SCATTER)
        new_dir, atten, absorbed = mat.scatter(
            scene, state["d"], h["normal"], h["front_face"], h["uv"], h["mat_id"],
            rnd, bilinear_textures=bilinear_textures,
            branch_grad=branch_grad,
        )
        alive = state["alive"]
        miss = alive & ~h["hit"]
        scattered = alive & h["hit"] & ~absorbed

        radiance = state["radiance"] + jnp.where(
            miss[:, None], throughput * background_color(state["d"]), 0.0
        )
        sc3 = scattered[:, None]
        return (
            dict(
                o=jnp.where(sc3, h["point"], state["o"]),
                d=jnp.where(sc3, new_dir, state["d"]),
                throughput=jnp.where(sc3, throughput * atten, throughput),
                radiance=radiance,
                alive=scattered,
            ),
            None,
        )

    if remat:
        bounce = jax.checkpoint(bounce)
    final, _ = jax.lax.scan(bounce, init, jnp.arange(max_depth, dtype=jnp.int32))
    # Paths still alive after max_depth bounces contribute black
    # (raytrace.zig:64-67) — radiance already excludes them.
    return final["radiance"]


def render_diff(
    scene: Scene,
    camera: cam.Camera,
    width: int,
    height: int,
    spp: int,
    max_depth: int,
    seed=42,
    sample_start=0,
    bilinear_textures: bool = True,
    edge_eps: float | None = None,
    edge_occlusion: bool = True,
    mesh_fast: bool | None = None,
    tri_flash=None,
    branch_grad: bool = False,
):
    """Differentiable image ``(H, W, 3)``: mean over ``spp`` paths/pixel.

    Samples are laid out as a leading axis and scanned so the live lane
    count stays H*W; gradients accumulate across the scan.
    """
    n = width * height
    pixel_ids = jnp.arange(n, dtype=jnp.int32)

    def one_spp(carry, s):
        r = trace_paths(
            scene, camera, pixel_ids, jnp.full((n,), s, jnp.int32),
            seed, width, height, max_depth, bilinear_textures,
            edge_eps=edge_eps, edge_occlusion=edge_occlusion,
            mesh_fast=mesh_fast, tri_flash=tri_flash,
            branch_grad=branch_grad,
        )
        return carry + r, None

    total, _ = jax.lax.scan(
        lambda c, s: one_spp(c, s),
        jnp.zeros((n, 3), jnp.float32),
        jnp.arange(spp, dtype=jnp.int32) + jnp.asarray(sample_start, jnp.int32),
    )
    return (total / spp).reshape(height, width, 3)
