#!/usr/bin/env python
"""Per-texture texel-request / cache-miss split on threeBalls (round 5).

Decides candidate (b) of the 1e9 question (VERDICT round 4): moving the
LOGO texture off the per-launch gather (in-register evaluation) only
pays if logo requests are a large share of the CACHE MISSES that pin
the launch count. This sim replays the exact wavefront path logic
(sphere winner, front-face, spherical uv, scatter — the same formulas
as render.py / ops/bounce_kernel3.py, same PCG4D streams) per
(pixel, sample) lane, records every texel request, and simulates the
kernel's per-lane FIFO-8 texel cache to split requests and misses by
texture.

The quad-packing probe measured that misses barely share quads (7.83M
-> 7.69M allocations, -1.7%), i.e. they are bounce-uvs at near-random
atlas positions (PERF.md round 3 "neighbor share" finding) — this tool
quantifies WHERE they land instead.

Usage: python tools/texneed_split.py [--size 256] [--spp 8]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from zraytrace_tpu import rng as zrng
from zraytrace_tpu import scene as sc
from zraytrace_tpu.ops.common import prepare_tables
from zraytrace_tpu.scenes import build_scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--depth", type=int, default=30)
    ap.add_argument("--cache", type=int, default=8)
    args = ap.parse_args()

    built = build_scene(1)
    scene, camera = built.scene, built.camera
    tables = prepare_tables(scene, camera)
    sph = np.asarray(tables.spheres)  # (S, 5): cx cy cz r mat
    mats = np.asarray(tables.mats)    # (M, 11)
    cam = np.asarray(tables.cam)
    W = H = args.size
    n = W * H
    seed = 42
    atlas_w = scene.atlas.shape[2]

    pixel = jnp.arange(n, dtype=jnp.int32)

    atlas_host = np.asarray(scene.atlas).reshape(-1, 3)
    tex_color_host = np.asarray(scene.tex_color)

    def trace_events(s_idx):
        """One sample per pixel; returns per-bounce texneed events."""
        j = zrng.uniform4(seed, pixel, s_idx, 0, zrng.STREAM_CAMERA)
        px = (pixel % W).astype(jnp.float32)
        py = (pixel // W).astype(jnp.float32)
        u = (px + j[:, 0] - 0.5) / W
        v = (py + j[:, 1] - 0.5) / H
        d = (cam[3:6] + u[:, None] * cam[6:9] + v[:, None] * cam[9:12]
             - cam[0:3])
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o = jnp.broadcast_to(cam[0:3], (n, 3))
        alive = jnp.ones((n,), bool)
        thr = jnp.ones((n, 3))
        events = []
        for dep in range(args.depth):
            # closest sphere
            BIG = 3.4e38
            t_best = jnp.full((n,), BIG)
            widx = jnp.zeros((n,), jnp.int32)
            for i in range(sph.shape[0]):
                c, r = sph[i, 0:3], sph[i, 3]
                oc = o - c
                half_b = jnp.sum(oc * d, -1)
                cc = jnp.sum(oc * oc, -1) - r * r
                disc = half_b * half_b - cc
                root = jnp.sqrt(jnp.maximum(disc, 0.0))
                t1, t2 = -half_b - root, -half_b + root
                ok1 = (t1 > 1e-3) & (t1 < BIG)
                ok2 = (t2 > 1e-3) & (t2 < BIG)
                t = jnp.where(ok1, t1, t2)
                valid = (disc >= 0.0) & (ok1 | ok2)
                better = valid & (t < t_best)
                t_best = jnp.where(better, t, t_best)
                widx = jnp.where(better, i, widx)
            hit = t_best < BIG
            csel = sph[widx, 0:3]
            rsel = sph[widx, 3]
            msel = sph[widx, 4].astype(jnp.int32)
            p = o + t_best[:, None] * d
            nrm = (p - csel) / rsel[:, None]
            front = jnp.sum(d * nrm, -1) <= 0.0
            fs = jnp.where(front, 1.0, -1.0)[:, None]
            nn = nrm * fs
            onrm = nrm  # outward
            ony = jnp.clip(onrm[:, 1], -1 + 1e-7, 1 - 1e-7)
            theta = jnp.arccos(-ony)
            phi = jnp.arctan2(-onrm[:, 2], -onrm[:, 0]) + np.pi
            uu_ = phi / (2 * np.pi)
            vv_ = theta / np.pi
            mrow = mats[msel]
            mtype = mrow[:, 0]
            textype = mrow[:, 2]
            tbase = mrow[:, 6]
            uoff, voff = mrow[:, 7], mrow[:, 8]
            th, tw = mrow[:, 9], mrow[:, 10]
            wrap = lambda x: jnp.where(
                x > 1, x - 1, jnp.where(x < 0, x + 1, x))
            uu = wrap(1.0 - uu_ + uoff)
            vv = wrap(vv_ + voff)
            ix = jnp.clip((uu * tw).astype(jnp.int32), 0,
                          tw.astype(jnp.int32) - 1)
            iy = jnp.clip((vv * th).astype(jnp.int32), 0,
                          th.astype(jnp.int32) - 1)
            texflat = tbase.astype(jnp.int32) + iy * atlas_w + ix

            rnd = zrng.uniform4(seed, pixel, s_idx, dep,
                                zrng.STREAM_SCATTER)
            r0_, r1_, r2_ = rnd[:, 0], rnd[:, 1], rnd[:, 2]
            zr = r0_ * 2 - 1
            phl = 2 * np.pi * r1_
            rad = jnp.sqrt(jnp.maximum(0.0, 1 - zr * zr))
            ru = jnp.stack([rad * jnp.cos(phl), rad * jnp.sin(phl), zr], -1)
            l = nn + ru
            degen = jnp.sum(l * l, -1) < 1e-12
            l = jnp.where(degen[:, None], nn, l)
            ddn = jnp.sum(d * nn, -1)
            m = d - 2 * ddn[:, None] * nn
            met_absorb = jnp.sum(m * nn, -1) <= 0
            ior = mrow[:, 1]
            ratio = jnp.where(front, 1.0 / ior, ior)
            cos_t = jnp.minimum(-ddn, 1.0)
            sin_t = jnp.sqrt(jnp.maximum(0.0, 1 - cos_t**2))
            cannot = ratio * sin_t > 1.0
            r0s = (1 - ratio) / (1 + ratio)
            schl = r0s + (1 - r0s) * (1 - cos_t) ** 5
            refl = cannot | (schl > r2_)
            rp = ratio[:, None] * (d + cos_t[:, None] * nn)
            kk = jnp.abs(1 - jnp.sum(rp * rp, -1))
            fr = rp - jnp.sqrt(kk)[:, None] * nn
            g = jnp.where(refl[:, None], m, fr)
            is_lam = mtype < 0.5
            is_met = (mtype >= 0.5) & (mtype < 1.5)
            nd = jnp.where(is_lam[:, None], l,
                           jnp.where(is_met[:, None], m, g))
            nd = nd / jnp.linalg.norm(nd, axis=-1, keepdims=True)

            absorbed = is_met & met_absorb
            scatter = alive & hit & ~absorbed
            texneed = scatter & (is_lam | is_met) & (textype > 0.5)
            # throughput AT REQUEST TIME (before this hit's factor):
            # the gate a kernel approximation would test
            thr_max = jnp.max(thr, axis=-1)
            events.append((np.asarray(texneed),
                           np.asarray(jnp.where(texneed, texflat, -1)),
                           np.asarray(thr_max)))
            # apply albedo: const color or exact atlas texel (host
            # atlas gathered via jnp on CPU — this sim is not the
            # kernel), dielectric = 1
            const_alb = mrow[:, 3:6]
            img_alb = jnp.asarray(atlas_host)[texflat]
            alb = jnp.where((textype > 0.5)[:, None], img_alb, const_alb)
            alb = jnp.where((is_lam | is_met)[:, None], alb,
                            jnp.ones((n, 3)))
            thr = jnp.where(scatter[:, None], thr * alb, thr)
            o = jnp.where(scatter[:, None], p, o)
            d = jnp.where(scatter[:, None], nd, d)
            alive = scatter
            if not bool(jnp.any(alive)):
                break
        return events

    # gather the per-lane event stream over samples (a lane = a pixel;
    # consecutive samples share the lane's cache, like G=1 kernel lanes)
    trace_jit = jax.jit(trace_events, static_argnums=())
    streams = [[] for _ in range(n)]
    tex_split = {}
    total_needs = 0
    logo_base_end = int(np.asarray(scene.atlas_hw)[0].prod()) if False else None
    # texture id by base: base 0 .. atlas_h*atlas_w-1 -> image 0
    ahw = scene.atlas.shape[1] * scene.atlas.shape[2]
    for s in range(args.spp):
        events = trace_events(jnp.full((n,), s, jnp.int32))
        for need, flat, thr_max in events:
            idxs = np.nonzero(need)[0]
            total_needs += idxs.size
            for i in idxs:
                streams[i].append((int(flat[i]), float(thr_max[i])))

    # simulate the kernel's FIFO cache per lane; bucket misses by
    # request-time throughput (the gate a mean-color approximation
    # would use: requests below THR resolve in-register, no slot)
    THRS = (0.02, 0.05, 0.1, 0.2, 0.4)
    miss_by_img = np.zeros(8, np.int64)
    need_by_img = np.zeros(8, np.int64)
    miss_below = np.zeros(len(THRS), np.int64)
    n_miss = 0
    for lane in streams:
        cachev = []
        for f, tm in lane:
            img = f // ahw
            need_by_img[img] += 1
            if f in cachev:
                continue
            n_miss += 1
            miss_by_img[img] += 1
            for j, t in enumerate(THRS):
                if tm < t:
                    miss_below[j] += 1
            cachev.insert(0, f)
            if len(cachev) > args.cache:
                cachev.pop()
    print(f"lanes={n} spp={args.spp} total texneeds={total_needs} "
          f"misses={n_miss} ({100.0 * n_miss / max(total_needs, 1):.1f}%)")
    for img in range(2):
        print(f"  image {img} ({'logo' if img == 0 else 'earthmap'}): "
              f"needs={need_by_img[img]} misses={miss_by_img[img]} "
              f"({100.0 * miss_by_img[img] / max(n_miss, 1):.1f}% of "
              "misses)")
    for j, t in enumerate(THRS):
        print(f"  misses with request-time throughput < {t}: "
              f"{miss_below[j]} ({100.0 * miss_below[j] / max(n_miss, 1):.1f}%)")


if __name__ == "__main__":
    main()
