"""Shared Mosaic-kernel helpers for the bounce megakernels.

Extracted from the round-1 kernel so the production engine
(ops/bounce_kernel3) does not depend on superseded engines: scene/SMEM
table packing, the polynomial inverse trig (Mosaic has no atan2/acos),
and the in-kernel PCG4D convenience wrapper.

Reference call-outs: spherical uv consumes acos/atan2 (sphere.zig:47-51),
the camera/scatter streams consume pcg4d (sample.zig semantics,
re-keyed stateless — see rng.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from zraytrace_tpu import rng as zrng
from zraytrace_tpu import scene as sc

LANE = 128

# int-parameter slots shared by every megakernel generation
(P_WIDTH, P_HEIGHT, P_SEND, P_MAXDEPTH, P_SEED, P_NPIX, P_STRIDE,
 P_SSTART, P_ATLASW, P_NSLOTS) = range(10)


class SceneTables(NamedTuple):
    """Host-prepared SMEM tables."""

    cam: jnp.ndarray  # (12,) f32: origin, lower_left, horizontal, vertical
    spheres: jnp.ndarray  # (S, 5) f32: cx, cy, cz, radius, mat_id
    mats: jnp.ndarray  # (M, 11) f32: [type, ior, textype, r, g, b,
    #                                  base, uoff, voff, th, tw]
    atlas_flat: jnp.ndarray  # (F, 3) f32 flattened atlas (HBM side)


def prepare_tables(scene: sc.Scene, camera) -> SceneTables:
    cam = jnp.concatenate([
        camera.origin, camera.lower_left, camera.horizontal, camera.vertical
    ]).astype(jnp.float32)
    spheres = jnp.concatenate(
        [scene.sph_center,
         scene.sph_radius[:, None],
         scene.sph_mat.astype(jnp.float32)[:, None]], axis=1)
    a_h, a_w = scene.atlas.shape[1], scene.atlas.shape[2]
    tex_id = scene.mat_tex
    aid = scene.tex_image[tex_id]
    hw = scene.atlas_hw[aid].astype(jnp.float32)
    mats = jnp.concatenate(
        [scene.mat_type.astype(jnp.float32)[:, None],
         scene.mat_ior[:, None],
         scene.tex_type[tex_id].astype(jnp.float32)[:, None],
         scene.tex_color[tex_id],
         (aid * (a_h * a_w)).astype(jnp.float32)[:, None],
         scene.tex_offset[tex_id],
         hw], axis=1)
    return SceneTables(
        cam=cam, spheres=spheres, mats=mats,
        atlas_flat=scene.atlas.reshape(-1, 3),
    )


def _dot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _normalize(x, y, z):
    inv = jax.lax.rsqrt(x * x + y * y + z * z)
    return x * inv, y * inv, z * inv


def _atan_core(z):
    """atan for |z| <= 1, Cephes atanf minimax polynomial (~2 ulp f32)."""
    z2 = z * z
    p = jnp.float32(8.05374449538e-2)
    p = p * z2 - jnp.float32(1.38776856032e-1)
    p = p * z2 + jnp.float32(1.99777106478e-1)
    p = p * z2 - jnp.float32(3.33329491539e-1)
    return p * z2 * z + z


def _atan2(y, x):
    """atan2 built from the poly core (Mosaic has no inverse trig).

    Accuracy ~1e-7 rad; the only consumer is the spherical-uv texel
    index, where this is far below one texel."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    big = ay > ax
    num = jnp.where(big, ax, ay)
    den = jnp.where(big, ay, ax)
    den = jnp.where(den > 0.0, den, 1.0)  # (0,0) -> 0
    a = _atan_core(num / den)
    a = jnp.where(big, jnp.float32(np.pi / 2) - a, a)
    a = jnp.where(x < 0.0, jnp.float32(np.pi) - a, a)
    return jnp.where(y < 0.0, -a, a)


def _acos(x):
    """acos via atan2(sqrt(1-x^2), x); |x| must be < 1 (callers clip)."""
    s = jnp.sqrt(jnp.maximum(0.0, (1.0 - x) * (1.0 + x)))
    return _atan2(s, x)


def _uniform4(seed_c, pix, samp, dep):
    """pcg4d over (R,128) int32 lanes -> four U[0,1) floats."""
    u = lambda v: v.astype(jnp.uint32)
    ctr = jnp.stack([u(pix), u(samp), u(dep),
                     jnp.broadcast_to(seed_c, pix.shape)], axis=-1)
    bits = zrng.pcg4d(ctr)
    f = lambda k: (bits[..., k] >> 8).astype(jnp.int32).astype(jnp.float32) * (
        jnp.float32(1.0 / 16777216.0))
    return f(0), f(1), f(2), f(3)
