"""Texture lookup: one branchless gather over the texture tables.

Reference semantics: texture.zig — constant color (texture.zig:31-44) and
nearest-neighbor image lookup with u-flip and u/v offsets with single-step
wrap (texture.zig:52-74). The image rows are stored bottom-up (the PNG
reader flips vertically, png_image.zig:86), which our loader reproduces.

Note: the reference wraps ``vv`` by +1 when ``uu_first < 0`` instead of
``vv_first < 0`` (texture.zig:66) — a latent bug that can never fire with
the offsets used anywhere in the repo (u_offset = 0.19 keeps
``uu_first >= 0.19``). We implement the evidently-intended wrap; behaviour
is identical on every reference scene.
"""

from __future__ import annotations

import jax.numpy as jnp

from zraytrace_tpu import scene as sc


def _wrap(x):
    """Single-step wrap into [0, 1] (texture.zig:54-68)."""
    x = jnp.where(x > 1.0, x - 1.0, x)
    return jnp.where(x < 0.0, x + 1.0, x)


def texture_albedo(scene: sc.Scene, tex_id: jnp.ndarray, uv: jnp.ndarray,
                   bilinear: bool = False) -> jnp.ndarray:
    """Albedo at the hit point, ``(N, 3)``.

    Args:
      tex_id: ``(N,)`` int32 texture table indices.
      uv: ``(N, 2)`` texture coordinates.
      bilinear: smooth interpolation instead of the reference's
        nearest-neighbor lookup (texture.zig:70-73) — needed for usable
        gradients w.r.t. hit position; off by default for forward parity.
    """
    tex_type = scene.tex_type[tex_id]  # (N,)
    const_color = scene.tex_color[tex_id]  # (N, 3)

    aid = scene.tex_image[tex_id]  # (N,)
    off = scene.tex_offset[tex_id]  # (N, 2)
    hw = scene.atlas_hw[aid].astype(jnp.float32)  # (N, 2) true (H, W)
    h, w = hw[:, 0], hw[:, 1]

    uu = _wrap(1.0 - uv[:, 0] + off[:, 0])  # u flip + offset (texture.zig:54)
    vv = _wrap(uv[:, 1] + off[:, 1])

    if bilinear:
        fx = uu * w - 0.5
        fy = vv * h - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        tx = (fx - x0)[:, None]
        ty = (fy - y0)[:, None]

        def fetch(xi, yi):
            xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            return scene.atlas[aid, yi, xi]

        c00 = fetch(x0, y0)
        c10 = fetch(x0 + 1, y0)
        c01 = fetch(x0, y0 + 1)
        c11 = fetch(x0 + 1, y0 + 1)
        img_color = (
            c00 * (1 - tx) * (1 - ty)
            + c10 * tx * (1 - ty)
            + c01 * (1 - tx) * ty
            + c11 * tx * ty
        )
    else:
        # Truncation + clamp exactly as texture.zig:70-73.
        ix = jnp.clip((uu * w).astype(jnp.int32), 0, (w - 1).astype(jnp.int32))
        iy = jnp.clip((vv * h).astype(jnp.int32), 0, (h - 1).astype(jnp.int32))
        img_color = scene.atlas[aid, iy, ix]

    return jnp.where((tex_type == sc.TEX_IMAGE)[:, None], img_color, const_color)
