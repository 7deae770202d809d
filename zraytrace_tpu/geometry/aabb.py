"""Axis-aligned bounding boxes.

Reference semantics: aabb.zig — construction from min/max (aabb.zig:37),
vertex lists (aabb.zig:44-66), box merge (aabb.zig:68-71) and list merge
(aabb.zig:73-82), volume (aabb.zig:84-97), the reference's surface "area"
(aabb.zig:99-107 — note it computes ``2(dx^2+dy^2+dz^2)``, NOT the true
box area ``2(dx dy + dy dz + dz dx)``; kept verbatim for parity, the SAH
builders use the true formula), and the optimized slab test
(aabb.zig:109-128).

Boxes are ``(..., 2, 3)`` arrays ([min, max] rows), batched like all
geometry here. Used by the BVH; exposed standalone for parity with the
reference module.
"""

from __future__ import annotations

import jax.numpy as jnp


def from_min_max(bmin, bmax) -> jnp.ndarray:
    """aabb.zig:37-42."""
    return jnp.stack([jnp.asarray(bmin, jnp.float32),
                      jnp.asarray(bmax, jnp.float32)], axis=-2)


def from_vertices(vertices) -> jnp.ndarray:
    """Bounding box of a ``(..., V, 3)`` vertex set (aabb.zig:44-66)."""
    v = jnp.asarray(vertices, jnp.float32)
    return jnp.stack([v.min(axis=-2), v.max(axis=-2)], axis=-2)


def merge(a, b) -> jnp.ndarray:
    """Union of two boxes (aabb.zig:68-71)."""
    return jnp.stack(
        [jnp.minimum(a[..., 0, :], b[..., 0, :]),
         jnp.maximum(a[..., 1, :], b[..., 1, :])], axis=-2)


def merge_all(boxes) -> jnp.ndarray:
    """Union of a ``(N, 2, 3)`` box list (aabb.zig:73-82)."""
    return jnp.stack(
        [boxes[..., 0, :].min(axis=-2), boxes[..., 1, :].max(axis=-2)],
        axis=-2)


def volume(box) -> jnp.ndarray:
    """aabb.zig:84-97."""
    d = box[..., 1, :] - box[..., 0, :]
    return d[..., 0] * d[..., 1] * d[..., 2]


def surface_area_reference(box) -> jnp.ndarray:
    """The reference's formula, kept verbatim: ``2(dx^2+dy^2+dz^2)``
    (aabb.zig:99-107). NOT the true box surface area."""
    d = box[..., 1, :] - box[..., 0, :]
    return 2.0 * jnp.sum(d * d, axis=-1)


def surface_area(box) -> jnp.ndarray:
    """True box surface area ``2(dx dy + dy dz + dz dx)`` — what the
    binned-SAH builders optimize."""
    d = box[..., 1, :] - box[..., 0, :]
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
                  + d[..., 2] * d[..., 0])


def hit(box, o, inv_d, t_min, t_max) -> jnp.ndarray:
    """Vectorized slab test (aabb.zig:109-128): per-axis crossing
    distances with the swap replaced by min/max; broadcastable over rays
    and boxes. ``inv_d`` is ``1/direction`` precomputed."""
    t0 = (box[..., 0, :] - o) * inv_d
    t1 = (box[..., 1, :] - o) * inv_d
    near = jnp.minimum(t0, t1)
    far = jnp.maximum(t0, t1)
    enter = jnp.maximum(near.max(axis=-1), t_min)
    exit_ = jnp.minimum(far.min(axis=-1), t_max)
    return enter <= exit_
