"""Primitive-sharded intersection: triangles split across the mesh.

SURVEY.md §2 lists this as the stretch analogue of sequence parallelism:
when a scene's primitive arrays exceed one chip's memory, shard the
TRIANGLES over the ``data`` axis (rays replicated), intersect each
shard's slice, and reduce the per-ray winner across shards with XLA
collectives — the closest-hit reduction is an associative min, so this
is exactly a ring/all-reduce pattern and XLA schedules it over ICI.

No reference analogue exists (the reference is single-threaded and its
largest scene is 110k triangles, README.md:11); reference unit of work:
the per-surface scan raytrace.zig:75-81.

The winner combine must preserve the list-order tie-break (earliest
triangle wins at equal t, raytrace.zig:75-81): ties are broken by
minimizing the pair (t, global_index) lexicographically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from zraytrace_tpu.geometry.triangle import intersect_triangles
from zraytrace_tpu.parallel.mesh import DATA_AXIS

_BIG = np.float32(3.4e38)
_IMAX = np.int32(2**31 - 1)


def make_sharded_intersector(mesh: Mesh, n_tris: int, t_min: float = 1e-3):
    """Build ``fn(a, b, c, o, d) -> (t, idx, hit, uv)`` where the
    triangle arrays are sharded over the ``data`` axis and rays are
    replicated. Pads the triangle count to the axis size with degenerate
    triangles (never hit)."""
    n_data = mesh.shape[DATA_AXIS]
    pad = (-n_tris) % n_data

    def shard_fn(a, b, c, o, d):
        # local slice offset -> global triangle ids
        shard = jax.lax.axis_index(DATA_AXIS)
        per = a.shape[0]
        t, idx, hit, uv = intersect_triangles(o, d, a, b, c, t_min, _BIG)
        gidx = jnp.where(hit, idx + shard * per, _IMAX)
        # lexicographic (t, gidx) min across shards: min-t first, then
        # min global index among bit-equal t (list-order tie-break)
        t_min_all = jax.lax.pmin(t, DATA_AXIS)
        mine = t == t_min_all
        idx_all = jax.lax.pmin(jnp.where(mine, gidx, _IMAX), DATA_AXIS)
        win = mine & (gidx == idx_all) & hit
        pick = lambda x: jax.lax.psum(jnp.where(win, x, 0.0), DATA_AXIS)
        uv_all = jnp.stack([pick(uv[:, 0]), pick(uv[:, 1])], axis=-1)
        hit_all = t_min_all < _BIG
        return (t_min_all, jnp.where(hit_all, idx_all, 0),
                hit_all, uv_all)

    sharded = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
    )

    def fn(a, b, c, o, d):
        if pad:
            z = jnp.zeros((pad, 3), jnp.float32)
            a = jnp.concatenate([a, z])
            b = jnp.concatenate([b, z])
            c = jnp.concatenate([c, z])
        return sharded(a, b, c, o, d)

    return fn
