from zraytrace_tpu.parallel.mesh import (
    make_mesh,
    render_sharded,
    replicate,
    shard_lanes,
)

__all__ = ["make_mesh", "render_sharded", "replicate", "shard_lanes"]
