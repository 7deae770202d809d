"""Worker process for the two-process jax.distributed loopback test
(SURVEY.md §4d). Each process owns 4 virtual CPU devices; the global mesh
spans 8. Renders the mini scene sharded over the global mesh and writes
its (host-gathered) image + counters to an npz for the parent to check.

Run: python tests/multihost_worker.py <process_id> <port> <out.npz>
"""

import os
import sys


def main() -> int:
    pid = int(sys.argv[1])
    port = sys.argv[2]
    out_path = sys.argv[3]

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from zraytrace_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    import numpy as np

    from tests.test_render import _mini_scene
    from zraytrace_tpu.config import RenderParams
    from zraytrace_tpu.parallel.mesh import make_mesh, render_sharded

    scene, camera = _mini_scene()
    params = RenderParams(width=8, height=8, samples_per_pixel=4, max_depth=3)
    mesh = make_mesh(n_data=4, n_sample=2)  # global mesh over both hosts
    image, stats = render_sharded(scene, camera, params, mesh)

    np.savez(out_path, image=image, rays=stats.rays, samples=stats.samples,
             background=stats.background_hits,
             coordinator=multihost.is_coordinator())
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
