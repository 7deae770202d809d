"""Multi-host bring-up (SPMD over a pod slice).

The reference is one OS process (SURVEY.md §3.1). Here the multi-host
story is the standard JAX one: every host runs the SAME program; after
``initialize()`` the global mesh spans all hosts' devices, collectives
ride ICI within a slice and DCN across slices, and the renderers in
``parallel.mesh`` work unchanged — they only speak in terms of the mesh.

Typical flow on every host:

    from zraytrace_tpu.parallel import multihost, mesh
    multihost.initialize()                      # reads cluster env
    m = mesh.make_mesh(n_sample=2)              # all global devices
    img, stats = mesh.render_sharded(scene, camera, params, m)
    if multihost.is_coordinator():
        write_png(path, img)

No hand-rolled transport exists or is needed (SURVEY.md §2: XLA
collectives only).
"""

from __future__ import annotations

import jax


def initialize(**kwargs) -> None:
    """``jax.distributed.initialize`` passthrough; no-op when the process
    already joined a cluster.

    Must run before any other JAX call — touching the backend first (even
    ``jax.process_count()``) locks the process into single-controller
    mode, which is why this checks ``jax.distributed.is_initialized()``
    rather than the device API. With explicit ``coordinator_address`` /
    ``num_processes`` / ``process_id`` kwargs a failure to rendezvous is
    an error and propagates; with no kwargs (auto-detection from cluster
    env) a standalone run is legitimate and errors are swallowed.
    """
    if jax.distributed.is_initialized():
        return
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        if kwargs:
            raise
        # no cluster env to auto-detect: run standalone


def is_coordinator() -> bool:
    return jax.process_index() == 0


def local_device_count() -> int:
    return jax.local_device_count()


def global_device_count() -> int:
    return jax.device_count()
