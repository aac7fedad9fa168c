"""Multi-host scaffolding.

The reference's only cross-process path is Julia ``Distributed`` via the
(untested) ``MCMCDistributed()`` export (SURVEY §2b). The TPU-native
equivalent is the ``jax.distributed`` runtime: N hosts each driving their
chips, one global mesh spanning all of them, walker/chain axes sharded
over ICI within a slice and DCN across slices. Because every algorithm
here is a single jitted SPMD program over a mesh, multi-host is purely an
initialization + mesh-construction concern — the algorithm code is
unchanged.

Typical use (same script on every host):

    from kissabc_tpu.parallel import distributed as dist
    dist.initialize()                      # reads cluster env, or pass args
    mesh = dist.global_mesh(walker=jax.device_count())
    res = ka.smc(prior, cost, nparticles=1 << 20, mesh=mesh)

Single-host this degrades gracefully: ``initialize`` is a no-op when no
cluster environment is detected, and ``global_mesh`` builds a local mesh.
"""

from __future__ import annotations

import os

import jax

from .mesh import make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialize the jax.distributed runtime.

    With no args, auto-detects cluster env (TPU pod metadata / the
    JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID vars).
    Returns True if a multi-process runtime was initialized, False for
    the single-host no-op path.
    """
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        v = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(v) if v else None
    if process_id is None:
        v = os.environ.get("JAX_PROCESS_ID")
        process_id = int(v) if v else None

    if coordinator_address is None and num_processes is None:
        # bare TPU-pod case: jax.distributed can self-configure from
        # metadata; only attempt when more than one process is implied
        if os.environ.get("TPU_WORKER_HOSTNAMES", "localhost") in (
                "", "localhost"):
            return False
        jax.distributed.initialize()
        return True

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return True


def global_mesh(**axes):
    """A mesh over ALL devices of the (possibly multi-host) runtime.
    Axis sizes must multiply to jax.device_count(); walker-style axes
    should span hosts so the ensemble is one logical population."""
    return make_mesh(**axes)


def process_info():
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": jax.device_count(),
    }
