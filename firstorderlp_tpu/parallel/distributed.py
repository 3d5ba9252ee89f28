"""Multi-host distributed solves (jax.distributed + global mesh).

The reference is single-threaded Julia (SURVEY.md section 5.8:
"distributed communication backend - absent in reference"); this module
is the TPU-native equivalent: every host runs the same program,
`jax.distributed.initialize` wires the processes into one runtime, and
the solver mesh spans the GLOBAL device set so GSPMD collectives ride
ICI within a slice and DCN across slices. The solver code is unchanged -
multi-host is only initialization + a global mesh + shardings
(sharded_optimize).

Typical pod-slice launch (same command on every host):

    python -c "
    from firstorderlp_tpu.parallel import distributed as D
    D.initialize()                       # env-based (TPU pods: automatic)
    out = D.distributed_optimize(params, problem)
    "

On CPU test rigs, a 1-process 'cluster' with a virtual device count
exercises the same code path (tests/test_sharding.py).
"""

from __future__ import annotations

from typing import Optional

import jax

from .mesh import solver_mesh
from .sharded import sharded_optimize

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Initializes the multi-host runtime (idempotent).

    With no arguments, jax.distributed.initialize autodetects cluster
    environments (TPU pods, GKE); on a single host with no cluster env
    this is a no-op so the same entry point works everywhere.
    """
    global _initialized
    if _initialized or jax.process_count() > 1:
        _initialized = True
        return
    if (
        coordinator_address is None
        and num_processes is None
        and jax.process_count() == 1
    ):
        # single-process run (or env autodetection not applicable):
        # nothing to initialize; the global mesh is the local mesh.
        _initialized = True
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True


def global_solver_mesh(
    n_dual: Optional[int] = None, n_primal: int = 1
):
    """A ("dual", "primal") mesh over the GLOBAL device set (all hosts).

    Defaults to all global devices on the "dual" axis. Collectives along
    an axis that spans hosts ride DCN; keep the fastest-varying axis
    within a slice for ICI bandwidth (jax.devices() orders local devices
    first per process, so a (hosts*local, 1) mesh keeps "dual" segments
    host-local)."""
    devices = jax.devices()  # global across processes after initialize()
    if n_dual is None:
        n_dual = len(devices) // n_primal
    return solver_mesh(n_dual, n_primal, devices)


def distributed_optimize(
    params,
    problem,
    n_dual: Optional[int] = None,
    n_primal: int = 1,
):
    """initialize() + global mesh + sharded_optimize in one call.

    Every participating process must call this with the SAME problem
    and parameters (single-program multiple-data); the return value is
    replicated on all hosts."""
    initialize()
    mesh = global_solver_mesh(n_dual, n_primal)
    return sharded_optimize(params, problem, mesh)
