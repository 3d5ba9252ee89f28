"""Device-mesh helpers for multi-chip solves.

The solver mesh has two logical axes:
- "dual":   partitions constraint-indexed data (rows of A, y-like vectors),
- "primal": partitions variable-indexed data (columns of A, x-like vectors).

A dense constraint matrix sharded P("dual", "primal") gives the classic
2-D SpMV decomposition: Ax reduces partial products over "primal"
(psum riding ICI), A'y reduces over "dual". XLA/GSPMD inserts those
collectives from the shardings; no hand-written NCCL-style code
(the reference is single-threaded Julia - this layer is new,
see SURVEY.md section 2 "Parallelism & communication components").
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def solver_mesh(
    n_dual: int,
    n_primal: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Creates a ("dual", "primal") mesh over the given devices."""
    if devices is None:
        devices = jax.devices()
    need = n_dual * n_primal
    if len(devices) < need:
        raise ValueError(
            f"need {need} devices for a {n_dual}x{n_primal} mesh, have "
            f"{len(devices)}"
        )
    grid = np.asarray(devices[:need]).reshape(n_dual, n_primal)
    return Mesh(grid, axis_names=("dual", "primal"))


def default_solver_mesh(devices=None) -> Mesh:
    """All available devices on the "dual" (row) axis - the right default
    for LP instances, which typically have more constraints than the
    per-device memory wants in one shard."""
    if devices is None:
        devices = jax.devices()
    return solver_mesh(len(devices), 1, devices)
