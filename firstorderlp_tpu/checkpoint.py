"""Solver-state checkpoint / resume.

The reference has no checkpointing (both solvers always start from zero
vectors, src/primal_dual_hybrid_gradient.jl:806-810) - on preemptible TPU
pods it is required infrastructure. The full solver state is a small
pytree (iterates, A'y cache, weighted averages, restart info, step-size
scalars), so a checkpoint is one .npz file written from the host loop
between jitted segments.

Format: numpy .npz with one entry per pytree leaf keyed by its tree path,
plus a `__meta__` JSON string (schema version, wall-clock already spent,
user metadata). Loading restores into a template state pytree (from
`_initial_state`), preserving leaf dtypes and shapes; mismatches raise.
"""

from __future__ import annotations

import io
import json
import os
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_SCHEMA_VERSION = 1


def problem_fingerprint(problem) -> str:
    """Cheap content hash of a QuadraticProgrammingProblem.

    Checkpoints written against one problem must not silently resume
    another problem with identical shapes; the fingerprint covers the
    shapes, nnz, and value checksums of every data field.
    """
    import hashlib

    h = hashlib.sha256()
    a = problem.constraint_matrix.tocoo()
    h.update(
        repr(
            (
                a.shape,
                a.nnz,
                int(problem.num_equalities),
            )
        ).encode()
    )
    for arr in (
        a.row,
        a.col,
        a.data,
        problem.right_hand_side,
        problem.objective_vector,
        problem.variable_lower_bound,
        problem.variable_upper_bound,
        np.asarray(problem.objective_constant),
    ):
        h.update(np.ascontiguousarray(arr).tobytes())
    if problem.objective_matrix is not None:
        q = problem.objective_matrix.tocoo()
        for arr in (q.row, q.col, q.data):
            h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()


def _leaf_key(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_state(
    path: str,
    state,
    elapsed_time: float = 0.0,
    metadata: Optional[Dict[str, Any]] = None,
    fingerprint: Optional[str] = None,
) -> None:
    """Writes `state` (any jax pytree) atomically to `path` (.npz).

    `fingerprint` (see problem_fingerprint) binds the checkpoint to the
    problem instance; load_state raises on mismatch.
    """
    leaves = jax.tree_util.tree_leaves_with_path(state)
    arrays = {_leaf_key(p): np.asarray(v) for p, v in leaves}
    meta = {
        "schema_version": _SCHEMA_VERSION,
        "elapsed_time": float(elapsed_time),
        "metadata": metadata or {},
        "fingerprint": fingerprint,
    }
    buf = io.BytesIO()
    np.savez(buf, __meta__=np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8), **arrays)
    # Atomic replace so a preemption mid-write never corrupts the file.
    directory = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(buf.getvalue())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_state(
    path: str, template, fingerprint: Optional[str] = None
) -> Tuple[Any, float, Dict[str, Any]]:
    """Loads a checkpoint into the structure of `template`.

    Returns (state, elapsed_time, metadata). Leaf dtypes follow the
    template (so a checkpoint can be resumed under a different compute
    dtype); shapes must match exactly. When `fingerprint` is given and
    the checkpoint recorded one, a mismatch raises: identical shapes do
    not make it the same problem.
    """
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        if meta.get("schema_version") != _SCHEMA_VERSION:
            raise ValueError(
                f"checkpoint schema {meta.get('schema_version')} != "
                f"{_SCHEMA_VERSION}"
            )
        saved_fp = meta.get("fingerprint")
        if fingerprint is not None and saved_fp is not None:
            if saved_fp != fingerprint:
                raise ValueError(
                    "checkpoint was written for a different problem "
                    f"(fingerprint {saved_fp[:12]}... != "
                    f"{fingerprint[:12]}...)"
                )
        leaves = jax.tree_util.tree_leaves_with_path(template)
        restored = []
        for p, leaf in leaves:
            key = _leaf_key(p)
            if key not in data:
                raise KeyError(f"checkpoint missing leaf {key!r}")
            arr = data[key]
            want_shape = tuple(np.shape(leaf))
            if tuple(arr.shape) != want_shape:
                raise ValueError(
                    f"leaf {key!r}: checkpoint shape {arr.shape} != "
                    f"state shape {want_shape}"
                )
            restored.append(jnp.asarray(arr, dtype=leaf.dtype))
    treedef = jax.tree_util.tree_structure(template)
    state = jax.tree_util.tree_unflatten(treedef, restored)
    return state, float(meta.get("elapsed_time", 0.0)), meta.get(
        "metadata", {}
    )
