"""Device-side linear operators for the constraint/objective matrices.

Two TPU-friendly layouts:

- DenseOp: the matrix as a dense (m, n) array. Matvecs run on the MXU.
  Best for small/medium problems (Netlib-scale), where densifying is
  cheaper than irregular gathers.

- SparseOp: a padded, bucketed ELL layout. Rows are grouped into buckets
  by power-of-two nnz; each bucket stores (rows_b, k) column-index and
  value planes. A matvec is `(vals * x[cols]).sum(axis=1)` per bucket -
  one vectorized gather plus a dense K-wide reduction - followed by one
  inverse-permutation gather to restore row order. Transposed products
  use a second ELL built from A^T (both orientations are stored; HBM
  cost 2x nnz, the same trade the reference's CSC makes implicitly by
  iterating columns for A'y).

  Why ELL and not flat CSR + segment_sum: on TPU, XLA lowers both gather
  and scatter/segment-sum to ~1e8 indices/s serialized loops (measured
  on v5e); ELL needs ONE gather per bucket and does the row reduction as
  a dense sum, so a matvec costs one index pass instead of two. The
  gather itself is the remaining bottleneck - a Pallas routing kernel is
  the planned next step (docs/performance.md).

  Lowering pitfalls this file avoids (measured): `jnp.take`'s index
  normalization costs extra under x64, so the gather is a raw
  `lax.gather` with PROMISE_IN_BOUNDS (indices validated host-side);
  index arrays must always be jit ARGUMENTS (constant-captured operands
  hit a much slower constant-gather path) - they live in a pytree
  dataclass that is always passed as an argument.

Reference call sites these replace: `problem.constraint_matrix * x` and
`problem.constraint_matrix' * y` (src/saddle_point.jl:1089,1106;
src/primal_dual_hybrid_gradient.jl:492).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax import lax


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseOp:
    a: jax.Array  # (m, n)

    @property
    def shape(self) -> Tuple[int, int]:
        return self.a.shape

    def mv(self, x: jax.Array) -> jax.Array:
        return self.a @ x

    def rmv(self, y: jax.Array) -> jax.Array:
        # A' y computed as (y' A)'; XLA folds the transpose into the
        # contraction so only one copy of `a` lives in HBM.
        return y @ self.a


def _gather_1d(x: jax.Array, idx: jax.Array) -> jax.Array:
    """x[idx] (idx any shape) via raw lax.gather, PROMISE_IN_BOUNDS.

    Indices are validated in-bounds at build time (host side), so the
    clip/normalization arithmetic of jnp.take is skipped.
    """
    flat = idx.reshape(-1)
    out = lax.gather(
        x[:, None],
        flat[:, None],
        lax.GatherDimensionNumbers(
            offset_dims=(1,),
            collapsed_slice_dims=(0,),
            start_index_map=(0,),
        ),
        slice_sizes=(1, 1),
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )[:, 0]
    return out.reshape(idx.shape)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EllBucket:
    cols: jax.Array  # (rows_b, k) int32, padded with 0
    vals: jax.Array  # (rows_b, k) float, padded with 0.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EllHalf:
    """Row-major padded-ELL of a single orientation of a sparse matrix."""

    buckets: Tuple[EllBucket, ...]
    inv_perm: jax.Array  # (m,) int32: output row i lives at concat[inv_perm[i]]

    def mv(self, x: jax.Array) -> jax.Array:
        parts = [
            (b.vals * _gather_1d(x, b.cols)).sum(axis=1)
            for b in self.buckets
        ]
        concat = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        return _gather_1d(concat, self.inv_perm)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SparseOp:
    fwd: EllHalf  # A, row-major
    bwd: EllHalf  # A^T, row-major
    num_rows: int = dataclasses.field(metadata=dict(static=True))
    num_cols: int = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.num_rows, self.num_cols)

    def mv(self, x: jax.Array) -> jax.Array:
        return self.fwd.mv(x)

    def rmv(self, y: jax.Array) -> jax.Array:
        return self.bwd.mv(y)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CooOp:
    """Flat padded-COO layout: matvecs as gather + segment-sum.

    The ONE layout whose pytree shapes depend only on (padded nnz, m, n)
    - no per-instance bucket geometry - so solver programs compiled for
    one instance are reused verbatim for any instance padded to the same
    (m, n, nnz) bucket (the shape-bucketed benchmark-campaign protocol;
    see benchmarking/run_campaign.py --tpu). Entries are CSR-ordered
    (rows sorted); nnz is padded to the next power of two with
    (row 0, col 0, 0.0) entries - segment-summing an extra zero is
    exact. Matvec cost is index-rate bound (~1e8 idx/s on v5e, one
    gather + one scatter-add per product), so it serves the STATS path
    (every termination_evaluation_frequency iterations) and f64 solves,
    not the f32 hot loop - pair with "dense_onchip" for that.

    Reference call sites replaced: same as SparseOp
    (src/saddle_point.jl:1089,1106)."""

    rows: jax.Array  # (nnz_pad,) int32, sorted (CSR order)
    cols: jax.Array  # (nnz_pad,) int32
    vals: jax.Array  # (nnz_pad,) float
    num_rows: int = dataclasses.field(metadata=dict(static=True))
    num_cols: int = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.num_rows, self.num_cols)

    def mv(self, x: jax.Array) -> jax.Array:
        prod = self.vals * _gather_1d(x, self.cols)
        return jax.ops.segment_sum(
            prod,
            self.rows,
            num_segments=self.num_rows,
            indices_are_sorted=True,
        )

    def rmv(self, y: jax.Array) -> jax.Array:
        prod = self.vals * _gather_1d(y, self.rows)
        return jax.ops.segment_sum(
            prod, self.cols, num_segments=self.num_cols
        )


def _pad_pow2(n: int, minimum: int = 4096) -> int:
    p = minimum
    while p < n:
        p *= 2
    return p


def build_coo_op(
    matrix: sp.spmatrix, dtype=jnp.float64, convert=None,
    nnz_multiple: Optional[int] = None,
) -> CooOp:
    """nnz is padded to a power of two (min 4096) by default so the
    padded size is canonical across instances in a size bucket;
    `nnz_multiple` overrides with round-up-to-multiple padding."""
    if convert is None:
        convert = jnp.asarray
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    csr = sp.csr_matrix(matrix)
    csr.sum_duplicates()
    nnz = csr.nnz
    if nnz_multiple:
        nnz_pad = max(-(-nnz // nnz_multiple) * nnz_multiple, nnz_multiple)
    else:
        nnz_pad = _pad_pow2(nnz)
    rows = np.zeros(nnz_pad, dtype=np.int32)
    cols = np.zeros(nnz_pad, dtype=np.int32)
    vals = np.zeros(nnz_pad, dtype=np_dtype)
    rows[:nnz] = np.repeat(
        np.arange(csr.shape[0], dtype=np.int32), np.diff(csr.indptr)
    )
    cols[:nnz] = csr.indices
    vals[:nnz] = csr.data.astype(np_dtype)
    # padding rows must keep the sorted (CSR) order for segment_sum's
    # indices_are_sorted: point them at the LAST row.
    rows[nnz:] = max(csr.shape[0] - 1, 0)
    return CooOp(
        rows=convert(rows),
        cols=convert(cols),
        vals=convert(vals),
        num_rows=matrix.shape[0],
        num_cols=matrix.shape[1],
    )


@functools.partial(jax.jit, static_argnames=("m", "n"))
def _densify(rows, cols, vals, m, n):
    return jnp.zeros((m, n), vals.dtype).at[rows, cols].add(vals)


def build_dense_onchip_op(
    matrix: sp.spmatrix, dtype=jnp.float32, convert=None
) -> DenseOp:
    """DenseOp whose (m, n) plane is scatter-built ON DEVICE from the
    padded COO triplet: the host->device transfer is O(nnz), not
    O(m*n) (the tunneled backend moves ~20 MB/s; a 16k x 16k dense
    plane would cost ~45 s to ship vs ~0.05 s to build on chip). The
    scatter program is keyed on (nnz_pad, m, n) only, so it is shared
    across a campaign bucket."""
    if convert not in (None, jnp.asarray):
        raise ValueError(
            "dense_onchip is device-resident; use format='dense' for "
            "host-mirror (batched stacking) builds"
        )
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    coo = sp.coo_matrix(matrix)
    coo.sum_duplicates()
    nnz = coo.nnz
    nnz_pad = _pad_pow2(nnz)
    rows = np.zeros(nnz_pad, dtype=np.int32)
    cols = np.zeros(nnz_pad, dtype=np.int32)
    vals = np.zeros(nnz_pad, dtype=np_dtype)
    rows[:nnz] = coo.row
    cols[:nnz] = coo.col
    vals[:nnz] = coo.data.astype(np_dtype)
    return DenseOp(
        a=_densify(
            jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
            matrix.shape[0], matrix.shape[1],
        )
    )


# RoutedOp (ops/routed.py) also satisfies this interface; the union is
# annotation-only and dispatch is duck-typed through mv/rmv.
LinOp = Union[DenseOp, SparseOp, CooOp]


def matvec(op: Optional[LinOp], x: jax.Array) -> jax.Array:
    if op is None:
        return jnp.zeros_like(x)
    return op.mv(x)


def rmatvec(op: Optional[LinOp], y: jax.Array) -> jax.Array:
    if op is None:
        return jnp.zeros_like(y)
    return op.rmv(y)


def _build_ell_half(csr: sp.csr_matrix, dtype, convert=None) -> EllHalf:
    """Builds the bucketed ELL planes for one orientation (host side).

    `convert` maps host arrays to leaves (default jnp.asarray); pass
    np.asarray to keep the structure host-side (batched stacking paths
    transfer once after stacking instead of once per instance).
    """
    if convert is None:
        convert = jnp.asarray
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    m = csr.shape[0]
    row_nnz = np.diff(csr.indptr)
    max_nnz = int(row_nnz.max()) if m > 0 else 0

    # Power-of-two bucket widths, smallest 1.
    widths = []
    k = 1
    while k < max(max_nnz, 1):
        widths.append(k)
        k *= 2
    widths.append(max(k, 1))

    # Assign each row the smallest width >= its nnz.
    bucket_of_row = np.searchsorted(widths, np.maximum(row_nnz, 1))

    # Flat entry -> (row, within-row offset), fully vectorized.
    row_of_entry = np.repeat(np.arange(m, dtype=np.int64), row_nnz)
    offset_of_entry = np.arange(csr.nnz, dtype=np.int64) - np.repeat(
        csr.indptr[:-1].astype(np.int64), row_nnz
    )
    entry_bucket = bucket_of_row[row_of_entry] if csr.nnz > 0 else row_of_entry

    buckets = []
    perm_chunks = []
    for b, width in enumerate(widths):
        rows_b = np.flatnonzero(bucket_of_row == b)
        if len(rows_b) == 0:
            continue
        pos_of_row = np.zeros(m, dtype=np.int64)
        pos_of_row[rows_b] = np.arange(len(rows_b))
        cols = np.zeros((len(rows_b), width), dtype=np.int32)
        vals = np.zeros((len(rows_b), width), dtype=np.float64)
        emask = entry_bucket == b
        r = row_of_entry[emask]
        cols[pos_of_row[r], offset_of_entry[emask]] = csr.indices[emask]
        vals[pos_of_row[r], offset_of_entry[emask]] = csr.data[emask]
        buckets.append(
            EllBucket(
                cols=convert(cols),
                vals=convert(vals.astype(np_dtype)),
            )
        )
        perm_chunks.append(rows_b)

    if not buckets:
        # Degenerate all-empty matrix: a single zero bucket.
        buckets = [
            EllBucket(
                cols=convert(np.zeros((m, 1), dtype=np.int32)),
                vals=convert(np.zeros((m, 1), dtype=np_dtype)),
            )
        ]
        perm_chunks = [np.arange(m)]

    perm = np.concatenate(perm_chunks)
    inv_perm = np.empty(m, dtype=np.int32)
    inv_perm[perm] = np.arange(m, dtype=np.int32)
    return EllHalf(buckets=tuple(buckets), inv_perm=convert(inv_perm))


def build_sparse_op(
    matrix: sp.spmatrix, dtype=jnp.float64, convert=None
) -> SparseOp:
    csr = sp.csr_matrix(matrix)
    csr.sum_duplicates()
    csr_t = sp.csr_matrix(matrix.T)
    csr_t.sum_duplicates()
    return SparseOp(
        fwd=_build_ell_half(csr, dtype, convert),
        bwd=_build_ell_half(csr_t, dtype, convert),
        num_rows=matrix.shape[0],
        num_cols=matrix.shape[1],
    )


def build_dense_op(
    matrix: sp.spmatrix, dtype=jnp.float64, convert=None
) -> DenseOp:
    if convert is None:
        convert = jnp.asarray
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    return DenseOp(
        a=convert(np.asarray(matrix.todense()).astype(np_dtype))
    )


# Single source of truth for the auto-format routed cutover (the
# sharded path must never diverge from build_linop's default).
ROUTED_NNZ_THRESHOLD = 50_000


def build_linop(
    matrix: sp.spmatrix,
    dtype=jnp.float64,
    format: str = "auto",
    dense_size_limit: int = 2_000_000,
    convert=None,
    routed_nnz_threshold: int = ROUTED_NNZ_THRESHOLD,
    shard_plan=None,
) -> LinOp:
    """Chooses a device layout for `matrix`.

    format: "dense", "sparse" (or legacy "ell"), "routed" (Pallas
    one-hot routing kernels, f32 single-instance; ops/routed.py), or
    "auto": dense when m*n <= dense_size_limit, routed on TPU for f32
    matrices with >= routed_nnz_threshold nonzeros (~10x the ELL matvec,
    measured), ELL otherwise.

    shard_plan: a RoutedShardPlan (ops/routed_sharded.py) for multi-chip
    solves; when the routed conditions hit, builds the block-partitioned
    ShardedRoutedOp over the plan's mesh instead of the single-device
    RoutedOp (which has no sharding story).
    """
    m, n = matrix.shape
    if format == "coo":
        return build_coo_op(matrix, dtype, convert)
    if format == "dense_onchip":
        return build_dense_onchip_op(matrix, dtype, convert)
    if format == "dense" or (format == "auto" and m * n <= dense_size_limit):
        return build_dense_op(matrix, dtype, convert)
    if shard_plan is not None:
        if format == "routed" or (
            format == "auto"
            and jnp.dtype(dtype) == jnp.float32
            and matrix.nnz >= routed_nnz_threshold
            and convert in (None, jnp.asarray)
            and jax.default_backend() == "tpu"
        ):
            from .routed_sharded import build_sharded_routed_op

            if jnp.dtype(dtype) != jnp.float32:
                raise ValueError("routed layout computes in f32")
            return build_sharded_routed_op(matrix, shard_plan)
        return build_sparse_op(matrix, dtype, convert)
    if format == "routed" or (
        format == "auto"
        and jnp.dtype(dtype) == jnp.float32
        and matrix.nnz >= routed_nnz_threshold
        and convert in (None, jnp.asarray)
        and jax.default_backend() == "tpu"
    ):
        from .routed import build_routed_op

        if convert not in (None, jnp.asarray):
            raise ValueError(
                "routed layout is device-resident (host-mirror stacking "
                "unsupported); use format='ell' for batched fleets"
            )
        if jnp.dtype(dtype) != jnp.float32:
            raise ValueError("routed layout computes in f32")
        return build_routed_op(matrix)
    return build_sparse_op(matrix, dtype, convert)
