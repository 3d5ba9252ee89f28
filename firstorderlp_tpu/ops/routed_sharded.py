"""Multi-chip routed SpMV: the Pallas one-hot kernels under shard_map.

The single-chip routed layout (ops/routed.py) is already strip
partitioned - row strips for mv's reduce, col strips for rmv's - so the
multi-chip design partitions A into a (D, P) grid of blocks over the
('dual', 'primal') mesh: device (d, p) holds a complete routed tile
plan for the block A[d-rows, p-cols]. A matvec is then the classic 2-D
SpMV decomposition:

  mv : x sharded P('primal') (replicated over 'dual') -> each device
       runs the local expand+reduce kernels on its block -> psum over
       'primal' combines the column-block partials -> y P('dual').
  rmv: the mirror image, psum over 'dual' -> x P('primal').

Per iteration the PDHG hot loop runs one mv and one rmv, so the
communication volume is exactly one psum of a (m/D,)-f32 vector over
the primal axis plus one psum of a (n/P,)-f32 vector over the dual axis
per KKT pass - see docs/scaling.md for the bytes/iteration model vs ICI
bandwidth.

All blocks share one static kernel geometry (group_rows, b2, hr,
rb, cb): each block's plan is padded to the fleet-max chunk/group
counts with zero-valued chunks (routing them to chunk 0 and strip
nstrips-1, which accumulate exact zeros), so every device executes the
same compiled kernel - SPMD with no per-device specialization.

Reference semantics reproduced: `problem.constraint_matrix * x` and
`' * y` (src/saddle_point.jl:1089,1106); SURVEY.md section 2's mandated
"Sharded SpMV (row+column block partition over mesh)" row. The
reference itself is single-process Julia - this layer is TPU-native new
work.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .routed import RoutedOp, auto_geometry, build_plan_arrays


@dataclasses.dataclass(frozen=True)
class RoutedShardPlan:
    """Static plan for building a ShardedRoutedOp: the mesh plus the
    shared per-block strip geometry. `row_multiple`/`col_multiple` are
    the divisibility requirements the problem must be padded to
    (parallel.sharded.pad_problem) before the op can be built."""

    mesh: Mesh
    b2: int
    hr: int
    group_rows: int = 32
    tile_aligned: bool = False

    @property
    def n_dual(self) -> int:
        return self.mesh.shape.get("dual", 1)

    @property
    def n_primal(self) -> int:
        return self.mesh.shape.get("primal", 1)

    @property
    def row_multiple(self) -> int:
        return self.n_dual * 128 * self.hr

    @property
    def col_multiple(self) -> int:
        return self.n_primal * 128 * self.b2


def plan_routed_shards(
    num_rows: int,
    num_cols: int,
    nnz: int,
    mesh: Mesh,
    group_rows: int = 32,
) -> RoutedShardPlan:
    """Picks the shared block geometry from the PER-DEVICE block shape
    (the single-chip builder's calibrated cost model, estimate-only
    form - the global matrix is not materialized here)."""
    n_dual = mesh.shape.get("dual", 1)
    n_primal = mesh.shape.get("primal", 1)
    m_loc = max(-(-num_rows // n_dual), 1)
    n_loc = max(-(-num_cols // n_primal), 1)
    nnz_loc = max(-(-nnz // (n_dual * n_primal)), 1)
    b2, hr = auto_geometry(m_loc, n_loc, nnz_loc)
    return RoutedShardPlan(mesh=mesh, b2=b2, hr=hr, group_rows=group_rows)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedRoutedOp:
    """Block-partitioned routed-SpMV operator over a ('dual','primal')
    mesh (drop-in LinOp: mv / rmv / shape). Array leaves carry leading
    (n_dual, n_primal) device axes sharded P('dual','primal', ...)."""

    loc_e: jax.Array  # (D, P, nchunks_e, 128) int32
    vals_e: jax.Array  # (D, P, nchunks_e, 128) f32
    strip_e: jax.Array  # (D, P, ngroups_e) int32
    meta_e: jax.Array  # (D, P, ngroups_e, 3) int32
    chunk_src_e: jax.Array  # (D, P, nchunks_e) int32
    loc_r: jax.Array  # (D, P, nchunks_r, 128) int32
    vals_r: jax.Array  # (D, P, nchunks_r, 128) f32
    strip_r: jax.Array  # (D, P, ngroups_r) int32
    meta_r: jax.Array  # (D, P, ngroups_r, 3) int32
    chunk_src_r: jax.Array  # (D, P, nchunks_r) int32
    # static geometry: global shape + PER-BLOCK strip counts
    num_rows: int = dataclasses.field(metadata=dict(static=True))
    num_cols: int = dataclasses.field(metadata=dict(static=True))
    b2: int = dataclasses.field(metadata=dict(static=True))
    hr: int = dataclasses.field(metadata=dict(static=True))
    cb: int = dataclasses.field(metadata=dict(static=True))  # per block
    rb: int = dataclasses.field(metadata=dict(static=True))  # per block
    group_rows: int = dataclasses.field(metadata=dict(static=True))
    mesh: Mesh = dataclasses.field(
        default=None, metadata=dict(static=True)
    )
    tile_aligned: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.num_rows, self.num_cols)

    def _local_op(self, leaves) -> RoutedOp:
        """The per-device RoutedOp over this device's block (called
        inside shard_map; `leaves` are the (1, 1, ...) local blocks)."""
        (loc_e, vals_e, strip_e, meta_e, cse,
         loc_r, vals_r, strip_r, meta_r, csr_) = leaves
        return RoutedOp(
            loc_e=loc_e[0, 0],
            vals_e=vals_e[0, 0],
            strip_e=strip_e[0, 0],
            meta_e=meta_e[0, 0],
            chunk_src_e=cse[0, 0],
            loc_r=loc_r[0, 0],
            vals_r=vals_r[0, 0],
            strip_r=strip_r[0, 0],
            meta_r=meta_r[0, 0],
            chunk_src_r=csr_[0, 0],
            num_rows=self.rb * 128 * self.hr,
            num_cols=self.cb * 128 * self.b2,
            b2=self.b2,
            hr=self.hr,
            cb=self.cb,
            rb=self.rb,
            group_rows=self.group_rows,
            pattern_hash="",
            tile_aligned=self.tile_aligned,
        )

    def _plan_leaves(self):
        return (
            self.loc_e, self.vals_e, self.strip_e, self.meta_e,
            self.chunk_src_e, self.loc_r, self.vals_r, self.strip_r,
            self.meta_r, self.chunk_src_r,
        )

    def _plan_specs(self):
        return tuple(
            P("dual", "primal", *([None] * (leaf.ndim - 2)))
            for leaf in self._plan_leaves()
        )

    def mv(self, x: jax.Array) -> jax.Array:
        """A @ x: local block mv + psum of the column-block partials."""

        def body(*args):
            xl = args[-1]
            op = self._local_op(args[:-1])
            y_loc = op.mv(xl)
            return jax.lax.psum(y_loc, "primal")

        shmap = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=self._plan_specs() + (P("primal"),),
            out_specs=P("dual"),
            check_vma=False,
        )
        return shmap(*self._plan_leaves(), x)

    def rmv(self, y: jax.Array) -> jax.Array:
        """A' @ y: local block rmv + psum of the row-block partials."""

        def body(*args):
            yl = args[-1]
            op = self._local_op(args[:-1])
            x_loc = op.rmv(yl)
            return jax.lax.psum(x_loc, "dual")

        shmap = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=self._plan_specs() + (P("dual"),),
            out_specs=P("primal"),
            check_vma=False,
        )
        return shmap(*self._plan_leaves(), y)


def _pad_chunks(a, target):
    return np.pad(
        a, ((0, target - a.shape[0]),) + ((0, 0),) * (a.ndim - 1)
    )


def _pad_groups_strip(a, target, nstrips):
    # padding groups read/accumulate-zero on the LAST strip so the
    # kernel's revisit-in-VMEM output block does not bounce back to
    # strip 0 at the end of the grid.
    pad = target - a.shape[0]
    return np.concatenate([a, np.full(pad, nstrips - 1, dtype=a.dtype)])


def _pad_groups_meta(a, target, nstrips):
    pad = target - a.shape[0]
    extra = np.zeros((pad, a.shape[1]), dtype=a.dtype)
    extra[:, 0] = nstrips - 1  # strip id; first/last flags stay 0
    return np.concatenate([a, extra])


def pad_plan_block(
    block, nchunks_e, nchunks_r, ngroups_e, ngroups_r
):
    """Pads one block's PlanArrays to the fleet-shared chunk/group
    counts (zero-valued chunks route to chunk 0 / the last strip, which
    accumulate exact zeros). Shared by build_sharded_routed_op (global
    matrix on every host) and parallel.shard_ingest's host-sharded
    builder (each process pads only its local blocks)."""
    return dict(
        loc_e=_pad_chunks(block.loc_e, nchunks_e),
        vals_e=_pad_chunks(block.vals_e, nchunks_e),
        strip_e=_pad_groups_strip(block.strip_e, ngroups_e, block.cb),
        meta_e=_pad_groups_meta(block.meta_e, ngroups_e, block.cb),
        chunk_src_e=_pad_chunks(block.chunk_src_e, nchunks_e),
        loc_r=_pad_chunks(block.loc_r, nchunks_r),
        vals_r=_pad_chunks(block.vals_r, nchunks_r),
        strip_r=_pad_groups_strip(block.strip_r, ngroups_r, block.rb),
        meta_r=_pad_groups_meta(block.meta_r, ngroups_r, block.rb),
        chunk_src_r=_pad_chunks(block.chunk_src_r, nchunks_r),
    )


def build_sharded_routed_op(
    matrix: sp.spmatrix,
    plan: RoutedShardPlan,
    share_plan_with: "ShardedRoutedOp | None" = None,
) -> ShardedRoutedOp:
    """Builds the (D, P) grid of block tile plans and places each block
    on its mesh device.

    Requires the matrix pre-padded so the block grid divides exactly:
    m % plan.row_multiple == 0 and n % plan.col_multiple == 0
    (parallel.sharded.pad_problem with the plan's multiples).

    share_plan_with: an existing ShardedRoutedOp over the same pattern
    and plan; reuses its device index planes, transferring only values.
    """
    csr = sp.csr_matrix(matrix)
    csr.sum_duplicates()
    m, n = csr.shape
    d, pr = plan.n_dual, plan.n_primal
    if m % plan.row_multiple or n % plan.col_multiple:
        raise ValueError(
            f"matrix ({m}, {n}) must be padded to multiples of "
            f"({plan.row_multiple}, {plan.col_multiple}) for the "
            f"{d}x{pr} mesh (see parallel.sharded.pad_problem)"
        )
    m_loc, n_loc = m // d, n // pr

    blocks = []
    for di in range(d):
        row_block = csr[di * m_loc : (di + 1) * m_loc]
        for pi in range(pr):
            block = sp.csr_matrix(
                row_block[:, pi * n_loc : (pi + 1) * n_loc]
            )
            blocks.append(
                build_plan_arrays(
                    block, plan.group_rows, plan.b2, plan.hr,
                    plan.tile_aligned,
                )
            )

    rb, cb = blocks[0].rb, blocks[0].cb  # identical across blocks
    nchunks_e = max(b.loc_e.shape[0] for b in blocks)
    nchunks_r = max(b.loc_r.shape[0] for b in blocks)
    ngroups_e = max(b.strip_e.shape[0] for b in blocks)
    ngroups_r = max(b.strip_r.shape[0] for b in blocks)

    padded = [
        pad_plan_block(b, nchunks_e, nchunks_r, ngroups_e, ngroups_r)
        for b in blocks
    ]
    host = {
        field: np.stack([pb[field] for pb in padded]).reshape(
            (d, pr) + padded[0][field].shape
        )
        for field in padded[0]
    }

    if share_plan_with is not None:
        donor = share_plan_with
        if (
            donor.vals_e.shape != host["vals_e"].shape
            or donor.vals_r.shape != host["vals_r"].shape
            or (donor.rb, donor.cb, donor.b2, donor.hr)
            != (rb, cb, plan.b2, plan.hr)
        ):
            raise ValueError(
                "share_plan_with requires an identical block plan"
            )
        mesh = donor.mesh
        return dataclasses.replace(
            donor,
            vals_e=jax.device_put(
                host["vals_e"],
                NamedSharding(mesh, P("dual", "primal", None, None)),
            ),
            vals_r=jax.device_put(
                host["vals_r"],
                NamedSharding(mesh, P("dual", "primal", None, None)),
            ),
        )

    mesh = plan.mesh
    device = {
        k: jax.device_put(
            v,
            NamedSharding(
                mesh, P("dual", "primal", *([None] * (v.ndim - 2)))
            ),
        )
        for k, v in host.items()
    }
    return ShardedRoutedOp(
        num_rows=m,
        num_cols=n,
        b2=plan.b2,
        hr=plan.hr,
        cb=cb,
        rb=rb,
        group_rows=plan.group_rows,
        mesh=mesh,
        tile_aligned=plan.tile_aligned,
        **device,
    )
