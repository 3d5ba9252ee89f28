"""Routed sparse matvec: Pallas MXU one-hot kernels, zero per-entry gathers.

The TPU's XLA gather/scatter lowering is index-rate bound (~1.3e8
indices/s measured on v5e), so the round-1 ELL layout pays ~1 gather per
nonzero and a single instance loses to one CPU core. This module replaces
every per-entry gather with MXU one-hot selection over STATIC windows
(measured ~9x the ELL matvec at 800k nnz):

  1. A is partitioned into (row-strip x col-strip) tiles; Hr = 128*HR
     rows by Wc = 128*B2 columns. Each tile's entries are padded to
     128-entry CHUNKS.
  2. Two static entry orders: E-order sorts tiles by (col-strip,
     row-strip); R-order by (row-strip, col-strip). The E->R reorder
     moves whole chunks, so it is ONE XLA gather of 128-wide slices with
     nnz/128 indices (index-count-bound => ~free).
  3. Expand kernel (E-order, grid over groups of G entries, one
     col-strip of x resident in VMEM as a (128, B2) window):
     g[k] = x_window[a_k, b_k] via a single (128,B2)x(128,G) one-hot
     dot_general (contraction depth 128 = full MXU utilization) plus a
     masked column-sum. One-hot entries are exactly representable in
     bfloat16 and each output receives exactly one contribution, so with
     precision=HIGHEST the expansion is EXACT in f32 (verified).
  4. Reduce kernel (R-order): y_strip += O_hi @ (O_lo o (g*vals)), a
     full-depth one-hot scatter-matmul accumulated into the revisited
     (HR,128) output block per row strip (f32 accumulation, same
     rounding class as a dense f32 matvec).

One tile plan serves BOTH orientations: A'y runs the same two kernels
with the phases swapped (expansion over row strips using the local row
indices, reduction into col strips using local columns), the inverse
chunk permutation, and the E-order value planes.

Reference call sites replaced: `problem.constraint_matrix * x` and
`' * y` (src/saddle_point.jl:1089,1106; src/primal_dual_hybrid_gradient
.jl:492). f32 only (the MXU has no f64): the 1e-8 path evaluates stats
in f64 on the ELL/dense operators.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = lax.Precision.HIGHEST

# Default plan mode for build_routed_op (None arg). Tile-aligned plans
# run the fused single-kernel matvecs (one launch, no HBM intermediate,
# no chunk gather) for < group_rows chunks of padding per nonempty tile.
# FOLP_TILE_ALIGNED=0/1 overrides (benchmark A/B knob).
import os as _os

DEFAULT_TILE_ALIGNED = _os.environ.get("FOLP_TILE_ALIGNED", "0") == "1"

# A/B knob: force a fixed group_rows instead of the cost-model pick
# (build_routed_op group_rows=None path). Empty/unset = auto.
_FORCED_GROUP_ROWS = _os.environ.get("FOLP_GROUP_ROWS", "")


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _expand_body(shift, rows, s_ref, xs_ref, loc_ref, g_ref):
    """g[k] = x_window[a_k, b_k]; window (128, B2), a = lc >> shift,
    b = lc & (B2-1). loc packs (local_col | local_row << 16); the low
    half is used here."""
    del s_ref
    k = rows * 128
    # Exact 3-term bf16 split of the f32 window (hi+mid+lo covers all
    # 24 mantissa bits); the one-hot side is exactly 0/1 in bf16, so
    # three DEFAULT-precision passes reproduce HIGHEST's result at half
    # the MXU cost (HIGHEST decomposes BOTH sides -> 6 passes).
    loc = loc_ref[...].reshape(1, k) & 0xFFFF
    g = _expand_halves(xs_ref[0], loc, shift, k)
    g_ref[...] = g.reshape(rows, 128)


def _scatter_matmul(hr, k, p, lo, hi):
    """(hr,128) one-hot scatter-accumulate of p (1,k) at rows hi, lanes
    lo, via a 3-term bf16 split of the DATA side: p = p_hi+p_mid+p_lo
    exactly (24 mantissa bits over three 8-bit bf16 terms), the one-hot
    sides are exactly 0/1 in bf16, and every bf16 x bf16 product is
    exact in the f32 accumulator - so three DEFAULT-precision passes
    reproduce the f32-accumulation class of HIGHEST (6 passes) at half
    the MXU cost. The split happens on the (1,k) row BEFORE broadcasting
    (each term times 0/1 is exact in bf16), and the data terms scale the
    NARROW (hr,k) one-hot rather than the (128,k) one: the VPU-side work
    per group drops from ~8 f32 passes over (128,k) to two iota-compares
    plus three bf16 multiplies over (hr,k) (measured 0.066 -> 0.035 ms
    per reduce pass at 20k nodes). Masked selects with bf16 operands
    trip a Mosaic relayout error, hence multiplies-by-one-hot."""
    p_hi = p.astype(jnp.bfloat16)
    r1 = p - p_hi.astype(jnp.float32)
    p_mid = r1.astype(jnp.bfloat16)
    p_lo = (r1 - p_mid.astype(jnp.float32)).astype(jnp.bfloat16)
    o_lo = (
        lax.broadcasted_iota(jnp.int32, (128, k), 0) == lo
    ).astype(jnp.bfloat16)
    o_hi = (
        lax.broadcasted_iota(jnp.int32, (hr, k), 0) == hi
    ).astype(jnp.bfloat16)
    dn = (((1,), (1,)), ((), ()))
    acc = lax.dot_general(
        o_hi * p_hi, o_lo, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    acc = acc + lax.dot_general(
        o_hi * p_mid, o_lo, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    return acc + lax.dot_general(
        o_hi * p_lo, o_lo, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )


def _reduce_body(hr, rows, shift16, meta_ref, g_ref, v_ref, loc_ref, y_ref):
    """y_strip (HR,128) += scatter of p = g*vals at local rows.

    loc's HIGH half (>> 16) when shift16 else low half. hi = lr >> 7
    selects the 128-row page, lo = lr & 127 the row within it."""
    i = pl.program_id(0)

    @pl.when(meta_ref[i, 1] == 1)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    k = rows * 128
    p = (g_ref[...] * v_ref[...]).reshape(1, k)
    loc = loc_ref[...].reshape(1, k)
    loc = (loc >> 16) if shift16 else (loc & 0xFFFF)
    y_ref[0] = y_ref[0] + _scatter_matmul(hr, k, p, loc & 127, loc >> 7)


def _kernel_compiler_params(*hbm_bytes):
    """Scoped-VMEM budget override for big plans. XLA:TPU promotes a
    pallas output that feeds the next kernel into scoped VMEM (S(1));
    past ~3.7M nnz the (chunks, 128) g intermediate exceeds the default
    16 MiB budget and compilation fails with a scoped-vmem OOM instead
    of falling back to HBM. Raising the per-kernel limit lets the
    promotion succeed (v5e has 128 MiB VMEM); capped so kernel windows
    keep headroom. Returns None when the default budget suffices."""
    need = max(hbm_bytes) + (8 << 20)
    if need <= (16 << 20):
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=min(need, 100 << 20))


@functools.lru_cache(maxsize=None)
def _make_expand(ngroups, nstrips, b2, rows, shift, interpret):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ngroups,),
        in_specs=[
            pl.BlockSpec(
                (1, 128, b2),
                lambda i, s: (s[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (rows, 128), lambda i, s: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (rows, 128), lambda i, s: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        functools.partial(_expand_body, shift, rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ngroups * rows, 128), jnp.float32),
        interpret=interpret,
        compiler_params=_kernel_compiler_params(ngroups * rows * 128 * 4),
    )


@functools.lru_cache(maxsize=None)
def _make_reduce(ngroups, nstrips, hr, rows, shift16, interpret):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ngroups,),
        in_specs=[
            pl.BlockSpec(
                (rows, 128), lambda i, s: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (rows, 128), lambda i, s: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (rows, 128), lambda i, s: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, hr, 128),
            lambda i, s: (s[i, 0], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(_reduce_body, hr, rows, shift16),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nstrips, hr, 128), jnp.float32),
        interpret=interpret,
    )


def _expand_halves(xw, loc_lo, shift, k):
    """One-hot MXU gather g[kk] = xw[a_kk, b_kk] (a = loc >> shift,
    b = loc & (b2-1)) with the 3-term bf16 split of the window (exact:
    see _expand_body). Returns (1, k) f32."""
    b2 = xw.shape[1]
    a_idx = loc_lo >> shift
    b_idx = loc_lo & (b2 - 1)
    o_a = (
        lax.broadcasted_iota(jnp.int32, (128, k), 0) == a_idx
    ).astype(jnp.bfloat16)
    xw_hi = xw.astype(jnp.bfloat16)
    r1 = xw - xw_hi.astype(jnp.float32)
    xw_mid = r1.astype(jnp.bfloat16)
    xw_lo = (r1 - xw_mid.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((0,), (0,)), ((), ()))
    c_t = (
        lax.dot_general(
            xw_hi, o_a, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        + lax.dot_general(
            xw_mid, o_a, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        + lax.dot_general(
            xw_lo, o_a, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
    )  # (b2, k): c_t[b, kk] = xw[a_kk, b]
    b_mask = lax.broadcasted_iota(jnp.int32, (b2, k), 0) == b_idx
    return jnp.sum(jnp.where(b_mask, c_t, 0.0), axis=0, keepdims=True)


def _fused_body(shift, rows, hr, meta_ref, xs_ref, vals_ref, loc_ref, y_ref):
    """Single-kernel routed matvec step: expand + scatter in one body.

    Requires a TILE-ALIGNED plan (every group's chunks come from one
    (row-strip x col-strip) tile, so one input window and one output
    strip serve the whole group). Replaces the 3-op chain
    expand -> chunk-gather -> reduce: no intermediate g in HBM, no
    gather, one kernel launch per matvec."""
    i = pl.program_id(0)

    @pl.when(meta_ref[i, 1] == 1)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    k = rows * 128
    loc = loc_ref[...].reshape(1, k)
    g = _expand_halves(xs_ref[0], loc & 0xFFFF, shift, k)
    p = g * vals_ref[...].reshape(1, k)
    hi_half = loc >> 16
    y_ref[0] = y_ref[0] + _scatter_matmul(
        hr, k, p, hi_half & 127, hi_half >> 7
    )


def _fused_dual_body(
    shift, rows, hr, meta_ref, xs_ref, vals_ref, loc_ref, yin_ref,
    b_ref, eq_ref, sig_ref, y_ref, part_ref
):
    """_fused_body + the PDHG dual-step epilogue of _reduce_dual_body."""
    i = pl.program_id(0)

    @pl.when(meta_ref[i, 1] == 1)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)
        part_ref[...] = jnp.zeros_like(part_ref)

    k = rows * 128
    loc = loc_ref[...].reshape(1, k)
    g = _expand_halves(xs_ref[0], loc & 0xFFFF, shift, k)
    p = g * vals_ref[...].reshape(1, k)
    hi_half = loc >> 16
    y_ref[0] = y_ref[0] + _scatter_matmul(
        hr, k, p, hi_half & 127, hi_half >> 7
    )

    @pl.when(meta_ref[i, 2] == 1)
    def _():
        az = y_ref[0]
        yin = yin_ref[0]
        cand = yin + sig_ref[0, 0] * (b_ref[0] - az)
        ynext = jnp.where(eq_ref[0] != 0, cand, jnp.maximum(cand, 0.0))
        y_ref[0] = ynext
        dy = ynext - yin
        rid = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        cid = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        part_ref[0] = jnp.where(
            (rid == 0) & (cid == 0), jnp.sum(dy * dy), 0.0
        )


def _fused_rmv_stats_body(
    shift, rows, hr, meta_ref, xs_ref, vals_ref, loc_ref, dx_ref,
    atyold_ref, out_ref, part_ref
):
    """_fused_body + the step-control epilogue of _reduce_rmv_stats_body."""
    i = pl.program_id(0)

    @pl.when(meta_ref[i, 1] == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        part_ref[...] = jnp.zeros_like(part_ref)

    k = rows * 128
    loc = loc_ref[...].reshape(1, k)
    g = _expand_halves(xs_ref[0], loc & 0xFFFF, shift, k)
    p = g * vals_ref[...].reshape(1, k)
    hi_half = loc >> 16
    out_ref[0] = out_ref[0] + _scatter_matmul(
        hr, k, p, hi_half & 127, hi_half >> 7
    )

    @pl.when(meta_ref[i, 2] == 1)
    def _():
        aty = out_ref[0]
        dx = dx_ref[0]
        rid = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        cid = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        inter = jnp.sum(dx * (aty - atyold_ref[0]))
        dx2 = jnp.sum(dx * dx)
        part_ref[0] = jnp.where(
            (rid == 0) & (cid == 0),
            inter,
            jnp.where((rid == 0) & (cid == 1), dx2, 0.0),
        )


@functools.lru_cache(maxsize=None)
def _make_fused(ngroups, nstrips, b2, hr, rows, shift, interpret):
    """Fused matvec kernel over a tile-aligned plan. meta columns:
    [out strip, first, last, in strip]."""
    chunk_block = pl.BlockSpec(
        (rows, 128), lambda i, s: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ngroups,),
        in_specs=[
            pl.BlockSpec(
                (1, 128, b2), lambda i, s: (s[i, 3], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            chunk_block,
            chunk_block,
        ],
        out_specs=pl.BlockSpec(
            (1, hr, 128), lambda i, s: (s[i, 0], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(_fused_body, shift, rows, hr),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nstrips, hr, 128), jnp.float32),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _make_fused_dual(ngroups, nstrips, b2, hr, rows, shift, interpret):
    strip_block = pl.BlockSpec(
        (1, hr, 128), lambda i, s: (s[i, 0], 0, 0),
        memory_space=pltpu.VMEM,
    )
    chunk_block = pl.BlockSpec(
        (rows, 128), lambda i, s: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ngroups,),
        in_specs=[
            pl.BlockSpec(
                (1, 128, b2), lambda i, s: (s[i, 3], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            chunk_block, chunk_block, strip_block, strip_block,
            strip_block,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            strip_block,
            pl.BlockSpec(
                (1, 8, 128), lambda i, s: (s[i, 0], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
    )
    return pl.pallas_call(
        functools.partial(_fused_dual_body, shift, rows, hr),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nstrips, hr, 128), jnp.float32),
            jax.ShapeDtypeStruct((nstrips, 8, 128), jnp.float32),
        ),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _make_fused_rmv_stats(ngroups, nstrips, b2, hr, rows, shift, interpret):
    strip_block = pl.BlockSpec(
        (1, hr, 128), lambda i, s: (s[i, 0], 0, 0),
        memory_space=pltpu.VMEM,
    )
    chunk_block = pl.BlockSpec(
        (rows, 128), lambda i, s: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ngroups,),
        in_specs=[
            pl.BlockSpec(
                (1, 128, b2), lambda i, s: (s[i, 3], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            chunk_block, chunk_block, strip_block, strip_block,
        ],
        out_specs=(
            strip_block,
            pl.BlockSpec(
                (1, 8, 128), lambda i, s: (s[i, 0], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
    )
    return pl.pallas_call(
        functools.partial(_fused_rmv_stats_body, shift, rows, hr),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nstrips, hr, 128), jnp.float32),
            jax.ShapeDtypeStruct((nstrips, 8, 128), jnp.float32),
        ),
        interpret=interpret,
    )


def _reduce_dual_body(
    hr, rows, meta_ref, g_ref, v_ref, loc_ref, yin_ref, b_ref, eq_ref,
    sig_ref, y_ref, part_ref
):
    """Reduce variant fusing the PDHG dual step: accumulates (A z) into
    the strip, then at the strip's LAST group applies
        y+ = proj(y + sigma (b - Az))   (proj: >=0 on inequality rows)
    in place and emits sum((y+ - y)^2) for the movement term
    (reference compute_next_dual_solution + compute_interaction_and_
    movement, pdhg.jl:472-549). Removes the per-iteration elementwise/
    reduction HLOs whose launch overhead dominated the non-matvec time.
    """
    i = pl.program_id(0)

    @pl.when(meta_ref[i, 1] == 1)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)
        part_ref[...] = jnp.zeros_like(part_ref)

    k = rows * 128
    p = (g_ref[...] * v_ref[...]).reshape(1, k)
    loc = loc_ref[...].reshape(1, k) >> 16
    y_ref[0] = y_ref[0] + _scatter_matmul(hr, k, p, loc & 127, loc >> 7)

    @pl.when(meta_ref[i, 2] == 1)
    def _():
        az = y_ref[0]
        yin = yin_ref[0]
        cand = yin + sig_ref[0, 0] * (b_ref[0] - az)
        ynext = jnp.where(eq_ref[0] != 0, cand, jnp.maximum(cand, 0.0))
        y_ref[0] = ynext
        dy = ynext - yin
        # Mosaic cannot store scalars to VMEM; write a masked block.
        rid = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        cid = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        part_ref[0] = jnp.where(
            (rid == 0) & (cid == 0), jnp.sum(dy * dy), 0.0
        )


def _reduce_rmv_stats_body(
    hr, rows, meta_ref, g_ref, v_ref, loc_ref, dx_ref, atyold_ref,
    out_ref, part_ref
):
    """Reduce variant for A'y+ fusing the PDLP step-control reductions:
    at the strip's last group emits sum(dx * (aty+ - aty_old)) (the
    interaction term) and sum(dx^2) (primal movement)."""
    i = pl.program_id(0)

    @pl.when(meta_ref[i, 1] == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        part_ref[...] = jnp.zeros_like(part_ref)

    k = rows * 128
    p = (g_ref[...] * v_ref[...]).reshape(1, k)
    loc = loc_ref[...].reshape(1, k) & 0xFFFF
    out_ref[0] = out_ref[0] + _scatter_matmul(
        hr, k, p, loc & 127, loc >> 7
    )

    @pl.when(meta_ref[i, 2] == 1)
    def _():
        aty = out_ref[0]
        dx = dx_ref[0]
        rid = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        cid = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        inter = jnp.sum(dx * (aty - atyold_ref[0]))
        dx2 = jnp.sum(dx * dx)
        part_ref[0] = jnp.where(
            (rid == 0) & (cid == 0),
            inter,
            jnp.where((rid == 0) & (cid == 1), dx2, 0.0),
        )


@functools.lru_cache(maxsize=None)
def _make_reduce_dual(ngroups, nstrips, hr, rows, interpret):
    strip_block = pl.BlockSpec(
        (1, hr, 128), lambda i, s: (s[i, 0], 0, 0),
        memory_space=pltpu.VMEM,
    )
    chunk_block = pl.BlockSpec(
        (rows, 128), lambda i, s: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ngroups,),
        in_specs=[chunk_block, chunk_block, chunk_block, strip_block,
                  strip_block, strip_block,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            strip_block,
            pl.BlockSpec(
                (1, 8, 128), lambda i, s: (s[i, 0], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
    )
    return pl.pallas_call(
        functools.partial(_reduce_dual_body, hr, rows),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nstrips, hr, 128), jnp.float32),
            jax.ShapeDtypeStruct((nstrips, 8, 128), jnp.float32),
        ),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _make_reduce_rmv_stats(ngroups, nstrips, hr, rows, interpret):
    strip_block = pl.BlockSpec(
        (1, hr, 128), lambda i, s: (s[i, 0], 0, 0),
        memory_space=pltpu.VMEM,
    )
    chunk_block = pl.BlockSpec(
        (rows, 128), lambda i, s: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ngroups,),
        in_specs=[chunk_block, chunk_block, chunk_block, strip_block,
                  strip_block],
        out_specs=(
            strip_block,
            pl.BlockSpec(
                (1, 8, 128), lambda i, s: (s[i, 0], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
    )
    return pl.pallas_call(
        functools.partial(_reduce_rmv_stats_body, hr, rows),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nstrips, hr, 128), jnp.float32),
            jax.ShapeDtypeStruct((nstrips, 8, 128), jnp.float32),
        ),
        interpret=interpret,
    )


def _chunk_gather(g: jax.Array, src: jax.Array) -> jax.Array:
    """g[src] over 128-wide rows (PROMISE_IN_BOUNDS: indices validated
    at plan-build time)."""
    return lax.gather(
        g,
        src[:, None],
        lax.GatherDimensionNumbers(
            offset_dims=(1,),
            collapsed_slice_dims=(0,),
            start_index_map=(0,),
        ),
        slice_sizes=(1, 128),
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


# ---------------------------------------------------------------------------
# Device operator
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RoutedOp:
    """Routed-SpMV linear operator (drop-in LinOp: mv / rmv / shape)."""

    # E-order (tiles sorted by col-strip, row-strip)
    loc_e: jax.Array  # (nchunks_e, 128) int32: local_col | local_row<<16
    vals_e: jax.Array  # (nchunks_e, 128) f32 (used by rmv reduce)
    strip_e: jax.Array  # (ngroups_e,) int32 col strip per E group
    meta_e: jax.Array  # (ngroups_e, 3) int32 [col strip, first, last]
    chunk_src_e: jax.Array  # (nchunks_e,) int32 R-chunk per E-chunk (rmv)
    # R-order (tiles sorted by row-strip, col-strip)
    loc_r: jax.Array  # (nchunks_r, 128) int32
    vals_r: jax.Array  # (nchunks_r, 128) f32 (used by mv reduce)
    strip_r: jax.Array  # (ngroups_r,) int32 row strip per R group (rmv)
    meta_r: jax.Array  # (ngroups_r, 3) int32 [row strip, first, last]
    chunk_src_r: jax.Array  # (nchunks_r,) int32 E-chunk per R-chunk (mv)
    # static geometry
    num_rows: int = dataclasses.field(metadata=dict(static=True))
    num_cols: int = dataclasses.field(metadata=dict(static=True))
    b2: int = dataclasses.field(metadata=dict(static=True))  # Wc/128
    hr: int = dataclasses.field(metadata=dict(static=True))  # Hr/128
    cb: int = dataclasses.field(metadata=dict(static=True))  # col strips
    rb: int = dataclasses.field(metadata=dict(static=True))  # row strips
    group_rows: int = dataclasses.field(metadata=dict(static=True))
    # sha256 of the csr sparsity pattern; share_plan_with safety check
    pattern_hash: str = dataclasses.field(
        default="", metadata=dict(static=True)
    )
    # tile-aligned plan: every group within one tile; meta has 4 columns
    # [out strip, first, last, in strip] and mv/rmv run as ONE fused
    # expand+scatter kernel (no HBM intermediate, no chunk gather).
    tile_aligned: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.num_rows, self.num_cols)

    def _interpret(self) -> bool:
        return jax.default_backend() != "tpu"

    def mv(self, x: jax.Array) -> jax.Array:
        """A @ x."""
        wc, hr128 = 128 * self.b2, 128 * self.hr
        shift = int(self.b2).bit_length() - 1
        interp = self._interpret()
        with jax.enable_x64(False):
            xp = jnp.pad(
                x.astype(jnp.float32), (0, self.cb * wc - self.num_cols)
            )
            xs = xp.reshape(self.cb, 128, self.b2)
            if self.tile_aligned:
                fused = _make_fused(
                    self.meta_r.shape[0], self.rb, self.b2, self.hr,
                    self.group_rows, shift, interp,
                )
                y = fused(self.meta_r, xs, self.vals_r, self.loc_r)
                return y.reshape(self.rb * hr128)[: self.num_rows].astype(
                    x.dtype
                )
            expand = _make_expand(
                self.strip_e.shape[0],
                self.cb,
                self.b2,
                self.group_rows,
                shift,
                interp,
            )
            g = expand(self.strip_e, xs, self.loc_e)
            gr = _chunk_gather(g, self.chunk_src_r)
            reduce_ = _make_reduce(
                self.meta_r.shape[0],
                self.rb,
                self.hr,
                self.group_rows,
                True,
                interp,
            )
            y = reduce_(self.meta_r, gr, self.vals_r, self.loc_r)
        return y.reshape(self.rb * hr128)[: self.num_rows].astype(x.dtype)

    def rmv(self, y: jax.Array) -> jax.Array:
        """A' @ y: same kernels, phases swapped, inverse chunk routing."""
        wc, hr128 = 128 * self.b2, 128 * self.hr
        shift = int(self.hr).bit_length() - 1
        interp = self._interpret()
        with jax.enable_x64(False):
            yp = jnp.pad(
                y.astype(jnp.float32), (0, self.rb * hr128 - self.num_rows)
            )
            ys = yp.reshape(self.rb, 128, self.hr)
            if self.tile_aligned:
                fused = _make_fused(
                    self.meta_e.shape[0], self.cb, self.hr, self.b2,
                    self.group_rows, shift, interp,
                )
                xout = fused(
                    self.meta_e, ys, self.vals_e, self._loc_e_swapped()
                )
                return xout.reshape(self.cb * wc)[: self.num_cols].astype(
                    y.dtype
                )
            # expansion over row strips using the HIGH (row) half: shift
            # the packed loc so the expand kernel's low-half read sees it.
            expand = _make_expand(
                self.strip_r.shape[0],
                self.rb,
                self.hr,
                self.group_rows,
                shift,
                interp,
            )
            g = expand(self.strip_r, ys, self._loc_r_swapped())
            ge = _chunk_gather(g, self.chunk_src_e)
            reduce_ = _make_reduce(
                self.meta_e.shape[0],
                self.cb,
                self.b2,
                self.group_rows,
                True,
                interp,
            )
            xout = reduce_(self.meta_e, ge, self.vals_e, self._loc_e_swapped())
        return xout.reshape(self.cb * wc)[: self.num_cols].astype(y.dtype)

    def pad_dual_strips(self, v: jax.Array) -> jax.Array:
        """(m,)-vector -> (RB, HR, 128) strip layout (for the fused
        dual step's y/b/is_equality inputs; pad rows are zeros)."""
        hr128 = 128 * self.hr
        return jnp.pad(
            v.astype(jnp.float32), (0, self.rb * hr128 - self.num_rows)
        ).reshape(self.rb, self.hr, 128)

    def pad_primal_strips(self, v: jax.Array) -> jax.Array:
        wc = 128 * self.b2
        return jnp.pad(
            v.astype(jnp.float32), (0, self.cb * wc - self.num_cols)
        ).reshape(self.cb, self.b2, 128)

    def mv_dual_step(self, z, y_strips, b_strips, eq_strips, sigma):
        """Fused y+ = proj(y + sigma (b - A z)); returns (y+ as (m,),
        y+ strips for the follow-up rmv, sum((y+-y)^2)). LP adaptive
        hot path only (see models/pdhg._take_step_adaptive)."""
        wc, hr128 = 128 * self.b2, 128 * self.hr
        shift = int(self.b2).bit_length() - 1
        interp = self._interpret()
        with jax.enable_x64(False):
            zp = jnp.pad(
                z.astype(jnp.float32), (0, self.cb * wc - self.num_cols)
            )
            zs = zp.reshape(self.cb, 128, self.b2)
            if self.tile_aligned:
                fused = _make_fused_dual(
                    self.meta_r.shape[0], self.rb, self.b2, self.hr,
                    self.group_rows, shift, interp,
                )
                y_next_strips, parts = fused(
                    self.meta_r, zs, self.vals_r, self.loc_r,
                    y_strips, b_strips, eq_strips,
                    jnp.asarray(sigma, jnp.float32).reshape(1, 1),
                )
            else:
                expand = _make_expand(
                    self.strip_e.shape[0], self.cb, self.b2,
                    self.group_rows, shift, interp,
                )
                g = expand(self.strip_e, zs, self.loc_e)
                gr = _chunk_gather(g, self.chunk_src_r)
                reduce_ = _make_reduce_dual(
                    self.meta_r.shape[0], self.rb, self.hr,
                    self.group_rows, interp,
                )
                y_next_strips, parts = reduce_(
                    self.meta_r, gr, self.vals_r, self.loc_r,
                    y_strips, b_strips, eq_strips,
                    jnp.asarray(sigma, jnp.float32).reshape(1, 1),
                )
            dy2 = jnp.sum(parts[:, 0, 0])
        y_next = y_next_strips.reshape(self.rb * hr128)[: self.num_rows]
        return y_next, y_next_strips, dy2

    def rmv_stats(self, y_strips, dx_strips, atyold_strips):
        """Fused A'y+ with the PDLP step-control reductions; returns
        (aty+ as (n,), sum(dx*(aty+ - aty_old)), sum(dx^2))."""
        wc = 128 * self.b2
        shift = int(self.hr).bit_length() - 1
        interp = self._interpret()
        with jax.enable_x64(False):
            ys = y_strips.reshape(self.rb, 128, self.hr)
            if self.tile_aligned:
                fused = _make_fused_rmv_stats(
                    self.meta_e.shape[0], self.cb, self.hr, self.b2,
                    self.group_rows, shift, interp,
                )
                aty_strips, parts = fused(
                    self.meta_e, ys, self.vals_e, self._loc_e_swapped(),
                    dx_strips, atyold_strips,
                )
            else:
                expand = _make_expand(
                    self.strip_r.shape[0], self.rb, self.hr,
                    self.group_rows, shift, interp,
                )
                g = expand(self.strip_r, ys, self._loc_r_swapped())
                ge = _chunk_gather(g, self.chunk_src_e)
                reduce_ = _make_reduce_rmv_stats(
                    self.meta_e.shape[0], self.cb, self.b2,
                    self.group_rows, interp,
                )
                aty_strips, parts = reduce_(
                    self.meta_e, ge, self.vals_e, self.loc_e,
                    dx_strips, atyold_strips,
                )
            interaction = jnp.sum(parts[:, 0, 0])
            dx2 = jnp.sum(parts[:, 0, 1])
        aty = aty_strips.reshape(self.cb * wc)[: self.num_cols]
        return aty, interaction, dx2

    def _loc_r_swapped(self) -> jax.Array:
        # (local_row | local_col << 16) in R-order for the rmv expansion.
        return (self.loc_r >> 16) | ((self.loc_r & 0xFFFF) << 16)

    def _loc_e_swapped(self) -> jax.Array:
        return (self.loc_e >> 16) | ((self.loc_e & 0xFFFF) << 16)


# ---------------------------------------------------------------------------
# Host-side plan builder
# ---------------------------------------------------------------------------


def _pick_pow2(value, lo, hi):
    p = 1 << max(int(np.ceil(np.log2(max(value, 1.0)))), 0)
    return int(min(max(p, lo), hi))


# Calibrated per-KKT-pass cost model (v5e, probe_kkt_pass.py sweeps at
# 20k/100k/500k-node PageRank; fits all 7 measured (geometry, size)
# points within ~14%):
#   t_ms ~ KMXU*(b2+hr)*padded_chunks + KCHUNK*padded_chunks
#          + KGRID*(groups_E + groups_R at G=128)
# The first term is the one-hot MXU arithmetic (3 bf16 passes x 128x128
# MACs per chunk per 128 lanes of strip width) - it GROWS linearly with
# strip width, which is why the former "pad to <=5% and widen strips"
# heuristic lost 1.76x at 4M nnz (9.04 ms vs 5.14 at 32-wide strips).
# The second is fixed per-chunk work (expand column-sum, chunk gather,
# g*vals); the third the Mosaic grid-step overhead.
_KMXU = 0.9e-6
_KCHUNK = 0.5e-4
_KGRID = 1.3e-3


def _geometry_cost(b2, hr, padded_chunks, groups):
    return (
        _KMXU * (b2 + hr) * padded_chunks
        + _KCHUNK * padded_chunks
        + _KGRID * groups
    )


def _block_sum(a: np.ndarray, f0: int, f1: int) -> np.ndarray:
    """Sums (f0, f1) blocks of a 2-D array (zero-padded to multiples)."""
    r = -(-a.shape[0] // f0) * f0
    c = -(-a.shape[1] // f1) * f1
    if (r, c) != a.shape:
        a = np.pad(a, ((0, r - a.shape[0]), (0, c - a.shape[1])))
    return a.reshape(r // f0, f0, c // f1, f1).sum(axis=(1, 3))


def auto_geometry(
    m: int, n: int, nnz: int, matrix: "sp.spmatrix | None" = None
) -> Tuple[int, int]:
    """Strip geometry (b2, hr) minimizing the calibrated cost model.

    With `matrix`, scores candidates {32, 64, 128}^2 on the EXACT tile
    histogram (one bincount at the finest granularity, block-summed for
    coarser strips). Without it (the sharded planner has only shapes),
    a Poisson estimate of nonempty tiles stands in for the padding."""
    b2_max = _pick_pow2(n / 128.0, 1, 128)
    hr_max = _pick_pow2(m / 128.0, 1, 128)
    cands_b2 = sorted({min(c, b2_max) for c in (32, 64, 128)})
    cands_hr = sorted({min(c, hr_max) for c in (32, 64, 128)})

    counts0 = None
    if matrix is not None and nnz > 0:
        coo = matrix.tocoo()
        s0 = 128 * 32
        rb0, cb0 = -(-m // s0), -(-n // s0)
        counts0 = np.bincount(
            (coo.row.astype(np.int64) // s0) * cb0
            + coo.col.astype(np.int64) // s0,
            minlength=rb0 * cb0,
        ).reshape(rb0, cb0)

    best, best_cost = None, np.inf
    for hr in cands_hr:
        for b2 in cands_b2:
            if counts0 is not None and b2 >= 32 and hr >= 32:
                counts = _block_sum(counts0, hr // 32, b2 // 32)
                chunks = -(-counts // 128)
                padded = float(chunks.sum())
                groups = float(
                    np.ceil(chunks.sum(axis=0) / 128.0).sum()
                    + np.ceil(chunks.sum(axis=1) / 128.0).sum()
                )
            else:
                rb, cb = -(-m // (128 * hr)), -(-n // (128 * b2))
                ntiles = float(rb) * float(cb)
                nonempty = ntiles * -np.expm1(-nnz / max(ntiles, 1.0))
                padded = nnz / 128.0 + nonempty
                groups = padded / 128.0 + rb + cb
            cost = _geometry_cost(b2, hr, padded, groups)
            if cost < best_cost:
                best, best_cost = (b2, hr), cost
    return best


class PlanArrays:
    """Host-side (numpy) routed tile plan for one matrix (or one shard
    block). Field semantics match RoutedOp's device arrays."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


def build_plan_arrays(
    csr: sp.csr_matrix, group_rows: "int | None", b2: int, hr: int,
    tile_aligned: bool = False,
) -> PlanArrays:
    """Builds the numpy tile-plan arrays (the core of build_routed_op,
    shared with the sharded block builder; empty blocks allowed - they
    produce one all-zero group per strip).

    tile_aligned: pad each TILE's chunk span to a multiple of
    group_rows so every kernel group lies within one tile; meta gains a
    4th column (the group's input strip) and RoutedOp runs the fused
    single-kernel matvecs. Costs < group_rows chunks padding per
    nonempty tile."""
    m, n = csr.shape
    coo = csr.tocoo()
    nnz = coo.nnz
    if b2 & (b2 - 1) or hr & (hr - 1):
        raise ValueError("b2 and hr must be powers of two")
    wc, hr128 = 128 * b2, 128 * hr
    cb = -(-n // wc)
    rb = -(-m // hr128)
    if wc > 16384 or hr128 > 16384:
        raise ValueError("strips above 16384 do not fit the 16-bit packing")

    row = coo.row.astype(np.int64)
    col = coo.col.astype(np.int64)
    vals = coo.data.astype(np.float32)
    rs_of, cs_of = row // hr128, col // wc
    tile = rs_of * cb + cs_of
    ntiles = rb * cb

    # canonical entry order: sorted by tile id, original order within
    order = np.argsort(tile, kind="stable")
    tile_sorted = tile[order]
    counts = np.bincount(tile, minlength=ntiles).astype(np.int64)
    tile_chunks = -(-counts // 128)  # chunks per tile (0 for empty)

    tile_first_entry = np.zeros(ntiles, dtype=np.int64)
    np.cumsum(counts[:-1], out=tile_first_entry[1:])
    slot = np.arange(nnz, dtype=np.int64) - tile_first_entry[tile_sorted]

    tile_ids = np.arange(ntiles, dtype=np.int64)
    tile_rs, tile_cs = tile_ids // cb, tile_ids % cb
    r_tile_order = tile_ids  # sorted by (row strip, col strip)
    e_tile_order = np.argsort(tile_cs * rb + tile_rs, kind="stable")

    if group_rows is None and _FORCED_GROUP_ROWS:
        group_rows = int(_FORCED_GROUP_ROWS)
    if group_rows is None:
        # Pick the group size from the measured cost model
        #   time ~ a * padded_chunks + b * grid_steps,  b/a ~ 13 chunks
        # (fit on v5e at 20k/100k-node PageRank, probe_geometry.py):
        # larger groups cut grid steps (0.173 -> 0.154 ms/KKT pass at
        # 20k going 32 -> 128) but pad every strip's chunk span to a G
        # multiple (+23% chunks at 100k, where 64 wins). G=256 exceeds
        # the 16 MB scoped-VMEM stack; candidates are {32, 64, 128}.
        def score(g):
            tot = 0
            for strip_of_tile, nstrips in ((tile_cs, cb), (tile_rs, rb)):
                sc = np.bincount(
                    strip_of_tile, weights=tile_chunks.astype(np.float64),
                    minlength=nstrips,
                ).astype(np.int64)
                ngr = np.maximum(-(-sc // g), 1)  # groups per strip
                tot += int((ngr * g).sum()) + 13 * int(ngr.sum())
            return tot

        group_rows = min(
            (128, 64, 32), key=lambda g: (score(g), -g)
        )

    # tile-aligned mode pads every tile's span; a group then never
    # crosses a tile boundary and has a well-defined input strip.
    cc_of_tile = (
        -(-tile_chunks // group_rows) * group_rows
        if tile_aligned
        else tile_chunks
    )

    def layout(tile_order, strip_of_tile, nstrips):
        """Padded chunk layout for one order (tiles strip-contiguous).

        Each strip's chunk span is padded up to a multiple of group_rows
        (and at least one group, so empty strips still get their output
        block zero-initialized). Returns (per-tile chunk start, total
        chunks, groups per strip)."""
        strip_chunks = np.bincount(
            strip_of_tile, weights=cc_of_tile.astype(np.float64),
            minlength=nstrips,
        ).astype(np.int64)
        padded = np.maximum(-(-strip_chunks // group_rows), 1) * group_rows
        strip_chunk_start = np.zeros(nstrips + 1, dtype=np.int64)
        np.cumsum(padded, out=strip_chunk_start[1:])
        cc = cc_of_tile[tile_order]
        strips = strip_of_tile[tile_order]
        within = np.cumsum(cc) - cc
        change = np.ones(ntiles, dtype=bool)
        change[1:] = strips[1:] != strips[:-1]
        strip_base = np.maximum.accumulate(np.where(change, within, -1))
        starts_sorted = strip_chunk_start[strips] + (within - strip_base)
        starts = np.empty(ntiles, dtype=np.int64)
        starts[tile_order] = starts_sorted
        return starts, int(strip_chunk_start[-1]), padded // group_rows

    start_r, nchunks_r, rgroups = layout(r_tile_order, tile_rs, rb)
    start_e, nchunks_e, egroups = layout(e_tile_order, tile_cs, cb)

    lr = (row[order] % hr128).astype(np.int64)
    lc = (col[order] % wc).astype(np.int64)
    loc_entry = (lc | (lr << 16)).astype(np.int32)

    pos_r = start_r[tile_sorted] * 128 + slot
    pos_e = start_e[tile_sorted] * 128 + slot

    loc_r = np.zeros(nchunks_r * 128, dtype=np.int32)
    vals_r = np.zeros(nchunks_r * 128, dtype=np.float32)
    loc_r[pos_r] = loc_entry
    vals_r[pos_r] = vals[order]
    loc_e = np.zeros(nchunks_e * 128, dtype=np.int32)
    vals_e = np.zeros(nchunks_e * 128, dtype=np.float32)
    loc_e[pos_e] = loc_entry
    vals_e[pos_e] = vals[order]

    # chunk routing maps; padding/dummy chunks source chunk 0 and carry
    # zero values, so they contribute nothing.
    nz = np.flatnonzero(tile_chunks)
    c = tile_chunks[nz]
    within_chunk = np.arange(int(c.sum()), dtype=np.int64) - np.repeat(
        np.cumsum(c) - c, c
    )
    chunk_src_r = np.zeros(nchunks_r, dtype=np.int32)
    chunk_src_e = np.zeros(nchunks_e, dtype=np.int32)
    chunk_src_r[np.repeat(start_r[nz], c) + within_chunk] = (
        np.repeat(start_e[nz], c) + within_chunk
    )
    chunk_src_e[np.repeat(start_e[nz], c) + within_chunk] = (
        np.repeat(start_r[nz], c) + within_chunk
    )

    strip_e_groups = np.repeat(np.arange(cb, dtype=np.int32), egroups)
    strip_r_groups = np.repeat(np.arange(rb, dtype=np.int32), rgroups)

    def first_flags(strips, in_strips=None):
        # columns: [strip id, first-group-of-strip, last-group-of-strip]
        # (+ input strip id per group in tile-aligned mode)
        cols = 3 if in_strips is None else 4
        meta = np.zeros((len(strips), cols), dtype=np.int32)
        meta[:, 0] = strips
        meta[0, 1] = 1
        meta[1:, 1] = (strips[1:] != strips[:-1]).astype(np.int32)
        meta[-1, 2] = 1
        meta[:-1, 2] = (strips[1:] != strips[:-1]).astype(np.int32)
        if in_strips is not None:
            meta[:, 3] = in_strips
        return meta

    def group_in_strips(starts, nchunks, in_strip_of_tile):
        # input strip of each group (groups never span tiles here;
        # all-padding groups from empty strips read window 0 of zeros).
        chunk_in = np.zeros(nchunks, dtype=np.int32)
        t_nz = np.flatnonzero(cc_of_tile)
        c = cc_of_tile[t_nz]
        within = np.arange(int(c.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(c) - c, c
        )
        chunk_in[np.repeat(starts[t_nz], c) + within] = np.repeat(
            in_strip_of_tile[t_nz], c
        )
        return chunk_in[::group_rows]

    in_e = (
        group_in_strips(start_e, nchunks_e, tile_rs) if tile_aligned
        else None
    )
    in_r = (
        group_in_strips(start_r, nchunks_r, tile_cs) if tile_aligned
        else None
    )

    return PlanArrays(
        loc_e=loc_e.reshape(nchunks_e, 128),
        vals_e=vals_e.reshape(nchunks_e, 128),
        strip_e=strip_e_groups,
        meta_e=first_flags(strip_e_groups, in_e),
        chunk_src_e=chunk_src_e,
        loc_r=loc_r.reshape(nchunks_r, 128),
        vals_r=vals_r.reshape(nchunks_r, 128),
        strip_r=strip_r_groups,
        meta_r=first_flags(strip_r_groups, in_r),
        chunk_src_r=chunk_src_r,
        tile_aligned=bool(tile_aligned),
        num_rows=m,
        num_cols=n,
        b2=int(b2),
        hr=int(hr),
        cb=int(cb),
        rb=int(rb),
        group_rows=int(group_rows),
    )


def build_routed_op(
    matrix: sp.spmatrix,
    group_rows: "int | None" = None,
    b2: "int | None" = None,
    hr: "int | None" = None,
    share_plan_with: "RoutedOp | None" = None,
    tile_aligned: "bool | None" = None,
) -> RoutedOp:
    """Builds the tile plan for `matrix` (host side, vectorized numpy).

    group_rows: chunks per kernel group (G = group_rows*128 entries per
    grid step; per-strip padding is < G chunks). None picks the best of
    {32, 64, 128} from the measured grid-step-vs-padding cost model.
    b2/hr: strip geometry overrides (Wc = 128*b2, Hr = 128*hr), powers
    of two in [1, 128]; the default targets ~5% tile-padding overhead.
    share_plan_with: an existing RoutedOp over a matrix with the SAME
    sparsity pattern (e.g. the rescaled copy); the new op reuses its
    device-resident index planes and only transfers the value planes
    (the host->device tunnel is the dominant ingest cost).
    """
    if share_plan_with is not None:
        donor = share_plan_with
        group_rows, b2, hr = donor.group_rows, donor.b2, donor.hr
        tile_aligned = donor.tile_aligned
    if tile_aligned is None:
        tile_aligned = DEFAULT_TILE_ALIGNED
    csr = sp.csr_matrix(matrix)
    csr.sum_duplicates()
    m, n = csr.shape
    nnz = csr.nnz
    if nnz == 0 or m == 0 or n == 0:
        raise ValueError("routed layout requires a nonempty matrix")

    import hashlib

    h = hashlib.sha256()
    h.update(repr((m, n, nnz)).encode())
    h.update(np.ascontiguousarray(csr.indptr).tobytes())
    h.update(np.ascontiguousarray(csr.indices).tobytes())
    pattern_hash = h.hexdigest()

    if b2 is None or hr is None:
        auto_b2, auto_hr = auto_geometry(m, n, nnz, matrix=csr)
        if b2 is None:
            b2 = auto_b2
        if hr is None:
            hr = auto_hr

    plan = build_plan_arrays(csr, group_rows, b2, hr, tile_aligned)

    if share_plan_with is not None:
        if donor.pattern_hash != pattern_hash:
            raise ValueError(
                "share_plan_with requires an identical sparsity pattern"
            )
        return dataclasses.replace(
            donor,
            vals_e=jnp.asarray(plan.vals_e),
            vals_r=jnp.asarray(plan.vals_r),
        )

    return RoutedOp(
        loc_e=jnp.asarray(plan.loc_e),
        vals_e=jnp.asarray(plan.vals_e),
        strip_e=jnp.asarray(plan.strip_e),
        meta_e=jnp.asarray(plan.meta_e),
        chunk_src_e=jnp.asarray(plan.chunk_src_e),
        loc_r=jnp.asarray(plan.loc_r),
        vals_r=jnp.asarray(plan.vals_r),
        strip_r=jnp.asarray(plan.strip_r),
        meta_r=jnp.asarray(plan.meta_r),
        chunk_src_r=jnp.asarray(plan.chunk_src_r),
        num_rows=plan.num_rows,
        num_cols=plan.num_cols,
        b2=plan.b2,
        hr=plan.hr,
        cb=plan.cb,
        rb=plan.rb,
        group_rows=plan.group_rows,
        pattern_hash=pattern_hash,
        tile_aligned=plan.tile_aligned,
    )
