"""Pallas TPU kernel: fused PDHG dual step for the dense matrix path.

Per accepted PDHG trial the dominant cost on the dense path is two full
passes over A in HBM:

    y+   = proj_dual(y + sigma (b - A z)),   z = 2 x+ - x
    aty+ = A' y+                             (cache for the next primal)

The row strip of A used to produce (A z)_i is exactly the strip needed
for its contribution to A' y+ - so one kernel streams A ONCE: per grid
step it loads a (TILE_M, n) strip, forms (A z)_i on the MXU, applies the
dual projection, and accumulates A_i' y+_i into the aty output (revisited
across the sequential TPU grid). HBM traffic per trial drops from
2 x bytes(A) to 1 x bytes(A).

Measured reality check (v5e, 4096x2048 f32): ~6% faster than the two
XLA matvecs, not 2x - exact f32 matmuls need bf16x3 MXU passes
(precision=HIGHEST; the default rounds operands to bf16, ~2e-3 error),
which triples in-VMEM strip traffic and erodes the fused-pass win. Kept
as an optional op (correct to ~1e-6 relative); candidates to close the
gap are f32 VPU dots and TILE_M tuning. fp32 only - Mosaic has no f64,
and the pallas_call must be traced under jax.enable_x64(False).

Reference semantics: compute_next_dual_solution
(src/primal_dual_hybrid_gradient.jl:472-494) fused with the A'y cache
refresh. Numerics: identical contraction order per row strip; the aty
accumulation sums strip contributions in strip order (f32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 256


def _kernel(z_ref, y_ref, b_ref, eq_ref, sigma_ref, a_ref, ynext_ref,
            aty_ref):
    i = pl.program_id(0)
    a = a_ref[...]  # (TILE_M, n) strip of A
    z = z_ref[...]  # (1, n)
    sigma = sigma_ref[0, 0]

    # Mosaic requires strictly 2-D matmul operands.
    az = jax.lax.dot_general(
        z, a,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # bf16x3 passes: the MXU's default f32 mode rounds operands to
        # bf16 (~2e-3 relative error - unusable for a solver iterate).
        precision=jax.lax.Precision.HIGHEST,
    )  # (1, TILE_M)
    y_cand = y_ref[...] + sigma * (b_ref[...] - az)
    y_next = jnp.where(
        eq_ref[...] != 0, y_cand, jnp.maximum(y_cand, 0.0)
    )  # (1, TILE_M)
    ynext_ref[...] = y_next

    contribution = jax.lax.dot_general(
        y_next, a,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (1, n)

    @pl.when(i == 0)
    def _():
        aty_ref[...] = contribution

    @pl.when(i > 0)
    def _():
        aty_ref[...] = aty_ref[...] + contribution


def fused_dual_step(a, z, y, b, is_equality, sigma, interpret=None):
    """(y_next, aty_next) for dense A (m, n), all fp32.

    m must be a multiple of TILE_M (callers pad). `is_equality` is
    int32/bool (1 = equality row, dual unconstrained; 0 = inequality,
    dual projected to >= 0).

    The pallas_call is traced with x64 DISABLED: the package enables
    jax_enable_x64 globally (f64 CPU solves), but Mosaic cannot compile
    under x64 semantics (int64 index types); every operand here is
    f32/int32 so the narrowing context changes nothing numerically.
    """
    m, n = a.shape
    assert m % TILE_M == 0, (m, TILE_M)
    grid = (m // TILE_M,)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    with jax.enable_x64(False):
        return _call(a, z, y, b, is_equality, sigma, m, n, grid, interpret)


def _call(a, z, y, b, is_equality, sigma, m, n, grid, interpret):
    y_next, aty = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # z
            pl.BlockSpec((1, TILE_M), lambda i: (0, i),
                         memory_space=pltpu.VMEM),  # y strip
            pl.BlockSpec((1, TILE_M), lambda i: (0, i),
                         memory_space=pltpu.VMEM),  # b strip
            pl.BlockSpec((1, TILE_M), lambda i: (0, i),
                         memory_space=pltpu.VMEM),  # is_equality strip
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sigma
            pl.BlockSpec((TILE_M, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # A strip
        ],
        out_specs=(
            pl.BlockSpec((1, TILE_M), lambda i: (0, i),
                         memory_space=pltpu.VMEM),  # y_next strip
            pl.BlockSpec((1, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # aty (revisited)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, m), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        interpret=interpret,
    )(
        z.reshape(1, n).astype(jnp.float32),
        y.reshape(1, m).astype(jnp.float32),
        b.reshape(1, m).astype(jnp.float32),
        is_equality.reshape(1, m).astype(jnp.int32),
        jnp.asarray(sigma, jnp.float32).reshape(1, 1),
        a,
    )
    return y_next[0], aty[0]
