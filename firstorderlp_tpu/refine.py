"""Split-precision refinement: f32 TPU hot loop, f64 tail to 1e-8.

The TPU has no native f64 (XLA emulates it; the MXU none at all), while
the reference's correctness bar is 1e-8 relative KKT error in f64
(src/termination.jl:33-45). A single-phase f32 solve plateaus near the
f32 rounding floor (~1e-7 relative). This driver reaches 1e-8 ON DEVICE:

  phase 1: dtype=float32 (routed kernels), stats in f64 on the unscaled
    problem, terminated at max(eps, switch_tol);
  phase 2: dtype=float64 (emulated; ELL layout - gathers are index-rate
    bound so f64 costs the same as f32 there), warm-started from the
    phase-1 solution, terminated at the caller's tolerances.

PDHG restarts make the warm start principled: phase 2 behaves like a
restart to the phase-1 average (reference run_restart_scheme semantics,
src/saddle_point.jl:688-846). Iteration/KKT/time accounting is
continuous across phases in the merged output.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .models import pdhg as _pdhg
from .saddle_point import SaddlePointOutput
from .solve_log import TerminationReason

_REFINABLE = (
    TerminationReason.TERMINATION_REASON_OPTIMAL,
    TerminationReason.TERMINATION_REASON_ITERATION_LIMIT,
    TerminationReason.TERMINATION_REASON_KKT_MATRIX_PASS_LIMIT,
)


def _offset_stats(stats, iters, kkt, secs):
    out = []
    for s in stats:
        out.append(
            dataclasses.replace(
                s,
                iteration_number=s.iteration_number + iters,
                cumulative_kkt_matrix_passes=(
                    s.cumulative_kkt_matrix_passes + kkt
                ),
                cumulative_time_sec=s.cumulative_time_sec + secs,
            )
        )
    return out


def optimize_split_precision(
    params: _pdhg.PdhgParameters,
    problem,
    switch_tolerance: float = 1e-6,
    prepared=None,
) -> SaddlePointOutput:
    """Solves `problem` to params' tolerances with the two-phase scheme.

    `prepared` optionally skips phase-1 ingest (must come from
    prepare_problem on the phase-1 params, see phase1_params)."""
    p1 = phase1_params(params, switch_tolerance)
    if prepared is None:
        prepared = _pdhg.prepare_problem(p1, problem)
    out1 = _pdhg.optimize(p1, problem, prepared=prepared)
    crit = params.termination_criteria
    if out1.termination_reason not in _REFINABLE:
        return out1
    last1 = out1.iteration_stats[-1] if out1.iteration_stats else None
    if last1 is None:
        return out1

    p2 = dataclasses.replace(
        params, dtype="float64", stats_dtype=None, matrix_format="auto"
    )
    remaining = crit.iteration_limit - out1.iteration_count
    if remaining <= 0:
        return out1
    p2 = dataclasses.replace(
        p2,
        termination_criteria=dataclasses.replace(
            crit, iteration_limit=remaining
        ),
    )
    prep2 = _pdhg.prepare_problem(
        p2,
        problem,
        warm_start=(out1.primal_solution, out1.dual_solution),
        _reuse=prepared,
    )
    out2 = _pdhg.optimize(p2, problem, prepared=prep2)

    kkt1 = last1.cumulative_kkt_matrix_passes
    t1 = last1.cumulative_time_sec
    stats = list(out1.iteration_stats) + _offset_stats(
        out2.iteration_stats, out1.iteration_count, kkt1, t1
    )
    return SaddlePointOutput(
        primal_solution=np.asarray(out2.primal_solution),
        dual_solution=np.asarray(out2.dual_solution),
        termination_reason=out2.termination_reason,
        termination_string=out2.termination_string,
        iteration_count=out1.iteration_count + out2.iteration_count,
        iteration_stats=stats,
    )


def phase1_params(
    params: _pdhg.PdhgParameters, switch_tolerance: float = 1e-6
) -> _pdhg.PdhgParameters:
    """The f32 phase's parameters (public so callers can prepare_problem
    against them and pass `prepared` into optimize_split_precision)."""
    crit = params.termination_criteria
    relaxed = dataclasses.replace(
        crit,
        eps_optimal_absolute=max(
            crit.eps_optimal_absolute, switch_tolerance
        ),
        eps_optimal_relative=max(
            crit.eps_optimal_relative, switch_tolerance
        ),
    )
    return dataclasses.replace(
        params,
        dtype="float32",
        stats_dtype="float64",
        matrix_format="auto",
        termination_criteria=relaxed,
    )
