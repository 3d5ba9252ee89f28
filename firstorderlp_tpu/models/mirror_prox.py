"""Saddle-point Mirror Prox (extragradient) solver, TPU-native.

Reference semantics: src/mirror_prox.jl. Saddle point
    min_x max_y phi(x,y) = const + c'x + b'y + 0.5 x'Qx - y'Ax
with mirror map (omega/2)||x||_X^2 + (1/(2 omega))||y||_Y^2 where X, Y are
diagonal scalings derived from matrix row/column norms (l1/l2/off).

Each iteration takes two proximal steps (test point and candidate) and
accepts iff nonlinearity/movement <= 1/step_size - two KKT passes per
iteration. The reference materializes a combo matrix [0 A'; -A 0]
(mirror_prox.jl:641-644); here the pseudo-gradient is computed directly
with one A and one A' product (c + Qx - A'y, Ax - b), which avoids storing
the matrix twice more on device.

Execution model (jitted segments + host loop): see pdhg.py.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..iteration_stats import (
    display_iteration_stats,
    display_iteration_stats_heading,
    print_to_screen_this_iteration,
    to_host_stats,
)
from ..preprocess import rescale_problem, sparse_l2_norms
from ..problem import QuadraticProgrammingProblem, validate
from ..ops.device_problem import DeviceScaledQp, to_device_scaled
from ..saddle_point import (
    RestartInfo,
    RestartParameters,
    SolutionWeightedAverage,
    add_to_solution_weighted_average,
    compute_new_primal_weight,
    create_last_restart_info,
    initialize_solution_weighted_average,
    project_dual,
    project_primal,
    run_restart_scheme,
    unscaled_saddle_point_output,
    update_objective_bound_estimates,
    SaddlePointOutput,
)
from ..solve_log import PointType, RestartChoice, TerminationReason
from ..termination import (
    TerminationCriteria,
    validate_termination_criteria,
)
from .common import (
    EvalResult,
    HashableCriteria,
    evaluate_unscaled_stats,
    initial_primal_weight_host,
    matrix_inf_norm_entrywise,
)

KKT_PASSES_PER_ITERATION = 2.0
KKT_PASSES_PER_TERMINATION_EVALUATION = 2.0


@dataclasses.dataclass
class MirrorProxParameters:
    """Reference: src/mirror_prox.jl:15-126 plus TPU knobs."""

    l_inf_ruiz_iterations: int
    l2_norm_rescaling: bool
    pock_chambolle_alpha: Optional[float]
    primal_importance: float
    scale_invariant_initial_primal_weight: bool
    diagonal_scaling: str  # "l1" | "l2" | "off"
    verbosity: int
    record_iteration_stats: bool
    termination_evaluation_frequency: int
    termination_criteria: TerminationCriteria
    restart_params: RestartParameters
    # TPU knobs:
    dtype: str = "float64"
    matrix_format: str = "auto"
    # Precision of termination/stats evaluation (None = same as dtype).
    stats_dtype: Optional[str] = None
    # Matrix layout of the ORIGINAL (stats) copy (None = matrix_format;
    # same contract as PdhgParameters.stats_matrix_format).
    stats_matrix_format: Optional[str] = None
    # Bound-width column rescaling (same contract as PdhgParameters).
    bound_width_rescaling: bool = False
    # Checkpoint/resume (same contract as PdhgParameters).
    checkpoint_path: Optional[str] = None
    checkpoint_every_n_dispatches: int = 1
    resume_from_checkpoint: Optional[str] = None
    # Evaluation blocks chained per device dispatch (same contract as
    # PdhgParameters.evaluations_per_dispatch): each host round trip
    # costs ~25-30 ms on the tunneled backend, so chaining k
    # [evaluate -> steps] segments in one jit cuts dispatch overhead
    # k-fold; termination still early-exits inside the chain.
    evaluations_per_dispatch: int = 1


@dataclasses.dataclass(frozen=True)
class _MpConfig:
    criteria: HashableCriteria
    restart_params: RestartParameters
    termination_evaluation_frequency: int
    # See _PdhgConfig.need_bound_estimates: skip the diagnostics-only
    # MAX_NORM trust-region solve when nothing records the estimates.
    need_bound_estimates: bool = True


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MirrorProxState:
    current_primal: jax.Array
    current_dual: jax.Array
    primal_scaling: jax.Array  # X diag of the mirror map (incl. omega)
    dual_scaling: jax.Array  # Y diag of the mirror map (incl. 1/omega)
    avg: SolutionWeightedAverage
    restart_info: RestartInfo
    step_size: jax.Array
    primal_weight: jax.Array
    numerical_error: jax.Array
    cumulative_kkt_passes: jax.Array
    iteration: jax.Array  # int64, outer iteration due for processing
    iterations_completed: jax.Array  # int64
    accepted_iterations: jax.Array  # int64
    termination_reason: jax.Array  # int32
    avg_primal_out: jax.Array
    avg_dual_out: jax.Array


def _pseudo_gradient(problem, x, y):
    """(grad_x phi, -grad_y phi) = (c + Qx - A'y, Ax - b)
    (reference mirror_prox.jl:284-307)."""
    gx = problem.objective_vector + problem.qx(x) - problem.aty(y)
    gy = problem.ax(x) - problem.right_hand_side
    return gx, gy


def _proximal_step(problem, x, y, gx, gy, primal_scaling, dual_scaling,
                   step_size):
    """argmin_z step*g'z + 0.5 (z - z0)' D (z - z0) with bound projections
    (reference mirror_prox.jl:317-346)."""
    new_x = project_primal(x - step_size * gx / primal_scaling, problem)
    new_y = project_dual(y - step_size * gy / dual_scaling, problem)
    return new_x, new_y


def _bregman(primal_scaling, dual_scaling, dx, dy):
    """0.5 ||d||_D^2 for the concatenated difference
    (reference mirror_prox.jl:249-257)."""
    return 0.5 * (
        jnp.sum(primal_scaling * dx * dx) + jnp.sum(dual_scaling * dy * dy)
    )


def _take_step(problem, state: MirrorProxState) -> MirrorProxState:
    """One extragradient iteration (reference mirror_prox.jl:855-917)."""
    x, y = state.current_primal, state.current_dual
    gx, gy = _pseudo_gradient(problem, x, y)
    test_x, test_y = _proximal_step(
        problem, x, y, gx, gy, state.primal_scaling, state.dual_scaling,
        state.step_size,
    )
    tgx, tgy = _pseudo_gradient(problem, test_x, test_y)
    cand_x, cand_y = _proximal_step(
        problem, x, y, tgx, tgy, state.primal_scaling, state.dual_scaling,
        state.step_size,
    )

    nonlinearity = jnp.sum((tgx - gx) * (test_x - cand_x)) + jnp.sum(
        (tgy - gy) * (test_y - cand_y)
    )
    movement = _bregman(
        state.primal_scaling, state.dual_scaling, cand_x - test_x,
        cand_y - test_y,
    ) + _bregman(
        state.primal_scaling, state.dual_scaling, test_x - x, test_y - y
    )
    numerical_error = movement == 0.0

    inv_stepsize_required = nonlinearity / jnp.where(
        numerical_error, 1.0, movement
    )
    accept = (inv_stepsize_required <= 1.0 / state.step_size) & (
        ~numerical_error
    )

    new_x = jnp.where(accept, cand_x, x)
    new_y = jnp.where(accept, cand_y, y)
    avg_added = add_to_solution_weighted_average(
        state.avg, test_x, test_y, state.step_size
    )
    new_avg = jax.tree_util.tree_map(
        lambda a, b: jnp.where(accept, a, b), avg_added, state.avg
    )

    it = state.iteration.astype(state.step_size.dtype)
    first_term = (1 - (it + 1.0) ** (-0.3)) / jnp.abs(inv_stepsize_required)
    second_term = (1 + (it + 1.0) ** (-0.6)) * state.step_size
    new_step = jnp.minimum(first_term, second_term)

    # On movement == 0 the reference `continue`s: nothing is updated this
    # iteration except the numerical_error flag (mirror_prox.jl:872-878).
    stepped = dataclasses.replace(
        state,
        current_primal=new_x,
        current_dual=new_y,
        avg=new_avg,
        step_size=new_step,
        accepted_iterations=state.accepted_iterations
        + accept.astype(jnp.int64),
        iterations_completed=state.iterations_completed + 1,
        cumulative_kkt_passes=state.cumulative_kkt_passes
        + KKT_PASSES_PER_ITERATION,
    )
    state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(numerical_error, a, b), state, stepped
    )
    return dataclasses.replace(state, numerical_error=numerical_error)


def _is_eval_iteration(iteration, config: _MpConfig):
    freq = config.termination_evaluation_frequency
    return (
        ((iteration - 1) % freq == 0)
        | (iteration == config.criteria.iteration_limit + 1)
        | (iteration <= 10)
    )


def _eval_block(bundle: DeviceScaledQp, state: MirrorProxState, elapsed_time,
                config: _MpConfig):
    criteria = config.criteria.to_criteria()
    # Idempotence under batching (same guard as pdhg._eval_block): a lane
    # that terminated in a previous segment must not accumulate KKT
    # passes or flip its termination reason.
    entry_state = state
    already_terminated = state.termination_reason != 0
    kkt = state.cumulative_kkt_passes + KKT_PASSES_PER_TERMINATION_EVALUATION

    has_avg = (
        ~state.numerical_error
        & (state.avg.sum_primal_solutions_count > 0)
        & (state.avg.sum_dual_solutions_count > 0)
    )
    avg_primal = jnp.where(
        has_avg,
        state.avg.sum_primal_solutions
        / jnp.where(
            state.avg.sum_primal_solution_weights > 0,
            state.avg.sum_primal_solution_weights,
            1.0,
        ),
        state.current_primal,
    )
    avg_dual = jnp.where(
        has_avg,
        state.avg.sum_dual_solutions
        / jnp.where(
            state.avg.sum_dual_solution_weights > 0,
            state.avg.sum_dual_solution_weights,
            1.0,
        ),
        state.current_dual,
    )

    conv, infeas, reason = evaluate_unscaled_stats(
        bundle,
        criteria,
        avg_primal,
        avg_dual,
        state.numerical_error,
        state.iteration - 1,
        kkt,
        elapsed_time,
    )

    if config.need_bound_estimates:
        lagrangian, est_lb, est_ub = update_objective_bound_estimates(
            bundle.scaled, avg_primal, avg_dual, state.primal_scaling,
            state.dual_scaling,
        )
    else:
        zero = jnp.zeros((), avg_primal.dtype)
        lagrangian, est_lb, est_ub = zero, zero, zero

    terminated = reason != 0

    restart = run_restart_scheme(
        bundle.scaled,
        state.avg,
        state.current_primal,
        state.current_dual,
        state.restart_info,
        state.iterations_completed,
        state.primal_scaling,
        state.dual_scaling,
        state.primal_weight,
        config.restart_params,
    )
    restarted = restart.restart_choice != jnp.int32(
        RestartChoice.RESTART_CHOICE_NO_RESTART
    )
    new_primal_weight = jnp.where(
        restarted,
        compute_new_primal_weight(
            restart.restart_info,
            state.primal_weight,
            config.restart_params.primal_weight_update_smoothing,
        ),
        state.primal_weight,
    )
    # update_mirror_prox_norms (reference mirror_prox.jl:552-571): the
    # mirror-map scalings absorb the primal weight ratio.
    ratio = new_primal_weight / state.primal_weight
    new_primal_scaling = state.primal_scaling * ratio
    new_dual_scaling = state.dual_scaling / ratio

    post_restart = dataclasses.replace(
        state,
        current_primal=restart.primal_solution,
        current_dual=restart.dual_solution,
        avg=restart.avg,
        restart_info=restart.restart_info,
        primal_weight=new_primal_weight,
        primal_scaling=new_primal_scaling,
        dual_scaling=new_dual_scaling,
    )
    new_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(terminated, a, b), state, post_restart
    )
    new_state = dataclasses.replace(
        new_state,
        cumulative_kkt_passes=kkt,
        termination_reason=reason,
        avg_primal_out=avg_primal,
        avg_dual_out=avg_dual,
    )
    new_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(already_terminated, a, b),
        entry_state,
        new_state,
    )
    result = EvalResult(
        conv=conv,
        infeas=infeas,
        lagrangian_value=lagrangian,
        estimated_lower_bound=est_lb,
        estimated_upper_bound=est_ub,
        termination_reason=new_state.termination_reason,
        restart_used=jnp.where(
            terminated | already_terminated,
            jnp.int32(RestartChoice.RESTART_CHOICE_UNSPECIFIED),
            restart.restart_choice,
        ),
        iteration=state.iteration - 1,
        cumulative_kkt_passes=new_state.cumulative_kkt_passes,
        step_size=state.step_size,
        primal_weight=state.primal_weight,
    )
    return new_state, result


def _segment_core(bundle: DeviceScaledQp, state: MirrorProxState,
                  elapsed_time, config: _MpConfig):
    """Unjitted segment body - vmapped by batch.py for MP fleets."""
    state, result = _eval_block(bundle, state, elapsed_time, config)

    # Termination freeze folded into the while predicate instead of a
    # lax.cond wrapper: a batched-predicate cond around a while_loop
    # de-vectorizes under vmap (see pdhg._segment_core).
    start_iteration = state.iteration

    def body(s):
        s = _take_step(bundle.scaled, s)
        return dataclasses.replace(s, iteration=s.iteration + 1)

    def cond(s):
        return (
            (s.termination_reason == 0)
            & ~s.numerical_error
            & (
                (s.iteration == start_iteration)
                | ~_is_eval_iteration(s.iteration, config)
            )
        )

    state = jax.lax.while_loop(cond, body, state)
    return state, result


_run_segment = functools.partial(
    jax.jit, static_argnames=("config",)
)(_segment_core)


@functools.partial(jax.jit, static_argnames=("config", "num_segments"))
def _run_segments(bundle: DeviceScaledQp, state: MirrorProxState,
                  elapsed_time, config: _MpConfig, num_segments: int):
    """Fuses up to `num_segments` [evaluate -> steps] segments in one
    dispatch, early-exiting on termination (same shape as
    pdhg._run_segments). Returns the last EvalResult."""
    state, result = _segment_core(bundle, state, elapsed_time, config)

    def cond(carry):
        state, result, k = carry
        return (result.termination_reason == 0) & (k < num_segments)

    def body(carry):
        state, _, k = carry
        state, result = _segment_core(bundle, state, elapsed_time, config)
        return (state, result, k + 1)

    state, result, _ = jax.lax.while_loop(
        cond, body, (state, result, jnp.int64(1))
    )
    return state, result


@jax.jit
def _final_bound_estimates(bundle, avg_primal, avg_dual, primal_scaling,
                           dual_scaling):
    """One-shot recovery of the objective-bound estimates for the final
    stats entry when config.need_bound_estimates skipped them in-loop."""
    return update_objective_bound_estimates(
        bundle.scaled, avg_primal, avg_dual, primal_scaling, dual_scaling
    )


def _initial_state(shim, dtype) -> MirrorProxState:
    """Zero template (scalings/step/weight are placeholders replaced by
    the caller); `shim` only needs .scaled.num_variables/num_constraints
    so batch.py can build the template without a device bundle."""
    n = shim.scaled.num_variables
    m = shim.scaled.num_constraints
    return MirrorProxState(
        current_primal=jnp.zeros(n, dtype),
        current_dual=jnp.zeros(m, dtype),
        primal_scaling=jnp.ones(n, dtype),
        dual_scaling=jnp.ones(m, dtype),
        avg=initialize_solution_weighted_average(n, m, dtype),
        restart_info=create_last_restart_info(
            jnp.zeros(n, dtype), jnp.zeros(m, dtype)
        ),
        step_size=jnp.asarray(1.0, dtype),
        primal_weight=jnp.asarray(1.0, dtype),
        numerical_error=jnp.asarray(False),
        cumulative_kkt_passes=jnp.asarray(0.0, jnp.float64),
        iteration=jnp.int64(1),
        iterations_completed=jnp.int64(0),
        accepted_iterations=jnp.int64(0),
        termination_reason=jnp.int32(0),
        avg_primal_out=jnp.zeros(n, dtype),
        avg_dual_out=jnp.zeros(m, dtype),
    )


def _initial_scalings(scaled_qp, diagonal_scaling: str,
                      primal_importance: float):
    """Mirror-map diagonal X, Y and initial primal weight (host side).

    Reference: initialize_saddle_point_problem (mirror_prox.jl:484-550).
    """
    a = scaled_qp.constraint_matrix
    q = scaled_qp.objective_matrix
    n = a.shape[1]
    m = a.shape[0]
    if diagonal_scaling == "l2":
        primal = np.sqrt(
            sparse_l2_norms(a, axis=0) ** 2 + sparse_l2_norms(q, axis=0) ** 2
        )
        dual = sparse_l2_norms(a, axis=1)
        primal_weight = primal_importance
    elif diagonal_scaling == "l1":
        primal = np.asarray(np.abs(a).sum(axis=0)).ravel() + np.asarray(
            np.abs(q).sum(axis=0)
        ).ravel()
        dual = np.asarray(np.abs(a).sum(axis=1)).ravel()
        primal_weight = 1.0
    elif diagonal_scaling == "off":
        primal = primal_importance * np.ones(n)
        dual = (1.0 / primal_importance) * np.ones(m)
        primal_weight = 1.0
    else:
        raise ValueError(f"Unknown diagonal_scaling: {diagonal_scaling!r}")
    # Empty rows/columns have zero norm; the proximal step divides by
    # these scalings (reference mirror_prox.jl:504-533 never sees them
    # because presolve removes empties, but the TPU campaign's shape
    # padding ADDS empty rows/cols - pad_problem - and a zero scaling
    # turns the padded lanes into 0/0 = NaN, which poisons the whole
    # iterate). The padded lanes are inert (l = u = 0 variables, 0 >= 0
    # rows), so any positive scaling is exact; use 1.
    primal = np.where(primal > 0, primal, 1.0)
    dual = np.where(dual > 0, dual, 1.0)
    return primal, dual, primal_weight


def initial_mp_scalings(scaled_qp, params: "MirrorProxParameters"):
    """Final (primal_scaling, dual_scaling, primal_weight) for a scaled
    problem: diagonal scalings, optional scale-invariant primal weight,
    and the update_mirror_prox_norms ratio fold (mirror_prox.jl:677-688).
    Host-side numpy; used by optimize() and by batch.py's slow fleet
    ingest."""
    primal_scaling, dual_scaling, primal_weight = _initial_scalings(
        scaled_qp, params.diagonal_scaling, params.primal_importance
    )
    if params.scale_invariant_initial_primal_weight:
        obj_norm = float(
            np.sqrt(
                np.sum(primal_scaling * scaled_qp.objective_vector ** 2)
            )
        )
        rhs_norm = float(
            np.sqrt(
                np.sum(dual_scaling * scaled_qp.right_hand_side ** 2)
            )
        )
        if obj_norm > 0.0 and rhs_norm > 0.0:
            new_primal_weight = params.primal_importance * (
                obj_norm / rhs_norm
            )
        else:
            new_primal_weight = params.primal_importance
    else:
        new_primal_weight = params.primal_importance
    ratio = new_primal_weight / primal_weight
    return (
        primal_scaling * ratio,
        dual_scaling / ratio,
        new_primal_weight,
    )


def make_initial_state(
    n, m, dtype, step_size, primal_scaling, dual_scaling, primal_weight
) -> MirrorProxState:
    """Cold-start MirrorProxState (zeros; reference mirror_prox.jl:646).
    Shared by prepare_problem and the refinement driver's shifted-solve
    fast prepare (refine.py), which reuses a phase-1 device bundle and
    only needs a fresh state."""
    return MirrorProxState(
        current_primal=jnp.zeros(n, dtype),
        current_dual=jnp.zeros(m, dtype),
        primal_scaling=jnp.asarray(primal_scaling, dtype),
        dual_scaling=jnp.asarray(dual_scaling, dtype),
        avg=initialize_solution_weighted_average(n, m, dtype),
        restart_info=create_last_restart_info(
            jnp.zeros(n, dtype), jnp.zeros(m, dtype)
        ),
        step_size=jnp.asarray(step_size, dtype),
        primal_weight=jnp.asarray(primal_weight, dtype),
        numerical_error=jnp.asarray(False),
        cumulative_kkt_passes=jnp.asarray(0.0, jnp.float64),
        iteration=jnp.int64(1),
        iterations_completed=jnp.int64(0),
        accepted_iterations=jnp.int64(0),
        termination_reason=jnp.int32(0),
        avg_primal_out=jnp.zeros(n, dtype),
        avg_dual_out=jnp.zeros(m, dtype),
    )


class PreparedMpProblem(NamedTuple):
    """Host rescaling + device bundle + initial state, split out of
    optimize() so repeated solves (benchmark protocols, warm loops)
    don't pay ingest again - the MP analogue of pdhg.prepare_problem.
    At 4M nnz the rescale + routed-plan build + tunnel transfer is
    ~14 s per call, dwarfing a 400-iteration solve."""

    scaled_problem: object
    bundle: object
    initial_state: MirrorProxState


def prepare_problem(
    params: MirrorProxParameters,
    original_problem: QuadraticProgrammingProblem,
    _shard_plan=None,
    warm_start=None,
) -> PreparedMpProblem:
    """Validates, rescales and transfers `original_problem` for
    `optimize` (reference: the rescaling step of optimize,
    mirror_prox.jl:627-688, split out for reuse).

    warm_start: optional (primal, dual) in UNSCALED space, mirroring
    pdhg.prepare_problem's contract (used by the refinement driver's
    f64 tail; the reference always cold-starts, mirror_prox.jl:646)."""
    validate(original_problem)

    scaled_problem = rescale_problem(
        params.l_inf_ruiz_iterations,
        params.l2_norm_rescaling,
        params.pock_chambolle_alpha,
        params.verbosity,
        original_problem,
        bound_width_rescaling_flag=getattr(
            params, "bound_width_rescaling", False
        ),
    )
    dtype = jnp.dtype(params.dtype)
    stats_dtype = (
        jnp.dtype(params.stats_dtype)
        if getattr(params, "stats_dtype", None)
        else None
    )
    bundle = to_device_scaled(
        scaled_problem,
        dtype,
        params.matrix_format,
        stats_dtype=stats_dtype,
        shard_plan=_shard_plan,
        stats_format=getattr(params, "stats_matrix_format", None),
    )
    n = bundle.scaled.num_variables
    m = bundle.scaled.num_constraints

    inf_norm = matrix_inf_norm_entrywise(
        scaled_problem.scaled_qp.constraint_matrix
    )
    step_size = 1.0 / inf_norm if inf_norm > 0 else 1.0

    primal_scaling, dual_scaling, primal_weight = initial_mp_scalings(
        scaled_problem.scaled_qp, params
    )

    state = make_initial_state(
        n, m, dtype, step_size, primal_scaling, dual_scaling,
        primal_weight,
    )
    if warm_start is not None:
        primal0, dual0 = warm_start
        x0 = jnp.asarray(
            np.asarray(primal0)
            * np.asarray(scaled_problem.variable_rescaling),
            dtype,
        )
        y0 = jnp.asarray(
            np.asarray(dual0)
            * np.asarray(scaled_problem.constraint_rescaling),
            dtype,
        )
        state = dataclasses.replace(
            state,
            current_primal=x0,
            current_dual=y0,
            restart_info=create_last_restart_info(x0, y0),
        )
    return PreparedMpProblem(
        scaled_problem=scaled_problem, bundle=bundle, initial_state=state
    )


def optimize(
    params: MirrorProxParameters,
    original_problem: QuadraticProgrammingProblem,
    prepared: "PreparedMpProblem | None" = None,
    _placement=None,
    _shard_plan=None,
    _elapsed_offset: float = 0.0,
) -> SaddlePointOutput:
    """Solves a QP with saddle-point mirror prox
    (reference optimize, mirror_prox.jl:610-919).

    `prepared`: a PreparedMpProblem from prepare_problem (skips the
    per-call rescale + device transfer).
    `_placement`: see pdhg.optimize - mesh-sharding hook for pytrees.
    `_shard_plan`: see pdhg.optimize - mesh-partitioned constraint op.
    `_elapsed_offset`: see pdhg.optimize - pre-charges the time-limit
    clock for refinement sub-solves.
    """
    validate_termination_criteria(params.termination_criteria)
    if prepared is None:
        prepared = prepare_problem(
            params, original_problem, _shard_plan=_shard_plan
        )
    scaled_problem = prepared.scaled_problem
    bundle = prepared.bundle
    state = prepared.initial_state

    if _placement is not None:
        bundle, state = _placement(bundle, state)

    config = _MpConfig(
        criteria=HashableCriteria.from_criteria(params.termination_criteria),
        restart_params=params.restart_params,
        termination_evaluation_frequency=int(
            params.termination_evaluation_frequency
        ),
        need_bound_estimates=bool(
            params.record_iteration_stats or params.verbosity > 0
        ),
    )

    display_iteration_stats_heading(params.verbosity)

    problem_fp = None
    if params.checkpoint_path or params.resume_from_checkpoint:
        from ..checkpoint import problem_fingerprint

        problem_fp = problem_fingerprint(original_problem)
    elapsed_offset = float(_elapsed_offset)
    if params.resume_from_checkpoint:
        from ..checkpoint import load_state

        state, elapsed_offset, _ = load_state(
            params.resume_from_checkpoint, state, fingerprint=problem_fp
        )
        state = dataclasses.replace(
            state, termination_reason=jnp.int32(0)
        )

    iteration_stats = []
    start_time = time.time() - elapsed_offset
    basic_algorithm_time = 0.0
    evals_per_dispatch = max(1, int(params.evaluations_per_dispatch))
    dispatch_count = 0
    while True:
        elapsed = time.time() - start_time
        segment_start = time.time()
        if evals_per_dispatch == 1:
            state, result = _run_segment(
                bundle, state, jnp.asarray(elapsed, jnp.float64), config
            )
        else:
            state, result = _run_segments(
                bundle,
                state,
                jnp.asarray(elapsed, jnp.float64),
                config,
                evals_per_dispatch,
            )
        # Per-dispatch fetch: the reason code only (one leaf = one tunnel
        # round trip) when nothing consumes the per-dispatch stats; the
        # full ~45-leaf pytree costs ~130 ms/dispatch on the axon tunnel
        # (same optimization as the PDHG driver loop).
        light_fetch = (
            not params.record_iteration_stats and params.verbosity <= 0
        )
        if light_fetch and int(
            jax.device_get(result.termination_reason)
        ) == 0:
            basic_algorithm_time += time.time() - segment_start
            dispatch_count += 1
            if params.checkpoint_path and (
                dispatch_count % max(1, params.checkpoint_every_n_dispatches)
                == 0
            ):
                from ..checkpoint import save_state

                save_state(
                    params.checkpoint_path,
                    state,
                    elapsed_time=time.time() - start_time,
                    metadata={"iteration": -1},
                    fingerprint=problem_fp,
                )
            continue
        result = jax.device_get(result)
        reason_code = int(result.termination_reason)
        terminated = reason_code != 0
        if terminated and not config.need_bound_estimates:
            # The eval block skipped the diagnostics-only bound estimates;
            # recover them once so the final stats entry keeps parity with
            # the reference's method_specific_stats (saddle_point.jl:1015).
            lagr, est_lb, est_ub = jax.device_get(
                _final_bound_estimates(
                    bundle,
                    state.avg_primal_out,
                    state.avg_dual_out,
                    state.primal_scaling,
                    state.dual_scaling,
                )
            )
            result = result._replace(
                lagrangian_value=lagr,
                estimated_lower_bound=est_lb,
                estimated_upper_bound=est_ub,
            )
        eval_iteration = int(result.iteration)
        basic_algorithm_time += time.time() - segment_start
        dispatch_count += 1
        if params.checkpoint_path and (
            dispatch_count % max(1, params.checkpoint_every_n_dispatches)
            == 0
            or terminated
        ):
            from ..checkpoint import save_state

            save_state(
                params.checkpoint_path,
                state,
                elapsed_time=time.time() - start_time,
                metadata={"iteration": eval_iteration + 1},
                fingerprint=problem_fp,
            )

        method_specific_stats = {
            "time_spent_doing_basic_algorithm": basic_algorithm_time,
            "lagrangian_value": float(result.lagrangian_value),
            "estimated_lower_bound": float(result.estimated_lower_bound),
            "estimated_upper_bound": float(result.estimated_upper_bound),
        }
        stats = to_host_stats(
            result.conv,
            result.infeas,
            eval_iteration,
            float(result.cumulative_kkt_passes),
            elapsed,
            RestartChoice(int(result.restart_used))
            if int(result.restart_used) != 0
            else RestartChoice.RESTART_CHOICE_UNSPECIFIED,
            float(result.step_size),
            float(result.primal_weight),
            method_specific_stats,
            PointType.POINT_TYPE_AVERAGE_ITERATE,
        )
        if params.record_iteration_stats or terminated:
            iteration_stats.append(stats)
        if print_to_screen_this_iteration(
            True if terminated else False,
            eval_iteration + 1,
            params.verbosity,
            params.termination_evaluation_frequency,
        ):
            display_iteration_stats(stats, params.verbosity)

        if terminated:
            reason = TerminationReason(reason_code)
            if params.verbosity >= 1:
                from ..solve_log import termination_reason_to_string

                print(
                    f"Terminated after {eval_iteration + 1} iterations: "
                    f"{termination_reason_to_string(reason)}"
                )
            output = unscaled_saddle_point_output(
                scaled_problem,
                state.avg_primal_out,
                state.avg_dual_out,
                reason,
                int(state.iterations_completed),
                iteration_stats,
            )
            if params.verbosity >= 6:
                # reference mirror_prox.jl:453-470 prints these per
                # display; here once at termination (per-display would
                # cost a host fetch every evaluation).
                s = active_variable_stats(
                    scaled_problem.original_qp,
                    output.primal_solution,
                    output.dual_solution,
                )
                nnz = scaled_problem.original_qp.constraint_matrix.nnz
                print(
                    f"    primal vars [@lb: {s[0]} active: {s[1]} "
                    f"@ub: {s[2]}] dual ineq vars [@lb: {s[3]} "
                    f"active: {s[4]}] active mat nz: "
                    f"{100.0 * s[5] / max(nnz, 1):6.3f}%"
                )
            if params.verbosity >= 7:
                from ..problem import (
                    print_variable_and_constraint_hardness,
                )

                print_variable_and_constraint_hardness(
                    scaled_problem.original_qp,
                    output.primal_solution,
                    output.dual_solution,
                )
            return output


def active_variable_stats(problem, primal, dual):
    """Counts of variables at bounds / active, inequality duals at zero /
    active, and the nnz fraction of A restricted to active rows+columns.

    Host-side diagnostic printed at verbosity >= 6 in the reference
    (mirror_prox.jl:352-409); here a standalone helper on the host
    problem representation.
    """
    import scipy.sparse as sp

    primal = np.asarray(primal)
    dual = np.asarray(dual)
    lb = np.asarray(problem.variable_lower_bound)
    ub = np.asarray(problem.variable_upper_bound)
    at_ub = primal >= ub
    at_lb = (~at_ub) & (primal <= lb)
    prim_active = ~(at_ub | at_lb)
    k = problem.num_equalities
    ineq_dual = dual[k:]
    num_dual_lb = int((ineq_dual <= 0).sum())
    num_dual_active = int((ineq_dual > 0).sum())

    csc = sp.csc_matrix(problem.constraint_matrix)
    row_active = np.ones(csc.shape[0], dtype=bool)
    row_active[k:] = dual[k:] > 0
    col_active = (primal != ub) & (primal != lb)
    coo = csc.tocoo()
    num_active_nonzeros = int(
        (col_active[coo.col] & row_active[coo.row]).sum()
    )
    return (
        int(at_lb.sum()),
        int(prim_active.sum()),
        int(at_ub.sum()),
        num_dual_lb,
        num_dual_active,
        num_active_nonzeros,
    )
