"""Primal-dual hybrid gradient (PDHG / PDLP) solver, TPU-native.

Reference semantics: src/primal_dual_hybrid_gradient.jl. The saddle-point
problem, step rules, restart machinery and KKT-pass accounting are
mathematically identical; the execution model is redesigned for TPU:

- the problem and solver state are immutable pytrees on device,
- each *segment* (one termination/restart evaluation + the take_steps up
  to the next evaluation iteration) is a single jitted function with a
  lax.while_loop over steps and bounded while_loops for the step-size
  inner loops,
- the host loop only schedules segments, records stats scalars, measures
  wall-clock (feeding the device-side time-limit check), and prints.

Step rules (tau = step/omega, sigma = step*omega; reference pdhg.jl:100-107):
    x+ = proj_[l,u](x - tau (Qx + c - A'y))
    y+ = proj_{>=0 on ineq}(y + sigma (b - A(2x+ - x)))
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..iteration_stats import (
    display_iteration_stats,
    display_iteration_stats_heading,
    print_to_screen_this_iteration,
    to_host_stats,
)
from ..preprocess import rescale_problem
from ..problem import QuadraticProgrammingProblem, validate
from ..ops.device_problem import DeviceScaledQp, to_device_scaled
from ..saddle_point import (
    RestartInfo,
    RestartParameters,
    SolutionWeightedAverage,
    add_to_primal_solution_weighted_average,
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
    validate_termination_criteria,
    TerminationCriteria,
)
from .common import (
    EvalResult,
    HashableCriteria,
    estimate_maximum_singular_value,
    evaluate_unscaled_stats,
    initial_primal_weight_host,
    matrix_inf_norm_entrywise,
)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MalitskyPockStepsizeParameters:
    """Reference: pdhg.jl:15-41."""

    downscaling_factor: float
    breaking_factor: float
    interpolation_coefficient: float


@dataclasses.dataclass(frozen=True)
class AdaptiveStepsizeParams:
    """Reference: pdhg.jl:43-63."""

    reduction_exponent: float
    growth_exponent: float


@dataclasses.dataclass(frozen=True)
class ConstantStepsizeParams:
    """Reference: pdhg.jl:65-68."""


StepsizePolicy = Union[
    MalitskyPockStepsizeParameters, AdaptiveStepsizeParams,
    ConstantStepsizeParams,
]


@dataclasses.dataclass
class PdhgParameters:
    """Reference: pdhg.jl:70-199 plus TPU-specific knobs (dtype, matrix
    layout)."""

    l_inf_ruiz_iterations: int
    l2_norm_rescaling: bool
    pock_chambolle_alpha: Optional[float]
    primal_importance: float
    scale_invariant_initial_primal_weight: bool
    verbosity: int
    record_iteration_stats: bool
    termination_evaluation_frequency: int
    termination_criteria: TerminationCriteria
    restart_params: RestartParameters
    step_size_policy_params: StepsizePolicy
    # TPU knobs (no reference counterpart):
    dtype: str = "float64"
    matrix_format: str = "auto"  # "auto" | "dense" | "ell"
    # Number of evaluation segments fused into one device dispatch. 1
    # reproduces the reference cadence exactly (stats visible at every
    # evaluation); larger values amortize host<->device latency: the
    # device loops [evaluate -> step*freq] up to this many times or until
    # termination, and only the final evaluation's stats are reported.
    # The wall-clock fed to the device time-limit check is refreshed per
    # dispatch, so time limits are enforced at dispatch granularity.
    evaluations_per_dispatch: int = 1
    # Checkpoint/resume (no reference counterpart; required for
    # preemptible TPU runs). The full solver state is a small pytree, so
    # checkpoints are cheap .npz writes from the host loop.
    checkpoint_path: Optional[str] = None
    checkpoint_every_n_dispatches: int = 1
    resume_from_checkpoint: Optional[str] = None
    # Precision of termination/stats evaluation (None = same as dtype).
    # dtype="float32" + stats_dtype="float64" is the TPU split-precision
    # mode: fp32 hot loop, f64 residuals on the unscaled problem.
    stats_dtype: Optional[str] = None
    # Matrix layout of the ORIGINAL (stats) problem copy (None = same
    # as matrix_format). The shape-bucketed campaign protocol pairs
    # matrix_format="dense_onchip" (f32 MXU hot loop, O(nnz) transfer)
    # with stats_matrix_format="coo" (f64 gather+segment-sum - emulated
    # f64 dense dot_general materializes limb-plane temps, 12 GB at
    # 16k x 16k); both layouts' program shapes depend only on the
    # (m, n, nnz) padding bucket, so XLA programs are shared across
    # every instance in a bucket (benchmarking/run_campaign.py --tpu).
    stats_matrix_format: Optional[str] = None
    # Bound-width column rescaling applied BEFORE Ruiz/L2/PC (no
    # reference counterpart; preprocess.bound_width_rescaling). Fixes
    # gap-conditioning on problems whose finite bound widths span many
    # decades (the badly_scaled family: KKT-cap -> OPTIMAL at 13x fewer
    # passes). Off by default: the default pipeline stays
    # reference-parity.
    bound_width_rescaling: bool = False
    # Write a jax.profiler trace of the solve to this directory
    # (TensorBoard format). The reference's only instrumentation is
    # wall-clock + KKT-pass counters (SURVEY 5.1); both are kept, this
    # adds hardware-level tracing.
    profiler_trace_dir: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class _PdhgConfig:
    """Hashable static configuration baked into the jitted segment."""

    criteria: HashableCriteria
    restart_params: RestartParameters
    step_policy: StepsizePolicy
    termination_evaluation_frequency: int
    # Estimated objective bounds (MAX_NORM localized gap, reference
    # saddle_point.jl:1015-1047) are pure method_specific_stats
    # diagnostics; skip their trust-region solve when nothing records
    # them (trace-time decision).
    need_bound_estimates: bool = True


# ---------------------------------------------------------------------------
# Device state
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PdhgState:
    """Reference: PdhgSolverState (pdhg.jl:201-258) + loop bookkeeping."""

    current_primal_solution: jax.Array
    current_dual_solution: jax.Array
    delta_primal: jax.Array
    delta_dual: jax.Array
    current_dual_product: jax.Array  # cache of A' y
    avg: SolutionWeightedAverage
    restart_info: RestartInfo
    step_size: jax.Array
    primal_weight: jax.Array
    numerical_error: jax.Array  # bool
    cumulative_kkt_passes: jax.Array
    total_number_iterations: jax.Array  # int64, includes inner iterations
    ratio_step_sizes: jax.Array  # Malitsky-Pock only
    iteration: jax.Array  # int64, outer iteration due for processing
    termination_reason: jax.Array  # int32, 0 = running
    avg_primal_out: jax.Array  # scaled-space candidate at last evaluation
    avg_dual_out: jax.Array


def _initial_state(bundle: DeviceScaledQp, dtype) -> PdhgState:
    n = bundle.scaled.num_variables
    m = bundle.scaled.num_constraints

    # Distinct buffers per field: the state is donated to the jitted
    # segment, and aliased buffers cannot be donated twice.
    def zeros_n():
        return jnp.zeros(n, dtype)

    def zeros_m():
        return jnp.zeros(m, dtype)

    return PdhgState(
        current_primal_solution=zeros_n(),
        current_dual_solution=zeros_m(),
        delta_primal=zeros_n(),
        delta_dual=zeros_m(),
        current_dual_product=zeros_n(),
        avg=initialize_solution_weighted_average(n, m, dtype),
        restart_info=create_last_restart_info(zeros_n(), zeros_m()),
        step_size=jnp.asarray(0.0, dtype),
        primal_weight=jnp.asarray(1.0, dtype),
        numerical_error=jnp.asarray(False),
        cumulative_kkt_passes=jnp.asarray(0.0, jnp.float64),
        total_number_iterations=jnp.int64(0),
        ratio_step_sizes=jnp.asarray(1.0, dtype),
        iteration=jnp.int64(1),
        termination_reason=jnp.int32(0),
        avg_primal_out=zeros_n(),
        avg_dual_out=zeros_m(),
    )


# ---------------------------------------------------------------------------
# Step computations (device)
# ---------------------------------------------------------------------------


def _compute_next_primal(problem, x, dual_product, step_size, primal_weight):
    """Reference: compute_next_primal_solution (pdhg.jl:442-470)."""
    gradient = problem.qx(x) + problem.objective_vector - dual_product
    return project_primal(x - (step_size / primal_weight) * gradient, problem)


def _compute_next_dual(
    problem, x, next_x, y, step_size, primal_weight,
    extrapolation_coefficient=1.0,
):
    """Reference: compute_next_dual_solution (pdhg.jl:472-494)."""
    extrapolated = next_x + extrapolation_coefficient * (next_x - x)
    gradient = problem.right_hand_side - problem.ax(extrapolated)
    next_y = project_dual(
        y + (primal_weight * step_size) * gradient, problem
    )
    next_dual_product = problem.aty(next_y)
    return next_y, next_dual_product


def _accept_solution(state: PdhgState, next_x, next_y, next_aty) -> PdhgState:
    """update_solution_in_solver_state (pdhg.jl:496-519): the averaging
    weight is the step size held in the state at entry to take_step."""
    weight = state.step_size
    return dataclasses.replace(
        state,
        delta_primal=next_x - state.current_primal_solution,
        delta_dual=next_y - state.current_dual_solution,
        current_primal_solution=next_x,
        current_dual_solution=next_y,
        current_dual_product=next_aty,
        avg=add_to_solution_weighted_average(
            state.avg, next_x, next_y, weight
        ),
    )


def _interaction_and_movement(problem, state, next_x, next_y, next_aty):
    """Reference: compute_interaction_and_movement (pdhg.jl:521-549)."""
    dx = next_x - state.current_primal_solution
    dy = next_y - state.current_dual_solution
    if problem.objective_matrix is None:
        primal_objective_interaction = jnp.asarray(0.0, dx.dtype)
    else:
        primal_objective_interaction = 0.5 * jnp.sum(dx * problem.qx(dx))
    primal_dual_interaction = jnp.sum(
        dx * (next_aty - state.current_dual_product)
    )
    interaction = jnp.abs(primal_dual_interaction) + jnp.abs(
        primal_objective_interaction
    )
    movement = 0.5 * state.primal_weight * jnp.sum(dx * dx) + (
        0.5 / state.primal_weight
    ) * jnp.sum(dy * dy)
    return interaction, movement


def _take_step_adaptive(
    problem, state: PdhgState, params: AdaptiveStepsizeParams
) -> PdhgState:
    """ONE accept/reject trial of the PDLP adaptive step-size rule
    (reference pdhg.jl:649-731). Each trial costs one KKT pass. Accept
    iff step_size <= movement / interaction; on accept the iterate and
    `iteration` advance, on reject only the step size shrinks and the
    caller's steps loop retries.

    Deliberately NOT an inner while_loop: the retry loop is flattened
    into the caller's (single-level) steps loop so vmapped batched
    solves stay vectorized - a batched-predicate while_loop nested
    inside another one serializes under vmap (measured ~30x on v5e).
    The KKT-pass and total_number_iterations accounting is identical to
    the reference's inner loop.
    """
    from ..ops.routed import RoutedOp

    step_size = state.step_size
    total = state.total_number_iterations + 1
    next_x = _compute_next_primal(
        problem,
        state.current_primal_solution,
        state.current_dual_product,
        step_size,
        state.primal_weight,
    )
    use_fused = (
        isinstance(problem.constraint_matrix, RoutedOp)
        and problem.objective_matrix is None
        and state.current_primal_solution.dtype == jnp.float32
    )
    if use_fused:
        # Fused hot path: the dual step's projection and the
        # interaction/movement reductions run inside the routed reduce
        # kernels' strip epilogues, eliminating the per-iteration
        # elementwise/reduction HLO launches (ops/routed.py). The
        # padded b/is_equality strips are loop-invariant; XLA hoists
        # them out of the steps while_loop.
        op = problem.constraint_matrix
        z = 2.0 * next_x - state.current_primal_solution
        sigma = state.primal_weight * step_size
        next_y, y_next_strips, dy2 = op.mv_dual_step(
            z,
            op.pad_dual_strips(state.current_dual_solution),
            op.pad_dual_strips(problem.right_hand_side),
            op.pad_dual_strips(
                problem.is_equality.astype(jnp.float32)
            ),
            sigma,
        )
        dx = next_x - state.current_primal_solution
        next_aty, pd_interaction, dx2 = op.rmv_stats(
            y_next_strips,
            op.pad_primal_strips(dx),
            op.pad_primal_strips(state.current_dual_product),
        )
        interaction = jnp.abs(pd_interaction)
        movement = 0.5 * state.primal_weight * dx2 + (
            0.5 / state.primal_weight
        ) * dy2
    else:
        next_y, next_aty = _compute_next_dual(
            problem,
            state.current_primal_solution,
            next_x,
            state.current_dual_solution,
            step_size,
            state.primal_weight,
        )
        interaction, movement = _interaction_and_movement(
            problem, state, next_x, next_y, next_aty
        )
    kkt = state.cumulative_kkt_passes + 1.0
    numerical_error = movement == 0.0
    step_size_limit = jnp.where(
        interaction > 0,
        movement / jnp.where(interaction > 0, interaction, 1.0),
        jnp.inf,
    )
    accept = (step_size <= step_size_limit) & ~numerical_error

    total_f = total.astype(step_size.dtype)
    first_term = (
        1 - (total_f + 1.0) ** (-params.reduction_exponent)
    ) * step_size_limit
    second_term = (
        1 + (total_f + 1.0) ** (-params.growth_exponent)
    ) * step_size
    new_step_size = jnp.where(
        numerical_error, step_size, jnp.minimum(first_term, second_term)
    )

    accepted_state = _accept_solution(state, next_x, next_y, next_aty)
    accepted_state = dataclasses.replace(
        accepted_state, iteration=state.iteration + 1
    )
    state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(accept, a, b), accepted_state, state
    )
    return dataclasses.replace(
        state,
        step_size=new_step_size,
        numerical_error=numerical_error,
        total_number_iterations=total,
        cumulative_kkt_passes=kkt,
    )


def _take_step_constant(
    problem, state: PdhgState, params: ConstantStepsizeParams
) -> PdhgState:
    """Reference: pdhg.jl:733-767."""
    next_x = _compute_next_primal(
        problem,
        state.current_primal_solution,
        state.current_dual_product,
        state.step_size,
        state.primal_weight,
    )
    next_y, next_aty = _compute_next_dual(
        problem,
        state.current_primal_solution,
        next_x,
        state.current_dual_solution,
        state.step_size,
        state.primal_weight,
    )
    state = _accept_solution(state, next_x, next_y, next_aty)
    return dataclasses.replace(
        state,
        iteration=state.iteration + 1,
        cumulative_kkt_passes=state.cumulative_kkt_passes + 1.0,
        total_number_iterations=state.total_number_iterations + 1,
    )


def _take_step_malitsky_pock(
    problem, state: PdhgState, params: MalitskyPockStepsizeParameters
) -> PdhgState:
    """Malitsky-Pock linesearch, LP only (reference pdhg.jl:551-647).

    The dual-side linesearch accepts iff
    step_size ||A'(y+ - y)|| <= breaking_factor ||y+ - y||; at most 60
    inner iterations, otherwise a numerical error is flagged.
    """
    entry_step = state.step_size
    next_x = _compute_next_primal(
        problem,
        state.current_primal_solution,
        state.current_dual_product,
        entry_step,
        state.primal_weight,
    )
    kkt0 = state.cumulative_kkt_passes + 0.5
    step_size0 = entry_step + params.interpolation_coefficient * (
        jnp.sqrt(1.0 + state.ratio_step_sizes) - 1.0
    ) * entry_step

    max_iter = 60

    def cond(c):
        return ~c["done"] & (c["iter"] < max_iter)

    def body(c):
        it = c["iter"] + 1
        total = c["total_number_iterations"] + 1
        ratio = c["step_size"] / entry_step
        next_y, next_aty = _compute_next_dual(
            problem,
            state.current_primal_solution,
            next_x,
            state.current_dual_solution,
            c["step_size"],
            state.primal_weight,
            extrapolation_coefficient=ratio,
        )
        delta_dual = next_y - state.current_dual_solution
        delta_aty = next_aty - state.current_dual_product
        kkt = c["cumulative_kkt_passes"] + 0.5
        accept = c["step_size"] * jnp.sqrt(
            jnp.sum(delta_aty * delta_aty)
        ) <= params.breaking_factor * jnp.sqrt(jnp.sum(delta_dual * delta_dual))
        new_step = jnp.where(
            accept, c["step_size"], c["step_size"] * params.downscaling_factor
        )
        return dict(
            step_size=new_step,
            ratio=ratio,
            done=accept,
            iter=it,
            total_number_iterations=total,
            cumulative_kkt_passes=kkt,
            next_y=next_y,
            next_aty=next_aty,
        )

    init = dict(
        step_size=step_size0,
        ratio=state.ratio_step_sizes,
        done=jnp.asarray(False),
        iter=jnp.int64(0),
        total_number_iterations=state.total_number_iterations,
        cumulative_kkt_passes=kkt0,
        next_y=jnp.zeros_like(state.current_dual_solution),
        next_aty=jnp.zeros_like(state.current_primal_solution),
    )
    final = jax.lax.while_loop(cond, body, init)
    accepted_flag = final["done"]

    # Nonsymmetric averaging: the very first accepted step also adds the
    # pre-step primal iterate with weight step_size * ratio (reference
    # pdhg.jl:617-627).
    avg_with_initial = add_to_primal_solution_weighted_average(
        state.avg,
        state.current_primal_solution,
        final["step_size"] * final["ratio"],
    )
    use_initial = accepted_flag & (state.avg.sum_primal_solutions_count == 0)
    pre_avg = jax.tree_util.tree_map(
        lambda a, b: jnp.where(use_initial, a, b), avg_with_initial, state.avg
    )
    state_with_avg = dataclasses.replace(state, avg=pre_avg)

    accepted_state = _accept_solution(
        state_with_avg, next_x, final["next_y"], final["next_aty"]
    )
    accepted_state = dataclasses.replace(
        accepted_state,
        step_size=final["step_size"],
        ratio_step_sizes=final["ratio"],
    )
    # On failure (60 rejections): flag numerical error, leave iterates,
    # step size and ratio unchanged (reference pdhg.jl:640-643).
    failed_state = dataclasses.replace(state, numerical_error=jnp.asarray(True))
    state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(accepted_flag, a, b),
        accepted_state,
        failed_state,
    )
    return dataclasses.replace(
        state,
        iteration=jnp.where(
            accepted_flag, state.iteration + 1, state.iteration
        ),
        total_number_iterations=final["total_number_iterations"],
        cumulative_kkt_passes=final["cumulative_kkt_passes"],
    )


def _take_step(problem, state: PdhgState, policy) -> PdhgState:
    if isinstance(policy, AdaptiveStepsizeParams):
        return _take_step_adaptive(problem, state, policy)
    if isinstance(policy, MalitskyPockStepsizeParameters):
        return _take_step_malitsky_pock(problem, state, policy)
    return _take_step_constant(problem, state, policy)


# ---------------------------------------------------------------------------
# Evaluation block and segment
# ---------------------------------------------------------------------------

KKT_PASSES_PER_TERMINATION_EVALUATION = 2.0


def _is_eval_iteration(iteration, config: _PdhgConfig):
    freq = config.termination_evaluation_frequency
    return (
        ((iteration - 1) % freq == 0)
        | (iteration == config.criteria.iteration_limit + 1)
        | (iteration <= 10)
    )


def _eval_block(bundle: DeviceScaledQp, state: PdhgState, elapsed_time,
                config: _PdhgConfig):
    criteria = config.criteria.to_criteria()
    # Idempotence for batched (vmapped) solves: a lane that terminated in a
    # previous segment must not accumulate KKT passes or flip its reason.
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
        state.current_primal_solution,
    )
    avg_dual = jnp.where(
        has_avg,
        state.avg.sum_dual_solutions
        / jnp.where(
            state.avg.sum_dual_solution_weights > 0,
            state.avg.sum_dual_solution_weights,
            1.0,
        ),
        state.current_dual_solution,
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

    # define_norms (reference pdhg.jl:260-276).
    primal_norm_params = (
        (1.0 / state.step_size)
        * state.primal_weight
        * jnp.ones_like(state.current_primal_solution)
    )
    dual_norm_params = (
        (1.0 / state.step_size)
        / state.primal_weight
        * jnp.ones_like(state.current_dual_solution)
    )
    if config.need_bound_estimates:
        lagrangian, est_lb, est_ub = update_objective_bound_estimates(
            bundle.scaled, avg_primal, avg_dual, primal_norm_params,
            dual_norm_params,
        )
    else:
        zero = jnp.zeros((), avg_primal.dtype)
        lagrangian, est_lb, est_ub = zero, zero, zero

    terminated = reason != 0

    restart = run_restart_scheme(
        bundle.scaled,
        state.avg,
        state.current_primal_solution,
        state.current_dual_solution,
        state.restart_info,
        state.iteration - 1,
        primal_norm_params,
        dual_norm_params,
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
    new_ratio = jnp.where(restarted, 1.0, state.ratio_step_sizes)
    reset_to_avg = restart.restart_choice == jnp.int32(
        RestartChoice.RESTART_CHOICE_RESTART_TO_AVERAGE
    )
    new_dual_product = jnp.where(
        reset_to_avg,
        bundle.scaled.aty(restart.dual_solution),
        state.current_dual_product,
    )

    post_restart = dataclasses.replace(
        state,
        current_primal_solution=restart.primal_solution,
        current_dual_solution=restart.dual_solution,
        avg=restart.avg,
        restart_info=restart.restart_info,
        primal_weight=new_primal_weight,
        ratio_step_sizes=new_ratio,
        current_dual_product=new_dual_product,
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


def _segment_core(bundle: DeviceScaledQp, state: PdhgState, elapsed_time,
                  config: _PdhgConfig):
    """One evaluation + the take_steps up to the next evaluation point."""
    state, result = _eval_block(bundle, state, elapsed_time, config)

    # One while_loop pass = one step-size TRIAL (take_step advances
    # `iteration` only on accept); the loop keeps going until the next
    # evaluation iteration is reached. Single-level and cond-free by
    # design: under vmap (batched solves) both a nested trial loop and a
    # lax.cond wrapping this loop de-vectorize catastrophically
    # (measured ~35x on v5e), so the termination freeze is part of the
    # while predicate instead. `start_iteration` keeps the loop going
    # until at least one ACCEPTED step, since the segment begins at an
    # evaluation iteration (where _is_eval_iteration is already true).
    start_iteration = state.iteration

    def body(s):
        return _take_step(bundle.scaled, s, config.step_policy)

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


@jax.jit
def _final_bound_estimates(bundle, avg_primal, avg_dual, step_size,
                           primal_weight):
    """One-shot recovery of the objective-bound estimates for the final
    stats entry when config.need_bound_estimates skipped them in-loop."""
    primal_norm_params = (
        (1.0 / step_size) * primal_weight * jnp.ones_like(avg_primal)
    )
    dual_norm_params = (
        (1.0 / step_size) / primal_weight * jnp.ones_like(avg_dual)
    )
    return update_objective_bound_estimates(
        bundle.scaled, avg_primal, avg_dual, primal_norm_params,
        dual_norm_params,
    )


@functools.partial(
    jax.jit,
    static_argnames=("config", "num_segments"),
)
def _run_segments(bundle: DeviceScaledQp, state: PdhgState, elapsed_time,
                  config: _PdhgConfig, num_segments: int):
    """Fuses up to `num_segments` [evaluate -> steps] segments in one
    dispatch, early-exiting on termination. Returns the last EvalResult."""
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


# ---------------------------------------------------------------------------
# Host driver
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PreparedProblem:
    """Ingested problem (rescaled + device bundle + initial state).

    prepare_problem/optimize(prepared=...) separate one-time ingest
    (rescaling, layout builds, host->device transfer) from the solve so
    benchmark protocols and repeated solves (tolerance sweeps, warm
    starts) don't pay ingest per solve."""

    scaled_problem: object
    bundle: object
    initial_state: "PdhgState"


def prepare_problem(
    params: PdhgParameters,
    original_problem: QuadraticProgrammingProblem,
    warm_start=None,
    _reuse=None,
    _shard_plan=None,
) -> PreparedProblem:
    """Validates, rescales and transfers `original_problem` for
    `optimize` (reference: the rescaling step of optimize, pdhg.jl:
    769-819, split out for reuse).

    warm_start: optional (primal, dual) in UNSCALED space; the solver
    starts from that point instead of zeros (no reference counterpart -
    the reference always cold-starts, pdhg.jl:806-810; used by the
    split-precision refinement driver and restart-from-checkpoint
    workflows)."""
    validate(original_problem)
    if isinstance(
        params.step_size_policy_params, MalitskyPockStepsizeParameters
    ) and original_problem.objective_matrix.nnz > 0:
        raise ValueError(
            "Malitsky and Pock linesearch is only supported for linear"
            " programming problems."
        )

    # _reuse: a PreparedProblem for the SAME problem from a previous
    # phase (see refine.py); its host ScaledQpProblem (rescaling is
    # dtype-independent) and its f64 ORIGINAL device bundle are reused,
    # so only the scaled bundle is rebuilt/transferred.
    dtype = jnp.dtype(params.dtype)
    stats_dtype = (
        jnp.dtype(params.stats_dtype) if params.stats_dtype else None
    )
    if _reuse is not None and _reuse.bundle.original.objective_vector.dtype == (
        stats_dtype or dtype
    ):
        from ..ops.device_problem import to_device

        scaled_problem = _reuse.scaled_problem
        bundle = dataclasses.replace(
            _reuse.bundle,
            scaled=to_device(
                scaled_problem.scaled_qp,
                dtype,
                params.matrix_format,
                shard_plan=_shard_plan,
            ),
        )
    else:
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
        bundle = to_device_scaled(
            scaled_problem,
            dtype,
            params.matrix_format,
            stats_dtype=stats_dtype,
            shard_plan=_shard_plan,
            stats_format=params.stats_matrix_format,
        )

    state = _initial_state(bundle, dtype)
    cumulative_kkt_passes = 0.0
    if isinstance(
        params.step_size_policy_params,
        (AdaptiveStepsizeParams, MalitskyPockStepsizeParameters),
    ):
        cumulative_kkt_passes += 0.5
        inf_norm = matrix_inf_norm_entrywise(
            scaled_problem.scaled_qp.constraint_matrix
        )
        step_size = 1.0 / inf_norm if inf_norm > 0 else 1.0
    else:
        desired_relative_error = 0.2
        max_singular_value, num_iters = estimate_maximum_singular_value(
            scaled_problem.scaled_qp.constraint_matrix,
            probability_of_failure=0.001,
            desired_relative_error=desired_relative_error,
        )
        step_size = (1.0 - desired_relative_error) / max_singular_value
        cumulative_kkt_passes += num_iters

    primal_weight = initial_primal_weight_host(
        scaled_problem.scaled_qp,
        params.primal_importance,
        params.scale_invariant_initial_primal_weight,
        params.verbosity,
    )
    state = dataclasses.replace(
        state,
        step_size=jnp.asarray(step_size, dtype),
        primal_weight=jnp.asarray(primal_weight, dtype),
        cumulative_kkt_passes=jnp.asarray(
            cumulative_kkt_passes, jnp.float64
        ),
    )
    if warm_start is not None:
        from ..saddle_point import create_last_restart_info

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
            current_primal_solution=x0,
            current_dual_solution=y0,
            current_dual_product=bundle.scaled.aty(y0),
            restart_info=create_last_restart_info(x0, y0),
            cumulative_kkt_passes=state.cumulative_kkt_passes + 0.5,
        )
    return PreparedProblem(
        scaled_problem=scaled_problem, bundle=bundle, initial_state=state
    )


def optimize(
    params: PdhgParameters,
    original_problem: QuadraticProgrammingProblem,
    _placement=None,
    prepared: "PreparedProblem | None" = None,
    _shard_plan=None,
    _elapsed_offset: float = 0.0,
) -> SaddlePointOutput:
    """Solves a QP with PDHG (reference optimize, pdhg.jl:769-1049).

    `_placement` is an internal hook used by parallel.sharded: a function
    (bundle, state) -> (bundle, state) that device_puts all pytree leaves
    with their mesh shardings before the segment loop starts.
    `prepared` (from prepare_problem on the SAME problem and params)
    skips ingest. `_shard_plan` (parallel.sharded) builds the constraint
    operator block-partitioned over the plan's mesh at ingest.
    `_elapsed_offset` pre-charges the time-limit clock (refine.py: a
    sub-solve's budget is what REMAINS of the caller's declared
    time_sec_limit, without baking a per-call limit into the static
    criteria and forcing a recompile).
    """
    validate_termination_criteria(params.termination_criteria)
    if params.primal_importance <= 0 or not np.isfinite(
        params.primal_importance
    ):
        raise ValueError("primal_importance must be positive and finite")
    if prepared is None:
        prepared = prepare_problem(
            params, original_problem, _shard_plan=_shard_plan
        )
    scaled_problem = prepared.scaled_problem
    bundle = prepared.bundle
    state = prepared.initial_state

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
        # The previous run's termination (e.g. its iteration limit) does
        # not apply to this run's criteria; re-evaluate from scratch.
        state = dataclasses.replace(
            state, termination_reason=jnp.int32(0)
        )

    if _placement is not None:
        bundle, state = _placement(bundle, state)

    config = _PdhgConfig(
        criteria=HashableCriteria.from_criteria(params.termination_criteria),
        restart_params=params.restart_params,
        step_policy=params.step_size_policy_params,
        termination_evaluation_frequency=int(
            params.termination_evaluation_frequency
        ),
        need_bound_estimates=bool(
            params.record_iteration_stats or params.verbosity > 0
        ),
    )

    display_iteration_stats_heading(params.verbosity)

    profiler_active = False
    if params.profiler_trace_dir:
        try:
            jax.profiler.start_trace(params.profiler_trace_dir)
            profiler_active = True
        except Exception as exc:  # tracing unsupported on some backends
            print(f"profiler trace unavailable: {exc}")

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
        # Per-leaf fetches cost a tunnel round trip each (~25 ms on the
        # axon backend) and the EvalResult has ~45 leaves (~130 ms as one
        # device_get). When nothing consumes the per-dispatch stats
        # (record_iteration_stats off, silent verbosity), fetch ONLY the
        # reason code per dispatch and the full pytree once at the end.
        light_fetch = (
            not params.record_iteration_stats and params.verbosity <= 0
        )
        if light_fetch:
            reason_code = int(jax.device_get(result.termination_reason))
            if reason_code == 0:
                basic_algorithm_time += time.time() - segment_start
                dispatch_count += 1
                if params.checkpoint_path and (
                    dispatch_count
                    % max(1, params.checkpoint_every_n_dispatches)
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
                    result.step_size,
                    result.primal_weight,
                )
            )
            result = result._replace(
                lagrangian_value=lagr,
                estimated_lower_bound=est_lb,
                estimated_upper_bound=est_ub,
            )
        eval_iteration = int(result.iteration)  # = displayed iteration - 1
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
            if profiler_active:
                try:
                    jax.profiler.stop_trace()
                except Exception:
                    pass
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
                eval_iteration,
                iteration_stats,
            )
            if params.verbosity >= 7:
                # generic_final_log (reference saddle_point.jl:1004-1012)
                from ..problem import (
                    print_variable_and_constraint_hardness,
                )

                print_variable_and_constraint_hardness(
                    scaled_problem.original_qp,
                    output.primal_solution,
                    output.dual_solution,
                )
            return output
