"""Batched (vmapped) solving: many LP/QP instances per chip concurrently.

No reference counterpart (SURVEY.md section 2: semantics = N independent
optimize() calls). Two modes:

- solve_batch: heterogeneous fleets. Instances are zero-padded to a
  common shape, bundles stacked along a LEADING batch axis, and the
  jitted PDHG segment vmapped (dense layout: the batched matvec is one
  MXU (B, m, n) x (B, n) contraction). Per-instance termination masking
  freezes finished lanes.

- solve_batch_shared_pattern: same-sparsity fleets (scenario sweeps:
  damping factors, rhs/objective/regularization paths). The ELL index
  planes are shared, values/vectors stacked along the MINOR axis, so
  every gather fetches a contiguous (1, B) row - B=128 instances advance
  for a few times the cost of one (see docs/performance.md; ~25x a
  single CPU core running the reference's algorithm).

Typical use: L1-SVM regularization paths and PageRank damping sweeps
(BASELINE.json config 3).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .models import pdhg as _pdhg
from .models.common import (
    HashableCriteria,
    estimate_maximum_singular_value,
    initial_primal_weight_host,
    matrix_inf_norm_entrywise,
)
from .ops.device_problem import to_device_scaled
from .parallel.sharded import pad_problem
from .preprocess import rescale_problem
from .problem import QuadraticProgrammingProblem, validate
from .saddle_point import SaddlePointOutput, unscaled_saddle_point_output
from .solve_log import PointType, RestartChoice, TerminationReason
from .iteration_stats import to_host_stats


@functools.partial(jax.jit, static_argnames=("config",),)
def _run_segment_batched(bundle, state, elapsed_time, config):
    return jax.vmap(
        lambda b, s: _pdhg._segment_core(b, s, elapsed_time, config)
    )(bundle, state)


# ---------------------------------------------------------------------------
# Shared-pattern fleets (minor batch axis)
# ---------------------------------------------------------------------------
#
# When every instance shares the sparsity PATTERN of A (and Q) - scenario
# sweeps over rhs/objective/damping/regularization - the ELL index planes
# are identical across the fleet and only the VALUE planes and vectors
# differ. Stacking those along the MINOR (last) axis turns every gather
# x[cols] into a gather of (1, B) contiguous rows: measured on v5e, the
# XLA gather cost is set by the INDEX count, not the bytes per index, so
# B=32 instances advance for ~1.8x the cost of one (18x per-instance).
# This is the TPU-native answer to the reference's one-instance-per-core
# benchmark protocol.


def _batch_axis_for_leaf(leaf) -> "int | None":
    """Stacking/vmap rule: index/bool planes are shared (None), floating
    arrays are per-instance minor-stacked (-1), scalars stack to (B,)."""
    arr = np.asarray(leaf)
    if arr.ndim == 0:
        return 0
    if np.issubdtype(arr.dtype, np.floating):
        return -1
    return None  # int32 cols / inv_perm / bool is_equality: shared


def _stack_pytrees_minor(trees):
    """Stacks a list of identical-structure pytrees by the leaf rule.

    Stacking runs on the HOST (numpy) and transfers each stacked leaf
    once: device-side jnp.stack of per-instance leaves costs one tunnel
    round trip per instance per leaf and dominated fleet setup before.
    """
    template = trees[0]
    leaves_t, treedef = jax.tree_util.tree_flatten(template)
    all_leaves = [jax.tree_util.tree_flatten(t)[0] for t in trees]
    stacked = []
    axes = []
    for i, leaf in enumerate(leaves_t):
        axis = _batch_axis_for_leaf(leaf)
        axes.append(axis)
        group = [np.asarray(lv[i]) for lv in all_leaves]
        if axis is None:
            if not all(
                np.array_equal(g, group[0]) for g in group[1:]
            ):
                raise ValueError(
                    "shared-pattern batching requires identical index "
                    "structure across instances"
                )
            stacked.append(jnp.asarray(group[0]))
        elif axis == 0:
            stacked.append(jnp.asarray(np.stack(group)))
        else:
            stacked.append(jnp.asarray(np.stack(group, axis=-1)))
    return (
        jax.tree_util.tree_unflatten(treedef, stacked),
        jax.tree_util.tree_unflatten(treedef, axes),
    )


@functools.partial(
    jax.jit, static_argnames=("config", "axes_hash"),
)
def _run_segment_shared(bundle, state, elapsed_time, config, axes_hash):
    bundle_axes, state_axes = axes_hash.trees()
    return jax.vmap(
        lambda b, s: _pdhg._segment_core(b, s, elapsed_time, config),
        in_axes=(bundle_axes, state_axes),
        out_axes=(state_axes, 0),
    )(bundle, state)


class _AxesBox:
    """Hashable wrapper so the vmap axes trees can ride a static arg."""

    def __init__(self, bundle_axes, state_axes):
        self._trees = (bundle_axes, state_axes)
        self._key = str(
            (
                jax.tree_util.tree_structure(bundle_axes),
                jax.tree_util.tree_leaves(bundle_axes),
                jax.tree_util.tree_structure(state_axes),
                jax.tree_util.tree_leaves(state_axes),
            )
        )

    def trees(self):
        return self._trees

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _AxesBox) and self._key == other._key


@dataclasses.dataclass
class SharedPatternFleet:
    """Device-resident prepared fleet (see prepare_shared_pattern_fleet)."""

    batched_bundle: object
    initial_state: object
    axes_box: "_AxesBox"
    scaled_problems: list


def prepare_shared_pattern_fleet(
    params: _pdhg.PdhgParameters,
    problems: Sequence[QuadraticProgrammingProblem],
) -> SharedPatternFleet:
    """Rescales, builds the shared ELL structure, stacks instance values
    along the minor axis (host side) and transfers the fleet to device.

    Separated from the solve so repeated solves (warm starts, benchmark
    protocols) don't pay ingest again.
    """
    if not isinstance(
        params.step_size_policy_params,
        (_pdhg.AdaptiveStepsizeParams, _pdhg.ConstantStepsizeParams),
    ):
        raise ValueError(
            "batched solves support adaptive or constant step sizes"
        )
    dims = {(p.constraint_matrix.shape, p.num_equalities) for p in problems}
    if len(dims) != 1:
        raise ValueError(
            "shared-pattern batching requires identical problem shapes"
        )
    dtype = jnp.dtype(params.dtype)

    bundles, states, scaled_problems = [], [], []
    state_template = None
    for problem in problems:
        validate(problem)
        scaled = rescale_problem(
            params.l_inf_ruiz_iterations,
            params.l2_norm_rescaling,
            params.pock_chambolle_alpha,
            0,
            problem,
        )
        # Host-side bundle (numpy leaves): the fleet is stacked on host
        # and transferred once per stacked leaf.
        bundle = to_device_scaled(
            scaled, dtype, format="ell", convert=np.asarray
        )
        if state_template is None:
            state_template = jax.tree_util.tree_map(
                np.asarray, _pdhg._initial_state(bundle, dtype)
            )
        state = state_template

        kkt0 = 0.0
        if isinstance(
            params.step_size_policy_params, _pdhg.AdaptiveStepsizeParams
        ):
            kkt0 += 0.5
            inf_norm = matrix_inf_norm_entrywise(
                scaled.scaled_qp.constraint_matrix
            )
            step_size = 1.0 / inf_norm if inf_norm > 0 else 1.0
        else:
            sigma_max, iters = estimate_maximum_singular_value(
                scaled.scaled_qp.constraint_matrix,
                probability_of_failure=0.001,
                desired_relative_error=0.2,
            )
            step_size = 0.8 / sigma_max
            kkt0 += iters
        primal_weight = initial_primal_weight_host(
            scaled.scaled_qp,
            params.primal_importance,
            params.scale_invariant_initial_primal_weight,
            0,
        )
        np_dtype = np.dtype(dtype.name)
        state = dataclasses.replace(
            state,
            step_size=np.asarray(step_size, np_dtype),
            primal_weight=np.asarray(primal_weight, np_dtype),
            cumulative_kkt_passes=np.asarray(kkt0, np.float64),
        )
        bundles.append(bundle)
        states.append(state)
        scaled_problems.append(scaled)

    batched_bundle, bundle_axes = _stack_pytrees_minor(bundles)
    batched_state, state_axes = _stack_pytrees_minor(states)
    return SharedPatternFleet(
        batched_bundle=batched_bundle,
        initial_state=batched_state,
        axes_box=_AxesBox(bundle_axes, state_axes),
        scaled_problems=scaled_problems,
    )


def solve_batch_shared_pattern(
    params: _pdhg.PdhgParameters,
    problems: Sequence[QuadraticProgrammingProblem],
    fleet: "SharedPatternFleet | None" = None,
) -> List[SaddlePointOutput]:
    """Solves a fleet of SAME-PATTERN instances with a minor batch axis.

    Requirements: identical shapes, num_equalities, and sparsity patterns
    of the constraint (and objective) matrices across instances. Values,
    bounds, objectives and rhs may differ freely. Raises ValueError when
    patterns differ (use solve_batch for heterogeneous fleets). Pass a
    `fleet` from prepare_shared_pattern_fleet to skip ingest.
    """
    if len(problems) == 0 and fleet is None:
        return []
    if fleet is None:
        fleet = prepare_shared_pattern_fleet(params, problems)
    batched_bundle = fleet.batched_bundle
    batched_state = fleet.initial_state
    axes_box = fleet.axes_box
    scaled_problems = fleet.scaled_problems
    num_instances = len(scaled_problems)

    config = _pdhg._PdhgConfig(
        criteria=HashableCriteria.from_criteria(params.termination_criteria),
        restart_params=params.restart_params,
        step_policy=params.step_size_policy_params,
        termination_evaluation_frequency=int(
            params.termination_evaluation_frequency
        ),
    )

    start_time = time.time()
    final_results = [None] * num_instances
    lane_time = [0.0] * num_instances
    while True:
        elapsed = time.time() - start_time
        batched_state, result = _run_segment_shared(
            batched_bundle,
            batched_state,
            jnp.asarray(elapsed, jnp.float64),
            config,
            axes_box,
        )
        # ONE transfer for the whole result pytree per dispatch: per-leaf
        # fetches cost a tunnel round trip each (~25 ms on the axon
        # backend), and there are ~45 leaves x B lanes.
        host_result = jax.device_get(result)
        dispatch_elapsed = time.time() - start_time
        reasons = np.asarray(host_result.termination_reason)
        for i in range(num_instances):
            if final_results[i] is None and reasons[i] != 0:
                final_results[i] = jax.tree_util.tree_map(
                    lambda leaf, i=i: leaf[i], host_result
                )
                # Solve time is the dispatch at which THIS lane first
                # terminated, not the whole fleet's wall clock.
                lane_time[i] = dispatch_elapsed
        if all(r is not None for r in final_results):
            break

    outputs = []
    avg_primal_out = jax.device_get(batched_state.avg_primal_out)
    avg_dual_out = jax.device_get(batched_state.avg_dual_out)
    for i, scaled in enumerate(scaled_problems):
        res = final_results[i]
        stats = to_host_stats(
            jax.tree_util.tree_map(float, res.conv),
            jax.tree_util.tree_map(float, res.infeas),
            int(res.iteration),
            float(res.cumulative_kkt_passes),
            lane_time[i],
            RestartChoice.RESTART_CHOICE_UNSPECIFIED,
            float(res.step_size),
            float(res.primal_weight),
            {
                "lagrangian_value": float(res.lagrangian_value),
                "estimated_lower_bound": float(res.estimated_lower_bound),
                "estimated_upper_bound": float(res.estimated_upper_bound),
            },
            PointType.POINT_TYPE_AVERAGE_ITERATE,
        )
        outputs.append(
            unscaled_saddle_point_output(
                scaled,
                avg_primal_out[..., i],
                avg_dual_out[..., i],
                TerminationReason(int(res.termination_reason)),
                int(res.iteration),
                [stats],
            )
        )
    return outputs


def solve_batch(
    params: _pdhg.PdhgParameters,
    problems: Sequence[QuadraticProgrammingProblem],
) -> List[SaddlePointOutput]:
    """Solves a fleet of instances concurrently with vmapped PDHG.

    Shapes are unified by zero padding (exact no-op for the iterates, see
    parallel.sharded.pad_problem). Only final iteration stats are recorded
    per instance.
    """
    if len(problems) == 0:
        return []
    if not isinstance(
        params.step_size_policy_params,
        (_pdhg.AdaptiveStepsizeParams, _pdhg.ConstantStepsizeParams),
    ):
        raise ValueError(
            "batched solves support adaptive or constant step sizes"
        )

    max_m = max(p.constraint_matrix.shape[0] for p in problems)
    max_n = max(p.constraint_matrix.shape[1] for p in problems)
    dtype = jnp.dtype(params.dtype)

    bundles, states, scaled_problems, dims = [], [], [], []
    for problem in problems:
        validate(problem)
        padded, m, n = pad_problem(
            problem, row_multiple=max_m, col_multiple=max_n
        )
        scaled = rescale_problem(
            params.l_inf_ruiz_iterations,
            params.l2_norm_rescaling,
            params.pock_chambolle_alpha,
            0,
            padded,
        )
        bundle = to_device_scaled(scaled, dtype, format="dense")
        state = _pdhg._initial_state(bundle, dtype)

        kkt0 = 0.0
        if isinstance(
            params.step_size_policy_params, _pdhg.AdaptiveStepsizeParams
        ):
            kkt0 += 0.5
            inf_norm = matrix_inf_norm_entrywise(
                scaled.scaled_qp.constraint_matrix
            )
            step_size = 1.0 / inf_norm if inf_norm > 0 else 1.0
        else:
            sigma_max, iters = estimate_maximum_singular_value(
                scaled.scaled_qp.constraint_matrix,
                probability_of_failure=0.001,
                desired_relative_error=0.2,
            )
            step_size = 0.8 / sigma_max
            kkt0 += iters
        primal_weight = initial_primal_weight_host(
            scaled.scaled_qp,
            params.primal_importance,
            params.scale_invariant_initial_primal_weight,
            0,
        )
        state = dataclasses.replace(
            state,
            step_size=jnp.asarray(step_size, dtype),
            primal_weight=jnp.asarray(primal_weight, dtype),
            cumulative_kkt_passes=jnp.asarray(kkt0, jnp.float64),
        )
        bundles.append(bundle)
        states.append(state)
        scaled_problems.append(scaled)
        dims.append((m, n))

    batched_bundle = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *bundles
    )
    batched_state = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)

    config = _pdhg._PdhgConfig(
        criteria=HashableCriteria.from_criteria(params.termination_criteria),
        restart_params=params.restart_params,
        step_policy=params.step_size_policy_params,
        termination_evaluation_frequency=int(
            params.termination_evaluation_frequency
        ),
    )

    start_time = time.time()
    final_results = [None] * len(problems)
    lane_time = [0.0] * len(problems)
    while True:
        elapsed = time.time() - start_time
        batched_state, result = _run_segment_batched(
            batched_bundle,
            batched_state,
            jnp.asarray(elapsed, jnp.float64),
            config,
        )
        host_result = jax.device_get(result)
        dispatch_elapsed = time.time() - start_time
        reasons = np.asarray(host_result.termination_reason)
        for i in range(len(problems)):
            if final_results[i] is None and reasons[i] != 0:
                final_results[i] = jax.tree_util.tree_map(
                    lambda leaf, i=i: leaf[i], host_result
                )
                lane_time[i] = dispatch_elapsed
        if all(r is not None for r in final_results):
            break

    outputs = []
    final_state = jax.device_get(batched_state)
    for i, (scaled, (m, n)) in enumerate(zip(scaled_problems, dims)):
        res = final_results[i]
        stats = to_host_stats(
            jax.tree_util.tree_map(float, res.conv),
            jax.tree_util.tree_map(float, res.infeas),
            int(res.iteration),
            float(res.cumulative_kkt_passes),
            lane_time[i],
            RestartChoice.RESTART_CHOICE_UNSPECIFIED,
            float(res.step_size),
            float(res.primal_weight),
            {
                "lagrangian_value": float(res.lagrangian_value),
                "estimated_lower_bound": float(res.estimated_lower_bound),
                "estimated_upper_bound": float(res.estimated_upper_bound),
            },
            PointType.POINT_TYPE_AVERAGE_ITERATE,
        )
        output = unscaled_saddle_point_output(
            scaled,
            final_state.avg_primal_out[i],
            final_state.avg_dual_out[i],
            TerminationReason(int(res.termination_reason)),
            int(res.iteration),
            [stats],
        )
        outputs.append(
            SaddlePointOutput(
                primal_solution=output.primal_solution[:n],
                dual_solution=output.dual_solution[:m],
                termination_reason=output.termination_reason,
                termination_string=output.termination_string,
                iteration_count=output.iteration_count,
                iteration_stats=output.iteration_stats,
            )
        )
    return outputs
