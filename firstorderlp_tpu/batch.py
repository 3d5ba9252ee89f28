"""Batched (vmapped) solving: many LP/QP instances per chip concurrently.

No reference counterpart (SURVEY.md section 2: semantics = N independent
optimize() calls). Instances are zero-padded to a common shape, their
device bundles stacked along a leading batch axis, and the jitted PDHG
segment is vmapped: one program advances every instance 40 iterations per
dispatch, with per-instance termination masking (lanes freeze once their
termination reason is set). Dense matrix layout, so the batched matvec is
a single MXU (B, m, n) x (B, n) contraction.

Typical use: L1-SVM fleets over many datasets / regularizer weights
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
    while True:
        elapsed = time.time() - start_time
        batched_state, result = _run_segment_batched(
            batched_bundle,
            batched_state,
            jnp.asarray(elapsed, jnp.float64),
            config,
        )
        reasons = np.asarray(result.termination_reason)
        for i in range(len(problems)):
            if final_results[i] is None and reasons[i] != 0:
                final_results[i] = jax.tree_util.tree_map(
                    lambda leaf, i=i: np.asarray(leaf[i]), result
                )
        if all(r is not None for r in final_results):
            break

    outputs = []
    final_state = jax.tree_util.tree_map(np.asarray, batched_state)
    for i, (scaled, (m, n)) in enumerate(zip(scaled_problems, dims)):
        res = final_results[i]
        stats = to_host_stats(
            jax.tree_util.tree_map(float, res.conv),
            jax.tree_util.tree_map(float, res.infeas),
            int(res.iteration),
            float(res.cumulative_kkt_passes),
            time.time() - start_time,
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
