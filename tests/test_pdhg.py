"""PDHG solver integration tests.

Mirrors reference test/test_primal_dual_hybrid_gradient.jl: full optimize()
runs on golden fixtures asserted to 1e-4 (low precision) or 1e-9 (high
precision), across step-size policies, restart schemes and rescalings, plus
infeasibility detection.
"""

import numpy as np
import pytest

from firstorderlp_tpu import (
    AdaptiveStepsizeParams,
    ConstantStepsizeParams,
    MalitskyPockStepsizeParameters,
    RestartScheme,
    RestartToCurrentMetric,
    TerminationReason,
    optimize,
)

from fixtures import (
    example_cc_lp,
    example_cc_star_lp,
    example_lp,
    example_lp_dual_infeasible,
    example_lp_easy_primal_infeasible,
    example_lp_hard_primal_infeasible,
    example_lp_without_bounds,
    example_qp,
    example_qp2,
)
from utils import (
    default_restart_params,
    optimality_criteria,
    pdhg_params,
    terminate_on_iteration_limit,
)

LP_OPT_PRIMAL = np.array([1.0, 0.0, 6.0, 2.0])
LP_OPT_DUAL = np.array([0.5, 4.0, 0.0])


def assert_lp_solved(output, tol):
    assert (
        output.termination_reason
        == TerminationReason.TERMINATION_REASON_OPTIMAL
    )
    np.testing.assert_allclose(
        output.primal_solution, LP_OPT_PRIMAL, atol=tol
    )
    np.testing.assert_allclose(output.dual_solution, LP_OPT_DUAL, atol=tol)


def test_lp_high_precision_adaptive():
    params = pdhg_params(optimality_criteria(1e-10), frequency=40)
    output = optimize(params, example_lp())
    assert_lp_solved(output, 1e-9)


def test_lp_low_precision_no_restarts():
    params = pdhg_params(
        optimality_criteria(1e-6),
        restart_params=default_restart_params(RestartScheme.NO_RESTARTS),
    )
    output = optimize(params, example_lp())
    assert_lp_solved(output, 1e-4)


@pytest.mark.parametrize(
    "scheme",
    [
        RestartScheme.FIXED_FREQUENCY,
        RestartScheme.ADAPTIVE_NORMALIZED,
        RestartScheme.ADAPTIVE_LOCALIZED,
        RestartScheme.ADAPTIVE_DISTANCE,
    ],
)
def test_lp_all_restart_schemes(scheme):
    params = pdhg_params(
        optimality_criteria(1e-9),
        restart_params=default_restart_params(scheme),
    )
    output = optimize(params, example_lp())
    assert_lp_solved(output, 1e-7)


@pytest.mark.parametrize(
    "metric",
    [
        RestartToCurrentMetric.NO_RESTART_TO_CURRENT,
        RestartToCurrentMetric.GAP_OVER_DISTANCE,
        RestartToCurrentMetric.GAP_OVER_DISTANCE_SQUARED,
    ],
)
def test_lp_restart_to_current_metrics(metric):
    params = pdhg_params(
        optimality_criteria(1e-9),
        restart_params=default_restart_params(
            RestartScheme.ADAPTIVE_NORMALIZED, metric
        ),
    )
    output = optimize(params, example_lp())
    assert_lp_solved(output, 1e-7)


def test_lp_with_rescaling():
    params = pdhg_params(
        optimality_criteria(1e-10),
        ruiz_iterations=10,
        pock_chambolle_alpha=1.0,
        l2_norm_rescaling=True,
    )
    output = optimize(params, example_lp())
    assert_lp_solved(output, 1e-8)


def test_lp_malitsky_pock():
    params = pdhg_params(
        optimality_criteria(1e-9),
        step_size_policy=MalitskyPockStepsizeParameters(0.7, 1.0, 1.0),
    )
    output = optimize(params, example_lp())
    assert_lp_solved(output, 1e-7)


def test_lp_constant_step_size():
    params = pdhg_params(
        optimality_criteria(1e-9),
        step_size_policy=ConstantStepsizeParams(),
    )
    output = optimize(params, example_lp())
    assert_lp_solved(output, 1e-7)


def test_constant_step_size_invariance():
    """With constant steps and no restarts the iterate sequence is
    deterministic: same iteration limit -> same solution (reference
    l.168-171 checks solution is deterministic)."""
    params = pdhg_params(
        terminate_on_iteration_limit(300),
        restart_params=default_restart_params(RestartScheme.NO_RESTARTS),
        step_size_policy=ConstantStepsizeParams(),
    )
    out1 = optimize(params, example_lp())
    out2 = optimize(params, example_lp())
    assert (
        out1.termination_reason
        == TerminationReason.TERMINATION_REASON_ITERATION_LIMIT
    )
    np.testing.assert_array_equal(out1.primal_solution, out2.primal_solution)
    np.testing.assert_array_equal(out1.dual_solution, out2.dual_solution)


def test_lp_without_bounds():
    params = pdhg_params(optimality_criteria(1e-9))
    output = optimize(params, example_lp_without_bounds())
    assert (
        output.termination_reason
        == TerminationReason.TERMINATION_REASON_OPTIMAL
    )
    np.testing.assert_allclose(output.primal_solution, [2.0], atol=1e-7)
    np.testing.assert_allclose(output.dual_solution, [1.0], atol=1e-7)


@pytest.mark.parametrize("fixture, opt", [
    (example_cc_lp, 1.0),
    # LP relaxation of the star instance: x_1j = 0.5, x_jk = 0 gives 1.5.
    (example_cc_star_lp, 1.5),
])
def test_correlation_clustering_lps(fixture, opt):
    params = pdhg_params(optimality_criteria(1e-8))
    output = optimize(params, fixture())
    assert (
        output.termination_reason
        == TerminationReason.TERMINATION_REASON_OPTIMAL
    )
    ci = output.iteration_stats[-1].convergence_information[0]
    assert ci.primal_objective == pytest.approx(opt, abs=1e-4)


def test_qp_high_precision():
    params = pdhg_params(optimality_criteria(1e-10))
    output = optimize(params, example_qp())
    assert (
        output.termination_reason
        == TerminationReason.TERMINATION_REASON_OPTIMAL
    )
    np.testing.assert_allclose(output.primal_solution, [0.2, 0.8], atol=1e-8)
    np.testing.assert_allclose(output.dual_solution, [0.2], atol=1e-8)


def test_qp2():
    params = pdhg_params(optimality_criteria(1e-9))
    output = optimize(params, example_qp2())
    assert (
        output.termination_reason
        == TerminationReason.TERMINATION_REASON_OPTIMAL
    )
    np.testing.assert_allclose(output.primal_solution, [0.25, 0.0], atol=1e-7)
    np.testing.assert_allclose(output.dual_solution, [0.0], atol=1e-7)


def test_iteration_limit_and_stats_recording():
    params = pdhg_params(terminate_on_iteration_limit(120), frequency=40)
    output = optimize(params, example_lp())
    assert (
        output.termination_reason
        == TerminationReason.TERMINATION_REASON_ITERATION_LIMIT
    )
    assert output.iteration_count == 120
    iterations = [s.iteration_number for s in output.iteration_stats]
    # Evaluations at iterations 0..9 (first ten) then every 40.
    assert iterations[:10] == list(range(10))
    assert 40 in iterations and 80 in iterations and 120 in iterations
    # KKT passes increase monotonically.
    kkt = [s.cumulative_kkt_matrix_passes for s in output.iteration_stats]
    assert all(b >= a for a, b in zip(kkt, kkt[1:]))


def test_bound_estimates_recovered_without_stats_recording():
    """With record_iteration_stats=False the in-loop bound-estimate
    trust-region solve is skipped (need_bound_estimates gating); the final
    stats entry must still carry the estimates, recovered post-loop."""
    criteria = optimality_criteria(1e-6)
    recording = optimize(pdhg_params(criteria), example_lp())
    silent = optimize(
        pdhg_params(criteria, record_iteration_stats=False), example_lp()
    )
    assert len(silent.iteration_stats) == 1
    ref = recording.iteration_stats[-1].method_specific_stats
    got = silent.iteration_stats[-1].method_specific_stats
    for key in (
        "lagrangian_value",
        "estimated_lower_bound",
        "estimated_upper_bound",
    ):
        np.testing.assert_allclose(got[key], ref[key], rtol=1e-6, atol=1e-9)
    # The estimates bracket the Lagrangian value at the final point.
    assert got["estimated_lower_bound"] <= got["lagrangian_value"] + 1e-9
    assert got["estimated_upper_bound"] >= got["lagrangian_value"] - 1e-9


def test_kkt_pass_limit_termination():
    from utils import optimality_criteria

    criteria = terminate_on_iteration_limit(10**7)
    criteria.kkt_matrix_pass_limit = 50.0
    params = pdhg_params(criteria)
    output = optimize(params, example_lp())
    assert (
        output.termination_reason
        == TerminationReason.TERMINATION_REASON_KKT_MATRIX_PASS_LIMIT
    )


def test_primal_infeasible_easy():
    params = pdhg_params(optimality_criteria(1e-8))
    output = optimize(params, example_lp_easy_primal_infeasible())
    assert (
        output.termination_reason
        == TerminationReason.TERMINATION_REASON_PRIMAL_INFEASIBLE
    )


def test_primal_infeasible_hard():
    params = pdhg_params(optimality_criteria(1e-8))
    output = optimize(params, example_lp_hard_primal_infeasible(0.01))
    assert (
        output.termination_reason
        == TerminationReason.TERMINATION_REASON_PRIMAL_INFEASIBLE
    )


def test_dual_infeasible():
    params = pdhg_params(optimality_criteria(1e-8))
    output = optimize(params, example_lp_dual_infeasible())
    assert (
        output.termination_reason
        == TerminationReason.TERMINATION_REASON_DUAL_INFEASIBLE
    )


def test_restart_events_recorded():
    params = pdhg_params(
        optimality_criteria(1e-9),
        restart_params=default_restart_params(
            RestartScheme.ADAPTIVE_NORMALIZED
        ),
    )
    output = optimize(params, example_lp())
    restarts = [
        s.restart_used.name
        for s in output.iteration_stats
        if s.restart_used.value
        in (2, 3)  # WEIGHTED_AVERAGE_RESET or RESTART_TO_AVERAGE
    ]
    assert len(restarts) > 0


def test_ell_matrix_format_matches_dense():
    params_dense = pdhg_params(optimality_criteria(1e-9))
    params_dense.matrix_format = "dense"
    params_ell = pdhg_params(optimality_criteria(1e-9))
    params_ell.matrix_format = "ell"
    out_dense = optimize(params_dense, example_lp())
    out_ell = optimize(params_ell, example_lp())
    np.testing.assert_allclose(
        out_dense.primal_solution, out_ell.primal_solution, atol=1e-12
    )
    np.testing.assert_allclose(
        out_dense.dual_solution, out_ell.dual_solution, atol=1e-12
    )


def test_split_precision_fp32_hot_loop_f64_stats():
    """TPU split-precision mode: fp32 iterates, f64 termination stats.

    fp32 iterates reach ~1e-6 relative KKT error (fp32 eps floor); the
    f64 stats path must measure and terminate correctly there. (Full
    1e-8 tolerances need dtype=float64; no reference counterpart - the
    reference is f64-only.)
    """
    from firstorderlp_tpu.generators import generate_pagerank_lp

    problem = generate_pagerank_lp(num_nodes=400, seed=0)
    params = pdhg_params(
        optimality_criteria(1e-6), ruiz_iterations=10,
        pock_chambolle_alpha=1.0,
    )
    params.dtype = "float32"
    params.stats_dtype = "float64"
    params.matrix_format = "ell"
    out = optimize(params, problem)
    assert (
        out.termination_reason == TerminationReason.TERMINATION_REASON_OPTIMAL
    ), out.termination_string
    conv = out.iteration_stats[-1].convergence_information[0]
    # The recorded stats are f64 evaluations of the fp32 iterates.
    assert conv.relative_l2_primal_residual < 1e-6
    assert conv.relative_l2_dual_residual < 1e-6
    np.testing.assert_allclose(out.primal_solution.sum(), 1.0, atol=1e-5)


def test_numerical_error_termination():
    """With zero tolerances the cc LP converges exactly and movement
    hits 0 -> TERMINATION_REASON_NUMERICAL_ERROR (reference
    test_primal_dual_hybrid_gradient.jl:391-412)."""
    from fixtures import example_cc_lp

    output = optimize(
        pdhg_params(terminate_on_iteration_limit(150)), example_cc_lp()
    )
    assert (
        output.termination_reason
        == TerminationReason.TERMINATION_REASON_NUMERICAL_ERROR
    ), output.termination_string
    np.testing.assert_allclose(
        output.primal_solution, [1.0, 1.0, 0.0, 1.0, 0.0, 0.0],
        atol=1e-12,
    )
    final = output.iteration_stats[-1]
    assert abs(
        final.convergence_information[0].dual_objective - 1.0
    ) < 1e-12
    assert np.all(output.dual_solution[:3] >= 0.0)
    assert output.dual_solution[0] + output.dual_solution[1] >= 1.0 - 1e-12


def test_l_inf_optimality_norm_end_to_end():
    """Full solve under OptimalityNorm.L_INF (no end-to-end L_INF test
    existed; criteria semantics reference termination.jl:33-45)."""
    import dataclasses as _dc

    from firstorderlp_tpu.termination import OptimalityNorm

    criteria = _dc.replace(
        optimality_criteria(1e-8), optimality_norm=OptimalityNorm.L_INF
    )
    output = optimize(
        pdhg_params(criteria, ruiz_iterations=10), example_lp()
    )
    assert (
        output.termination_reason
        == TerminationReason.TERMINATION_REASON_OPTIMAL
    )
    np.testing.assert_allclose(
        output.primal_solution, [1.0, 0.0, 6.0, 2.0], atol=1e-6
    )
    ci = output.iteration_stats[-1].convergence_information[0]
    assert ci.l_inf_primal_residual <= 1e-8 * (
        1.0 + 12.0
    )  # eps_abs + eps_rel * ||b||_inf


def test_dependent_rows_solve():
    """LP with linearly dependent rows solves to its optimum (fixture
    was defined but never exercised; reference
    shared_test_qp_problems.jl:176-206)."""
    from fixtures import example_lp_dependent_rows

    output = optimize(
        pdhg_params(optimality_criteria(1e-8), ruiz_iterations=10),
        example_lp_dependent_rows(),
    )
    assert (
        output.termination_reason
        == TerminationReason.TERMINATION_REASON_OPTIMAL
    )
    assert abs(
        output.iteration_stats[-1].convergence_information[0]
        .primal_objective
        - 3.0
    ) < 1e-6


def test_restart_rung_improves_dual_residual_on_pagerank():
    """Regression for the campaign restarts-rung anomaly (round-2
    VERDICT item 8): on UNSCALED PageRank the equality row sqrt(n)*1'
    has L2 norm ~ n, so 1/||A|| collapses the step size and the dual
    residual crawls. Restarts cannot fix the step scale but still cut
    the dual residual by orders of magnitude at a fixed budget; the
    scaling rung (Ruiz + Pock-Chambolle) is what actually solves the
    instance (reference ladder methodology analyze_csv_data.py:100-115
    - on PaPILO-presolved MIPLIB the restart rung is the largest win;
    on raw PageRank that win moves to the scaling rung)."""
    from firstorderlp_tpu.generators import generate_pagerank_lp

    problem = generate_pagerank_lp(num_nodes=400, seed=7)
    budget = terminate_on_iteration_limit(3000)

    def final_dual_res(params):
        out = optimize(params, problem)
        # absolute residual: the relative fields divide by
        # eps_abs/eps_rel = 0/0 = NaN under zero-tolerance criteria
        # (the reference's eps_ratio does the same, termination.jl:163)
        return out.iteration_stats[-1].convergence_information[
            0
        ].l2_dual_residual

    # the ladder's vanilla/restarts rungs: constant step, no scaling,
    # no scale-invariant primal weight (run_campaign.py:150-155)
    vanilla = final_dual_res(
        pdhg_params(
            budget,
            restart_params=default_restart_params(
                scheme=RestartScheme.NO_RESTARTS
            ),
            step_size_policy=ConstantStepsizeParams(),
            scale_invariant_initial_primal_weight=False,
        )
    )
    restarts = final_dual_res(
        pdhg_params(
            budget,
            step_size_policy=ConstantStepsizeParams(),
            scale_invariant_initial_primal_weight=False,
        )
    )
    assert restarts < vanilla / 5.0, (vanilla, restarts)

    scaled = optimize(
        pdhg_params(
            optimality_criteria(1e-4),
            ruiz_iterations=10,
            pock_chambolle_alpha=1.0,
        ),
        problem,
    )
    assert (
        scaled.termination_reason
        == TerminationReason.TERMINATION_REASON_OPTIMAL
    )
    assert (
        scaled.iteration_stats[-1].cumulative_kkt_matrix_passes < 3000
    )
