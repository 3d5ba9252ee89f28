"""Mirror Prox integration tests (reference test/test_mirror_prox.jl)."""

import numpy as np
import pytest

from firstorderlp_tpu import (
    MirrorProxParameters,
    RestartScheme,
    TerminationReason,
    optimize,
)

from fixtures import (
    example_lp,
    example_lp_dual_infeasible,
    example_lp_easy_primal_infeasible,
    example_qp,
)
from utils import (
    default_restart_params,
    optimality_criteria,
    terminate_on_iteration_limit,
)

LP_OPT_PRIMAL = np.array([1.0, 0.0, 6.0, 2.0])
LP_OPT_DUAL = np.array([0.5, 4.0, 0.0])


def mp_params(
    criteria,
    restart_params=None,
    diagonal_scaling="off",
    ruiz_iterations=0,
    pock_chambolle_alpha=None,
    primal_importance=1.0,
    frequency=40,
):
    if restart_params is None:
        restart_params = default_restart_params()
    return MirrorProxParameters(
        l_inf_ruiz_iterations=ruiz_iterations,
        l2_norm_rescaling=False,
        pock_chambolle_alpha=pock_chambolle_alpha,
        primal_importance=primal_importance,
        scale_invariant_initial_primal_weight=True,
        diagonal_scaling=diagonal_scaling,
        verbosity=0,
        record_iteration_stats=True,
        termination_evaluation_frequency=frequency,
        termination_criteria=criteria,
        restart_params=restart_params,
    )


def assert_lp_solved(output, tol):
    assert (
        output.termination_reason
        == TerminationReason.TERMINATION_REASON_OPTIMAL
    )
    np.testing.assert_allclose(output.primal_solution, LP_OPT_PRIMAL, atol=tol)
    np.testing.assert_allclose(output.dual_solution, LP_OPT_DUAL, atol=tol)


def test_lp_high_precision():
    output = optimize(mp_params(optimality_criteria(1e-10)), example_lp())
    assert_lp_solved(output, 1e-8)


def test_bound_estimates_recovered_without_stats_recording():
    """Mirror of test_pdhg: with record_iteration_stats=False, the final
    stats entry must carry bound estimates recovered post-loop."""
    import dataclasses

    criteria = optimality_criteria(1e-6)
    recording = optimize(mp_params(criteria), example_lp())
    silent_params = dataclasses.replace(
        mp_params(criteria), record_iteration_stats=False
    )
    silent = optimize(silent_params, example_lp())
    assert len(silent.iteration_stats) == 1
    ref = recording.iteration_stats[-1].method_specific_stats
    got = silent.iteration_stats[-1].method_specific_stats
    for key in (
        "lagrangian_value",
        "estimated_lower_bound",
        "estimated_upper_bound",
    ):
        np.testing.assert_allclose(got[key], ref[key], rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("scaling", ["off", "l1", "l2"])
def test_lp_diagonal_scalings(scaling):
    output = optimize(
        mp_params(optimality_criteria(1e-9), diagonal_scaling=scaling),
        example_lp(),
    )
    assert_lp_solved(output, 1e-7)


def test_lp_no_restarts():
    output = optimize(
        mp_params(
            optimality_criteria(1e-6),
            restart_params=default_restart_params(RestartScheme.NO_RESTARTS),
        ),
        example_lp(),
    )
    assert_lp_solved(output, 1e-4)


def test_lp_with_rescaling():
    output = optimize(
        mp_params(
            optimality_criteria(1e-9),
            ruiz_iterations=10,
            pock_chambolle_alpha=1.0,
        ),
        example_lp(),
    )
    assert_lp_solved(output, 1e-7)


def test_qp():
    output = optimize(mp_params(optimality_criteria(1e-9)), example_qp())
    assert (
        output.termination_reason
        == TerminationReason.TERMINATION_REASON_OPTIMAL
    )
    np.testing.assert_allclose(output.primal_solution, [0.2, 0.8], atol=1e-7)
    np.testing.assert_allclose(output.dual_solution, [0.2], atol=1e-7)


def test_iteration_limit():
    output = optimize(mp_params(terminate_on_iteration_limit(80)), example_lp())
    assert (
        output.termination_reason
        == TerminationReason.TERMINATION_REASON_ITERATION_LIMIT
    )
    # KKT-pass accounting: 2 per iteration + 2 per evaluation.
    final = output.iteration_stats[-1]
    assert final.cumulative_kkt_matrix_passes >= 2 * 80


def test_primal_infeasible():
    output = optimize(
        mp_params(optimality_criteria(1e-8)),
        example_lp_easy_primal_infeasible(),
    )
    assert (
        output.termination_reason
        == TerminationReason.TERMINATION_REASON_PRIMAL_INFEASIBLE
    )


def test_dual_infeasible():
    output = optimize(
        mp_params(optimality_criteria(1e-8)), example_lp_dual_infeasible()
    )
    assert (
        output.termination_reason
        == TerminationReason.TERMINATION_REASON_DUAL_INFEASIBLE
    )


def test_mirror_prox_checkpoint_resume(tmp_path):
    """MP resume solves to the same optimum (checkpointing was
    PDHG-only in round 1). Trajectories are not bit-identical because
    resuming inserts an evaluation (and restart opportunity) at the
    resume iteration; convergence is what the contract guarantees."""
    import dataclasses

    from fixtures import example_lp

    problem = example_lp()
    path = str(tmp_path / "mp.npz")
    base = mp_params(optimality_criteria(1e-9))
    full = optimize(base, problem)

    p1 = dataclasses.replace(
        base,
        termination_criteria=terminate_on_iteration_limit(30),
        checkpoint_path=path,
    )
    optimize(p1, problem)
    p2 = dataclasses.replace(base, resume_from_checkpoint=path)
    resumed = optimize(p2, problem)
    assert resumed.termination_reason == full.termination_reason
    np.testing.assert_allclose(
        resumed.primal_solution, full.primal_solution, atol=1e-6
    )
    assert resumed.iteration_count <= full.iteration_count


def test_prepared_problem_reuse():
    """optimize(prepared=...) must match a plain optimize() call and
    allow repeated solves without re-ingesting (the MP analogue of
    pdhg.prepare_problem; at 4M nnz the per-call rescale+plan+transfer
    measured ~14 s against a sub-second solve)."""
    from firstorderlp_tpu.models.mirror_prox import (
        optimize as mp_optimize,
        prepare_problem as mp_prepare,
    )

    problem = example_lp()
    params = mp_params(optimality_criteria(1e-8), ruiz_iterations=10)
    plain = mp_optimize(params, problem)
    prepared = mp_prepare(params, problem)
    out1 = mp_optimize(params, problem, prepared=prepared)
    out2 = mp_optimize(params, problem, prepared=prepared)
    for out in (out1, out2):
        assert (
            out.termination_reason
            == TerminationReason.TERMINATION_REASON_OPTIMAL
        )
        np.testing.assert_allclose(
            out.primal_solution, plain.primal_solution, atol=1e-12
        )
        np.testing.assert_allclose(
            out.dual_solution, plain.dual_solution, atol=1e-12
        )
    assert out1.iteration_count == plain.iteration_count


def test_mirror_prox_on_padded_problem():
    """Shape padding (TPU campaign buckets) adds empty rows/columns;
    MP's mirror-map scalings must not divide by their zero norms
    (regression: NaN iterates ran the l1_svm TPU campaign solve to
    TIME_LIMIT; reference mirror_prox.jl:504-533 never sees empties
    because presolve removes them)."""
    import numpy as np

    from firstorderlp_tpu.parallel.sharded import pad_problem

    problem = example_lp()
    padded, m, n = pad_problem(problem, 8, 8)
    params = mp_params(optimality_criteria(1e-8), diagonal_scaling="l1")
    out = optimize(params, padded)
    assert out.termination_reason == (
        TerminationReason.TERMINATION_REASON_OPTIMAL
    )
    np.testing.assert_allclose(
        out.primal_solution[:n], [1.0, 0.0, 6.0, 2.0], atol=1e-4
    )
    assert np.all(np.isfinite(out.dual_solution))


def test_mirror_prox_chained_dispatch_matches_single():
    """evaluations_per_dispatch chains [evaluate -> steps] segments in
    one jit (dispatch-overhead amortization, same contract as
    PdhgParameters); the solve must be bit-identical to the unchained
    driver."""
    import dataclasses

    base = mp_params(optimality_criteria(1e-8), diagonal_scaling="l1")
    ref = optimize(base, example_lp())
    chained = optimize(
        dataclasses.replace(base, evaluations_per_dispatch=4),
        example_lp(),
    )
    assert chained.termination_reason == ref.termination_reason
    assert chained.iteration_count == ref.iteration_count
    np.testing.assert_array_equal(
        chained.primal_solution, ref.primal_solution
    )
    np.testing.assert_array_equal(
        chained.dual_solution, ref.dual_solution
    )
