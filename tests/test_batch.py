"""Batched (vmapped) solve tests: consistency with individual solves."""

import numpy as np
import pytest

from firstorderlp_tpu import TerminationReason, optimize
from firstorderlp_tpu.batch import solve_batch
from firstorderlp_tpu.generators import (
    generate_l1_svm_lp,
    random_svm_data,
)

from fixtures import (
    example_cc_lp,
    example_lp,
    example_lp_easy_primal_infeasible,
    example_qp,
    example_qp2,
)
from utils import optimality_criteria, pdhg_params


def test_batch_matches_individual_solves():
    problems = [example_lp(), example_cc_lp()]
    params = pdhg_params(optimality_criteria(1e-9))
    params.matrix_format = "dense"
    outputs = solve_batch(params, problems)
    assert len(outputs) == 2
    for problem, out in zip(problems, outputs):
        single = optimize(params, problem)
        assert (
            out.termination_reason
            == TerminationReason.TERMINATION_REASON_OPTIMAL
        )
        np.testing.assert_allclose(
            out.primal_solution, single.primal_solution, atol=1e-6
        )
        np.testing.assert_allclose(
            out.dual_solution, single.dual_solution, atol=1e-6
        )


def test_batch_mixed_termination():
    problems = [example_lp(), example_lp_easy_primal_infeasible()]
    params = pdhg_params(optimality_criteria(1e-8))
    outputs = solve_batch(params, problems)
    assert (
        outputs[0].termination_reason
        == TerminationReason.TERMINATION_REASON_OPTIMAL
    )
    assert (
        outputs[1].termination_reason
        == TerminationReason.TERMINATION_REASON_PRIMAL_INFEASIBLE
    )


def test_batch_qps():
    problems = [example_qp(), example_qp2()]
    params = pdhg_params(optimality_criteria(1e-9))
    outputs = solve_batch(params, problems)
    np.testing.assert_allclose(
        outputs[0].primal_solution, [0.2, 0.8], atol=1e-7
    )
    np.testing.assert_allclose(
        outputs[1].primal_solution, [0.25, 0.0], atol=1e-7
    )


def test_batch_l1_svm_fleet():
    """Fleet of L1-SVM LPs with different regularizer weights (the
    BASELINE.json vmapped-batch config)."""
    data = random_svm_data(n_samples=30, n_features=8, density=0.4, seed=1)
    problems = [
        generate_l1_svm_lp(data, regularizer_weight=w)
        for w in (0.1, 1.0, 4.0)
    ]
    params = pdhg_params(
        optimality_criteria(1e-6), ruiz_iterations=10, pock_chambolle_alpha=1.0
    )
    outputs = solve_batch(params, problems)
    objs = []
    for out in outputs:
        assert (
            out.termination_reason
            == TerminationReason.TERMINATION_REASON_OPTIMAL
        )
        objs.append(
            out.iteration_stats[-1].convergence_information[0].primal_objective
        )
    # Stronger regularization cannot decrease the optimal objective.
    assert objs[0] <= objs[1] + 1e-5 <= objs[2] + 2e-5


def test_shared_pattern_batch_matches_individual_solves():
    """Shared-pattern fleets (same sparsity, different values) solved
    with the minor-batch-axis path must match individual solves."""
    from firstorderlp_tpu.batch import solve_batch_shared_pattern
    from firstorderlp_tpu.generators import generate_pagerank_lp_fleet

    fleet = generate_pagerank_lp_fleet(120, [0.85, 0.9, 0.99], seed=3)
    params = pdhg_params(
        optimality_criteria(1e-8), ruiz_iterations=10,
        pock_chambolle_alpha=1.0,
    )
    params.matrix_format = "ell"
    outputs = solve_batch_shared_pattern(params, fleet)
    assert len(outputs) == 3
    for problem, out in zip(fleet, outputs):
        single = optimize(params, problem)
        assert (
            out.termination_reason
            == TerminationReason.TERMINATION_REASON_OPTIMAL
        )
        assert out.iteration_count == single.iteration_count
        np.testing.assert_allclose(
            out.primal_solution, single.primal_solution, atol=1e-9
        )
        np.testing.assert_allclose(
            out.dual_solution, single.dual_solution, atol=1e-9
        )
        # PageRank: the stationary distribution sums to one.
        np.testing.assert_allclose(out.primal_solution.sum(), 1.0, atol=1e-6)


def test_shared_pattern_rejects_mismatched_patterns():
    from firstorderlp_tpu.batch import solve_batch_shared_pattern
    from firstorderlp_tpu.generators import generate_pagerank_lp

    problems = [
        generate_pagerank_lp(num_nodes=60, seed=0),
        generate_pagerank_lp(num_nodes=60, seed=1),  # different graph
    ]
    params = pdhg_params(optimality_criteria(1e-6))
    params.matrix_format = "ell"
    with pytest.raises(ValueError, match="identical"):
        solve_batch_shared_pattern(params, problems)


def test_shared_pattern_l1_svm_regularization_path():
    """L1-SVM regularization path: same feature matrix, different lambda
    -> identical sparsity pattern (BASELINE.json vmapped-batch config,
    solved on the fast minor-batch path)."""
    from firstorderlp_tpu.batch import solve_batch_shared_pattern

    data = random_svm_data(n_samples=24, n_features=6, density=0.5, seed=2)
    problems = [
        generate_l1_svm_lp(data, regularizer_weight=w)
        for w in (0.1, 1.0, 4.0)
    ]
    params = pdhg_params(
        optimality_criteria(1e-7), ruiz_iterations=10,
        pock_chambolle_alpha=1.0,
    )
    params.matrix_format = "ell"
    outputs = solve_batch_shared_pattern(params, problems)
    objs = []
    for problem, out in zip(problems, outputs):
        assert (
            out.termination_reason
            == TerminationReason.TERMINATION_REASON_OPTIMAL
        )
        # L1-SVM LPs can have non-unique optima; batched reductions take a
        # different floating-point path than single solves, so compare the
        # (unique) optimal objective value rather than the argmin.
        single = optimize(params, problem)
        batched_obj = (
            out.iteration_stats[-1].convergence_information[0]
            .primal_objective
        )
        single_obj = (
            single.iteration_stats[-1].convergence_information[0]
            .primal_objective
        )
        np.testing.assert_allclose(batched_obj, single_obj, rtol=1e-5)
        objs.append(batched_obj)
    assert objs[0] <= objs[1] + 1e-6 <= objs[2] + 1e-6


def test_fast_fleet_ingest_matches_slow_path():
    """The device-build fast ingest (one (nnz,B) transfer + on-device
    rescale/plane scatter) must reproduce the per-instance slow loop
    exactly in f64: same iterates, KKT passes and solutions."""
    from firstorderlp_tpu.batch import (
        _prepare_fleet_slow,
        prepare_shared_pattern_fleet,
        solve_batch_shared_pattern,
    )
    from firstorderlp_tpu.generators import generate_pagerank_lp_fleet

    problems = generate_pagerank_lp_fleet(
        300, np.linspace(0.7, 0.99, 4), seed=0
    )
    from utils import terminate_on_iteration_limit

    params = pdhg_params(
        terminate_on_iteration_limit(80), ruiz_iterations=10,
        pock_chambolle_alpha=1.0,
    )
    params.matrix_format = "ell"
    fast = prepare_shared_pattern_fleet(params, problems)
    slow = _prepare_fleet_slow(params, problems)
    out_f = solve_batch_shared_pattern(params, problems, fleet=fast)
    out_s = solve_batch_shared_pattern(params, problems, fleet=slow)
    for a, b in zip(out_f, out_s):
        np.testing.assert_allclose(
            a.primal_solution, b.primal_solution, atol=1e-9, rtol=1e-9
        )
        np.testing.assert_allclose(
            a.dual_solution, b.dual_solution, atol=1e-9, rtol=1e-9
        )
        assert (
            abs(
                a.iteration_stats[-1].cumulative_kkt_matrix_passes
                - b.iteration_stats[-1].cumulative_kkt_matrix_passes
            )
            < 1e-9
        )


def test_fleet_checkpoint_resume(tmp_path):
    """A preempted shared-pattern fleet resumes from its .npz checkpoint
    and finishes with the same solutions as an uninterrupted run."""
    import dataclasses

    from firstorderlp_tpu.batch import solve_batch_shared_pattern
    from firstorderlp_tpu.generators import generate_pagerank_lp_fleet

    fleet = generate_pagerank_lp_fleet(150, [0.85, 0.95], seed=5)
    path = str(tmp_path / "fleet.npz")
    base = pdhg_params(
        optimality_criteria(1e-7), ruiz_iterations=10,
        pock_chambolle_alpha=1.0,
    )
    base.matrix_format = "ell"

    full = solve_batch_shared_pattern(base, fleet)

    # phase 1: few iterations, checkpointing every dispatch
    p1 = dataclasses.replace(
        base,
        termination_criteria=dataclasses.replace(
            base.termination_criteria, iteration_limit=80
        ),
        checkpoint_path=path,
    )
    solve_batch_shared_pattern(p1, fleet)
    # phase 2: resume to optimality
    p2 = dataclasses.replace(base, resume_from_checkpoint=path)
    resumed = solve_batch_shared_pattern(p2, fleet)
    for a, b in zip(resumed, full):
        assert a.termination_reason == b.termination_reason
        np.testing.assert_allclose(
            a.primal_solution, b.primal_solution, atol=1e-5
        )


def test_heterogeneous_fleet_stays_sparse():
    """Mixed-size mixed-pattern fleets keep the ELL layout (aligned
    plane shapes), matching individual solves - round 1 densified to
    B x max_m x max_n."""
    from firstorderlp_tpu.generators import generate_pagerank_lp

    rng = np.random.default_rng(0)
    problems = []
    for i, nodes in enumerate((120, 190, 260, 150, 220, 300)):
        problems.append(generate_pagerank_lp(nodes, seed=10 + i))
    params = pdhg_params(
        optimality_criteria(1e-6), ruiz_iterations=10,
        pock_chambolle_alpha=1.0,
    )
    outputs = solve_batch(params, problems)
    assert len(outputs) == len(problems)
    for problem, out in zip(problems, outputs):
        single = optimize(params, problem)
        assert out.termination_reason == single.termination_reason
        np.testing.assert_allclose(
            out.primal_solution, single.primal_solution, atol=1e-5
        )


def test_fleet_spec_matches_host_stacked_fleet():
    """A device-generated FleetSpec fleet (pagerank damping sweep) must
    produce the same per-lane solutions as the host-stacked fleet built
    from the expanded problem list (VERDICT r02 item 6: ship O(nnz + B)
    bytes, not O(nnz * B))."""
    import dataclasses

    from firstorderlp_tpu.batch import (
        prepare_shared_pattern_fleet,
        solve_batch_shared_pattern,
    )
    from firstorderlp_tpu.generators import (
        generate_pagerank_lp_fleet,
        pagerank_fleet_spec,
    )

    damping = [0.7, 0.85, 0.95]
    params = pdhg_params(
        optimality_criteria(1e-6), ruiz_iterations=10,
        pock_chambolle_alpha=1.0,
    )
    params = dataclasses.replace(params, dtype="float32")
    problems = generate_pagerank_lp_fleet(300, damping, seed=1)
    spec = pagerank_fleet_spec(300, damping, seed=1)
    outs_list = solve_batch_shared_pattern(params, problems)
    fleet = prepare_shared_pattern_fleet(params, spec)
    outs_spec = solve_batch_shared_pattern(params, spec, fleet=fleet)
    assert len(outs_spec) == len(damping)
    for a, b in zip(outs_list, outs_spec):
        assert (
            b.termination_reason
            == TerminationReason.TERMINATION_REASON_OPTIMAL
        )
        np.testing.assert_allclose(
            a.primal_solution, b.primal_solution, atol=5e-5
        )
        np.testing.assert_allclose(
            a.dual_solution, b.dual_solution, atol=5e-5
        )


def _mp_fleet_params(tol, diagonal_scaling="l2"):
    from firstorderlp_tpu import MirrorProxParameters
    from utils import default_restart_params

    return MirrorProxParameters(
        l_inf_ruiz_iterations=10,
        l2_norm_rescaling=False,
        pock_chambolle_alpha=1.0,
        primal_importance=1.0,
        scale_invariant_initial_primal_weight=True,
        diagonal_scaling=diagonal_scaling,
        verbosity=0,
        record_iteration_stats=True,
        termination_evaluation_frequency=40,
        termination_criteria=optimality_criteria(tol),
        restart_params=default_restart_params(),
    )


def test_mirror_prox_shared_pattern_fleet_matches_individual():
    """MP fleets ride the same minor-batch-axis machinery as PDHG
    (VERDICT r02 item 9); each lane must match its individual MP solve
    exactly (fast device build vs host single-instance ingest)."""
    from firstorderlp_tpu.batch import solve_batch_shared_pattern
    from firstorderlp_tpu.generators import generate_pagerank_lp_fleet

    fleet = generate_pagerank_lp_fleet(120, [0.85, 0.9, 0.99], seed=3)
    for scaling in ("l2", "off"):
        params = _mp_fleet_params(1e-6, scaling)
        outputs = solve_batch_shared_pattern(params, fleet)
        assert len(outputs) == 3
        for problem, out in zip(fleet, outputs):
            single = optimize(params, problem)
            assert (
                out.termination_reason
                == TerminationReason.TERMINATION_REASON_OPTIMAL
            )
            assert out.iteration_count == single.iteration_count
            np.testing.assert_allclose(
                out.primal_solution, single.primal_solution, atol=1e-9
            )
            np.testing.assert_allclose(
                out.dual_solution, single.dual_solution, atol=1e-9
            )


def test_mirror_prox_fleet_spec():
    """A device-generated FleetSpec fleet solved with mirror prox."""
    import dataclasses as _dc

    from firstorderlp_tpu.batch import solve_batch_shared_pattern
    from firstorderlp_tpu.generators import (
        generate_pagerank_lp_fleet,
        pagerank_fleet_spec,
    )

    damping = [0.7, 0.9]
    params = _mp_fleet_params(1e-5)
    params = _dc.replace(params, dtype="float32")
    spec = pagerank_fleet_spec(200, damping, seed=2)
    outs = solve_batch_shared_pattern(params, spec)
    problems = generate_pagerank_lp_fleet(200, damping, seed=2)
    for problem, out in zip(problems, outs):
        single = optimize(params, problem)
        assert (
            out.termination_reason
            == TerminationReason.TERMINATION_REASON_OPTIMAL
        )
        np.testing.assert_allclose(
            out.primal_solution, single.primal_solution, atol=5e-5
        )
