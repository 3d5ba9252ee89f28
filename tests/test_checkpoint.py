"""Checkpoint/resume tests (no reference counterpart - TPU-pod
infrastructure; the reference always cold-starts from zeros,
src/primal_dual_hybrid_gradient.jl:806-810)."""

import dataclasses

import numpy as np
import pytest

from firstorderlp_tpu import (
    AdaptiveStepsizeParams,
    PdhgParameters,
    RestartScheme,
    RestartToCurrentMetric,
    TerminationCriteria,
    construct_restart_parameters,
)
from firstorderlp_tpu.checkpoint import load_state, save_state
from firstorderlp_tpu.models.pdhg import optimize

from fixtures import example_lp


def pdhg_params(iteration_limit, **overrides):
    base = dict(
        l_inf_ruiz_iterations=0,
        l2_norm_rescaling=False,
        pock_chambolle_alpha=None,
        primal_importance=1.0,
        scale_invariant_initial_primal_weight=True,
        verbosity=0,
        record_iteration_stats=False,
        termination_evaluation_frequency=5,
        termination_criteria=TerminationCriteria(
            eps_optimal_absolute=0.0,
            eps_optimal_relative=0.0,
            eps_primal_infeasible=0.0,
            eps_dual_infeasible=0.0,
            iteration_limit=iteration_limit,
        ),
        restart_params=construct_restart_parameters(
            restart_scheme=RestartScheme.ADAPTIVE_NORMALIZED,
            restart_to_current_metric=(
                RestartToCurrentMetric.GAP_OVER_DISTANCE_SQUARED
            ),
            restart_frequency_if_fixed=100,
            artificial_restart_threshold=0.5,
            sufficient_reduction_for_restart=0.1,
            necessary_reduction_for_restart=0.9,
            primal_weight_update_smoothing=0.5,
            use_approximate_localized_duality_gap=False,
        ),
        step_size_policy_params=AdaptiveStepsizeParams(
            reduction_exponent=0.3, growth_exponent=0.6
        ),
    )
    base.update(overrides)
    return PdhgParameters(**base)


def test_save_load_roundtrip(tmp_path):
    import jax.numpy as jnp

    state = {
        "a": jnp.arange(5, dtype=jnp.float64),
        "nested": {"b": jnp.asarray(3.5), "c": jnp.asarray(True)},
    }
    path = str(tmp_path / "ckpt.npz")
    save_state(path, state, elapsed_time=12.5, metadata={"tag": "t"})
    template = {
        "a": jnp.zeros(5, dtype=jnp.float64),
        "nested": {"b": jnp.asarray(0.0), "c": jnp.asarray(False)},
    }
    restored, elapsed, meta = load_state(path, template)
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.arange(5))
    assert float(restored["nested"]["b"]) == 3.5
    assert bool(restored["nested"]["c"]) is True
    assert elapsed == 12.5
    assert meta == {"tag": "t"}


def test_load_shape_mismatch_raises(tmp_path):
    import jax.numpy as jnp

    path = str(tmp_path / "ckpt.npz")
    save_state(path, {"a": jnp.zeros(4)})
    with pytest.raises(ValueError, match="shape"):
        load_state(path, {"a": jnp.zeros(5)})


def test_resume_matches_uninterrupted_solve(tmp_path):
    """20 iterations straight == 10 iterations + checkpoint + 10 more."""
    problem = example_lp()
    path = str(tmp_path / "solver.npz")

    full = optimize(pdhg_params(20), problem)

    _ = optimize(pdhg_params(10, checkpoint_path=path), problem)
    resumed = optimize(
        pdhg_params(20, resume_from_checkpoint=path), problem
    )

    assert (
        resumed.termination_reason == full.termination_reason
    ), resumed.termination_string
    assert resumed.iteration_count == full.iteration_count
    np.testing.assert_allclose(
        resumed.primal_solution, full.primal_solution, rtol=0, atol=1e-12
    )
    np.testing.assert_allclose(
        resumed.dual_solution, full.dual_solution, rtol=0, atol=1e-12
    )


def test_fingerprint_mismatch_raises(tmp_path):
    """Resuming a checkpoint against a DIFFERENT problem with identical
    shapes must raise instead of silently producing a wrong solve."""
    problem = example_lp()
    path = str(tmp_path / "solver.npz")
    _ = optimize(pdhg_params(10, checkpoint_path=path), problem)

    other = example_lp()
    other.objective_vector = other.objective_vector + 1.0
    with pytest.raises(ValueError, match="different problem"):
        optimize(pdhg_params(20, resume_from_checkpoint=path), other)
