"""Host f64 stats (host_stats.py) vs the device implementations.

The refinement driver certifies on host; these tests pin the host port
to the device functions (which tests/test_iteration_stats.py pins to
the reference semantics, src/iteration_stats_utils.jl)."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from firstorderlp_tpu.host_stats import (
    host_convergence_information,
    host_infeasibility_information,
    host_optimality_met,
    host_qp_cache,
)
from firstorderlp_tpu.iteration_stats import (
    compute_convergence_information,
    compute_infeasibility_information,
)

from fixtures import example_lp, example_qp
from utils import pdhg_params, terminate_on_iteration_limit


def _device_original(problem):
    from firstorderlp_tpu.models.pdhg import prepare_problem

    params = dataclasses.replace(
        pdhg_params(terminate_on_iteration_limit(4)), dtype="float64"
    )
    prep = prepare_problem(params, problem)
    return prep.bundle.original, prep.bundle.qp_cache


def _assert_close(host_info, device_info):
    dev = {k: float(v) for k, v in device_info._asdict().items()}
    for k, hv in host_info._asdict().items():
        np.testing.assert_allclose(
            float(hv), dev[k], rtol=1e-12, atol=1e-14, err_msg=k
        )


def test_host_convergence_matches_device():
    for problem in (example_lp(), example_qp()):
        n = problem.constraint_matrix.shape[1]
        m = problem.constraint_matrix.shape[0]
        rng = np.random.default_rng(0)
        x = rng.normal(size=n)
        y = rng.normal(size=m)
        dev_problem, qp_cache = _device_original(problem)
        host = host_convergence_information(problem, x, y, 1.0)
        dev = compute_convergence_information(
            dev_problem, qp_cache, jnp.asarray(x), jnp.asarray(y), 1.0
        )
        _assert_close(host, dev)


def test_host_infeasibility_matches_device():
    for problem in (example_lp(), example_qp()):
        n = problem.constraint_matrix.shape[1]
        m = problem.constraint_matrix.shape[0]
        rng = np.random.default_rng(1)
        x = rng.normal(size=n)
        y = rng.normal(size=m)
        dev_problem, _ = _device_original(problem)
        host = host_infeasibility_information(problem, x, y)
        dev = compute_infeasibility_information(
            dev_problem, jnp.asarray(x), jnp.asarray(y)
        )
        _assert_close(host, dev)


def test_host_optimality_met_at_optimum():
    problem = example_lp()
    x = np.array([1.0, 0.0, 6.0, 2.0])
    y = np.array([0.5, 4.0, 0.0])
    crit = terminate_on_iteration_limit(4)
    crit = dataclasses.replace(
        crit, eps_optimal_absolute=1e-8, eps_optimal_relative=1e-8
    )
    conv = host_convergence_information(problem, x, y, 1.0)
    assert host_optimality_met(crit, conv, host_qp_cache(problem))
    # and a clearly non-optimal point fails
    conv_bad = host_convergence_information(
        problem, x + 0.5, y, 1.0
    )
    assert not host_optimality_met(crit, conv_bad, host_qp_cache(problem))
