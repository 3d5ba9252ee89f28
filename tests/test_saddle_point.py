"""Saddle-point runtime units (reference test/test_saddle_point.jl)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from firstorderlp_tpu.ops.device_problem import to_device
from firstorderlp_tpu.saddle_point import (
    compute_lagrangian_value,
    select_initial_primal_weight,
)

from fixtures import example_lp, example_qp


def test_select_initial_primal_weight():
    lp1 = example_lp()
    dev = to_device(lp1)
    ones_n = jnp.ones(lp1.num_variables)
    ones_m = jnp.ones(lp1.num_constraints)
    importance = 1.3
    w = float(select_initial_primal_weight(dev, ones_n, ones_m, importance))
    expected = (
        importance
        * np.linalg.norm(np.asarray(lp1.objective_vector))
        / np.linalg.norm(np.asarray(lp1.right_hand_side))
    )
    assert np.isclose(w, expected)

    # Zero objective -> primal_importance (reference lp2).
    lp2 = dataclasses.replace(
        lp1, objective_vector=np.zeros(lp1.num_variables)
    )
    w2 = float(
        select_initial_primal_weight(to_device(lp2), ones_n, ones_m,
                                     importance)
    )
    assert w2 == importance

    # Zero rhs -> primal_importance (reference lp3).
    lp3 = dataclasses.replace(
        lp1, right_hand_side=np.zeros(lp1.num_constraints)
    )
    w3 = float(
        select_initial_primal_weight(to_device(lp3), ones_n, ones_m,
                                     importance)
    )
    assert w3 == importance


def test_compute_lagrangian_value():
    lp = to_device(example_lp())
    assert float(
        compute_lagrangian_value(lp, jnp.zeros(4), jnp.zeros(3))
    ) == -14.0

    qp = to_device(example_qp())
    assert float(
        compute_lagrangian_value(qp, jnp.asarray([1.0, 1.0]),
                                 jnp.asarray([0.0]))
    ) == 0.5
    assert float(
        compute_lagrangian_value(qp, jnp.asarray([1.0, 1.0]),
                                 jnp.asarray([1.0]))
    ) == 1.5
    assert float(
        compute_lagrangian_value(qp, jnp.asarray([0.25, 0.0]),
                                 jnp.asarray([0.0]))
    ) == -0.125
