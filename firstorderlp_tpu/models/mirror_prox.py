"""Saddle-point Mirror Prox (extragradient) solver. See pdhg.py for the
execution model. Reference semantics: src/mirror_prox.jl.

(Implementation lands after PDHG; parameters defined here already.)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from ..saddle_point import RestartParameters
from ..termination import TerminationCriteria


@dataclasses.dataclass
class MirrorProxParameters:
    """Reference: src/mirror_prox.jl:15-126."""

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


def optimize(params: MirrorProxParameters, original_problem):
    raise NotImplementedError("mirror prox lands next milestone")
