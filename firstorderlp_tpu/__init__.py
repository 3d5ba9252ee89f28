"""firstorderlp_tpu: a TPU-native first-order LP/QP solver framework in JAX.

A ground-up reimplementation of the capabilities of
google-research/FirstOrderLp.jl (PDHG/PDLP and Mirror Prox saddle-point
solvers for linear and quadratic programming), designed TPU-first:

- immutable pytree problem/state dataclasses instead of mutable structs,
- the solver hot loop compiled with jit + lax.while_loop (one host round
  trip per termination evaluation, i.e. every ~40 iterations),
- sparse constraint matrices stored in a padded, bucketed ELL layout that
  maps matvecs onto TPU vector/matrix units,
- sharding over a jax.sharding.Mesh for multi-chip solves and vmap for
  batched fleets of instances.

Reference semantics: /root/reference (FirstOrderLp.jl), cited per-module.
"""

import os as _os

import jax

# 1e-8 relative KKT tolerances require float64 accumulations; enable x64
# before any arrays are created (reference solves entirely in Float64).
jax.config.update("jax_enable_x64", True)

# Honor JAX_PLATFORMS even when a platform plugin (e.g. the axon TPU
# tunnel) would otherwise take precedence over the env var.
if _os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # backend already initialized; keep its choice.
        pass

from .problem import (  # noqa: E402
    QuadraticProgrammingProblem,
    ScaledQpProblem,
    linear_programming_problem,
    is_linear_programming_problem,
    validate,
)
from .io.mps import read_mps  # noqa: E402
from .io.standard_form import (  # noqa: E402
    TwoSidedQpProblem,
    transform_to_standard_form,
    two_sided_rows_to_slacks,
    qps_reader_to_standard_form,
)
from .preprocess import (  # noqa: E402
    presolve,
    undo_presolve,
    rescale_problem,
    ruiz_rescaling,
    pock_chambolle_rescaling,
    l2_norm_rescaling,
    scale_problem,
    unscale_problem,
)
from .termination import (  # noqa: E402
    TerminationCriteria,
    construct_termination_criteria,
    validate_termination_criteria,
    OptimalityNorm,
)
from .solve_log import (  # noqa: E402
    TerminationReason,
    RestartChoice,
    PointType,
    SolveLog,
)
from .saddle_point import (  # noqa: E402
    RestartScheme,
    RestartToCurrentMetric,
    RestartParameters,
    construct_restart_parameters,
    SaddlePointOutput,
)
from .models.pdhg import (  # noqa: E402
    PdhgParameters,
    AdaptiveStepsizeParams,
    MalitskyPockStepsizeParameters,
    ConstantStepsizeParams,
)
from .models.mirror_prox import MirrorProxParameters  # noqa: E402
from .models.api import optimize  # noqa: E402

from .refine import optimize_iterative_refinement, optimize_split_precision

__all__ = [
    "QuadraticProgrammingProblem",
    "ScaledQpProblem",
    "linear_programming_problem",
    "is_linear_programming_problem",
    "validate",
    "read_mps",
    "TwoSidedQpProblem",
    "transform_to_standard_form",
    "two_sided_rows_to_slacks",
    "qps_reader_to_standard_form",
    "presolve",
    "undo_presolve",
    "rescale_problem",
    "ruiz_rescaling",
    "pock_chambolle_rescaling",
    "l2_norm_rescaling",
    "scale_problem",
    "unscale_problem",
    "TerminationCriteria",
    "construct_termination_criteria",
    "validate_termination_criteria",
    "OptimalityNorm",
    "TerminationReason",
    "RestartChoice",
    "PointType",
    "SolveLog",
    "RestartScheme",
    "RestartToCurrentMetric",
    "RestartParameters",
    "construct_restart_parameters",
    "SaddlePointOutput",
    "PdhgParameters",
    "AdaptiveStepsizeParams",
    "MalitskyPockStepsizeParameters",
    "ConstantStepsizeParams",
    "MirrorProxParameters",
    "optimize",
    "optimize_split_precision",
    "optimize_iterative_refinement",
]

__version__ = "0.1.0"
