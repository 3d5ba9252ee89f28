"""Solve-log schema: structured records of solution quality per iteration.

Field names and enum value names match the reference structs
(src/solve_log.jl) exactly, so the JSON emitted here is interchangeable
with the reference's JSON3 output and can be consumed by the same
aggregation pipeline (benchmarking/process_json_to_csv.jl field list).
"""

from __future__ import annotations

import dataclasses
import enum
import json
import math
from typing import Dict, List


class RestartChoice(enum.IntEnum):
    """Reference: src/solve_log.jl:32-37."""

    RESTART_CHOICE_UNSPECIFIED = 0
    RESTART_CHOICE_NO_RESTART = 1
    RESTART_CHOICE_WEIGHTED_AVERAGE_RESET = 2
    RESTART_CHOICE_RESTART_TO_AVERAGE = 3


class PointType(enum.IntEnum):
    """Reference: src/solve_log.jl:52-58."""

    POINT_TYPE_UNSPECIFIED = 0
    POINT_TYPE_CURRENT_ITERATE = 1
    POINT_TYPE_ITERATE_DIFFERENCE = 2
    POINT_TYPE_AVERAGE_ITERATE = 3
    POINT_TYPE_NONE = 4


class TerminationReason(enum.IntEnum):
    """Reference: src/solve_log.jl:336-347."""

    TERMINATION_REASON_UNSPECIFIED = 0
    TERMINATION_REASON_OPTIMAL = 1
    TERMINATION_REASON_PRIMAL_INFEASIBLE = 2
    TERMINATION_REASON_DUAL_INFEASIBLE = 3
    TERMINATION_REASON_TIME_LIMIT = 4
    TERMINATION_REASON_ITERATION_LIMIT = 5
    TERMINATION_REASON_KKT_MATRIX_PASS_LIMIT = 6
    TERMINATION_REASON_NUMERICAL_ERROR = 7
    TERMINATION_REASON_INVALID_PROBLEM = 8
    TERMINATION_REASON_OTHER = 9


def termination_reason_to_string(reason: TerminationReason) -> str:
    """Strips the TERMINATION_REASON_ prefix (reference termination.jl:275)."""
    return reason.name[len("TERMINATION_REASON_") :]


@dataclasses.dataclass
class ConvergenceInformation:
    """Reference: src/solve_log.jl:60-168 (same fields, same meanings)."""

    candidate_type: PointType = PointType.POINT_TYPE_UNSPECIFIED
    primal_objective: float = 0.0
    dual_objective: float = 0.0
    corrected_dual_objective: float = 0.0
    l_inf_primal_residual: float = 0.0
    l2_primal_residual: float = 0.0
    l_inf_dual_residual: float = 0.0
    l2_dual_residual: float = 0.0
    relative_l_inf_primal_residual: float = 0.0
    relative_l2_primal_residual: float = 0.0
    relative_l_inf_dual_residual: float = 0.0
    relative_l2_dual_residual: float = 0.0
    relative_optimality_gap: float = 0.0
    l_inf_primal_variable: float = 0.0
    l2_primal_variable: float = 0.0
    l_inf_dual_variable: float = 0.0
    l2_dual_variable: float = 0.0


@dataclasses.dataclass
class InfeasibilityInformation:
    """Reference: src/solve_log.jl:170-225."""

    candidate_type: PointType = PointType.POINT_TYPE_UNSPECIFIED
    max_primal_ray_infeasibility: float = 0.0
    primal_ray_linear_objective: float = 0.0
    primal_ray_quadratic_norm: float = 0.0
    max_dual_ray_infeasibility: float = 0.0
    dual_ray_objective: float = 0.0


@dataclasses.dataclass
class IterationStats:
    """Reference: src/solve_log.jl:227-315."""

    iteration_number: int = 0
    convergence_information: List[ConvergenceInformation] = dataclasses.field(
        default_factory=list
    )
    infeasibility_information: List[InfeasibilityInformation] = (
        dataclasses.field(default_factory=list)
    )
    cumulative_kkt_matrix_passes: float = 0.0
    cumulative_rejected_steps: int = 0
    cumulative_time_sec: float = 0.0
    restart_used: RestartChoice = RestartChoice.RESTART_CHOICE_UNSPECIFIED
    step_size: float = 0.0
    primal_weight: float = 0.0
    method_specific_stats: Dict[str, float] = dataclasses.field(
        default_factory=dict
    )


@dataclasses.dataclass
class SolveLog:
    """Reference: src/solve_log.jl:349-420."""

    instance_name: str = ""
    command_line_invocation: str = ""
    termination_reason: TerminationReason = (
        TerminationReason.TERMINATION_REASON_UNSPECIFIED
    )
    termination_string: str = ""
    iteration_count: int = 0
    solve_time_sec: float = 0.0
    solution_stats: IterationStats = dataclasses.field(
        default_factory=IterationStats
    )
    solution_type: PointType = PointType.POINT_TYPE_UNSPECIFIED
    iteration_stats: List[IterationStats] = dataclasses.field(
        default_factory=list
    )


def _jsonify(obj):
    """Converts the log dataclasses to JSON-compatible values, mirroring
    JSON3/StructTypes conventions: enums by name, non-finite floats as
    strings ("Inf"/"-Inf"/"NaN") since JSON has no literals for them."""
    if isinstance(obj, enum.IntEnum):
        return obj.name
    if dataclasses.is_dataclass(obj):
        return {
            f.name: _jsonify(getattr(obj, f.name))
            for f in dataclasses.fields(obj)
        }
    if isinstance(obj, dict):
        return {k: _jsonify(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonify(v) for v in obj]
    if isinstance(obj, float):
        if math.isnan(obj):
            return "NaN"
        if math.isinf(obj):
            return "Inf" if obj > 0 else "-Inf"
        return obj
    if hasattr(obj, "item"):  # numpy / jax scalars
        return _jsonify(obj.item())
    return obj


def solve_log_to_json(log: SolveLog, indent=None) -> str:
    return json.dumps(_jsonify(log), indent=indent)


_FLOAT_SENTINELS = {"Inf": math.inf, "-Inf": -math.inf, "NaN": math.nan}


def _parse_float(v):
    if isinstance(v, str) and v in _FLOAT_SENTINELS:
        return _FLOAT_SENTINELS[v]
    return float(v)


def solve_log_from_json(text: str) -> SolveLog:
    """Parses JSON produced by solve_log_to_json back into a SolveLog."""
    raw = json.loads(text)

    def conv(d):
        return ConvergenceInformation(
            candidate_type=PointType[d["candidate_type"]],
            **{
                k: _parse_float(d[k])
                for k in (
                    f.name
                    for f in dataclasses.fields(ConvergenceInformation)
                )
                if k != "candidate_type"
            },
        )

    def infeas(d):
        return InfeasibilityInformation(
            candidate_type=PointType[d["candidate_type"]],
            **{
                k: _parse_float(d[k])
                for k in (
                    f.name
                    for f in dataclasses.fields(InfeasibilityInformation)
                )
                if k != "candidate_type"
            },
        )

    def stats(d):
        return IterationStats(
            iteration_number=int(d["iteration_number"]),
            convergence_information=[
                conv(c) for c in d["convergence_information"]
            ],
            infeasibility_information=[
                infeas(c) for c in d["infeasibility_information"]
            ],
            cumulative_kkt_matrix_passes=_parse_float(
                d["cumulative_kkt_matrix_passes"]
            ),
            cumulative_rejected_steps=int(d["cumulative_rejected_steps"]),
            cumulative_time_sec=_parse_float(d["cumulative_time_sec"]),
            restart_used=RestartChoice[d["restart_used"]],
            step_size=_parse_float(d["step_size"]),
            primal_weight=_parse_float(d["primal_weight"]),
            method_specific_stats={
                k: _parse_float(v)
                for k, v in d["method_specific_stats"].items()
            },
        )

    return SolveLog(
        instance_name=raw["instance_name"],
        command_line_invocation=raw["command_line_invocation"],
        termination_reason=TerminationReason[raw["termination_reason"]],
        termination_string=raw["termination_string"],
        iteration_count=int(raw["iteration_count"]),
        solve_time_sec=_parse_float(raw["solve_time_sec"]),
        solution_stats=stats(raw["solution_stats"]),
        solution_type=PointType[raw["solution_type"]],
        iteration_stats=[stats(s) for s in raw["iteration_stats"]],
    )
