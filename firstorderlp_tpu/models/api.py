"""Single `optimize` entry point dispatching on the parameter type
(mirrors the reference's multiple dispatch on optimize)."""

from __future__ import annotations

from ..problem import QuadraticProgrammingProblem
from ..saddle_point import SaddlePointOutput
from . import mirror_prox as _mirror_prox
from . import pdhg as _pdhg


def optimize(params, problem: QuadraticProgrammingProblem) -> SaddlePointOutput:
    if isinstance(params, _pdhg.PdhgParameters):
        return _pdhg.optimize(params, problem)
    if isinstance(params, _mirror_prox.MirrorProxParameters):
        return _mirror_prox.optimize(params, problem)
    raise TypeError(f"Unknown parameter type: {type(params)!r}")
