"""Process-wide XLA compile-time accounting.

JAX reports per-compilation durations through jax.monitoring; this
module accumulates them so drivers can attribute wall-clock to
"XLA compile" vs "actual work" per phase (benchmark protocols must
report the split - an unamortized compile silently absorbed into an
ingest or solve number misstates both; round-3 BENCH artifact lesson).

No reference counterpart (the reference is interpreted Julia; its
closest analogue is @elapsed around the whole solve,
scripts/solve_qp.jl:109).
"""

from __future__ import annotations

import threading

_LOCK = threading.Lock()
_TOTALS = {"backend_compile": 0.0, "trace_and_lower": 0.0}
_INSTALLED = False

_BACKEND_EVENTS = ("/jax/core/compile/backend_compile_duration",)
_FRONTEND_EVENTS = (
    "/jax/core/compile/jaxpr_trace_duration",
    "/jax/core/compile/jaxpr_to_mlir_module_duration",
)


def _listener(event: str, duration: float, **_kwargs) -> None:
    if event in _BACKEND_EVENTS:
        key = "backend_compile"
    elif event in _FRONTEND_EVENTS:
        key = "trace_and_lower"
    else:
        return
    with _LOCK:
        _TOTALS[key] += duration


def install() -> None:
    """Registers the duration listener (idempotent)."""
    global _INSTALLED
    with _LOCK:
        if _INSTALLED:
            return
        _INSTALLED = True
    from jax._src import monitoring

    monitoring.register_event_duration_secs_listener(_listener)


def compile_seconds() -> float:
    """Total XLA compile seconds so far (backend compile + trace/lower).

    Cache hits (persistent compilation cache) skip backend_compile, so
    warm runs report only the cheap trace/lower component."""
    with _LOCK:
        return _TOTALS["backend_compile"] + _TOTALS["trace_and_lower"]


def backend_compile_seconds() -> float:
    """Backend (true XLA) compile seconds only - zero on persistent
    cache hits, unlike the trace/lower component every process pays
    once per distinct program regardless of the cache."""
    with _LOCK:
        return _TOTALS["backend_compile"]


class CompileWindow:
    """Context manager measuring compile seconds inside a phase."""

    def __enter__(self):
        install()
        self._start = compile_seconds()
        self._start_backend = backend_compile_seconds()
        return self

    def __exit__(self, *exc):
        self.seconds = compile_seconds() - self._start
        self.backend_seconds = (
            backend_compile_seconds() - self._start_backend
        )
        return False
