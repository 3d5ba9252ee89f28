"""Per-family certified-1e-8-on-device table (iterative refinement).

Runs optimize_iterative_refinement at eps=1e-8 over the whole synthetic
suite ON the chip and records, per instance: certified-or-fallback,
refinement rounds, time (warm, after a compile run), and the true f64
relative residuals of the returned point. Emits
benchmarking/results/refine_families.csv and a markdown table (the
docs/performance.md per-family table).

The 1e-8 bar is the reference's own correctness definition
(src/termination.jl:33-45); the all-f32 refinement path and its f64
certification are TPU-native machinery with no reference counterpart
(refine.py).

Usage: python benchmarking/refine_table.py [--instances a,b,c] [--cold]
"""

import argparse
import csv
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--instances", default=None,
                        help="comma-separated subset")
    parser.add_argument("--cold", action="store_true",
                        help="report first-run (compile-inclusive) time")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    import synthetic_suite
    from bench import make_params
    import dataclasses

    from firstorderlp_tpu import TerminationCriteria, TerminationReason
    from firstorderlp_tpu.models.pdhg import prepare_problem
    from firstorderlp_tpu.refine import (
        optimize_iterative_refinement,
        phase1_params,
    )

    suite = synthetic_suite.build_suite(seed=0)
    if args.instances:
        keep = set(args.instances.split(","))
        suite = {k: v for k, v in suite.items() if k in keep}

    rows = []
    for name, problem in suite.items():
        params = make_params(200_000, "float32", evals_per_dispatch=8)
        params = dataclasses.replace(
            params,
            termination_criteria=TerminationCriteria(
                eps_optimal_absolute=1e-8,
                eps_optimal_relative=1e-8,
                eps_primal_infeasible=1e-10,
                eps_dual_infeasible=1e-10,
                iteration_limit=200_000,
                kkt_matrix_pass_limit=float(np.inf),
            ),
        )
        nnz = problem.constraint_matrix.nnz
        is_qp = (
            problem.objective_matrix is not None
            and problem.objective_matrix.nnz > 0
        )
        prepared = prepare_problem(phase1_params(params), problem)
        t0 = time.time()
        out, fb = optimize_iterative_refinement(
            params, problem, prepared=prepared
        )
        cold_time = time.time() - t0
        if args.cold:
            solve_time = cold_time
        else:
            t0 = time.time()
            out, fb = optimize_iterative_refinement(
                params, problem, prepared=prepared
            )
            solve_time = time.time() - t0
        optimal = (
            out.termination_reason
            == TerminationReason.TERMINATION_REASON_OPTIMAL
        )
        ci = out.iteration_stats[-1].convergence_information[0]
        rel_max = max(
            ci.relative_l2_primal_residual,
            ci.relative_l2_dual_residual,
            abs(ci.relative_optimality_gap),
        )
        rounds = out.iteration_stats[-1].method_specific_stats.get(
            "refinement_rounds", float("nan")
        )
        rows.append(
            {
                "instance": name,
                "m": problem.num_constraints,
                "n": problem.num_variables,
                "nnz": nnz,
                "qp": int(is_qp),
                "status": out.termination_string,
                "certified_f32": int(optimal and not fb),
                "fallback_f64": int(fb),
                "rounds": rounds,
                "time_sec": round(solve_time, 3),
                "cold_time_sec": round(cold_time, 3),
                "max_rel_residual": float(rel_max),
                "iterations": out.iteration_count,
            }
        )
        print(
            f"# {name}: {out.termination_string} "
            f"{'f32-certified' if optimal and not fb else 'f64-fallback'} "
            f"rounds={rounds:.0f} {solve_time:.2f}s rel={rel_max:.1e}",
            file=sys.stderr,
            flush=True,
        )

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "results",
        "refine_families.csv",
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)

    n_cert = sum(r["certified_f32"] for r in rows)
    n_fb = sum(r["fallback_f64"] for r in rows)
    n_opt = sum(r["status"] == "OPTIMAL" for r in rows)
    print(
        json.dumps(
            {
                "instances": len(rows),
                "optimal_at_1e-8": n_opt,
                "f32_certified": n_cert,
                "f64_fallback": n_fb,
                "fallback_rate": round(n_fb / max(len(rows), 1), 3),
            }
        )
    )
    # markdown table for docs/performance.md
    print("\n| instance | size (m x n, nnz) | status | path | rounds "
          "| time (warm) | max rel residual |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        path = "f32-certified" if r["certified_f32"] else "f64 tail"
        print(
            f"| {r['instance']}{' (QP)' if r['qp'] else ''} "
            f"| {r['m']}x{r['n']}, {r['nnz']} | {r['status']} | {path} "
            f"| {r['rounds']:.0f} | {r['time_sec']:.2f}s "
            f"| {r['max_rel_residual']:.1e} |"
        )


if __name__ == "__main__":
    main()
