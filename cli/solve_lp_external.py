"""CLI baseline driver: solves an LP instance with an external solver
(HiGHS via scipy.optimize.linprog) under the SAME io/output contract as
solve_qp.py, so results aggregate through the same JSON->CSV pipeline.

Reference: scripts/solve_lp_external.jl (SCS/HiGHS through JuMP). This
environment has no SCS or JuMP; scipy bundles HiGHS (dual simplex and
interior point), which covers the reference's highs-simplex / highs-ipm
baselines. Like the reference (l.193-208), the external solution is
re-evaluated with OUR residual definitions on the FirstOrderLp problem so
baselines are apples-to-apples with the PDHG/Mirror Prox logs.

Writes `<instance>_summary.json`, `<instance>_primal.txt`,
`<instance>_dual.txt` into --output_dir.
"""

import argparse
import os
import re
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np
import scipy.sparse as sp


def parse_command_line():
    parser = argparse.ArgumentParser(
        description="Solve an LP with an external baseline solver "
        "(reference scripts/solve_lp_external.jl)."
    )
    parser.add_argument(
        "--solver",
        choices=["highs", "highs-simplex", "highs-ipm", "admm"],
        default="highs",
        help="scipy/HiGHS method, or 'admm': the built-in matrix-free "
        "OSQP-style ADMM+CG baseline (firstorderlp_tpu.baselines) "
        "standing in for the reference's scs-indirect rung (SCS itself "
        "is not installed in this environment).",
    )
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--instance_path", required=True)
    parser.add_argument("--tolerance", type=float, default=1e-8)
    parser.add_argument("--iteration_limit", type=int, default=None)
    parser.add_argument("--time_sec_limit", type=float, default=None)
    parser.add_argument(
        "--fixed_format_input",
        action="store_true",
        help="Read the instance as fixed-format MPS.",
    )
    return parser.parse_args()


_SCIPY_METHOD = {
    "highs": "highs",
    "highs-simplex": "highs-ds",
    "highs-ipm": "highs-ipm",
}


def solve_instance_and_output(args, command_line_invocation=""):
    import firstorderlp_tpu as folp
    from firstorderlp_tpu.solve_log import (
        PointType,
        SolveLog,
        TerminationReason,
        solve_log_to_json,
        termination_reason_to_string,
    )

    os.makedirs(args.output_dir, exist_ok=True)
    instance_name = re.sub(
        r"\.(mps|MPS|qps|QPS)(\.gz)?$",
        "",
        os.path.basename(args.instance_path),
    )

    lp = folp.qps_reader_to_standard_form(
        args.instance_path, fixed_format=args.fixed_format_input
    )
    presolve_info = folp.presolve(lp, verbosity=0, transform_bounds=False)
    if not folp.is_linear_programming_problem(lp):
        raise ValueError("solve_lp_external supports LPs only")

    # Standard form: A[:k] x = b[:k], A[k:] x >= b[k:], l <= x <= u.
    a = sp.csr_matrix(lp.constraint_matrix)
    k = lp.num_equalities
    n = lp.num_variables
    m = lp.num_constraints

    if args.solver == "admm":
        from firstorderlp_tpu.baselines import admm_solve

        res = admm_solve(
            lp,
            tolerance=args.tolerance,
            time_sec_limit=args.time_sec_limit,
            iteration_limit=args.iteration_limit or 10**7,
        )
        running_time = res.solve_time_sec
        reason = res.termination_reason
        primal = res.primal_solution
        dual = res.dual_solution
        iteration_count = res.iteration_count
        cumulative_kkt_passes = res.cumulative_kkt_passes
    else:
        a_eq, b_eq = a[:k], lp.right_hand_side[:k]
        a_ub = -a[k:]
        b_ub = -lp.right_hand_side[k:]
        bounds = list(
            zip(lp.variable_lower_bound, lp.variable_upper_bound)
        )

        from scipy.optimize import linprog

        options = {"presolve": True}
        if args.time_sec_limit is not None:
            options["time_limit"] = args.time_sec_limit
        if args.iteration_limit is not None:
            options["maxiter"] = args.iteration_limit

        t0 = time.time()
        result = linprog(
            c=lp.objective_vector,
            A_ub=a_ub if a_ub.shape[0] else None,
            b_ub=b_ub if len(b_ub) else None,
            A_eq=a_eq if a_eq.shape[0] else None,
            b_eq=b_eq if len(b_eq) else None,
            bounds=bounds,
            method=_SCIPY_METHOD[args.solver],
            options=options,
        )
        running_time = time.time() - t0

        status_to_reason = {
            0: TerminationReason.TERMINATION_REASON_OPTIMAL,
            1: TerminationReason.TERMINATION_REASON_ITERATION_LIMIT,
            2: TerminationReason.TERMINATION_REASON_PRIMAL_INFEASIBLE,
            3: TerminationReason.TERMINATION_REASON_DUAL_INFEASIBLE,
            4: TerminationReason.TERMINATION_REASON_NUMERICAL_ERROR,
        }
        reason = status_to_reason.get(
            result.status, TerminationReason.TERMINATION_REASON_OTHER
        )

        primal = (
            np.asarray(result.x) if result.x is not None else np.zeros(n)
        )
        # scipy duals: eqlin/ineqlin marginals are d(obj)/d(rhs) for the
        # scipy-form constraints. Our standard form wants y with
        # L = c'x - y'(Ax - b), so dV/db = +y on equality rows.
        # Inequalities are handed to scipy negated (A_ub = -A,
        # b_ub = -b), so dV/db = -dV/d(b_ub), i.e. y_ineq =
        # -ineqlin.marginals (and the <=-row marginals are <= 0, making
        # y_ineq >= 0 as required).
        dual = np.zeros(m)
        if getattr(result, "eqlin", None) is not None and k > 0:
            dual[:k] = np.asarray(result.eqlin.marginals)
        if getattr(result, "ineqlin", None) is not None and m - k > 0:
            dual[k:] = -np.asarray(result.ineqlin.marginals)
        iteration_count = int(getattr(result, "nit", 0) or 0)
        # KKT-pass estimate so baseline rows participate in KKT-budget
        # curves. The reference derives this only for SCS (ADMM iters x
        # (1 + avg CG iters), solve_lp_external.jl:171-184) and leaves
        # NaN for HiGHS. HiGHS exposes only `nit`; each simplex/IPM
        # iteration touches the constraint matrix at least once
        # (FTRAN/BTRAN or a residual evaluation), so we record the
        # documented lower bound of one KKT matrix pass per iteration.
        cumulative_kkt_passes = float(iteration_count)

    # Apples-to-apples residuals: evaluate OUR convergence information on
    # the unscaled problem with the external solution (reference l.193-208).
    import jax.numpy as jnp

    from firstorderlp_tpu.iteration_stats import (
        compute_convergence_information,
        compute_infeasibility_information,
        to_host_stats,
    )
    from firstorderlp_tpu.ops.device_problem import to_device_scaled
    from firstorderlp_tpu.preprocess import rescale_problem
    from firstorderlp_tpu.solve_log import RestartChoice

    scaled = rescale_problem(0, False, None, 0, lp)
    bundle = to_device_scaled(scaled, jnp.float64, "auto")
    conv = compute_convergence_information(
        bundle.original,
        bundle.qp_cache,
        jnp.asarray(primal),
        jnp.asarray(dual),
        # eps_abs == eps_rel == --tolerance, as in the reference driver
        # (solve_lp_external.jl builds criteria with one tolerance), so
        # the eps ratio for relative residuals is 1.
        1.0,
    )
    infeas = compute_infeasibility_information(
        bundle.original, jnp.asarray(primal), jnp.asarray(dual)
    )
    import jax

    stats = to_host_stats(
        jax.tree_util.tree_map(float, conv),
        jax.tree_util.tree_map(float, infeas),
        iteration_count,
        cumulative_kkt_passes,
        running_time,
        RestartChoice.RESTART_CHOICE_UNSPECIFIED,
        0.0,
        0.0,
        {},
        PointType.POINT_TYPE_AVERAGE_ITERATE,
    )
    log = SolveLog(
        instance_name=instance_name,
        command_line_invocation=command_line_invocation,
        termination_reason=reason,
        termination_string=termination_reason_to_string(reason),
        iteration_count=iteration_count,
        solve_time_sec=running_time,
        solution_stats=stats,
        solution_type=PointType.POINT_TYPE_AVERAGE_ITERATE,
    )
    with open(
        os.path.join(args.output_dir, instance_name + "_summary.json"), "w"
    ) as f:
        f.write(solve_log_to_json(log))

    primal_out, dual_out = folp.undo_presolve(presolve_info, primal, dual)
    np.savetxt(
        os.path.join(args.output_dir, instance_name + "_primal.txt"),
        primal_out,
    )
    np.savetxt(
        os.path.join(args.output_dir, instance_name + "_dual.txt"), dual_out
    )
    print(
        f"{instance_name}: {termination_reason_to_string(reason)} "
        f"obj={conv.primal_objective} time={running_time:.3f}s"
    )


def main():
    args = parse_command_line()
    solve_instance_and_output(args, " ".join(sys.argv))


if __name__ == "__main__":
    main()
