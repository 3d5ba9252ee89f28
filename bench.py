"""Headline benchmark: PDHG (PDLP) iterations/s/chip on a PageRank LP.

Matches BASELINE.json's metric ("PDHG iterations/s/chip + KKT passes/s")
on the configured benchmark family (PageRank LP from the Nesterov 2014
formulation on a Barabasi-Albert graph - benchmarking/
generate_pagerank_lp.jl in the reference).

Protocol: build the LP, run one full PDLP solve to warm the jit cache,
then time a second identical solve with a fixed iteration budget and
report iterations/second. KKT passes/s tracks the same number (1 KKT pass
per accepted adaptive step + evaluation overhead).

vs_baseline: the reference is single-threaded Julia whose per-iteration
cost is two sparse matvec passes over A at roughly 2.5e8 nnz/s for CSC
float64 on one CPU core (PDLP papers run 1 thread/instance; see
BASELINE.md). baseline_iters_per_sec = 2.5e8 / (2 * nnz(A)).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    num_nodes = int(os.environ.get("BENCH_NODES", 100_000))
    iteration_limit = int(os.environ.get("BENCH_ITERS", 2000))
    # float32 by default: TPU has no native f64 (XLA emulates it ~100x
    # slower). The 1e-8-tolerance CPU/f64 path is exercised by tests; the
    # headline throughput metric is the fp32 hot loop.
    dtype = os.environ.get("BENCH_DTYPE", "float32")

    # Persistent compilation cache: first-ever bench run pays the XLA
    # compile (minutes over the axon tunnel), later runs reuse it.
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from firstorderlp_tpu import (
        AdaptiveStepsizeParams,
        PdhgParameters,
        RestartScheme,
        RestartToCurrentMetric,
        TerminationCriteria,
        construct_restart_parameters,
    )
    from firstorderlp_tpu.generators import generate_pagerank_lp
    from firstorderlp_tpu.models.pdhg import optimize

    t0 = time.time()
    problem = generate_pagerank_lp(
        num_nodes=num_nodes, approx_num_edges=3 * num_nodes, seed=0
    )
    nnz = problem.constraint_matrix.nnz
    print(
        f"# pagerank LP: {problem.num_variables} vars, "
        f"{problem.num_constraints} cons, {nnz} nnz "
        f"(generated in {time.time()-t0:.1f}s)",
        file=sys.stderr,
    )

    def make_params(limit):
        return PdhgParameters(
            l_inf_ruiz_iterations=10,
            l2_norm_rescaling=False,
            pock_chambolle_alpha=1.0,
            primal_importance=1.0,
            scale_invariant_initial_primal_weight=True,
            verbosity=0,
            record_iteration_stats=False,
            termination_evaluation_frequency=40,
            termination_criteria=TerminationCriteria(
                eps_optimal_absolute=0.0,
                eps_optimal_relative=0.0,
                eps_primal_infeasible=0.0,
                eps_dual_infeasible=0.0,
                iteration_limit=limit,
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
            dtype=dtype,
            # Amortize host<->device round trips: ~50 evaluations (2000
            # iterations at frequency 40) per dispatch.
            evaluations_per_dispatch=64,
        )

    # Warmup solve (compiles the segment); identical static config so the
    # timed solve reuses the jit cache.
    t0 = time.time()
    warm = optimize(make_params(iteration_limit), problem)
    warm_time = time.time() - t0
    print(f"# warmup solve (incl. compile): {warm_time:.1f}s", file=sys.stderr)

    t0 = time.time()
    output = optimize(make_params(iteration_limit), problem)
    solve_time = time.time() - t0
    iterations = output.iteration_count
    final = output.iteration_stats[-1]
    kkt_passes = final.cumulative_kkt_matrix_passes
    conv = final.convergence_information[0]
    print(
        f"# timed solve: {solve_time:.2f}s, {iterations} iterations, "
        f"{kkt_passes:.0f} KKT passes, l2_primal_res="
        f"{conv.l2_primal_residual:.2e}",
        file=sys.stderr,
    )

    iters_per_sec = iterations / solve_time
    baseline_iters_per_sec = 2.5e8 / (2.0 * nnz)
    print(
        json.dumps(
            {
                "metric": "pdhg_iterations_per_sec_chip_pagerank100k",
                "value": round(iters_per_sec, 2),
                "unit": "iterations/s",
                "vs_baseline": round(
                    iters_per_sec / baseline_iters_per_sec, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
