"""Multi-chip weak-scaling harness: sharded PDHG over an N-device mesh
with problem size proportional to N (efficiency target: >= 80% at N >= 2,
BASELINE.json).

On a machine without N real chips, run against a virtual CPU mesh:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python benchmarking/weak_scaling.py --devices 1 2 4 8
(virtual-device timings validate the sharding, not the speedup; on a real
pod slice the same script measures true scaling over ICI.)
"""

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4])
    parser.add_argument("--nodes_per_device", type=int, default=5000)
    parser.add_argument("--iterations", type=int, default=200)
    parser.add_argument("--dtype", default="float32")
    args = parser.parse_args()

    import jax

    from firstorderlp_tpu import (
        AdaptiveStepsizeParams,
        PdhgParameters,
        RestartScheme,
        RestartToCurrentMetric,
        TerminationCriteria,
        construct_restart_parameters,
    )
    from firstorderlp_tpu.generators import generate_pagerank_lp
    from firstorderlp_tpu.parallel import sharded_optimize, solver_mesh

    def params():
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
                iteration_limit=args.iterations,
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
            step_size_policy_params=AdaptiveStepsizeParams(0.3, 0.6),
            dtype=args.dtype,
            matrix_format="ell",
        )

    available = len(jax.devices())
    baseline_rate = None
    for n in args.devices:
        if n > available:
            print(f"N={n}: skipped ({available} devices available)")
            continue
        problem = generate_pagerank_lp(
            num_nodes=args.nodes_per_device * n, seed=0
        )
        mesh = solver_mesh(n, 1)
        t0 = time.time()
        out = sharded_optimize(params(), problem, mesh)  # warm + compile
        warm = time.time() - t0
        t0 = time.time()
        out = sharded_optimize(params(), problem, mesh)
        dt = time.time() - t0
        rate = out.iteration_count * problem.constraint_matrix.nnz / dt
        if baseline_rate is None:
            baseline_rate = rate / n
        eff = rate / (n * baseline_rate)
        print(
            f"N={n}: {out.iteration_count} iters on "
            f"{problem.num_variables} vars in {dt:.2f}s "
            f"(warm {warm:.1f}s) -> {rate/1e6:.1f} Mnnz-iters/s, "
            f"weak-scaling efficiency {eff:.2f}"
        )


if __name__ == "__main__":
    main()
