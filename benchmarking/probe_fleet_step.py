"""Times the full fleet segment step under parameter ablations to
locate the non-matvec cost (probe_fleet_breakdown.py measures the KKT
pass at 1.16 ms while the fleet solves at ~6 ms/step).

Usage: python benchmarking/probe_fleet_step.py [nodes] [batch]
"""

import dataclasses
import os
import sys
import time

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def run_case(label, params, spec):
    from firstorderlp_tpu.batch import (
        prepare_shared_pattern_fleet,
        solve_batch_shared_pattern,
    )

    fleet = prepare_shared_pattern_fleet(params, spec)
    solve_batch_shared_pattern(params, spec, fleet=fleet)  # warmup
    t0 = time.time()
    outs = solve_batch_shared_pattern(params, spec, fleet=fleet)
    dt = time.time() - t0
    iters = outs[0].iteration_count
    kkt = outs[0].iteration_stats[-1].cumulative_kkt_matrix_passes
    print(f"{label}: {dt:.2f}s, {iters} steps -> {dt/iters*1e3:.2f} "
          f"ms/step (kkt={kkt:.0f})", flush=True)


def main():
    nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    import bench

    from firstorderlp_tpu import ConstantStepsizeParams, RestartScheme
    from firstorderlp_tpu import construct_restart_parameters
    from firstorderlp_tpu.generators import pagerank_fleet_spec

    spec = pagerank_fleet_spec(
        nodes, np.linspace(0.7, 0.995, batch), seed=0
    )

    base = bench.make_params(600, "float32", fmt="ell")
    run_case("baseline (adaptive, eval=40)", base, spec)

    run_case(
        "eval_freq=600 (stats once)",
        dataclasses.replace(base, termination_evaluation_frequency=600),
        spec,
    )

    norestart = construct_restart_parameters(
        restart_scheme=RestartScheme.NO_RESTARTS,
        restart_to_current_metric=(
            base.restart_params.restart_to_current_metric
        ),
        restart_frequency_if_fixed=100,
        artificial_restart_threshold=0.5,
        sufficient_reduction_for_restart=0.1,
        necessary_reduction_for_restart=0.9,
        primal_weight_update_smoothing=0.5,
        use_approximate_localized_duality_gap=False,
    )
    run_case(
        "eval=40, NO_RESTARTS",
        dataclasses.replace(base, restart_params=norestart),
        spec,
    )

    run_case(
        "constant step (eval=40)",
        dataclasses.replace(
            base,
            step_size_policy_params=ConstantStepsizeParams(),
        ),
        spec,
    )

    run_case(
        "constant + eval=600 + norestart",
        dataclasses.replace(
            base,
            step_size_policy_params=ConstantStepsizeParams(),
            termination_evaluation_frequency=600,
            restart_params=norestart,
        ),
        spec,
    )


if __name__ == "__main__":
    main()
