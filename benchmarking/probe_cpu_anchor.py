"""Measured-vs-measured CPU anchor for the flagship metric.

The bench's vs_baseline model (2.5e8 nnz/s per CPU core, two matvec
passes per iteration) is a matvec-rate estimate; round-3's verdict
asked for the honest anchor: run the SAME algorithm (jax-CPU, f64,
identical code path and criteria) end to end on one core and record
wall-clock + iterations, so the 100k/500k vs_baseline rows are
measured-vs-measured instead of measured-vs-model.

Pin to one core to match the reference protocol (1 thread/instance,
PDLP papers):  taskset -c 0 JAX_PLATFORMS=cpu \
    python benchmarking/probe_cpu_anchor.py [nodes ...]

Prints one line per size: nodes, nnz, iterations, KKT passes, wall
seconds (excluding ingest + compile warmup, matching bench.py's solve
timing), it/s.
"""

import dataclasses
import os
import sys
import time

# Force, don't setdefault: axon hosts export JAX_PLATFORMS=axon, and a
# setdefault silently leaves the probe attached to the TPU tunnel
# (observed: the f64 compile then stalls in the remote-compile path).
os.environ["JAX_PLATFORMS"] = "cpu"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache_cpu")
)

import numpy as np  # noqa: E402


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [100_000]
    import bench

    from firstorderlp_tpu import TerminationCriteria
    from firstorderlp_tpu.generators import generate_pagerank_lp
    from firstorderlp_tpu.models.pdhg import optimize, prepare_problem

    for nodes in sizes:
        problem = generate_pagerank_lp(num_nodes=nodes, seed=0)
        nnz = problem.constraint_matrix.nnz
        params = bench.make_params(10**9, "float64", fmt="auto")
        params = dataclasses.replace(
            params,
            termination_criteria=TerminationCriteria(
                eps_optimal_absolute=1e-8,
                eps_optimal_relative=1e-8,
                eps_primal_infeasible=1e-10,
                eps_dual_infeasible=1e-10,
                iteration_limit=200_000,
                kkt_matrix_pass_limit=float(np.inf),
                time_sec_limit=3600.0,
            ),
        )
        t0 = time.time()
        prepared = prepare_problem(params, problem)
        t_ingest = time.time() - t0
        # one warmup segment is impractical on CPU (it would solve);
        # instead report the total and the compile-inclusive wall -
        # CPU compiles are seconds, not the tunnel's minutes.
        t0 = time.time()
        out = optimize(params, problem, prepared=prepared)
        wall = time.time() - t0
        last = out.iteration_stats[-1]
        ci = last.convergence_information[0]
        print(
            f"nodes={nodes} nnz={nnz} {out.termination_string} "
            f"iters={out.iteration_count} "
            f"kkt={last.cumulative_kkt_matrix_passes:.0f} "
            f"ingest={t_ingest:.1f}s wall={wall:.1f}s "
            f"it/s={out.iteration_count / wall:.1f} "
            f"rel: p={ci.relative_l2_primal_residual:.1e} "
            f"d={ci.relative_l2_dual_residual:.1e} "
            f"gap={ci.relative_optimality_gap:.1e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
