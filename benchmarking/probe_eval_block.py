"""Times the vmapped _eval_block and its components at fleet batch size.

The fleet ablations (probe_fleet_step.py) show the every-40-iterations
evaluation costs ~1.8 ms/step amortized (~77 ms per evaluation at
B=128) - more than the KKT pass itself. This probe splits that cost:
unscaled convergence stats, infeasibility certificates, the MAX_NORM
objective-bound estimate, and the restart scheme's two Euclidean
trust-region gap solves.

Usage: python benchmarking/probe_eval_block.py [nodes] [batch] [reps]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    import bench

    from firstorderlp_tpu.batch import prepare_shared_pattern_fleet
    from firstorderlp_tpu.generators import pagerank_fleet_spec
    from firstorderlp_tpu.models import pdhg as P
    from firstorderlp_tpu import saddle_point as SP
    from firstorderlp_tpu import iteration_stats as IS

    params = bench.make_params(600, "float32", fmt="ell")
    config = P._PdhgConfig(
        criteria=__import__(
            "firstorderlp_tpu.models.common", fromlist=["HashableCriteria"]
        ).HashableCriteria.from_criteria(params.termination_criteria),
        restart_params=params.restart_params,
        step_policy=params.step_size_policy_params,
        termination_evaluation_frequency=40,
    )
    spec = pagerank_fleet_spec(
        nodes, np.linspace(0.7, 0.995, batch), seed=0
    )
    fleet = prepare_shared_pattern_fleet(params, spec)
    bundle_axes, state_axes = fleet.axes_box.trees()
    bundle = fleet.batched_bundle
    state = fleet.initial_state

    elapsed = jnp.asarray(1.0, jnp.float64)

    def timed(label, fn, *args):
        jfn = jax.jit(fn)
        out = jfn(*args)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(
                x, "block_until_ready") else x, out)
        # fetch one scalar leaf to force through the tunnel
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf).reshape(-1)[0])
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = jfn(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(np.asarray(leaf).reshape(-1)[0])
            ts.append(time.time() - t0)
        print(f"{label}: {min(ts)*1e3:.1f} ms", flush=True)

    # full eval block
    def full_eval(b, s):
        return jax.vmap(
            lambda bb, ss: P._eval_block(bb, ss, elapsed, config),
            in_axes=(bundle_axes, state_axes),
            out_axes=(state_axes, 0),
        )(b, s)

    timed("eval_block(full)", full_eval, bundle, state)

    # restart scheme alone
    def restart_only(b, s):
        def one(bb, ss):
            pn = (1.0 / ss.step_size) * ss.primal_weight * jnp.ones_like(
                ss.current_primal_solution)
            dn = (1.0 / ss.step_size) / ss.primal_weight * jnp.ones_like(
                ss.current_dual_solution)
            return SP.run_restart_scheme(
                bb.scaled, ss.avg, ss.current_primal_solution,
                ss.current_dual_solution, ss.restart_info,
                ss.iteration - 1, pn, dn, ss.primal_weight,
                config.restart_params,
            )
        return jax.vmap(one, in_axes=(bundle_axes, state_axes),
                        out_axes=0)(b, s)

    timed("run_restart_scheme", restart_only, bundle, state)

    # objective bound estimate alone
    def bounds_only(b, s):
        def one(bb, ss):
            pn = (1.0 / ss.step_size) * ss.primal_weight * jnp.ones_like(
                ss.current_primal_solution)
            dn = (1.0 / ss.step_size) / ss.primal_weight * jnp.ones_like(
                ss.current_dual_solution)
            return SP.update_objective_bound_estimates(
                bb.scaled, ss.current_primal_solution,
                ss.current_dual_solution, pn, dn)
        return jax.vmap(one, in_axes=(bundle_axes, state_axes),
                        out_axes=0)(b, s)

    timed("update_objective_bound_estimates", bounds_only, bundle, state)

    # unscaled stats alone
    def stats_only(b, s):
        def one(bb, ss):
            return P.evaluate_unscaled_stats(
                bb, config.criteria.to_criteria(),
                ss.current_primal_solution, ss.current_dual_solution,
                ss.numerical_error, ss.iteration - 1,
                ss.cumulative_kkt_passes, elapsed,
            )
        return jax.vmap(one, in_axes=(bundle_axes, state_axes),
                        out_axes=0)(b, s)

    timed("evaluate_unscaled_stats", stats_only, bundle, state)


if __name__ == "__main__":
    main()
