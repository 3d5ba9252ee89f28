"""Breaks down the shared-pattern fleet iteration cost on real hardware.

Times, per fleet-step equivalent at batch B: the batched forward matvec
(A x over the minor lane axis), the batched KKT pass (A x then A' y),
and a representative elementwise update chain over (n, B)/(m, B) planes.
Chained fori_loop + single-element fetch, RTT-subtracted (same protocol
as probe_kkt_pass.py). Identifies whether the fleet is bound by the
gather-index rate of the ELL matvecs or by the update chain.

Usage: python benchmarking/probe_fleet_breakdown.py [nodes] [batch] [reps]
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
jax.config.update("jax_enable_x64", True)


def main():
    nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    sys.path.insert(0, REPO)
    import bench

    from firstorderlp_tpu.batch import prepare_shared_pattern_fleet
    from firstorderlp_tpu.generators import pagerank_fleet_spec

    params = bench.make_params(600, "float32", fmt="ell")
    spec = pagerank_fleet_spec(
        nodes, np.linspace(0.7, 0.995, batch), seed=0
    )
    nnz = spec.base_problem.constraint_matrix.nnz
    fleet = prepare_shared_pattern_fleet(params, spec)
    bundle_axes, _ = fleet.axes_box.trees()
    op = fleet.batched_bundle.scaled.constraint_matrix
    op_axes = bundle_axes.scaled.constraint_matrix
    m, n = op.shape
    print(f"# {m}x{n}, nnz={nnz}, B={batch}", file=sys.stderr)

    mvb = jax.vmap(lambda o, v: o.mv(v), in_axes=(op_axes, -1), out_axes=-1)
    rmvb = jax.vmap(
        lambda o, v: o.rmv(v), in_axes=(op_axes, -1), out_axes=-1
    )

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(n, batch)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(n, batch)), jnp.float32)
    lo = jnp.zeros((n, batch), jnp.float32)

    @jax.jit
    def chain_kkt(x, r):
        def body(_, x):
            y = mvb(op, x)
            z = rmvb(op, y)
            return z * (1.0 + jnp.float32(1e-30))

        return jax.lax.fori_loop(0, r, body, x)

    @jax.jit
    def chain_mv(x, r):
        def body(_, x):
            y = mvb(op, x)
            return x * (1.0 + jnp.float32(1e-30)) + jnp.float32(
                1e-30
            ) * y[:n]

        return jax.lax.fori_loop(0, r, body, x)

    @jax.jit
    def chain_elem(x, r):
        # ~the PDHG primal/dual update arithmetic per iteration:
        # 2x (clip + axpy chains) over (n,B) + movement reductions.
        def body(_, x):
            xp = jnp.clip(x - 0.1 * (c + x), lo, 1e20)
            dx = xp - x
            mov = jnp.sum(dx * dx, axis=0)
            return xp * (1.0 + jnp.float32(1e-30) * mov[None, :])

        return jax.lax.fori_loop(0, r, body, x)

    @jax.jit
    def null(x, r):
        return x

    def fetch(fn, r):
        return float(fn(x0, r)[0, 0])

    for fn in (chain_kkt, chain_mv, chain_elem, null):
        fetch(fn, 1)

    def measure(fn, r, k=5):
        ts = []
        for _ in range(k):
            t0 = time.time()
            fetch(fn, r)
            ts.append(time.time() - t0)
        return min(ts)

    rtt = measure(null, 1)
    t_kkt = (measure(chain_kkt, reps) - rtt) / reps
    t_mv = (measure(chain_mv, reps) - rtt) / reps
    t_elem = (measure(chain_elem, reps) - rtt) / reps
    print(f"# rtt={rtt*1e3:.1f} ms")
    print(f"fleet_kkt_pass_ms={t_kkt*1e3:.3f}  "
          f"({nnz * batch / t_kkt / 1e9:.2f} Gnnz-lane/s)")
    print(f"fleet_mv_ms={t_mv*1e3:.3f}")
    print(f"fleet_elem_chain_ms={t_elem*1e3:.3f}")


if __name__ == "__main__":
    main()
