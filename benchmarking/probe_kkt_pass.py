"""Measures one KKT pass (A x then A' y) on the real RoutedOp.

Chains REPS passes inside one jitted lax.fori_loop and fetches a single
element, so the axon tunnel's ~30 ms scalar-fetch RTT amortizes across
the chain; the RTT itself is measured separately (null chain) and
subtracted. Usage: python benchmarking/probe_kkt_pass.py [nodes] [reps]
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

from firstorderlp_tpu.generators import generate_pagerank_lp  # noqa
from firstorderlp_tpu.ops.routed import build_routed_op  # noqa


def main():
    nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    b2 = int(sys.argv[3]) if len(sys.argv) > 3 else None
    hr = int(sys.argv[4]) if len(sys.argv) > 4 else None
    group_rows = int(sys.argv[5]) if len(sys.argv) > 5 else None

    problem = generate_pagerank_lp(num_nodes=nodes, seed=0)
    a = problem.constraint_matrix
    m, n = a.shape
    op = build_routed_op(a, group_rows=group_rows, b2=b2, hr=hr)
    print(f"# {m}x{n}, nnz={a.nnz}, geometry b2={op.b2} hr={op.hr} "
          f"cb={op.cb} rb={op.rb} group_rows={op.group_rows}",
          file=sys.stderr)

    x0 = jnp.asarray(np.random.default_rng(0).normal(size=n), jnp.float32)

    @jax.jit
    def chain(x, r):
        def body(_, x):
            y = op.mv(x)
            z = op.rmv(y)
            # keep the chain data-dependent so XLA cannot elide passes
            return z / (1.0 + jnp.float32(1e-30))

        return jax.lax.fori_loop(0, r, body, x)

    @jax.jit
    def null(x, r):
        return x

    def fetch(fn, r):
        out = fn(x0, r)
        return float(out[0])

    fetch(chain, 1)  # compile
    fetch(null, 1)

    def measure(fn, r, k=5):
        ts = []
        for _ in range(k):
            t0 = time.time()
            fetch(fn, r)
            ts.append(time.time() - t0)
        return min(ts)

    rtt = measure(null, 1)
    total = measure(chain, reps)
    per_pass = (total - rtt) / reps
    print(f"# rtt={rtt*1e3:.1f} ms, chain({reps})={total*1e3:.1f} ms")
    print(f"kkt_pass_ms={per_pass*1e3:.4f}  "
          f"({a.nnz / per_pass / 1e9:.2f} Gnnz/s, "
          f"{a.nnz * 2 * 4 / per_pass / 1e9:.1f} GB/s value-plane traffic)")


if __name__ == "__main__":
    main()
