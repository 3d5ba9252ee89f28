"""Strip-geometry sweep for the routed KKT pass.

The one-hot matmul FLOPs scale linearly with b2 (expand side) and hr
(reduce side) while the per-entry VPU passes (iota compares) are
geometry-independent, so after the bf16-split optimizations the optimal
strips may be narrower than the round-2 default (32x32). Chained
fori_loop timing, RTT-subtracted (see probe_kkt_pass.py).

Usage: python benchmarking/probe_geometry.py [nodes] [reps]
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
from firstorderlp_tpu.ops import routed as R  # noqa


def main():
    nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 400

    problem = generate_pagerank_lp(num_nodes=nodes, seed=0)
    a = problem.constraint_matrix
    m, n = a.shape
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=n), jnp.float32)

    @jax.jit
    def null(x, r):
        return x

    def measure(fn, r, k=5):
        ts = []
        for _ in range(k):
            t0 = time.time()
            float(fn(x0, r)[0])
            ts.append(time.time() - t0)
        return min(ts)

    null(x0, 1)
    rtt = measure(null, 1)
    print(f"# rtt={rtt*1e3:.1f} ms", file=sys.stderr)

    import json
    cfgs = json.loads(os.environ.get(
        "PROBE_CFGS",
        "[[32,32,32],[16,16,32],[16,32,32],[32,16,32],[8,8,32],"
        "[64,64,32],[32,32,16],[32,32,64],[32,32,128],[16,32,64]]"))
    for b2, hr, gr in cfgs:
        try:
            op = R.build_routed_op(a, group_rows=gr, b2=b2, hr=hr)
        except Exception as e:  # geometry invalid for this size
            print(f"b2={b2:3d} hr={hr:3d} gr={gr:3d}: build failed: {e}")
            continue

        def kkt(x, op=op):
            return x + op.rmv(op.mv(x))[0] * jnp.float32(1e-30)

        @jax.jit
        def chain(x, r, kkt=kkt):
            return jax.lax.fori_loop(0, r, lambda i, xx: kkt(xx), x)

        float(chain(x0, 1)[0])  # compile
        t = (measure(chain, reps) - rtt) / reps
        print(
            f"b2={b2:3d} hr={hr:3d} gr={gr:3d} "
            f"chunks={op.loc_e.shape[0]:6d} "
            f"groups={op.strip_e.shape[0]:4d}: kkt {t*1e3:.4f} ms"
        )


if __name__ == "__main__":
    main()
