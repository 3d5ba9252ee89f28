"""Component breakdown of one routed KKT pass (mv + rmv).

Times each stage with its own chained fori_loop (data-dependent
feedback so XLA cannot elide work) and an RTT-subtracted single fetch:
  expand        mv's expansion kernel alone
  expand+gather expansion + the E->R chunk gather
  mv            full A x
  rmv           full A' y
  kkt           mv then rmv (the number docs/performance.md quotes)

Usage: python benchmarking/probe_routed_breakdown.py [nodes] [reps]
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
    op = R.build_routed_op(a)
    ng_e = op.strip_e.shape[0]
    ng_r = op.meta_r.shape[0]
    print(
        f"# {m}x{n} nnz={a.nnz} b2={op.b2} hr={op.hr} cb={op.cb} "
        f"rb={op.rb} chunks_e={op.loc_e.shape[0]} groups_e={ng_e} "
        f"groups_r={ng_r}",
        file=sys.stderr,
    )

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=n), jnp.float32)
    y0 = jnp.asarray(rng.normal(size=m), jnp.float32)

    wc = 128 * op.b2
    shift = int(op.b2).bit_length() - 1

    def expand_only(x):
        with jax.enable_x64(False):
            xp = jnp.pad(x, (0, op.cb * wc - n))
            xs = xp.reshape(op.cb, 128, op.b2)
            ex = R._make_expand(
                ng_e, op.cb, op.b2, op.group_rows, shift, False
            )
            g = ex(op.strip_e, xs, op.loc_e)
        return g

    def feedback(g, x):
        # cheap data dependence: fold one value back into x
        return x + g.reshape(-1)[0] * jnp.float32(1e-30)

    stages = {
        "expand": lambda x: feedback(expand_only(x), x),
        "expand+gather": lambda x: feedback(
            R._chunk_gather(expand_only(x), op.chunk_src_r), x
        ),
        "mv": lambda x: x + op.mv(x)[0] * jnp.float32(1e-30),
        "rmv": lambda x: x + op.rmv(y0 + x[0] * jnp.float32(1e-30))[0]
        * jnp.float32(1e-30),
        "kkt": lambda x: x
        + op.rmv(op.mv(x))[0] * jnp.float32(1e-30),
    }

    # tile-aligned plan -> fused single-kernel matvecs
    opf = R.build_routed_op(a, tile_aligned=True)
    print(
        f"# fused plan: chunks_r {op.loc_r.shape[0]} -> "
        f"{opf.loc_r.shape[0]} (+{100.0 * (opf.loc_r.shape[0] / op.loc_r.shape[0] - 1):.0f}%)",
        file=sys.stderr,
    )
    stages["mv_fused"] = lambda x: x + opf.mv(x)[0] * jnp.float32(1e-30)
    stages["rmv_fused"] = (
        lambda x: x
        + opf.rmv(y0 + x[0] * jnp.float32(1e-30))[0] * jnp.float32(1e-30)
    )
    stages["kkt_fused"] = (
        lambda x: x + opf.rmv(opf.mv(x))[0] * jnp.float32(1e-30)
    )

    @jax.jit
    def null(x, r):
        return x

    def fetch(fn, r):
        return float(fn(x0, r)[0])

    def measure(fn, r, k=5):
        ts = []
        for _ in range(k):
            t0 = time.time()
            fetch(fn, r)
            ts.append(time.time() - t0)
        return min(ts)

    null_j = null
    fetch(null_j, 1)
    rtt = measure(null_j, 1)
    print(f"# rtt={rtt*1e3:.1f} ms", file=sys.stderr)

    for name, body in stages.items():
        @jax.jit
        def chain(x, r, body=body):
            return jax.lax.fori_loop(0, r, lambda _, xx: body(xx), x)

        fetch(chain, 1)  # compile
        total = measure(chain, reps)
        per = (total - rtt) / reps
        print(f"{name:>14}: {per*1e3:.4f} ms")


if __name__ == "__main__":
    main()
