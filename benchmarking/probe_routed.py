"""On-chip microbenchmarks for the routed-SpMV kernel design.

Measures (fetch-based timing; block_until_ready does not await the axon
tunnel):
  1. kernelE prototype: two-level one-hot expansion per 1024-entry group.
  2. kernelR prototype: one-hot scatter-matmul reduction w/ revisited out.
  3. XLA chunk gather: 128-wide slices, nnz/128 indices.
  4. f64 emulation sanity: dense matvec + elementwise on TPU.

Usage: python benchmarking/probe_routed.py [nnz]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NNZ = int(sys.argv[1]) if len(sys.argv) > 1 else 819_200  # 800k
H = 32  # col-strip = H*128 = 4096 wide
HR = 32
REPS = 50


def timed(fn, *args, reps=REPS):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: np.asarray(a[..., :1]), out)  # warm
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    # fetch one element to force completion of the chain
    jax.tree_util.tree_map(lambda a: np.asarray(a[..., :1]), out)
    return (time.time() - t0) / reps


# --- kernel E prototype -----------------------------------------------


def _expand_kernel(strip_ref, xs_ref, hi_ref, lo_ref, g_ref):
    del strip_ref
    xw = xs_ref[0]  # (H, 128)
    for j in range(8):
        hi = hi_ref[j : j + 1, :]  # (1,128)
        lo = lo_ref[j : j + 1, :]
        o_hi = (
            jax.lax.broadcasted_iota(jnp.int32, (H, 128), 0) == hi
        ).astype(jnp.float32)
        c_t = jax.lax.dot_general(
            xw,
            o_hi,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (128,128): c_t[:, k] = xw[hi_k, :]... wait c_t[j2,k]
        o_lo = (
            jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0) == lo
        ).astype(jnp.float32)
        g_ref[j, :] = jnp.sum(c_t * o_lo, axis=0)


def make_expand(ngroups, n_strips):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ngroups,),
        in_specs=[
            pl.BlockSpec(
                (1, H, 128),
                lambda i, s: (s[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((8, 128), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, 128), lambda i, s: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    kernel = pl.pallas_call(
        _expand_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ngroups * 8, 128), jnp.float32),
    )

    @jax.jit
    def run(strip_ids, x_strips, hi, lo):
        return kernel(strip_ids, x_strips, hi, lo)

    return run


# --- kernel R prototype -----------------------------------------------


def _reduce_kernel(meta_ref, g_ref, v_ref, hi_ref, lo_ref, y_ref):
    i = pl.program_id(0)
    first = meta_ref[i, 1]

    @pl.when(first == 1)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    acc = jnp.zeros((HR, 128), jnp.float32)
    for j in range(8):
        p = g_ref[j : j + 1, :] * v_ref[j : j + 1, :]  # (1,128)
        hi = hi_ref[j : j + 1, :]
        lo = lo_ref[j : j + 1, :]
        o_lo = (
            jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0) == lo
        ).astype(jnp.float32)
        m = o_lo * p  # (128 lanes j2, 128 entries k)
        o_hi = (
            jax.lax.broadcasted_iota(jnp.int32, (HR, 128), 0) == hi
        ).astype(jnp.float32)
        acc = acc + jax.lax.dot_general(
            o_hi,
            m,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (HR, 128)
    y_ref[0] = y_ref[0] + acc


def make_reduce(ngroups, n_strips):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ngroups,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, HR, 128), lambda i, s: (s[i, 0], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = pl.pallas_call(
        _reduce_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_strips, HR, 128), jnp.float32),
    )

    @jax.jit
    def run(meta, g, v, hi, lo):
        return kernel(meta, g, v, hi, lo)

    return run


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    rng = np.random.default_rng(0)
    nnz = (NNZ // 1024) * 1024
    ngroups = nnz // 1024
    n_strips = 8
    print(f"nnz={nnz} groups={ngroups} strips={n_strips} H={H}")

    with jax.enable_x64(False):
        # kernel E
        strip_ids = jnp.asarray(
            np.sort(rng.integers(0, n_strips, ngroups)).astype(np.int32)
        )
        x_strips = jnp.asarray(
            rng.normal(size=(n_strips, H, 128)).astype(np.float32)
        )
        hi = jnp.asarray(
            rng.integers(0, H, (ngroups * 8, 128)).astype(np.int32)
        )
        lo = jnp.asarray(
            rng.integers(0, 128, (ngroups * 8, 128)).astype(np.int32)
        )
        run_e = make_expand(ngroups, n_strips)
        t = timed(run_e, strip_ids, x_strips, hi, lo)
        print(f"kernelE: {t*1e3:.3f} ms/matvec-expand "
              f"({nnz/t/1e9:.2f} Gentry/s)")
        # correctness spot check
        g = np.asarray(run_e(strip_ids, x_strips, hi, lo))
        xs = np.asarray(x_strips)
        hi_h, lo_h = np.asarray(hi), np.asarray(lo)
        sid = np.repeat(np.asarray(strip_ids), 8)
        want = xs[sid[:, None], hi_h, lo_h]
        err = np.max(np.abs(g - want))
        print(f"kernelE max abs err vs numpy: {err:.2e}")

        # chunk gather
        nchunks = nnz // 128
        g2 = jnp.asarray(rng.normal(size=(nchunks, 128)).astype(np.float32))
        src = jnp.asarray(rng.permutation(nchunks).astype(np.int32))

        @jax.jit
        def chunk_gather(g2, src):
            return jnp.take(g2, src, axis=0)

        t = timed(chunk_gather, g2, src)
        print(f"chunk gather: {t*1e3:.3f} ms ({nchunks} idx)")

        # kernel R
        meta = np.zeros((ngroups, 2), np.int32)
        out_strip = np.sort(rng.integers(0, n_strips, ngroups))
        meta[:, 0] = out_strip
        meta[0, 1] = 1
        meta[1:, 1] = (out_strip[1:] != out_strip[:-1]).astype(np.int32)
        meta = jnp.asarray(meta)
        v = jnp.asarray(
            rng.normal(size=(ngroups * 8, 128)).astype(np.float32)
        )
        hir = jnp.asarray(
            rng.integers(0, HR, (ngroups * 8, 128)).astype(np.int32)
        )
        lor = jnp.asarray(
            rng.integers(0, 128, (ngroups * 8, 128)).astype(np.int32)
        )
        run_r = make_reduce(ngroups, n_strips)
        t = timed(run_r, meta, g2.reshape(ngroups * 8, 128), v, hir, lor)
        print(f"kernelR: {t*1e3:.3f} ms/matvec-reduce "
              f"({nnz/t/1e9:.2f} Gentry/s)")
        y = np.asarray(
            run_r(meta, g2.reshape(ngroups * 8, 128), v, hir, lor)
        )
        p = np.asarray(g2).reshape(ngroups * 8, 128) * np.asarray(v)
        want_y = np.zeros((n_strips, HR, 128), np.float32)
        os_h = np.repeat(out_strip, 8)
        np.add.at(
            want_y,
            (os_h[:, None], np.asarray(hir), np.asarray(lor)),
            p,
        )
        err = np.max(np.abs(y - want_y)) / (np.max(np.abs(want_y)) + 1)
        print(f"kernelR max rel err vs numpy: {err:.2e}")

    # f64 emulation sanity
    with jax.enable_x64(True):
        a64 = jnp.asarray(rng.normal(size=(2048, 2048)))
        x64 = jnp.asarray(rng.normal(size=(2048,)))

        @jax.jit
        def mv64(a, x):
            return a @ x

        try:
            t = timed(mv64, a64, x64, reps=10)
            print(f"f64 dense matvec 2048^2: {t*1e3:.3f} ms")
        except Exception as e:
            print(f"f64 dense matvec FAILED: {type(e).__name__}: {e}")

        @jax.jit
        def ew64(x):
            return jnp.sum(x * 1.000001 + 0.5)

        big64 = jnp.asarray(rng.normal(size=(1_000_000,)))
        try:
            t = timed(ew64, big64, reps=10)
            print(f"f64 elementwise 1M: {t*1e3:.3f} ms")
        except Exception as e:
            print(f"f64 elementwise FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
