"""Probe: can int8 one-hot dot_general beat the 3x-bf16 scatter split?

Context (docs/performance.md "utilization"): the routed kernels' MXU
work is one-hot-matmul scatter/gather; the current exact scheme is a
3-term bf16 split of the DATA side against exact 0/1 bf16 one-hots
(ops/routed.py:_scatter_matmul) - ~27% MXU on its own arithmetic. v5e
runs int8 x int8 -> int32 at 2x the bf16 MXU rate (394 vs 197 TOPS),
so an int8 path wins only if it needs < 6 passes and its
quantize/build overhead stays off the critical path.

The catch: bf16 splitting is EXACT per element (each term carries its
own exponent); int8 limbs need a SHARED scale per block, so exactness
requires per-block max-abs scaling plus 3 limbs for 24 mantissa bits -
and the limb build (scale, round, subtract) is VPU work of the same
order as the iota-compares the one-hot build already pays.

Methodology (the first version of this probe was void): on the
tunneled backend only value FETCHES are real, and a single fetch costs
~25-30 ms RTT - at 1000 reps that is 28 us/rep of pure RTT, larger
than every kernel being measured. This version (a) measures the
empty-loop floor (RTT + per-iteration XLA while overhead) and
subtracts it, (b) runs 20k reps so the floor is < 1.5 us/rep, and
(c) defeats XLA loop-invariant code motion by perturbing the index
planes with a compile-opaque scalar (`where(i < 0, ...)`), since
hoisted one-hot builds measure as free.

Usage: python benchmarking/probe_int8_onehot.py  (real TPU)
Prints one line per variant: us per group-op (floor-subtracted) + max
rel error vs an f64 host reference.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

HR = 32  # one-hot row pages (hr)
K = 4096  # group width: group_rows * 128
REPS = 20_000

DN = (((1,), (1,)), ((), ()))


def _onehots(lo, hi, dt):
    o_lo = (lax.broadcasted_iota(jnp.int32, (128, K), 0) == lo).astype(dt)
    o_hi = (lax.broadcasted_iota(jnp.int32, (HR, K), 0) == hi).astype(dt)
    return o_lo, o_hi


def bf16_3pass(p, lo, hi):
    o_lo, o_hi = _onehots(lo, hi, jnp.bfloat16)
    p_hi = p.astype(jnp.bfloat16)
    r1 = p - p_hi.astype(jnp.float32)
    p_mid = r1.astype(jnp.bfloat16)
    p_lo = (r1 - p_mid.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = lax.dot_general(
        o_hi * p_hi, o_lo, DN, preferred_element_type=jnp.float32
    )
    acc += lax.dot_general(
        o_hi * p_mid, o_lo, DN, preferred_element_type=jnp.float32
    )
    return acc + lax.dot_general(
        o_hi * p_lo, o_lo, DN, preferred_element_type=jnp.float32
    )


def int8_limbs(p, lo, hi, nlimbs):
    """Shared-scale int8 limb decomposition: p ~ scale * sum_l q_l *
    2^(-7l), q_l int8 in [-127, 127]; one-hots exact 0/1 int8; each
    dot int8 x int8 -> int32 (exact); recombined in f32."""
    o_lo, o_hi = _onehots(lo, hi, jnp.int8)
    scale = jnp.max(jnp.abs(p)) / 127.0
    scale = jnp.where(scale > 0, scale, 1.0)
    acc = jnp.zeros((HR, 128), jnp.float32)
    resid = p
    for _ in range(nlimbs):
        q = jnp.clip(jnp.round(resid / scale), -127, 127)
        resid = resid - q * scale
        qi = q.astype(jnp.int8)
        part = lax.dot_general(
            o_hi * qi, o_lo, DN, preferred_element_type=jnp.int32
        )
        acc = acc + part.astype(jnp.float32) * scale
        scale = scale / 128.0
    return acc


def onehot_build_only(p, lo, hi, dt):
    o_lo, o_hi = _onehots(lo, hi, dt)
    # touch both so the build isn't dead-code-eliminated
    return (
        jnp.zeros((HR, 128), jnp.float32)
        + o_lo.astype(jnp.float32).sum()
        + o_hi.astype(jnp.float32).sum()
        + p.sum()
    )


def dots_only_bf16(p, lo, hi, prebuilt):
    """3 bf16 dots with PRE-BUILT one-hots (hoisted out of the loop):
    isolates the MXU cost from the build cost."""
    o_lo, o_hi = prebuilt
    p_hi = p.astype(jnp.bfloat16)
    r1 = p - p_hi.astype(jnp.float32)
    p_mid = r1.astype(jnp.bfloat16)
    p_lo = (r1 - p_mid.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = lax.dot_general(
        o_hi * p_hi, o_lo, DN, preferred_element_type=jnp.float32
    )
    acc += lax.dot_general(
        o_hi * p_mid, o_lo, DN, preferred_element_type=jnp.float32
    )
    return acc + lax.dot_general(
        o_hi * p_lo, o_lo, DN, preferred_element_type=jnp.float32
    )


_FLOOR_US = None  # empty-loop floor, us/rep (RTT + while overhead)


def timeit(name, fn, p, lo, hi, ref=None, floor_is_self=False):
    global _FLOOR_US

    @jax.jit
    def loop(p, lo, hi):
        def body(i, acc):
            # compile-opaque perturbation: XLA cannot prove i >= 0 for
            # a while-loop carry, so the index planes stay loop-variant
            # and the one-hot builds cannot be hoisted. bump==0 always,
            # so results (and the error check) are unaffected.
            bump = jnp.where(i < 0, 1, 0)
            out = fn(p + 1e-12 * i, lo + bump, hi + bump)
            return acc + out

        return lax.fori_loop(0, REPS, body, jnp.zeros((HR, 128)))

    r = loop(p, lo, hi)
    _ = float(r[0, 0])  # warm (tunnel: only fetches are real)
    best = float("inf")
    for _rep in range(3):
        t0 = time.time()
        r = loop(p, lo, hi)
        _ = float(r[0, 0])
        best = min(best, (time.time() - t0) * 1e6 / REPS)
    err = ""
    if ref is not None:
        got = np.asarray(fn(p, lo, hi))
        denom = max(np.max(np.abs(ref)), 1e-30)
        err = f"  max_rel_err={np.max(np.abs(got - ref)) / denom:.2e}"
    if floor_is_self:
        _FLOOR_US = best
        net = 0.0
    else:
        net = best - (_FLOOR_US or 0.0)
    print(
        f"{name:28s} {net:8.3f} us/group-op (raw {best:.3f}){err}",
        flush=True,
    )


def main():
    rng = np.random.default_rng(0)
    p = jnp.asarray(
        (rng.standard_normal((1, K)) * 10.0 ** rng.uniform(-3, 3, (1, K))
         ).astype(np.float32)
    )
    lo = jnp.asarray(rng.integers(0, 128, (1, K)), jnp.int32)
    hi = jnp.asarray(rng.integers(0, HR, (1, K)), jnp.int32)

    ref = np.zeros((HR, 128), np.float64)
    pn = np.asarray(p)[0]
    for j in range(K):
        ref[int(hi[0, j]), int(lo[0, j])] += pn[j]

    print(f"shapes: p (1,{K}), one-hots ({HR},{K}) x (128,{K}), "
          f"{REPS} reps", flush=True)
    timeit(
        "empty loop (floor)",
        lambda p, lo, hi: jnp.zeros((HR, 128), jnp.float32) + p.sum(),
        p, lo, hi, floor_is_self=True,
    )
    timeit("bf16 3-pass (current)", bf16_3pass, p, lo, hi, ref)
    timeit("int8 2-limb", lambda *a: int8_limbs(*a, 2), p, lo, hi, ref)
    timeit("int8 3-limb", lambda *a: int8_limbs(*a, 3), p, lo, hi, ref)
    timeit(
        "one-hot build only (bf16)",
        lambda p, lo, hi: onehot_build_only(p, lo, hi, jnp.bfloat16),
        p, lo, hi,
    )
    timeit(
        "one-hot build only (int8)",
        lambda p, lo, hi: onehot_build_only(p, lo, hi, jnp.int8),
        p, lo, hi,
    )
    prebuilt = _onehots(lo, hi, jnp.bfloat16)
    timeit(
        "3 bf16 dots (prebuilt 1-hots)",
        lambda p, lo, hi: dots_only_bf16(p, lo, hi, prebuilt),
        p, lo, hi, ref,
    )


if __name__ == "__main__":
    main()
