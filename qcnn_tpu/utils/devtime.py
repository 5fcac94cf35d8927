"""Trustworthy device timing on the tunneled TPU.

jax.block_until_ready returns before device compute completes on the axon
remote platform, and every device->host fetch costs ~30 ms RTT (measured: a
chain of 4096^2 matmuls "ran" at 3890 TFLOP/s under naive wall timing). The
only reliable measurement is: run the repeat loop ON DEVICE inside one
program with a data dependency threaded through every iteration, fetch one
scalar, and difference two loop lengths so the fixed RTT + dispatch cost
cancels.
"""

from __future__ import annotations

import time
from typing import Callable, NamedTuple

import numpy as np


def _make_looped(fn: Callable, perturb_rest: bool = False):
    """jit'd (iters, x, *rest) -> scalar running `iters` serialized fn calls.

    fn maps (x, *rest) -> y (any pytree). Iteration i+1's input is
    x + 1e-30 * running_sum(y_i): numerically a no-op, but XLA can neither
    elide nor reorder iterations. The trip count is a traced argument
    (lowers to while_loop) so one compilation serves every loop length.

    perturb_rest=True additionally perturbs every float leaf of *rest the
    same way INSIDE the loop, so computations that depend only on rest
    (e.g. an in-graph weight decode from PQ codebooks) cannot be hoisted
    out of the loop as invariants — without it they time as zero-cost.
    Only use when the float rest-leaves are small (the perturbation itself
    is an extra pass over them per iteration).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    def run(iters, x, *rest):
        # Full-rank ramp: the perturbation below must NOT be a scalar or
        # rank-1 update of x. XLA's algebraic simplifier distributes
        # dot(x + c*J, w) -> dot(x, w) + c*colsum(w) and strength-reduces
        # the whole loop to nothing (measured 4432 "TFLOP/s" f32 before this
        # fix). sin(acc + ramp) is a fresh full-shape tensor every iteration
        # that no rewrite can factor out of a dot/conv.
        ramp = lax.broadcasted_iota(jnp.float32, x.shape, x.ndim - 1)

        def body(_, carry):
            x, acc = carry
            if perturb_rest:
                def pert_leaf(leaf):
                    if not jnp.issubdtype(leaf.dtype, jnp.inexact):
                        return leaf
                    r = (
                        lax.broadcasted_iota(
                            jnp.float32, leaf.shape, leaf.ndim - 1
                        )
                        if leaf.ndim else jnp.float32(0.0)
                    )
                    return leaf + (jnp.sin(acc + r) * jnp.float32(1e-30)
                                   ).astype(leaf.dtype)

                rest_i = jax.tree_util.tree_map(pert_leaf, rest)
                y = fn(x, *rest_i)
            else:
                y = fn(x, *rest)
            # Reduce over EVERY element of every output leaf: a partial
            # reduction (e.g. ravel()[:8]) lets XLA dead-code-eliminate the
            # uncontributing slice of the whole computation (measured a
            # 151 MB GEMM "running" in 0.4 us before this fix).
            acc = acc + sum(
                jnp.sum(leaf).astype(jnp.float32)
                for leaf in jax.tree_util.tree_leaves(y)
            )
            pert = (jnp.sin(acc + ramp) * jnp.float32(1e-30)).astype(x.dtype)
            return (x + pert, acc)

        _, acc = lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))
        return acc.reshape(1)

    return jax.jit(run)


class TimeStats(NamedTuple):
    """Per-rep spread of one time_device_fn measurement.

    The reference repeats every speed test 5x and publishes all runs
    (/root/reference/README.md:21-30); the bench JSON carries these fields
    so cross-round comparisons survive methodology churn (round-4 verdict:
    the subtracted harness baseline spread ~0.03-0.25 ms across sessions,
    invisible to the driver)."""

    median: float
    lo: float
    hi: float
    reps: int


def time_device_fn_stats(
    fn: Callable,
    x,
    *rest,
    k1: int = 4,
    k2: int = 20,
    reps: int = 3,
    perturb_rest: bool = False,
) -> TimeStats:
    """Like time_device_fn but returns the per-rep (median, min, max, reps)."""
    import jax.numpy as jnp

    x = jnp.asarray(x)
    f = _make_looped(fn, perturb_rest=perturb_rest)
    np.asarray(f(k2, x, *rest))  # compile + warm
    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(k1, x, *rest))
        t1 = time.perf_counter()
        np.asarray(f(k2, x, *rest))
        t2 = time.perf_counter()
        diffs.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
    return TimeStats(float(np.median(diffs)), float(min(diffs)),
                     float(max(diffs)), reps)


def time_device_fn(
    fn: Callable,
    x,
    *rest,
    k1: int = 4,
    k2: int = 20,
    reps: int = 3,
    perturb_rest: bool = False,
) -> float:
    """Median seconds per call of fn(x, *rest) measured on device.

    x must be a float array whose values fn is continuous in (the loop adds
    a ~1e-30 perturbation between iterations). The fixed fetch/dispatch cost
    cancels in the (k2 - k1) difference; while_loop per-iteration overhead
    (~µs) does not and floors what this can resolve.
    """
    return time_device_fn_stats(
        fn, x, *rest, k1=k1, k2=k2, reps=reps, perturb_rest=perturb_rest
    ).median
