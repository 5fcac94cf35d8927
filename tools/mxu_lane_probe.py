#!/usr/bin/env python
"""Mosaic in-kernel MXU dot throughput vs operand LANE width (round-5
verdict item 3).

§10b sized the fused resnet bottleneck-block kernel and §16c the block-1
fusion from ESTIMATED 64-lane dot fractions ("conv1/conv3 at <=50% MXU,
3x3 taps at <=25%") while §2b measured Mosaic 96-lane dots at ~4% MXU.
This converts those estimates into measurements.

Probe shape: each arm runs T INDEPENDENT accumulated dots on
VMEM-resident operands — acc += exp(x * s_i) @ w — so the MXU can
pipeline (no serial dependence through the dot) and nothing is
factorable: a chained y@w design let XLA hoist the invariant chain out
of the outer timing loop ("1200 TFLOP/s"), and a scalar-scale variant
(x*s_i)@w distributed to s_i*(x@w), collapsing the dot to
loop-invariant (both previous designs' artifacts are superseded by this
file's). exp is per-element VPU work, <<1% of the dot FLOPs at N>=64,
and exp(x*s) cannot commute through the contraction. The timed loop has
no HBM traffic beyond one (M,K) read + (M,N) write.

Widths: k128 control, k96 (the §2b LRN geometry), k64 (bottleneck mid
channels / 3x3 tap GEMMs), k64n256 + k256n64 (the bottleneck block's
conv1/conv3). Each also as a plain-XLA jit loop for the
what-XLA-achieves reference. Fractions vs 197 TFLOP/s (v5e bf16 peak).

    timeout 1800 python tools/mxu_lane_probe.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_TFLOPS = 197.0  # v5e bf16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    from qcnn_tpu.utils.devtime import time_device_fn

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    m, t = 1024, 1024

    def body_of(x, w):
        def body(i, acc):
            s = 1.0 + i.astype(jnp.float32) * 1e-3
            xi = jnp.exp(x.astype(jnp.float32) * -s).astype(jnp.bfloat16)
            return acc + jnp.dot(xi, w,
                                 preferred_element_type=jnp.float32)

        return body

    def probe_kernel(x_ref, w_ref, o_ref, *, t, n):
        x = x_ref[:]
        acc = lax.fori_loop(
            0, t, body_of(x, w_ref[:]),
            jnp.zeros((x.shape[0], n), jnp.float32))
        o_ref[:] = acc.astype(jnp.bfloat16)

    def xla_probe(x, w):
        acc = lax.fori_loop(
            0, t, body_of(x, w),
            jnp.zeros((x.shape[0], w.shape[1]), jnp.float32))
        return acc.astype(jnp.bfloat16)

    def run_case(name, k, n, rnd):
        x = jnp.asarray(rng.standard_normal((m, k)) / np.sqrt(k),
                        jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)) / np.sqrt(k),
                        jnp.bfloat16)
        kern = pl.pallas_call(
            functools.partial(probe_kernel, t=t, n=n),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        )
        flops = t * 2.0 * m * k * n
        # parity: identical math in both arms — a Mosaic/XLA elision of
        # the loop body would diverge (or reveal itself as impossible
        # TFLOP/s WITH matching outputs = measurement noise instead)
        got = np.asarray(kern(x, w), np.float32)
        want = np.asarray(jax.jit(xla_probe)(x, w), np.float32)
        rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
        bl = time_device_fn(lambda v, *_: v[(slice(0, 1),) * v.ndim], x,
                            k1=4, k2=20, reps=5)
        for label, fn in (("mosaic", lambda v, ww: kern(v, ww)),
                          ("xla   ", xla_probe)):
            try:
                sec = time_device_fn(fn, x, w, k1=4, k2=20, reps=7,
                                     perturb_rest=True) - bl
                tf = flops / sec / 1e12
                print(f"r{rnd} {name:8s} {label} {sec*1e6:9.2f} us  "
                      f"{tf:8.1f} TFLOP/s  {100*tf/PEAK_TFLOPS:5.1f}% MXU"
                      f"  (parity {rel:.1e})",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"r{rnd} {name:8s} {label} FAILED: {str(e)[:100]}",
                      flush=True)

    # two in-process rounds: the pooled chip's delivered rate varies
    # between windows — only values stable across rounds are conclusions
    for rnd in range(2):
        run_case("k128", 128, 128, rnd)
        run_case("k96", 96, 96, rnd)
        run_case("k64", 64, 64, rnd)
        run_case("k64n256", 64, 256, rnd)
        run_case("k256n64", 256, 64, rnd)
    return 0


if __name__ == "__main__":
    sys.exit(main())
