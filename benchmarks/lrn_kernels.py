"""Micro-benchmark: LRN formulations on AlexNet's norm1 geometry.

Usage: python benchmarks/lrn_kernels.py [--shape 256 55 55 96]
Times ops/misc.lrn impl='band' (the shipped XLA winner, KERNEL_STUDIES §2)
against the fused single-pass Pallas kernel at several tile sizes, with
parity checks. Results recorded in docs/KERNEL_STUDIES.md.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=4, default=[256, 55, 55, 96])
    ap.add_argument("--tiles", type=int, nargs="+",
                    default=[512, 1024, 2048, 4096])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qcnn_tpu.ops.misc import lrn
    from qcnn_tpu.ops.pallas.lrn_fused import lrn_fused
    from qcnn_tpu.utils.devtime import time_device_fn

    kw = dict(size=5, alpha=1e-4, beta=0.75, k=1.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(args.shape) * 2, jnp.bfloat16)
    n_mb = x.size * 2 / 1e6
    print(f"shape {args.shape} bf16 ({n_mb:.0f} MB/tensor), "
          f"backend {jax.default_backend()}", file=sys.stderr)

    want = np.asarray(lrn(x, impl="band", **kw), np.float32)

    def report(name, fn):
        got = np.asarray(fn(x), np.float32)
        ok = np.array_equal(got, want)
        t = time_device_fn(fn, x)
        print(f"{name:24s} {t * 1e6:9.1f} us   "
              f"{2 * n_mb / 1e3 / t:7.0f} GB/s r+w   "
              f"{'bit-identical' if ok else 'MISMATCH max %.2e' % np.abs(got - want).max()}")

    report("band (XLA, shipped)", functools.partial(lrn, impl="band", **kw))
    for tm in args.tiles:
        for variant, vkw in [
            ("dot pad128", dict(window="dot", pad_lanes=True)),
            ("shift", dict(window="shift")),
        ]:
            name = f"pallas tm={tm} {variant}"
            try:
                report(name, functools.partial(
                    lrn_fused, tile_m=tm, **vkw, **kw))
            except Exception as e:  # noqa: BLE001 - survey survives rejects
                print(f"{name:24s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
