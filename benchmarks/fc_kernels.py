"""Micro-benchmark: PQ-FC implementations on real AlexNet FC geometries.

Usage: python benchmarks/fc_kernels.py [--batch 1 8 64 256]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GEOMS = {
    "fc6": dict(cin=9216, cout=4096, s=2304, k=32, d=4),
    "fc7": dict(cin=4096, cout=4096, s=1024, k=32, d=4),
    "fc8": dict(cin=4096, cout=1000, s=4096, k=16, d=1),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[1, 8, 64, 256])
    ap.add_argument("--impls", nargs="+",
                    default=["onehot", "gather", "decode", "pallas"],
                    help="pq_fc impls; 'decode' times the decode-at-load "
                         "configuration (weight pre-decoded on the host, "
                         "dense GEMM only — measured: XLA does NOT hoist "
                         "an in-graph decode out of the timing loop even "
                         "when loop-invariant); 'indecode' times the "
                         "in-graph decode + GEMM with the codebooks "
                         "loop-perturbed so nothing can be hoisted")
    args = ap.parse_args()

    import jax

    from qcnn_tpu.ops import fc as fc_ops
    from qcnn_tpu.utils.devtime import time_device_fn

    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    print(f"{'geom':5} {'B':>4} " + "".join(f"{n:>12}" for n in args.impls))
    for name, g in GEOMS.items():
        params = jax.device_put({
            "codebooks": rng.standard_normal(
                (g["s"], g["k"], g["d"])).astype(np.float32),
            "assignments": rng.integers(
                0, g["k"], size=(g["cout"], g["s"]), dtype=np.uint8),
            "bias": rng.standard_normal(g["cout"]).astype(np.float32),
        })
        dense = None
        for b in args.batch:
            x = rng.standard_normal((b, g["cin"])).astype(np.float32)
            row = []
            for impl in args.impls:
                try:
                    if impl == "decode":
                        # decode-at-load: host-side decode once, time the
                        # dense GEMM with the weight as a runtime argument
                        if dense is None:
                            cb = np.asarray(params["codebooks"])
                            asmt = np.asarray(params["assignments"])
                            s, k, d = cb.shape
                            w = cb[np.arange(s)[None, :],
                                   asmt.astype(np.int64)]
                            w = w.reshape(asmt.shape[0], s * d).T
                            dense = jax.device_put({
                                "weight": w[:g["cin"]].copy(),
                                "bias": np.asarray(params["bias"]),
                            })
                        t = time_device_fn(
                            lambda xx, pp: fc_ops.fc_dense(
                                xx, pp["weight"], pp["bias"]), x, dense,
                        )
                    else:
                        fn = functools.partial(fc_ops.pq_fc, impl=impl)
                        t = time_device_fn(
                            lambda xx, pp: fn(xx, pp), x, params,
                            perturb_rest=(impl == "indecode"),
                        )
                    row.append(f"{t*1e6:11.1f}u")
                except Exception as e:  # noqa: BLE001
                    print(f"{name} B={b} {impl}: {type(e).__name__}: "
                          f"{str(e)[:200]}", file=sys.stderr, flush=True)
                    row.append(f"{'ERR':>12}")
            print(f"{name:5} {b:>4} " + "".join(row), flush=True)


if __name__ == "__main__":
    main()
