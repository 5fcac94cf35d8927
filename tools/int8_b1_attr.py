#!/usr/bin/env python
"""Batch-1 int8 latency attribution (round-5 verdict item 4).

0.183 ms/image is the repo's best latency number (bench.py --dtype int8,
BENCH_r04) but no §16-style attribution existed for it — and low-latency
quantized inference is the reference's whole premise (README.md:30:
55.348 ms/image on the i7). This points the §9f/§16 HLO-cycle
methodology at the exact b1 int8 program bench.py times: estimated-
cycles ranking, op census, and the roofline question the verdict poses —
do the weight-stream bytes bind at batch 1?

    timeout 1800 python tools/int8_b1_attr.py [--no-hlo]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-hlo", action="store_true")
    ap.add_argument("--out", default="tools/out/int8_b1_attr")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qcnn_tpu.models import network, synth, zoo
    from qcnn_tpu.models.calibrate import calibrate_act_scales
    from qcnn_tpu.models.loader import load_alexnet_reference
    from qcnn_tpu.models.prepare import prepare_params
    from qcnn_tpu.utils.devtime import _make_looped, time_device_fn
    from tools.headline_attr import parse_hlo

    log(f"devices: {jax.devices()}")
    spec = zoo.alexnet()
    try:
        params = load_alexnet_reference(synthesize_missing=True).params
    except (FileNotFoundError, OSError):
        params = synth.random_pq_params(spec, seed=0)

    # exactly bench.py's int8 build: static act scales from one bf16 pass
    prep_bf, cib, fib = prepare_params(spec, params, batch_hint=1,
                                       dtype=jnp.bfloat16)
    scales = calibrate_act_scales(
        spec, jax.device_put(prep_bf), synth.random_input(spec, 32, seed=3),
        conv_impls=cib, fc_impls=fib)
    prepared, ci, fi = prepare_params(spec, params, batch_hint=1,
                                      dtype=jnp.int8, act_scales=scales)
    prepared = jax.device_put(prepared)
    log(f"strategies: conv={ci} fc={fi}")

    def step(x, p):
        return network.forward(p, x, spec=spec, conv_impls=ci, fc_impls=fi,
                               compute_dtype=jnp.bfloat16)

    x1 = jnp.asarray(synth.random_input(spec, 1, seed=2), jnp.bfloat16)

    # --- measurement (bench.py b1 methodology: k1=8, k2=64) ---
    bl = time_device_fn(lambda v, *_: v[(slice(0, 1),) * v.ndim], x1,
                        k1=8, k2=64, reps=5)
    t = time_device_fn(step, x1, prepared, k1=8, k2=64, reps=5) - bl
    print(f"b1 int8 step: {t*1e3:.4f} ms (baseline {bl*1e3:.4f})",
          flush=True)

    # --- weight-stream roofline ---
    def leaf_bytes(tree):
        return sum(
            leaf.size * leaf.dtype.itemsize
            for leaf in jax.tree_util.tree_leaves(tree)
            if hasattr(leaf, "dtype")
        )

    wbytes = leaf_bytes(prepared)
    print(f"resident param bytes: {wbytes/1e6:.1f} MB", flush=True)
    for bw_gbs in (400, 800, 1200):
        print(f"  weight-stream floor at {bw_gbs} GB/s: "
              f"{wbytes/bw_gbs/1e6:.4f} ms", flush=True)

    if not args.no_hlo:
        looped = _make_looped(step)
        log("compiling looped b1 program for HLO text ...")
        compiled = looped.lower(2, x1, prepared).compile()
        text = compiled.as_text()
        with open(args.out + "_hlo.txt", "w") as f:
            f.write(text)
        report = parse_hlo(text)
        with open(args.out + "_report.txt", "w") as f:
            f.write("\n".join(report) + "\n")
        print("\n".join(report[:70]), flush=True)
        try:
            ca = compiled.cost_analysis()
            if ca:
                print(f"cost_analysis: flops={ca.get('flops')} "
                      f"bytes={ca.get('bytes accessed')}", flush=True)
        except Exception as e:  # noqa: BLE001 - backend-optional API
            log(f"cost_analysis unavailable: {e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
