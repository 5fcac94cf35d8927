#!/usr/bin/env python
"""A/B the in-step PQ decode formulations: one-hot MXU matmul (shipping
'indecode', KERNEL_STUDIES §9b) vs the Pallas dynamic-gather kernel
(ops/pallas/pq_decode.py, 'gdecode'). Run AFTER tools/pallas_gather_probe.py
confirms the compiled gather works on this toolchain.

Measures (real chip, devtime loop timing):
  1. isolated decode at ResNet conv geometry (K=128 — the case where the
     one-hot operand is 32x the decoded kernel's bytes);
  2. isolated decode at AlexNet fc6/fc7/fc8 geometries (K=32);
  3. end-to-end full-memory-mode AlexNet step (conv+fc), indecode vs gdecode;
  4. end-to-end resnet50 memory step via models.resnet.MEMORY_IMPL.

Results: docs/KERNEL_STUDIES.md §9c.

    timeout 3000 python tools/decode_gather_ab.py [--skip-e2e]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from qcnn_tpu.ops import lut as lut_ops
    from qcnn_tpu.ops.pallas import (
        decode_conv_kernel_gather,
        decode_fc_weight_gather,
    )
    from qcnn_tpu.utils.devtime import time_device_fn

    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    x = jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)

    # 1. ResNet conv geometry (stage2 3x3): Cout=256, Cin=256, D=4 -> S=64
    cout, kh, kw, s, k, d = 256, 3, 3, 64, 128, 4
    cb = jnp.asarray(rng.standard_normal((s, k, d)), jnp.bfloat16)
    asmt = jnp.asarray(rng.integers(0, k, size=(cout, kh, kw, s)), jnp.uint8)
    cg = s * d

    variants = [
        ("conv onehot (shipping)",
         lambda xx, cb, a: lut_ops.decode_conv_kernel_onehot(
             cb, a, cg).sum() + xx),
        ("conv pallas gather",
         lambda xx, cb, a: decode_conv_kernel_gather(cb, a, cg).sum() + xx),
    ]
    for label, fn in variants:
        t = time_device_fn(fn, x, cb, asmt, perturb_rest=True, k1=4, k2=32)
        print(f"isolated decode {label}: {t*1e6:9.1f} us", flush=True)

    # 2. AlexNet FC geometries (K=32, D=4): fc6/fc7/fc8
    for name, (cin, cout_fc, s_fc) in {
        "fc6": (9216, 4096, 2304),
        "fc7": (4096, 4096, 1024),
        "fc8": (4096, 1000, 1024),
    }.items():
        cbf = jnp.asarray(rng.standard_normal((s_fc, 32, 4)), jnp.bfloat16)
        af = jnp.asarray(rng.integers(0, 32, size=(cout_fc, s_fc)), jnp.uint8)
        for label, fn in [
            (f"{name} onehot (shipping)",
             lambda xx, cb_, a_: lut_ops.decode_fc_weight_onehot(
                 cb_, a_, cin).sum() + xx),
            (f"{name} pallas gather",
             lambda xx, cb_, a_: decode_fc_weight_gather(
                 cb_, a_, cin).sum() + xx),
        ]:
            t = time_device_fn(fn, x, cbf, af, perturb_rest=True,
                               k1=4, k2=16)
            print(f"isolated decode {label}: {t*1e6:9.1f} us", flush=True)

    # 2b. fused decode-GEMM kernel: select vs gather tile decode, plus the
    # indecode (XLA onehot decode + GEMM) baseline, at fc6 geometry
    from qcnn_tpu.ops import fc as fc_ops
    from qcnn_tpu.ops.pallas import pq_fc_fused, pq_fc_lut_gather

    cin, cout_fc, s_fc = 9216, 4096, 2304
    cbf = jnp.asarray(rng.standard_normal((s_fc, 32, 4)), jnp.bfloat16)
    af = jnp.asarray(rng.integers(0, 32, size=(cout_fc, s_fc)), jnp.uint8)
    bias = jnp.zeros(cout_fc, jnp.float32)
    for bsz in (1, 8, 256):
        xb_fc = jnp.asarray(rng.standard_normal((bsz, cin)), jnp.bfloat16)
        for label, fn in [
            ("fused select",
             lambda xx, cb_, a_: pq_fc_fused(
                 xx, {"codebooks": cb_, "assignments": a_, "bias": bias},
                 decode="select").sum()),
            ("fused gather",
             lambda xx, cb_, a_: pq_fc_fused(
                 xx, {"codebooks": cb_, "assignments": a_, "bias": bias},
                 decode="gather").sum()),
            ("lutgather (LUT+kernel gather)",
             lambda xx, cb_, a_: pq_fc_lut_gather(
                 xx, {"codebooks": cb_, "assignments": a_,
                      "bias": bias}).sum()),
            ("indecode (onehot+GEMM)",
             lambda xx, cb_, a_: fc_ops.pq_fc_indecode(
                 xx, {"codebooks": cb_, "assignments": a_,
                      "bias": bias}).sum()),
            ("gdecode (gather+GEMM)",
             lambda xx, cb_, a_: fc_ops.pq_fc_gdecode(
                 xx, {"codebooks": cb_, "assignments": a_,
                      "bias": bias}).sum()),
        ]:
            t = time_device_fn(fn, xb_fc, cbf, af, perturb_rest=True,
                               k1=4, k2=16)
            print(f"fc6 B={bsz:3d} {label}: {t*1e6:9.1f} us", flush=True)

    if "--skip-e2e" in sys.argv:
        return 0

    # 3. end-to-end AlexNet full memory mode
    from qcnn_tpu.models import network
    from qcnn_tpu.models.loader import load_alexnet_reference
    from qcnn_tpu.models.prepare import prepare_params
    from qcnn_tpu.models.zoo import alexnet

    spec = alexnet()
    try:
        params = load_alexnet_reference(synthesize_missing=True).params
    except Exception:  # noqa: BLE001 - reference files absent
        from qcnn_tpu.models import synth

        params = synth.random_pq_params(spec, seed=0)
    xb = rng.standard_normal((256, 227, 227, 3)).astype(np.float32)
    for impl in ("indecode", "gdecode"):
        prepared, cis, fis = prepare_params(
            spec, params, batch_hint=256, conv_impl=impl, fc_impl=impl,
            dtype=jnp.bfloat16,
        )
        prepared = jax.device_put(prepared)

        def step(xx, ps, cis=cis, fis=fis):
            return network.forward(ps, xx, spec=spec, conv_impls=cis,
                                   fc_impls=fis,
                                   compute_dtype=jnp.bfloat16)

        t = time_device_fn(step, xb, prepared, k1=2, k2=8)
        print(f"alexnet full-memory b256 {impl}: {t*1e3:.3f} ms "
              f"({256/t:.0f} img/s)", flush=True)
        t1 = time_device_fn(step, xb[:1], prepared, k1=2, k2=8)
        print(f"alexnet full-memory b1   {impl}: {t1*1e3:.3f} ms",
              flush=True)

    # 4. resnet50 memory step
    from qcnn_tpu.models import resnet as fam

    spec_r = fam.RESNETS["resnet50"]()
    pq = fam.quantize_params(spec_r, fam.init_dense_params(spec_r, seed=0))
    prepared = jax.device_put(
        fam.prepare_params(spec_r, pq, dtype=jnp.bfloat16, memory=True)
    )
    xb = rng.standard_normal((64, 224, 224, 3)).astype(np.float32)
    from qcnn_tpu.models import common

    saved_impl = common.MEMORY_IMPL
    for impl in ("indecode", "gdecode"):
        common.MEMORY_IMPL = impl

        def step_r(xx, ps):
            return fam.forward(ps, xx, spec=spec_r,
                               compute_dtype=jnp.bfloat16)

        t = time_device_fn(step_r, xb, prepared, k1=2, k2=8)
        print(f"resnet50 memory b64 {impl}: {t*1e3:.3f} ms "
              f"({64/t:.0f} img/s)", flush=True)
    common.MEMORY_IMPL = saved_impl  # restore the SHIPPED default (round-5 review)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
