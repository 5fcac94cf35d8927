#!/usr/bin/env python
"""A/B the layout-preserving in-step decode variants (KERNEL_STUDIES §9e)
and the round-3 memory-mode resolution.

The §9c A/B showed the gather decode wins isolated (2.5x at ResNet conv
K=128) but loses end-to-end — hypothesis: the post-decode XLA relayouts
(transpose chains that reshape blocks from folding into the conv) eat the
win. These variants hand the consumer the decode's NATIVE layout
(conv_dense kernel_layout= / fc reshape views):

  conv: indecode vs indecode_ohwi vs gdecode vs gdecode_iohw (per-layer,
        resnet50 3x3 + 1x1 geometries, B=64)
  e2e:  resnet50 b64 memory under each MEMORY_IMPL; vit_b16 b32 memory
        (new per-batch fc rule vs forced indecode); alexnet full-memory
        b256/b1 under the round-3 strategy resolution.

    timeout 3000 python tools/decode_layout_ab.py [--skip-e2e]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from qcnn_tpu.ops.conv import pq_conv
    from qcnn_tpu.utils.devtime import time_device_fn

    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)

    impls = ("indecode", "indecode_ohwi", "gdecode", "gdecode_iohw")

    # per-layer conv timing at resnet50 geometries, B=64 bf16
    geoms = [
        # (label, cout, kh, kw, cin, spatial, stride, pad)
        ("3x3 s2 mid=256 @28", 256, 3, 3, 256, 28, 1, 1),
        ("1x1 256->1024 @28", 1024, 1, 1, 256, 28, 1, 0),
        ("1x1 1024->256 @28", 256, 1, 1, 1024, 28, 1, 0),
    ]
    for label, cout, kh, kw, cin, hw, stride, pad in geoms:
        s, d, k = cin // 4, 4, 128
        cb = jnp.asarray(rng.standard_normal((s, k, d)), jnp.bfloat16)
        asmt = jnp.asarray(
            rng.integers(0, k, size=(cout, kh, kw, s)), jnp.uint8)
        bias = jnp.zeros(cout, jnp.float32)
        x = jnp.asarray(
            rng.standard_normal((64, hw, hw, cin)), jnp.bfloat16)
        p = {"codebooks": cb, "assignments": asmt, "bias": bias}
        for impl in impls:
            def fn(xx, cb_, a_):
                return pq_conv(
                    xx, {"codebooks": cb_, "assignments": a_, "bias": bias},
                    stride=stride, pad=pad, impl=impl)

            t = time_device_fn(fn, x, cb, asmt, perturb_rest=True,
                               k1=4, k2=16)
            print(f"conv {label} {impl:14s}: {t*1e6:9.1f} us", flush=True)

    if "--skip-e2e" in sys.argv:
        return 0

    saved_impl = common.MEMORY_IMPL
    # e2e resnet50 memory b64 per conv MEMORY_IMPL (fc rule = auto)
    from qcnn_tpu.models import common
    from qcnn_tpu.models import resnet as fam

    spec_r = fam.RESNETS["resnet50"]()
    pq = fam.quantize_params(spec_r, fam.init_dense_params(spec_r, seed=0))
    prepared = jax.device_put(
        fam.prepare_params(spec_r, pq, dtype=jnp.bfloat16, memory=True)
    )
    xb = rng.standard_normal((64, 224, 224, 3)).astype(np.float32)
    for impl in impls:
        common.MEMORY_IMPL = impl

        def step_r(xx, ps):
            return fam.forward(ps, xx, spec=spec_r,
                               compute_dtype=jnp.bfloat16)

        t = time_device_fn(step_r, xb, prepared, k1=2, k2=8)
        print(f"resnet50 memory b64 conv={impl}: {t*1e3:.3f} ms "
              f"({64/t:.0f} img/s)", flush=True)
    common.MEMORY_IMPL = saved_impl  # restore the SHIPPED default
    # (round-5 review: a stale pre-round-4 constant was restored here,
    # leaving any in-process caller on a superseded global)

    # e2e vit_b16 memory b32: per-batch fc rule vs forced indecode
    from qcnn_tpu.models import vit as vfam

    spec_v = vfam.VITS["vit_b16"]()
    pqv = vfam.quantize_params(spec_v, vfam.init_dense_params(spec_v, seed=0))
    prepv = jax.device_put(
        vfam.prepare_params(spec_v, pqv, dtype=jnp.bfloat16, memory=True)
    )
    xv = rng.standard_normal((32, 224, 224, 3)).astype(np.float32)
    for mode in ("auto", "indecode"):
        common.MEMORY_FC_IMPL = mode

        def step_v(xx, ps):
            return vfam.forward(ps, xx, spec=spec_v,
                                compute_dtype=jnp.bfloat16)

        t = time_device_fn(step_v, xv, prepv, k1=2, k2=8)
        print(f"vit_b16 memory b32 fc={mode}: {t*1e3:.3f} ms "
              f"({32/t:.0f} img/s)", flush=True)
    common.MEMORY_FC_IMPL = "auto"

    # e2e alexnet full memory: round-3 resolution (fc lutgather/fgather)
    # vs all-indecode
    from qcnn_tpu.models import network
    from qcnn_tpu.models.loader import load_alexnet_reference
    from qcnn_tpu.models.prepare import prepare_params
    from qcnn_tpu.models.zoo import alexnet

    spec = alexnet()
    try:
        params = load_alexnet_reference(synthesize_missing=True).params
    except Exception:  # noqa: BLE001
        from qcnn_tpu.models import synth

        params = synth.random_pq_params(spec, seed=0)
    for batch in (256, 1):
        xb = rng.standard_normal((batch, 227, 227, 3)).astype(np.float32)
        for mode in ("memory", "indecode"):
            prepared_a, cis, fis = prepare_params(
                spec, params, batch_hint=batch, conv_impl=mode,
                fc_impl=mode, dtype=jnp.bfloat16,
            )
            prepared_a = jax.device_put(prepared_a)

            def step(xx, ps, cis=cis, fis=fis):
                return network.forward(ps, xx, spec=spec, conv_impls=cis,
                                       fc_impls=fis,
                                       compute_dtype=jnp.bfloat16)

            t = time_device_fn(step, xb, prepared_a, k1=2, k2=8)
            per_img = t / batch
            print(f"alexnet full-memory b{batch} {mode} (fc={fis[15]}): "
                  f"{t*1e3:.3f} ms ({1/per_img:.0f} img/s)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
