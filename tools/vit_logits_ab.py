#!/usr/bin/env python
"""A/B the ViT attention-logits materialization dtype: f32 vs bf16.

KERNEL_STUDIES §7 pinned the attention core to the HBM round trip of the
(B, 12, 197, 197) f32 logits. bf16 logits halve that stream; softmax still
reduces in f32 inside the fusion. Measures the isolated core AND the full
ViT-B/16 forward at several batches, plus the numerics delta on final
probabilities.

    timeout 3000 python tools/vit_logits_ab.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from qcnn_tpu.models import vit as fam
    from qcnn_tpu.models.vit import _masked_attention
    from qcnn_tpu.utils.devtime import time_device_fn

    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)

    # isolated core, batch 64
    b, n, h, hd = 64, 197, 12, 64
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, n, h, hd)), jnp.bfloat16)
        for _ in range(3)
    )
    for label, dt in (("f32 logits", jnp.float32), ("bf16 logits",
                                                    jnp.bfloat16)):
        def core(q, k, v):
            return _masked_attention(q, k, v, 0, dt).astype(jnp.bfloat16)

        t = time_device_fn(core, q, k, v, k1=8, k2=64)
        print(f"core B=64 {label}: {t*1e3:.3f} ms/call", flush=True)

    # full forward at serving-relevant batches
    spec = fam.VITS["vit_b16"]()
    pq = fam.quantize_params(spec, fam.init_dense_params(spec, seed=0))
    prepared = jax.device_put(fam.prepare_params(spec, pq,
                                                 dtype=jnp.bfloat16))
    for bb in (8, 32, 64):
        x = rng.standard_normal(
            (bb, spec.image_size, spec.image_size, 3)).astype(np.float32)
        row = []
        for label, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            def step(x, params):
                return fam.forward(
                    params, x, spec=spec, compute_dtype=jnp.bfloat16,
                    attn_logits_dtype=dt,
                )

            t = time_device_fn(step, x, prepared)
            row.append(f"{label} {t*1e3:8.3f} ms ({bb/t:7.1f} img/s)")
        print(f"forward B={bb}: " + "  ".join(row), flush=True)

    # numerics: probs delta + top-1 agreement on one batch
    x = rng.standard_normal(
        (16, spec.image_size, spec.image_size, 3)).astype(np.float32)
    # explicit f32 logits: the default now FOLLOWS compute_dtype (bf16
    # here), so omitting attn_logits_dtype would compare bf16 to itself
    p32 = np.asarray(jax.nn.softmax(fam.forward(
        prepared, x, spec=spec, compute_dtype=jnp.bfloat16,
        attn_logits_dtype=jnp.float32), axis=-1))
    p16 = np.asarray(jax.nn.softmax(fam.forward(
        prepared, x, spec=spec, compute_dtype=jnp.bfloat16,
        attn_logits_dtype=jnp.bfloat16), axis=-1))
    print(f"numerics: max|dprob|={np.abs(p32-p16).max():.2e}  "
          f"top1 agree={np.mean(p32.argmax(-1) == p16.argmax(-1)):.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
