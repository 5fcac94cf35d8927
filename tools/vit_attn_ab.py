#!/usr/bin/env python
"""A/B the ViT attention core: padded-masked (197->256) vs unpadded.

Measures ONLY the post-qkv attention core (QK^T, masked softmax, AV) at
ViT-B/16 geometry, batch 64 bf16 — the segment docs/KERNEL_STUDIES.md §7
measured at ~1.05 ms/block unpadded (~10 % MXU). Run on the TPU rig:

    timeout 580 python tools/vit_attn_ab.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax.numpy as jnp

    from qcnn_tpu.models.vit import _masked_attention
    from qcnn_tpu.utils.devtime import time_device_fn

    b, n, h, hd = 64, 197, 12, 64
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, n, h, hd)), jnp.bfloat16)
        for _ in range(3)
    )

    for label, n_pad in (("unpadded (197)", 0), ("padded+masked (256)", 59)):
        def core(q, k, v):
            return _masked_attention(q, k, v, n_pad).astype(jnp.bfloat16)

        t = time_device_fn(core, q, k, v, k1=8, k2=64)
        flops = 2 * 2 * b * h * n * (n + n_pad) * hd  # QK^T + AV
        print(f"{label}: {t*1e3:.3f} ms/call  "
              f"({flops/t/1e12:.1f} TFLOP/s incl. pad work)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
