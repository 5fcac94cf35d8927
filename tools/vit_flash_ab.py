#!/usr/bin/env python
"""A/B the ViT attention core: XLA (padded+masked) vs the Pallas TPU flash
attention kernel (jax.experimental.pallas.ops.tpu.flash_attention).

The XLA formulation round-trips the (B, H, 197, 256) f32 logits through HBM
(write QK^T, read for softmax, write weights, read for AV ≈ 4x ~150 MB per
block); a flash kernel keeps tiles in VMEM with an online softmax. Geometry:
ViT-B/16 batch 64 bf16. Also checks numerics vs the unfused oracle.

    timeout 580 python tools/vit_flash_ab.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    from qcnn_tpu.models.vit import _masked_attention
    from qcnn_tpu.utils.devtime import time_device_fn

    b, n, h, hd = 64, 197, 12, 64
    n_pad = 256 - n
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, n, h, hd)), jnp.bfloat16)
        for _ in range(3)
    )

    def xla_core(q, k, v):
        return _masked_attention(q, k, v, n_pad).astype(jnp.bfloat16)

    seg_q = jnp.ones((b, 256), jnp.int32)
    seg_kv = jnp.concatenate(
        [jnp.ones((b, n), jnp.int32), jnp.zeros((b, n_pad), jnp.int32)], 1
    )

    def make_flash(block_b):
        def flash_core(q, k, v):
            # (B, N, H, D) -> (B, H, 256, D), flash, slice+back
            qt = jnp.pad(jnp.transpose(q, (0, 2, 1, 3)),
                         ((0, 0), (0, 0), (0, n_pad), (0, 0)))
            kt = jnp.pad(jnp.transpose(k, (0, 2, 1, 3)),
                         ((0, 0), (0, 0), (0, n_pad), (0, 0)))
            vt = jnp.pad(jnp.transpose(v, (0, 2, 1, 3)),
                         ((0, 0), (0, 0), (0, n_pad), (0, 0)))
            o = fa.flash_attention(
                qt, kt, vt,
                segment_ids=fa.SegmentIds(q=seg_q, kv=seg_kv),
                sm_scale=1.0 / float(np.sqrt(hd)),
                block_sizes=fa.BlockSizes(
                    block_q=256, block_k_major=256, block_k=256,
                    block_b=block_b,
                    block_q_major_dkv=256, block_k_major_dkv=256,
                    block_k_dkv=256, block_q_dkv=256,
                    block_k_major_dq=256, block_k_dq=256, block_q_dq=256,
                ),
            )
            return jnp.transpose(
                o[:, :, :n, :], (0, 2, 1, 3)
            ).astype(jnp.bfloat16)
        return flash_core

    want = np.asarray(xla_core(q, k, v), np.float32)
    got = np.asarray(make_flash(1)(q, k, v), np.float32)
    rel = np.abs(got - want).max() / max(1e-6, np.abs(want).max())
    print(f"numerics: flash vs XLA max rel err {rel:.3e}", flush=True)

    cases = [("xla padded+masked", xla_core)]
    cases += [(f"pallas flash block_b={bb}", make_flash(bb))
              for bb in (1, 4, 16, 64)]
    for label, core in cases:
        try:
            t = time_device_fn(core, q, k, v, k1=8, k2=64)
        except Exception as e:  # Mosaic may reject some block_b
            print(f"{label}: FAILED ({type(e).__name__}: {str(e)[:120]})",
                  flush=True)
            continue
        print(f"{label}: {t*1e3:.3f} ms/call", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
