#!/usr/bin/env python
"""Same-process A/B of the full ViT-B/16 forward: padded vs unpadded
attention. Cancels pooled-chip run-to-run variance (the two programs run
back-to-back under one chip claim).

    timeout 580 python tools/vit_forward_ab.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from qcnn_tpu.models import vit
    from qcnn_tpu.utils.devtime import time_device_fn

    spec = vit.vit_b16()
    params = vit.prepare_params(
        spec, vit.quantize_params(spec, vit.init_dense_params(spec, seed=0),
                                  num_codewords=16),
        dtype=jnp.bfloat16,
    )
    params = jax.device_put(params)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((64, 224, 224, 3)),
        jnp.bfloat16,
    )

    real_attn = vit._masked_attention

    def unpadded_attn(q, k, v, n_pad):
        return real_attn(q, k, v, 0)

    for label, attn in (("padded+masked", real_attn),
                        ("unpadded", unpadded_attn)):
        vit._masked_attention = attn

        def step(x, params):
            return vit.forward(params, x, spec=spec,
                               compute_dtype=jnp.bfloat16)

        t = time_device_fn(step, x, params, k1=2, k2=10)
        print(f"{label}: {t*1e3:.3f} ms/step ({64/t:.0f} img/s)", flush=True)
    vit._masked_attention = real_attn
    return 0


if __name__ == "__main__":
    sys.exit(main())
