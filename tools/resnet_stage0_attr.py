#!/usr/bin/env python
"""HLO-cycle attribution of ResNet-50 stage0 (round 4, post-verdict).

§10 profiles stage0 (3 bottleneck blocks at 56x56, 64->256 channels) at
55 TFLOP/s — 3.5x below peak and the worst stage by far — but no study
ever attributed WHY. This points the §9f/§16 estimated_cycles methodology
at the compiled stage0 segment (batch 64 bf16, decode-at-load params).

    timeout 1800 python tools/resnet_stage0_attr.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.headline_attr import parse_hlo  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from qcnn_tpu.models import resnet
    from qcnn_tpu.utils.devtime import _make_looped, time_device_fn

    log(f"devices: {jax.devices()}")
    spec = resnet.resnet50()
    pq = resnet.quantize_params(
        spec, resnet.init_dense_params(spec, seed=0),
        conv_codewords=128, fc_codewords=32,
    )
    prepared = jax.device_put(
        resnet.prepare_params(spec, pq, dtype=jnp.bfloat16))
    segs = dict(resnet.forward_segments(spec, compute_dtype=jnp.bfloat16))
    stage0 = segs["stage0"]

    rng = np.random.default_rng(0)
    # stem output shape at batch 64: (64, 56, 56, 64) bf16
    x = jnp.asarray(rng.standard_normal((64, 56, 56, 64)), jnp.bfloat16)

    looped = _make_looped(stage0)
    log("compiling looped stage0 for HLO ...")
    compiled = looped.lower(2, x, prepared).compile()
    text = compiled.as_text()
    with open("tools/out/resnet_stage0_hlo.txt", "w") as f:
        f.write(text)
    report = parse_hlo(text)
    with open("tools/out/resnet_stage0_attr.txt", "w") as f:
        f.write("\n".join(report) + "\n")
    print("\n".join(report[:40]), flush=True)

    base = time_device_fn(lambda v, *_: v[(slice(0, 1),) * v.ndim], x,
                          k1=4, k2=20, reps=5)
    t = time_device_fn(stage0, x, prepared, k1=4, k2=20, reps=5) - base
    fl = 0
    hw, cin, mid, cout = 56, 64, 64, 256
    for b in range(3):
        fl += 2 * 64 * (hw * hw * (cin if b == 0 else cout) * mid
                        + hw * hw * mid * mid * 9
                        + hw * hw * mid * cout)
    fl += 2 * 64 * hw * hw * cin * cout  # projection shortcut, block 0
    print(f"stage0 measured: {t*1e3:.3f} ms   "
          f"{fl/t/1e12:.1f} TFLOP/s ({fl/1e9:.1f} GFLOP)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
