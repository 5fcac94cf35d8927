#!/usr/bin/env python
"""Round-5 probe: can ANY fc-kernel formulation beat the one-hot OHWI
decode at the production-gated 1x1 geometry (reduce7: 2048->512 @7x7
b64, 3136 rows)? Arms: pq_fc_fused decode=gather (the shipped fc1x1),
decode=select, and block_b variants. Decides keep-vs-revert for the
memory_fused 1x1 reroute (tools/out/fc1x1_ab.txt measured the shipped
arm LOSING 1.6x).

    timeout 1800 python tools/fc1x1_probe2.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from qcnn_tpu.ops.conv import pq_conv
    from qcnn_tpu.ops.pallas import pq_fc_fused
    from qcnn_tpu.utils.devtime import time_device_fn

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    b, hw, cin, cout = 64, 7, 2048, 512
    d = 4
    s = cin // d
    cb = (rng.standard_normal((s, 128, d)) * 0.1).astype(np.float32)
    a4 = rng.integers(0, 128, size=(cout, 1, 1, s), dtype=np.uint8)
    p = {"codebooks": jnp.asarray(cb), "assignments": jnp.asarray(a4),
         "bias": jnp.asarray(rng.standard_normal(cout), np.float32)}
    fc_p = {"codebooks": p["codebooks"],
            "assignments": jnp.asarray(a4.reshape(cout, s)),
            "bias": p["bias"]}
    x = jnp.asarray(rng.standard_normal((b, hw, hw, cin)), jnp.bfloat16)
    xf = x.reshape(b * hw * hw, cin)
    bl = time_device_fn(lambda v, *_: v[(slice(0, 1),) * v.ndim], x,
                        k1=4, k2=20, reps=5)
    blf = time_device_fn(lambda v, *_: v[(slice(0, 1),) * v.ndim], xf,
                         k1=4, k2=20, reps=5)
    want = np.asarray(pq_conv(x, p, stride=1, pad=0, impl="indecode_ohwi"))

    t = time_device_fn(
        lambda v, pp: pq_conv(v, pp, stride=1, pad=0, impl="indecode_ohwi"),
        x, p, k1=4, k2=20, reps=5, perturb_rest=True) - bl
    print(f"{'onehot OHWI (incumbent)':34s} {t*1e6:9.1f} us", flush=True)

    arms = [
        ("fc gather (shipped fc1x1)", dict(decode="gather")),
        ("fc select", dict(decode="select")),
        ("fc select block_b=512", dict(decode="select", block_b=512)),
        ("fc select block_b=1024", dict(decode="select", block_b=1024)),
        ("fc gather block_b=512", dict(decode="gather", block_b=512)),
        ("fc gather block_b=1024", dict(decode="gather", block_b=1024)),
        ("fc gather block_b=3136->pad", dict(decode="gather",
                                             block_b=3152)),
    ]
    for name, kw in arms:
        try:
            got = np.asarray(pq_fc_fused(xf, fc_p, **kw))
            rel = np.abs(got.reshape(want.shape) - want).max() / max(
                np.abs(want).max(), 1e-9)
            assert rel < 2e-2, rel
            t = time_device_fn(
                lambda v, pp, kw=kw: pq_fc_fused(v, pp, **kw),
                xf, fc_p, k1=4, k2=20, reps=5, perturb_rest=True) - blf
            print(f"{name:34s} {t*1e6:9.1f} us", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:34s} FAILED: {str(e)[:90]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
