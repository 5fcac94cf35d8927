#!/usr/bin/env python
"""e2e A/B: resnet50 b64 memory mode with/without the fc1x1 1x1 reroute.

Same-process toggle of ops.conv._FC1X1_MAX_ROWS (0 disables the rule) so
both arms share the session. tools/fc1x1_ab.py measured the isolated
geometries; this is the whole-forward check before the rule ships as the
memory_fused default.

    timeout 1800 python tools/fc1x1_e2e_ab.py
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

    from qcnn_tpu.models import resnet
    from qcnn_tpu.ops import conv as conv_mod
    from qcnn_tpu.utils.devtime import time_device_fn

    log(f"devices: {jax.devices()}")
    spec = resnet.resnet50()
    pq = resnet.quantize_params(
        spec, resnet.init_dense_params(spec, seed=0),
        conv_codewords=128, fc_codewords=32,
    )
    prepared = jax.device_put(
        resnet.prepare_params(spec, pq, dtype=jnp.bfloat16, memory=True))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 224, 224, 3)), jnp.bfloat16)

    def fwd(xx, pp):
        return resnet.forward(pp, xx, spec=spec,
                              compute_dtype=jnp.bfloat16)

    bl = time_device_fn(lambda v, *_: v[(slice(0, 1),) * v.ndim], x,
                        k1=2, k2=8, reps=5)
    for name, max_rows in (("rule OFF (onehot 1x1)", 0),
                           ("rule ON  (fc1x1 reductions)", 4096)):
        conv_mod._FC1X1_MAX_ROWS = max_rows
        # new threshold -> new jit trace: change the static strategy via a
        # fresh wrapper identity (forward re-traces per call site anyway
        # under time_device_fn's jit of the looped program)
        t = time_device_fn(fwd, x, prepared, k1=2, k2=8, reps=5) - bl
        print(f"{name:28s} {t*1e3:8.3f} ms   {64/t:,.0f} img/s",
              flush=True)
    conv_mod._FC1X1_MAX_ROWS = 0  # production default (rule off, §16d)
    return 0


if __name__ == "__main__":
    sys.exit(main())
