#!/usr/bin/env python
"""Same-session A/B: f32 vs compute-dtype materialization in the family
models (round 4 — the AlexNet headline fix applied to ResNet/ViT).

'Old' is reproduced exactly by forcing out_dtype=None through
conv_dense/fc_dense (the round-3 dataflow: every conv/GEMM materializes
f32, a separate pass converts to bf16; in ViT q/k/v even flowed f32 into
the attention einsums). 'New' is the shipping path (convs/GEMMs emit the
compute dtype).

    timeout 1500 python tools/family_outdtype_ab.py [--models resnet50,vit_b16]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class force_f32_materialization:
    """Context manager: conv_dense/fc_dense ignore out_dtype (round-3
    behavior) so the old program is measurable in the same session."""

    def __enter__(self):
        from qcnn_tpu.ops import conv as conv_ops
        from qcnn_tpu.ops import fc as fc_ops

        self._conv, self._fc = conv_ops.conv_dense, fc_ops.fc_dense

        @functools.wraps(self._conv)
        def conv_old(*a, **kw):
            kw["out_dtype"] = None
            return self._conv(*a, **kw)

        @functools.wraps(self._fc)
        def fc_old(*a, **kw):
            kw["out_dtype"] = None
            return self._fc(*a, **kw)

        conv_ops.conv_dense = conv_old
        fc_ops.fc_dense = fc_old
        return self

    def __exit__(self, *exc):
        from qcnn_tpu.ops import conv as conv_ops
        from qcnn_tpu.ops import fc as fc_ops

        conv_ops.conv_dense, fc_ops.fc_dense = self._conv, self._fc


def bench_model(model: str, batch: int, memory: bool = False):
    import jax
    import jax.numpy as jnp

    from qcnn_tpu.utils.devtime import time_device_fn

    if model.startswith("resnet"):
        from qcnn_tpu.models import resnet as fam

        spec = fam.RESNETS[model]()
        size = spec.in_size
    else:
        from qcnn_tpu.models import vit as fam

        spec = fam.VITS[model]()
        size = spec.image_size
    pq = fam.quantize_params(spec, fam.init_dense_params(spec, seed=0))
    prep = jax.device_put(
        fam.prepare_params(spec, pq, dtype=jnp.bfloat16, memory=memory))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((batch, size, size, 3)),
                    jnp.bfloat16)

    def step(x, p):
        return fam.forward(p, x, spec=spec, compute_dtype=jnp.bfloat16)

    base = time_device_fn(lambda v, *_: v, x, k1=2, k2=10, reps=3)
    with force_f32_materialization():
        t_old = time_device_fn(step, x, prep, k1=2, k2=10, reps=3) - base
        y_old = np.asarray(jax.jit(step)(x, prep), np.float32)
    t_new = time_device_fn(step, x, prep, k1=2, k2=10, reps=3) - base
    y_new = np.asarray(jax.jit(step)(x, prep), np.float32)
    dd = np.abs(y_new - y_old).max() / max(np.abs(y_old).max(), 1e-9)
    tag = f"{model} b{batch}{' memory' if memory else ''}"
    print(f"{tag:<28} old {t_old*1e3:8.3f} ms ({batch/t_old:8.1f} img/s)  "
          f"new {t_new*1e3:8.3f} ms ({batch/t_new:8.1f} img/s)  "
          f"{t_old/t_new:5.2f}x  max rel dlogit {dd:.2e}", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="resnet50,vit_b16")
    args = ap.parse_args()

    import jax

    log(f"devices: {jax.devices()}")
    for m in args.models.split(","):
        if m.startswith("resnet"):
            bench_model(m, 64)
            bench_model(m, 64, memory=True)
        else:
            bench_model(m, 32)
            bench_model(m, 64)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
