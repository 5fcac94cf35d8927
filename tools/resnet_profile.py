#!/usr/bin/env python
"""Per-stage device-time profile of ResNet-50 batch-64 bf16 (VERDICT item:
"resnet50 >= 80 TFLOP/s or a KERNEL_STUDIES negative result").

Times prefix networks (stem, stem+stage0, ...) with the on-device loop
timer and differences them to get per-stage cost; prints per-stage FLOPs
and the HBM activation-traffic estimate so the bound is identifiable.

    timeout 580 python tools/resnet_profile.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def stage_flops_and_traffic(spec, batch):
    """Returns per-stage (flops, traffic_bytes) analytic estimates.

    Traffic model (bf16): each conv reads its input once and writes its
    output once (weights negligible); the residual add reads two tensors and
    writes one; pool/stem accordingly.
    """
    from qcnn_tpu.models.resnet import _block_channels

    out = []
    # stem: 7x7 s2 conv 3->64 on 224 -> 112, + 3x3 s2 maxpool -> 56
    h = spec.in_size // 2
    fl = 2 * batch * h * h * 64 * 7 * 7 * 3
    tr = 2 * batch * (spec.in_size**2 * 3 + h * h * 64 * 2 + (h // 2) ** 2 * 64)
    out.append(("stem+pool", fl, tr))
    hw = spec.in_size // 4
    cin = 64
    for s, depth in enumerate(spec.stage_depths):
        mid, cout = _block_channels(spec, s)
        fl = tr = 0
        for b in range(depth):
            stride = 2 if (s > 0 and b == 0) else 1
            hin = hw
            hout = hw // stride
            if spec.bottleneck:
                fl += 2 * batch * (
                    hin * hin * cin * mid                       # conv1 1x1
                    + hout * hout * mid * mid * 9               # conv2 3x3 s
                    + hout * hout * mid * cout                  # conv3 1x1
                )
                tr += 2 * batch * (
                    hin * hin * cin + hin * hin * mid           # conv1 r/w
                    + hin * hin * mid + hout * hout * mid       # conv2 r/w
                    + hout * hout * mid + hout * hout * cout    # conv3 r/w
                    + 3 * hout * hout * cout                    # add r2/w1
                )
            else:
                fl += 2 * batch * (
                    hout * hout * cin * mid * 9
                    + hout * hout * mid * cout * 9
                )
                tr += 2 * batch * (
                    hin * hin * cin + hout * hout * mid
                    + hout * hout * mid + hout * hout * cout
                    + 3 * hout * hout * cout
                )
            if cin != cout:
                fl += 2 * batch * hout * hout * cin * cout
                tr += 2 * batch * (hin * hin * cin + hout * hout * cout)
            cin = cout
            hw = hout
        out.append((f"stage{s}", fl, tr))
    return out


def main() -> int:
    import jax
    import jax.numpy as jnp

    from qcnn_tpu.models import resnet
    from qcnn_tpu.ops.misc import caffe_max_pool, relu
    from qcnn_tpu.utils.devtime import time_device_fn

    batch = 64
    spec = resnet.resnet50()
    memory = "--memory" in sys.argv
    dense = resnet.init_dense_params(spec, seed=0)
    if memory:
        # memory-mode per-stage profile: where does the in-step decode's
        # cost land? (KERNEL_STUDIES §9e). --impl X overrides the conv
        # decode formulation (models/common.py MEMORY_IMPL).
        from qcnn_tpu.models import common

        if "--impl" in sys.argv:
            common.MEMORY_IMPL = sys.argv[sys.argv.index("--impl") + 1]
        pq = resnet.quantize_params(spec, dense)
        params = resnet.prepare_params(
            spec, pq, dtype=jnp.bfloat16, memory=True
        )
        print("profiling MEMORY mode (in-step decode, "
              f"conv={common.MEMORY_IMPL})", file=sys.stderr, flush=True)
    else:
        params = resnet.prepare_params(spec, dense, dtype=jnp.bfloat16)
    params = jax.device_put(params)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, 224, 224, 3)),
        jnp.bfloat16,
    )

    def prefix_forward(n_stages):
        def fn(x, params):
            cast = lambda v: v.astype(jnp.bfloat16)  # noqa: E731
            y = cast(relu(resnet._apply_conv(x.astype(jnp.bfloat16),
                                             params["stem"],
                                             stride=2, pad=3)))
            y = caffe_max_pool(y, kernel=3, stride=2, pad=1,
                               ceil_mode=False)
            for s in range(n_stages):
                for b in range(spec.stage_depths[s]):
                    block = params[f"s{s}b{b}"]
                    stride = 2 if (s > 0 and b == 0) else 1
                    shortcut = y
                    if "proj" in block:
                        shortcut = cast(resnet._apply_conv(
                            y, block["proj"], stride=stride))
                    z = cast(relu(resnet._apply_conv(y, block["conv1"])))
                    z = cast(relu(resnet._apply_conv(
                        z, block["conv2"], stride=stride, pad=1)))
                    z = cast(resnet._apply_conv(z, block["conv3"]))
                    y = relu(z + shortcut)
            return y
        return fn

    times = []
    for n in range(5):
        t = time_device_fn(prefix_forward(n), x, params, k1=2, k2=10)
        times.append(t)
        print(f"prefix through {n} stages: {t*1e3:.3f} ms", flush=True)

    def full(x, params):
        return resnet.forward(params, x, spec=spec,
                              compute_dtype=jnp.bfloat16)

    t_full = time_device_fn(full, x, params, k1=2, k2=10)
    print(f"full forward: {t_full*1e3:.3f} ms "
          f"({batch/t_full:.0f} img/s)", flush=True)

    est = stage_flops_and_traffic(spec, batch)
    total_fl = sum(f for _, f, _ in est)
    print(f"\ntotal {total_fl/1e9:.1f} GFLOP/step -> "
          f"{total_fl/t_full/1e12:.1f} TFLOP/s effective", flush=True)
    print(f"{'segment':<10} {'ms':>8} {'GFLOP':>8} {'tfl/s':>7} "
          f"{'MB':>8} {'GB/s':>7}")
    segs = [times[0]] + [times[i + 1] - times[i] for i in range(4)]
    for (name, fl, tr), dt in zip(est, segs):
        print(f"{name:<10} {dt*1e3:>8.3f} {fl/1e9:>8.1f} "
              f"{fl/max(dt,1e-9)/1e12:>7.1f} {tr/1e6:>8.1f} "
              f"{tr/max(dt,1e-9)/1e9:>7.1f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
