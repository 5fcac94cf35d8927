"""Per-layer device-time profiler — the DispElpsTime contract
(CaffeEva.cc:297-326): a table of per-layer forward time plus the PQ phase
split the reference reports (LUT build vs gather-accumulate is reported here
as the per-strategy label, since decode-prepared layers have no per-call PQ
phases by construction).

Times come from utils.devtime (on-device loops), so they are real device
times even over the remote-TPU tunnel where host-side timing is meaningless.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from qcnn_tpu.core import (
    ConvSpec,
    DropoutSpec,
    FCSpec,
    LRNSpec,
    ModelSpec,
    PoolSpec,
    ReLUSpec,
    SoftmaxSpec,
)
from qcnn_tpu.models import network
from qcnn_tpu.utils.devtime import time_device_fn


@dataclasses.dataclass
class LayerProfile:
    index: int
    kind: str
    strategy: str
    out_shape: tuple
    seconds: float


def _layer_fn(layer, p, strategy, first_fc, compute_dtype):
    """A standalone (x -> y) function for one layer, mirroring
    network.forward's dispatch."""
    from qcnn_tpu.ops import (
        caffe_max_pool, conv_dense, dropout_inference, fc_dense, lrn,
        pq_conv, pq_fc, relu, softmax,
    )

    def fn(x):
        if isinstance(layer, ConvSpec):
            if strategy == "dense":
                if "kernel_q" in p:  # int8-prepared (network.py dispatch)
                    from qcnn_tpu.ops.conv import conv_dense_int8

                    y = conv_dense_int8(
                        x, p["kernel_q"], p["scale"], p["bias"],
                        stride=layer.stride, pad=layer.pad,
                        groups=layer.groups, act_scale=p.get("act_scale"),
                    )
                else:
                    y = conv_dense(x, p["kernel"], p["bias"],
                                   stride=layer.stride,
                                   pad=layer.pad, groups=layer.groups)
            else:
                y = pq_conv(x, p, stride=layer.stride, pad=layer.pad,
                            groups=layer.groups, impl=strategy)
        elif isinstance(layer, FCSpec):
            if first_fc:
                x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
            else:
                x = x.reshape(x.shape[0], -1)
            if strategy == "dense":
                if "weight_q" in p:
                    from qcnn_tpu.ops.fc import fc_dense_int8

                    y = fc_dense_int8(
                        x, p["weight_q"], p["scale"], p["bias"],
                        act_scale=p.get("act_scale"),
                    )
                else:
                    y = fc_dense(x, p["weight"], p["bias"])
            else:
                y = pq_fc(x, p, impl=strategy)
        elif isinstance(layer, PoolSpec):
            y = caffe_max_pool(x, kernel=layer.kernel, stride=layer.stride,
                               pad=layer.pad)
        elif isinstance(layer, ReLUSpec):
            y = relu(x)
        elif isinstance(layer, LRNSpec):
            y = lrn(x, size=layer.size, alpha=layer.alpha, beta=layer.beta,
                    k=layer.k, channel_map=layer.channel_map)
        elif isinstance(layer, DropoutSpec):
            y = dropout_inference(x)
        elif isinstance(layer, SoftmaxSpec):
            y = softmax(x.astype(jnp.float32))
        else:
            raise TypeError(layer)
        if compute_dtype is not None and isinstance(
            layer, (ConvSpec, FCSpec)
        ):
            y = y.astype(compute_dtype)
        return y

    return fn


def profile_layers(
    spec: ModelSpec,
    params: Sequence[Optional[dict]],
    x: jax.Array,
    *,
    conv_impls: Optional[tuple] = None,
    fc_impls: Optional[tuple] = None,
    conv_impl: str = "auto",
    fc_impl: str = "auto",
    compute_dtype=None,
    k1: int = 8,
    k2: int = 64,
    verbose: bool = True,
) -> list[LayerProfile]:
    """Time every layer on device with its real intermediate input."""
    if conv_impls is None or fc_impls is None:
        # dtype matters: the fc 'memory' rule keeps f32 runs on the exact
        # one-hot decode — the profiler must time what forward() executes
        conv_impls, fc_impls = network.resolve_strategy(
            spec, params, x.shape[0], conv_impl, fc_impl,
            dtype=(compute_dtype if compute_dtype is not None
                   else jnp.float32),
        )
    x = jnp.asarray(x)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)

    # Harness overhead baseline: the devtime loop adds a sin-perturbation
    # over the whole input and a sum over the whole output every iteration.
    # For cheap layers that overhead dominates, so the identity cost at each
    # input shape is measured once and subtracted.
    baselines: dict[tuple, float] = {}

    def baseline(arr) -> float:
        key = (arr.shape, str(arr.dtype))
        if key not in baselines:
            baselines[key] = time_device_fn(lambda v: v, arr, k1=k1, k2=k2)
        return baselines[key]

    profiles: list[LayerProfile] = []
    first_fc_pending = True
    for i, (layer, p) in enumerate(zip(spec.layers, params)):
        kind = type(layer).__name__.replace("Spec", "")
        if isinstance(layer, ConvSpec):
            strategy = conv_impls[i]
        elif isinstance(layer, FCSpec):
            strategy = fc_impls[i]
        else:
            strategy = "-"
        first_fc = isinstance(layer, FCSpec) and first_fc_pending
        if first_fc:
            first_fc_pending = False
        fn = _layer_fn(layer, p, strategy, first_fc, compute_dtype)
        secs = time_device_fn(fn, x, k1=k1, k2=k2) - baseline(x)
        y = jax.jit(fn)(x)
        profiles.append(
            LayerProfile(i, kind, strategy, tuple(y.shape), max(secs, 0.0))
        )
        if verbose:
            print(
                f"  [{i:2d}] {kind:8s} {strategy:8s} "
                f"{str(tuple(y.shape)):24s} {secs*1e6:10.1f} us",
                file=sys.stderr, flush=True,
            )
        x = y
    return profiles


def format_table(profiles: list[LayerProfile]) -> str:
    """DispElpsTime-style summary: per-layer lines + per-kind totals."""
    lines = []
    total = sum(p.seconds for p in profiles)
    for p in profiles:
        lines.append(
            f"[{p.index:2d}] {p.kind:8s} {p.strategy:8s} "
            f"{str(p.out_shape):24s} {p.seconds*1e6:10.1f} us"
            f" ({100*p.seconds/max(total,1e-12):5.1f}%)"
        )
    by_kind: dict[str, float] = {}
    for p in profiles:
        by_kind[p.kind] = by_kind.get(p.kind, 0.0) + p.seconds
    lines.append("-" * 60)
    for kind, secs in sorted(by_kind.items(), key=lambda kv: -kv[1]):
        lines.append(f"{kind:8s} total {secs*1e6:10.1f} us"
                     f" ({100*secs/max(total,1e-12):5.1f}%)")
    lines.append(f"TOTAL {total*1e6:10.1f} us (sum of isolated layers)")
    return "\n".join(lines)


def profile_segments(
    segments: "list[tuple[str, callable]]",
    x,
    *rest,
    k1: int = 2,
    k2: int = 12,
) -> list[tuple[str, float]]:
    """Generic chained-segment profiler for non-linear model families:
    segments[(name, fn)] where fn(x, *rest) -> next x. Each segment is
    timed on device with its real intermediate input (identity-baseline
    subtracted), mirroring profile_layers for ModelSpec graphs."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(x)
    baselines: dict[tuple, float] = {}

    def baseline(arr) -> float:
        key = (arr.shape, str(arr.dtype))
        if key not in baselines:
            baselines[key] = time_device_fn(
                lambda v, *_: v, arr, *rest, k1=k1, k2=k2
            )
        return baselines[key]

    out = []
    for name, fn in segments:
        secs = max(time_device_fn(fn, x, *rest, k1=k1, k2=k2) - baseline(x),
                   0.0)
        out.append((name, secs))
        x = jax.jit(fn)(x, *rest)
    return out
