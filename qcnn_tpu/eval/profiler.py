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
import numpy as np

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
    # PQ phase split (the reference's swCompLkupTbl vs swEstiInPdVal,
    # CaffeEva.cc:297-326): phase1 = LUT-build or weight-decode time,
    # phase2 = seconds - phase1 (the gather/GEMM). None for layers with no
    # per-call PQ phases (dense / decode-at-load); label "fused" marks
    # single-kernel impls whose phases are not separable by construction.
    phase_label: Optional[str] = None
    phase1_seconds: Optional[float] = None

    @property
    def phase2_seconds(self) -> Optional[float]:
        if self.phase1_seconds is None:
            return None
        return max(self.seconds - self.phase1_seconds, 0.0)


def _layer_fn(layer, strategy, first_fc, compute_dtype):
    """A standalone ((x, p) -> y) function for one layer, mirroring
    network.forward's dispatch. Params ride as an ARGUMENT, never a
    closure — a closed-over weight becomes a jit constant, and constants
    >200 MB fail the tunneled remote compile with HTTP 413 (CLAUDE.md;
    round-5 review: vgg16's fc6 at f32 is 411 MB)."""
    from qcnn_tpu.ops import (
        caffe_max_pool, conv_dense, dropout_inference, fc_dense, lrn,
        pq_conv, pq_fc, relu, softmax,
    )

    def fn(x, p):
        if isinstance(layer, ConvSpec):
            if strategy == "dense":
                if "kernel_q" in p:  # int8-prepared (network.py dispatch)
                    from qcnn_tpu.ops.conv import conv_dense_int8

                    y = conv_dense_int8(
                        x, p["kernel_q"], p["scale"], p["bias"],
                        stride=layer.stride, pad=layer.pad,
                        groups=layer.groups, act_scale=p.get("act_scale"),
                        out_scale=p.get("out_scale"),
                    )
                else:
                    y = conv_dense(x, p["kernel"], p["bias"],
                                   stride=layer.stride,
                                   pad=layer.pad, groups=layer.groups,
                                   out_dtype=compute_dtype)
            else:
                y = pq_conv(x, p, stride=layer.stride, pad=layer.pad,
                            groups=layer.groups, impl=strategy,
                            out_dtype=compute_dtype)
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
                        out_scale=p.get("out_scale"),
                    )
                else:
                    y = fc_dense(x, p["weight"], p["bias"],
                                 out_dtype=compute_dtype)
            else:
                y = pq_fc(x, p, impl=strategy, out_dtype=compute_dtype)
        elif isinstance(layer, PoolSpec):
            y = caffe_max_pool(x, kernel=layer.kernel, stride=layer.stride,
                               pad=layer.pad)
        elif isinstance(layer, ReLUSpec):
            y = relu(x)
        elif isinstance(layer, LRNSpec):
            y = lrn(x, size=layer.size, alpha=layer.alpha, beta=layer.beta,
                    k=layer.k, channel_map=layer.channel_map,
                    sum_dtype=compute_dtype)
        elif isinstance(layer, DropoutSpec):
            y = dropout_inference(x)
        elif isinstance(layer, SoftmaxSpec):
            y = softmax(x.astype(jnp.float32))
        else:
            raise TypeError(layer)
        if (compute_dtype is not None and y.dtype != jnp.int8
                and isinstance(layer, (ConvSpec, FCSpec))):
            y = y.astype(compute_dtype)
        return y

    return fn


# strategies whose phases live in ONE Pallas kernel — not separable
_FUSED_STRATS = {"fused", "fgather", "pallas", "fusedconv", "fc1x1",
                 "memory_fused"}

# §9 roofline-model rates for the fused-kernel phase ESTIMATE (round-5
# verdict item 7): the in-kernel decode runs the §9c dynamic lane gather
# (measured 201 Gelem/s at 512-row blocks); the contract runs on the MXU
# at the ~100 TFLOP/s effective rate the full models measure (§10).
# Only the RATIO enters the reported split, so absolute calibration
# error cancels to first order.
_DECODE_ELEM_PER_S = 201e9
_MXU_EFF_FLOP_PER_S = 100e12


def _fused_phase_estimate(layer, p, x_shape, out_shape,
                          route: str) -> Optional[float]:
    """Model fraction of a fused PQ kernel's time spent in its in-kernel
    weight decode (vs the GEMM contract) — the DispElpsTime
    CompLkupTbl/EstiInPdVal split (CaffeEva.cc:297-326) estimated where
    fusion hides the boundary from direct timing.

    Decode replays once per batch-tile of the kernel grid, using the
    kernels' OWN tiling logic (round-5 review finding: a hardcoded
    ceil(B/8) understated decode severalfold on large-spatial convs
    where _auto_block_b shrinks the tile, and fc1x1-routed convs replay
    per pq_fc_fused's spatial-row tile, not per image). The decoded
    tile is (lane-padded) Cin x 128-of-Cout per tap. Returns the decode
    fraction in [0, 1], or None when the geometry is not modelable."""
    if not isinstance(p, dict) or "codebooks" not in p:
        return None
    a = p["assignments"]
    if isinstance(layer, ConvSpec) and route == "fusedconv":
        from qcnn_tpu.ops.pallas.pq_conv_fused import _auto_block_b

        cout, kh, kw = a.shape[0], a.shape[1], a.shape[2]
        cin = x_shape[-1]
        rows = out_shape[0] * out_shape[1] * out_shape[2]
        pad = getattr(layer, "pad", 0)
        block_b = _auto_block_b(x_shape[1], x_shape[2], pad, kh, kw, 8)
        replays = max(1, -(-x_shape[0] // max(block_b, 1)))
    else:
        # fc kernels (fused/fgather/pallas) AND fc1x1-routed 1x1 convs:
        # pq_fc_fused tiles the flattened row batch, block_b =
        # min(256, ceil16(rows))
        cout, kh, kw = a.shape[0], 1, 1
        if isinstance(layer, ConvSpec):
            cin = x_shape[-1]
            rows = out_shape[0] * out_shape[1] * out_shape[2]
        else:
            cin = int(np.prod(x_shape[1:]))
            rows = out_shape[0]
        replays = max(1, -(-rows // 256))
    lane = 128
    elems = (kh * kw * (-(-cin // lane) * lane)
             * (-(-cout // lane) * lane) * replays)
    t_decode = elems / _DECODE_ELEM_PER_S
    t_gemm = 2.0 * rows * cin * kh * kw * cout / _MXU_EFF_FLOP_PER_S
    if t_decode + t_gemm <= 0:
        return None
    return t_decode / (t_decode + t_gemm)


def _phase1_fn(layer, p, strategy, first_fc, groups):
    """(label, fn(x_or_small, params) -> scalar) timing the per-call PQ
    PHASE 1 of this strategy: the weight decode (in-step decode modes) or
    the LUT build (LUT/gather modes). Returns None when the strategy has no
    separable per-call phase (dense, decode-at-load, fused kernels).

    Decode phases are weight-only: the returned fn ignores the activation
    and must be timed with perturb_rest=True so the decode cannot hoist out
    of the timing loop (utils/devtime). LUT-build phases consume the real
    layer input.
    """
    import jax.numpy as jnp

    from qcnn_tpu.ops import lut as lut_ops

    if not isinstance(p, dict) or "codebooks" not in p:
        return None

    if strategy in _FUSED_STRATS:
        return ("fused", None)

    def ride(val, x):
        return jnp.sum(val.astype(jnp.float32)) + jnp.sum(
            x.astype(jnp.float32))

    if isinstance(layer, ConvSpec):
        if strategy in ("indecode", "indecode_ohwi", "indecode_hwoi",
                        "gdecode", "gdecode_iohw", "gemm", "memory"):
            layout = {"indecode_ohwi": "ohwi", "indecode_hwoi": "hwoi",
                      "gdecode_iohw": "iohw"}.get(strategy)

            def decode_fn(x, pp):
                cb, a = pp["codebooks"], pp["assignments"]
                cg = x.shape[-1] // groups
                if strategy.startswith("gdecode"):
                    from qcnn_tpu.ops.pallas import (
                        decode_conv_kernel_gather,
                    )

                    w = decode_conv_kernel_gather(
                        cb, a, cg, **({"layout": layout} if layout else {}))
                else:
                    w = lut_ops.decode_conv_kernel_onehot(
                        cb, a, cg,
                        **({"layout": layout} if layout
                           else {}))
                return ride(w, x[:1, :1, :1])

            return ("decode", decode_fn)
        if strategy == "lut":

            def lut_fn(x, pp):
                cb = pp["codebooks"]
                cin = x.shape[-1]
                cpg = cin // groups
                acc = jnp.float32(0.0)
                for g in range(groups):
                    xg = x[..., g * cpg:(g + 1) * cpg]
                    acc = acc + jnp.sum(
                        lut_ops.build_lut(xg, cb).astype(jnp.float32))
                return acc

            return ("lut-build", lut_fn)
        return None

    # FC strategies
    if strategy in ("indecode", "gdecode"):

        def decode_fc(x, pp):
            cb, a = pp["codebooks"], pp["assignments"]
            cin = 1
            for dim in x.shape[1:]:
                cin *= dim
            if strategy == "gdecode":
                from qcnn_tpu.ops.pallas import decode_fc_weight_gather

                w = decode_fc_weight_gather(cb, a, cin)
            else:
                w = lut_ops.decode_fc_weight_onehot(cb, a, cin)
            return ride(w, x.reshape(x.shape[0], -1)[:1, :8])

        return ("decode", decode_fc)
    if strategy in ("onehot", "gather", "lutgather"):

        def lut_fc(x, pp):
            if first_fc:
                x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
            else:
                x = x.reshape(x.shape[0], -1)
            return jnp.sum(
                lut_ops.build_lut(x, pp["codebooks"]).astype(jnp.float32))

        return ("lut-build", lut_fc)
    return None


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
    # over the whole input every iteration. The baseline fn returns a
    # rank-preserving corner slice, NOT the identity: an identity baseline
    # also contains a full input-sized output reduction the layer fn does
    # not pay (its reduction is over the LAYER output) — subtracting it
    # drove small layers negative and the conv1 row to 0.0 us (round-4
    # review; same fix as bench.harness_baseline).
    baselines: dict[tuple, float] = {}

    def baseline(arr) -> float:
        key = (arr.shape, str(arr.dtype))
        if key not in baselines:
            baselines[key] = time_device_fn(
                lambda v: v[(slice(0, 1),) * v.ndim], arr, k1=k1, k2=k2)
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
        fn = _layer_fn(layer, strategy, first_fc, compute_dtype)
        # params ride as jit ARGUMENTS (not closure constants — the 413
        # rule), but must be DEVICE-resident first: host-numpy args are
        # re-uploaded on every call, and a 205 MB fc weight through the
        # tunnel swamps the measurement (no-op for already-device trees)
        if p is not None:
            p = jax.device_put(p)
        secs = time_device_fn(fn, x, p, k1=k1, k2=k2) - baseline(x)
        y = jax.jit(fn)(x, p)
        # PQ phase split (the DispElpsTime LUT-build/gather contract): time
        # phase 1 (decode or LUT build) as its own device program; decode
        # phases run under perturb_rest so the weight-only computation
        # cannot hoist out of the timing loop.
        phase_label = phase1 = None
        # 'memory_fused' is a MIX (ops/conv.py): resolve the route with the
        # production predicate (memory_fused_route — one source of truth;
        # round-4 advisor finding: a hand-replicated gate here missed the
        # fc1x1 reroute and timed a decode phase production never runs).
        # Fused routes (fusedconv/fc1x1) are inseparable in-kernel.
        ph_strategy = strategy
        if (strategy == "memory_fused" and isinstance(layer, ConvSpec)
                and isinstance(p, dict) and "codebooks" in p):
            from qcnn_tpu.ops.conv import memory_fused_route

            route = memory_fused_route(
                p, x.shape, x.dtype, stride=layer.stride, pad=layer.pad,
                groups=getattr(layer, "groups", 1))
            if route == "indecode_ohwi":
                ph_strategy = "indecode_ohwi"
            else:
                ph_strategy = route  # fusedconv / fc1x1 -> _FUSED_STRATS
        ph = _phase1_fn(layer, p, ph_strategy, first_fc,
                        getattr(layer, "groups", 1))
        if ph is not None:
            phase_label, ph_fn = ph
            if ph_fn is not None:
                t1 = time_device_fn(
                    ph_fn, x, p, k1=k1, k2=k2,
                    perturb_rest=(phase_label == "decode"),
                ) - baseline(x)
                phase1 = min(max(t1, 0.0), max(secs, 0.0))
            elif phase_label == "fused":
                # in-kernel phases are not separable by timing; report
                # the §9 roofline-model split (decode gather rate vs MXU
                # contract rate) so the DispElpsTime contract stays
                # complete where fusion hides the boundary
                frac = _fused_phase_estimate(layer, p, tuple(x.shape),
                                             tuple(y.shape), ph_strategy)
                if frac is not None:
                    phase_label = "fused-est-decode"
                    phase1 = frac * max(secs, 0.0)
        profiles.append(
            LayerProfile(i, kind, strategy, tuple(y.shape), max(secs, 0.0),
                         phase_label=phase_label, phase1_seconds=phase1)
        )
        if verbose:
            extra = ""
            if phase_label == "fused":
                extra = "  [fused kernel: phases inseparable]"
            elif phase_label == "fused-est-decode" and phase1 is not None:
                extra = (f"  [fused kernel, roofline est: decode "
                         f"{phase1*1e6:.1f} us + contract "
                         f"{(max(secs,0.0)-phase1)*1e6:.1f} us]")
            elif phase1 is not None:
                extra = (f"  [{phase_label} {phase1*1e6:.1f} us + "
                         f"contract {(max(secs,0.0)-phase1)*1e6:.1f} us]")
            print(
                f"  [{i:2d}] {kind:8s} {strategy:8s} "
                f"{str(tuple(y.shape)):24s} {secs*1e6:10.1f} us{extra}",
                file=sys.stderr, flush=True,
            )
        x = y
    return profiles


def format_table(profiles: list[LayerProfile]) -> str:
    """DispElpsTime-style summary: per-layer lines + per-kind totals; PQ
    layers with per-call phases get the LUT-build/decode vs gather/GEMM
    split (CompLkupTbl / EstiInPdVal, CaffeEva.cc:297-326)."""
    lines = []
    total = sum(p.seconds for p in profiles)
    for p in profiles:
        phase = ""
        if p.phase_label == "fused":
            phase = "  fused-kernel"
        elif (p.phase_label == "fused-est-decode"
              and p.phase1_seconds is not None):
            phase = (f"  fused[est decode={p.phase1_seconds*1e6:.1f}us"
                     f" contract={p.phase2_seconds*1e6:.1f}us]")
        elif p.phase1_seconds is not None:
            phase = (f"  {p.phase_label}={p.phase1_seconds*1e6:.1f}us"
                     f" contract={p.phase2_seconds*1e6:.1f}us")
        lines.append(
            f"[{p.index:2d}] {p.kind:8s} {p.strategy:8s} "
            f"{str(p.out_shape):24s} {p.seconds*1e6:10.1f} us"
            f" ({100*p.seconds/max(total,1e-12):5.1f}%){phase}"
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
            # corner slice, not identity: see profile_layers' baseline
            baselines[key] = time_device_fn(
                lambda v, *_: v[(slice(0, 1),) * v.ndim], arr, *rest,
                k1=k1, k2=k2
            )
        return baselines[key]

    out = []
    for name, fn in segments:
        secs = max(time_device_fn(fn, x, *rest, k1=k1, k2=k2) - baseline(x),
                   0.0)
        out.append((name, secs))
        x = jax.jit(fn)(x, *rest)
    return out
