"""One-time parameter preparation for execution (the PrepCtrdBuf/PrepAsmtBuf
analogue, CaffeEva.cc:534-623).

The reference permutes codebooks/assignments into gather-friendly layouts once
at load. Here preparation does the TPU equivalents, once, outside the jitted
step:

- ``decode`` layers: decode codebooks+assignments to a dense kernel/weight in
  the compute dtype. PQ(x) == W̃x exactly (ops/lut.py), so this is a lossless
  layout change, trading HBM capacity (the dense copy) for speed-of-light MXU
  execution. fc6 f32 dense is 151 MB; bf16 halves the per-step weight stream.
- ``lut``/``onehot``/``pallas``/``fused``/``indecode`` layers: keep
  codebooks+assignments (the 21x smaller representation) and only cast:
  codebooks to the compute dtype, assignments unchanged in the reference
  (Cout, S) layout — each kernel transposes to its preferred layout inside
  its own jit (a no-op-fusable relayout, measured immaterial vs the LUT
  build). ``indecode`` in particular decodes the dense weight inside the
  step (a one-hot MXU matmul — the gather lowering measures 29-81 ms per
  layer, KERNEL_STUDIES §9b): only compressed params are resident in HBM;
  the dense copy is a per-layer transient.

The returned params list feeds models.network.forward unchanged: decoded
layers look like dense layers, PQ layers keep their PQ dict.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import ml_dtypes
import numpy as np

from qcnn_tpu.core import (
    ConvSpec,
    DropoutSpec,
    FCSpec,
    ModelSpec,
    PoolSpec,
    ReLUSpec,
    is_pq,
)
from qcnn_tpu.models import network

# Preparation runs on the HOST in NumPy: on the remote-TPU tunnel, eager
# device ops cost a compile each (measured: 39 s to prepare AlexNet via
# jnp decode vs <1 s in NumPy). ml_dtypes provides the bfloat16 NumPy dtype.


def _np_dtype(dtype):
    return ml_dtypes.bfloat16 if dtype in (jnp.bfloat16, "bfloat16") else dtype


def _is_int8(dtype) -> bool:
    return dtype in (jnp.int8, np.int8, "int8")


def act_dtype_for(compute_dtype):
    """The inter-layer ACTIVATION dtype for a requested execution dtype:
    int8 selects the weight representation only — activations must stay
    bf16 (an int8 activation cast astype-truncates normalized inputs and
    the residual stream to garbage). Every entry point that accepts a
    compute dtype (Classifier, FamilyClassifier, the serving engines)
    routes through this one rule."""
    if compute_dtype is not None and _is_int8(compute_dtype):
        return jnp.bfloat16
    return compute_dtype


def _quantize_weight_int8(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-output-channel (last axis) symmetric int8: w ≈ w_q * scale."""
    amax = np.maximum(np.abs(w).max(axis=tuple(range(w.ndim - 1))), 1e-12)
    scale = (amax / 127.0).astype(np.float32)
    wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return wq, scale


def _decode_fc_weight_np(codebooks, assignments, in_features):
    s, k, d = codebooks.shape
    gathered = codebooks[np.arange(s)[None, :], assignments.astype(np.int64)]
    w = gathered.reshape(assignments.shape[0], s * d)[:, :in_features]
    return w.T  # (Cin, Cout)


def _decode_conv_kernel_np(codebooks, assignments, cg):
    s, k, d = codebooks.shape
    cout, kh, kw, _ = assignments.shape
    gathered = codebooks[
        np.arange(s)[None, None, None, :], assignments.astype(np.int64)
    ]  # (Cout, kh, kw, S, D)
    w = gathered.reshape(cout, kh, kw, s * d)[..., :cg]
    return np.transpose(w, (1, 2, 3, 0))  # HWIO


def int8_out_scales(
    spec: ModelSpec,
    params: Sequence[Optional[dict]],
    conv_strat: tuple,
    fc_strat: tuple,
    act_scales: Optional[dict],
) -> dict[int, float]:
    """The int8-native dataflow plan: {producer layer index: out_scale}.

    ReLU and max-pool commute with symmetric per-tensor quantization
    (monotone, q(0) == 0) and inference dropout/flatten are identity, so a
    conv/FC whose path to the NEXT conv/FC crosses only those layers can
    emit int8 codes directly in the consumer's calibrated input scale —
    eliminating the consumer's activation-quantize pass and halving the
    boundary activation traffic (the passes KERNEL_STUDIES §6/§6b measured
    as int8's batch-256 regression vs bf16). LRN breaks the chain (it does
    not commute: the reference's own uint8 pipeline dequantizes around it,
    CaffeEva.cc:848-861 operates per-layer on uint8 codes the same way).

    Both endpoints must execute as int8-dense ('dense' or decode-to-dense
    strategy, so prepare will quantize their weights) and the consumer must
    have a calibrated static scale.
    """
    if act_scales is None:
        return {}

    def int8_dense_at(j: int) -> bool:
        layer, p = spec.layers[j], params[j]
        if p is None:
            return False
        strat = conv_strat[j] if isinstance(layer, ConvSpec) else fc_strat[j]
        return strat in ("dense", "decode")

    plan: dict[int, float] = {}
    for i, layer in enumerate(spec.layers):
        if not isinstance(layer, (ConvSpec, FCSpec)) or not int8_dense_at(i):
            continue
        j = i + 1
        commutes = True
        while j < len(spec.layers) and not isinstance(
            spec.layers[j], (ConvSpec, FCSpec)
        ):
            if not isinstance(spec.layers[j],
                              (ReLUSpec, PoolSpec, DropoutSpec)):
                commutes = False
                break
            j += 1
        if (commutes and j < len(spec.layers) and j in act_scales
                and int8_dense_at(j)):
            plan[i] = act_scales[j]
    return plan


def prepare_params(
    spec: ModelSpec,
    params: Sequence[Optional[dict]],
    *,
    batch_hint: int = 1,
    conv_impl: str = "auto",
    fc_impl: str = "auto",
    dtype=jnp.bfloat16,
    act_scales: Optional[dict] = None,
) -> tuple[list, tuple[str, ...], tuple[str, ...]]:
    """Resolve strategies and pre-decode/pre-layout parameters.

    Returns (prepared_params, conv_impls, fc_impls) where the impl tuples are
    the per-layer strategies to pass to network.forward (decoded layers
    become 'dense').

    act_scales: {layer_index: static activation scale} from
    models.calibrate.calibrate_act_scales — int8 mode only; layers present
    in the dict skip the dynamic amax pass at runtime.
    """
    conv_strat, fc_strat = network.resolve_strategy(
        spec, params, batch_hint, conv_impl, fc_impl,
        dtype=(jnp.bfloat16 if _is_int8(dtype) else dtype),
    )
    out_scales = (
        int8_out_scales(spec, params, conv_strat, fc_strat, act_scales)
        if _is_int8(dtype) else {}
    )

    def with_act_scale(d: dict, i: int) -> dict:
        if act_scales is not None and i in act_scales:
            d["act_scale"] = np.float32(act_scales[i])
        if i in out_scales:
            d["out_scale"] = np.float32(out_scales[i])
        return d

    out: list = []
    conv_final: list[str] = []
    fc_final: list[str] = []
    shapes = spec.feature_shapes(batch=1)
    for i, (layer, p) in enumerate(zip(spec.layers, params)):
        _, h, w, c = shapes[i]
        if isinstance(layer, ConvSpec):
            fc_final.append("-")
            if p is None:
                conv_final.append("-")
                out.append(p)
            elif not is_pq(p):
                conv_final.append("dense")
                if _is_int8(dtype):
                    kq, scale = _quantize_weight_int8(
                        np.asarray(p["kernel"], np.float32)
                    )
                    out.append(with_act_scale(
                        {"kernel_q": kq, "scale": scale,
                         "bias": np.asarray(p["bias"], np.float32)}, i))
                else:
                    out.append(
                        {"kernel": np.asarray(p["kernel"], _np_dtype(dtype)),
                         "bias": np.asarray(p["bias"], np.float32)}
                    )
            elif conv_strat[i] == "decode":
                kernel = _decode_conv_kernel_np(
                    np.asarray(p["codebooks"]),
                    np.asarray(p["assignments"]),
                    c // layer.groups,
                )
                if "perm" in p:
                    # fold the OPQ channel permutation into the dense
                    # kernel: W_eq[..., ch, :] = W_perm[..., invperm, :]
                    from qcnn_tpu.quantizer.opq import inverse_permutation

                    kernel = kernel[:, :, inverse_permutation(p["perm"]), :]
                bias = np.asarray(p["bias"], np.float32)
                if _is_int8(dtype):
                    kq, scale = _quantize_weight_int8(kernel)
                    conv_final.append("dense")
                    out.append(with_act_scale(
                        {"kernel_q": kq, "scale": scale, "bias": bias}, i))
                else:
                    conv_final.append("dense")
                    out.append(
                        {"kernel": kernel.astype(_np_dtype(dtype)),
                         "bias": bias}
                    )
            else:
                conv_final.append(conv_strat[i])
                out.append(_cast_pq(p, dtype))
        elif isinstance(layer, FCSpec):
            conv_final.append("-")
            if p is None:
                fc_final.append("-")
                out.append(p)
            elif not is_pq(p):
                fc_final.append("dense")
                if _is_int8(dtype):
                    wq, scale = _quantize_weight_int8(
                        np.asarray(p["weight"], np.float32)
                    )
                    out.append(with_act_scale(
                        {"weight_q": wq, "scale": scale,
                         "bias": np.asarray(p["bias"], np.float32)}, i))
                else:
                    out.append(
                        {"weight": np.asarray(p["weight"], _np_dtype(dtype)),
                         "bias": np.asarray(p["bias"], np.float32)}
                    )
            elif fc_strat[i] == "decode":
                cin = h * w * c
                weight = _decode_fc_weight_np(
                    np.asarray(p["codebooks"]),
                    np.asarray(p["assignments"]),
                    cin,
                )
                if "perm" in p:
                    from qcnn_tpu.quantizer.opq import inverse_permutation

                    weight = weight[inverse_permutation(p["perm"]), :]
                bias = np.asarray(p["bias"], np.float32)
                if _is_int8(dtype):
                    wq, scale = _quantize_weight_int8(weight)
                    fc_final.append("dense")
                    out.append(with_act_scale(
                        {"weight_q": wq, "scale": scale, "bias": bias}, i))
                else:
                    fc_final.append("dense")
                    out.append(
                        {"weight": weight.astype(_np_dtype(dtype)),
                         "bias": bias}
                    )
            else:
                fc_final.append(fc_strat[i])
                out.append(_cast_pq(p, dtype))
        else:
            conv_final.append("-")
            fc_final.append("-")
            out.append(None)
    return out, tuple(conv_final), tuple(fc_final)


def _cast_pq(p: dict, dtype) -> dict:
    # LUT-strategy layers keep float codebooks (int8 execution applies to
    # the decoded-dense path only)
    cb_dtype = jnp.bfloat16 if _is_int8(dtype) else dtype
    out = {
        "codebooks": np.asarray(p["codebooks"], _np_dtype(cb_dtype)),
        "assignments": np.asarray(p["assignments"]),
        "bias": np.asarray(p["bias"], np.float32),
    }
    if "perm" in p:  # OPQ permutation (consumed by ops.fc/ops.conv)
        out["perm"] = np.asarray(p["perm"], np.int32)
    return out
