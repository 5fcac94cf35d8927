"""Fully-connected ops: dense and PQ paths.

Reference semantics: CalcFeatMap_FCntPrec (CaffeEva.cc:932-966, one sgemm with
transposed weights + bias) and CalcFeatMap_FCntAprx (:968-1025, LUT build once
per batch then per-subspace gather-accumulate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qcnn_tpu.ops import lut as lut_ops


def fc_dense(x: jax.Array, weight: jax.Array, bias: jax.Array,
             out_dtype=None) -> jax.Array:
    """x: (B, Cin), weight: (Cin, Cout) -> (B, Cout). Computes in the
    weight's dtype with float32 accumulation.

    out_dtype: emit this dtype from the GEMM and add the bias in it (same
    rationale as ops/conv.conv_dense — dots CAN fuse converts, but emitting
    the final dtype avoids the f32 round-trip when the consumer is bf16)."""
    if x.dtype == jnp.int8:
        # int8 activations are QUANTIZED CODES (the int8-native dataflow,
        # ops §6c); astype would reinterpret them as float values and
        # silently compute garbage scaled by the activation scale
        # (round-5 review). A float consumer after an int8 producer is a
        # prepare-plan bug; fail loudly.
        raise ValueError(
            "fc_dense received int8 activation codes; the consumer must "
            "be an int8 op (fc_dense_int8) or the producer must not "
            "requantize (out_scale)"
        )
    if x.dtype != weight.dtype:
        x = x.astype(weight.dtype)
    out = jnp.dot(x, weight, preferred_element_type=(out_dtype or
                                                     jnp.float32))
    if out_dtype is not None:
        bias = bias.astype(out_dtype)
    return out + bias


def quantize_activations_int8(
    x: jax.Array, act_scale: jax.Array | None = None
) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-tensor int8 activation quantization: (x_q, scale) with
    x ≈ x_q * scale.

    With ``act_scale`` (a static scale from an offline calibration pass,
    models/calibrate.py) the amax reduction disappears entirely — the
    dynamic variant re-reads the whole activation tensor for the amax
    before quantizing, which measurably regressed int8 below bf16 at batch
    256 in round 1 (docs/KERNEL_STUDIES.md §6).

    int8 INPUT passthrough (the int8-native dataflow): when the producer
    layer already emitted int8 codes in this layer's calibrated scale (the
    ``out_scale`` requantize epilogue below), there is nothing to quantize
    — the codes ride straight into the int8 MXU op with the static scale.
    """
    if x.dtype == jnp.int8:
        if act_scale is None:
            raise ValueError(
                "int8-domain activations need a static act_scale (the "
                "producer's out_scale) — dynamic amax cannot recover the "
                "quantization grid from codes"
            )
        return x, jnp.maximum(jnp.asarray(act_scale, jnp.float32),
                              1e-12 / 127.0)
    xf = x.astype(jnp.float32)
    if act_scale is None:
        amax = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12)
        scale = amax / 127.0
    else:
        # same epsilon floor as the dynamic branch: a zero static scale
        # (all-dead calibration layer from an old sidecar) must quantize
        # to zeros, not divide to NaN
        scale = jnp.maximum(jnp.asarray(act_scale, jnp.float32),
                            1e-12 / 127.0)
    xq = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def requantize_int8(
    acc: jax.Array,
    x_scale: jax.Array,
    w_scale: jax.Array,
    bias: jax.Array,
    out_scale: jax.Array,
) -> jax.Array:
    """Fold dequantize + next-layer quantize into one epilogue:
    q_out = clip(round((acc*s_x*s_w + bias) / s_out)). Exactly the value the
    old float round-trip would re-quantize — ReLU and max-pool commute with
    symmetric per-tensor quantization (monotone, q(0)=0), so downstream
    relu/pool run directly on the int8 codes and the consumer layer skips
    its activation-quantize pass entirely (the pass §6b measured as the
    int8-vs-bf16 throughput gap)."""
    out_scale = jnp.maximum(jnp.asarray(out_scale, jnp.float32),
                            1e-12 / 127.0)
    m = (x_scale * w_scale) / out_scale
    y = acc.astype(jnp.float32) * m + bias / out_scale
    return jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)


def fc_dense_int8(
    x: jax.Array,
    weight_q: jax.Array,
    w_scale: jax.Array,
    bias: jax.Array,
    act_scale: jax.Array | None = None,
    out_scale: jax.Array | None = None,
) -> jax.Array:
    """int8 GEMM: weight_q (Cin, Cout) int8 with per-output-channel scales
    (models/prepare.py int8 mode); activations quantized on the fly (or via
    a static calibrated scale). The MXU runs int8 at ~1.6x its bf16 rate on
    the attached chip (269 TOP/s measured) and the weight HBM stream halves
    vs bf16.

    out_scale: emit int8 codes in the CONSUMER's calibrated input scale
    (requantize_int8) instead of dequantized floats — the int8-native
    dataflow (prepare_params plants it wherever the path to the next
    conv/FC only crosses relu/pool/dropout/flatten)."""
    xq, x_scale = quantize_activations_int8(x, act_scale)
    acc = jax.lax.dot_general(
        xq, weight_q,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    if out_scale is not None:
        return requantize_int8(acc, x_scale, w_scale, bias, out_scale)
    return acc.astype(jnp.float32) * (x_scale * w_scale) + bias


def pq_fc_onehot(x: jax.Array, params: dict, out_dtype=None) -> jax.Array:
    """PQ FC via LUT + one-hot matmul (MXU-friendly gather-accumulate)."""
    codebooks = params["codebooks"]
    assignments = params["assignments"]  # (Cout, S)
    s, k, d = codebooks.shape
    lut = lut_ops.build_lut(x, codebooks)  # (B, S, K)
    onehot = lut_ops.assignments_one_hot(assignments.T, k)  # (S, Cout, K)
    out = jnp.einsum(
        "bsk,sok->bo", lut, onehot,
        preferred_element_type=(out_dtype or jnp.float32),
    )
    bias = params["bias"]
    if out_dtype is not None:
        bias = bias.astype(out_dtype)
    return out + bias


def pq_fc_gather(x: jax.Array, params: dict) -> jax.Array:
    """PQ FC via explicit LUT gather (closest to the reference's pointer walk,
    CaffeEva.cc:1006-1017). Reference implementation for parity tests; XLA
    lowers the gather well on CPU, the TPU production path is the one-hot
    matmul or the Pallas kernel."""
    codebooks = params["codebooks"]
    assignments = params["assignments"].astype(jnp.int32)  # (Cout, S)
    lut = lut_ops.build_lut(x, codebooks)  # (B, S, K)

    def per_example(lut_b):
        g = jnp.take_along_axis(lut_b, assignments.T, axis=1)  # (S, Cout)
        return g.sum(axis=0)

    return jax.vmap(per_example)(lut) + params["bias"]


def pq_fc_decode(x: jax.Array, params: dict, out_dtype=None) -> jax.Array:
    """PQ FC via decode-to-dense + MXU GEMM. Mathematically identical to the
    LUT path; fastest when weight HBM traffic amortizes over a large batch."""
    w = lut_ops.decode_fc_weight(
        params["codebooks"], params["assignments"], x.shape[-1]
    )
    return fc_dense(x, w, params["bias"], out_dtype=out_dtype)


def pq_fc_indecode(x: jax.Array, params: dict, out_dtype=None) -> jax.Array:
    """Memory-mode PQ FC: decode the dense weight INSIDE the step (one-hot
    matmul decode — the gather lowering measures 29-81 ms/geometry on TPU,
    KERNEL_STUDIES §9b) then run the dense GEMM. Compressed params are the
    only resident weights; the dense copy is a transient."""
    w = lut_ops.decode_fc_weight_onehot(
        params["codebooks"], params["assignments"], x.shape[-1]
    )
    return fc_dense(x, w, params["bias"], out_dtype=out_dtype)


def pq_fc_gdecode(x: jax.Array, params: dict, out_dtype=None) -> jax.Array:
    """Memory-mode PQ FC: in-step decode via the Pallas dynamic-gather
    kernel (ops/pallas/pq_decode.py) then the dense GEMM — ~1 VPU op per
    decoded weight element vs the one-hot decode's K/D-fold MXU MACs."""
    from qcnn_tpu.ops.pallas import decode_fc_weight_gather

    w = decode_fc_weight_gather(
        params["codebooks"], params["assignments"], x.shape[-1]
    )
    return fc_dense(x, w, params["bias"], out_dtype=out_dtype)


def pq_fc(x: jax.Array, params: dict, impl: str = "onehot",
          out_dtype=None) -> jax.Array:
    """out_dtype: emit this dtype from the final contraction (same
    materialization rationale as fc_dense; Pallas/gather impls keep their
    fixed output dtypes and the caller casts)."""
    if "perm" in params:
        # OPQ input permutation (quantizer/opq.py): sub-spaces were fit on
        # w[:, perm], so every in-graph formulation consumes x[..., perm].
        # Decode-at-load params never reach here (prepare folds the
        # permutation into the dense weight).
        x = jnp.take(x, jnp.asarray(params["perm"]), axis=-1)
    if impl == "onehot":
        return pq_fc_onehot(x, params, out_dtype=out_dtype)
    if impl == "gather":
        return pq_fc_gather(x, params)
    if impl == "decode":
        return pq_fc_decode(x, params, out_dtype=out_dtype)
    if impl == "indecode":
        return pq_fc_indecode(x, params, out_dtype=out_dtype)
    if impl == "gdecode":
        return pq_fc_gdecode(x, params, out_dtype=out_dtype)
    if impl == "pallas":
        from qcnn_tpu.ops.pallas import pq_fc_pallas

        return pq_fc_pallas(x, params)
    if impl == "lutgather":
        from qcnn_tpu.ops.pallas import pq_fc_lut_gather

        return pq_fc_lut_gather(x, params)
    if impl == "fused":
        from qcnn_tpu.ops.pallas import pq_fc_fused

        return pq_fc_fused(x, params)
    if impl == "fgather":
        from qcnn_tpu.ops.pallas import pq_fc_fused

        return pq_fc_fused(x, params, decode="gather")
    raise ValueError(f"unknown pq_fc impl: {impl}")
