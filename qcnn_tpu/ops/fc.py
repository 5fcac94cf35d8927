"""Fully-connected ops: dense and PQ paths.

Reference semantics: CalcFeatMap_FCntPrec (CaffeEva.cc:932-966, one sgemm with
transposed weights + bias) and CalcFeatMap_FCntAprx (:968-1025, LUT build once
per batch then per-subspace gather-accumulate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qcnn_tpu.ops import lut as lut_ops


def fc_dense(x: jax.Array, weight: jax.Array, bias: jax.Array) -> jax.Array:
    """x: (B, Cin), weight: (Cin, Cout) -> (B, Cout). Computes in the
    weight's dtype with float32 accumulation."""
    if x.dtype != weight.dtype:
        x = x.astype(weight.dtype)
    return jnp.dot(x, weight, preferred_element_type=jnp.float32) + bias


def pq_fc_onehot(x: jax.Array, params: dict) -> jax.Array:
    """PQ FC via LUT + one-hot matmul (MXU-friendly gather-accumulate)."""
    codebooks = params["codebooks"]
    assignments = params["assignments"]  # (Cout, S)
    s, k, d = codebooks.shape
    lut = lut_ops.build_lut(x, codebooks)  # (B, S, K)
    onehot = lut_ops.assignments_one_hot(assignments.T, k)  # (S, Cout, K)
    out = jnp.einsum(
        "bsk,sok->bo", lut, onehot, preferred_element_type=jnp.float32
    )
    return out + params["bias"]


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


def pq_fc_decode(x: jax.Array, params: dict) -> jax.Array:
    """PQ FC via decode-to-dense + MXU GEMM. Mathematically identical to the
    LUT path; fastest when weight HBM traffic amortizes over a large batch."""
    w = lut_ops.decode_fc_weight(
        params["codebooks"], params["assignments"], x.shape[-1]
    )
    return fc_dense(x, w, params["bias"])


def pq_fc(x: jax.Array, params: dict, impl: str = "onehot") -> jax.Array:
    if impl == "onehot":
        return pq_fc_onehot(x, params)
    if impl == "gather":
        return pq_fc_gather(x, params)
    if impl == "decode":
        return pq_fc_decode(x, params)
    if impl == "pallas":
        from qcnn_tpu.ops.pallas import pq_fc_pallas

        return pq_fc_pallas(x, params)
    raise ValueError(f"unknown pq_fc impl: {impl}")
