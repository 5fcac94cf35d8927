"""The network executor: a jit-able forward pass over a ModelSpec.

Replaces the reference's CaffeEva dispatch loop (CaffeEva.cc:151-260,
:625-670). Differences by design:

- whole batches flow through XLA as one program (the reference loops images
  one at a time with batch=1, CaffeEva.cc:23,167);
- the spec is static data closed over by jit; parameters are a pytree list;
- per-layer PQ strategy is chosen up front (config or `auto` heuristics)
  instead of a global precise/approx flag.

Layout contract: activations are NHWC throughout (the reference's layout,
CvtDataLstToFeatMap permute CaffeEva.cc:1159); the first FC flattens in NCHW
order to match the Caffe weight layout (CaffeEva.cc:184-204).
"""

from __future__ import annotations

import functools
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
    is_pq,
)
from qcnn_tpu.ops import (
    caffe_max_pool,
    conv_dense,
    dropout_inference,
    fc_dense,
    lrn,
    pq_conv,
    pq_fc,
    relu,
    softmax,
)

# Per-layer PQ execution strategies. "auto" resolves to decode everywhere:
# measured on the attached chip (benchmarks/fc_kernels.py), the decode-GEMM
# runs at the HBM weight-stream roofline and beats every LUT formulation at
# every batch size — any gather realization pays ~S*K*Cout VPU select ops,
# ~170x slower per element than MXU MACs. The LUT paths remain as explicit
# memory-mode options (codebooks+assignments are ~21x smaller than dense);
# "indecode*" keep the compressed PQ params resident in HBM and decode the
# dense weight INSIDE the jitted step (dense copy is a per-layer transient,
# never stored); "memory" picks the best measured memory-mode kernel per
# layer geometry and batch (docs/KERNEL_STUDIES.md §9-§9f). These tuples
# are the request-level vocabulary enforced by resolve_strategy.
CONV_IMPLS = ("auto", "decode", "indecode", "indecode_ohwi", "indecode_hwoi",
              "gdecode", "gdecode_iohw", "gemm", "lut", "memory",
              "fusedconv", "memory_fused", "fc1x1")
FC_IMPLS = ("auto", "onehot", "gather", "decode", "indecode", "gdecode",
            "pallas", "fused", "fgather", "lutgather", "memory")


def _memory_fc_impl(p: dict, batch: int, dtype=None) -> str:
    """Best measured memory-mode FC kernel per batch (KERNEL_STUDIES §9c/9d,
    fc6-geometry A/B on the chip): batch-1 -> 'lutgather' (streams only the
    uint8 assignments — Cout*S bytes, 8x less than even the decoded bf16
    weight; measured below the timing floor vs indecode's 319 us); larger
    batches -> 'fgather' (the fused decode-GEMM kernel with in-kernel lane
    gather: 247-382 us vs indecode's 510-537 at fc6 B=8/256). lutgather's
    cost is linear in B (B*Cout*S gathers), so the crossover is early.
    K > 128 (one-vreg gather table) and f32 activations (the fused kernel
    computes bf16) fall back to indecode — one shared rule with the model
    families (models/common.py)."""
    from qcnn_tpu.models import common

    return common.fc_memory_impl(batch, p, dtype)


def resolve_strategy(
    spec: ModelSpec,
    params: Sequence[Optional[dict]],
    batch: int,
    conv_impl: str = "auto",
    fc_impl: str = "auto",
    dtype=None,
) -> tuple[tuple[str, ...], tuple[str, ...]]:
    """Resolve ('auto' | explicit) strategy names per layer index.

    dtype: the execution dtype (prepare_params' dtype); the fc 'memory'
    rule keeps f32 runs on the exact one-hot decode."""
    if conv_impl not in CONV_IMPLS:
        raise ValueError(
            f"unknown conv impl {conv_impl!r}; expected one of {CONV_IMPLS}"
        )
    if fc_impl not in FC_IMPLS:
        raise ValueError(
            f"unknown fc impl {fc_impl!r}; expected one of {FC_IMPLS}"
        )
    conv_choices = []
    fc_choices = []
    for layer, p in zip(spec.layers, params):
        if isinstance(layer, ConvSpec):
            if not is_pq(p):
                conv_choices.append("dense")
            elif conv_impl == "auto":
                conv_choices.append("decode")
            elif conv_impl == "memory":
                # Best measured one-program memory conv: one-hot decode
                # consumed in its native OHWI layout (the im2col GEMM
                # reroute measured worse e2e — §9f). The dense kernel is a
                # per-layer transient either way.
                conv_choices.append("indecode_ohwi")
            else:
                conv_choices.append(conv_impl)
            fc_choices.append("-")
        elif isinstance(layer, FCSpec):
            if not is_pq(p):
                fc_choices.append("dense")
            elif fc_impl == "auto":
                fc_choices.append("decode")
            elif fc_impl == "memory":
                fc_choices.append(_memory_fc_impl(p, batch, dtype))
            else:
                fc_choices.append(fc_impl)
            conv_choices.append("-")
        else:
            conv_choices.append("-")
            fc_choices.append("-")
    return tuple(conv_choices), tuple(fc_choices)


def forward(
    params: Sequence[Optional[dict]],
    x: jax.Array,
    *,
    spec: ModelSpec,
    conv_impl: str = "auto",
    fc_impl: str = "auto",
    with_softmax: bool = True,
    compute_dtype=None,
    conv_impls: Optional[tuple[str, ...]] = None,
    fc_impls: Optional[tuple[str, ...]] = None,
    collect_act_amax: bool = False,
    upto: Optional[int] = None,
) -> jax.Array:
    """Run the full forward pass.

    Args:
      params: one entry per layer; dict for conv/fc (PQ or dense), None for
        parameter-free layers.
      x: (B, H, W, C) NHWC activations (BGR, mean-subtracted).
      compute_dtype: when set (e.g. jnp.bfloat16), activations are kept in
        this dtype between layers; matmul/conv accumulation and the final
        softmax stay float32.
      conv_impls/fc_impls: pre-resolved per-layer strategies (from
        models.prepare.prepare_params); overrides conv_impl/fc_impl.
      collect_act_amax: also return {layer_index: amax(|input|)} for every
        conv/FC layer (one jittable program — the int8 calibration pass,
        models/calibrate.py).
      upto: stop and return the activation ENTERING layer `upto` (pre any
        FC flatten) — the prefix-forward hook the sequential error-corrected
        quantizer uses to collect per-layer calibration inputs
        (quantizer/sequential.py).
    Returns:
      (B, num_classes) class probabilities (or logits if with_softmax=False);
      with collect_act_amax, a (probs, amax_dict) tuple.
    """
    if x.ndim != 4:
        raise ValueError(f"expected NHWC input, got shape {x.shape}")
    if conv_impls is None or fc_impls is None:
        # resolve only the missing side — a caller passing one pre-resolved
        # tuple must not have it silently discarded
        conv_r, fc_r = resolve_strategy(
            spec, params, x.shape[0], conv_impl, fc_impl,
            dtype=(compute_dtype if compute_dtype is not None
                   else jnp.float32),
        )
        conv_impls = conv_impls if conv_impls is not None else conv_r
        fc_impls = fc_impls if fc_impls is not None else fc_r
    conv_strat, fc_strat = conv_impls, fc_impls
    if compute_dtype is not None:
        x = x.astype(compute_dtype)

    act_amax: dict[int, jax.Array] = {}

    def record_amax(i, v):
        if collect_act_amax:
            act_amax[i] = jnp.max(jnp.abs(v.astype(jnp.float32)))

    first_fc_done = False
    for i, (layer, p) in enumerate(zip(spec.layers, params)):
        if i == upto:
            return x
        if isinstance(layer, ConvSpec):
            record_amax(i, x)
            if conv_strat[i] == "dense":
                if "kernel_q" in p:
                    from qcnn_tpu.ops.conv import conv_dense_int8

                    x = conv_dense_int8(
                        x, p["kernel_q"], p["scale"], p["bias"],
                        stride=layer.stride, pad=layer.pad,
                        groups=layer.groups,
                        act_scale=p.get("act_scale"),
                        out_scale=p.get("out_scale"),
                    )
                else:
                    x = conv_dense(
                        x, p["kernel"], p["bias"],
                        stride=layer.stride, pad=layer.pad,
                        groups=layer.groups,
                        out_dtype=compute_dtype,
                    )
            else:
                x = pq_conv(
                    x, p,
                    stride=layer.stride, pad=layer.pad, groups=layer.groups,
                    impl=conv_strat[i], out_dtype=compute_dtype,
                )
            if compute_dtype is not None and x.dtype != jnp.int8:
                x = x.astype(compute_dtype)
        elif isinstance(layer, PoolSpec):
            x = caffe_max_pool(
                x, kernel=layer.kernel, stride=layer.stride, pad=layer.pad
            )
        elif isinstance(layer, FCSpec):
            if not first_fc_done:
                # NCHW flatten to match Caffe weight order (CaffeEva.cc:184-204)
                x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
                first_fc_done = True
            else:
                x = x.reshape(x.shape[0], -1)
            record_amax(i, x)
            if fc_strat[i] == "dense":
                if "weight_q" in p:
                    from qcnn_tpu.ops.fc import fc_dense_int8

                    x = fc_dense_int8(
                        x, p["weight_q"], p["scale"], p["bias"],
                        act_scale=p.get("act_scale"),
                        out_scale=p.get("out_scale"),
                    )
                else:
                    x = fc_dense(x, p["weight"], p["bias"],
                                 out_dtype=compute_dtype)
            else:
                x = pq_fc(x, p, impl=fc_strat[i], out_dtype=compute_dtype)
            if compute_dtype is not None and x.dtype != jnp.int8:
                x = x.astype(compute_dtype)
        elif isinstance(layer, ReLUSpec):
            x = relu(x)
        elif isinstance(layer, LRNSpec):
            # sum_dtype=compute_dtype: bf16 runs materialize the band
            # window-sum in bf16 (halves LRN's binding HBM stream); f32/None
            # are unchanged-exact (ops/misc.lrn)
            x = lrn(x, size=layer.size, alpha=layer.alpha, beta=layer.beta,
                    k=layer.k, channel_map=layer.channel_map,
                    sum_dtype=compute_dtype)
        elif isinstance(layer, DropoutSpec):
            x = dropout_inference(x)
        elif isinstance(layer, SoftmaxSpec):
            if with_softmax:
                x = softmax(x.astype(jnp.float32))
        else:
            raise TypeError(f"unhandled layer spec: {layer!r}")
    if collect_act_amax:
        return x, act_amax
    return x


def make_forward_fn(
    spec: ModelSpec,
    *,
    conv_impl: str = "auto",
    fc_impl: str = "auto",
    with_softmax: bool = True,
    donate_input: bool = False,
    compute_dtype=None,
    conv_impls: Optional[tuple[str, ...]] = None,
    fc_impls: Optional[tuple[str, ...]] = None,
):
    """Build a jitted forward(params, x) for a fixed spec/strategy."""
    fn = functools.partial(
        forward,
        spec=spec,
        conv_impl=conv_impl,
        fc_impl=fc_impl,
        with_softmax=with_softmax,
        compute_dtype=compute_dtype,
        conv_impls=conv_impls,
        fc_impls=fc_impls,
    )
    return jax.jit(fn, donate_argnums=(1,) if donate_input else ())


def top_k_labels(probs: jax.Array, k: int = 5) -> jax.Array:
    """Top-k class indices per example (CvtFeatMapToLablVec,
    CaffeEva.cc:1162-1190, without the destructive zero-out)."""
    _, idx = jax.lax.top_k(probs, k)
    return idx
