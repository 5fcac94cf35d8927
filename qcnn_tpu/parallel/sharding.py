"""Sharding rules for PQ model parameters and the sharded forward pass.

Two tensor-parallel layouts for quantized FC layers (the only weight tensors
that matter — SURVEY.md §6: fc6 alone is ~6x all conv weights combined):

- ``column`` (default): assignments (Cout, S) and bias sharded over Cout on
  the model axis; codebooks replicated. Every device builds the full (tiny)
  LUT and gathers its slice of output channels; the activation all-gather
  between consecutive FCs is GSPMD-inserted and rides ICI.
- ``row``: codebooks (S, K, D) and assignments sharded over the sub-space
  axis S. Each device LUT-builds and gather-accumulates its sub-spaces'
  partial sums; a psum over the model axis produces the output. This is the
  PQ analogue of contraction-sharded (Megatron row-parallel) GEMM.

Conv parameters are replicated — they are KBs to a few MB and the conv path
is activation-bound.

Everything is expressed as NamedShardings on the params pytree plus
with_sharding_constraint hints; XLA GSPMD inserts the collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qcnn_tpu.core import FCSpec, ModelSpec, is_pq
from qcnn_tpu.models import network
from qcnn_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, batch_sharding


def param_shardings(
    spec: ModelSpec,
    params: Sequence[Optional[dict]],
    mesh: Mesh,
    *,
    fc_mode: str = "column",
) -> list:
    """NamedSharding pytree matching the params list."""
    if fc_mode not in ("column", "row", "replicated"):
        raise ValueError(f"unknown fc_mode {fc_mode!r}")
    rep = NamedSharding(mesh, P())
    out: list = []
    tp = mesh.shape[MODEL_AXIS]
    for layer, p in zip(spec.layers, params):
        if p is None:
            out.append(None)
            continue
        if isinstance(layer, FCSpec) and is_pq(p) and fc_mode != "replicated":
            cout, s = p["assignments"].shape
            # extra keys beyond the PQ triple (e.g. the OPQ "perm", int8
            # act_scale sidecars) replicate — missing them here used to
            # KeyError in shard_params on OPQ-quantized checkpoints
            extra = {k: rep for k in p
                     if k not in ("codebooks", "assignments", "bias")}
            if fc_mode == "column" and cout % tp == 0:
                out.append(
                    {
                        "codebooks": rep,
                        "assignments": NamedSharding(mesh, P(MODEL_AXIS, None)),
                        "bias": NamedSharding(mesh, P(MODEL_AXIS)),
                        **extra,
                    }
                )
                continue
            if fc_mode == "row" and s % tp == 0:
                out.append(
                    {
                        "codebooks": NamedSharding(mesh, P(MODEL_AXIS, None, None)),
                        "assignments": NamedSharding(mesh, P(None, MODEL_AXIS)),
                        "bias": rep,
                        **extra,
                    }
                )
                continue
        # conv params / dense fallbacks / non-divisible shapes: replicate
        out.append({k: rep for k in p})
    return out


def shard_params(
    spec: ModelSpec,
    params: Sequence[Optional[dict]],
    mesh: Mesh,
    *,
    fc_mode: str = "column",
) -> list:
    """Device_put the params according to param_shardings."""
    shardings = param_shardings(spec, params, mesh, fc_mode=fc_mode)
    out = []
    for p, s in zip(params, shardings):
        if p is None:
            out.append(None)
        else:
            # device_put accepts jax AND numpy arrays directly: the old
            # np.asarray(v) pulled already-device-resident params back
            # to host (a dense fc6 is ~151 MB) before re-uploading
            # (round-5 review)
            out.append({k: jax.device_put(v, s[k]) for k, v in p.items()})
    return out


def make_dp_forward(forward_fn, mesh: Mesh):
    """Data-parallel wrapper for an arbitrary forward(params, x_nhwc):
    batch sharded over `data`, params replicated. Works for the nested-
    pytree families (ResNet/ViT) whose tensors have no ModelSpec layout;
    GSPMD replicates them on first use."""

    def fwd(params, x):
        x = jax.lax.with_sharding_constraint(x, batch_sharding(mesh, x.ndim))
        out = forward_fn(params, x)
        return jax.lax.with_sharding_constraint(
            out, NamedSharding(mesh, P(DATA_AXIS, None))
        )

    return jax.jit(fwd)


def make_sharded_forward(
    spec: ModelSpec,
    mesh: Mesh,
    *,
    conv_impl: str = "auto",
    fc_impl: str = "auto",
    fc_mode: str = "column",
    with_softmax: bool = True,
    conv_impls=None,
    fc_impls=None,
    compute_dtype=None,
):
    """Jitted forward with batch sharded on `data` and FC tensors on `model`.

    The returned fn takes (sharded_params, x) and yields fully-replicated
    probabilities (GSPMD inserts the final all-gather/psum).

    conv_impls/fc_impls/compute_dtype: per-layer resolved strategies and
    the activation dtype from prepare_params — callers that prepared
    params MUST pass these or the forward silently re-resolves 'auto'
    against params the preparation already specialized (round-5 review
    finding: mesh engines lost their memory-mode strategies and bf16
    activation casting this way).
    """

    def fwd(params, x):
        x = jax.lax.with_sharding_constraint(x, batch_sharding(mesh, x.ndim))
        out = network.forward(
            params,
            x,
            spec=spec,
            conv_impl=conv_impl,
            fc_impl=fc_impl,
            conv_impls=conv_impls,
            fc_impls=fc_impls,
            compute_dtype=compute_dtype,
            with_softmax=with_softmax,
        )
        return jax.lax.with_sharding_constraint(
            out, NamedSharding(mesh, P(DATA_AXIS, None))
        )

    return jax.jit(fwd)
