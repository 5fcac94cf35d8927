"""One-time parameter preparation for execution (the PrepCtrdBuf/PrepAsmtBuf
analogue, CaffeEva.cc:534-623).

The reference permutes codebooks/assignments into gather-friendly layouts once
at load. Here preparation does the TPU equivalents, once, outside the jitted
step:

- ``decode`` layers: decode codebooks+assignments to a dense kernel/weight in
  the compute dtype. PQ(x) == W̃x exactly (ops/lut.py), so this is a lossless
  layout change, trading HBM capacity (the dense copy) for speed-of-light MXU
  execution. fc6 f32 dense is 151 MB; bf16 halves the per-step weight stream.
- ``lut``/``onehot``/``pallas`` layers: keep codebooks+assignments (the 21x
  smaller representation) and only cast/transpose: codebooks to the compute
  dtype, assignments pre-transposed to (S, Cout) for the Pallas kernel.

The returned params list feeds models.network.forward unchanged: decoded
layers look like dense layers, PQ layers keep their PQ dict.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from qcnn_tpu.core import ConvSpec, FCSpec, ModelSpec, is_pq
from qcnn_tpu.models import network
from qcnn_tpu.ops import lut as lut_ops


def prepare_params(
    spec: ModelSpec,
    params: Sequence[Optional[dict]],
    *,
    batch_hint: int = 1,
    conv_impl: str = "auto",
    fc_impl: str = "auto",
    dtype=jnp.bfloat16,
) -> tuple[list, tuple[str, ...], tuple[str, ...]]:
    """Resolve strategies and pre-decode/pre-layout parameters.

    Returns (prepared_params, conv_impls, fc_impls) where the impl tuples are
    the per-layer strategies to pass to network.forward (decoded layers
    become 'dense').
    """
    conv_strat, fc_strat = network.resolve_strategy(
        spec, params, batch_hint, conv_impl, fc_impl
    )
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
                out.append(
                    {"kernel": jnp.asarray(p["kernel"], dtype),
                     "bias": jnp.asarray(p["bias"], jnp.float32)}
                )
            elif conv_strat[i] == "decode":
                kernel = lut_ops.decode_conv_kernel(
                    jnp.asarray(p["codebooks"]),
                    jnp.asarray(p["assignments"]),
                    c // layer.groups,
                )
                conv_final.append("dense")
                out.append(
                    {"kernel": kernel.astype(dtype),
                     "bias": jnp.asarray(p["bias"], jnp.float32)}
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
                out.append(
                    {"weight": jnp.asarray(p["weight"], dtype),
                     "bias": jnp.asarray(p["bias"], jnp.float32)}
                )
            elif fc_strat[i] == "decode":
                cin = h * w * c
                weight = lut_ops.decode_fc_weight(
                    jnp.asarray(p["codebooks"]),
                    jnp.asarray(p["assignments"]),
                    cin,
                )
                fc_final.append("dense")
                out.append(
                    {"weight": weight.astype(dtype),
                     "bias": jnp.asarray(p["bias"], jnp.float32)}
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
    q = {
        "codebooks": jnp.asarray(p["codebooks"], dtype),
        "assignments": jnp.asarray(np.asarray(p["assignments"])),
        "bias": jnp.asarray(p["bias"], jnp.float32),
    }
    return q
