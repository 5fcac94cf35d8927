"""Pallas TPU kernel: PQ fully-connected gather-accumulate.

The reference's inner loop (CaffeEva.cc:1006-1017) walks, per output channel
o and sub-space s, `out[o] += lut[s, A[o, s]]` — a random uint8-indexed read.
TPUs have no fast gather; the TPU-native formulation turns each group of G
sub-spaces into a (B, G*K) x (G*K, Cout_tile) matmul where the right operand
is the one-hot expansion of the assignment indices, built on the fly in VMEM
from int8 — the MXU executes the gather as a select-accumulate at full tilt
and the only HBM traffic for the "weights" is the int8 assignment map itself
(21x smaller than the decoded dense matrix, SURVEY.md §6).

Grid layout: (batch tiles, output tiles), output innermost. The LUT block's
index map depends only on the batch tile, so Pallas keeps it resident in
VMEM across all output tiles — the LUT is read from HBM once per batch tile
regardless of Cout.

G = max(8, 128 // K) sub-spaces per matmul keeps the contraction dimension at
>= the MXU-native 128 AND the dynamic sublane slice of the assignment block
at >= 8 rows — Mosaic rejects (crashes on) dynamic slices of fewer than 8
sublanes inside fori_loop, found empirically: G=4 slices fail to compile,
G=8 succeed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qcnn_tpu.ops import lut as lut_ops
from qcnn_tpu.ops.pallas._common import auto_interpret, ceil_to


def _kernel(lut_ref, asmt_ref, bias_ref, out_ref, *, num_groups, group, k):
    """lut (Bt, Sg*G*K) f32, asmt (Sg*G, Ct) int8, bias (1, Ct), out (Bt, Ct)."""
    ct = out_ref.shape[1]

    def body(g, acc):
        a = lut_ref[:, pl.ds(g * group * k, group * k)]          # (Bt, G*K)
        idx = asmt_ref[pl.ds(g * group, group), :].astype(jnp.int32)
        iota = lax.broadcasted_iota(jnp.int32, (group, k, ct), 1)
        onehot = (iota == idx[:, None, :]).astype(jnp.float32)
        return acc + jnp.dot(
            a,
            onehot.reshape(group * k, ct),
            preferred_element_type=jnp.float32,
        )

    init = jnp.zeros(out_ref.shape, jnp.float32)
    acc = lax.fori_loop(0, num_groups, body, init)
    out_ref[:] = acc + bias_ref[0, :][None, :]


@functools.partial(
    jax.jit, static_argnames=("block_b", "block_o", "interpret")
)
def _pq_fc_pallas(
    x, codebooks, asmt_t, bias, *, block_b, block_o, interpret
):
    b, _ = x.shape
    s, k, d = codebooks.shape
    s_dim, cout = asmt_t.shape
    assert s_dim == s

    group = max(8, 128 // k)
    s_pad = ceil_to(s, group)
    num_groups = s_pad // group
    b_pad = ceil_to(b, block_b)
    o_pad = ceil_to(cout, block_o)

    lut = lut_ops.build_lut(x, codebooks)                # (B, S, K)
    lut = lut.reshape(b, s * k)
    lut = jnp.pad(lut, ((0, b_pad - b), (0, (s_pad - s) * k)))
    asmt_p = jnp.pad(asmt_t, ((0, s_pad - s), (0, o_pad - cout)))
    bias_p = jnp.pad(bias, (0, o_pad - cout)).reshape(1, o_pad)

    out = pl.pallas_call(
        functools.partial(
            _kernel, num_groups=num_groups, group=group, k=k
        ),
        grid=(b_pad // block_b, o_pad // block_o),
        in_specs=[
            pl.BlockSpec(
                (block_b, s_pad * k),
                lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (s_pad, block_o),
                lambda i, j: (0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_o), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_b, block_o), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, o_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * s_pad * k * o_pad,
            bytes_accessed=b_pad * s_pad * k * 4 + s_pad * o_pad + o_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(lut, asmt_p, bias_p)
    return out[:b, :cout]


def pq_fc_pallas(
    x: jax.Array,
    params: dict,
    *,
    block_b: int = 8,
    block_o: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """PQ FC forward via the Pallas gather-matmul kernel.

    Args:
      x: (B, Cin) activations.
      params: {"codebooks" (S,K,D), "assignments" (Cout,S) uint8, "bias"}.
      block_b/block_o: batch / output-channel tile sizes. The LUT block is
        (block_b, S*K) floats and must fit VMEM: AlexNet fc6 at block_b=8 is
        2.4 MB.
      interpret: force Pallas interpreter mode; default auto (True off-TPU).
    """
    interpret = auto_interpret(interpret)
    k = params["codebooks"].shape[1]
    idx_dtype = jnp.int8 if k <= 128 else jnp.int32
    asmt_t = jnp.asarray(params["assignments"]).astype(idx_dtype).T  # (S, Cout)
    return _pq_fc_pallas(
        x,
        jnp.asarray(params["codebooks"]),
        asmt_t,
        jnp.asarray(params["bias"]),
        block_b=block_b,
        block_o=block_o,
        interpret=interpret,
    )
