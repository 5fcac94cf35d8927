"""Pallas TPU kernel: PQ FC as LUT build + in-kernel dynamic-gather
accumulate — the reference's actual hot-path algorithm (CaffeEva.cc
GetInPdMat :1261-1296 then the per-output gather loop :1006-1017) executed
natively instead of reformulated as matmuls.

  out[b, o] = bias[o] + sum_s LUT[b, s, A[o, s]]

The LUT (B, S, K inner products) is built outside the kernel on the MXU
(ops/lut.build_lut — B*S*K*D MACs, trivial at small B). Inside the kernel
the LUT chunk sits VMEM-resident in the LANE orientation — (Sg, 128) f32
with one 128-entry codeword row per subspace sublane, the only gather
shape this toolchain compiles (_common.py constraints 1-4) — and the
accumulate is ONE tpu.dynamic_gather per (batch row, S-chunk, 128-output
tile) plus a sublane reduction.

Why this exists next to decode/indecode (KERNEL_STUDIES §9d): per step it
streams only the uint8 assignments (Cout*S bytes) — 8x less HBM than even
the bf16 decoded weight — so it is the latency play for batch-1/serving
where every other formulation is weight-stream bound, and the only
formulation whose traffic is independent of D. Cost scales linearly with
B (B*Cout*S gather elements), so large batches belong to decode/indecode.

Compiled-mode availability and speed measured by
tools/pallas_gather_probe.py + tools/decode_gather_ab.py (KERNEL_STUDIES
§9c/§9d); interpret mode keeps CPU tests exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qcnn_tpu.ops import lut as lut_ops
from qcnn_tpu.ops.pallas._common import auto_interpret, ceil_to, gather_lanes

_LANES = 128


def _kernel(lut_ref, asmt_ref, bias_ref, out_ref, *, b_chunk, block_s):
    """lut (b_chunk, Sg, 128) f32; asmt (Sg, 128) int8 TRANSPOSED codeword
    ids; bias (1, 128) f32; out (b_chunk, 128) f32 accumulated over the
    S-chunk grid axis. The b_chunk batch rows share one gather: tables
    stack along sublanes (b*Sg rows), the index block broadcasts."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        out_ref[:] = jnp.broadcast_to(bias_ref[0][None, :], out_ref.shape)

    idx = jnp.maximum(asmt_ref[:].astype(jnp.int32), 0)  # padding: -1
    idx_b = jnp.broadcast_to(
        idx[None], (b_chunk, block_s, _LANES)
    ).reshape(b_chunk * block_s, _LANES)
    vals = gather_lanes(
        lut_ref[:].reshape(b_chunk * block_s, _LANES), idx_b
    )
    out_ref[:] += vals.reshape(b_chunk, block_s, _LANES).sum(axis=1)


@functools.partial(
    jax.jit, static_argnames=("block_s", "interpret")
)
def _lut_gather(lut, asmt, bias, *, block_s, interpret):
    b, s, k = lut.shape
    cout, s_dim = asmt.shape
    assert s_dim == s
    s_pad = ceil_to(s, block_s)
    o_pad = ceil_to(cout, _LANES)
    # one kernel step covers the whole batch when b <= 8 (the out block's
    # sublane dim equals the full array dim, so any b is a legal block);
    # beyond that, grid over 8-row chunks
    b_chunk = b if b <= 8 else 8
    b_pad = ceil_to(b, b_chunk)

    # K pads to the 128-lane vreg (indices never reach the padding);
    # padded S rows are all-zero -> any index gathers 0
    lut_p = jnp.pad(
        lut.astype(jnp.float32),
        ((0, b_pad - b), (0, s_pad - s), (0, _LANES - k)),
    )
    # assignments stream TRANSPOSED (S, Cout) so the gather index block
    # matches the table block; padding entries hold -1 (clamped to 0)
    asmt_t = jnp.pad(
        asmt.astype(jnp.int8).T,
        ((0, s_pad - s), (0, o_pad - cout)),
        constant_values=-1,
    )
    bias_p = jnp.pad(
        bias.astype(jnp.float32), (0, o_pad - cout)
    ).reshape(1, o_pad)

    grid = (b_pad // b_chunk, o_pad // _LANES, s_pad // block_s)
    out = pl.pallas_call(
        functools.partial(_kernel, b_chunk=b_chunk, block_s=block_s),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (b_chunk, block_s, _LANES), lambda bb, j, kk: (bb, kk, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_s, _LANES), lambda bb, j, kk: (kk, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, _LANES), lambda bb, j, kk: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (b_chunk, _LANES), lambda bb, j, kk: (bb, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, o_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * o_pad * s_pad,
            bytes_accessed=(
                b_pad * s_pad * _LANES * 4
                + s_pad * o_pad
                + b_pad * o_pad * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(lut_p, asmt_t, bias_p)
    return out[:b, :cout]


def pq_fc_lut_gather(
    x: jax.Array,
    params: dict,
    *,
    block_s: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """PQ FC via LUT build + in-kernel gather-accumulate.

    Args:
      x: (B, Cin) activations.
      params: {"codebooks" (S,K,D), "assignments" (Cout,S) uint8, "bias"}.
      block_s: subspace sublane tile size.
      interpret: force interpreter mode; default auto (True off-TPU).
    """
    interpret = auto_interpret(interpret)
    k = params["codebooks"].shape[1]
    if k > _LANES:
        raise ValueError(
            f"lut-gather kernel supports K <= {_LANES} (one vreg of table "
            f"lanes); got K={k}"
        )
    lut = lut_ops.build_lut(x, params["codebooks"])  # (B, S, K) f32
    s = lut.shape[1]
    return _lut_gather(
        lut,
        jnp.asarray(params["assignments"]),
        jnp.asarray(params["bias"]),
        block_s=min(block_s, ceil_to(s, 8)),
        interpret=interpret,
    )
