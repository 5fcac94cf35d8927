"""Pallas TPU kernel: PQ weight decode via in-VMEM dynamic gather.

The in-step decode ('indecode') memory mode reconstructs the dense weight
inside the jitted step from HBM-resident codebooks + uint8 assignments
(replacing the reference's per-output LUT gather loop, CaffeEva.cc:848-861,
:1006-1017). Its XLA formulation is a one-hot matmul
(`lut.decode_*_onehot`), which pays K/D extra MXU FLOPs and, at conv
geometry (K=128, D=4), a (A, K)-shaped one-hot operand 32x the size of the
decoded weight itself.

This kernel instead decodes with Mosaic's per-lane dynamic gather
(`jnp.take_along_axis(table, idx, axis=0)` inside the kernel — lowered to
`tpu.dynamic_gather`):

  - codebooks sit VMEM-resident in the (K*D, S) layout (row k*D + d holds
    codeword k's d-th component for every subspace — lanes are subspaces,
    so the gather index A[n, s]*D + d varies per lane exactly as the
    hardware gather expects);
  - assignment tiles stream as int32 row indices;
  - one gather per d produces the (N, S) slice of the decoded weight —
    ~1 VPU op per weight element instead of 2K select-accumulates
    (ops/pallas/pq_fc_fused.py) or K/D-fold one-hot MACs.

Compiled-mode availability and speed are probed by
tools/pallas_gather_probe.py; measured decode numbers live in
docs/KERNEL_STUDIES.md §9c. Interpret mode keeps CPU tests exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qcnn_tpu.ops.pallas._common import auto_interpret, ceil_to


def _decode_kernel(cb_ref, asmt_ref, out_ref, *, d_len):
    """cb (K*D, Sg); asmt (Nt, Sg) int8 (K <= 128) or int32 codeword ids;
    out (D, Nt, Sg) — out[d, n, s] = cb[asmt[n, s]*D + d, s]. The id->row
    scale happens in VMEM so the HBM index stream stays 1 byte/element."""
    idx = asmt_ref[:].astype(jnp.int32) * d_len
    for d in range(d_len):
        out_ref[d] = jnp.take_along_axis(cb_ref[:], idx + d, axis=0)


@functools.partial(
    jax.jit, static_argnames=("block_n", "block_s", "interpret")
)
def _decode_rows(codebooks, assignments, *, block_n, block_s, interpret):
    """Decode (N, S) assignments to (N, S, D) codeword rows."""
    s, k, d = codebooks.shape
    n = assignments.shape[0]
    s_pad = ceil_to(s, block_s)
    n_pad = ceil_to(n, block_n)

    # table rows pad to the 8-sublane Mosaic minimum (indices never reach
    # the zero padding: idx <= (K-1)*D + D-1 = K*D - 1)
    rows = ceil_to(k * d, 8)
    cb = codebooks.transpose(1, 2, 0).reshape(k * d, s)
    cb = jnp.pad(cb, ((0, rows - k * d), (0, s_pad - s)))
    # int8 ids stream 1 byte/element from HBM for K <= 128 (codeword ids
    # 0..127 fit int8 exactly); wider codebooks fall back to int32.
    # Padding rows/lanes index row 0 (valid — sliced off below).
    idx_dtype = jnp.int8 if k <= 128 else jnp.int32
    idx = jnp.pad(
        assignments.astype(idx_dtype),
        ((0, n_pad - n), (0, s_pad - s)),
    )

    grid = (n_pad // block_n, s_pad // block_s)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, d_len=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (rows, block_s), lambda i, j: (0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_n, block_s), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (d, block_n, block_s), lambda i, j: (0, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((d, n_pad, s_pad), codebooks.dtype),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=(
                n_pad * s_pad * jnp.dtype(idx_dtype).itemsize
                + d * n_pad * s_pad * codebooks.dtype.itemsize
                + s_pad * k * d * codebooks.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(cb, idx)
    # (D, N, S) -> (N, S, D)
    return out[:, :n, :s].transpose(1, 2, 0)


def _block_n(requested: int, n: int, dtype) -> int:
    """Clamp the row tile: >= the Mosaic sublane minimum for the output
    dtype (16 rows for 16-bit types, 8 otherwise), <= the padded row
    count."""
    min_rows = 16 if jnp.dtype(dtype).itemsize == 2 else 8
    return max(min_rows, min(requested, ceil_to(n, min_rows)))


def decode_fc_weight_gather(
    codebooks: jax.Array,
    assignments: jax.Array,
    in_features: int,
    *,
    block_n: int = 512,
    block_s: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """`lut.decode_fc_weight` via the Pallas gather kernel: (Cin, Cout)."""
    s, k, d = codebooks.shape
    rows = _decode_rows(
        codebooks, assignments,
        block_n=_block_n(block_n, assignments.shape[0], codebooks.dtype),
        block_s=min(block_s, ceil_to(s, 128)),
        interpret=auto_interpret(interpret),
    )
    w = rows.reshape(assignments.shape[0], s * d)[:, :in_features]
    return w.T


def decode_conv_kernel_gather(
    codebooks: jax.Array,
    assignments: jax.Array,
    in_channels_per_group: int,
    *,
    block_n: int = 512,
    block_s: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """`lut.decode_conv_kernel` via the Pallas gather kernel:
    (kh, kw, Cg, Cout) HWIO."""
    s, k, d = codebooks.shape
    cout, kh, kw, s2 = assignments.shape
    rows = _decode_rows(
        codebooks, assignments.reshape(cout * kh * kw, s),
        block_n=_block_n(block_n, cout * kh * kw, codebooks.dtype),
        block_s=min(block_s, ceil_to(s, 128)),
        interpret=auto_interpret(interpret),
    )
    w = rows.reshape(cout, kh, kw, s * d)[..., :in_channels_per_group]
    return jnp.transpose(w, (1, 2, 3, 0))
