"""Pallas TPU kernel: PQ weight decode via in-VMEM dynamic LANE gather.

The in-step decode ('indecode') memory mode reconstructs the dense weight
inside the jitted step from HBM-resident codebooks + uint8 assignments
(replacing the reference's per-output LUT gather loop, CaffeEva.cc:848-861,
:1006-1017). Its XLA formulation is a one-hot matmul
(`lut.decode_*_onehot`), which pays K/D extra MXU FLOPs and, at conv
geometry (K=128, D=4), a (A, K)-shaped one-hot operand 32x the size of the
decoded weight itself.

This kernel instead decodes with Mosaic's dynamic gather
(`tpu.dynamic_gather` via the lax.gather pattern in _common.gather_lanes).
The v5e constraints (measured, tools/pallas_gather_probe.py + KERNEL_STUDIES
§9c) force the LANE orientation — the table must fit one vreg along the
gather axis (128 lanes, and every PQ config has K <= 128), gathers are
32-bit only, and the index block must have the same shape as the table
block:

  - per-component codeword tables sit VMEM-resident as f32 (D, S, 128):
    table[d, s, k] = cb[s, k, d] — one independent 128-entry table per
    (d, subspace) sublane row;
  - assignments stream TRANSPOSED as (S, N) int8 codeword ids (1
    byte/element from HBM), widened to i32 lane indices in VMEM;
  - one lane gather per (d, S-block) produces out[d, s, n] =
    cb[s, A[n, s], d] — ~1 VPU op per decoded element instead of 2K
    select-accumulates (ops/pallas/pq_fc_fused.py) or K/D-fold one-hot
    MACs; the f32 gather result converts to the output dtype in-register.

The (D, S, N) output layout means the fc consumer's (Cin, Cout) weight is
a pure reshape of the (S, D, N) transpose done by XLA outside the kernel.

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

from qcnn_tpu.ops.pallas._common import (
    auto_interpret,
    ceil_to,
    gather_lanes,
)

_LANES = 128


def _decode_kernel(tab_ref, asmt_ref, out_ref, *, d_len):
    """tab (D, Sb, 128) f32 codeword tables; asmt (Sb, 128) int8 codeword
    ids (K <= 128); out (D, Sb, 128) — out[d, s, n] = tab[d, s,
    asmt[s, n]]. The id widening to i32 happens in VMEM so the HBM index
    stream stays 1 byte/element."""
    idx = asmt_ref[:].astype(jnp.int32)
    for d in range(d_len):
        out_ref[d] = gather_lanes(tab_ref[d], idx).astype(out_ref.dtype)


def _decode_kernel_sdn(tab_ref, asmt_ref, out_ref, *, d_len):
    """Like _decode_kernel but out is (Sb, D, 128) — out[s, d, n] =
    tab[d, s, asmt[s, n]], i.e. rows already in the weight's Cin order
    (s*D + d), so the consumer needs NO post-kernel transpose (the XLA
    relayouts cost 2 full weight round-trips; KERNEL_STUDIES §9e). The
    writes are per-d masked sublane stores into the (D, 128)-tiled block."""
    idx = asmt_ref[:].astype(jnp.int32)
    for d in range(d_len):
        out_ref[:, d, :] = gather_lanes(tab_ref[d], idx).astype(
            out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_s", "interpret", "interleaved")
)
def _decode_sdn(codebooks, assignments, *, block_s, interpret,
                interleaved=False):
    """Decode (N, S) assignments to (S, D, N) codeword components.

    interleaved=True writes rows in Cin order inside the kernel and
    returns the raw padded (S_pad, D, N_pad) buffer (callers reshape/slice
    — views) instead of paying a post-kernel XLA transpose."""
    s, k, d = codebooks.shape
    if k > _LANES:
        raise ValueError(
            f"gather decode supports K <= {_LANES} (one vreg of lanes); "
            f"got K={k}"
        )
    n = assignments.shape[0]
    s_pad = ceil_to(s, block_s)
    n_pad = ceil_to(n, _LANES)

    # tables: (S, K, D) -> (D, S, K), K zero-padded to the 128-lane vreg
    # (indices never reach the padding: idx <= K-1), f32 per constraint 4
    tab = codebooks.astype(jnp.float32).transpose(2, 0, 1)
    tab = jnp.pad(tab, ((0, 0), (0, s_pad - s), (0, _LANES - k)))
    # transposed int8 ids stream 1 byte/element from HBM (codeword ids
    # 0..127 fit int8 exactly); padding rows/lanes index lane 0 (valid —
    # sliced off below)
    idx = jnp.pad(
        assignments.astype(jnp.int8).T,
        ((0, s_pad - s), (0, n_pad - n)),
    )

    grid = (s_pad // block_s, n_pad // _LANES)
    cost = pl.CostEstimate(
        flops=0,
        bytes_accessed=(
            s_pad * n_pad
            + d * s_pad * n_pad * codebooks.dtype.itemsize
            + s_pad * _LANES * d * 4
        ),
        transcendentals=0,
    )
    in_specs = [
        pl.BlockSpec(
            (d, block_s, _LANES), lambda i, j: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (block_s, _LANES), lambda i, j: (i, j),
            memory_space=pltpu.VMEM,
        ),
    ]
    if interleaved:
        # rows already in Cin order (s*D + d): reshape is a view, no
        # post-kernel transpose (KERNEL_STUDIES §9e)
        out = pl.pallas_call(
            functools.partial(_decode_kernel_sdn, d_len=d),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (block_s, d, _LANES), lambda i, j: (i, 0, j),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (s_pad, d, n_pad), codebooks.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(tab, idx)
        return out  # (S_pad, D, N_pad); caller reshapes/slices (views)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, d_len=d),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (d, block_s, _LANES), lambda i, j: (0, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((d, s_pad, n_pad), codebooks.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(tab, idx)
    # (D, S, N) -> (S, D, N): rows of the (Cin, N) weight are s*D + d
    return out[:, :s, :n].transpose(1, 0, 2)


def _block_s(requested: int, s: int, dtype) -> int:
    """Clamp the subspace sublane tile: >= the Mosaic sublane minimum for
    the output dtype (16 rows for 16-bit types, 8 otherwise), <= the
    padded subspace count."""
    min_rows = 16 if jnp.dtype(dtype).itemsize == 2 else 8
    return max(min_rows, min(requested, ceil_to(s, min_rows)))


def decode_fc_weight_gather(
    codebooks: jax.Array,
    assignments: jax.Array,
    in_features: int,
    *,
    block_s: int = 512,
    interpret: bool | None = None,
    interleaved: bool = True,
) -> jax.Array:
    """`lut.decode_fc_weight` via the Pallas lane-gather kernel:
    (Cin, Cout).

    interleaved=True (default) writes Cin-ordered rows in-kernel so the
    only post-kernel work is reshape views + the row/col slices; False
    keeps the d-major kernel + XLA transpose (A/B'd in KERNEL_STUDIES §9e).
    """
    s, k, d = codebooks.shape
    cout = assignments.shape[0]
    sdn = _decode_sdn(
        codebooks, assignments,
        block_s=_block_s(block_s, s, codebooks.dtype),
        interpret=auto_interpret(interpret),
        interleaved=interleaved,
    )
    if interleaved:
        s_pad = sdn.shape[0]
        return sdn.reshape(s_pad * d, -1)[:in_features, :cout]
    return sdn.reshape(s * d, cout)[:in_features]


def decode_conv_kernel_gather(
    codebooks: jax.Array,
    assignments: jax.Array,
    in_channels_per_group: int,
    *,
    block_s: int = 512,
    interpret: bool | None = None,
    layout: str = "hwio",
) -> jax.Array:
    """`lut.decode_conv_kernel` via the Pallas lane-gather kernel.

    layout='hwio' -> (kh, kw, Cg, Cout); layout='iohw' -> (Cg, Cout, kh,
    kw) built from the interleaved kernel with NO post-kernel transpose
    (consume via conv_dense(kernel_layout='IOHW'); KERNEL_STUDIES §9e).
    """
    s, k, d = codebooks.shape
    cout, kh, kw, s2 = assignments.shape
    n = cout * kh * kw
    if layout == "iohw":
        sdn = _decode_sdn(
            codebooks, assignments.reshape(n, s),
            block_s=_block_s(block_s, s, codebooks.dtype),
            interpret=auto_interpret(interpret),
            interleaved=True,
        )
        s_pad = sdn.shape[0]
        w = sdn.reshape(s_pad * d, -1)[:in_channels_per_group, :n]
        return w.reshape(in_channels_per_group, cout, kh, kw)
    sdn = _decode_sdn(
        codebooks, assignments.reshape(n, s),
        block_s=_block_s(block_s, s, codebooks.dtype),
        interpret=auto_interpret(interpret),
    )
    # (S*D, Cout*kh*kw) -> (Cin_g, Cout, kh, kw) -> HWIO
    w = sdn.reshape(s * d, cout, kh, kw)[:in_channels_per_group]
    return jnp.transpose(w, (2, 3, 0, 1))
