"""Shared helpers for the Pallas kernel package."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ceil_to(x: int, m: int) -> int:
    """Round x up to a multiple of m."""
    return -(-x // m) * m


def auto_interpret(interpret: bool | None) -> bool:
    """Default Pallas interpret mode: interpreter off-TPU, compiled on."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


# The gather patterns Mosaic's lax.gather lowering accepts (jax 0.9.0,
# _gather_lowering_rule): per-element selection along sublanes
# (out[i, j] = table[idx[i, j], j], dims=[0]) or along lanes
# (out[i, j] = table[i, idx[i, j]], dims=[1]), lowered to
# tpu.dynamic_gather. Hard constraints measured on the v5e toolchain
# (tools/out/gather_probe*.txt, KERNEL_STUDIES 9c):
#   1. idx.shape must equal table.shape exactly (a bare assert in the
#      lowering rule — jnp.take_along_axis with a different row count dies
#      with an empty AssertionError);
#   2. the index element bitwidth must equal the table element bitwidth
#      (apply-vector-layout rejects bf16 table + i32 idx with "Gather
#      indices and result have different bitwidths");
#   3. the table must span a SINGLE vreg along the gather dimension
#      ("Multiple source vregs along gather dimension"): <= 8 sublanes for
#      a 32-bit row gather, <= 128 lanes for a 32-bit lane gather;
#   4. 16-bit and 8-bit gathers lower to byte gathers, which v5e rejects
#      ("Byte gather not supported by this TPU generation") — 32-bit
#      tables only; gather f32 and convert afterwards.
# Consequence: the usable shape for PQ decode is the LANE gather with the
# K (<= 128) codewords on lanes and an independent table row per sublane.
_GATHER_DNUMS_ROWS = jax.lax.GatherDimensionNumbers(
    offset_dims=(),
    collapsed_slice_dims=(0,),
    start_index_map=(0,),
    operand_batching_dims=(1,),
    start_indices_batching_dims=(1,),
)
_GATHER_DNUMS_LANES = jax.lax.GatherDimensionNumbers(
    offset_dims=(),
    collapsed_slice_dims=(1,),
    start_index_map=(1,),
    operand_batching_dims=(0,),
    start_indices_batching_dims=(0,),
)


def gather_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """out[i, j] = table[idx[i, j], j] as a Mosaic tpu.dynamic_gather.

    `idx.shape` must equal `table.shape`; `idx.dtype` bitwidth must match
    `table.dtype`; the table must be <= 8 sublanes for 32-bit dtypes
    (constraint 3 above). Unlike jnp.take_along_axis this does NOT promote
    the indices to int32. Indices must be in-bounds (PROMISE_IN_BOUNDS:
    out-of-bounds is UB).
    """
    assert table.shape == idx.shape, (table.shape, idx.shape)
    return jax.lax.gather(
        table,
        idx[..., None],
        _GATHER_DNUMS_ROWS,
        (1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def gather_lanes(table: jax.Array, idx: jax.Array) -> jax.Array:
    """out[i, j] = table[i, idx[i, j]] as a Mosaic tpu.dynamic_gather.

    Each sublane row i holds its own <=128-entry table (constraint 3) —
    the PQ-decode shape: row = subspace, lanes = the K codeword values.
    Same shape/bitwidth rules as gather_rows.
    """
    assert table.shape == idx.shape, (table.shape, idx.shape)
    return jax.lax.gather(
        table,
        idx[..., None],
        _GATHER_DNUMS_LANES,
        (1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )
