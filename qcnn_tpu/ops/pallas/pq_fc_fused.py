"""Pallas TPU kernel: fused in-kernel PQ decode + dense GEMM (memory mode).

The round-1 memory-mode formulations paid for the gather with extra MXU FLOPs
(one-hot matmul: B*S*K*Cout MACs = K/D times the dense count — 8x for
AlexNet fc6/fc7). This kernel instead decodes weight *tiles* inside the
kernel and pays dense-GEMM FLOPs:

  - codebooks stay VMEM-resident per S-chunk, laid out (K*D, S) so the
    (k, d) codeword row is a (1, Sg) lane vector broadcast across output
    sublanes (natively cheap — the earlier lane-column formulation needed a
    cross-lane broadcast Mosaic rejects);
  - uint8 assignment tiles stream from HBM in their natural (Cout, S)
    layout — the ONLY per-output weight traffic, 1/8 the bytes of the
    decoded bf16 matrix (1/21 vs f32);
  - a transposed weight tile W_T[o, s] = cb[A[o,s]*D+d, s] is decoded
    in-register by K select-accumulate passes on the VPU (~2K ops per weight
    element, independent of B — the TPU-native analogue of the reference's
    per-output gather loop, CaffeEva.cc:1006-1017);
  - the decoded tile immediately feeds the MXU NT-form: out += x_d @ W_T^T
    with dense contraction B*S*D*Cout. VPU decode and MXU GEMM overlap in
    the VLIW schedule, so for B >~ K the kernel approaches decoded-dense
    GEMM speed while streaming 8x less weight HBM.

Mosaic constraints found empirically on this toolchain (v5e):
  - bf16/int16 equality compares: "Target does not support this comparison";
  - i1 masks from 32-bit compares cannot relayout into 16-bit selects
    ("Invalid relayout ... (8,128) -> (16,128)");
  => compare in int32, select in float32, convert W to bf16 once per tile
     before the dot (an all-bf16 arithmetic mask avoids both limits but
     measured 2.6x slower — see _kernel).

x is pre-transposed to (D, B, S) outside the kernel (strided in-kernel
slices are unsupported). Grid is (B tiles, Cout tiles, S chunks), S chunk
innermost, accumulating into the resident f32 output block.

Measured results: docs/KERNEL_STUDIES.md §9.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qcnn_tpu.ops.pallas._common import auto_interpret, ceil_to, gather_lanes

_LANES = 128


def _kernel(xt_ref, cb_ref, asmt_ref, bias_ref, out_ref, *, num_k, d_len):
    """Select-accumulate decode variant. xt (D, Bt, Sg) bf16; cb (K*D, Sg)
    bf16; asmt (Ct, Sg) int8; bias (1, Ct) f32; out (Bt, Ct) f32
    accumulated over the S-chunk grid."""
    k_id = pl.program_id(2)

    @pl.when(k_id == 0)
    def _():
        out_ref[:] = jnp.broadcast_to(
            bias_ref[0, :][None, :], out_ref.shape
        ).astype(jnp.float32)

    # Decode in the 32-bit domain: int32 compare + f32 select, one bf16
    # conversion per (d, S-chunk) tile before the dot. The two obvious
    # cheaper formulations hit Mosaic limits or are slower (measured,
    # KERNEL_STUDIES §9): bf16/int16 equality compares are unsupported
    # on this target; an all-bf16 arithmetic mask relu(1-|a-k|)
    # compiles but runs 2.6x slower than compare+select (bf16 VPU ops
    # are not packed 2x here, and the mask chain is 4 ops vs 1
    # compare).
    a = asmt_ref[:].astype(jnp.int32)  # (Ct, Sg)
    zero = jnp.zeros(a.shape, jnp.float32)
    w_t = [zero for _ in range(d_len)]
    for kk in range(num_k):
        m = a == kk
        for d in range(d_len):
            row = cb_ref[kk * d_len + d, :][None, :].astype(jnp.float32)
            w_t[d] = w_t[d] + jnp.where(m, row, zero)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for d in range(d_len):
        acc = acc + jax.lax.dot_general(
            xt_ref[d], w_t[d].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] += acc


def _kernel_gather(xt_ref, tab_ref, asmt_ref, bias_ref, out_ref, *, d_len):
    """Gather-decode variant (lane orientation — the only gather shape this
    toolchain compiles, _common.py constraints 1-4). xt (D, Bt, Sg) bf16;
    tab (D, Sg, 128) f32 codeword tables (lanes = K, zero-padded);
    asmt (Sg, Ot=128) int8 TRANSPOSED ids; bias (1, Ot) f32; out (Bt, Ot)
    f32 accumulated over the S-chunk grid. One tpu.dynamic_gather per d
    decodes the (Sg, Ot) weight tile (vs 2K select passes), then the NN-form
    dot contracts Sg."""
    k_id = pl.program_id(2)

    @pl.when(k_id == 0)
    def _():
        out_ref[:] = jnp.broadcast_to(
            bias_ref[0, :][None, :], out_ref.shape
        ).astype(jnp.float32)

    # padding entries hold -1: clamp to codeword 0 — the decoded garbage
    # column is sliced off (Cout pad) or multiplies zero x lanes (S pad)
    idx = jnp.maximum(asmt_ref[:].astype(jnp.int32), 0)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for d in range(d_len):
        w_d = gather_lanes(tab_ref[d], idx)  # (Sg, Ot) f32
        acc = acc + jax.lax.dot_general(
            xt_ref[d], w_d.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] += acc


@functools.partial(
    jax.jit,
    static_argnames=("block_b", "block_o", "block_s", "interpret", "decode"),
)
def _pq_fc_fused(
    x, codebooks, asmt, bias, *, block_b, block_o, block_s, interpret,
    decode="select",
):
    b, cin = x.shape
    s, k, d = codebooks.shape
    cout, s_dim = asmt.shape
    assert s_dim == s

    if decode == "gather":
        block_o = _LANES  # the gather index block must equal the table block
    s_pad = ceil_to(s, block_s)
    b_pad = ceil_to(b, block_b)
    o_pad = ceil_to(cout, block_o)

    # x -> (D, B, S): d-major slices are contiguous in-kernel (Mosaic has no
    # strided value slices). Feature overhang (cin < S*D) zero-pads, matching
    # the reference's clamp (CaffeEva.cc:1277).
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, b_pad - b), (0, s * d - cin)))
    xt = xp.reshape(b_pad, s, d).transpose(2, 0, 1)  # (D, B_pad, S)
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, s_pad - s)))

    bias_p = jnp.pad(bias.astype(jnp.float32), (0, o_pad - cout))
    bias_p = bias_p.reshape(1, o_pad)
    grid = (b_pad // block_b, o_pad // block_o, s_pad // block_s)

    if decode == "gather":
        # codebooks (S, K, D) -> f32 (D, S, 128): one codeword table per
        # (d, subspace) sublane row, K on lanes (gathers are 32-bit only and
        # the table must span a single vreg of lanes — _common.py)
        tab = codebooks.astype(jnp.float32).transpose(2, 0, 1)
        tab = jnp.pad(tab, ((0, 0), (0, s_pad - s), (0, _LANES - k)))
        # assignments stream TRANSPOSED (S, Cout) so the gather index block
        # (Sg, Ot) matches the table block; padding entries hold -1
        asmt_t = jnp.pad(
            asmt.astype(jnp.int8).T,
            ((0, s_pad - s), (0, o_pad - cout)),
            constant_values=-1,
        )
        out = pl.pallas_call(
            functools.partial(_kernel_gather, d_len=d),
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (d, block_b, block_s),
                    lambda i, j, kk: (0, i, kk),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (d, block_s, _LANES),
                    lambda i, j, kk: (0, kk, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (block_s, block_o),
                    lambda i, j, kk: (kk, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, block_o),
                    lambda i, j, kk: (0, j),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (block_b, block_o),
                lambda i, j, kk: (i, j),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b_pad, o_pad), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * b_pad * s_pad * d * o_pad,
                bytes_accessed=(
                    b_pad * s_pad * d * 2 + s_pad * o_pad
                    + s_pad * _LANES * d * 4 + b_pad * o_pad * 4
                ),
                transcendentals=0,
            ),
            interpret=interpret,
        )(xt, tab, asmt_t, bias_p)
        return out[:b, :cout]

    # codebooks (S, K, D) -> (K*D, S): row k*D+d holds codeword k's d-th
    # component for every subspace
    cb = codebooks.astype(jnp.bfloat16).transpose(1, 2, 0).reshape(k * d, s)
    cb = jnp.pad(cb, ((0, 0), (0, s_pad - s)))

    # padding entries use index -1 (0xff): never equal to any codeword id,
    # so decoded padding weights are exactly zero
    asmt_p = jnp.pad(
        asmt.astype(jnp.int8),
        ((0, o_pad - cout), (0, s_pad - s)),
        constant_values=-1,
    )
    out = pl.pallas_call(
        functools.partial(_kernel, num_k=k, d_len=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (d, block_b, block_s),
                lambda i, j, kk: (0, i, kk),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k * d, block_s),
                lambda i, j, kk: (0, kk),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_o, block_s),
                lambda i, j, kk: (j, kk),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_o),
                lambda i, j, kk: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_b, block_o),
            lambda i, j, kk: (i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, o_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * s_pad * d * o_pad,
            bytes_accessed=(
                b_pad * s_pad * d * 2 + s_pad * o_pad + s_pad * k * d * 2
                + b_pad * o_pad * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xt, cb, asmt_p, bias_p)
    return out[:b, :cout]


def pq_fc_fused(
    x: jax.Array,
    params: dict,
    *,
    block_b: int | None = None,
    block_o: int = 256,
    block_s: int = 128,
    interpret: bool | None = None,
    decode: str = "select",
) -> jax.Array:
    """PQ FC via the fused decode-GEMM kernel.

    Args:
      x: (B, Cin) activations.
      params: {"codebooks" (S,K,D), "assignments" (Cout,S) uint8, "bias"}.
      block_b: batch tile (default: the padded batch CAPPED AT 256, min
        16 for bf16 sublanes — so batches just over a 256 multiple pad
        the last tile with garbage rows, e.g. b=300 runs as 2x256).
        block_o/block_s: output-channel / subspace tile sizes.
      interpret: force interpreter mode; default auto (True off-TPU).
      decode: in-kernel weight-tile decode formulation — "select" (2K
        select-accumulate passes) or "gather" (Mosaic dynamic lane gather,
        KERNEL_STUDIES §9c; forces block_o=128 — the gather index block
        must match the table block shape).
    """
    interpret = auto_interpret(interpret)
    if decode not in ("select", "gather"):
        raise ValueError(f"unknown decode formulation: {decode!r}")
    b = x.shape[0]
    if block_b is None:
        block_b = max(16, min(256, ceil_to(b, 16)))
    k = params["codebooks"].shape[1]
    if k > _LANES:
        raise ValueError(
            f"fused kernel supports K <= {_LANES} (int8 assignment ids; "
            f"one vreg of table lanes for decode='gather'); got K={k}"
        )
    s_cb, _, d_cb = params["codebooks"].shape
    if s_cb * d_cb < x.shape[1]:
        # would otherwise surface as an opaque negative-padding trace
        # error deep in the jit (round-5 review) — fail at the API edge
        raise ValueError(
            f"pq_fc_fused: codebooks cover {s_cb * d_cb} features "
            f"< Cin={x.shape[1]}"
        )
    return _pq_fc_fused(
        x,
        jnp.asarray(params["codebooks"]),
        jnp.asarray(params["assignments"]),
        jnp.asarray(params["bias"]),
        block_b=block_b,
        block_o=block_o,
        block_s=block_s,
        interpret=interpret,
        decode=decode,
    )
