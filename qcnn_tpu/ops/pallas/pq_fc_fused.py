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

from qcnn_tpu.ops.pallas._common import auto_interpret, ceil_to


def _kernel(xt_ref, cb_ref, asmt_ref, bias_ref, out_ref, *, num_k, d_len,
            decode):
    """xt (D, Bt, Sg) bf16; cb (K*D, Sg) bf16; asmt (Ct, Sg) int8;
    bias (1, Ct) f32; out (Bt, Ct) f32 accumulated over the S-chunk grid."""
    k_id = pl.program_id(2)

    @pl.when(k_id == 0)
    def _():
        out_ref[:] = jnp.broadcast_to(
            bias_ref[0, :][None, :], out_ref.shape
        ).astype(jnp.float32)

    if decode == "gather":
        # Mosaic tpu.dynamic_gather: one VPU gather per (d, tile) instead
        # of 2K select-accumulates (KERNEL_STUDIES §9c). Padding lanes hold
        # index -1 * D: clamp to row 0 — decoded garbage multiplies padded
        # x lanes, which are zero.
        idx = jnp.maximum(asmt_ref[:].astype(jnp.int32) * d_len, 0)
        w_t = [
            jnp.take_along_axis(cb_ref[:], idx + d, axis=0)
            for d in range(d_len)
        ]
    else:
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

    s_pad = ceil_to(s, block_s)
    b_pad = ceil_to(b, block_b)
    o_pad = ceil_to(cout, block_o)

    # x -> (D, B, S): d-major slices are contiguous in-kernel (Mosaic has no
    # strided value slices). Feature overhang (cin < S*D) zero-pads, matching
    # the reference's clamp (CaffeEva.cc:1277).
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, b_pad - b), (0, s * d - cin)))
    xt = xp.reshape(b_pad, s, d).transpose(2, 0, 1)  # (D, B_pad, S)
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, s_pad - s)))

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
    bias_p = jnp.pad(bias.astype(jnp.float32), (0, o_pad - cout))
    bias_p = bias_p.reshape(1, o_pad)

    grid = (b_pad // block_b, o_pad // block_o, s_pad // block_s)
    out = pl.pallas_call(
        functools.partial(_kernel, num_k=k, d_len=d, decode=decode),
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
      block_b: batch tile (default: whole padded batch, min 16 for bf16
        sublanes). block_o/block_s: output-channel / subspace tile sizes.
      interpret: force interpreter mode; default auto (True off-TPU).
      decode: in-kernel weight-tile decode formulation — "select" (2K
        select-accumulate passes) or "gather" (Mosaic dynamic gather,
        KERNEL_STUDIES §9c).
    """
    interpret = auto_interpret(interpret)
    if decode not in ("select", "gather"):
        raise ValueError(f"unknown decode formulation: {decode!r}")
    b = x.shape[0]
    if block_b is None:
        block_b = max(16, min(256, ceil_to(b, 16)))
    k = params["codebooks"].shape[1]
    if k > 127:
        raise ValueError(
            f"fused kernel supports K <= 127 (int8 assignment compare); "
            f"got K={k}"
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
