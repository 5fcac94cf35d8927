"""Pallas TPU kernel: fused in-kernel PQ decode + dense GEMM (memory mode).

The round-1 memory-mode formulations paid for the gather with extra MXU FLOPs
(one-hot matmul: B*S*K*Cout MACs = K/D times the dense count — 8x for
AlexNet fc6/fc7). This kernel instead decodes weight *tiles* inside the
kernel and pays dense-GEMM FLOPs:

  - codebooks stay VMEM-resident per S-chunk, laid out (S, K*D) so
    ``cb[:, k*D+d]`` is a directly broadcastable (Sg, 1) column;
  - uint8 assignment tiles stream from HBM — the ONLY per-output weight
    traffic, 1/8 the bytes of the decoded bf16 matrix (1/21 vs f32);
  - a weight tile W_d[(s), o] = cb[s, A[o,s]*D+d] is decoded in-register by
    K select-accumulate passes on the VPU (~2K ops per weight element,
    independent of B — the TPU-native analogue of the reference's per-output
    gather loop, CaffeEva.cc:1006-1017);
  - the decoded tile immediately feeds the MXU: out += x_d @ W_d with dense
    contraction B*S*D*Cout. VPU decode and MXU GEMM overlap in the VLIW
    schedule, so for B >~ K the kernel approaches decoded-dense GEMM speed
    while streaming 8x less weight HBM.

Layouts chosen for Mosaic: x is pre-transposed to (D, B, S) outside the
kernel (strided in-kernel slices are unsupported); the grid is
(B tiles, Cout tiles, S chunks) with the S chunk innermost, accumulating
into the resident f32 output block.

Measured results: docs/KERNEL_STUDIES.md §9.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(xt_ref, cb_ref, asmt_ref, bias_ref, out_ref, *, num_k, d_len):
    """xt (D, Bt, Sg) bf16; cb (Sg, >=K*D) bf16; asmt (Sg, Ct) int8;
    bias (1, Ct) f32; out (Bt, Ct) f32 accumulated over the S-chunk grid."""
    k_id = pl.program_id(2)

    @pl.when(k_id == 0)
    def _():
        out_ref[:] = jnp.broadcast_to(
            bias_ref[0, :][None, :], out_ref.shape
        ).astype(jnp.float32)

    a = asmt_ref[:].astype(jnp.int32)  # (Sg, Ct)
    zero = jnp.zeros(a.shape, jnp.bfloat16)
    w_tiles = [zero for _ in range(d_len)]
    for kk in range(num_k):
        m = a == kk
        for d in range(d_len):
            col = cb_ref[:, kk * d_len + d][:, None]  # (Sg, 1)
            w_tiles[d] = w_tiles[d] + jnp.where(m, col, zero)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for d in range(d_len):
        acc = acc + jnp.dot(
            xt_ref[d], w_tiles[d], preferred_element_type=jnp.float32
        )
    out_ref[:] += acc


@functools.partial(
    jax.jit, static_argnames=("block_b", "block_o", "block_s", "interpret")
)
def _pq_fc_fused(
    x, codebooks, asmt_t, bias, *, block_b, block_o, block_s, interpret
):
    b, cin = x.shape
    s, k, d = codebooks.shape
    s_dim, cout = asmt_t.shape
    assert s_dim == s

    s_pad = _ceil_to(s, block_s)
    b_pad = _ceil_to(b, block_b)
    o_pad = _ceil_to(cout, block_o)
    kd_pad = max(_ceil_to(k * d, 128), 128)

    # x -> (D, B, S): d-major slices are contiguous in-kernel (Mosaic has no
    # strided value slices). Feature overhang (cin < S*D) zero-pads, matching
    # the reference's clamp (CaffeEva.cc:1277).
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, b_pad - b), (0, s * d - cin)))
    xt = xp.reshape(b_pad, s, d).transpose(2, 0, 1)  # (D, B_pad, S)
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, s_pad - s)))

    cb = codebooks.astype(jnp.bfloat16).reshape(s, k * d)
    cb = jnp.pad(cb, ((0, s_pad - s), (0, kd_pad - k * d)))

    # padding rows use index -1 (0xff): never equal to any codeword id, so
    # decoded padding weights are exactly zero
    asmt_p = jnp.pad(
        asmt_t.astype(jnp.int8),
        ((0, s_pad - s), (0, o_pad - cout)),
        constant_values=-1,
    )
    bias_p = jnp.pad(bias.astype(jnp.float32), (0, o_pad - cout))
    bias_p = bias_p.reshape(1, o_pad)

    grid = (b_pad // block_b, o_pad // block_o, s_pad // block_s)
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
                (block_s, kd_pad),
                lambda i, j, kk: (kk, 0),
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
    block_o: int = 512,
    block_s: int = 128,
    interpret: bool | None = None,
) -> jax.Array:
    """PQ FC via the fused decode-GEMM kernel.

    Args:
      x: (B, Cin) activations.
      params: {"codebooks" (S,K,D), "assignments" (Cout,S) uint8, "bias"}.
      block_b: batch tile (default: whole padded batch, min 16 for bf16
        sublanes). block_o/block_s: output-channel / subspace tile sizes.
      interpret: force interpreter mode; default auto (True off-TPU).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b = x.shape[0]
    if block_b is None:
        block_b = max(16, min(256, _ceil_to(b, 16)))
    k = params["codebooks"].shape[1]
    if k > 127:
        raise ValueError(
            f"fused kernel supports K <= 127 (int8 assignment compare); "
            f"got K={k}"
        )
    asmt_t = jnp.asarray(params["assignments"]).astype(jnp.int8).T  # (S, Cout)
    return _pq_fc_fused(
        x,
        jnp.asarray(params["codebooks"]),
        asmt_t,
        jnp.asarray(params["bias"]),
        block_b=block_b,
        block_o=block_o,
        block_s=block_s,
        interpret=interpret,
    )
