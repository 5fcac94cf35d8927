"""Pallas TPU kernel: fused in-kernel PQ decode + multi-tap conv GEMM.

The LAST un-measured end-run around the resnet memory-mode gap
(KERNEL_STUDIES §9f, round-4 verdict item 3). Root cause recap: a conv
consuming a COMPUTED (in-step decoded) weight pays an XLA kernel-relayout
copy at ~10 GB/s — 2.7M of stage3's 3.7M estimated cycles — and no decode
formulation, layout, staging, or im2col reroute removes it, because the
relayout follows the weight to the conv's fixed physical layout. This
kernel removes the XLA boundary itself: the decoded weight tile lives and
dies in VMEM, consumed by in-kernel MXU dots, so there is nothing for XLA
to relay out.

Formulation (stride-1, groups=1, square kernels — the stage3 conv2 class;
replaces the reference's conv LUT gather loop, CaffeEva.cc:760-868):

- A k x k conv is a sum of kh*kw TAP GEMMs over channel chunks:
    y[b, ho, wo] += x_pad[b, ho+ti, wo+tj] @ W[ti, tj]
  Flattening the PADDED spatial grid to L = Hp*Wp rows turns every tap
  into a STATIC sublane-offset slice x_flat[o_t : o_t + L_out] with
  o_t = ti*Wp + tj: rows whose window wraps a row edge produce garbage
  columns at known positions (wo >= Wo), sliced off outside the kernel —
  no im2col tensor (9x activation bytes, measured loser §9f) and no
  dynamic slicing (Mosaic-unsupported).
- Per (batch-tile, Cout-tile, Cin-chunk) grid cell, each tap's
  (Cin_chunk, 128) weight tile decodes in VMEM with the proven dynamic
  LANE gather (201 Gelem/s, §9c): codeword tables (D, S_chunk, 128) f32,
  transposed int8 assignment ids (taps, S_chunk, 128) — the only weight
  HBM traffic is the uint8 ids. Per-d gather rows store into a
  (S_chunk, D, 128) scratch whose value-reshape (Cin_chunk, 128) is the
  dot operand in native Cin order.
- Cin chunks ride the innermost grid dim, accumulating into the resident
  f32 output block; bias initializes at chunk 0.

Constraints: stride == 1, groups == 1, K <= 128 (one vreg of table
lanes), D such that S_chunk = cin_chunk/D >= 32 sublanes (the int8
assignment tile minimum) — ResNet's K=128/D=4 fits exactly. Other
geometries fall back to the XLA decode paths in ops/conv.py.

Measured results: docs/KERNEL_STUDIES.md §16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qcnn_tpu.ops.pallas._common import auto_interpret, ceil_to, gather_lanes

_LANES = 128


def _kernel(x_ref, tab_ref, asmt_ref, bias_ref, out_ref, w_ref, *,
            d_len, kh, kw, wp, l_out, block_b):
    """x (block_b, Lp, Cc) bf16 flattened padded grid; tab (D, Sc, 128)
    f32 codeword tables; asmt (kh*kw, Sc, 128) int8 transposed ids; bias
    (1, 128) f32; out (block_b, Lp, 128) f32 accumulated over the
    Cin-chunk grid; w scratch (Sc, D, 128) f32."""
    ci = pl.program_id(2)

    @pl.when(ci == 0)
    def _():
        out_ref[:] = jnp.broadcast_to(
            bias_ref[0, :][None, None, :], out_ref.shape
        ).astype(jnp.float32)

    acc = jnp.zeros((block_b * l_out, _LANES), jnp.float32)
    for t in range(kh * kw):
        # decode this tap's (Cin_chunk, 128) tile: padding ids are -1,
        # clamped to codeword 0 — the garbage rows multiply zero-padded x
        # channels (Cin pad) or land in sliced-off output columns (Cout pad)
        idx = jnp.maximum(asmt_ref[t].astype(jnp.int32), 0)
        for d in range(d_len):
            w_ref[:, d, :] = gather_lanes(tab_ref[d], idx)
        w_t = w_ref[:].reshape(-1, _LANES).astype(jnp.bfloat16)
        o_t = (t // kw) * wp + (t % kw)
        xt = x_ref[:, o_t:o_t + l_out, :].reshape(block_b * l_out, -1)
        acc = acc + jax.lax.dot_general(
            xt, w_t,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:, :l_out, :] += acc.reshape(block_b, l_out, _LANES)


@functools.partial(
    jax.jit,
    static_argnames=("kh", "kw", "pad", "h", "w", "block_b", "interpret"),
)
def _pq_conv_fused(x, codebooks, asmt_t, bias, *, kh, kw, pad, h, w,
                   block_b, interpret):
    b, _, _, cin = x.shape
    s, k, d = codebooks.shape
    n_taps, s_dim, o_pad = asmt_t.shape

    hp, wp = h + 2 * pad, w + 2 * pad
    ho, wo = hp - kh + 1, wp - kw + 1
    # all rows [0, ho*wp) are sliced/reshaped outside; taps never cross
    # images because the block provides l_out + o_max <= Lp rows of slack
    # (geometry shared with the VMEM sizing — _grid_geometry)
    l_out, lp = _grid_geometry(h, w, pad, kh, kw)

    cin_chunk = (_LANES // d) * d
    s_chunk = cin_chunk // d
    cin_pad = ceil_to(cin, cin_chunk)
    s_pad = cin_pad // d
    assert s_pad * d >= s * d
    b_pad = ceil_to(b, block_b)

    xq = jnp.pad(
        x.astype(jnp.bfloat16),
        ((0, b_pad - b), (pad, pad), (pad, pad), (0, cin_pad - cin)),
    ).reshape(b_pad, hp * wp, cin_pad)
    xq = jnp.pad(xq, ((0, 0), (0, lp - hp * wp), (0, 0)))

    # codeword tables (D, S_pad, 128): K on lanes zero-padded, f32
    # (32-bit-only gathers, _common constraint 4)
    tab = codebooks.astype(jnp.float32).transpose(2, 0, 1)
    tab = jnp.pad(tab, ((0, 0), (0, s_pad - s), (0, _LANES - k)))

    bias_p = bias.astype(jnp.float32).reshape(1, o_pad)

    grid = (b_pad // block_b, o_pad // _LANES, cin_pad // cin_chunk)
    out = pl.pallas_call(
        functools.partial(
            _kernel, d_len=d, kh=kh, kw=kw, wp=wp, l_out=l_out,
            block_b=block_b,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_b, lp, cin_chunk), lambda i, j, c: (i, 0, c),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (d, s_chunk, _LANES), lambda i, j, c: (0, c, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n_taps, s_chunk, _LANES), lambda i, j, c: (0, c, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, _LANES), lambda i, j, c: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_b, lp, _LANES), lambda i, j, c: (i, 0, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, lp, o_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((s_chunk, d, _LANES), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_taps * b_pad * l_out * cin_pad * o_pad,
            bytes_accessed=(
                b_pad * lp * cin_pad * 2
                + n_taps * s_pad * o_pad
                + s_pad * _LANES * d * 4
                + b_pad * lp * o_pad * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, tab, asmt_t, bias_p)
    # rows [0, ho*wp) are the padded-width output grid; drop wrap columns
    out = out[:b, : ho * wp, :].reshape(b, ho, wp, o_pad)
    return out[:, :, :wo, :]


_VMEM_BUDGET = 6 * 1024 * 1024  # per-block bytes; Pallas double-buffers


def _grid_geometry(h: int, w: int, pad: int, kh: int,
                   kw: int) -> tuple[int, int]:
    """(l_out, lp) of the flattened padded grid — the ONE copy of the
    slack math shared by the kernel body and the VMEM sizing (round-5
    review: two verbatim copies could silently drift, making
    _auto_block_b size blocks for a different lp than pallas_call
    allocates)."""
    hp, wp = h + 2 * pad, w + 2 * pad
    ho = hp - kh + 1
    l_out = ceil_to(ho * wp, 8)
    lp = ceil_to(max(hp * wp, (kh - 1) * wp + (kw - 1) + l_out), 8)
    return l_out, lp


def _per_image_bytes(h: int, w: int, pad: int, kh: int, kw: int) -> int:
    _, lp = _grid_geometry(h, w, pad, kh, kw)
    return lp * (_LANES * 2 + _LANES * 4)  # x bf16 + out f32


def fits_vmem(h: int, w: int, pad: int, kh: int, kw: int) -> bool:
    """Can even a ONE-image block fit the VMEM budget? memory_fused_route
    must check this before routing (round-5 review: _auto_block_b floors
    at 1, so an oversized single image — e.g. 96x96 stride-1 3x3 —
    reached the kernel and died in the Mosaic compiler instead of
    falling back to the OHWI decode)."""
    return _per_image_bytes(h, w, pad, kh, kw) <= _VMEM_BUDGET


def _auto_block_b(h: int, w: int, pad: int, kh: int, kw: int,
                  requested: int) -> int:
    """Largest batch tile whose x+out blocks fit the VMEM budget (the
    56x56 stages flatten to ~3.4k sublane rows; an 8-image block there is
    a 20 MB ask that Mosaic rejects)."""
    per_image = _per_image_bytes(h, w, pad, kh, kw)
    return max(1, min(requested, _VMEM_BUDGET // max(per_image, 1)))


def supports(params: dict, *, stride: int, groups: int,
             cin: int | None = None) -> bool:
    """Geometry gate for the fused decode-conv kernel.

    cin (when known): the kernel only wins where the decoded weight is
    large enough that the §9f relayout dominates — stage2/3-class convs
    (cin >= 256). Small-cin convs keep the one-hot OHWI decode (their
    relayout is proportionally small and the flattened 56x56 grid wastes
    VMEM rows)."""
    s, k, d = params["codebooks"].shape
    cout, kh, kw, _ = params["assignments"].shape
    return (
        stride == 1
        and groups == 1
        and kh == kw
        and kh > 1  # single-tap (1x1) is grid-overhead-bound: measured
                    # 1.6x WORSE e2e (§16b) — the docstring and the
                    # explicit-impl error message always promised kh>1;
                    # round-5 review found the gate didn't enforce it
        and k <= _LANES
        and _LANES % d == 0
        and _LANES // d >= 32  # int8 assignment tile sublane minimum
        and (cin is None or cin >= 256)
    )


def pq_conv_fused(
    x: jax.Array,
    params: dict,
    *,
    stride: int,
    pad: int,
    groups: int = 1,
    block_b: int = 8,
    interpret: bool | None = None,
) -> jax.Array:
    """PQ conv with in-kernel gather decode + tap GEMMs (memory mode).

    Args:
      x: (B, H, W, Cin) activations.
      params: {"codebooks" (S,K,D), "assignments" (Cout,kh,kw,S) uint8,
        "bias" (Cout,)}.
      stride/groups: must satisfy `supports` (stride-1, ungrouped,
      square multi-tap kernels, K <= 128, Cin chunk of 128 lanes with
      >= 32 subspace sublanes per chunk).
    """
    if not supports(params, stride=stride, groups=groups):
        raise ValueError(
            "pq_conv_fused: unsupported geometry (need stride=1, groups=1, "
            "square kh=kw>1, K<=128, 128%D==0, 128//D>=32)"
        )
    b, h, w, cin = x.shape
    cb = jnp.asarray(params["codebooks"])
    a = jnp.asarray(params["assignments"])
    cout, kh, kw, s = a.shape
    if s != cb.shape[0]:
        # mismatched params would decode the wrong codewords for the
        # trailing subspaces and multiply REAL x channels — silently
        # wrong (round-5 review; the fc kernel asserts the same)
        raise ValueError(
            f"pq_conv_fused: assignments S={s} != codebooks "
            f"S={cb.shape[0]}"
        )
    if cb.shape[0] * cb.shape[2] < cin:
        raise ValueError(
            f"pq_conv_fused: codebooks cover {cb.shape[0] * cb.shape[2]} "
            f"channels < Cin={cin}"
        )
    if not fits_vmem(h, w, pad, kh, kw):
        raise ValueError(
            f"pq_conv_fused: a single {h}x{w} image's flattened grid "
            "exceeds the VMEM block budget (memory_fused_route checks "
            "fits_vmem and falls back to the OHWI decode)"
        )
    o_pad = ceil_to(cout, _LANES)
    d = cb.shape[2]
    cin_chunk = (_LANES // d) * d
    s_pad = ceil_to(cin, cin_chunk) // d
    # (Cout, kh, kw, S) -> (kh*kw, S, Cout) int8, pads hold -1
    asmt_t = jnp.pad(
        jnp.transpose(a.astype(jnp.int8), (1, 2, 3, 0)).reshape(
            kh * kw, s, cout),
        ((0, 0), (0, s_pad - s), (0, o_pad - cout)),
        constant_values=-1,
    )
    block_b = _auto_block_b(h, w, pad, kh, kw, max(1, min(block_b, b)))
    out = _pq_conv_fused(
        x, cb, asmt_t, jnp.pad(jnp.asarray(params["bias"]),
                               (0, o_pad - cout)),
        kh=kh, kw=kw, pad=pad, h=h, w=w,
        block_b=block_b, interpret=auto_interpret(interpret),
    )
    return out[..., :cout].astype(jnp.float32)
