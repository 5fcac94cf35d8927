"""PQ primitives: codebook decode and inner-product LUT construction.

The reference's hot path is two-phase (SURVEY.md §3.2):
  1. LUT build — for each input (sub-)vector, inner products against all K
     codewords of each sub-space (GetInPdMat, CaffeEva.cc:1261-1296).
  2. Gather-accumulate — per output channel, sum LUT entries selected by the
     uint8 assignment indices (CaffeEva.cc:848-861, :1006-1017).

On TPU there is a third, mathematically *identical* formulation the reference
cannot exploit: decode the PQ weights back to dense (W[o] = concat_s
C[s, A[o,s]]) and run the MXU at full tilt. PQ(x) == W̃·x exactly, so decode is
not an approximation — it trades HBM weight traffic for MXU FLOPs and wins
whenever activations are reused enough (large batch / conv spatial reuse).
Both formulations live here; the engine picks per layer (see ops.fc/ops.conv).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pad_features(x: jax.Array, subvector_len_total: int) -> jax.Array:
    """Zero-pad the trailing feature axis to S*D.

    The reference clamps inner products to the real feature count when the last
    sub-space overhangs (GetInPdMat featDimCntSel, CaffeEva.cc:1277) — e.g.
    AlexNet conv1 has 3 input channels in one 8-wide sub-space. Zero-padding
    the activations is equivalent: padded dims contribute x_d * c_d = 0.
    """
    deficit = subvector_len_total - x.shape[-1]
    if deficit == 0:
        return x
    if deficit < 0:
        raise ValueError(
            f"features {x.shape[-1]} exceed codebook span {subvector_len_total}"
        )
    pad = [(0, 0)] * (x.ndim - 1) + [(0, deficit)]
    return jnp.pad(x, pad)


def build_lut(x: jax.Array, codebooks: jax.Array) -> jax.Array:
    """Inner-product lookup table.

    Args:
      x: (..., Cin) activations with Cin <= S*D.
      codebooks: (S, K, D).
    Returns:
      (..., S, K) float32 — lut[..., s, k] = <x[..., s*D:(s+1)*D], C[s, k]>.
    """
    s, k, d = codebooks.shape
    xp = pad_features(x, s * d)
    xs = xp.reshape(*xp.shape[:-1], s, d)
    return jnp.einsum(
        "...sd,skd->...sk", xs, codebooks, preferred_element_type=jnp.float32
    )


def decode_fc_weight(
    codebooks: jax.Array, assignments: jax.Array, in_features: int
) -> jax.Array:
    """Decode PQ FC parameters to a dense (Cin, Cout) weight matrix.

    W̃[s*D + d, o] = codebooks[s, assignments[o, s], d], truncated to Cin rows.
    Exact inverse of the PQ approximation (not of the original FP32 weights).
    """
    s, k, d = codebooks.shape
    # (Cout, S, D): codeword vectors per output/sub-space
    gathered = jnp.take_along_axis(
        codebooks[None], assignments.astype(jnp.int32)[:, :, None, None], axis=2
    ).squeeze(2)
    w = gathered.reshape(assignments.shape[0], s * d)[:, :in_features]
    return w.T


def decode_conv_kernel(
    codebooks: jax.Array, assignments: jax.Array, in_channels_per_group: int
) -> jax.Array:
    """Decode PQ conv parameters to a dense HWIO kernel.

    Args:
      codebooks: (S, K, D) shared across groups (PrepCtrdBuf loads one codebook
        per layer regardless of grpCnt, CaffeEva.cc:534-560).
      assignments: (Cout, kh, kw, S).
      in_channels_per_group: Cg; may be < S*D (AlexNet conv1: 3 < 8).
    Returns:
      (kh, kw, Cg, Cout) kernel for lax.conv_general_dilated with
      feature_group_count = groups.
    """
    s, k, d = codebooks.shape
    cout, kh, kw, s2 = assignments.shape
    gathered = jnp.take_along_axis(
        codebooks[None, None, None],
        assignments.astype(jnp.int32)[..., None, None],
        axis=4,
    ).squeeze(4)  # (Cout, kh, kw, S, D)
    w = gathered.reshape(cout, kh, kw, s * d)[..., :in_channels_per_group]
    return jnp.transpose(w, (1, 2, 3, 0))


def decode_fc_weight_onehot(
    codebooks: jax.Array, assignments: jax.Array, in_features: int
) -> jax.Array:
    """decode_fc_weight reformulated for in-graph execution: the uint8 row
    gather becomes a one-hot batched matmul.

    Measured (benchmarks/fc_kernels.py, KERNEL_STUDIES §9b): XLA's TPU
    gather lowering streams ~2.5 GB/s — 61-81 ms for fc6's 151 MB dense
    weight — while the one-hot contraction runs on the MXU. Bit-exact vs
    the gather (each output element is a sum of zeros plus exactly one
    codebook value, exact in any float dtype).
    """
    s, k, d = codebooks.shape
    w = jnp.einsum(
        "osk,skd->osd", _onehot_compare(assignments, k, codebooks.dtype),
        codebooks,
    )
    w = w.reshape(assignments.shape[0], s * d)[:, :in_features]
    return w.T


def _onehot_compare(assignments: jax.Array, k: int, dtype) -> jax.Array:
    """One-hot of the assignment indices as an inline iota-compare.

    Isolated decode at ResNet conv geometry measures 1.7x faster than
    jax.nn.one_hot (tools/onehot_decode_dtype_ab.py: 81 vs 136 us); the
    full resnet50 memory step is neutral within the pooled chip's ~15%
    run-to-run variance (same-session A/B flipped winners across rounds).
    Kept: at-worst-neutral and hands XLA the raw compare producer to fuse
    into the dot operand."""
    import jax.lax as lax

    i = lax.broadcasted_iota(
        jnp.int32, (1,) * assignments.ndim + (k,), assignments.ndim
    )
    return (assignments.astype(jnp.int32)[..., None] == i).astype(dtype)


def decode_conv_kernel_onehot(
    codebooks: jax.Array, assignments: jax.Array, in_channels_per_group: int,
    layout: str = "hwio",
) -> jax.Array:
    """decode_conv_kernel via one-hot matmul (see decode_fc_weight_onehot).

    Conv one-hot operands are small (AlexNet total ~75 MB bf16 transient),
    so this makes in-step conv decode cheap where the gather lowering is
    hopeless — the basis of the conv 'indecode' memory strategy.

    layout='ohwi' returns the einsum's NATIVE (Cout, kh, kw, Cg) order —
    no post-decode transpose; consume via conv_dense(kernel_layout='OHWI')
    (KERNEL_STUDIES §9e).
    """
    s, k, d = codebooks.shape
    cout, kh, kw, s2 = assignments.shape
    if layout == "hwoi":
        # decode directly in (kh, kw, Cout, Cg) order: row-major HWOI IS
        # the TPU conv's preferred physical kernel layout (lanes = Cg,
        # sublanes = Cout — measured from the §9e HLO), so the conv
        # consumes the decode fusion's output with NO relayout copy. The
        # transposed one-hot comes from transposing the uint8 assignments
        # (tiny) before the iota-compare.
        a_t = jnp.transpose(jnp.asarray(assignments), (1, 2, 0, 3))
        w = jnp.einsum(
            "...sk,skd->...sd", _onehot_compare(a_t, k, codebooks.dtype),
            codebooks,
        )
        return w.reshape(kh, kw, cout, s * d)[..., :in_channels_per_group]
    w = jnp.einsum(
        "...sk,skd->...sd", _onehot_compare(assignments, k, codebooks.dtype),
        codebooks,
    )
    w = w.reshape(cout, kh, kw, s * d)[..., :in_channels_per_group]
    if layout == "ohwi":
        return w
    return jnp.transpose(w, (1, 2, 3, 0))


def assignments_one_hot(
    assignments: jax.Array, num_codewords: int, dtype=jnp.float32
) -> jax.Array:
    """One-hot expansion of assignment indices over the codeword axis.

    Turns the gather-accumulate into a matmul the MXU can execute:
    sum_s lut[b,s,A[o,s]] == einsum('bsk,sko->bo', lut, onehot).
    """
    return jax.nn.one_hot(assignments.astype(jnp.int32), num_codewords, dtype=dtype)
