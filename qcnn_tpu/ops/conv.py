"""Convolution ops: dense and PQ paths.

Reference semantics: CalcFeatMap_ConvPrec (CaffeEva.cc:681-758, per-group
im2col + sgemm) and CalcFeatMap_ConvAprx (:760-868, per-group LUT build over
all source pixels then kernel-position gather-accumulate with implicit zero
padding). Output size floor((H + 2p - k)/s) + 1 (:361-362).

TPU-native design: the precise path is a single lax.conv_general_dilated (XLA
tiles it onto the MXU; im2col is an implementation detail XLA owns). The PQ
path has two formulations:

- decode: reconstruct the (small) dense kernel from codebooks+assignments on
  the fly and run the same MXU conv. Exact same outputs as the reference's
  LUT path (modulo float summation order); optimal on TPU because conv weight
  traffic is negligible next to activation traffic.
- lut: build the inner-product LUT over source pixels, then contract with the
  one-hot-encoded assignments — expressed as ONE convolution over the LUT
  channels, so padding/stride semantics are inherited from XLA. This is the
  faithful LUT+gather structure for parity testing and for layers where
  S*K < Cg*kh*kw would make it the cheaper contraction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from qcnn_tpu.ops import lut as lut_ops

# memory_fused 1x1-reroute gates (module-level so the A/B tools and tests
# can toggle the rule in-process). _FC1X1_MAX_ROWS = 0 DISABLES the
# reroute: measured round 5 (tools/out/fc1x1_ab.txt, fc1x1_probe2.txt,
# fc1x1_e2e_ab.txt), the fc fused-gather kernel LOSES to the one-hot OHWI
# decode at every production 1x1 geometry — reduce7 (2048->512 @7x7 b64)
# 193 vs 89 us isolated, best-tuned variant still 135 us, and e2e
# resnet50-b64 memory 7,548 vs 7,939 img/s with the rule off. The
# explicit impl="fc1x1" arm remains (parity-tested, smoke-covered) for
# geometries a caller knows to be favorable. KERNEL_STUDIES §16d.
_FC1X1_MIN_RATIO = 4
_FC1X1_MAX_ROWS = 0


def memory_fused_route(params: dict, x_shape, x_dtype, *, stride: int,
                       pad: int, groups: int = 1) -> str:
    """Resolve the 'memory_fused' mix for one conv geometry.

    Single source of truth for pq_conv's production routing AND the
    profiler's phase-split labeling (round-4 advisor finding: the profiler
    replicated the gate by hand and drifted). Returns the impl the mix
    runs: 'fusedconv' (in-kernel decode-conv, multi-tap), 'fc1x1' (the fc
    fused-gather kernel over the flattened spatial batch — a measured
    NEGATIVE at every production geometry, so _FC1X1_MAX_ROWS = 0 keeps
    this branch off by default; KERNEL_STUDIES §16d), or 'indecode_ohwi'
    (one-hot OHWI decode).
    """
    from qcnn_tpu.ops.pallas.pq_conv_fused import fits_vmem, supports

    b, h, w, cin = x_shape
    if x_dtype != jnp.bfloat16:
        # f32 callers keep the f32-exact one-hot decode (round-4 review
        # dtype gate) — both Pallas kernels compute with bf16 activations
        return "indecode_ohwi"
    a_shape = params["assignments"].shape
    multi_tap = a_shape[1] > 1
    if (multi_tap and supports(params, stride=stride, groups=groups,
                               cin=cin)
            # spatial gate (round-5 review): a single oversized image
            # (e.g. 96x96 stride-1 3x3) overflows the VMEM block even at
            # batch tile 1 — fall back instead of crashing the compiler
            and fits_vmem(h, w, pad, a_shape[1], a_shape[2])):
        return "fusedconv"
    cout = a_shape[0]
    # fc1x1 pre-slices x[:, ::stride] -> ceil(h/stride) rows (advisor
    # finding: floor under-counted threshold-boundary odd geometries)
    rows = b * (-(-h // stride)) * (-(-w // stride))
    k_cnt = params["codebooks"].shape[1]
    if (a_shape[1] == 1 and a_shape[2] == 1 and groups == 1 and pad == 0
            and cin >= _FC1X1_MIN_RATIO * cout
            and rows <= _FC1X1_MAX_ROWS
            and k_cnt <= 128):  # pq_fc_fused's one-vreg gather table —
            # without this an A/B toggle of the gate on K=256 params
            # CRASHED at trace time instead of falling back (round-5
            # review); unsupported geometries route like all others
        return "fc1x1"
    return "indecode_ohwi"

_DN = ("NHWC", "HWIO", "NHWC")


def _space_to_depth_transform(x, kernel, stride):
    """Rewrite a strided small-Cin conv as a stride-1 conv on a
    space-to-depth input.

    A stem conv (AlexNet: 11x11/s4 over 3 channels) feeds the MXU a
    3-channel contraction — 97% of the 128 input lanes idle. Folding r x r
    spatial blocks into channels (r = stride) gives an equivalent stride-1
    conv over r*r*Cin channels: output o reads taps r*o + t, t < k, which in
    block coordinates is a ceil-sized kernel over blocks with the original
    weights scattered by (t // r, t % r) and zeros elsewhere.

    Exact for pad == 0 (AlexNet conv1). Returns (x_sd, kernel_sd).
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    r = stride
    kb = (kh - 1) // r + 1  # block-kernel size
    # pad H/W up to a multiple of r; padded pixels only fall in zero weight
    # slots (tap index >= kh) or beyond the last output's receptive field
    hp = -(-h // r) * r
    wp = -(-w // r) * r
    x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    x_sd = (
        x.reshape(b, hp // r, r, wp // r, r, cin)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, hp // r, wp // r, r * r * cin)
    )
    # scatter weights: k_sd[bi, bj, (pi, pj, c), o] = k[r*bi+pi, r*bj+pj, c, o]
    k_sd = jnp.zeros((kb, kb, r, r, cin, cout), kernel.dtype)
    for ti in range(kh):
        for tj in range(kw):
            k_sd = k_sd.at[ti // r, tj // r, ti % r, tj % r].set(
                kernel[ti, tj]
            )
    return x_sd, k_sd.reshape(kb, kb, r * r * cin, cout)


def conv_dense(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    *,
    stride: int,
    pad: int,
    groups: int = 1,
    space_to_depth: bool = False,
    kernel_layout: str = "HWIO",
    out_dtype=None,
) -> jax.Array:
    """x: (B,H,W,Cin), kernel: (kh,kw,Cin/groups,Cout) -> (B,Ho,Wo,Cout).

    Computes in the kernel's dtype (bf16 kernels -> bf16 MXU passes) with
    float32 accumulation; output is float32 + bias.

    out_dtype: when set (network.forward passes its compute_dtype), the
    conv EMITS that dtype and the bias adds in it. TPU convolutions cannot
    fuse output epilogues, so the f32 conv result is otherwise a
    materialized HBM tensor that a separate convert pass re-reads — the
    round-4 headline HLO showed 1.16 GB of f32 conv outputs per step
    (tools/headline_attr.py). The MXU still accumulates in f32 internally;
    the only numerics change is rounding to bf16 before (instead of after)
    the bias add.

    kernel_layout: any permutation of HWIO — XLA consumes arbitrary kernel
    orders natively, so in-step decoders can hand over their decode-native
    layout and skip a full-weight relayout (KERNEL_STUDIES §9e).

    space_to_depth=True rewrites a strided small-Cin stem conv via
    _space_to_depth_transform. Measured on the attached chip it LOSES
    (AlexNet conv1 b256: 1791 us vs 1247 us plain) — the input relayout
    costs more than XLA's native small-Cin handling — so it is opt-in,
    kept as a documented negative result (docs/KERNEL_STUDIES.md).
    """
    if x.dtype == jnp.int8:
        # int8 activations are quantized CODES (ops/fc.fc_dense has the
        # same guard and rationale) — a float conv consuming them would
        # silently compute garbage
        raise ValueError(
            "conv_dense received int8 activation codes; the consumer "
            "must be conv_dense_int8 or the producer must not requantize"
        )
    if x.dtype != kernel.dtype:
        x = x.astype(kernel.dtype)
    out_hw = None
    if (
        space_to_depth
        and kernel_layout == "HWIO"
        and pad == 0 and stride > 1 and groups == 1
        and x.shape[-1] <= 4 and kernel.shape[0] > stride
    ):
        # expected output size under the ORIGINAL conv (floor rule,
        # CaffeEva.cc:361-362); the SD conv can produce extra trailing
        # rows/cols when (H - k) % stride != 0 — slice them off
        out_hw = (
            (x.shape[1] - kernel.shape[0]) // stride + 1,
            (x.shape[2] - kernel.shape[1]) // stride + 1,
        )
        x, kernel = _space_to_depth_transform(x, kernel, stride)
        stride = 1
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", kernel_layout, "NHWC"),
        feature_group_count=groups,
        preferred_element_type=(out_dtype or jnp.float32),
    )
    if out_hw is not None:
        out = out[:, : out_hw[0], : out_hw[1]]
    if out_dtype is not None:
        bias = bias.astype(out_dtype)
    return out + bias


def conv_dense_int8(
    x: jax.Array,
    kernel_q: jax.Array,
    k_scale: jax.Array,
    bias: jax.Array,
    *,
    stride: int,
    pad: int,
    groups: int = 1,
    act_scale: jax.Array | None = None,
    out_scale: jax.Array | None = None,
) -> jax.Array:
    """int8 conv: kernel_q (kh,kw,Cg,Cout) int8, per-Cout scales; activation
    quantization dynamic or via a static calibrated scale (see ops/fc.py
    fc_dense_int8). out_scale: emit int8 codes in the consumer's calibrated
    scale (ops/fc.requantize_int8 — the int8-native dataflow)."""
    from qcnn_tpu.ops.fc import quantize_activations_int8, requantize_int8

    xq, x_scale = quantize_activations_int8(x, act_scale)
    acc = lax.conv_general_dilated(
        xq,
        kernel_q,
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=_DN,
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    if out_scale is not None:
        return requantize_int8(acc, x_scale, k_scale, bias, out_scale)
    return acc.astype(jnp.float32) * (x_scale * k_scale) + bias


def pq_conv_decode(
    x: jax.Array, params: dict, *, stride: int, pad: int, groups: int = 1,
    via: str = "gather", out_dtype=None,
) -> jax.Array:
    """PQ conv via on-the-fly kernel decode + MXU conv.

    via='onehot' decodes with the one-hot matmul formulation — the in-step
    ('indecode') memory-mode configuration, where the gather lowering is
    hopeless on TPU (KERNEL_STUDIES §9b)."""
    cin_per_group = x.shape[-1] // groups
    kernel_layout = "HWIO"
    if via == "onehot":
        decode = lut_ops.decode_conv_kernel_onehot
    elif via == "onehot_ohwi":
        # decode-native order, no post-decode transpose (§9e)
        def decode(cb, a, cg):
            return lut_ops.decode_conv_kernel_onehot(cb, a, cg,
                                                     layout="ohwi")

        kernel_layout = "OHWI"
    elif via == "onehot_hwoi":
        # row-major HWOI == the conv's preferred physical kernel layout:
        # the decode fusion's output feeds the conv with no relayout (§9f)
        def decode(cb, a, cg):
            return lut_ops.decode_conv_kernel_onehot(cb, a, cg,
                                                     layout="hwoi")

        kernel_layout = "HWOI"
    elif via == "gdecode":
        from qcnn_tpu.ops.pallas import decode_conv_kernel_gather

        decode = decode_conv_kernel_gather
    elif via == "gdecode_iohw":
        from qcnn_tpu.ops.pallas import decode_conv_kernel_gather

        def decode(cb, a, cg):
            return decode_conv_kernel_gather(cb, a, cg, layout="iohw")

        kernel_layout = "IOHW"
    else:
        decode = lut_ops.decode_conv_kernel
    kernel = decode(
        params["codebooks"], params["assignments"], cin_per_group
    )
    return conv_dense(
        x, kernel, params["bias"], stride=stride, pad=pad, groups=groups,
        kernel_layout=kernel_layout, out_dtype=out_dtype,
    )


def _gemm_wins(x_shape, cout: int, kh: int, kw: int, groups: int,
               stride: int, pad: int) -> bool:
    """Crossover for the 'memory' conv impl (KERNEL_STUDIES §9f): the
    im2col GEMM saves the conv's computed-weight relayout (~0.38 XLA-
    estimated cycles/weight element) but pays the patch materialization
    (~0.002 cycles/patch element at HBM speed). With margin, choose GEMM
    when weight elements x 50 exceed patch elements."""
    if kh == 1 and kw == 1:
        return False  # 1x1 relayouts are cheap (measured ~200 cycles)
    if groups != 1:
        return False
    b, h, w, cin = x_shape
    ho = (h + 2 * pad - kh) // stride + 1
    wo = (w + 2 * pad - kw) // stride + 1
    weight_elems = kh * kw * cin * cout
    patch_elems = b * ho * wo * cin * kh * kw
    return weight_elems * 50 > patch_elems


def pq_conv_gemm(
    x: jax.Array, params: dict, *, stride: int, pad: int, groups: int = 1,
    via: str = "gather", out_dtype=None,
) -> jax.Array:
    """In-step decode + im2col GEMM (memory mode, KERNEL_STUDIES §9f).

    lax.conv on TPU wants its kernel in a specific physical layout;
    COMPUTED weights (in-step decodes) pay a relayout copy per conv that
    XLA estimates at ~0.4 cycles/element — 0.94 ms per stage3 3x3 conv,
    the entire resnet50 memory-mode gap. Dots take computed operands in
    their natural layout, so weight-heavy multi-tap convs run as
    patches @ decoded-weight instead:

      patches (B*Ho*Wo, Cin*kh*kw)   [lax.conv_general_dilated_patches,
                                      feature order (C, kh, kw) — verified]
      weight  (Cin*kh*kw, Cout)      [decode rows = Cin, cols packed
                                      (kh, kw, Cout) -> reshape views only]

    Only worthwhile when the weight is large relative to the patch tensor
    (the 9x activation inflation is the price); pq_conv's 'memory' impl
    applies the measured crossover.
    """
    if groups != 1:
        raise ValueError("pq_conv_gemm supports groups == 1")
    cb = params["codebooks"]
    a = params["assignments"]
    s, k, d = cb.shape
    cout, kh, kw, s2 = a.shape
    cg = x.shape[-1]
    # assignment rows packed (kh, kw, Cout): decode columns line up with
    # the (c, ij) patch features after a pure reshape
    a2 = jnp.transpose(jnp.asarray(a), (1, 2, 0, 3)).reshape(
        kh * kw * cout, s)
    if via == "gather":
        from qcnn_tpu.ops.pallas import decode_fc_weight_gather

        w = decode_fc_weight_gather(cb, a2, cg)  # (Cin, kh*kw*Cout)
    else:
        w = lut_ops.decode_fc_weight_onehot(cb, a2, cg)
    w2 = w.reshape(cg * kh * kw, cout)
    patches = lax.conv_general_dilated_patches(
        x, (kh, kw), (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    b, ho, wo, f = patches.shape
    out = lax.dot_general(
        patches.reshape(b * ho * wo, f).astype(w2.dtype), w2,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=(out_dtype or jnp.float32),
    )
    bias = params["bias"]
    if out_dtype is not None:
        bias = bias.astype(out_dtype)
    return out.reshape(b, ho, wo, cout) + bias


def pq_conv_lut(
    x: jax.Array, params: dict, *, stride: int, pad: int, groups: int = 1,
    out_dtype=None,
) -> jax.Array:
    """PQ conv as LUT build + one-hot conv over LUT channels.

    Per group g: lut_g[b,h,w,s,k] = <x_g[b,h,w,s*D:(s+1)*D], C[s,k]>; then
    out[b,ho,wo,o] = bias[o] + sum_{kh,kw,s} lut_g[b, hi, wi, s, A[o,kh,kw,s]]
    which is exactly a conv of lut_g (channels S*K) with the one-hot kernel
    OH[kh,kw,(s,k),o] = [A[o,kh,kw,s] == k]. Zero padding of the LUT replays
    the reference's skipping of out-of-bounds kernel positions
    (CaffeEva.cc:820-827) since absent positions contribute 0.
    """
    codebooks = params["codebooks"]
    assignments = params["assignments"]  # (Cout, kh, kw, S)
    s, k, d = codebooks.shape
    cout, kh, kw, _ = assignments.shape
    b, h, w, cin = x.shape
    cin_per_group = cin // groups

    luts = []
    for g in range(groups):
        xg = x[..., g * cin_per_group : (g + 1) * cin_per_group]
        lut_g = lut_ops.build_lut(xg, codebooks)  # (B,H,W,S,K)
        luts.append(lut_g.reshape(b, h, w, s * k))
    lut_all = jnp.concatenate(luts, axis=-1) if groups > 1 else luts[0]

    onehot = lut_ops.assignments_one_hot(assignments, k)  # (Cout,kh,kw,S,K)
    oh_kernel = jnp.transpose(
        onehot.reshape(cout, kh, kw, s * k), (1, 2, 3, 0)
    )  # (kh,kw,S*K,Cout)

    out = lax.conv_general_dilated(
        lut_all,
        oh_kernel,
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=_DN,
        feature_group_count=groups,
        preferred_element_type=(out_dtype or jnp.float32),
    )
    bias = params["bias"]
    if out_dtype is not None:
        bias = bias.astype(out_dtype)
    return out + bias


def pq_conv(
    x: jax.Array,
    params: dict,
    *,
    stride: int,
    pad: int,
    groups: int = 1,
    impl: str = "decode",
    out_dtype=None,
) -> jax.Array:
    if "perm" in params:
        # OPQ channel permutation (quantizer/opq.py): codebooks are shared
        # across groups, so the same within-group permutation applies to
        # each group's channel block. Decode-at-load params never reach
        # here (prepare folds it into the dense kernel).
        perm = jnp.asarray(params["perm"])
        cg = x.shape[-1] // groups
        if groups > 1:
            perm = jnp.concatenate(
                [perm + g * cg for g in range(groups)]
            )
        x = jnp.take(x, perm, axis=-1)
    if impl == "decode":
        return pq_conv_decode(x, params, stride=stride, pad=pad,
                              groups=groups, out_dtype=out_dtype)
    if impl == "indecode":
        # in-step decode: compressed weights resident in HBM, dense kernel
        # is a per-layer transient (one-hot MXU decode)
        return pq_conv_decode(
            x, params, stride=stride, pad=pad, groups=groups, via="onehot",
            out_dtype=out_dtype,
        )
    if impl == "gdecode":
        # in-step decode via the Pallas dynamic-gather kernel
        return pq_conv_decode(
            x, params, stride=stride, pad=pad, groups=groups, via="gdecode",
            out_dtype=out_dtype,
        )
    if impl in ("indecode_ohwi", "indecode_hwoi", "gdecode_iohw"):
        # layout-preserving in-step decodes: the conv consumes the decode's
        # native kernel order, skipping the full-weight relayout (§9e/9f)
        via = {"indecode_ohwi": "onehot_ohwi",
               "indecode_hwoi": "onehot_hwoi",
               "gdecode_iohw": "gdecode_iohw"}[impl]
        return pq_conv_decode(
            x, params, stride=stride, pad=pad, groups=groups, via=via,
            out_dtype=out_dtype,
        )
    if impl in ("gemm", "memory"):
        s, k, d = params["codebooks"].shape
        cout, kh, kw, _ = params["assignments"].shape
        if impl == "gemm" or _gemm_wins(x.shape, cout, kh, kw, groups,
                                        stride, pad):
            via = "gather" if k <= 128 else "onehot"
            return pq_conv_gemm(
                x, params, stride=stride, pad=pad, groups=groups, via=via,
                out_dtype=out_dtype,
            )
        return pq_conv_decode(
            x, params, stride=stride, pad=pad, groups=groups,
            via="onehot_ohwi", out_dtype=out_dtype,
        )
    if impl in ("fusedconv", "memory_fused"):
        # in-kernel gather decode + tap GEMMs: the decoded weight never
        # crosses an XLA boundary, so the §9f computed-weight relayout
        # cannot exist (ops/pallas/pq_conv_fused.py; KERNEL_STUDIES §16).
        # 'memory_fused' is the mixed memory mode: fused kernel where the
        # geometry qualifies (stride-1 ungrouped square multi-tap),
        # one-hot OHWI decode elsewhere.
        from qcnn_tpu.ops.pallas import pq_conv_fused
        from qcnn_tpu.ops.pallas.pq_conv_fused import supports

        if impl == "fusedconv":
            # explicit choice: the caller keeps the kernel at any dtype
            if not supports(params, stride=stride, groups=groups):
                raise ValueError(
                    "pq_conv_fused: unsupported geometry (use "
                    "'memory_fused' for the auto-fallback mix)"
                )
            out = pq_conv_fused(x, params, stride=stride, pad=pad,
                                groups=groups)
            return out.astype(out_dtype) if out_dtype is not None else out
        # the mix (routing rules + measurements: memory_fused_route).
        # x is already OPQ-permuted above, so the recursion must NOT see
        # 'perm' again (round-4 advisor HIGH finding: double permutation
        # silently corrupted OPQ convs hitting the fc1x1 gate)
        route = memory_fused_route(params, x.shape, x.dtype, stride=stride,
                                   pad=pad, groups=groups)
        if route in ("fusedconv", "fc1x1"):
            noperm = {k_: v for k_, v in params.items() if k_ != "perm"}
            return pq_conv(x, noperm, stride=stride, pad=pad,
                           groups=groups, impl=route, out_dtype=out_dtype)
        return pq_conv_decode(
            x, params, stride=stride, pad=pad, groups=groups,
            via="onehot_ohwi", out_dtype=out_dtype,
        )
    if impl == "fc1x1":
        # a 1x1 conv IS an FC over the flattened spatial batch: run the
        # memory-mode fc fused-gather kernel (in-kernel decode + GEMM,
        # §9c/§9d) instead of the one-hot weight decode. stride handled by
        # pre-slicing (exact for 1x1 kernels, pad 0). Routing decision by
        # measurement: KERNEL_STUDIES §16b round-4 addendum
        # (tools/fc1x1_ab.py).
        a = params["assignments"]
        if (a.shape[1] != 1 or a.shape[2] != 1 or groups != 1
                or pad != 0):
            raise ValueError(
                "fc1x1 requires an ungrouped 1x1 kernel with pad 0; got "
                f"taps {a.shape[1]}x{a.shape[2]}, groups={groups}, "
                f"pad={pad}"
            )
        from qcnn_tpu.ops.pallas import pq_fc_fused

        if stride > 1:
            x = x[:, ::stride, ::stride, :]
        b, h, w, cin = x.shape
        fc_p = {
            "codebooks": params["codebooks"],
            "assignments": jnp.asarray(a).reshape(a.shape[0], a.shape[3]),
            "bias": params["bias"],
        }
        y = pq_fc_fused(x.reshape(b * h * w, cin), fc_p, decode="gather")
        y = y.reshape(b, h, w, -1)
        return y.astype(out_dtype) if out_dtype is not None else y
    if impl == "lut":
        return pq_conv_lut(x, params, stride=stride, pad=pad, groups=groups,
                           out_dtype=out_dtype)
    raise ValueError(f"unknown pq_conv impl: {impl}")
