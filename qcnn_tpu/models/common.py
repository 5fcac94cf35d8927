"""Shared family-model knobs (ResNet/ViT — models/resnet.py, models/vit.py).

MEMORY_IMPL selects the in-graph PQ CONV decode formulation used when
params still carry codebooks (memory mode / unprepared params):

- "indecode": one-hot MXU matmul decode (KERNEL_STUDIES §9b — XLA's gather
  lowering is ~300x off roofline, the one-hot contraction is not);
- "indecode_ohwi": one-hot decode consumed in its native (Cout,kh,kw,Cg)
  order — no post-decode relayout (§9e);
- "gdecode"/"gdecode_iohw": Pallas dynamic-gather kernel
  (ops/pallas/pq_decode.py, §9c), HWIO / layout-preserving.

MEMORY_FC_IMPL selects the FC formulation; "auto" applies the measured
per-batch rule (ops/fc.py memory_fc_impl: lutgather at B<=2, fused-gather
GEMM otherwise, indecode for K>128 — §9c/§9d).

One shared constant each, so A/B tools (tools/decode_gather_ab.py) and a
measured flip change exactly one value for every family.
"""

# indecode_ohwi: one-hot decode consumed in its native OHWI layout.
# Measured best one-program memory conv (KERNEL_STUDIES §9f): the im2col
# GEMM reroute ('memory'/'gemm') that should dodge the computed-weight
# conv relayout LOSES e2e (resnet50 b64 10.4 vs 8.9 ms) — patch
# materialization via conv_general_dilated_patches costs more than the
# relayout it saves; kept opt-in as the recorded negative.
MEMORY_IMPL = "indecode_ohwi"
MEMORY_FC_IMPL = "auto"


def fc_memory_impl(batch: int, params: dict, dtype=None) -> str:
    """Resolve MEMORY_FC_IMPL for a concrete call site.

    params: the PQ dict ({"codebooks" (S,K,D), "assignments" (Cout,S)}).
    dtype: the activation dtype at the call site. The fused-gather kernel
    computes in bf16 internally, so it only serves bf16 activations; f32
    callers (quantizer validation, exactness tests) keep the
    param-dtype-exact one-hot decode."""
    if MEMORY_FC_IMPL != "auto":
        return MEMORY_FC_IMPL
    s, k, d = params["codebooks"].shape
    cout = params["assignments"].shape[0]
    if k > 128:
        return "indecode"
    import jax.numpy as jnp

    if dtype is not None and jnp.dtype(dtype) != jnp.bfloat16:
        return "indecode"
    # The gather kernels win when the layer is WEIGHT-dominated (the fc6
    # class: streaming the decoded weight is the binding cost). At ViT/
    # resnet-head geometries (Cin <= 3072, Cout <= 2048) indecode wins at
    # every batch (vit_b16 memory: b1 1.19 vs 1.46 ms, b8 3.99 vs 4.50,
    # b32 13.8 vs 40.5 — tools/out/vit_b1_memory_ab.txt,
    # decode_layout_ab.txt), and at row counts far above the weight height
    # the fused kernel's (D,B,S) x-transpose dominates.
    if s * d < 4096 and cout < 4096:
        return "indecode"
    if batch > 1024:
        return "indecode"
    if batch <= 2:
        return "lutgather"
    return "fgather"
