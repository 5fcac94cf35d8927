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

# memory_fused (round 4): multi-tap stride-1 convs with cin >= 256 run
# the fused in-kernel decode-conv Pallas kernel (the §9f end-run that
# finally measured a WIN: isolated stage3 conv2 2.5x, e2e resnet50 b64
# memory 8.43 -> 8.04 ms, tools/out/fusedconv_ab2.txt); everything else
# falls back to the one-hot OHWI decode. Measured negatives kept on
# record: the im2col GEMM reroute loses e2e (10.4 vs 8.9 ms, §9f);
# routing 1x1 convs through the fused kernel loses badly (13.1 vs 8.0 ms,
# fusedconv_ab3.txt — single-tap cells are grid-overhead-bound); AlexNet's
# linear-spec 'memory' stays indecode_ohwi (fc-dominated, fused conv arm
# neutral: 4.74 vs 4.82 ms b256, memory_fused_e2e_ab.txt).
MEMORY_IMPL = "memory_fused"
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


def serving_defaults(model: str) -> dict:
    """Measured per-family serving config: {max_batch, buckets}.

    Derived from the round-4 batch sweeps (tools/vit_batch_sweep.py,
    tools/out/sweep_*.txt; KERNEL_STUDIES §11/§11b — bf16 input,
    harness-baseline-subtracted):

    - ViT (every depth): throughput peaks at batch 8 and falls past 32
      (the attention-logits working set grows linearly with batch while
      GEMM efficiency saturates); ViT-L tracks ViT-B's efficiency at its
      ~3.8x per-image cost (877 img/s @ b8 vs B/16's 3.3k @ b8), so the
      SAME ladder serves both. max_batch 32, ladder (1, 8, 32).
    - resnet50 and shallower: keeps scaling through 64+ -> max_batch 64,
      ladder (1, 8, 32, 64).
    - resnet101: peak at b128 (9.2k img/s vs 8.4k @ 64) -> max_batch 128.
    - resnet152: peak at b32 (7.1k) with b64 within 2%; past 64 it FALLS
      (6.4k @ 128, 5.5k @ 256 — the 60M-param weight stream plus deep
      activation working set) -> max_batch 64, ladder (1, 8, 32, 64).

    `model` may be a zoo name, family registry name, or a checkpoint
    manifest family string ("vit"/"resnet").
    """
    m = model.lower()
    if m.startswith("vit"):
        return {"max_batch": 32, "buckets": (1, 8, 32)}
    if "resnet101" in m:
        # 64 stays in the ladder: b64 measures 8.4k (within 10% of the
        # b128 peak), and without it batches of 33-64 would pad straight
        # to 128 — up to 2x wasted device compute at moderate load
        return {"max_batch": 128, "buckets": (1, 8, 32, 64, 128)}
    if "resnet152" in m:
        return {"max_batch": 64, "buckets": (1, 8, 32, 64)}
    # CNNs (AlexNet class, VGG, resnet18/50): scale through 64
    return {"max_batch": 64, "buckets": (1, 8, 32, 64)}

def make_cast(compute_dtype):
    """Activation-cast closure shared by the family forwards. `.dtype`
    carries the GEMM/conv emit dtype (out_dtype of _apply_conv/_proj);
    one copy so the dtype rule cannot drift between families (round-5
    review: resnet/vit each had a verbatim private copy)."""
    def cast(v):
        return v.astype(compute_dtype) if compute_dtype is not None else v
    cast.dtype = compute_dtype
    return cast


def build_family_forward(family, spec, params, *, memory=False,
                         compute_dtype=None):
    """The ONE family serving/eval wiring: compute-dtype default (bf16 on
    TPU), the int8->bf16 activation rule, prepare, and the
    softmax-emitting partial forward. Returns (prepared_params,
    forward_fn(params, x), act_dtype).

    Shared by FamilyClassifier (classify/eval) and the serve engine
    builder (round-5 review: two verbatim copies of this wiring could
    drift — e.g. an activation-rule change reaching one surface only).
    `family` is a registry name ('resnet'/'vit') or the module itself."""
    import functools

    import jax
    import jax.numpy as jnp

    from qcnn_tpu.models.prepare import act_dtype_for

    fam = (family if not isinstance(family, str) else
           __import__(f"qcnn_tpu.models.{family}", fromlist=[family]))
    if compute_dtype is None:
        compute_dtype = (
            jnp.bfloat16 if jax.default_backend() == "tpu"
            else jnp.float32
        )
    act_dtype = act_dtype_for(compute_dtype)
    prepared = fam.prepare_params(spec, params, dtype=compute_dtype,
                                  memory=memory)
    fwd = functools.partial(
        fam.forward, spec=spec, compute_dtype=act_dtype,
        with_softmax=True,
    )
    return prepared, fwd, act_dtype
