"""Vision Transformer with product-quantized projection GEMMs.

BASELINE.json stretch config: "ViT-B/16 PQ (stretch: PQ on attention/MLP
projection GEMMs, LUT kernels for transformer FC)". Every weight matrix —
qkv/out projections, the two MLP matrices, patch embedding, and the head —
is a (Cin, Cout) GEMM carrying the same PQ data model as the FC layers in
SURVEY.md §2a, so the whole op library (decode / onehot / gather / pallas)
applies unchanged.

Attention itself (QK^T, softmax, AV) has no weights and runs as plain
unpadded jnp/XLA. This is a measured choice (docs/KERNEL_STUDIES.md §7
round-2 addendum): at ViT-B/16 batch-64 bf16 the core is HBM-bandwidth
bound on the (B, H, N, N) f32 logits round-trip (~0.52 ms/block ≈ the
~360 MB traffic floor), so neither 197→256 key/value tile padding
(0.542 vs 0.517 ms, E2E neutral) nor the stock Pallas flash-attention
kernel (0.97–1.21 ms across block_b 1–16; grid-overhead dominated at 197
tokens) beats it. `_masked_attention` keeps the exact-numerics additive
-inf padding formulation (exp(-inf) = 0, max/denominator see only real
keys) for geometries that do want alignment.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from qcnn_tpu.models import common
from qcnn_tpu.models.common import make_cast as _make_cast
from qcnn_tpu.ops import fc as fc_ops


@dataclasses.dataclass(frozen=True)
class ViTSpec:
    name: str
    patch: int = 16
    image_size: int = 224
    dim: int = 768
    depth: int = 12
    heads: int = 12
    mlp_ratio: int = 4
    num_classes: int = 1000

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # + [CLS]


def vit_b16() -> ViTSpec:
    return ViTSpec("ViT-B/16")


def vit_s16() -> ViTSpec:
    return ViTSpec("ViT-S/16", dim=384, depth=12, heads=6)


def vit_l16() -> ViTSpec:
    return ViTSpec("ViT-L/16", dim=1024, depth=24, heads=16)


def vit_tiny_test() -> ViTSpec:
    """Miniature config for CPU tests."""
    return ViTSpec("ViT-test", patch=8, image_size=32, dim=64, depth=2,
                   heads=4, num_classes=10)


VITS = {"vit_b16": vit_b16, "vit_s16": vit_s16, "vit_l16": vit_l16}


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def _gemm(rng, cin, cout):
    return {
        "weight": (rng.standard_normal((cin, cout)) /
                   np.sqrt(cin)).astype(np.float32),
        "bias": np.zeros(cout, np.float32),
    }


def _ln(dim):
    return {"scale": np.ones(dim, np.float32),
            "shift": np.zeros(dim, np.float32)}


def init_dense_params(spec: ViTSpec, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    d = spec.dim
    params: dict = {
        "patch_embed": _gemm(rng, spec.patch * spec.patch * 3, d),
        "cls_token": np.zeros((1, 1, d), np.float32),
        "pos_embed": (rng.standard_normal((1, spec.seq_len, d)) *
                      0.02).astype(np.float32),
        "head": _gemm(rng, d, spec.num_classes),
        "ln_final": _ln(d),
    }
    for i in range(spec.depth):
        params[f"blk{i}"] = {
            "ln1": _ln(d),
            "qkv": _gemm(rng, d, 3 * d),
            "out": _gemm(rng, d, d),
            "ln2": _ln(d),
            "mlp1": _gemm(rng, d, spec.mlp_ratio * d),
            "mlp2": _gemm(rng, spec.mlp_ratio * d, d),
        }
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _layernorm(x, p, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["shift"]).astype(x.dtype)


def _masked_attention(q, k, v, n_pad: int, logits_dtype=jnp.float32):
    """(B, N, H, hd) q/k/v -> (B, N, H, hd); keys/values zero-padded by
    n_pad tokens with an additive -inf mask. exp(-inf) = 0 and the softmax
    max/denominator come only from real keys, so any n_pad yields outputs
    identical to n_pad=0 (tested in test_model_families.py) — padding is
    purely an MXU tile-alignment choice (197 -> 256 for ViT-B/16).

    logits_dtype sets the materialization dtype of the (B, H, N, N) logits
    — the binding HBM working set of the whole block (KERNEL_STUDIES §7).
    bfloat16 halves that stream; softmax still reduces in float32
    (upcast inside the fusion). Numerics/throughput A/B:
    tools/vit_logits_ab.py."""
    hd = q.shape[-1]
    if n_pad:
        k = jnp.pad(k, ((0, 0), (0, n_pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, n_pad), (0, 0), (0, 0)))
    att = (jnp.einsum(
        "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
    ) / np.sqrt(hd)).astype(logits_dtype)
    if n_pad:
        mask = jnp.concatenate(
            [jnp.zeros(k.shape[1] - n_pad), jnp.full(n_pad, -jnp.inf)]
        ).astype(logits_dtype)
        att = att + mask
    att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum(
        "bhnm,bmhd->bnhd", att, v, preferred_element_type=jnp.float32
    )


def _proj(x, p, out_dtype=None):
    """(…, Cin) @ gemm -> (…, Cout), PQ or dense.

    out_dtype: emit the compute dtype straight from the GEMM — otherwise
    every projection materializes an f32 tensor (qkv at B=64 is 116 MB)
    that a separate convert pass re-reads (tools/headline_attr.py physics;
    q/k/v previously even FLOWED f32 into the attention einsums because no
    cast sat between the qkv projection and the split)."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if "codebooks" in p:
        # in-graph PQ FC formulation: models/common.py MEMORY_FC_IMPL
        # (per-batch rule — ViT projections see B*tokens rows)
        y = fc_ops.pq_fc(x2, p, impl=common.fc_memory_impl(
            x2.shape[0], p, x2.dtype), out_dtype=out_dtype)
    elif "weight_q" in p:
        y = fc_ops.fc_dense_int8(
            x2, p["weight_q"], p["scale"], p["bias"],
            act_scale=p.get("act_scale"),
        )
    else:
        y = fc_ops.fc_dense(x2, p["weight"], p["bias"], out_dtype=out_dtype)
    if out_dtype is not None and y.dtype != out_dtype:
        y = y.astype(out_dtype)  # int8/Pallas branches fix their dtype
    return y.reshape(*lead, y.shape[-1])


def forward(
    params: dict,
    x: jax.Array,
    *,
    spec: ViTSpec,
    compute_dtype=None,
    with_softmax: bool = False,
    attn_logits_dtype=None,
) -> jax.Array:
    """(B, H, W, 3) NHWC -> (B, num_classes).

    attn_logits_dtype: materialization dtype of the attention logits (the
    binding working set per block); see _masked_attention. Default (None)
    follows the compute dtype: bf16 logits when activations are bf16 —
    measured +19% end-to-end at batch 64 (24.8 vs 29.5 ms), neutral at
    batch 8-16, max |dprob| 2.3e-4, top-1 identical (tools/vit_logits_ab.py)
    — and f32 otherwise (exactness mode stays exact)."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    if attn_logits_dtype is None:
        attn_logits_dtype = (
            jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
        )
    cast = _make_cast(compute_dtype)
    x = _run_embed(x, params, spec, cast)
    for i in range(spec.depth):
        x = _run_block(x, params[f"blk{i}"], spec, cast, attn_logits_dtype)
    return _run_head(x, params, with_softmax)


def _run_embed(x, params, spec, cast):
    b, h, w, c = x.shape
    p = spec.patch
    # patchify: (B, H/p, p, W/p, p, C) -> (B, N, p*p*C)
    x = x.reshape(b, h // p, p, w // p, p, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, spec.num_patches, -1)
    x = cast(_proj(x, params["patch_embed"],
                   out_dtype=getattr(cast, "dtype", None)))
    cls = jnp.broadcast_to(
        params["cls_token"].astype(x.dtype), (b, 1, spec.dim)
    )
    x = jnp.concatenate([cls, x], axis=1)
    return x + params["pos_embed"].astype(x.dtype)


def _run_block(x, blk, spec, cast, attn_logits_dtype):
    """One transformer block (shared by forward and forward_segments).

    Unpadded attention (n_pad=0): the core is logits-bandwidth bound and
    197->256 key/value padding measured neutral-to-worse (KERNEL_STUDIES
    §7). Head split via reshape only; the contractions carry the head axis
    in-place (explicit (0,2,1,3) transposes measured +0.11 ms/block at
    ViT-B batch 64, outputs bit-identical)."""
    b = x.shape[0]
    nh = spec.heads
    hd = spec.dim // nh
    od = getattr(cast, "dtype", None)
    y = _layernorm(x, blk["ln1"])
    qkv = _proj(y, blk["qkv"], out_dtype=od)  # (B, N, 3D)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, -1, nh, hd)
    k = k.reshape(b, -1, nh, hd)
    v = v.reshape(b, -1, nh, hd)
    o = _masked_attention(q, k, v, 0, attn_logits_dtype)
    o = cast(o.reshape(b, -1, spec.dim))
    x = x + cast(_proj(o, blk["out"], out_dtype=od))
    y = _layernorm(x, blk["ln2"])
    # exact (erf) GELU, matching timm/torch semantics so imported
    # pretrained weights reproduce 1:1 (jax.nn.gelu defaults to the tanh
    # approximation); elementwise-bandwidth-bound either way
    y = cast(jax.nn.gelu(_proj(y, blk["mlp1"], out_dtype=od),
                         approximate=False))
    return x + cast(_proj(y, blk["mlp2"], out_dtype=od))


def _run_head(x, params, with_softmax: bool):
    x = _layernorm(x, params["ln_final"])
    logits = _proj(x[:, 0], params["head"]).astype(jnp.float32)
    if with_softmax:
        logits = jax.nn.softmax(logits, axis=-1)
    return logits


def forward_segments(spec: ViTSpec, *, compute_dtype=None,
                     with_softmax: bool = False, attn_logits_dtype=None):
    """[(name, fn(x, params) -> x)] whose composition equals forward —
    feeds eval.profiler.profile_segments (family DispElpsTime analogue)."""
    if attn_logits_dtype is None and compute_dtype is not None:
        # same rule as forward (which keys off x.dtype AFTER the
        # compute_dtype cast — round-5 review: `compute_dtype ==
        # jnp.bfloat16` missed the string spelling and the
        # compute_dtype=None bf16-input case, so segment numerics
        # diverged from the forward they claim to compose into)
        attn_logits_dtype = (
            jnp.bfloat16 if jnp.dtype(compute_dtype) == jnp.bfloat16
            else jnp.float32
        )

    def _attn_dtype(x):
        if attn_logits_dtype is not None:
            return attn_logits_dtype
        return jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32

    cast = _make_cast(compute_dtype)

    def embed(x, p):
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
        return _run_embed(x, p, spec, cast)

    segs = [("embed", embed)]
    for i in range(spec.depth):
        segs.append((
            f"blk{i}",
            lambda x, p, i=i: _run_block(
                x, p[f"blk{i}"], spec, cast, _attn_dtype(x)
            ),
        ))
    segs.append(("head", lambda x, p: _run_head(x, p, with_softmax)))
    return segs


# ---------------------------------------------------------------------------
# Quantization / preparation
# ---------------------------------------------------------------------------

def quantize_params(
    spec: ViTSpec,
    dense: dict,
    *,
    seed: int = 0,
    subvec_len: int = 4,
    num_codewords: int = 32,
) -> dict:
    """PQ every projection GEMM; LN/embeddings stay dense (tiny)."""
    from qcnn_tpu.quantizer.pq import quantize_fc_layer

    key_holder = [jax.random.key(seed)]

    def next_key():
        key_holder[0], sub = jax.random.split(key_holder[0])
        return sub

    def quant(p):
        if isinstance(p, dict) and "weight" in p:
            cin = p["weight"].shape[0]
            return quantize_fc_layer(
                next_key(), np.asarray(p["weight"]).T, p["bias"],
                num_subspaces=-(-cin // subvec_len),
                num_codewords=num_codewords,
            )
        if isinstance(p, dict):
            return {k: quant(v) for k, v in p.items()}
        return p

    return {name: quant(p) for name, p in dense.items()}


def prepare_params(spec: ViTSpec, params: dict, dtype=jnp.bfloat16,
                   *, memory: bool = False) -> dict:
    """Decode PQ GEMMs to dense `dtype` host-side.

    memory=True keeps PQ layers compressed (in-step one-hot decode at
    execution, KERNEL_STUDIES §9b); see resnet.prepare_params."""
    import ml_dtypes

    from qcnn_tpu.models.prepare import _decode_fc_weight_np

    int8 = dtype in (jnp.int8, np.int8, "int8")
    np_dtype = (
        ml_dtypes.bfloat16 if dtype in (jnp.bfloat16, "bfloat16")
        else (np.float32 if int8 else dtype)
    )
    cin_map = _gemm_cin_map(spec)

    def finish(w, bias) -> dict:
        bias = np.asarray(bias, np.float32)
        if int8:
            from qcnn_tpu.models.prepare import _quantize_weight_int8

            wq, scale = _quantize_weight_int8(np.asarray(w, np.float32))
            return {"weight_q": wq, "scale": scale, "bias": bias}
        return {"weight": np.asarray(w, np_dtype), "bias": bias}

    def prep(p, path):
        if isinstance(p, dict) and "codebooks" in p:
            if memory:
                cb_dtype = ml_dtypes.bfloat16 if int8 else np_dtype
                out = {
                    "codebooks": np.asarray(p["codebooks"], cb_dtype),
                    "assignments": np.asarray(p["assignments"]),
                    "bias": np.asarray(p["bias"], np.float32),
                }
                if "perm" in p:
                    # OPQ perm: consumed per call by ops.pq_fc (round-5
                    # review: dropping it silently computed W_perm.x)
                    out["perm"] = np.asarray(p["perm"])
                return out
            w = _decode_fc_weight_np(
                np.asarray(p["codebooks"]), np.asarray(p["assignments"]),
                cin_map[path],
            )
            if "perm" in p:
                # fold the inverse permutation, as models/prepare.py:262
                from qcnn_tpu.quantizer.opq import inverse_permutation

                w = w[inverse_permutation(p["perm"]), :]
            return finish(w, p["bias"])
        if isinstance(p, dict) and "weight" in p:
            return finish(p["weight"], p["bias"])
        if isinstance(p, dict):
            return {k: prep(v, f"{path}.{k}") for k, v in p.items()}
        return p

    return {name: prep(p, name) for name, p in params.items()}


def _gemm_cin_map(spec: ViTSpec) -> dict:
    d = spec.dim
    m = {
        "patch_embed": spec.patch * spec.patch * 3,
        "head": d,
    }
    for i in range(spec.depth):
        m[f"blk{i}.qkv"] = d
        m[f"blk{i}.out"] = d
        m[f"blk{i}.mlp1"] = d
        m[f"blk{i}.mlp2"] = spec.mlp_ratio * d
    return m
