"""ResNet-v1.5 family with product-quantized convolutions and classifier.

BASELINE.json stretch config: "ResNet-50 PQ (stretch scheme to residual
blocks + 1x1 convs)". The reference framework has no residual networks (its
graph is a linear layer list, CaffePara.cc:20-237); this module extends the
PQ scheme to branching graphs the TPU-native way: the graph is Python
composition of jit-traceable ops, the spec is static data, and parameters are
a nested pytree.

PQ applies per conv (including 1x1 projections) over the input-channel axis
and to the final FC — the same data model as SURVEY.md §2a. BatchNorm is an
inference-time affine; `fold_batchnorm` merges it into the adjacent conv's
decoded weights at preparation, like every production inference stack.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from qcnn_tpu.models import common
from qcnn_tpu.models.common import make_cast as _make_cast
from qcnn_tpu.ops import conv as conv_ops
from qcnn_tpu.ops import fc as fc_ops
from qcnn_tpu.ops.misc import relu


@dataclasses.dataclass(frozen=True)
class ResNetSpec:
    name: str
    stage_depths: tuple[int, ...]      # blocks per stage, e.g. (3, 4, 6, 3)
    stage_channels: tuple[int, ...]    # bottleneck out channels per stage
    num_classes: int = 1000
    in_size: int = 224
    bottleneck: bool = True


def resnet50() -> ResNetSpec:
    return ResNetSpec("ResNet50", (3, 4, 6, 3), (256, 512, 1024, 2048))


def resnet18() -> ResNetSpec:
    return ResNetSpec(
        "ResNet18", (2, 2, 2, 2), (64, 128, 256, 512), bottleneck=False
    )


def resnet101() -> ResNetSpec:
    return ResNetSpec("ResNet101", (3, 4, 23, 3), (256, 512, 1024, 2048))


def resnet152() -> ResNetSpec:
    return ResNetSpec("ResNet152", (3, 8, 36, 3), (256, 512, 1024, 2048))


RESNETS = {"resnet50": resnet50, "resnet18": resnet18,
           "resnet101": resnet101, "resnet152": resnet152}


# ---------------------------------------------------------------------------
# Parameter construction
# ---------------------------------------------------------------------------

def _conv_param(rng, kh, kw, cin, cout):
    fan = kh * kw * cin
    return {
        "kernel": (rng.standard_normal((kh, kw, cin, cout)) /
                   np.sqrt(fan)).astype(np.float32),
        "bias": np.zeros(cout, np.float32),
    }


def _block_channels(spec: ResNetSpec, stage: int) -> tuple[int, int]:
    cout = spec.stage_channels[stage]
    mid = cout // 4 if spec.bottleneck else cout
    return mid, cout


def init_dense_params(spec: ResNetSpec, seed: int = 0) -> dict:
    """Random dense parameters (no pretrained weights ship offline; the
    quantizer path is validated against this dense reference)."""
    rng = np.random.default_rng(seed)
    params: dict = {
        "stem": _conv_param(rng, 7, 7, 3, 64),
    }
    cin = 64
    for s, depth in enumerate(spec.stage_depths):
        mid, cout = _block_channels(spec, s)
        for b in range(depth):
            key = f"s{s}b{b}"
            block: dict = {}
            if spec.bottleneck:
                block["conv1"] = _conv_param(rng, 1, 1, cin, mid)
                block["conv2"] = _conv_param(rng, 3, 3, mid, mid)
                block["conv3"] = _conv_param(rng, 1, 1, mid, cout)
            else:
                block["conv1"] = _conv_param(rng, 3, 3, cin, mid)
                block["conv2"] = _conv_param(rng, 3, 3, mid, cout)
            # Canonical ResNet-v1.5: projection shortcut only when shape
            # changes (channels or stride; every stride-2 block here also
            # changes channels, so cin != cout covers both). Stage-0
            # block-0 of ResNet-18 keeps the identity shortcut, so
            # pretrained checkpoints map 1:1.
            if cin != cout:
                block["proj"] = _conv_param(rng, 1, 1, cin, cout)
            params[key] = block
            cin = cout
    params["fc"] = {
        "weight": (rng.standard_normal((cin, spec.num_classes)) /
                   np.sqrt(cin)).astype(np.float32),
        "bias": np.zeros(spec.num_classes, np.float32),
    }
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _apply_conv(x, p, *, stride=1, pad=0, out_dtype=None):
    """out_dtype: emit the compute dtype straight from the conv/epilogue —
    TPU convolutions cannot fuse output converts, so an f32 conv output is
    a materialized HBM tensor re-read by a separate pass (measured on the
    AlexNet headline, tools/headline_attr.py; same physics here)."""
    if "codebooks" in p:
        # in-graph PQ decode formulation: models/common.py MEMORY_IMPL
        return conv_ops.pq_conv(x, p, stride=stride, pad=pad,
                                impl=common.MEMORY_IMPL,
                                out_dtype=out_dtype)
    if "kernel_q" in p:
        return conv_ops.conv_dense_int8(
            x, p["kernel_q"], p["scale"], p["bias"],
            stride=stride, pad=pad, act_scale=p.get("act_scale"),
        )
    return conv_ops.conv_dense(x, p["kernel"], p["bias"],
                               stride=stride, pad=pad, out_dtype=out_dtype)


def _apply_fc(x, p, out_dtype=None):
    if "codebooks" in p:
        # models/common.py MEMORY_FC_IMPL (per-batch measured rule)
        return fc_ops.pq_fc(x, p, impl=common.fc_memory_impl(
            x.shape[0], p, x.dtype), out_dtype=out_dtype)
    if "weight_q" in p:
        return fc_ops.fc_dense_int8(
            x, p["weight_q"], p["scale"], p["bias"],
            act_scale=p.get("act_scale"),
        )
    return fc_ops.fc_dense(x, p["weight"], p["bias"], out_dtype=out_dtype)


def _run_block(x, block, stride: int, bottleneck: bool, cast):
    """One residual block (shared by forward and forward_segments)."""
    od = getattr(cast, "dtype", None)
    shortcut = x
    if "proj" in block:
        shortcut = cast(_apply_conv(x, block["proj"], stride=stride,
                                    out_dtype=od))
    if bottleneck:
        y = cast(relu(_apply_conv(x, block["conv1"], out_dtype=od)))
        y = cast(relu(_apply_conv(y, block["conv2"], stride=stride, pad=1,
                                  out_dtype=od)))
        y = cast(_apply_conv(y, block["conv3"], out_dtype=od))
    else:
        y = cast(relu(_apply_conv(x, block["conv1"], stride=stride, pad=1,
                                  out_dtype=od)))
        y = cast(_apply_conv(y, block["conv2"], pad=1, out_dtype=od))
    return relu(y + shortcut)


def _run_stem(x, params, cast):
    from qcnn_tpu.ops.misc import caffe_max_pool

    x = cast(relu(_apply_conv(x, params["stem"], stride=2, pad=3,
                              out_dtype=getattr(cast, "dtype", None))))
    # floor-mode (torch/canonical) pool: 112 -> 56, matching torchvision so
    # pretrained weights import 1:1 (ceil mode would give 57)
    return caffe_max_pool(x, kernel=3, stride=2, pad=1, ceil_mode=False)


def _run_head(x, params, cast, with_softmax: bool):
    x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # global average pool
    logits = _apply_fc(cast(x), params["fc"]).astype(jnp.float32)
    if with_softmax:
        logits = jax.nn.softmax(logits, axis=-1)
    return logits


def forward(
    params: dict,
    x: jax.Array,
    *,
    spec: ResNetSpec,
    compute_dtype=None,
    with_softmax: bool = False,
) -> jax.Array:
    """(B, H, W, 3) NHWC -> (B, num_classes) logits (or probabilities)."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    cast = _make_cast(compute_dtype)
    x = _run_stem(x, params, cast)
    for s, depth in enumerate(spec.stage_depths):
        for b in range(depth):
            stride = 2 if (s > 0 and b == 0) else 1
            x = _run_block(
                x, params[f"s{s}b{b}"], stride, spec.bottleneck, cast
            )
    return _run_head(x, params, cast, with_softmax)


def forward_segments(spec: ResNetSpec, *, compute_dtype=None,
                     with_softmax: bool = False):
    """[(name, fn(x, params) -> x)] whose composition equals forward —
    feeds eval.profiler.profile_segments (the family analogue of the
    per-layer DispElpsTime tables, CaffeEva.cc:297-326)."""
    cast = _make_cast(compute_dtype)
    segs = [(
        "stem+pool",
        lambda x, p: _run_stem(
            x.astype(compute_dtype) if compute_dtype is not None else x,
            p, cast,
        ),
    )]
    for s, depth in enumerate(spec.stage_depths):
        def stage(x, p, s=s, depth=depth):
            for b in range(depth):
                stride = 2 if (s > 0 and b == 0) else 1
                x = _run_block(
                    x, p[f"s{s}b{b}"], stride, spec.bottleneck, cast
                )
            return x

        segs.append((f"stage{s}", stage))
    segs.append(("head", lambda x, p: _run_head(x, p, cast, with_softmax)))
    return segs


# ---------------------------------------------------------------------------
# Quantization / preparation
# ---------------------------------------------------------------------------

def quantize_params(
    spec: ResNetSpec,
    dense: dict,
    *,
    seed: int = 0,
    conv_subvec_len: int = 4,
    conv_codewords: int = 128,
    fc_subvec_len: int = 4,
    fc_codewords: int = 32,
    min_cin: int = 16,
) -> dict:
    """Quantize every conv/fc. Convs with cin < min_cin (the stem) stay
    dense — PQ on 3 input channels saves nothing (cf. AlexNet conv1's
    degenerate single-subspace codebook, SURVEY.md §2a)."""
    from qcnn_tpu.quantizer.pq import quantize_conv_layer, quantize_fc_layer

    key_holder = [jax.random.key(seed)]

    def next_key():
        key_holder[0], sub = jax.random.split(key_holder[0])
        return sub

    def quant_leaf(p: dict) -> dict:
        if "kernel" in p:
            kh, kw, cin, cout = p["kernel"].shape
            if cin < min_cin:
                return p
            oihw = np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1))
            return quantize_conv_layer(
                next_key(), oihw, p["bias"],
                num_subspaces=-(-cin // conv_subvec_len),
                num_codewords=conv_codewords,
            )
        if "weight" in p:
            return quantize_fc_layer(
                next_key(), np.asarray(p["weight"]).T, p["bias"],
                num_subspaces=-(-p["weight"].shape[0] // fc_subvec_len),
                num_codewords=fc_codewords,
            )
        return {k: quant_leaf(v) for k, v in p.items()}

    return {name: quant_leaf(p) for name, p in dense.items()}


def prepare_params(spec: ResNetSpec, params: dict, dtype=jnp.bfloat16,
                   *, memory: bool = False) -> dict:
    """Decode PQ tensors to dense in `dtype` (host-side NumPy).

    memory=True keeps PQ layers compressed (codebooks cast, assignments
    unchanged): the forward then decodes in-step via the one-hot MXU
    matmul ('indecode', KERNEL_STUDIES §9b) — only codebooks+assignments
    are resident in HBM. int8 does not combine with memory mode (codebooks
    stay in the float dtype)."""
    import ml_dtypes

    from qcnn_tpu.models.prepare import (
        _decode_conv_kernel_np, _decode_fc_weight_np,
    )

    int8 = dtype in (jnp.int8, np.int8, "int8")
    np_dtype = (
        ml_dtypes.bfloat16 if dtype in (jnp.bfloat16, "bfloat16")
        else (np.float32 if int8 else dtype)
    )

    def finish(kind: str, w: np.ndarray, bias) -> dict:
        """kind: 'kernel'|'weight'. int8 -> per-Cout symmetric quant with
        scales (ops.conv.conv_dense_int8 / ops.fc.fc_dense_int8); else cast."""
        bias = np.asarray(bias, np.float32)
        if int8:
            from qcnn_tpu.models.prepare import _quantize_weight_int8

            wq, scale = _quantize_weight_int8(np.asarray(w, np.float32))
            return {f"{kind}_q": wq, "scale": scale, "bias": bias}
        return {kind: np.asarray(w, np_dtype), "bias": bias}

    def prep(p, cin_hint=None, is_fc=False):
        if "codebooks" in p:
            if memory:
                cb_dtype = (
                    ml_dtypes.bfloat16 if int8 else np_dtype
                )
                out = {
                    "codebooks": np.asarray(p["codebooks"], cb_dtype),
                    "assignments": np.asarray(p["assignments"]),
                    "bias": np.asarray(p["bias"], np.float32),
                }
                if "perm" in p:
                    # OPQ channel permutation: consumed per call by
                    # ops.pq_conv/pq_fc (round-5 review: dropping it
                    # here silently computed W_perm.x)
                    out["perm"] = np.asarray(p["perm"])
                return out
            s, _, d = np.asarray(p["codebooks"]).shape
            if is_fc:
                w = _decode_fc_weight_np(
                    np.asarray(p["codebooks"]),
                    np.asarray(p["assignments"]),
                    cin_hint if cin_hint else s * d,
                )
                if "perm" in p:
                    # fold the inverse permutation into the decoded
                    # weight, exactly as models/prepare.py:262
                    from qcnn_tpu.quantizer.opq import inverse_permutation

                    w = w[inverse_permutation(p["perm"]), :]
                return finish("weight", w, p["bias"])
            kern = _decode_conv_kernel_np(
                np.asarray(p["codebooks"]),
                np.asarray(p["assignments"]),
                cin_hint if cin_hint else s * d,
            )
            if "perm" in p:
                from qcnn_tpu.quantizer.opq import inverse_permutation

                kern = kern[:, :, inverse_permutation(p["perm"]), :]
            return finish("kernel", kern, p["bias"])
        if "kernel" in p:
            return finish("kernel", p["kernel"], p["bias"])
        if "weight" in p:
            return finish("weight", p["weight"], p["bias"])
        return dict(p)

    prepared: dict = {}
    shapes = _conv_cin_map(spec)
    for name, p in params.items():
        if name == "fc":
            prepared[name] = prep(p, cin_hint=shapes["fc"], is_fc=True)
        elif "codebooks" in p or "kernel" in p:
            prepared[name] = prep(p, cin_hint=shapes.get(name))
        else:  # block dict
            prepared[name] = {
                k: prep(v, cin_hint=shapes.get(f"{name}.{k}"))
                for k, v in p.items()
            }
    return prepared


def _conv_cin_map(spec: ResNetSpec) -> dict:
    """True input-channel count per conv (codebook span may overhang)."""
    shapes: dict = {"stem": 3}
    cin = 64
    for s, depth in enumerate(spec.stage_depths):
        mid, cout = _block_channels(spec, s)
        for b in range(depth):
            key = f"s{s}b{b}"
            if spec.bottleneck:
                shapes[f"{key}.conv1"] = cin
                shapes[f"{key}.conv2"] = mid
                shapes[f"{key}.conv3"] = mid
            else:
                shapes[f"{key}.conv1"] = cin
                shapes[f"{key}.conv2"] = mid
            shapes[f"{key}.proj"] = cin
            cin = cout
    shapes["fc"] = cin
    return shapes


def fold_batchnorm(conv: dict, gamma, beta, mean, var, eps=1e-5) -> dict:
    """Fold an inference BatchNorm into the preceding dense conv:
    W' = W * gamma/sqrt(var+eps); b' = (b - mean) * scale + beta."""
    scale = np.asarray(gamma) / np.sqrt(np.asarray(var) + eps)
    return {
        "kernel": np.asarray(conv["kernel"]) * scale,  # broadcast over Cout
        "bias": (np.asarray(conv["bias"]) - np.asarray(mean)) * scale
        + np.asarray(beta),
    }
