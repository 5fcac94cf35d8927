"""Sequential (whole-network) error-corrected PQ — the CVPR'16 algorithm.

The reference ships only the inference engine; its quantization ran
offline in MATLAB (SURVEY.md intro). The paper's actual scheme (§3 of
Quantized Convolutional Neural Networks for Mobile Devices) quantizes
LAYER BY LAYER against real activation statistics with error feedback:
layer i's calibration inputs are computed by running the calibration
batch through the ALREADY-QUANTIZED prefix, so each layer's codebooks
compensate the accumulated quantization error of everything before it.

This module owns that loop for the linear zoo specs:

  for each learnable layer i (in topology order):
      a_i   = forward(quantized_params, x_calib, upto=i)   # quantized prefix
      xcal  = sub-vector samples of a_i in the layer's weight data model
      q_i   = quantize_{fc,conv}_layer(..., xcal=xcal)     # error-corrected
      params[i] = q_i                                      # feeds layer i+1

xcal construction mirrors the weight sub-vector model (SURVEY.md §2a):
FC layers use the (NCHW-flattened at the first FC, CaffeEva.cc:184-204)
input rows directly; conv layers sample input-channel-group vectors over
batch x spatial positions (the same D-slices the kernel sub-vectors
contract against, one per kernel tap — spatially stationary, so position
samples are the right calibration distribution).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

from qcnn_tpu.core import ConvSpec, FCSpec, ModelSpec, is_pq
from qcnn_tpu.models import network
from qcnn_tpu.quantizer.pq import quantize_conv_layer, quantize_fc_layer


def _conv_xcal(a: np.ndarray, groups: int, max_samples: int,
               rng: np.random.Generator) -> np.ndarray:
    """(B, H, W, C) activation map -> (N, C/groups) channel-group vectors
    sampled over batch x space (x groups)."""
    b, h, w, c = a.shape
    cg = c // groups
    v = a.reshape(b * h * w, groups, cg)
    v = np.transpose(v, (1, 0, 2)).reshape(-1, cg)
    if v.shape[0] > max_samples:
        idx = rng.choice(v.shape[0], max_samples, replace=False)
        v = v[idx]
    return np.ascontiguousarray(v)


def _fc_xcal(a: np.ndarray, max_samples: int,
             rng: np.random.Generator) -> np.ndarray:
    """(..., Cin) activations -> (N, Cin) row samples."""
    v = a.reshape(-1, a.shape[-1])
    if v.shape[0] > max_samples:
        v = v[rng.choice(v.shape[0], max_samples, replace=False)]
    return np.ascontiguousarray(v)


def quantize_resnet_ec(
    key,
    spec,
    dense: dict,
    x_calib: np.ndarray,
    *,
    conv_subvec_len: int = 4,
    conv_codewords: int = 128,
    fc_subvec_len: int = 4,
    fc_codewords: int = 32,
    min_cin: int = 16,
    max_samples: int = 16384,
    seed: int = 0,
) -> dict:
    """Sequential error-corrected PQ for the ResNet family: single pass —
    each conv/fc quantizes against the activation entering it (already
    carrying the quantization error of everything upstream), then the
    quantized leaf produces the next activation. Mirrors
    resnet.quantize_params' geometry/min_cin policy and resnet.forward's
    exact walk (_run_stem/_run_block composition, which
    tests/test_model_families.py pins against forward)."""
    import jax.numpy as jnp

    from qcnn_tpu.models import resnet as R

    rng = np.random.default_rng(seed)
    keys = [key]

    def next_key():
        keys[0], sub = jax.random.split(keys[0])
        return sub

    out: dict = {}

    def quant_conv(p: dict, a: np.ndarray) -> dict:
        kh, kw, cin, cout = p["kernel"].shape
        if cin < min_cin:
            return dict(p)
        oihw = np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1))
        return quantize_conv_layer(
            next_key(), oihw, p["bias"],
            num_subspaces=-(-cin // conv_subvec_len),
            num_codewords=conv_codewords,
            xcal=_conv_xcal(a, 1, max_samples, rng),
        )

    a = jnp.asarray(x_calib, jnp.float32)
    cast = R._make_cast(None)
    out["stem"] = quant_conv(dense["stem"], np.asarray(a))
    a = R._run_stem(a, out, cast)
    for s, depth in enumerate(spec.stage_depths):
        for b in range(depth):
            stride = 2 if (s > 0 and b == 0) else 1
            blk_in = np.asarray(a)
            src = dense[f"s{s}b{b}"]
            qblk: dict = {}
            if "proj" in src:
                qblk["proj"] = quant_conv(src["proj"], blk_in)
            if spec.bottleneck:
                qblk["conv1"] = quant_conv(src["conv1"], blk_in)
                y = R.relu(R._apply_conv(a, qblk["conv1"]))
                qblk["conv2"] = quant_conv(src["conv2"], np.asarray(y))
                y = R.relu(R._apply_conv(y, qblk["conv2"], stride=stride,
                                         pad=1))
                qblk["conv3"] = quant_conv(src["conv3"], np.asarray(y))
            else:
                qblk["conv1"] = quant_conv(src["conv1"], blk_in)
                y = R.relu(R._apply_conv(a, qblk["conv1"], stride=stride,
                                         pad=1))
                qblk["conv2"] = quant_conv(src["conv2"], np.asarray(y))
            out[f"s{s}b{b}"] = qblk
            a = R._run_block(a, qblk, stride, spec.bottleneck, cast)
    pooled = np.asarray(jnp.mean(a.astype(jnp.float32), axis=(1, 2)))
    out["fc"] = quantize_fc_layer(
        next_key(), np.asarray(dense["fc"]["weight"]).T,
        dense["fc"]["bias"],
        num_subspaces=-(-dense["fc"]["weight"].shape[0] // fc_subvec_len),
        num_codewords=fc_codewords,
        xcal=_fc_xcal(pooled, max_samples, rng),
    )
    return out


def quantize_vit_ec(
    key,
    spec,
    dense: dict,
    x_calib: np.ndarray,
    *,
    subvec_len: int = 4,
    num_codewords: int = 32,
    max_samples: int = 16384,
    seed: int = 0,
) -> dict:
    """Sequential error-corrected PQ for the ViT family: every projection
    GEMM quantizes against its own input under the already-quantized
    prefix. Mirrors vit.quantize_params' policy and vit.forward's walk
    (_run_embed/_run_block/_run_head composition)."""
    import jax.numpy as jnp

    from qcnn_tpu.models import vit as V

    rng = np.random.default_rng(seed)
    keys = [key]

    def next_key():
        keys[0], sub = jax.random.split(keys[0])
        return sub

    def quant_gemm(p: dict, a) -> dict:
        return quantize_fc_layer(
            next_key(), np.asarray(p["weight"]).T, p["bias"],
            num_subspaces=-(-p["weight"].shape[0] // subvec_len),
            num_codewords=num_codewords,
            xcal=_fc_xcal(np.asarray(a, np.float32), max_samples, rng),
        )

    cast = V._make_cast(None)
    out: dict = {
        "cls_token": dense["cls_token"],
        "pos_embed": dense["pos_embed"],
        "ln_final": dense["ln_final"],
    }
    x = jnp.asarray(x_calib, jnp.float32)
    b, h, w, c = x.shape
    p_sz = spec.patch
    patches = x.reshape(b, h // p_sz, p_sz, w // p_sz, p_sz, c)
    patches = jnp.transpose(patches, (0, 1, 3, 2, 4, 5)).reshape(
        b, spec.num_patches, -1)
    out["patch_embed"] = quant_gemm(dense["patch_embed"], patches)
    a = V._run_embed(x, out, spec, cast)
    for i in range(spec.depth):
        src = dense[f"blk{i}"]
        qblk = {"ln1": src["ln1"], "ln2": src["ln2"]}
        nh, hd = spec.heads, spec.dim // spec.heads
        y = V._layernorm(a, qblk["ln1"])
        qblk["qkv"] = quant_gemm(src["qkv"], y)
        qkv = V._proj(y, qblk["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        o = V._masked_attention(
            q.reshape(b, -1, nh, hd), k.reshape(b, -1, nh, hd),
            v.reshape(b, -1, nh, hd), 0,
        ).reshape(b, -1, spec.dim)
        qblk["out"] = quant_gemm(src["out"], o)
        x2 = a + V._proj(o, qblk["out"])
        y2 = V._layernorm(x2, qblk["ln2"])
        qblk["mlp1"] = quant_gemm(src["mlp1"], y2)
        g = jax.nn.gelu(V._proj(y2, qblk["mlp1"]), approximate=False)
        qblk["mlp2"] = quant_gemm(src["mlp2"], g)
        out[f"blk{i}"] = qblk
        a = V._run_block(a, qblk, spec, cast, jnp.float32)
    head_in = V._layernorm(a, out["ln_final"])[:, 0]
    out["head"] = quant_gemm(dense["head"], head_in)
    return out


def quantize_network(
    key,
    spec: ModelSpec,
    params: Sequence[Optional[dict]],
    *,
    conv_subvec_len: int = 8,
    conv_codewords: int = 128,
    fc_subvec_len: int = 4,
    fc_codewords: int = 32,
    overrides: Optional[dict] = None,
    x_calib: Optional[np.ndarray] = None,
    max_conv_samples: int = 16384,
    seed: int = 0,
    opq: Optional[str] = None,
    log=lambda *_: None,
) -> list:
    """Quantize every dense layer of a linear-spec network.

    Without x_calib: plain per-layer k-means (weights only). With x_calib
    ((B, H, W, C) preprocessed inputs): sequential error-corrected PQ as
    described in the module docstring. opq="variance" adds the OPQ input
    permutation per layer (quantizer/opq.py). Already-PQ / parameter-free
    layers pass through.

    Calibration cost is O(L^2) forwards by design: layer i's inputs must
    come from the ALREADY-QUANTIZED prefix (the sequential-EC contract —
    CVPR'16 §"quantizing multiple layers"), and the prefix is re-run after
    each layer's params change. Offline tooling; run with --cpu (per-shape
    remote-TPU compiles dwarf the math)."""
    overrides = overrides or {}
    out = list(params)
    rng = np.random.default_rng(seed)
    for i, (layer, p) in enumerate(zip(spec.layers, out)):
        if p is None or is_pq(p):
            continue
        ov = overrides.get(i, {})
        key, sub = jax.random.split(key)
        xcal = None
        if x_calib is not None:
            a = np.asarray(
                network.forward(out, x_calib, spec=spec, upto=i,
                                with_softmax=False),
                np.float32,
            )
            if isinstance(layer, FCSpec):
                if a.ndim == 4:
                    # first FC: Caffe/torch NCHW flatten (network.py rule)
                    a = np.transpose(a, (0, 3, 1, 2)).reshape(a.shape[0], -1)
                else:
                    a = a.reshape(a.shape[0], -1)
                xcal = a
            else:
                xcal = _conv_xcal(a, layer.groups, max_conv_samples, rng)
        if isinstance(layer, ConvSpec) and "kernel" in p:
            kernel = np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1))
            cg = kernel.shape[1]
            d = ov.get("subvec_len", conv_subvec_len)
            out[i] = quantize_conv_layer(
                sub, kernel, p["bias"],
                num_subspaces=-(-cg // d),
                num_codewords=ov.get("codewords", conv_codewords),
                xcal=xcal, opq=opq,
            )
            log(f"layer {i} (ConvSpec): quantized"
                + (" [error-corrected]" if xcal is not None else ""))
        elif isinstance(layer, FCSpec) and "weight" in p:
            weight = np.asarray(p["weight"]).T  # (Cin, Cout) -> (Cout, Cin)
            d = ov.get("subvec_len", fc_subvec_len)
            out[i] = quantize_fc_layer(
                sub, weight, p["bias"],
                num_subspaces=-(-weight.shape[1] // d),
                num_codewords=ov.get("codewords", fc_codewords),
                xcal=xcal, opq=opq,
            )
            log(f"layer {i} (FCSpec): quantized"
                + (" [error-corrected]" if xcal is not None else ""))
    return out
