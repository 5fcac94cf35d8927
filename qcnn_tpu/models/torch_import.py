"""torch-ecosystem checkpoint ingestion (model families + linear zoo).

The reference lineage's real-world weight format is Caffe protobuf
(formats/caffe_pb.py covers the linear zoo models); the ecosystem
standards are the torchvision ResNet state_dict (`resnet18`/`resnet50`
naming: conv1/bn1, layer{1..4}.{b}.conv{i}/bn{i}/downsample, fc), the
timm ViT state_dict (patch_embed.proj, blocks.{i}.attn.qkv, ...), and
the torchvision sequential-CNN state_dict (features./classifier. naming
— vgg16 matches the zoo's linear VGG-16 spec). This module maps each
onto the corresponding dense parameter form. For ResNet:

- conv weights transpose OIHW -> HWIO;
- every BatchNorm folds into its preceding conv (fold_batchnorm — valid at
  inference, which is this framework's scope, matching the reference's
  test-phase-only design, README.md:38-43);
- fc weight transposes (out, in) -> (in, out).

Verified against a torch-computed oracle forward on identical weights
(tests/test_torch_import.py). No torchvision dependency — only torch
tensors' buffer protocol is touched, and plain numpy arrays work too.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from qcnn_tpu.models.resnet import ResNetSpec, fold_batchnorm


def _np(t) -> np.ndarray:
    """torch.Tensor (cpu) or array-like -> float32 numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def resnet_from_torch_state_dict(
    spec: ResNetSpec, state_dict: Mapping[str, "np.ndarray"]
) -> dict:
    """Map a torchvision-naming ResNet state_dict to a dense params pytree
    accepted by resnet.forward / resnet.quantize_params."""
    sd = state_dict

    def conv_bn(conv_key: str, bn_key: str) -> dict:
        w = _np(sd[f"{conv_key}.weight"])  # (Cout, Cin, kh, kw)
        conv = {
            "kernel": np.transpose(w, (2, 3, 1, 0)).copy(),  # HWIO
            "bias": _np(sd.get(f"{conv_key}.bias",
                               np.zeros(w.shape[0], np.float32))),
        }
        return fold_batchnorm(
            conv,
            _np(sd[f"{bn_key}.weight"]),
            _np(sd[f"{bn_key}.bias"]),
            _np(sd[f"{bn_key}.running_mean"]),
            _np(sd[f"{bn_key}.running_var"]),
        )

    params: dict = {"stem": conv_bn("conv1", "bn1")}
    n_convs = 3 if spec.bottleneck else 2
    for s, depth in enumerate(spec.stage_depths):
        for b in range(depth):
            prefix = f"layer{s + 1}.{b}"
            block = {
                f"conv{i}": conv_bn(f"{prefix}.conv{i}", f"{prefix}.bn{i}")
                for i in range(1, n_convs + 1)
            }
            if f"{prefix}.downsample.0.weight" in sd:
                block["proj"] = conv_bn(
                    f"{prefix}.downsample.0", f"{prefix}.downsample.1"
                )
            params[f"s{s}b{b}"] = block
    params["fc"] = {
        "weight": _np(sd["fc.weight"]).T.copy(),  # (in, out)
        "bias": _np(sd["fc.bias"]),
    }
    return params


def vit_from_torch_state_dict(spec, state_dict: Mapping) -> dict:
    """Map a timm-naming ViT state_dict (vit_base_patch16_224 family:
    patch_embed.proj, cls_token, pos_embed, blocks.{i}.norm1/attn.qkv/
    attn.proj/norm2/mlp.fc1/mlp.fc2, norm, head) onto models/vit.py's
    dense pytree.

    The patch-embedding conv (D, 3, p, p) becomes a GEMM over our
    (row, col, channel)-flattened patch vectors: permute to (p, p, 3, D)
    then reshape — the same (i, j, ch) order forward() produces.
    """
    sd = state_dict
    p = spec.patch

    def gemm(prefix: str, transpose: bool = True) -> dict:
        w = _np(sd[f"{prefix}.weight"])
        return {
            "weight": (w.T if transpose else w).copy(),
            "bias": _np(sd[f"{prefix}.bias"]),
        }

    def ln(prefix: str) -> dict:
        return {
            "scale": _np(sd[f"{prefix}.weight"]),
            "shift": _np(sd[f"{prefix}.bias"]),
        }

    w_patch = _np(sd["patch_embed.proj.weight"])  # (D, 3, p, p)
    params: dict = {
        "patch_embed": {
            "weight": np.transpose(w_patch, (2, 3, 1, 0))
            .reshape(p * p * 3, spec.dim).copy(),
            "bias": _np(sd["patch_embed.proj.bias"]),
        },
        "cls_token": _np(sd["cls_token"]).reshape(1, 1, spec.dim),
        "pos_embed": _np(sd["pos_embed"]).reshape(1, spec.seq_len, spec.dim),
        "ln_final": ln("norm"),
        "head": gemm("head"),
    }
    for i in range(spec.depth):
        b = f"blocks.{i}"
        params[f"blk{i}"] = {
            "ln1": ln(f"{b}.norm1"),
            "qkv": gemm(f"{b}.attn.qkv"),
            "out": gemm(f"{b}.attn.proj"),
            "ln2": ln(f"{b}.norm2"),
            "mlp1": gemm(f"{b}.mlp.fc1"),
            "mlp2": gemm(f"{b}.mlp.fc2"),
        }
    return params


def linear_from_torch_state_dict(spec, state_dict: Mapping) -> list:
    """Map a torchvision-style sequential CNN state_dict (conv stack under
    `features.N`, FC head under `classifier.N` — the vgg11..19 naming) onto
    a linear zoo ModelSpec, returning the spec-aligned dense params list
    the quantizer consumes (formats/caffe_pb.py:244 conventions).

    torchvision vgg16 is architecture-identical to the zoo's vgg16
    (zoo.py:125, transcribing CaffePara.cc); torch's NCHW first-FC flatten
    matches the Caffe flatten semantics our network implements
    (CaffeEva.cc:184-204), so classifier.0 maps with a plain transpose.
    Mapping is by learnable-layer order, so any sequential features/
    classifier model whose topology matches the spec imports too."""
    from qcnn_tpu.core import (
        ConvSpec, FCSpec, dense_conv_params, dense_fc_params,
    )

    def indexed(prefix: str) -> list:
        idxs = sorted({
            int(k.split(".")[1]) for k in state_dict
            if k.startswith(prefix + ".") and k.endswith(".weight")
        })
        return [(f"{prefix}.{i}.weight", f"{prefix}.{i}.bias")
                for i in idxs]

    pairs = indexed("features") + indexed("classifier")
    spec_learnable = [
        (i, l) for i, l in enumerate(spec.layers)
        if isinstance(l, (ConvSpec, FCSpec))
    ]
    if len(pairs) != len(spec_learnable):
        raise ValueError(
            f"{len(pairs)} learnable torch layers vs "
            f"{len(spec_learnable)} in spec {spec.name}"
        )
    params: list = [None] * len(spec.layers)
    for (idx, lspec), (wk, bk) in zip(spec_learnable, pairs):
        w = _np(state_dict[wk])
        bias = (_np(state_dict[bk]) if bk in state_dict
                else np.zeros(w.shape[0], np.float32))
        if isinstance(lspec, ConvSpec):
            if w.ndim != 4 or w.shape[0] != lspec.out_channels \
                    or w.shape[2] != lspec.kernel:
                raise ValueError(
                    f"{wk}: blob {w.shape} does not match spec "
                    f"(out={lspec.out_channels}, k={lspec.kernel})"
                )
            params[idx] = dense_conv_params(
                np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))), bias
            )
        else:
            if w.shape[0] != lspec.out_features:
                raise ValueError(
                    f"{wk}: FC blob {w.shape} does not match "
                    f"out_features={lspec.out_features}"
                )
            params[idx] = dense_fc_params(np.ascontiguousarray(w.T), bias)
    return params


def _load_state_dict(path: str):
    """Load a .pt/.pth file: a bare state_dict, or a dict carrying one
    under 'state_dict'/'model'."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and not any(
        k.endswith(".weight") for k in obj
    ):
        for key in ("state_dict", "model"):
            if key in obj:
                obj = obj[key]
                break
    return obj


def load_torch_resnet(spec: ResNetSpec, path: str) -> dict:
    return resnet_from_torch_state_dict(spec, _load_state_dict(path))


def load_torch_vit(spec, path: str) -> dict:
    return vit_from_torch_state_dict(spec, _load_state_dict(path))


def load_torch_linear(spec, path: str) -> list:
    return linear_from_torch_state_dict(spec, _load_state_dict(path))
