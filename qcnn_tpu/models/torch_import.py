"""torchvision-format ResNet checkpoint ingestion.

The reference lineage's real-world weight format is Caffe protobuf
(formats/caffe_pb.py covers the linear zoo models); for the ResNet family
the ecosystem's standard is the torchvision state_dict (`resnet18`/
`resnet50` naming: conv1/bn1, layer{1..4}.{b}.conv{i}/bn{i}/downsample,
fc). This module maps such a state_dict onto models/resnet.py's dense
parameter pytree:

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


def load_torch_resnet(spec: ResNetSpec, path: str) -> dict:
    """Load a .pt/.pth file (a state_dict, or a dict carrying one under
    'state_dict'/'model') and map it onto the dense params pytree."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and not any(
        k.endswith(".weight") for k in obj
    ):
        for key in ("state_dict", "model"):
            if key in obj:
                obj = obj[key]
                break
    return resnet_from_torch_state_dict(spec, obj)
