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
    log=lambda *_: None,
) -> list:
    """Quantize every dense layer of a linear-spec network.

    Without x_calib: plain per-layer k-means (weights only). With x_calib
    ((B, H, W, C) preprocessed inputs): sequential error-corrected PQ as
    described in the module docstring. Already-PQ / parameter-free layers
    pass through."""
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
                xcal=xcal,
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
                xcal=xcal,
            )
            log(f"layer {i} (FCSpec): quantized"
                + (" [error-corrected]" if xcal is not None else ""))
    return out
