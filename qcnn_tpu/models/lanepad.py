"""Lane-pad conv channel blocks to the TPU's 128-lane vreg width.

AlexNet-family block 1 runs at C=96: every elementwise/LRN/pool op between
conv1 and conv2 wastes 25% of each vector register, and the round-2 profile
put the batch-256 step's binding cost exactly there (KERNEL_STUDIES §4 —
perfect-fusion floor ~2.5 ms vs 5.33 measured). This pass pads conv1's
output channels to 128 with zero filters and consumes the padding in conv2,
so the whole block runs at full lane utilization. The transform is exact:

- zero filters produce zero activations; ReLU/pool/dropout are channelwise
  and map zero to zero;
- LRN windows span the ORIGINAL channel adjacency via the band matrix
  (LRNSpec.channel_map -> ops.misc.lrn): real channels see exactly their
  original windows (padded entries contribute x^2 = 0 is not even needed —
  the band excludes them), padded channels output x * scale = 0;
- conv2 contracts the padded channels against zero kernel columns.

The padding layout respects the CONSUMER's group structure: conv2 with
groups=2 reads channels [0:48 | 48:96] as two groups, so the padded layout
is [48 real | 16 zero | 48 real | 16 zero] and conv2's kernel zero-pads its
per-group input axis 48 -> 64. (The reference hardwires these group splits,
CaffePara.cc:20-52; grouped dispatch at CaffeEva.cc:795.)

Applied AFTER prepare_params (models/prepare.py), on decode-at-load dense
layers only — memory-mode PQ layers keep compressed params whose subspace
structure the pad would break.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from qcnn_tpu.core import (
    ConvSpec,
    DropoutSpec,
    LRNSpec,
    ModelSpec,
    PoolSpec,
    ReLUSpec,
)
from qcnn_tpu.ops.pallas._common import ceil_to as _ceil_to

_LANES = 128
_PASSTHROUGH = (ReLUSpec, LRNSpec, PoolSpec, DropoutSpec)


def _is_dense_conv(p: Optional[dict]) -> bool:
    return p is not None and ("kernel" in p or "kernel_q" in p)


def _scatter_out(arr: np.ndarray, pos: np.ndarray, total: int,
                 fill=0) -> np.ndarray:
    """Scatter the last axis of `arr` to `pos` within a `total`-wide axis."""
    out = np.full(arr.shape[:-1] + (total,), fill, dtype=arr.dtype)
    out[..., pos] = arr
    return out


def lane_pad(
    spec: ModelSpec,
    params: Sequence[Optional[dict]],
) -> tuple[ModelSpec, list]:
    """Pad misaligned conv->conv channel blocks to 128 lanes (exact).

    Returns (new_spec, new_params); both unchanged (same objects) when no
    segment qualifies. A segment qualifies when: a dense-prepared conv with
    out_channels % 128 != 0 is followed (through ReLU/LRN/pool/dropout
    only) by another dense-prepared conv whose group count divides the
    padded width evenly.
    """
    layers = list(spec.layers)
    new_params = list(params)
    changed = False

    for a, layer_a in enumerate(layers):
        if not isinstance(layer_a, ConvSpec):
            continue
        cout = layer_a.out_channels
        if cout % _LANES == 0 or not _is_dense_conv(new_params[a]):
            continue
        # walk to the consumer conv
        b = None
        for j in range(a + 1, len(layers)):
            if isinstance(layers[j], ConvSpec):
                b = j
                break
            if not isinstance(layers[j], _PASSTHROUGH):
                break
        if b is None or not _is_dense_conv(new_params[b]):
            continue
        gb = layers[b].groups
        if cout % gb:
            continue
        total = _ceil_to(cout, _LANES)
        if total % gb:
            continue
        # the pad adds (total/cout - 1) extra MACs to both convs; only the
        # near-aligned case (e.g. 96 -> 128, +33%) wins back more in lane
        # utilization than it spends (VGG16's 64 -> 128 would double them)
        if total > cout * 3 // 2:
            continue
        cig, cig_pad = cout // gb, total // gb

        # channel ch -> padded position (per consumer group, tail padding)
        pos = np.arange(cout)
        pos = (pos // cig) * cig_pad + (pos % cig)
        channel_map = np.full(total, -1, np.int64)
        channel_map[pos] = np.arange(cout)

        # producer: scatter filters (and bias / int8 scale) to positions
        pa = dict(new_params[a])
        if "kernel" in pa:
            pa["kernel"] = _scatter_out(np.asarray(pa["kernel"]), pos, total)
        else:
            pa["kernel_q"] = _scatter_out(
                np.asarray(pa["kernel_q"]), pos, total)
            # padded channels: scale 1.0 (they only ever multiply zeros)
            pa["scale"] = _scatter_out(
                np.asarray(pa["scale"]), pos, total, fill=1.0)
        pa["bias"] = _scatter_out(np.asarray(pa["bias"]), pos, total)
        new_params[a] = pa
        layers[a] = dataclasses.replace(layer_a, out_channels=total)

        # consumer: zero-pad the per-group input axis (tail padding means
        # the real channels keep their in-group positions)
        pb = dict(new_params[b])
        key = "kernel" if "kernel" in pb else "kernel_q"
        kb = np.asarray(pb[key])  # HWIO, I = cig
        assert kb.shape[2] == cig, (kb.shape, cig)
        pb[key] = np.pad(
            kb, ((0, 0), (0, 0), (0, cig_pad - cig), (0, 0)))
        new_params[b] = pb

        # LRNs inside the segment follow the original adjacency
        for j in range(a + 1, b):
            if isinstance(layers[j], LRNSpec):
                layers[j] = dataclasses.replace(
                    layers[j], channel_map=tuple(int(v) for v in channel_map)
                )
        changed = True

    if not changed:
        return spec, list(params)
    return dataclasses.replace(spec, layers=tuple(layers)), new_params
