"""Offline activation calibration for static-scale int8 execution.

Round-1 finding (docs/KERNEL_STUDIES.md §6): dynamic per-tensor activation
quantization re-reads every activation for its amax, regressing int8 below
bf16 at batch 256. The fix is a one-time calibration pass: run the bf16
forward once over a calibration batch, record amax(|input|) per conv/FC
layer (a single jitted program — network.forward(collect_act_amax=True)),
and bake ``act_scale = margin * amax / 127`` into the prepared params. At
serving time the amax reductions are gone; activations quantize with a
constant scale (values beyond the calibrated range clip, the standard
static-quantization tradeoff).

The reference has no analogue (its PQ quantization happened offline in
MATLAB, SURVEY.md intro); this is the TPU-native equivalent of a production
int8 calibrator.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from qcnn_tpu.core import ModelSpec
from qcnn_tpu.models import network


def calibrate_act_scales(
    spec: ModelSpec,
    params: Sequence[Optional[dict]],
    x_calib,
    *,
    conv_impls: Optional[tuple[str, ...]] = None,
    fc_impls: Optional[tuple[str, ...]] = None,
    margin: float = 1.0,
) -> dict[int, float]:
    """{layer_index: static activation scale} from one calibration batch.

    ``params`` must be runnable in float (bf16/f32 prepared or raw PQ) —
    calibrate BEFORE int8 preparation, then pass the result to
    prepare_params(act_scales=...).
    """

    def run(params, x):
        return network.forward(
            params, x, spec=spec,
            conv_impls=conv_impls, fc_impls=fc_impls,
            compute_dtype=jnp.bfloat16,
            with_softmax=False,
            collect_act_amax=True,
        )

    _, amax = jax.jit(run)(params, jnp.asarray(x_calib))
    # floor at the dynamic path's epsilon: a layer whose calibration input
    # is all zeros (ReLU-dead on the calib batch) must not get scale 0 —
    # x/0 at serving time would NaN the layer instead of quantizing
    return {
        i: max(float(np.asarray(v)), 1e-12) * margin / 127.0
        for i, v in amax.items()
    }
