"""Static int8 activation calibration (round-1 verdict item 7).

Dynamic per-tensor amax quantization re-reads every activation; the static
path bakes calibrated scales into prepared params and must (a) match the
dynamic path numerically on in-range data, (b) round-trip through the
checkpoint sidecar + CLI, (c) flow through Classifier.from_checkpoint.
"""

import json
import os

import jax.numpy as jnp
import numpy as np

from qcnn_tpu.core import ConvSpec, FCSpec, ModelSpec, ReLUSpec, SoftmaxSpec
from qcnn_tpu.models import network, synth
from qcnn_tpu.models.calibrate import calibrate_act_scales
from qcnn_tpu.models.prepare import prepare_params


def _tiny_spec():
    return ModelSpec(
        name="t8", in_height=8, in_width=8, in_channels=4,
        layers=(
            ConvSpec(kernel=3, out_channels=16, pad=1),
            ReLUSpec(),
            FCSpec(32),
            ReLUSpec(),
            FCSpec(10),
            SoftmaxSpec(),
        ),
    )


def test_static_matches_dynamic_int8(rng):
    spec = _tiny_spec()
    params = synth.random_pq_params(spec, seed=2)
    x = synth.random_input(spec, 8, seed=3)

    prep_bf, ci, fi = prepare_params(spec, params, dtype=jnp.bfloat16)
    scales = calibrate_act_scales(
        spec, prep_bf, x, conv_impls=ci, fc_impls=fi
    )
    assert set(scales) == {0, 2, 4}
    assert all(v > 0 for v in scales.values())

    prep_dyn, ci8, fi8 = prepare_params(spec, params, dtype=jnp.int8)
    prep_st, _, _ = prepare_params(
        spec, params, dtype=jnp.int8, act_scales=scales
    )
    assert "act_scale" in prep_st[0] and "act_scale" not in prep_dyn[0]
    want = np.asarray(network.forward(
        prep_dyn, jnp.asarray(x), spec=spec,
        conv_impls=ci8, fc_impls=fi8, compute_dtype=jnp.bfloat16,
    ))
    got = np.asarray(network.forward(
        prep_st, jnp.asarray(x), spec=spec,
        conv_impls=ci8, fc_impls=fi8, compute_dtype=jnp.bfloat16,
    ))
    # same calibration batch -> same amax -> near-identical quantization
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_calibrate_cli_and_checkpoint_roundtrip(tmp_path, rng):
    from qcnn_tpu.cli import main
    from qcnn_tpu.formats.checkpoint import (
        load_act_scales, save_checkpoint,
    )

    spec = _tiny_spec()
    params = synth.random_pq_params(spec, seed=2)
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, spec, params)
    assert load_act_scales(ckpt) is None

    rc = main(["calibrate", ckpt, "--batch", "4"])
    assert rc == 0
    scales = load_act_scales(ckpt)
    assert scales is not None and set(scales) == {0, 2, 4}
    with open(os.path.join(ckpt, "act_scales.json")) as f:
        raw = json.load(f)
    assert all(isinstance(v, float) for v in raw.values())

    # Classifier.from_checkpoint picks the sidecar up for int8
    from qcnn_tpu.formats.checkpoint import save_preprocessor
    from qcnn_tpu.preproc.pipeline import MeanType, Preprocessor, ReszType

    pre = Preprocessor(
        full_h=8, full_w=8, crop_h=8, crop_w=8,
        resz_type=ReszType.STRICT, mean_type=MeanType.CROP,
        mean_image=np.zeros((8, 8, 3), np.float32),
    )
    save_preprocessor(ckpt, pre)
    from qcnn_tpu.eval.harness import Classifier

    clf = Classifier.from_checkpoint(ckpt, compute_dtype=jnp.int8)
    assert any(
        isinstance(p, dict) and "act_scale" in p for p in clf.params
    )
