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


class TestInt8NativeDataflow:
    """Round-4 verdict item 2: keep activations int8 across monotone ops.

    Producers emit int8 codes in the consumer's calibrated scale
    (ops/fc.requantize_int8); relu/pool run in the quantized domain; the
    consumer's activation-quantize pass disappears.
    """

    def test_out_scale_plan_alexnet(self):
        """On AlexNet (conv1/conv2 feed LRN -> chain broken; conv3..fc7 feed
        only relu/pool/dropout -> chain holds; fc8 feeds softmax)."""
        from qcnn_tpu.models import zoo
        from qcnn_tpu.models.prepare import int8_out_scales

        spec = zoo.alexnet()
        params = synth.random_pq_params(spec, seed=0)
        ci, fi = network.resolve_strategy(spec, params, 8, "auto", "auto",
                                          dtype=jnp.bfloat16)
        conv_fc = [i for i, l in enumerate(spec.layers)
                   if isinstance(l, (ConvSpec, FCSpec))]
        scales = {i: 0.01 for i in conv_fc}
        plan = int8_out_scales(spec, params, ci, fi, scales)
        # conv3(8)->conv4(10), conv4->conv5(12), conv5->fc6(15; pool+flatten),
        # fc6->fc7(18; dropout), fc7->fc8(21); conv1/conv2 blocked by LRN,
        # fc8 blocked by softmax
        assert plan == {8: 0.01, 10: 0.01, 12: 0.01, 15: 0.01, 18: 0.01}
        # no static scales -> no plan
        assert int8_out_scales(spec, params, ci, fi, None) == {}

    def test_int8_native_matches_float_roundtrip(self, rng):
        """int8-native (requantize epilogue + int8 relu/pool) must agree
        with the float-round-trip int8 path: requantize folds the exact
        dequant+quant arithmetic, and relu/pool commute with the grid."""
        from qcnn_tpu.core import PoolSpec

        spec = ModelSpec(
            name="t8n", in_height=8, in_width=8, in_channels=4,
            layers=(
                ConvSpec(kernel=3, out_channels=16, pad=1),
                ReLUSpec(),
                PoolSpec(kernel=2, stride=2),
                ConvSpec(kernel=3, out_channels=16, pad=1),
                ReLUSpec(),
                FCSpec(32),
                ReLUSpec(),
                FCSpec(10),
                SoftmaxSpec(),
            ),
        )
        params = synth.random_pq_params(spec, seed=4)
        x = synth.random_input(spec, 8, seed=5)
        prep_bf, ci, fi = prepare_params(spec, params, dtype=jnp.bfloat16)
        scales = calibrate_act_scales(spec, prep_bf, x,
                                      conv_impls=ci, fc_impls=fi)
        prep8, ci8, fi8 = prepare_params(
            spec, params, dtype=jnp.int8, act_scales=scales)
        # the chain exists: every conv/fc except the last gets an out_scale
        assert [i for i, p in enumerate(prep8)
                if isinstance(p, dict) and "out_scale" in p] == [0, 3, 5]

        got = np.asarray(network.forward(
            prep8, jnp.asarray(x), spec=spec,
            conv_impls=ci8, fc_impls=fi8, compute_dtype=jnp.bfloat16))

        # reference: same int8 weights/scales but float round-trip between
        # layers (out_scale stripped)
        stripped = [
            ({k: v for k, v in p.items() if k != "out_scale"}
             if isinstance(p, dict) else p)
            for p in prep8
        ]
        want = np.asarray(network.forward(
            stripped, jnp.asarray(x), spec=spec,
            conv_impls=ci8, fc_impls=fi8, compute_dtype=jnp.bfloat16))
        assert got.shape == want.shape
        # same quantization grids; differences only from bf16 rounding of
        # the float path's intermediate dequantized activations
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)
        assert (np.argmax(got, 1) == np.argmax(want, 1)).mean() >= 0.9

    def test_relu_pool_int8_domain(self, rng):
        """relu/max-pool on int8 codes == quantize(relu/pool(dequant))."""
        from qcnn_tpu.ops import caffe_max_pool, relu

        q = rng.integers(-127, 128, size=(2, 6, 6, 8)).astype(np.int8)
        s = 0.037
        got_relu = np.asarray(relu(jnp.asarray(q)))
        assert got_relu.dtype == np.int8
        np.testing.assert_array_equal(
            got_relu.astype(np.float32) * s,
            np.maximum(q.astype(np.float32) * s, 0.0))
        got_pool = np.asarray(caffe_max_pool(
            jnp.asarray(q), kernel=2, stride=2))
        assert got_pool.dtype == np.int8
        want_pool = np.asarray(caffe_max_pool(
            jnp.asarray(q.astype(np.float32) * s), kernel=2, stride=2))
        np.testing.assert_allclose(
            got_pool.astype(np.float32) * s, want_pool, rtol=1e-6)

    def test_int8_input_requires_static_scale(self):
        from qcnn_tpu.ops.fc import quantize_activations_int8

        q = jnp.zeros((2, 4), jnp.int8)
        try:
            quantize_activations_int8(q, None)
            assert False, "expected ValueError"
        except ValueError:
            pass
        _, s = quantize_activations_int8(q, 0.02)
        assert float(s) == np.float32(0.02)
