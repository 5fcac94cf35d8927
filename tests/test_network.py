"""Network-level tests: shape inference for all six models, full AlexNet-PQ
forward with the shipped reference weights, strategy equivalence."""

import numpy as np
import pytest
import jax.numpy as jnp

from qcnn_tpu.models import (
    alexnet,
    caffenet,
    caffenet_fgb,
    caffenet_fgd,
    forward,
    get_model,
    load_alexnet_reference,
    make_forward_fn,
    top_k_labels,
    vgg16,
    vgg_cnn_s,
)
from qcnn_tpu.core import ConvSpec, FCSpec


# Expected per-layer feature map sizes printed by the reference engine
# (PrepFeatMap, CaffeEva.cc:328-410) for AlexNet @ 227x227.
ALEXNET_SHAPES_NHWC = [
    (227, 227, 3),
    (55, 55, 96),     # conv1
    (55, 55, 96),     # relu1
    (55, 55, 96),     # lrn1
    (27, 27, 96),     # pool1 (ceil)
    (27, 27, 256),    # conv2
    (27, 27, 256),
    (27, 27, 256),
    (13, 13, 256),    # pool2
    (13, 13, 384),    # conv3
    (13, 13, 384),
    (13, 13, 384),    # conv4
    (13, 13, 384),
    (13, 13, 256),    # conv5
    (13, 13, 256),
    (6, 6, 256),      # pool5
    (1, 1, 4096),     # fc6
    (1, 1, 4096),
    (1, 1, 4096),
    (1, 1, 4096),     # fc7
    (1, 1, 4096),
    (1, 1, 4096),
    (1, 1, 1000),     # fc8
    (1, 1, 1000),     # softmax
]


class TestShapes:
    def test_alexnet_feature_shapes(self):
        shapes = alexnet().feature_shapes(batch=2)
        assert len(shapes) == 24
        for got, want in zip(shapes, ALEXNET_SHAPES_NHWC):
            assert got[1:] == want

    @pytest.mark.parametrize(
        "factory,n_layers,classes",
        [
            (alexnet, 23, 1000),
            (caffenet, 23, 1000),
            (vgg_cnn_s, 22, 1000),
            (vgg16, 39, 1000),
            (caffenet_fgb, 23, 518),
            (caffenet_fgd, 23, 200),
        ],
    )
    def test_all_models_shape_inference(self, factory, n_layers, classes):
        spec = factory()
        assert len(spec.layers) == n_layers
        assert spec.num_classes == classes
        shapes = spec.feature_shapes(batch=1)
        assert shapes[-1] == (1, 1, 1, classes)
        # all spatial sizes must stay positive through the stack
        assert all(h > 0 and w > 0 for _, h, w, _ in shapes)

    def test_padded_ceil_pool_shape_matches_executed(self):
        """Round-5 review regression: feature_shapes used the raw ceil
        rule without Caffe's trailing-window clamp (pooling_layer.cpp,
        mirrored in ops/misc.caffe_max_pool), so predicted shapes
        diverged from executed ones for ceil pools with pad > 0 and the
        first-FC weight was sized against the wrong flatten width."""
        import jax.numpy as jnp

        from qcnn_tpu.core import ModelSpec, PoolSpec
        from qcnn_tpu.ops import caffe_max_pool

        spec = ModelSpec(
            name="padpool", in_height=5, in_width=5, in_channels=3,
            layers=(PoolSpec(kernel=2, stride=2, pad=1),),
        )
        predicted = spec.feature_shapes(batch=1)[-1]
        executed = caffe_max_pool(
            jnp.zeros((1, 5, 5, 3)), kernel=2, stride=2, pad=1
        ).shape
        assert predicted == executed

    def test_vgg16_known_shapes(self):
        shapes = vgg16().feature_shapes(batch=1)
        # after the five 2x2 pools: 224 -> 112 -> 56 -> 28 -> 14 -> 7
        assert shapes[5][1:3] == (112, 112)
        assert shapes[10][1:3] == (56, 56)
        assert shapes[31][1:3] == (7, 7)  # pool5 output feeding fc6

    def test_get_model_aliases(self):
        assert get_model("AlexNet").name == "AlexNet"
        assert get_model("vgg-cnn-s").name == "VggCnnS"
        with pytest.raises(KeyError):
            get_model("resnet9000")


@pytest.fixture(scope="module")
def alexnet_weights(alexnet_bin_dir):
    # depends on the conftest skip guard: on checkouts without the
    # reference tree these tests must SKIP, not error (round-5 review —
    # this was the one module that bypassed the portability contract)
    res = load_alexnet_reference(synthesize_missing=True)
    return res


class TestAlexNetReference:
    def test_loader_shapes(self, alexnet_weights):
        params = alexnet_weights.params
        spec = alexnet()
        assert len(params) == len(spec.layers)
        # fc6 (layer 15) assignments were synthesized (missing blob upstream)
        assert alexnet_weights.synthesized_layers == [15]
        for layer, p in zip(spec.layers, params):
            if isinstance(layer, ConvSpec):
                s, k, d = p["codebooks"].shape
                cout, kh, kw, s2 = p["assignments"].shape
                assert (cout, kh, kw, s2) == (
                    layer.out_channels, layer.kernel, layer.kernel, s
                )
            elif isinstance(layer, FCSpec):
                cout, s2 = p["assignments"].shape
                assert cout == layer.out_features
            else:
                assert p is None

    def test_forward_smoke_and_strategy_equivalence(self, alexnet_weights, rng):
        spec = alexnet()
        x = rng.standard_normal((2, 227, 227, 3), dtype=np.float32) * 50.0
        probs_decode = np.asarray(
            forward(alexnet_weights.params, jnp.asarray(x), spec=spec,
                    conv_impl="decode", fc_impl="decode")
        )
        probs_lut = np.asarray(
            forward(alexnet_weights.params, jnp.asarray(x), spec=spec,
                    conv_impl="lut", fc_impl="onehot")
        )
        assert probs_decode.shape == (2, 1000)
        np.testing.assert_allclose(probs_decode.sum(axis=1), 1.0, rtol=1e-4)
        assert (probs_decode >= 0).all()
        # decode vs LUT: same math, different float order → tight tolerance
        np.testing.assert_allclose(probs_decode, probs_lut, rtol=1e-3, atol=1e-5)
        # top-5 must agree exactly
        top_decode = np.asarray(top_k_labels(jnp.asarray(probs_decode), 5))
        top_lut = np.asarray(top_k_labels(jnp.asarray(probs_lut), 5))
        np.testing.assert_array_equal(top_decode, top_lut)

    def test_jit_forward(self, alexnet_weights, rng):
        spec = alexnet()
        fn = make_forward_fn(spec)
        x = jnp.asarray(rng.standard_normal((1, 227, 227, 3), dtype=np.float32))
        probs = np.asarray(fn(alexnet_weights.params, x))
        assert probs.shape == (1, 1000)
        assert np.isfinite(probs).all()
