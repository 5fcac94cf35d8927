"""Lane padding (models/lanepad.py): exactness of the conv1->conv2 C=128
pad against the unpadded forward, incl. the LRN channel_map band and the
grouped-consumer layout (AlexNet conv2 groups=2, CaffePara.cc:29-36)."""

import jax.numpy as jnp
import numpy as np
import pytest

from qcnn_tpu.core import ConvSpec, LRNSpec
from qcnn_tpu.models import network, synth, zoo
from qcnn_tpu.models.lanepad import lane_pad
from qcnn_tpu.models.prepare import prepare_params
from qcnn_tpu.ops.misc import lrn


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_lrn_channel_map_matches_unpadded(rng):
    """LRN with a channel_map over the padded layout must reproduce the
    unpadded LRN on the real channels (incl. windows that cross the
    group-padding boundary) and emit zeros on padded channels."""
    c, pad_total = 96, 128
    x = rng.standard_normal((2, 5, 5, c)).astype(np.float32)
    # AlexNet layout: [48 real | 16 zero | 48 real | 16 zero]
    pos = np.arange(c)
    pos = (pos // 48) * 64 + (pos % 48)
    cmap = np.full(pad_total, -1, np.int64)
    cmap[pos] = np.arange(c)
    xp = np.zeros((2, 5, 5, pad_total), np.float32)
    xp[..., pos] = x

    kw = dict(size=5, alpha=1e-4, beta=0.75, k=1.0)
    want = np.asarray(lrn(jnp.asarray(x), **kw))
    got = np.asarray(
        lrn(jnp.asarray(xp), channel_map=tuple(int(v) for v in cmap), **kw)
    )
    np.testing.assert_allclose(got[..., pos], want, rtol=1e-5, atol=1e-6)
    padded_pos = np.where(cmap < 0)[0]
    assert np.all(got[..., padded_pos] == 0)


@pytest.mark.parametrize("model", ["alexnet", "caffenet", "vgg_cnn_s"])
def test_lane_pad_forward_parity(rng, model):
    """Padded forward == unpadded forward (decode-at-load path)."""
    spec = zoo.MODELS[model]()
    params = synth.random_pq_params(spec, seed=3)
    prepared, cis, fis = prepare_params(
        spec, params, batch_hint=2, dtype=jnp.float32
    )
    spec2, prepared2 = lane_pad(spec, prepared)
    assert spec2 is not spec, "expected a qualifying conv1 segment"
    conv1 = next(l for l in spec2.layers if isinstance(l, ConvSpec))
    assert conv1.out_channels == 128
    # every LRN between conv1 and conv2 carries the map
    first_conv = True
    for layer in spec2.layers:
        if isinstance(layer, ConvSpec):
            if not first_conv:
                break
            first_conv = False
        elif isinstance(layer, LRNSpec) and not first_conv:
            assert layer.channel_map is not None
            assert len(layer.channel_map) == 128

    x = rng.standard_normal(
        (2, spec.in_height, spec.in_width, spec.in_channels)
    ).astype(np.float32)
    want = np.asarray(
        network.forward(prepared, jnp.asarray(x), spec=spec,
                        conv_impls=cis, fc_impls=fis)
    )
    got = np.asarray(
        network.forward(prepared2, jnp.asarray(x), spec=spec2,
                        conv_impls=cis, fc_impls=fis)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_lane_pad_int8_forward_parity(rng):
    """int8 weights: the scatter covers kernel_q + per-channel scale."""
    spec = zoo.MODELS["alexnet"]()
    params = synth.random_pq_params(spec, seed=3)
    prepared, cis, fis = prepare_params(
        spec, params, batch_hint=2, dtype=jnp.int8
    )
    spec2, prepared2 = lane_pad(spec, prepared)
    assert spec2 is not spec
    x = rng.standard_normal(
        (2, spec.in_height, spec.in_width, spec.in_channels)
    ).astype(np.float32)
    want = np.asarray(
        network.forward(prepared, jnp.asarray(x), spec=spec,
                        conv_impls=cis, fc_impls=fis,
                        compute_dtype=jnp.bfloat16)
    )
    got = np.asarray(
        network.forward(prepared2, jnp.asarray(x), spec=spec2,
                        conv_impls=cis, fc_impls=fis,
                        compute_dtype=jnp.bfloat16)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_lane_pad_noop_when_memory_mode(rng):
    """PQ-kept layers (memory modes) must not be touched: the subspace
    structure of compressed params cannot absorb the pad."""
    spec = zoo.MODELS["alexnet"]()
    params = synth.random_pq_params(spec, seed=3)
    prepared, cis, fis = prepare_params(
        spec, params, batch_hint=2, conv_impl="indecode",
        fc_impl="indecode", dtype=jnp.bfloat16
    )
    spec2, prepared2 = lane_pad(spec, prepared)
    assert spec2 is spec


def test_lane_pad_noop_when_aligned():
    """A model whose convs are already 128-aligned is untouched."""
    spec = zoo.MODELS["vgg16"]()
    params = synth.random_pq_params(spec, seed=0)
    prepared, cis, fis = prepare_params(spec, params, batch_hint=1)
    spec2, _ = lane_pad(spec, prepared)
    assert spec2 is spec
