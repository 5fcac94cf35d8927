"""Prepared-execution parity: decode-at-load + bf16 compute vs f32 PQ path."""

import jax.numpy as jnp
import numpy as np

from qcnn_tpu.models import network, synth, zoo
from qcnn_tpu.models.prepare import prepare_params


def _tiny():
    from qcnn_tpu.core import (
        ConvSpec, FCSpec, LRNSpec, ModelSpec, PoolSpec, ReLUSpec, SoftmaxSpec,
    )

    return ModelSpec(
        name="tiny", in_height=15, in_width=15, in_channels=8,
        layers=(
            ConvSpec(kernel=3, out_channels=32, pad=1, groups=2, stride=2),
            ReLUSpec(),
            LRNSpec(5, 1e-4, 0.75, 1.0),
            PoolSpec(kernel=3, stride=2),
            FCSpec(64),
            ReLUSpec(),
            FCSpec(16),
            SoftmaxSpec(),
        ),
    )


def test_prepare_decode_f32_is_exact():
    spec = _tiny()
    params = synth.random_pq_params(spec, seed=3)
    x = synth.random_input(spec, batch=4, seed=4)
    ref = np.asarray(network.forward(params, x, spec=spec, fc_impl="gather"))
    prepared, conv_impls, fc_impls = prepare_params(
        spec, params, conv_impl="decode", fc_impl="decode", dtype=jnp.float32
    )
    got = np.asarray(
        network.forward(
            prepared, x, spec=spec, conv_impls=conv_impls, fc_impls=fc_impls
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_prepare_bf16_top1_agreement():
    spec = _tiny()
    params = synth.random_pq_params(spec, seed=5)
    x = synth.random_input(spec, batch=16, seed=6)
    ref = np.asarray(network.forward(params, x, spec=spec))
    prepared, conv_impls, fc_impls = prepare_params(
        spec, params, dtype=jnp.bfloat16
    )
    got = np.asarray(
        network.forward(
            prepared, x, spec=spec, conv_impls=conv_impls,
            fc_impls=fc_impls, compute_dtype=jnp.bfloat16,
        )
    )
    assert got.dtype == np.float32  # softmax upcasts
    # bf16 compute: probabilities close, argmax agrees
    np.testing.assert_allclose(got, ref, atol=0.05)
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))


def test_prepare_alexnet_shapes():
    spec = zoo.alexnet()
    params = synth.random_pq_params(spec, seed=7)
    prepared, conv_impls, fc_impls = prepare_params(spec, params)
    # all conv+fc resolve to dense after decode-at-load
    assert all(c in ("-", "dense") for c in conv_impls)
    for layer, p, fi in zip(spec.layers, prepared, fc_impls):
        if p is None:
            continue
        if "kernel" in p:
            assert p["kernel"].dtype == jnp.bfloat16
        if "weight" in p:
            assert p["weight"].dtype == jnp.bfloat16


def test_prepare_indecode_matches_decode_and_keeps_pq_resident():
    """'indecode' memory mode: compressed params stay resident (PQ dicts
    survive prepare), the in-step decode is numerically identical to
    decode-at-load in f32."""
    spec = _tiny()
    params = synth.random_pq_params(spec, seed=3)
    x = synth.random_input(spec, batch=4, seed=4)
    ref = np.asarray(
        network.forward(
            params, x, spec=spec, conv_impl="decode", fc_impl="decode"
        )
    )
    prepared, conv_impls, fc_impls = prepare_params(
        spec, params, conv_impl="indecode", fc_impl="indecode",
        dtype=jnp.float32,
    )
    # compressed representation survives preparation
    assert any(c == "indecode" for c in conv_impls)
    assert any(f == "indecode" for f in fc_impls)
    for p, c, f in zip(prepared, conv_impls, fc_impls):
        if "indecode" in (c, f):
            assert "codebooks" in p and "assignments" in p
            assert "kernel" not in p and "weight" not in p
    got = np.asarray(
        network.forward(
            prepared, x, spec=spec, conv_impls=conv_impls, fc_impls=fc_impls
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    # 'memory' conv strategy resolves to the OHWI in-step decode (§9e)
    ci, _ = network.resolve_strategy(spec, params, 4, "memory", "memory")
    assert "indecode_ohwi" in ci


def test_prepare_int8_top1_agreement():
    spec = _tiny()
    params = synth.random_pq_params(spec, seed=5)
    x = synth.random_input(spec, batch=16, seed=6)
    ref = np.asarray(network.forward(params, x, spec=spec))
    prepared, conv_impls, fc_impls = prepare_params(
        spec, params, dtype=jnp.int8
    )
    assert any(
        p is not None and "kernel_q" in p for p in prepared
    )
    got = np.asarray(
        network.forward(
            prepared, x, spec=spec, conv_impls=conv_impls,
            fc_impls=fc_impls, compute_dtype=jnp.float32,
        )
    )
    # int8 execution of PQ-decoded weights: probabilities close, argmax equal
    np.testing.assert_allclose(got, ref, atol=0.08)
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))
