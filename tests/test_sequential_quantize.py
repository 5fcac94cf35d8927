"""Sequential error-corrected network quantization
(quantizer/sequential.py): the CVPR'16 layer-by-layer scheme with
quantized-prefix calibration activations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcnn_tpu.core import (
    ConvSpec, FCSpec, ModelSpec, PoolSpec, ReLUSpec, SoftmaxSpec,
    dense_conv_params, dense_fc_params, is_pq,
)
from qcnn_tpu.models import network
from qcnn_tpu.quantizer.sequential import quantize_network


@pytest.fixture(scope="module")
def setup():
    spec = ModelSpec(
        name="seq-test", in_height=12, in_width=12, in_channels=8,
        layers=(
            ConvSpec(kernel=3, out_channels=16, pad=1),
            ReLUSpec(),
            PoolSpec(kernel=2, stride=2),
            FCSpec(48),
            ReLUSpec(),
            FCSpec(10),
            SoftmaxSpec(),
        ),
    )
    rng = np.random.default_rng(0)
    params = [
        dense_conv_params(
            rng.standard_normal((3, 3, 8, 16)).astype(np.float32) / 8,
            rng.standard_normal(16).astype(np.float32) * 0.05,
        ),
        None, None,
        dense_fc_params(
            rng.standard_normal((6 * 6 * 16, 48)).astype(np.float32) / 24,
            rng.standard_normal(48).astype(np.float32) * 0.05,
        ),
        None,
        dense_fc_params(
            rng.standard_normal((48, 10)).astype(np.float32) / 7,
            rng.standard_normal(10).astype(np.float32) * 0.05,
        ),
        None,
    ]
    x = rng.standard_normal((16, 12, 12, 8)).astype(np.float32)
    return spec, params, x


GEOM = dict(conv_subvec_len=4, conv_codewords=8,
            fc_subvec_len=4, fc_codewords=8)


def test_plain_quantizes_all_layers(setup):
    spec, params, _ = setup
    out = quantize_network(jax.random.key(0), spec, params, **GEOM)
    learnable = [p for p in out if p is not None]
    assert len(learnable) == 3 and all(is_pq(p) for p in learnable)
    probs = np.asarray(network.forward(
        out, jnp.zeros((2, 12, 12, 8)), spec=spec))
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)


def test_error_corrected_beats_plain_on_calib(setup):
    """At aggressive compression, sequential EC must approximate the dense
    logits better than weight-only k-means (the paper's core claim)."""
    spec, params, x = setup
    want = np.asarray(network.forward(params, x, spec=spec,
                                      with_softmax=False))
    plain = quantize_network(jax.random.key(0), spec, params, **GEOM)
    ec = quantize_network(jax.random.key(0), spec, params, x_calib=x,
                          **GEOM)
    got_p = np.asarray(network.forward(plain, x, spec=spec,
                                       with_softmax=False))
    got_e = np.asarray(network.forward(ec, x, spec=spec,
                                       with_softmax=False))
    err_p = float(np.linalg.norm(got_p - want))
    err_e = float(np.linalg.norm(got_e - want))
    assert err_e < err_p, (err_e, err_p)


def test_prefix_forward_upto(setup):
    """forward(upto=i) returns the activation entering layer i."""
    spec, params, x = setup
    a3 = np.asarray(network.forward(params, x, spec=spec, upto=3))
    assert a3.shape == (16, 6, 6, 16)  # post conv/relu/pool, pre-flatten
    a0 = np.asarray(network.forward(params, x, spec=spec, upto=0))
    np.testing.assert_array_equal(a0, x)


def test_quantize_cli_calib_random(tmp_path, monkeypatch):
    from qcnn_tpu.cli import main
    from qcnn_tpu.formats.checkpoint import (
        load_checkpoint, save_checkpoint,
    )
    from qcnn_tpu.models import zoo

    spec = ModelSpec(
        name="seq-cli", in_height=8, in_width=8, in_channels=4,
        layers=(FCSpec(16), ReLUSpec(), FCSpec(5), SoftmaxSpec()),
    )
    monkeypatch.setitem(zoo.MODELS, "seqcli", lambda: spec)
    rng = np.random.default_rng(3)
    params = [
        dense_fc_params(
            rng.standard_normal((8 * 8 * 4, 16)).astype(np.float32) / 16,
            np.zeros(16, np.float32),
        ),
        None,
        dense_fc_params(
            rng.standard_normal((16, 5)).astype(np.float32) / 4,
            np.zeros(5, np.float32),
        ),
        None,
    ]
    src = str(tmp_path / "dense")
    save_checkpoint(src, spec, params)
    out = str(tmp_path / "pq")
    assert main([
        "quantize", src, out, "--cpu", "--calib-random", "8",
        "--fc-subvec-len", "4", "--fc-codewords", "8",
    ]) == 0
    spec2, qparams = load_checkpoint(out)
    assert all(is_pq(p) for p in qparams if p is not None)
