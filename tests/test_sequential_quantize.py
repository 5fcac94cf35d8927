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


def test_resnet_ec_beats_plain():
    from qcnn_tpu.models import resnet
    from qcnn_tpu.quantizer.sequential import quantize_resnet_ec

    spec = resnet.ResNetSpec("tiny", (1, 1), (16, 32), num_classes=7,
                             in_size=32, bottleneck=False)
    dense = resnet.init_dense_params(spec, seed=1)
    x = np.random.default_rng(2).standard_normal(
        (8, 32, 32, 3)).astype(np.float32)
    want = np.asarray(resnet.forward(dense, x, spec=spec))

    geom = dict(conv_subvec_len=4, conv_codewords=8,
                fc_subvec_len=4, fc_codewords=8)
    plain = resnet.quantize_params(spec, dense, **geom)
    ec = quantize_resnet_ec(jax.random.key(0), spec, dense, x, **geom)

    # same leaves quantized (policy parity incl. the min_cin stem rule)
    def pq_paths(t, prefix=""):
        return sorted(
            prefix + k for k, v in t.items()
            if isinstance(v, dict) and "codebooks" in v
        ) + sorted(
            p for k, v in t.items() if isinstance(v, dict)
            and "codebooks" not in v and "kernel" not in v
            and "weight" not in v
            for p in pq_paths(v, prefix + k + ".")
        )
    assert pq_paths(ec) == pq_paths(plain)

    got_p = np.asarray(resnet.forward(plain, x, spec=spec))
    got_e = np.asarray(resnet.forward(ec, x, spec=spec))
    err_p = float(np.linalg.norm(got_p - want))
    err_e = float(np.linalg.norm(got_e - want))
    assert err_e < err_p, (err_e, err_p)


def test_vit_ec_beats_plain():
    from qcnn_tpu.models import vit
    from qcnn_tpu.quantizer.sequential import quantize_vit_ec

    spec = vit.vit_tiny_test()
    dense = vit.init_dense_params(spec, seed=3)
    x = np.random.default_rng(4).standard_normal(
        (8, spec.image_size, spec.image_size, 3)).astype(np.float32)
    want = np.asarray(vit.forward(dense, x, spec=spec))

    plain = vit.quantize_params(spec, dense, subvec_len=4, num_codewords=8)
    ec = quantize_vit_ec(jax.random.key(0), spec, dense, x,
                         subvec_len=4, num_codewords=8)
    assert set(ec) == set(plain)

    got_p = np.asarray(vit.forward(plain, x, spec=spec))
    got_e = np.asarray(vit.forward(ec, x, spec=spec))
    err_p = float(np.linalg.norm(got_p - want))
    err_e = float(np.linalg.norm(got_e - want))
    assert err_e < err_p, (err_e, err_p)


def test_make_family_cli_calib(tmp_path):
    """make-family --calib-random: family EC end to end through the CLI
    (resnet18 keeps size manageable on CPU via tiny calib batch)."""
    from qcnn_tpu.cli import main
    from qcnn_tpu.formats.checkpoint import load_family_checkpoint

    out = str(tmp_path / "r18ec")
    assert main(["make-family", "resnet18", out, "--cpu",
                 "--calib-random", "2"]) == 0
    family, spec, params = load_family_checkpoint(out)
    assert family == "resnet"
    assert "codebooks" in params["s3b1"]["conv1"]
