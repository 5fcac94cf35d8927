"""Caffe .caffemodel wire-format codec + importer (formats/caffe_pb.py).

The synthetic fixtures here are REAL protobuf NetParameter bytes (written by
our own encoder), so the read path is exercised on the actual format,
including the legacy V1 `layers` field and legacy 4-D blob headers.
"""

import numpy as np
import pytest

from qcnn_tpu.formats import caffe_pb
from qcnn_tpu.formats.caffe_pb import (
    CaffeLayer, CaffeNet, import_caffemodel, read_caffemodel,
    write_caffemodel,
)


def _tiny_spec():
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


def _tiny_net(rng) -> CaffeNet:
    # blobs in Caffe layouts: conv (Cout, Cin/g, kh, kw), fc (Cout, Cin)
    conv_w = rng.standard_normal((32, 4, 3, 3)).astype(np.float32)
    conv_b = rng.standard_normal(32).astype(np.float32)
    # conv out: 15x15 pad1 stride2 -> 8x8; pool k3 s2 ceil -> 4x4 -> 512 feats
    fc1_w = rng.standard_normal((64, 32 * 4 * 4)).astype(np.float32)
    fc1_b = rng.standard_normal(64).astype(np.float32)
    fc2_w = rng.standard_normal((16, 64)).astype(np.float32)
    fc2_b = rng.standard_normal(16).astype(np.float32)
    return CaffeNet("TinyNet", [
        CaffeLayer("data", "Data", []),
        CaffeLayer("conv1", "Convolution", [conv_w, conv_b]),
        CaffeLayer("relu1", "ReLU", []),
        CaffeLayer("fc1", "InnerProduct", [fc1_w, fc1_b]),
        CaffeLayer("fc2", "InnerProduct", [fc2_w, fc2_b]),
    ])


@pytest.mark.parametrize("v1", [False, True])
def test_roundtrip(tmp_path, v1):
    net = _tiny_net(np.random.default_rng(0))
    path = tmp_path / "net.caffemodel"
    write_caffemodel(path, net, v1=v1)
    got = read_caffemodel(path)
    assert got.name == "TinyNet"
    assert [l.name for l in got.layers] == [l.name for l in net.layers]
    assert [l.type for l in got.layers] == [l.type for l in net.layers]
    for a, b in zip(got.layers, net.layers):
        assert len(a.blobs) == len(b.blobs)
        for ba, bb in zip(a.blobs, b.blobs):
            np.testing.assert_array_equal(ba, bb)


def test_legacy_4d_blob_header():
    # hand-encode a blob with num/channels/height/width instead of shape
    arr = np.arange(24, dtype=np.float32).reshape(2, 3, 2, 2)
    payload = b"".join(
        caffe_pb._key(f, 0) + caffe_pb._write_varint(d)
        for f, d in zip((1, 2, 3, 4), arr.shape)
    ) + caffe_pb._len_field(5, arr.ravel().astype("<f4").tobytes())
    got = caffe_pb._parse_blob(payload)
    np.testing.assert_array_equal(got, arr)


def test_legacy_header_keeps_all_dims():
    """Round-5 review: the parser used to squeeze ALL leading 1-dims,
    mangling a valid (1, Cin, kh, kw) conv blob (out_channels=1) to
    rank 3. The parser now keeps the legacy 4-D header as-is; consumers
    that expect lower rank (FC weights via the importer's squeeze, bias
    via ravel) reduce it where the expected rank is known."""
    arr = np.arange(5, dtype=np.float32)
    payload = b"".join(
        caffe_pb._key(f, 0) + caffe_pb._write_varint(d)
        for f, d in zip((1, 2, 3, 4), (1, 1, 1, 5))
    ) + caffe_pb._len_field(5, arr.astype("<f4").tobytes())
    got = caffe_pb._parse_blob(payload)
    assert got.shape == (1, 1, 1, 5)  # ravel()-consumed by the importer
    conv = np.arange(12, dtype=np.float32).reshape(1, 3, 2, 2)
    payload = b"".join(
        caffe_pb._key(f, 0) + caffe_pb._write_varint(d)
        for f, d in zip((1, 2, 3, 4), conv.shape)
    ) + caffe_pb._len_field(5, conv.ravel().astype("<f4").tobytes())
    got = caffe_pb._parse_blob(payload)
    np.testing.assert_array_equal(got, conv)  # rank 4 preserved


def test_truncated_fixed32_rejected():
    """A file cut mid-fixed32 must error, not decode garbage bytes
    (round-5 review: int.from_bytes on a short slice succeeded)."""
    payload = caffe_pb._key(2, 5) + b"\x01\x02"  # fixed32 with 2 bytes
    with pytest.raises(ValueError, match="truncated fixed32"):
        list(caffe_pb._iter_fields(payload))


def test_unknown_fields_are_skipped(tmp_path):
    net = _tiny_net(np.random.default_rng(1))
    path = tmp_path / "net.caffemodel"
    write_caffemodel(path, net)
    # append an unknown varint field (200) and an unknown length field (201)
    extra = (caffe_pb._key(200, 0) + caffe_pb._write_varint(7)
             + caffe_pb._len_field(201, b"opaque"))
    with open(path, "ab") as f:
        f.write(extra)
    got = read_caffemodel(path)
    assert len(got.layers) == 5


def test_import_into_spec(tmp_path):
    from qcnn_tpu.models import network

    spec = _tiny_spec()
    net = _tiny_net(np.random.default_rng(2))
    path = tmp_path / "tiny.caffemodel"
    write_caffemodel(path, net)
    params = import_caffemodel(path, spec)
    # learnable layers landed at the right indices, rest are None
    assert [i for i, p in enumerate(params) if p is not None] == [0, 4, 6]
    assert params[0]["kernel"].shape == (3, 3, 4, 32)   # HWIO
    assert params[4]["weight"].shape == (512, 64)       # (Cin, Cout)
    # layout: kernel HWIO == transpose of the Caffe OIHW blob
    np.testing.assert_array_equal(
        params[0]["kernel"], np.transpose(net.layers[1].blobs[0], (2, 3, 1, 0))
    )
    # and the imported net actually runs forward
    import jax.numpy as jnp

    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 15, 15, 8)), jnp.float32
    )
    out = np.asarray(network.forward(params, x, spec=spec))
    assert out.shape == (2, 16)
    assert np.isfinite(out).all()


def test_import_shape_mismatch_raises(tmp_path):
    spec = _tiny_spec()
    net = _tiny_net(np.random.default_rng(4))
    net.layers[1].blobs[0] = net.layers[1].blobs[0][:, :, :2, :2]  # wrong k
    path = tmp_path / "bad.caffemodel"
    write_caffemodel(path, net)
    with pytest.raises(ValueError, match="does not match spec"):
        import_caffemodel(path, spec)


def test_import_count_mismatch_raises(tmp_path):
    spec = _tiny_spec()
    net = _tiny_net(np.random.default_rng(5))
    net.layers = net.layers[:-1]  # drop fc2
    path = tmp_path / "short.caffemodel"
    write_caffemodel(path, net)
    with pytest.raises(ValueError, match="learnable"):
        import_caffemodel(path, spec)


def test_quantize_cli_on_caffemodel(tmp_path, monkeypatch):
    """End-to-end: `qcnn_tpu quantize tiny.caffemodel out --arch tiny`
    produces a loadable PQ checkpoint whose forward approximates the
    imported dense net."""
    import jax.numpy as jnp

    from qcnn_tpu import cli
    from qcnn_tpu.formats.checkpoint import load_checkpoint
    from qcnn_tpu.models import network, zoo

    spec = _tiny_spec()
    monkeypatch.setitem(zoo.MODELS, "tiny", lambda: spec)
    net = _tiny_net(np.random.default_rng(6))
    # tame fc weights so PQ error stays small for the comparison
    for l in net.layers:
        for i, b in enumerate(l.blobs):
            l.blobs[i] = (b * 0.05).astype(np.float32)
    src = tmp_path / "tiny.caffemodel"
    out = tmp_path / "tiny_pq.ckpt"
    write_caffemodel(src, net)
    rc = cli.main([
        "quantize", str(src), str(out), "--arch", "tiny", "--cpu",
        "--conv-subvec-len", "2", "--conv-codewords", "16",
        "--fc-subvec-len", "2", "--fc-codewords", "32",
    ])
    assert rc == 0
    lspec, lparams = load_checkpoint(out)
    assert lspec.name == spec.name
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, 15, 15, 8)) * 0.1,
        jnp.float32,
    )
    dense = import_caffemodel(src, spec)
    ref = np.asarray(network.forward(dense, x, spec=spec))
    got = np.asarray(network.forward(lparams, x, spec=spec))
    assert np.argmax(got, -1).tolist() == np.argmax(ref, -1).tolist()
