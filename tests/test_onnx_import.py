"""ONNX weight ingestion (formats/onnx_import.py): a hand-encoded
ModelProto built from the same weights as a torch state_dict must map to
the identical dense params list, and the quantize CLI must accept .onnx."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from qcnn_tpu.formats.caffe_pb import _key, _len_field, _write_varint
from qcnn_tpu.formats.onnx_import import import_onnx, read_onnx
from tests.test_torch_import import _mini_vgg_spec, _mk_linear_state_dict

_LEN, _VARINT = 2, 0


def _tensor(name: str, arr: np.ndarray) -> bytes:
    msg = b""
    for d in arr.shape:
        msg += _key(1, _VARINT) + _write_varint(d)
    msg += _key(2, _VARINT) + _write_varint(1)  # FLOAT
    msg += _len_field(8, name.encode())
    msg += _len_field(9, np.ascontiguousarray(arr, "<f4").tobytes())
    return msg


def _node(op: str, inputs, attrs=()) -> bytes:
    msg = b""
    for i in inputs:
        msg += _len_field(1, i.encode())
    msg += _len_field(4, op.encode())
    for aname, aint in attrs:
        amsg = _len_field(1, aname.encode())
        amsg += _key(3, _VARINT) + _write_varint(aint)
        msg += _len_field(5, amsg)
    return msg


def _mk_onnx(sd) -> bytes:
    """ONNX graph mirroring _mk_linear_state_dict's mini VGG: two Convs,
    a transB Gemm, and a plain MatMul+bias (exercises both FC forms)."""
    graph = b""
    nodes = [
        _node("Conv", ["x", "features.0.weight", "features.0.bias"]),
        _node("Relu", ["a0"]),
        _node("MaxPool", ["a1"]),
        _node("Conv", ["p0", "features.3.weight", "features.3.bias"]),
        _node("Relu", ["a2"]),
        _node("MaxPool", ["a3"]),
        _node("Flatten", ["p1"]),
        _node("Gemm", ["f0", "classifier.0.weight", "classifier.0.bias"],
              attrs=[("transB", 1), ("alpha", 1)]),
        _node("Relu", ["g0"]),
        _node("MatMul", ["r0", "classifier.3.weight.T"]),
        _node("Add", ["m0", "classifier.3.bias"]),
        _node("Softmax", ["s_in"]),
    ]
    for n in nodes:
        graph += _len_field(1, n)
    for k, v in sd.items():
        arr = v.numpy()
        if k == "classifier.3.weight":
            # stored pre-transposed for the MatMul form
            graph += _len_field(5, _tensor(k + ".T", arr.T))
        else:
            graph += _len_field(5, _tensor(k, arr))
    model = _key(1, _VARINT) + _write_varint(7)  # ir_version
    model += _len_field(7, graph)
    return model


def test_onnx_matches_torch_import():
    from qcnn_tpu.models.torch_import import linear_from_torch_state_dict

    spec = _mini_vgg_spec()
    sd = _mk_linear_state_dict(np.random.default_rng(21))
    onnx_bytes = _mk_onnx(sd)

    nodes, inits = read_onnx(onnx_bytes)
    assert [n.op_type for n in nodes][:2] == ["Conv", "Relu"]
    assert "features.0.weight" in inits

    got = import_onnx(onnx_bytes, spec)
    want = linear_from_torch_state_dict(spec, sd)
    assert len(got) == len(want)
    last_learnable = max(i for i, g in enumerate(got) if g is not None)
    for i, (g, w) in enumerate(zip(got, want)):
        if g is None:
            assert w is None
            continue
        for key in g:
            if key == "bias" and i == last_learnable:
                # the MatMul form carries no bias input -> zeros (covered
                # by test_onnx_matmul_bias_defaults_to_zero)
                continue
            np.testing.assert_array_equal(g[key], w[key])


def test_onnx_matmul_bias_defaults_to_zero():
    spec = _mini_vgg_spec()
    sd = _mk_linear_state_dict(np.random.default_rng(22))
    got = import_onnx(_mk_onnx(sd), spec)
    # the MatMul node carries no bias input -> zeros
    last_fc = [p for p in got if p is not None][-1]
    np.testing.assert_array_equal(last_fc["bias"],
                                  np.zeros(10, np.float32))


def test_quantize_cli_from_onnx(tmp_path, monkeypatch):
    from qcnn_tpu.cli import main
    from qcnn_tpu.formats.checkpoint import load_checkpoint, load_preprocessor
    from qcnn_tpu.models import zoo
    from qcnn_tpu.preproc import TorchPreprocessor

    spec = _mini_vgg_spec()
    monkeypatch.setitem(zoo.MODELS, "minivgg", lambda: spec)
    sd = _mk_linear_state_dict(np.random.default_rng(23))
    path = str(tmp_path / "mini.onnx")
    with open(path, "wb") as f:
        f.write(_mk_onnx(sd))
    out = str(tmp_path / "pq")
    assert main([
        "quantize", path, out, "--arch", "minivgg", "--cpu",
        "--conv-subvec-len", "4", "--conv-codewords", "8",
        "--fc-subvec-len", "4", "--fc-codewords", "8",
    ]) == 0
    spec2, params = load_checkpoint(out)
    assert spec2.name == "MiniVGG"
    assert any(p is not None and "codebooks" in p for p in params)
    assert isinstance(load_preprocessor(out), TorchPreprocessor)


def test_onnx_node_count_mismatch_errors():
    spec = _mini_vgg_spec()
    sd = _mk_linear_state_dict(np.random.default_rng(24))
    onnx_bytes = _mk_onnx(sd)
    # a spec with more learnable layers than the graph carries
    from qcnn_tpu.core import FCSpec, ModelSpec

    bad = ModelSpec(name="x", in_height=4, in_width=4, in_channels=3,
                    layers=(FCSpec(4),))
    with pytest.raises(ValueError, match="nodes with weights"):
        import_onnx(onnx_bytes, bad)


@pytest.mark.parametrize("blob", [
    b"", b"\x08", b"\x3a\xff\xff\xff\xff\x7f", b"\x00" * 64,
    bytes(range(256)),
])
def test_onnx_malformed_input_raises_cleanly(blob):
    """Truncated/garbage protobuf must raise ValueError (truncated field /
    no graph / bad wire type), never crash or hang."""
    spec = _mini_vgg_spec()
    with pytest.raises(ValueError):
        import_onnx(blob, spec)


def test_onnx_truncated_real_model_raises():
    sd = _mk_linear_state_dict(np.random.default_rng(30))
    blob = _mk_onnx(sd)
    for cut in (len(blob) // 3, len(blob) - 7):
        with pytest.raises(ValueError):
            import_onnx(blob[:cut], _mini_vgg_spec())


def test_onnx_truncated_packed_dims_raises_valueerror():
    """A TensorProto whose packed dims payload ends mid-varint must raise
    ValueError (the shared _read_varint guard), not IndexError."""
    bad_tensor = _len_field(1, b"\x80")  # dims: continuation byte, no end
    graph = _len_field(5, bad_tensor)
    model = _key(1, _VARINT) + _write_varint(7) + _len_field(7, graph)
    with pytest.raises(ValueError):
        import_onnx(model, _mini_vgg_spec())
