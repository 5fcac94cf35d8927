"""Native checkpoint format: round-trip and bit-packing tests."""

import numpy as np

from qcnn_tpu.formats.checkpoint import (
    load_checkpoint,
    pack_indices,
    save_checkpoint,
    spec_from_dict,
    spec_to_dict,
    unpack_indices,
)
from qcnn_tpu.models import synth, zoo


def test_pack_unpack_indices(rng):
    for k in (2, 5, 16, 32, 128, 250):
        shape = (37, 11)
        vals = rng.integers(0, k, size=shape, dtype=np.uint8)
        packed, bits = pack_indices(vals, k)
        assert bits == max(1, int(np.ceil(np.log2(k))))
        got = unpack_indices(packed, bits, shape)
        np.testing.assert_array_equal(got, vals)
        # packing actually compresses vs 1 byte/index
        assert packed.nbytes <= int(np.prod(shape)) * bits / 8 + 8


def test_spec_roundtrip():
    for name in ("alexnet", "vgg16", "caffenet_fgd"):
        spec = zoo.get_model(name)
        assert spec_from_dict(spec_to_dict(spec)) == spec


def test_checkpoint_roundtrip(tmp_path, rng):
    spec = zoo.get_model("caffenet_fgd")
    params = synth.random_pq_params(spec, seed=11)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, spec, params)
    spec2, params2 = load_checkpoint(path)
    assert spec2 == spec
    assert len(params2) == len(params)
    for p, q in zip(params, params2):
        if p is None:
            assert q is None
            continue
        assert set(p) == set(q)
        for k in p:
            np.testing.assert_array_equal(np.asarray(p[k]), np.asarray(q[k]))


def test_checkpoint_smaller_than_raw(tmp_path):
    """PQ checkpoint with bit-packed assignments beats 1-byte indices."""
    import os

    spec = zoo.get_model("alexnet")
    params = synth.random_pq_params(spec, seed=3)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, spec, params)
    npz = os.path.getsize(os.path.join(path, "params.npz"))
    raw_asmt = sum(
        int(np.prod(np.asarray(p["assignments"]).shape))
        for p in params if p is not None
    )
    # assignments dominate; 5-7 bit packing should save >= 25 %
    assert npz < raw_asmt * 0.95
