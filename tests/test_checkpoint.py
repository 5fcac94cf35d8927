"""Native checkpoint format: round-trip and bit-packing tests."""

import numpy as np
import pytest

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


class TestOrbaxStore:
    """store='orbax' writes a TensorStore/OCDBT array store (the SURVEY §5
    north-star checkpoint backend); load auto-detects it from the manifest
    layout, so the two backends are interchangeable artifacts."""

    def test_linear_roundtrip(self, tmp_path):
        spec = zoo.get_model("caffenet_fgd")
        params = synth.random_pq_params(spec, seed=7)
        path = str(tmp_path / "ockpt")
        save_checkpoint(path, spec, params, store="orbax")
        import os

        assert not os.path.exists(os.path.join(path, "params.npz"))
        assert os.path.isdir(os.path.join(path, "params_ts"))
        spec2, params2 = load_checkpoint(path)
        assert spec2 == spec
        for p, q in zip(params, params2):
            if p is None:
                assert q is None
                continue
            for k in p:
                np.testing.assert_array_equal(
                    np.asarray(p[k]), np.asarray(q[k])
                )

    def test_family_roundtrip(self, tmp_path):
        from qcnn_tpu.formats.checkpoint import (
            load_family_checkpoint, save_family_checkpoint,
        )
        from qcnn_tpu.models import vit

        spec = vit.vit_tiny_test()
        pq = vit.quantize_params(
            spec, vit.init_dense_params(spec, seed=4), num_codewords=8
        )
        path = str(tmp_path / "ofam")
        save_family_checkpoint(path, "vit", spec, pq, store="orbax")
        family, spec2, params2 = load_family_checkpoint(path)
        assert family == "vit" and spec2 == spec

        def cmp(a, b):
            assert set(a) == set(b)
            for k in a:
                if isinstance(a[k], dict):
                    cmp(a[k], b[k])
                else:
                    got = np.asarray(b[k])
                    np.testing.assert_array_equal(np.asarray(a[k]), got)
                    assert got.dtype == np.asarray(a[k]).dtype

        cmp(pq, params2)

    def test_unknown_store_rejected(self, tmp_path):
        spec = zoo.get_model("alexnet")
        params = synth.random_pq_params(spec, seed=0)
        with pytest.raises(ValueError, match="unknown array store"):
            save_checkpoint(str(tmp_path / "x"), spec, params, store="zip")


class TestFamilyCheckpoint:
    def test_resnet_roundtrip(self, tmp_path):
        from qcnn_tpu.formats.checkpoint import (
            load_family_checkpoint, save_family_checkpoint,
        )
        from qcnn_tpu.models import resnet

        spec = resnet.ResNetSpec(
            "rn-ck", (1, 1), (32, 64), num_classes=5, in_size=32,
            bottleneck=False,
        )
        pq = resnet.quantize_params(
            spec, resnet.init_dense_params(spec, seed=2),
            conv_codewords=8, fc_codewords=8,
        )
        path = str(tmp_path / "fam")
        save_family_checkpoint(path, "resnet", spec, pq)
        family, spec2, params2 = load_family_checkpoint(path)
        assert family == "resnet" and spec2 == spec

        def cmp(a, b):
            assert set(a) == set(b)
            for k in a:
                if isinstance(a[k], dict):
                    cmp(a[k], b[k])
                else:
                    np.testing.assert_array_equal(
                        np.asarray(a[k]), np.asarray(b[k])
                    )

        cmp(pq, params2)
        # forward agrees
        x = np.random.default_rng(0).standard_normal(
            (2, 32, 32, 3)
        ).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(resnet.forward(pq, x, spec=spec)),
            np.asarray(resnet.forward(params2, x, spec=spec)),
            rtol=1e-5, atol=1e-5,
        )

    def test_vit_roundtrip_and_linear_guard(self, tmp_path):
        from qcnn_tpu.formats.checkpoint import (
            load_checkpoint, load_family_checkpoint, save_family_checkpoint,
        )
        from qcnn_tpu.models import vit

        spec = vit.vit_tiny_test()
        pq = vit.quantize_params(
            spec, vit.init_dense_params(spec, seed=1), num_codewords=8
        )
        path = str(tmp_path / "vfam")
        save_family_checkpoint(path, "vit", spec, pq)
        family, spec2, params2 = load_family_checkpoint(path)
        assert family == "vit" and spec2 == spec
        with pytest.raises(ValueError, match="family checkpoint"):
            load_checkpoint(path)


def test_resave_with_different_store_removes_stale_arrays(tmp_path):
    """Re-saving into an existing dir with the other --store must not
    leave the previous store's arrays behind (load prefers params.npz, so
    a stale npz would silently serve the OLD weights)."""
    import numpy as np

    from qcnn_tpu.core import FCSpec, ModelSpec, SoftmaxSpec, dense_fc_params
    from qcnn_tpu.formats.checkpoint import load_checkpoint, save_checkpoint

    spec = ModelSpec(name="st", in_height=2, in_width=2, in_channels=2,
                     layers=(FCSpec(3), SoftmaxSpec()))

    def params(val):
        return [dense_fc_params(
            np.full((8, 3), val, np.float32), np.zeros(3, np.float32)
        ), None]

    out = str(tmp_path / "ck")
    save_checkpoint(out, spec, params(1.0), store="npz")
    save_checkpoint(out, spec, params(2.0), store="orbax")
    _, back = load_checkpoint(out)
    np.testing.assert_array_equal(back[0]["weight"],
                                  np.full((8, 3), 2.0, np.float32))
    save_checkpoint(out, spec, params(3.0), store="npz")
    _, back = load_checkpoint(out)
    np.testing.assert_array_equal(back[0]["weight"],
                                  np.full((8, 3), 3.0, np.float32))


def test_family_checkpoint_top_level_assignments(tmp_path):
    """A params tree whose assignments/codebooks live at the TOP level
    (key == 'assignments') must round-trip — the packed-key derivation
    used to produce 'assignments/codebooks' and KeyError."""
    from qcnn_tpu.formats.checkpoint import (
        load_family_checkpoint, save_family_checkpoint,
    )
    from qcnn_tpu.models.vit import ViTSpec

    rng = np.random.default_rng(0)
    spec = ViTSpec("vit-top", patch=8, image_size=16, dim=32, depth=1,
                   heads=2, num_classes=4)
    params = {
        "codebooks": rng.standard_normal((4, 8, 4)).astype(np.float32),
        "assignments": rng.integers(0, 8, size=(16, 4), dtype=np.uint8),
        "bias": np.zeros(16, np.float32),
    }
    save_family_checkpoint(str(tmp_path / "ck"), "vit", spec, params)
    fam, spec2, params2 = load_family_checkpoint(str(tmp_path / "ck"))
    np.testing.assert_array_equal(params2["assignments"],
                                  params["assignments"])


def test_pack_indices_rejects_out_of_range():
    from qcnn_tpu.formats.checkpoint import pack_indices

    with pytest.raises(ValueError, match="does not fit"):
        pack_indices(np.array([0, 40], np.uint8), num_codewords=32)


def test_family_checkpoint_rejects_newer_format(tmp_path):
    import json as _json

    from qcnn_tpu.formats.checkpoint import (
        load_family_checkpoint, save_family_checkpoint,
    )
    from qcnn_tpu.models.vit import ViTSpec

    spec = ViTSpec("vit-v", patch=8, image_size=16, dim=32, depth=1,
                   heads=2, num_classes=4)
    save_family_checkpoint(
        str(tmp_path / "ck"), "vit", spec,
        {"bias": np.zeros(4, np.float32)})
    mf = tmp_path / "ck" / "manifest.json"
    m = _json.loads(mf.read_text())
    m["format_version"] = 99
    mf.write_text(_json.dumps(m))
    with pytest.raises(ValueError, match="newer than supported"):
        load_family_checkpoint(str(tmp_path / "ck"))
