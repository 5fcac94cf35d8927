"""CLI surface tests (subcommand plumbing on the CPU mesh)."""

import os

import numpy as np
import pytest

from qcnn_tpu.cli import main
from qcnn_tpu.formats.checkpoint import load_checkpoint, save_checkpoint


def test_convert_roundtrip(tmp_path, alexnet_bin_dir):
    src = os.path.join(alexnet_bin_dir, "bvlc_alexnet_aCaF.asmtLst.01.cbn")
    if not os.path.exists(src):
        pytest.skip("reference assignments not available")
    mid = str(tmp_path / "a.bin")
    back = str(tmp_path / "a.cbn")
    assert main(["convert", src, mid]) == 0
    assert main(["convert", mid, back]) == 0
    from qcnn_tpu.formats import read_asmt

    np.testing.assert_array_equal(read_asmt(src), read_asmt(back))


def test_import_reference_to_checkpoint(tmp_path, reference_dir):
    ckpt = str(tmp_path / "alexnet_ckpt")
    rc = main([
        "import", ckpt,
        "--model", "alexnet",
        "--weights-dir", os.path.join(reference_dir, "AlexNet", "Bin.Files"),
        "--prefix", "bvlc_alexnet_aCaF",
        "--synthesize-missing",
    ])
    assert rc == 0
    spec, params = load_checkpoint(ckpt)
    assert spec.name == "AlexNet"
    n_pq = sum(1 for p in params if p is not None and "codebooks" in p)
    assert n_pq == 8  # 5 conv + 3 fc


def test_quantize_checkpoint(tmp_path):
    from qcnn_tpu.core import ConvSpec, FCSpec, ModelSpec, ReLUSpec, SoftmaxSpec
    from qcnn_tpu.models import synth

    spec = ModelSpec(
        name="t", in_height=8, in_width=8, in_channels=4,
        layers=(
            ConvSpec(kernel=3, out_channels=16, pad=1),
            ReLUSpec(),
            FCSpec(32),
            SoftmaxSpec(),
        ),
    )
    dense = synth.random_dense_params(spec, seed=2)
    src = str(tmp_path / "dense")
    dst = str(tmp_path / "pq")
    save_checkpoint(src, spec, dense)
    rc = main([
        "quantize", src, dst,
        "--conv-subvec-len", "2", "--conv-codewords", "32",
        "--fc-subvec-len", "2", "--fc-codewords", "32",
    ])
    assert rc == 0
    spec2, params2 = load_checkpoint(dst)
    assert spec2 == spec
    assert "codebooks" in params2[0] and "codebooks" in params2[2]

    from qcnn_tpu.models import network
    from qcnn_tpu.models.prepare import prepare_params

    x = synth.random_input(spec, batch=4, seed=3)
    # plumbing exactness: PQ forward == decoded-dense forward of the SAME
    # quantized params
    got = np.asarray(network.forward(params2, x, spec=spec, with_softmax=False))
    prepared, ci, fi = prepare_params(
        spec, params2, conv_impl="decode", fc_impl="decode",
        dtype=np.float32,
    )
    dec = np.asarray(
        network.forward(prepared, x, spec=spec, conv_impls=ci, fc_impls=fi,
                        with_softmax=False)
    )
    np.testing.assert_allclose(got, dec, rtol=1e-4, atol=1e-4)
    # approximation quality: random gaussian weights are PQ's worst case,
    # but 32 codewords per 2-dim subvector should keep logits close
    ref = np.asarray(network.forward(dense, x, spec=spec, with_softmax=False))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.45


def test_classify_shipped_bmps(reference_dir, capsys):
    bmp_dir = os.path.join(reference_dir, "Bmp.Files")
    if not os.path.isdir(bmp_dir):
        pytest.skip("no BMPs")
    bmps = sorted(
        os.path.join(bmp_dir, f) for f in os.listdir(bmp_dir)
        if f.endswith(".BMP")
    )[:2]
    rc = main(["classify", *bmps, "--reference-dir", reference_dir])
    assert rc == 0
    out = capsys.readouterr().out
    assert "ground truth" in out


def test_import_export_roundtrip_bit_exact(tmp_path, reference_dir):
    """reference files -> checkpoint -> reference files: byte-identical
    payloads for every shipped tensor."""
    import glob

    ckpt = str(tmp_path / "ck")
    out_dir = str(tmp_path / "exported")
    assert main([
        "import", ckpt,
        "--weights-dir", os.path.join(reference_dir, "AlexNet", "Bin.Files"),
        "--prefix", "bvlc_alexnet_aCaF", "--synthesize-missing",
    ]) == 0
    assert main([
        "export", ckpt, out_dir, "--prefix", "bvlc_alexnet_aCaF",
    ]) == 0
    from qcnn_tpu.formats import read_asmt, read_bin

    src_dir = os.path.join(reference_dir, "AlexNet", "Bin.Files")
    checked = 0
    for src in sorted(glob.glob(os.path.join(src_dir, "*.*"))):
        name = os.path.basename(src)
        dst = os.path.join(out_dir, name)
        assert os.path.exists(dst), f"missing export {name}"
        if name.endswith(".cbn"):
            np.testing.assert_array_equal(read_asmt(src), read_asmt(dst))
        else:
            np.testing.assert_array_equal(
                read_bin(src, np.float32), read_bin(dst, np.float32)
            )
        checked += 1
    assert checked >= 20


def test_export_bin_encoding_is_one_based(tmp_path, reference_dir):
    """Round-5 review regression: export --encoding bin wrote the raw
    0-based indices into the format the reference engine (and read_asmt)
    define as 1-based — a reload failed and the C++ engine would have
    shifted every codeword by one. The .bin export must round-trip."""
    from qcnn_tpu.formats import read_asmt, read_bin
    from qcnn_tpu.models.loader import (
        load_reference_model, save_reference_model,
    )

    from qcnn_tpu.models.zoo import alexnet

    spec = alexnet()
    res = load_reference_model(
        spec, os.path.join(reference_dir, "AlexNet", "Bin.Files"),
        "bvlc_alexnet_aCaF", synthesize_missing=True,
    )
    out = str(tmp_path / "binexp")
    save_reference_model(spec, res.params, out,
                         prefix="p", encoding="bin")
    import glob as _glob

    bins = sorted(_glob.glob(os.path.join(out, "p.asmtLst.*.bin")))
    assert bins, "no raw assignment exports written"
    for path in bins:
        raw = read_bin(path, np.uint8)
        assert raw.min() >= 1  # stored 1-based
    # reload through the public reader: identical 0-based indices
    idx = int(bins[0].split(".")[-2]) - 1
    np.testing.assert_array_equal(
        read_asmt(bins[0]),
        np.asarray(res.params[idx]["assignments"]),
    )


def test_eval_dataset_branch(tmp_path, reference_dir, capsys):
    """The full-dataset eval path (dataMatTst/lablVecTst), exercised with a
    synthetic 8-image set in a fake reference layout — this is the exact
    flow that runs when the upstream 500 MB blob is present."""
    import shutil

    from qcnn_tpu.formats import write_bin

    fake = tmp_path / "ref"
    (fake / "ILSVRC12.227x227.IMG").mkdir(parents=True)
    (fake / "Cls.Names").mkdir()
    # reuse real weights + class names
    shutil.copytree(
        os.path.join(reference_dir, "AlexNet"), fake / "AlexNet"
    )
    shutil.copy(
        os.path.join(reference_dir, "Cls.Names", "class_names.txt"),
        fake / "Cls.Names" / "class_names.txt",
    )
    shutil.copy(
        os.path.join(reference_dir, "Cls.Names", "image_labels.txt"),
        fake / "Cls.Names" / "image_labels.txt",
    )
    rng = np.random.default_rng(0)
    images = rng.standard_normal((8, 3, 227, 227)).astype(np.float32)
    labels = rng.integers(0, 1000, 8).astype(np.uint16)
    write_bin(str(fake / "ILSVRC12.227x227.IMG" / "dataMatTst.single.bin"),
              images)
    write_bin(str(fake / "ILSVRC12.227x227.IMG" / "lablVecTst.uint16.bin"),
              labels)
    rc = main(["eval", "--reference-dir", str(fake), "--batch", "4",
               "--limit", "8"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "ACCURACY@1" in out and "ACCURACY@5" in out
    assert "8 images" in out


def test_import_embeds_preproc_and_serve_uses_it(tmp_path, reference_dir):
    """import -> self-contained checkpoint -> engine+HTTP classify a BMP."""
    import json as _json
    import urllib.request

    from qcnn_tpu.formats.checkpoint import (
        load_checkpoint, load_preprocessor,
    )
    from qcnn_tpu.models.loader import load_class_names
    from qcnn_tpu.serve.engine import BatchingEngine, EngineConfig
    from qcnn_tpu.serve.http import serve as http_serve

    ckpt = str(tmp_path / "sc")
    assert main([
        "import", ckpt,
        "--weights-dir", os.path.join(reference_dir, "AlexNet", "Bin.Files"),
        "--prefix", "bvlc_alexnet_aCaF", "--synthesize-missing",
    ]) == 0
    pre = load_preprocessor(ckpt)
    assert pre is not None and pre.crop_h == 227
    names = load_class_names(os.path.join(ckpt, "class_names.txt"))
    assert len(names) == 1000

    spec, params = load_checkpoint(ckpt)
    eng = BatchingEngine(
        spec, params, config=EngineConfig(max_batch=2, max_wait_ms=2.0)
    ).start()
    srv = http_serve(eng, host="127.0.0.1", port=0, block=False,
                     preprocessor=pre, class_names=names)
    port = srv.server_address[1]
    try:
        bmp = os.path.join(
            reference_dir, "Bmp.Files", "ILSVRC2012_val_00000001.BMP"
        )
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/classify",
            data=open(bmp, "rb").read(), method="POST",
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            out = _json.loads(r.read())
        assert len(out["class_names"]) == 5
        assert all(isinstance(n, str) and n for n in out["class_names"])
    finally:
        srv.shutdown()
        eng.stop()


def test_classify_from_checkpoint(tmp_path, reference_dir, capsys):
    ckpt = str(tmp_path / "cc")
    assert main([
        "import", ckpt,
        "--weights-dir", os.path.join(reference_dir, "AlexNet", "Bin.Files"),
        "--prefix", "bvlc_alexnet_aCaF", "--synthesize-missing",
    ]) == 0
    bmp = os.path.join(
        reference_dir, "Bmp.Files", "ILSVRC2012_val_00000002.BMP"
    )
    assert main(["classify", bmp, "--checkpoint", ckpt]) == 0
    out = capsys.readouterr().out
    assert "ILSVRC2012_val_00000002" in out
    # memory mode (compressed-resident in-step decode) serves the same CLI
    assert main(
        ["classify", bmp, "--checkpoint", ckpt, "--memory-mode"]
    ) == 0
    out_mem = capsys.readouterr().out
    assert "ILSVRC2012_val_00000002" in out_mem


def test_quantize_layer_config_override(tmp_path):
    from qcnn_tpu.core import FCSpec, ModelSpec, ReLUSpec, SoftmaxSpec
    from qcnn_tpu.models import synth

    spec = ModelSpec(
        name="t2", in_height=4, in_width=4, in_channels=2,
        layers=(FCSpec(24), ReLUSpec(), FCSpec(12), SoftmaxSpec()),
    )
    dense = synth.random_dense_params(spec, seed=7)
    src = str(tmp_path / "d")
    dst = str(tmp_path / "q")
    save_checkpoint(src, spec, dense)
    rc = main([
        "quantize", src, dst,
        "--fc-subvec-len", "4", "--fc-codewords", "8",
        "--layer-config", '{"2": {"subvec_len": 1, "codewords": 4}}',
    ])
    assert rc == 0
    _, params = load_checkpoint(dst)
    s0, k0, d0 = params[0]["codebooks"].shape
    s2, k2, d2 = params[2]["codebooks"].shape
    assert (d0, k0) == (4, 8)      # global config
    assert (d2, k2) == (1, 4)      # per-layer override (fc8-style scalar)


def test_eval_from_checkpoint(tmp_path, reference_dir, capsys):
    ckpt = str(tmp_path / "ec")
    assert main([
        "import", ckpt,
        "--weights-dir", os.path.join(reference_dir, "AlexNet", "Bin.Files"),
        "--prefix", "bvlc_alexnet_aCaF", "--synthesize-missing",
    ]) == 0
    rc = main(["eval", "--checkpoint", ckpt,
               "--reference-dir", reference_dir, "--limit", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "ACCURACY@1" in out


def test_eval_limit_zero_means_unlimited(reference_dir, capsys):
    """--limit 0 must evaluate everything (shipped-BMP fallback path), not
    crash on an empty slice (round-2 review)."""
    from qcnn_tpu.cli import main

    assert main(["eval", "--reference-dir", reference_dir,
                 "--limit", "0"]) == 0
    out = capsys.readouterr().out
    assert "ACCURACY@1:" in out
