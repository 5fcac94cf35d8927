"""Family-checkpoint classify surface: TorchPreprocessor (torch-ecosystem
eval transform) + FamilyClassifier + CLI dispatch.

The reference wires Caffe-style preprocessing per model in code
(CaffeEvaWrapper.cc:54-85); family checkpoints instead embed the
torchvision/timm eval transform so `classify`/`serve --checkpoint` work on
imported pretrained weights end to end."""


import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _write_bmp(path: str, rgb_uint8: np.ndarray) -> None:
    """Encode (H, W, 3) uint8 RGB as a 24-bit BI_RGB bottom-up BMP."""
    from qcnn_tpu.preproc.bmp import encode_bmp24

    with open(path, "wb") as f:
        f.write(encode_bmp24(rgb_uint8, input_order="rgb"))

def test_halfpixel_resize_matches_torch():
    from qcnn_tpu.preproc import resize_bilinear_halfpixel

    rng = np.random.default_rng(0)
    for (h, w), (oh, ow) in [((37, 53), (24, 24)), ((64, 48), (96, 128)),
                             ((256, 384), (224, 224))]:
        img = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
        got = resize_bilinear_halfpixel(img, oh, ow)
        want = torch.nn.functional.interpolate(
            torch.tensor(np.transpose(img, (2, 0, 1))[None]),
            size=(oh, ow), mode="bilinear", align_corners=False,
            antialias=False,
        )[0].permute(1, 2, 0).numpy()
        # float32 vs torch's float64 tap accumulation on [0, 255] values
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)


def test_torch_preprocessor_oracle():
    """Full transform vs a manual torch composition: shorter-side resize,
    center crop, /255, mean/std normalize, RGB order."""
    from qcnn_tpu.preproc import TorchPreprocessor

    pre = TorchPreprocessor.imagenet(crop=224, resize=256)
    rng = np.random.default_rng(1)
    for h, w in [(300, 420), (420, 300), (256, 256)]:
        bgr = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
        got = pre(bgr)
        assert got.shape == (224, 224, 3)
        rgb = np.ascontiguousarray(bgr[..., ::-1])
        t = torch.tensor(np.transpose(rgb, (2, 0, 1))[None])
        if h <= w:
            size = (256, round(w * 256 / h))
        else:
            size = (round(h * 256 / w), 256)
        t = torch.nn.functional.interpolate(
            t, size=size, mode="bilinear", align_corners=False)
        top = (size[0] - 224) // 2
        left = (size[1] - 224) // 2
        t = t[:, :, top:top + 224, left:left + 224] / 255.0
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        want = ((t - mean) / std)[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_preprocessor_checkpoint_round_trip(tmp_path):
    from qcnn_tpu.formats.checkpoint import (
        load_preprocessor, save_preprocessor,
    )
    from qcnn_tpu.preproc import TorchPreprocessor

    pre = TorchPreprocessor.imagenet(crop=224, resize=256)
    save_preprocessor(str(tmp_path), pre)
    back = load_preprocessor(str(tmp_path))
    assert isinstance(back, TorchPreprocessor)
    assert (back.resize, back.crop) == (256, 224)
    np.testing.assert_array_equal(back.mean, pre.mean)
    np.testing.assert_array_equal(back.std, pre.std)


@pytest.fixture(scope="module")
def family_ckpt(tmp_path_factory):
    """Dense synthetic resnet18 checkpoint via the real CLI (embeds the
    torch-style preproc)."""
    from qcnn_tpu.cli import main

    out = str(tmp_path_factory.mktemp("fam") / "r18")
    assert main(["make-family", "resnet18", out, "--dense", "--cpu"]) == 0
    return out


def test_family_classifier_matches_direct_forward(family_ckpt, tmp_path):
    import jax.numpy as jnp

    from qcnn_tpu.eval.harness import FamilyClassifier
    from qcnn_tpu.formats.checkpoint import (
        load_family_checkpoint, load_preprocessor,
    )
    from qcnn_tpu.models import resnet

    rng = np.random.default_rng(2)
    bmp = str(tmp_path / "img.bmp")
    _write_bmp(bmp, rng.integers(0, 256, (240, 320, 3), dtype=np.uint8))

    clf = FamilyClassifier.from_checkpoint(family_ckpt,
                                           compute_dtype=jnp.float32)
    res = clf.classify(bmp, top_k=5)
    assert len(res.class_ids) == 5
    assert all(0 <= p <= 1 for p in res.probs)

    _, spec, params = load_family_checkpoint(family_ckpt)
    pre = load_preprocessor(family_ckpt)
    x = pre.load(bmp)
    prepared = resnet.prepare_params(spec, params, dtype=jnp.float32)
    want = np.asarray(resnet.forward(
        prepared, jnp.asarray(x), spec=spec, compute_dtype=jnp.float32,
        with_softmax=True))[0]
    top5 = np.argsort(-want)[:5]
    np.testing.assert_array_equal(res.class_ids, top5)
    np.testing.assert_allclose(res.probs, want[top5], rtol=1e-5, atol=1e-6)


def test_classify_cli_family_checkpoint(family_ckpt, tmp_path, capsys):
    from qcnn_tpu.cli import main

    rng = np.random.default_rng(3)
    bmp = str(tmp_path / "img.bmp")
    _write_bmp(bmp, rng.integers(0, 256, (260, 260, 3), dtype=np.uint8))
    assert main(["classify", "--checkpoint", family_ckpt, bmp,
                 "--top-k", "3"]) == 0
    out = capsys.readouterr().out
    assert "img.bmp:" in out
    assert len([ln for ln in out.splitlines() if ln.startswith("  ")]) >= 3


def test_eval_cli_family_bmp_set(family_ckpt, tmp_path, capsys):
    """eval --checkpoint <family> --images GLOB --labels FILE: dataset
    accuracy through the checkpoint's own (torch-style) preprocessing."""
    from qcnn_tpu.cli import main

    rng = np.random.default_rng(5)
    for i in range(4):
        _write_bmp(str(tmp_path / f"img{i}.bmp"),
                   rng.integers(0, 256, (230, 250, 3), dtype=np.uint8))
    labels = tmp_path / "labels.txt"
    labels.write_text(
        "\n".join(f"img{i}.JPEG {i * 7}" for i in range(4)) + "\n")
    assert main([
        "eval", "--checkpoint", family_ckpt,
        "--images", str(tmp_path / "*.bmp"),
        "--labels", str(labels), "--batch", "2",
    ]) == 0
    out = capsys.readouterr().out
    assert "ACCURACY@1:" in out and "ACCURACY@5:" in out
    assert "4 images" in out


def test_serve_family_checkpoint_bmp_upload(family_ckpt, tmp_path):
    """family checkpoint -> serving engine; BMP upload goes through the
    embedded torch-style transform (cli.family_engine_from_checkpoint,
    the serve --checkpoint family path)."""
    import json
    import urllib.request

    import jax.numpy as jnp

    from qcnn_tpu.cli import family_engine_from_checkpoint
    from qcnn_tpu.serve.engine import EngineConfig
    from qcnn_tpu.serve.http import serve as http_serve

    engine, pre, names = family_engine_from_checkpoint(
        family_ckpt, EngineConfig(max_batch=2, max_wait_ms=5.0),
        compute_dtype=jnp.float32,
    )
    assert pre is not None
    engine.start()
    server = http_serve(engine, host="127.0.0.1", port=0, block=False,
                        preprocessor=pre, class_names=names)
    port = server.server_address[1]
    try:
        bmp_path = tmp_path / "up.bmp"
        _write_bmp(str(bmp_path), np.random.default_rng(6).integers(
            0, 256, (240, 240, 3), dtype=np.uint8))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/classify",
            data=bmp_path.read_bytes(), method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert len(out["class_ids"]) == 5
        assert all(0.0 <= p <= 1.0 for p in out["probs"])
    finally:
        server.shutdown()
        engine.stop()


def test_jpeg_input_classify(family_ckpt, tmp_path, capsys):
    """JPEG/PNG inputs decode via PIL with the same BGR contract as the
    BMP decoder; classify CLI works on a .jpg end to end."""
    from PIL import Image

    from qcnn_tpu.cli import main
    from qcnn_tpu.preproc import TorchPreprocessor, read_image

    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
    jpg = str(tmp_path / "img.jpg")
    Image.fromarray(rgb).save(jpg, quality=95)
    png = str(tmp_path / "img.png")
    Image.fromarray(rgb).save(png)

    # PNG is lossless: decoded BGR must equal the source exactly
    bgr = read_image(png)
    np.testing.assert_array_equal(bgr, rgb[..., ::-1].astype(np.float32))

    # load_batch mixes formats transparently (native path is BMP-only and
    # must route around itself)
    bmp = str(tmp_path / "img.bmp")
    _write_bmp(bmp, rgb)
    pre = TorchPreprocessor.imagenet(crop=64, resize=72)
    out = pre.load_batch([bmp, jpg, png])
    assert out.shape == (3, 64, 64, 3)
    np.testing.assert_allclose(out[0], out[2], atol=1e-5)  # bmp == png

    assert main(["classify", "--checkpoint", family_ckpt, jpg,
                 "--top-k", "2"]) == 0
    assert "img.jpg:" in capsys.readouterr().out


def test_serve_jpeg_upload(family_ckpt, tmp_path):
    import json
    import urllib.request

    import jax.numpy as jnp
    from PIL import Image

    from qcnn_tpu.cli import family_engine_from_checkpoint
    from qcnn_tpu.serve.engine import EngineConfig
    from qcnn_tpu.serve.http import serve as http_serve

    engine, pre, names = family_engine_from_checkpoint(
        family_ckpt, EngineConfig(max_batch=2, max_wait_ms=5.0),
        compute_dtype=jnp.float32,
    )
    engine.start()
    server = http_serve(engine, host="127.0.0.1", port=0, block=False,
                        preprocessor=pre, class_names=names)
    port = server.server_address[1]
    try:
        rgb = np.random.default_rng(10).integers(
            0, 256, (240, 240, 3), dtype=np.uint8)
        jpg = tmp_path / "up.jpg"
        Image.fromarray(rgb).save(str(jpg), quality=90)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/classify",
            data=jpg.read_bytes(), method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert len(out["class_ids"]) == 5
    finally:
        server.shutdown()
        engine.stop()


def test_classify_dtype_flag(family_ckpt, tmp_path, capsys):
    """--dtype int8 = weight mode with bf16 ACTIVATIONS: predictions must
    agree with --dtype float32 on the same image (raw int8 activations
    would truncate the residual stream to garbage that still looks like a
    valid softmax — so assert agreement, not just well-formedness)."""
    from qcnn_tpu.cli import main

    bmp = str(tmp_path / "img.bmp")
    _write_bmp(bmp, np.random.default_rng(11).integers(
        0, 256, (230, 230, 3), dtype=np.uint8))
    tops = {}
    for dtype in ("float32", "int8"):
        assert main(["classify", "--checkpoint", family_ckpt, bmp,
                     "--top-k", "3", "--dtype", dtype]) == 0
        out = capsys.readouterr().out
        rows = [ln.split() for ln in out.splitlines()
                if ln.startswith("  ") and not ln.startswith("  ground")]
        assert len(rows) == 3
        assert all(0.0 <= float(r[0]) <= 1.0 for r in rows)
        tops[dtype] = [int(r[1]) for r in rows]
    # int8 weight quantization is near-lossless at these magnitudes:
    # top-1 must agree with f32
    assert tops["int8"][0] == tops["float32"][0], tops
