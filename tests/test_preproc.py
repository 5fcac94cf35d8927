"""Preprocessing tests: BMP decode against an independently constructed file,
resize against a NumPy loop transcription of the reference's bilinear, and the
end-to-end AlexNet preprocessing on the shipped validation BMPs."""

import os

import numpy as np
import pytest

from qcnn_tpu.preproc import (
    MeanType,
    Preprocessor,
    ReszType,
    center_crop,
    read_bmp,
    resize_bilinear,
)


def _write_bmp24(path, img_bgr):
    """Write a bottom-up 24-bpp BMP (shared encoder, preproc/bmp.py)."""
    from qcnn_tpu.preproc.bmp import encode_bmp24

    with open(path, "wb") as f:
        f.write(encode_bmp24(img_bgr, input_order="bgr"))

def np_resize_reference(img, out_h, out_w, relaxed=False):
    """Loop transcription of ReszImg (BmpImgIO.cc:105-178)."""
    h, w, c = img.shape
    sh = (h - 1) / (out_h - 1)
    sw = (w - 1) / (out_w - 1)
    if relaxed:
        sh = sw = min(sh, sw)
        out_h = int((h - 1) / sh + 1e-7) + 1
        out_w = int((w - 1) / sw + 1e-7) + 1
    out = np.zeros((out_h, out_w, c), np.float32)
    for i in range(out_h):
        ch = sh * i
        lo_h = max(0, int(ch))
        hi_h = min(h - 1, lo_h + 1)
        wlh, whh = 1.0 - (ch - lo_h), 1.0 - (hi_h - ch)
        for j in range(out_w):
            cw = sw * j
            lo_w = max(0, int(cw))
            hi_w = min(w - 1, lo_w + 1)
            wlw, whw = 1.0 - (cw - lo_w), 1.0 - (hi_w - cw)
            num = (
                img[lo_h, lo_w] * (wlh * wlw)
                + img[lo_h, hi_w] * (wlh * whw)
                + img[hi_h, lo_w] * (whh * wlw)
                + img[hi_h, hi_w] * (whh * whw)
            )
            den = wlh * wlw + wlh * whw + whh * wlw + whh * whw
            out[i, j] = num / den
    return out


class TestBmp:
    def test_roundtrip_synthetic(self, tmp_path, rng):
        img = rng.integers(0, 256, size=(13, 7, 3)).astype(np.float32)
        p = tmp_path / "t.bmp"
        _write_bmp24(p, img)
        out = read_bmp(str(p))
        np.testing.assert_array_equal(out, img)

    def test_shipped_bmps_decode(self, reference_dir):
        bmp_dir = os.path.join(reference_dir, "Bmp.Files")
        for name in sorted(os.listdir(bmp_dir))[:3]:
            img = read_bmp(os.path.join(bmp_dir, name))
            h, w, c = img.shape
            assert c == 3 and h > 100 and w > 100
            assert 0 <= img.min() and img.max() <= 255


class TestResize:
    @pytest.mark.parametrize("shape,target", [((37, 53), (25, 25)), ((20, 20), (31, 31))])
    def test_strict_matches_reference_loop(self, rng, shape, target):
        img = rng.random((*shape, 3)).astype(np.float32) * 255
        want = np_resize_reference(img, *target)
        got = resize_bilinear(img, *target, ReszType.STRICT)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def test_relaxed_matches_reference_loop(self, rng):
        img = rng.random((40, 60, 3)).astype(np.float32) * 255
        want = np_resize_reference(img, 25, 25, relaxed=True)
        got = resize_bilinear(img, 25, 25, ReszType.RELAXED)
        assert got.shape == want.shape
        # relaxed keeps aspect: 40x60 with min scale -> larger axis stretches
        assert got.shape[0] >= 25 and got.shape[1] >= 25
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def test_identity_resize(self, rng):
        img = rng.random((16, 16, 3)).astype(np.float32)
        out = resize_bilinear(img, 16, 16)
        np.testing.assert_allclose(out, img, rtol=1e-6)


class TestPipeline:
    def test_alexnet_pipeline_on_shipped_images(self, reference_dir):
        pre = Preprocessor.alexnet(
            os.path.join(reference_dir, "AlexNet", "imagenet_mean.single.bin")
        )
        assert pre.mean_image.shape == (256, 256, 3)
        bmp = os.path.join(
            reference_dir, "Bmp.Files", "ILSVRC2012_val_00000001.BMP"
        )
        x = pre.load(bmp)
        assert x.shape == (1, 227, 227, 3)
        assert x.dtype == np.float32
        # mean-subtracted: roughly centred, well inside [-255, 255]
        assert -200 < x.mean() < 200
        assert abs(x.mean()) < 100

    def test_center_crop(self, rng):
        img = rng.random((10, 12, 3)).astype(np.float32)
        out = center_crop(img, 6, 6)
        np.testing.assert_array_equal(out, img[2:8, 3:9])

    def test_mean_crop_policy(self, rng):
        mean = rng.random((32, 32, 3)).astype(np.float32)
        pre = Preprocessor(
            full_h=32, full_w=32, crop_h=24, crop_w=24,
            resz_type=ReszType.STRICT, mean_type=MeanType.CROP,
            mean_image=mean,
        )
        img = rng.random((64, 48, 3)).astype(np.float32) * 255
        out = pre(img)
        assert out.shape == (24, 24, 3)
