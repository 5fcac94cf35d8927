"""Native C++ preprocessing pipeline: parity with the NumPy reference path."""

import glob
import os
import time

import numpy as np
import pytest

from qcnn_tpu.preproc import native
from qcnn_tpu.preproc.pipeline import MeanType, Preprocessor, ReszType


@pytest.fixture(scope="module")
def bmps(reference_dir):
    paths = sorted(
        glob.glob(os.path.join(reference_dir, "Bmp.Files", "*.BMP"))
    )
    if not paths:
        pytest.skip("no BMP fixtures")
    return paths


@pytest.fixture(scope="module")
def native_lib():
    if not native.available():
        pytest.skip("g++ unavailable; native imgproc not built")
    return True


def _pre(resz, meantype, rng):
    mean = rng.standard_normal((256, 256, 3)).astype(np.float32)
    return Preprocessor(
        full_h=256, full_w=256, crop_h=227, crop_w=227,
        resz_type=resz, mean_type=meantype, mean_image=mean,
    )


def test_strict_full_parity(bmps, native_lib, rng):
    pre = _pre(ReszType.STRICT, MeanType.FULL, rng)
    got = pre.load_batch(bmps, native="require")
    want = pre.load_batch(bmps, native="never")
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_relaxed_crop_parity(bmps, native_lib, rng):
    mean = rng.standard_normal((256, 256, 3)).astype(np.float32)
    pre = Preprocessor(
        full_h=256, full_w=256, crop_h=224, crop_w=224,
        resz_type=ReszType.RELAXED, mean_type=MeanType.CROP,
        mean_image=mean,
    )
    got = pre.load_batch(bmps, native="require")
    want = pre.load_batch(bmps, native="never")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_bad_blob_counts_as_failure(native_lib, rng):
    mean = np.zeros((256, 256, 3), np.float32)
    out, failures = native.preproc_batch(
        [b"not a bmp at all"],
        full_h=256, full_w=256, crop_h=227, crop_w=227,
        relaxed=False, mean_hwc=mean, mean_full=True,
    )
    assert failures == 1
    assert np.all(out == 0)


def _bmp_with_dims(width: int, height: int, payload: bytes = b"") -> bytes:
    """Minimal BMP header with attacker-controlled dimension fields."""
    import struct

    header = bytearray(54)
    header[0:2] = b"BM"
    struct.pack_into("<I", header, 10, 54)       # pixel offset
    struct.pack_into("<I", header, 14, 40)       # BITMAPINFOHEADER size
    struct.pack_into("<i", header, 18, width)
    struct.pack_into("<i", header, 22, height)
    struct.pack_into("<H", header, 28, 24)       # bpp
    struct.pack_into("<I", header, 30, 0)        # BI_RGB
    return bytes(header) + payload


def test_hostile_dimensions_rejected(native_lib):
    """Dimension fields that would overflow the int64 bounds check (or
    allocate absurd buffers) must count as decode failures, not crash the
    worker thread or read out of bounds (ADVICE.md round-1, imgproc.cc)."""
    mean = np.zeros((256, 256, 3), np.float32)
    hostile = [
        _bmp_with_dims(2**31 - 1, 2**31 - 1),    # row_bytes*height overflows
        _bmp_with_dims(2**31 - 1, -(2**31)),     # abs(INT32_MIN) is UB
        _bmp_with_dims(1 << 20, 4),              # too wide, plausible total
        _bmp_with_dims(4, 1 << 20),              # too tall
        _bmp_with_dims(16, 0),                   # zero height
        _bmp_with_dims(100, 100, b"\0" * 64),    # sane dims, truncated data
    ]
    out, failures = native.preproc_batch(
        hostile,
        full_h=256, full_w=256, crop_h=227, crop_w=227,
        relaxed=False, mean_hwc=mean, mean_full=True,
    )
    assert failures == len(hostile)
    assert np.all(out == 0)


def test_native_is_faster_batch(bmps, native_lib, rng):
    """Sanity: threaded C++ beats the NumPy loop on a real batch (not a
    strict perf assertion — just catches accidental pessimization)."""
    pre = _pre(ReszType.STRICT, MeanType.FULL, rng)
    batch = bmps * 4
    t0 = time.perf_counter()
    pre.load_batch(batch, native="require")
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    pre.load_batch(batch, native="never")
    t_numpy = time.perf_counter() - t0
    print(f"native {t_native*1e3:.1f} ms vs numpy {t_numpy*1e3:.1f} ms")
    assert t_native < t_numpy * 2.0


def test_torch_transform_parity(bmps, native_lib):
    """qcnn_preproc_batch_torch vs the NumPy TorchPreprocessor path on the
    shipped BMPs (several aspect ratios): same taps, same normalize."""
    from qcnn_tpu.preproc.pipeline import TorchPreprocessor

    pre = TorchPreprocessor.imagenet(crop=224, resize=256)
    got = pre.load_batch(bmps, native="require")
    want = pre.load_batch(bmps, native="never")
    assert got.shape == want.shape == (len(bmps), 224, 224, 3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_torch_transform_hostile_input(native_lib):
    """Hostile/truncated inputs raise ValueError, never crash. Since the
    round-5 fallback (native failures re-route the batch to NumPy so the
    bounded C++ decoder's tighter limits cannot fail valid images
    environment-dependently), the NumPy decoder is the arbiter — truly
    invalid images raise ITS per-image ValueError."""
    from qcnn_tpu.preproc.pipeline import TorchPreprocessor

    pre = TorchPreprocessor.imagenet()
    with pytest.raises(ValueError, match="truncated pixel data"):
        pre.process_blobs([_bmp_with_dims(2**31 - 1, 40),
                           _bmp_with_dims(100, 100, b"\0" * 8)])
    with pytest.raises(ValueError, match="undecodable image"):
        pre.process_blobs([b"not an image at all"])
    # a width the C++ decoder's hostile-input bound rejects (> 65536) but
    # NumPy can decode must NOT fail the batch wholesale — it decodes
    # through the fallback (round-5 review: environment-dependent
    # result). Checked on the STRICT-resize Caffe pipeline so the
    # oversized axis collapses to a fixed 256x256 (the torch transform's
    # aspect-preserving resize would materialize a GB-scale panorama).
    from qcnn_tpu.preproc.bmp import encode_bmp24
    from qcnn_tpu.preproc.pipeline import (
        MeanType, Preprocessor, ReszType,
    )

    cafpre = Preprocessor(
        full_h=256, full_w=256, crop_h=227, crop_w=227,
        resz_type=ReszType.STRICT, mean_type=MeanType.FULL,
        mean_image=np.zeros((256, 256, 3), np.float32),
    )
    wide = np.zeros((8, 66000, 3), np.uint8)
    out = cafpre.process_blobs([encode_bmp24(wide, input_order="rgb")])
    assert out is not None and out.shape == (1, 227, 227, 3)


def test_torch_transform_orientations(native_lib, rng):
    """Synthetic portrait / tiny / square BMPs: the aspect-preserving
    shorter-side sizing and round-half-to-even must match NumPy in both
    orientations (the shipped fixtures do not cover h > w)."""
    import struct

    from qcnn_tpu.preproc.pipeline import TorchPreprocessor

    def write_bmp_bytes(rgb):
        from qcnn_tpu.preproc.bmp import encode_bmp24

        return encode_bmp24(rgb, input_order="rgb")

    pre = TorchPreprocessor.imagenet(crop=96, resize=112)
    blobs = [
        write_bmp_bytes(
            (rng.standard_normal((h, w, 3)) * 60 + 128).clip(0, 255)
            .astype(np.uint8))
        for h, w in [(480, 320), (320, 480), (112, 112), (97, 301),
                     (301, 97), (100, 100)]
    ]
    got = pre.process_blobs(blobs)
    from qcnn_tpu.preproc.bmp import decode_bmp

    want = np.stack([pre(decode_bmp(b)) for b in blobs])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
