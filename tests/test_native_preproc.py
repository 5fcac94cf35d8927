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
