"""Golden-file tests for the reference .bin/.cbn codec.

Oracle: the shipped quantized AlexNet files under
/root/reference/AlexNet/Bin.Files, whose shapes/bit-widths are documented in
SURVEY.md §2a (verified independently against include/FileIO.h's layout).
"""

import os

import numpy as np
import pytest

from qcnn_tpu.formats import (
    read_bin,
    write_bin,
    read_cbn,
    write_cbn,
    read_asmt,
    convert_asmt,
)
from qcnn_tpu.formats import reference_codec as rc

# (file number, ctrd shape (S,K,D), asmt shape, cbn bits) from SURVEY.md §2a.
ALEXNET_LAYERS = [
    ("01", (1, 128, 8), (96, 11, 11, 1), 7),
    ("05", (6, 128, 8), (256, 5, 5, 6), 7),
    ("09", (32, 128, 8), (384, 3, 3, 32), 7),
    ("11", (24, 128, 8), (384, 3, 3, 24), 7),
    ("13", (24, 128, 8), (256, 3, 3, 24), 7),
    ("16", (2304, 32, 4), None, None),  # asmt blob not shipped
    ("19", (1024, 32, 4), (4096, 1024), 5),
    ("22", (4096, 16, 1), (1000, 4096), 4),
]


class TestGoldenAlexNet:
    @pytest.mark.parametrize("num,ctrd_shape,asmt_shape,bits", ALEXNET_LAYERS)
    def test_ctrd_shapes(self, alexnet_bin_dir, num, ctrd_shape, asmt_shape, bits):
        path = os.path.join(alexnet_bin_dir, f"bvlc_alexnet_aCaF.ctrdLst.{num}.bin")
        ctrd = read_bin(path, np.float32)
        assert ctrd.shape == ctrd_shape
        assert np.isfinite(ctrd).all()
        # codebooks of trained layers should not be degenerate
        assert ctrd.std() > 1e-4

    @pytest.mark.parametrize("num,ctrd_shape,asmt_shape,bits", ALEXNET_LAYERS)
    def test_asmt_shapes_and_range(
        self, alexnet_bin_dir, num, ctrd_shape, asmt_shape, bits
    ):
        if asmt_shape is None:
            pytest.skip("asmtLst.16 is a missing large blob upstream")
        path = os.path.join(alexnet_bin_dir, f"bvlc_alexnet_aCaF.asmtLst.{num}.cbn")
        asmt = read_cbn(path)
        assert asmt.shape == asmt_shape
        assert asmt.dtype == np.uint8
        K = ctrd_shape[1]
        assert int(asmt.max()) < K
        assert int(asmt.max()) >= (1 << (bits - 1))  # bits is minimal
        # healthy codeword usage: a trained layer should use most codewords
        assert len(np.unique(asmt)) > K // 2

    def test_bias_shapes(self, alexnet_bin_dir):
        expected = {
            "01": 96, "05": 256, "09": 384, "11": 384,
            "13": 256, "16": 4096, "19": 4096, "22": 1000,
        }
        for num, n in expected.items():
            path = os.path.join(
                alexnet_bin_dir, f"bvlc_alexnet_aCaF.biasVec.{num}.bin"
            )
            bias = read_bin(path, np.float32)
            assert bias.size == n
            assert np.isfinite(bias).all()

    def test_mean_image(self, reference_dir):
        mean = read_bin(
            os.path.join(reference_dir, "AlexNet", "imagenet_mean.single.bin"),
            np.float32,
        )
        assert mean.shape == (3, 256, 256)
        # ImageNet mean pixel values are ~100-130 in each BGR channel
        assert 80 < mean.mean() < 160

    def test_label_vector(self, reference_dir):
        labels = read_bin(
            os.path.join(reference_dir, "ILSVRC12.227x227.IMG", "lablVecTst.uint16.bin"),
            np.uint16,
        )
        assert labels.size == 1000
        assert int(labels.max()) < 1000

    def test_cbn_file_size_model(self, alexnet_bin_dir):
        """File sizes must match the page-padding model exactly."""
        for num, ctrd_shape, asmt_shape, bits in ALEXNET_LAYERS:
            if asmt_shape is None:
                continue
            path = os.path.join(
                alexnet_bin_dir, f"bvlc_alexnet_aCaF.asmtLst.{num}.cbn"
            )
            n = int(np.prod(asmt_shape))
            per_page = (rc.PAGE_BYTES * 8) // bits
            n_pages = -(-n // per_page)
            header = 4 + 4 * len(asmt_shape) + 4
            assert os.path.getsize(path) == header + n_pages * rc.PAGE_BYTES


class TestRoundTrip:
    def test_bin_roundtrip(self, tmp_path, rng):
        for dtype in (np.float32, np.uint8, np.uint16, np.int32):
            arr = (rng.random((3, 5, 7)) * 100).astype(dtype)
            p = tmp_path / f"t_{np.dtype(dtype).name}.bin"
            write_bin(p, arr)
            out = read_bin(p, dtype)
            np.testing.assert_array_equal(out, arr)

    @pytest.mark.parametrize("bits", [1, 2, 3, 4, 5, 6, 7, 8])
    def test_cbn_roundtrip_all_widths(self, tmp_path, rng, bits):
        n = 10_001  # not a multiple of any page capacity
        arr = rng.integers(0, 1 << bits, size=n, dtype=np.uint8).reshape(-1)
        p = tmp_path / f"t{bits}.cbn"
        used_bits = write_cbn(p, arr)
        assert used_bits <= bits
        out = read_cbn(p)
        np.testing.assert_array_equal(out.reshape(-1), arr)

    def test_cbn_reencode_golden_identical(self, alexnet_bin_dir, tmp_path):
        """Re-encoding a shipped .cbn must reproduce it bit-for-bit
        (same page layout as FileIO::WriteCbnFile)."""
        src = os.path.join(alexnet_bin_dir, "bvlc_alexnet_aCaF.asmtLst.01.cbn")
        asmt = read_cbn(src)
        dst = tmp_path / "re.cbn"
        write_cbn(dst, asmt, bits=7)
        with open(src, "rb") as f:
            golden = f.read()
        with open(dst, "rb") as f:
            ours = f.read()
        assert ours == golden

    def test_convert_asmt_roundtrip(self, alexnet_bin_dir, tmp_path):
        src = os.path.join(alexnet_bin_dir, "bvlc_alexnet_aCaF.asmtLst.05.cbn")
        raw = tmp_path / "a.bin"
        back = tmp_path / "a.cbn"
        convert_asmt(src, raw)
        # raw .bin stores 1-based values
        assert read_bin(raw, np.uint8).min() >= 1
        convert_asmt(raw, back)
        np.testing.assert_array_equal(read_cbn(back), read_cbn(src))
        np.testing.assert_array_equal(read_asmt(raw), read_cbn(src))

    def test_convert_asmt_rejects_k256_to_bin(self, tmp_path):
        """Round-5 review regression: index 255 stored 1-based in uint8
        would wrap to 0 (silent corruption) — the raw encoding's format
        ceiling must be an error, not a wrap."""
        from qcnn_tpu.formats.reference_codec import write_cbn

        src = tmp_path / "k256.cbn"
        vals = np.array([0, 17, 255], np.uint8).reshape(3, 1)
        write_cbn(src, vals)
        with pytest.raises(ValueError, match="uint8 .bin"):
            convert_asmt(src, tmp_path / "k256.bin")
        # .cbn -> .cbn stays legal at K=256
        convert_asmt(src, tmp_path / "copy.cbn")
        np.testing.assert_array_equal(
            read_cbn(tmp_path / "copy.cbn"), vals)


class TestNativeCodecParity:
    def test_native_matches_numpy(self, rng):
        from qcnn_tpu.formats import native

        lib = native.get_lib()
        if lib is None:
            pytest.skip("native codec unavailable (no g++?)")
        for bits in (3, 5, 7, 8):
            n = 50_000
            vals = rng.integers(0, 1 << bits, size=n, dtype=np.uint32)
            pages_native = lib.pack_pages(vals, bits)
            pages_numpy = rc._pack_pages_numpy(vals, bits)
            np.testing.assert_array_equal(pages_native, pages_numpy)
            out_native = lib.unpack_pages(pages_native, n, bits)
            out_numpy = rc._unpack_pages_numpy(pages_native, n, bits)
            np.testing.assert_array_equal(out_native, out_numpy)
            np.testing.assert_array_equal(out_native, vals)


class TestStreamingRead:
    def test_read_bin_batches_matches_read_bin(self, rng, tmp_path):
        """Chunked streaming must reproduce the whole-tensor read exactly,
        including a ragged final batch (10 rows, chunks of 4 -> 4+4+2)."""
        arr = rng.standard_normal((10, 3, 5, 7)).astype(np.float32)
        path = str(tmp_path / "t.bin")
        rc.write_bin(path, arr)
        chunks = list(rc.read_bin_batches(path, np.float32, 4))
        assert [c.shape[0] for c in chunks] == [4, 4, 2]
        assert all(c.shape[1:] == arr.shape[1:] for c in chunks)
        np.testing.assert_array_equal(np.concatenate(chunks), arr)

    def test_read_bin_batches_1d(self, rng, tmp_path):
        labels = rng.integers(0, 1000, 9).astype(np.uint16)
        path = str(tmp_path / "l.bin")
        rc.write_bin(path, labels)
        chunks = list(rc.read_bin_batches(path, np.uint16, 5))
        np.testing.assert_array_equal(np.concatenate(chunks), labels)


class TestTxtCodec:
    """The .txt debug/interchange format (ReadTxtFile/WriteTxtFile,
    FileIO.h:180-227, :353-391): header line `dim_cnt dims...`, then one
    space-separated line per trailing-dim row; floats print as %.4f."""

    def test_int_roundtrip_exact(self, tmp_path, rng):
        arr = rng.integers(0, 200, size=(5, 3, 7)).astype(np.int32)
        p = tmp_path / "t.txt"
        rc.write_txt(p, arr)
        got = rc.read_txt(p, np.int32)
        assert got.dtype == np.int32
        np.testing.assert_array_equal(got, arr)

    def test_float_roundtrip_at_format_precision(self, tmp_path, rng):
        arr = rng.standard_normal((4, 6)).astype(np.float32)
        p = tmp_path / "t.txt"
        rc.write_txt(p, arr)
        got = rc.read_txt(p, np.float32)
        # %.4f quantizes to 1e-4 steps — the reference's lossy debug format
        np.testing.assert_allclose(got, arr, atol=5.1e-5)

    def test_line_structure_matches_reference(self, tmp_path):
        """One header line + one line per trailing-dim row (the fprintf
        newline rule at FileIO.h:381-382)."""
        arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
        p = tmp_path / "t.txt"
        rc.write_txt(p, arr)
        lines = p.read_text().splitlines()
        assert lines[0] == "3 2 3 4"
        assert len(lines) == 1 + 2 * 3
        assert lines[1] == "0.0000 1.0000 2.0000 3.0000"

    def test_golden_shipped_bias_roundtrip(self, alexnet_bin_dir, tmp_path):
        """Write/read a shipped tensor through .txt: values survive to the
        format's %.4f precision."""
        src = os.path.join(alexnet_bin_dir, "bvlc_alexnet_aCaF.biasVec.01.bin")
        bias = read_bin(src, np.float32)
        p = tmp_path / "bias.txt"
        rc.write_txt(p, bias)
        got = rc.read_txt(p, np.float32)
        assert got.shape == bias.shape
        np.testing.assert_allclose(got, bias, atol=5.1e-5)

    def test_header_mismatch_raises(self, tmp_path):
        p = tmp_path / "bad.txt"
        p.write_text("2 2 3\n1 2 3\n")  # promises 6, provides 3
        with pytest.raises(ValueError, match="promises 6"):
            rc.read_txt(p, np.int32)
