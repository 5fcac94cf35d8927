"""The armed ILSVRC accuracy trap (round-4 verdict item 8).

The reference prints ACCURACY@1..5 over the first 100 val images
(CaffeEva.cc:290-294) from two download-only blobs this rig lacks
(`.MISSING_LARGE_BLOBS`): the fc6 assignments
(AlexNet/Bin.Files/bvlc_alexnet_aCaF.asmtLst.16.cbn) and the val tensor
(ILSVRC12.227x227.IMG/dataMatTst.single.bin). The moment those land in any
environment, `pytest tests/test_accuracy_trap.py` proves end-to-end
accuracy parity with zero code changes:

- the streaming eval runs the REAL weights (no synthesis) over the real
  val blob and asserts the CVPR'16 claim (top-5 within ~1% of AlexNet's
  ~79.9% -> we assert >= 0.75 with margin, and top-1 >= 0.45);
- the same machinery is exercised HERE against a small synthetic blob in
  the exact val-set format, so the trap itself cannot rot.
"""

import os
import re
import shutil

import numpy as np
import pytest

REF = os.environ.get("QCNN_REFERENCE_DIR", "/root/reference")
FC6_ASMT = os.path.join(
    REF, "AlexNet", "Bin.Files", "bvlc_alexnet_aCaF.asmtLst.16.cbn")
VAL_DATA = os.path.join(REF, "ILSVRC12.227x227.IMG", "dataMatTst.single.bin")
VAL_LABL = os.path.join(REF, "ILSVRC12.227x227.IMG", "lablVecTst.uint16.bin")


def run_streaming_eval(reference_dir, limit, batch, capsys):
    """Drive the exact CLI dataset-eval flow and parse its ACCURACY@k
    printout (the reference's output contract)."""
    from qcnn_tpu.cli import main

    rc = main(["eval", "--reference-dir", reference_dir,
               "--batch", str(batch), "--limit", str(limit)])
    assert rc == 0
    out = capsys.readouterr().out
    acc = {
        int(m.group(1)): float(m.group(2))
        for m in re.finditer(r"ACCURACY@(\d): ([0-9.]+)", out)
    }
    assert sorted(acc) == [1, 2, 3, 4, 5], f"printout malformed:\n{out}"
    # top-k accuracy is monotone in k by construction
    assert all(acc[k] <= acc[k + 1] + 1e-9 for k in range(1, 5))
    return acc, out


@pytest.mark.skipif(
    not (os.path.exists(FC6_ASMT) and os.path.exists(VAL_DATA)
         and os.path.exists(VAL_LABL)),
    reason="upstream download-only blobs absent (.MISSING_LARGE_BLOBS): "
           "fc6 assignments + dataMatTst val tensor — the trap arms "
           "automatically when they exist",
)
def test_real_ilsvrc_accuracy(capsys):
    # the real fc6 blob must make synthesis unnecessary — a synthesized
    # layer would make the numbers meaningless (docs/ROADMAP.md)
    from qcnn_tpu.models.loader import load_alexnet_reference

    res = load_alexnet_reference(REF, synthesize_missing=False)
    assert res.synthesized_layers == []

    # 100 images: the reference's own UT_CaffeEva sample (UnitTest.cc:27-65)
    acc, out = run_streaming_eval(REF, limit=100, batch=50, capsys=capsys)
    # CVPR'16: <=~1% top-1/top-5 loss vs FP32 AlexNet (57.1/80.2%); generous
    # margins for the 100-image sample's variance
    assert acc[5] >= 0.75, f"top-5 parity broken: {acc}\n{out}"
    assert acc[1] >= 0.45, f"top-1 parity broken: {acc}\n{out}"


@pytest.mark.skipif(
    not (os.path.isdir(os.path.join(REF, "AlexNet"))
         and os.path.isdir(os.path.join(REF, "Cls.Names"))),
    reason="reference AlexNet/Cls.Names assets not present",
)
def test_trap_machinery_on_synthetic_valset(tmp_path, capsys):
    """Exercise the identical flow on a synthetic val blob so the trap is
    verified runnable in THIS environment (verdict item 8's 'exercised'
    requirement). Skips (not errors) on checkouts without the reference
    tree — the same portability contract as the real-blob trap."""
    from qcnn_tpu.formats import write_bin

    fake = tmp_path / "ref"
    (fake / "ILSVRC12.227x227.IMG").mkdir(parents=True)
    (fake / "Cls.Names").mkdir()
    shutil.copytree(os.path.join(REF, "AlexNet"), fake / "AlexNet")
    for f in ("class_names.txt", "image_labels.txt"):
        shutil.copy(os.path.join(REF, "Cls.Names", f),
                    fake / "Cls.Names" / f)
    rng = np.random.default_rng(7)
    # 12 images in the val-set format: (N, 3, 227, 227) f32 + uint16 labels
    write_bin(str(fake / "ILSVRC12.227x227.IMG" / "dataMatTst.single.bin"),
              rng.standard_normal((12, 3, 227, 227)).astype(np.float32))
    write_bin(str(fake / "ILSVRC12.227x227.IMG" / "lablVecTst.uint16.bin"),
              rng.integers(0, 1000, 12).astype(np.uint16))
    acc, out = run_streaming_eval(str(fake), limit=12, batch=5,
                                  capsys=capsys)
    assert "12 images" in out
    # random inputs + synthesized fc6: probabilities are input-independent;
    # the assertion is the format + plumbing, not the values
    assert 0.0 <= acc[1] <= acc[5] <= 1.0
