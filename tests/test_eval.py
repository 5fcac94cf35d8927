"""End-to-end classification + accuracy harness tests.

UT_CaffeEvaWrapper analogue (UnitTest.cc:67-124): classify the shipped
validation BMPs through the full pipeline. Prediction *correctness* cannot be
asserted because the fc6 assignment blob is missing upstream and is
synthesized; these tests pin down pipeline mechanics, determinism, and the
accuracy arithmetic.
"""

import os

import numpy as np
import pytest

from qcnn_tpu.eval import Classifier, accuracy_at_k


class TestAccuracyAtK:
    def test_exact_values(self):
        probs = np.array(
            [
                [0.1, 0.5, 0.4],   # top-1 = 1, top-2 = {1, 2}
                [0.7, 0.2, 0.1],   # top-1 = 0
            ]
        )
        labels = np.array([2, 0])
        acc = accuracy_at_k(probs, labels, ks=(1, 2, 3))
        assert acc[1] == 0.5   # only example 2 hit at k=1
        assert acc[2] == 1.0   # example 1's label 2 enters at k=2
        assert acc[3] == 1.0

    def test_monotone_in_k(self, rng):
        probs = rng.random((50, 10))
        labels = rng.integers(0, 10, 50)
        acc = accuracy_at_k(probs, labels)
        vals = [acc[k] for k in sorted(acc)]
        assert vals == sorted(vals)


@pytest.fixture(scope="module")
def classifier(reference_dir):
    return Classifier.from_reference(
        "alexnet",
        reference_dir,
        class_names_path=os.path.join(reference_dir, "Cls.Names", "class_names.txt"),
        image_labels_path=os.path.join(reference_dir, "Cls.Names", "image_labels.txt"),
        synthesize_missing=True,
    )


class TestClassifier:
    def test_classify_shipped_bmp(self, classifier, reference_dir):
        bmp = os.path.join(
            reference_dir, "Bmp.Files", "ILSVRC2012_val_00000002.BMP"
        )
        res = classifier.classify(bmp, top_k=5)
        assert len(res.class_ids) == 5
        assert len(set(res.class_ids)) == 5
        assert all(0 <= i < 1000 for i in res.class_ids)
        # probabilities sorted descending, in (0, 1]
        assert res.probs == sorted(res.probs, reverse=True)
        assert 0 < res.probs[0] <= 1
        assert res.ground_truth is not None  # shipped labels cover val images
        assert len(classifier.class_names) == 1000

    def test_classify_deterministic(self, classifier, reference_dir):
        bmp = os.path.join(
            reference_dir, "Bmp.Files", "ILSVRC2012_val_00000003.BMP"
        )
        r1 = classifier.classify(bmp)
        r2 = classifier.classify(bmp)
        assert r1.class_ids == r2.class_ids
        np.testing.assert_allclose(r1.probs, r2.probs, rtol=1e-6)

    def test_synthesis_manifest_exposed(self, classifier):
        # fc6 is synthesized → accuracy must be reported as non-authentic
        assert classifier.load_result.synthesized_layers == [15]
        assert not classifier.load_result.is_authentic


def test_classifier_int8_mode(reference_dir):
    """Classifier with compute_dtype=int8: weights quantize per-channel,
    activations ride bf16, predictions still produced."""
    import os

    import jax.numpy as jnp
    import numpy as np

    from qcnn_tpu.eval.harness import Classifier

    clf = Classifier.from_reference(
        "alexnet", reference_dir, compute_dtype=jnp.int8,
    )
    assert any(
        p is not None and ("weight_q" in p or "kernel_q" in p)
        for p in clf.params
    )
    bmp = os.path.join(
        reference_dir, "Bmp.Files", "ILSVRC2012_val_00000001.BMP"
    )
    res = clf.classify(bmp)
    assert len(res.class_ids) == 5
    assert np.isfinite(res.probs).all()
