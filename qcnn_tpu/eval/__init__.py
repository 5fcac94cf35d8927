from qcnn_tpu.eval.harness import (  # noqa: F401
    Classifier,
    ClassifyResult,
    FamilyClassifier,
    accuracy_at_k,
    evaluate_dataset,
)
