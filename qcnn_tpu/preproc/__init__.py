from qcnn_tpu.preproc.bmp import read_bmp  # noqa: F401
from qcnn_tpu.preproc.pipeline import (  # noqa: F401
    MeanType,
    Preprocessor,
    ReszType,
    TorchPreprocessor,
    center_crop,
    resize_bilinear,
    resize_bilinear_halfpixel,
)
