from qcnn_tpu.preproc.bmp import (  # noqa: F401
    decode_image,
    read_bmp,
    read_image,
)
from qcnn_tpu.preproc.pipeline import (  # noqa: F401
    MeanType,
    Preprocessor,
    ReszType,
    TorchPreprocessor,
    center_crop,
    resize_bilinear,
    resize_bilinear_halfpixel,
)
