from qcnn_tpu.quantizer.kmeans import (  # noqa: F401
    KMeansResult,
    kmeans_step,
    subspace_kmeans,
)
from qcnn_tpu.quantizer.pq import (  # noqa: F401
    PQResult,
    quantize_conv_layer,
    quantize_error_corrected,
    quantize_fc_layer,
    quantize_input_weighted,
    quantize_plain,
)
from qcnn_tpu.quantizer.opq import (  # noqa: F401
    inverse_permutation,
    variance_permutation,
)
