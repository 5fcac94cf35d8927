from qcnn_tpu.ops.lut import (  # noqa: F401
    build_lut,
    decode_fc_weight,
    decode_conv_kernel,
    assignments_one_hot,
    pad_features,
)
from qcnn_tpu.ops.fc import fc_dense, pq_fc  # noqa: F401
from qcnn_tpu.ops.conv import conv_dense, pq_conv  # noqa: F401
from qcnn_tpu.ops.misc import (  # noqa: F401
    caffe_max_pool,
    lrn,
    relu,
    softmax,
    dropout_inference,
)
