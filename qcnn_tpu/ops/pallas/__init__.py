"""Pallas TPU kernels for the PQ hot path."""

from qcnn_tpu.ops.pallas.pq_conv_fused import pq_conv_fused
from qcnn_tpu.ops.pallas.pq_decode import (
    decode_conv_kernel_gather,
    decode_fc_weight_gather,
)
from qcnn_tpu.ops.pallas.pq_fc import pq_fc_pallas
from qcnn_tpu.ops.pallas.pq_fc_fused import pq_fc_fused
from qcnn_tpu.ops.pallas.pq_lut_gather import pq_fc_lut_gather

__all__ = [
    "decode_conv_kernel_gather",
    "decode_fc_weight_gather",
    "pq_conv_fused",
    "pq_fc_pallas",
    "pq_fc_fused",
    "pq_fc_lut_gather",
]
