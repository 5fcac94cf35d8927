"""Pallas TPU kernels for the PQ hot path."""

from qcnn_tpu.ops.pallas.pq_fc import pq_fc_pallas
from qcnn_tpu.ops.pallas.pq_fc_fused import pq_fc_fused

__all__ = ["pq_fc_pallas", "pq_fc_fused"]
