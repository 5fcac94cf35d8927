"""Pallas TPU kernels for the PQ hot path."""

from qcnn_tpu.ops.pallas.pq_fc import pq_fc_pallas

__all__ = ["pq_fc_pallas"]
