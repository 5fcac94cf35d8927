"""Pallas TPU kernels for the PQ hot path (populated incrementally)."""


def pq_fc_pallas(x, params):  # pragma: no cover - replaced by real kernel
    raise NotImplementedError("Pallas pq_fc kernel lands in ops/pallas/pq_fc.py")
