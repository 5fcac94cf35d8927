"""Serving: continuous-batching engine + HTTP front end."""

from qcnn_tpu.serve.engine import BatchingEngine, EngineConfig

__all__ = ["BatchingEngine", "EngineConfig"]
