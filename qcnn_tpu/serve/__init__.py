"""Serving: continuous-batching engine + HTTP front end."""

from qcnn_tpu.serve.engine import (
    BatchingEngine, DeadlineExceeded, EngineConfig, EngineOverloaded,
)

__all__ = ["BatchingEngine", "DeadlineExceeded", "EngineConfig",
           "EngineOverloaded"]
