"""Device mesh construction and axis conventions.

The reference is single-process/single-thread (SURVEY.md §2b); parallelism is
a new first-class subsystem here. Axis names:

- ``data``  : batch dimension (data parallelism; the reference's per-image
              loop CaffeEva.cc:167-210 becomes a sharded batch axis).
- ``model`` : tensor parallelism — FC output channels (column-parallel) or
              PQ sub-spaces (row-parallel LUT sharding) across ICI.

There is no sequence/pipeline axis: the workload is a 23-layer CNN where the
only big dimensions are batch and output channels (SURVEY.md §5).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    *,
    dp: Optional[int] = None,
    tp: Optional[int] = None,
) -> Mesh:
    """Build a (data, model) mesh over the given devices.

    Defaults: all devices on the data axis (pure DP) unless dp/tp given.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None and tp is None:
        dp, tp = n, 1
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != device count {n}")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Activations sharded over batch on the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
