"""Explicit-collective tensor-parallel PQ ops via shard_map.

parallel/sharding.py expresses tensor parallelism as NamedShardings and lets
GSPMD insert collectives. This module is the manual-control counterpart —
shard_map with explicit psum/all_gather — for when the schedule matters
(e.g. overlapping the sub-space partial-sum reduction with the next layer's
compute) and as the executable specification of what the GSPMD path must do:

- row-parallel PQ FC: codebooks/assignments sharded over the sub-space axis;
  each device LUT-builds and gather-accumulates its S/TP sub-spaces; one
  psum over `model` yields the output (Megatron row-parallel, contraction
  sharded).
- column-parallel PQ FC: assignments sharded over output channels; each
  device computes its Cout/TP slice; all_gather over `model` restores the
  full activation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from qcnn_tpu.ops import fc as fc_ops
from qcnn_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def row_parallel_pq_fc(mesh: Mesh, *, impl: str = "onehot"):
    """Build fn(x, codebooks, assignments, bias) with codebooks (S,K,D) and
    assignments (Cout,S) sharded over S on the `model` axis; x batch-sharded
    on `data`. Returns replicated-over-model output.

    Zero-padding note: sharding S requires S % tp == 0 (callers pad; padded
    sub-spaces carry all-zero codebooks and contribute exact zeros).
    """

    def local_fn(x, codebooks, assignments, bias):
        # Per device: x (B/dp, Cin_local) where the feature slice matches
        # this device's sub-spaces; partial = sum over local sub-spaces.
        partial = fc_ops.pq_fc(
            x, {"codebooks": codebooks, "assignments": assignments,
                "bias": jnp.zeros_like(bias)},
            impl=impl,
        )
        out = jax.lax.psum(partial, MODEL_AXIS)
        return out + bias

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, MODEL_AXIS),      # x: features split by sub-space
            P(MODEL_AXIS, None, None),     # codebooks over S
            P(None, MODEL_AXIS),           # assignments (Cout, S) over S
            P(),                           # bias replicated
        ),
        out_specs=P(DATA_AXIS, None),
    )


def column_parallel_pq_fc(mesh: Mesh, *, impl: str = "onehot"):
    """fn(x, codebooks, assignments, bias): assignments (Cout,S) and bias
    sharded over Cout on `model`; output all-gathered to full Cout."""

    def local_fn(x, codebooks, assignments, bias):
        local = fc_ops.pq_fc(
            x, {"codebooks": codebooks, "assignments": assignments,
                "bias": bias},
            impl=impl,
        )
        return jax.lax.all_gather(
            local, MODEL_AXIS, axis=-1, tiled=True
        )

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, None),
            P(),                           # codebooks replicated
            P(MODEL_AXIS, None),           # assignments over Cout
            P(MODEL_AXIS),                 # bias over Cout
        ),
        out_specs=P(DATA_AXIS, None),
        # the tiled all_gather replicates the output over `model`, which the
        # varying-axes checker cannot infer statically
        check_vma=False,
    )


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (jax.distributed). On a real pod slice each host
    calls this before building the global mesh; single-process callers can
    skip it. Thin wrapper so applications depend on qcnn_tpu, not on the
    jax.distributed API surface."""
    import jax

    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
