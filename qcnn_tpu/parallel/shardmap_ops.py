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


def row_parallel_pq_fc_overlapped(mesh: Mesh):
    """Row-parallel PQ FC with the collective PIPELINED against compute
    (BASELINE north star: "all-gathers of per-subspace LUTs overlapped with
    the gather-accumulate compute").

    The plain row-parallel form computes the FULL local partial and then
    blocks on one psum — the collective is fully exposed. Here the output
    axis is split into tp chunks and the reduction runs as a ring
    reduce-scatter interleaved with compute: at step t, device i

      1. starts forwarding the in-flight chunk to its ring neighbour
         (ppermute), and
      2. gather-accumulates its OWN contribution to the chunk arriving next
         (one-hot einsum over this device's sub-spaces, LUT built once),

    then adds (1)'s payload to (2). The ppermute payload is never needed by
    the chunk compute, so XLA overlaps transfer with compute; per step only
    Cout/tp channels ride the ICI instead of all of Cout. A final tiled
    all_gather (also chunk-granular) restores the full activation.

    Chunk schedule: device i contributes to chunk (i + tp-1 - t) mod tp at
    step t, so after tp-1 hops chunk i lands fully-reduced on device i and
    the tiled all_gather needs no reorder.

    Requires Cout % tp == 0 and S % tp == 0 (callers pad; padded sub-spaces
    hold zero codebooks -> exact zeros).
    """
    from qcnn_tpu.ops import lut as lut_ops

    def local_fn(x, codebooks, assignments, bias):
        tp = jax.lax.axis_size(MODEL_AXIS)
        i = jax.lax.axis_index(MODEL_AXIS)
        cout = assignments.shape[0]
        chunk = cout // tp
        s, k, d = codebooks.shape

        lut = lut_ops.build_lut(x, codebooks)  # (B, S_local, K), built once
        perm = [(src, (src + 1) % tp) for src in range(tp)]

        def chunk_partial(c):
            """This device's contribution to output chunk c (gather-
            accumulate over local sub-spaces, MXU one-hot form)."""
            rows = jax.lax.dynamic_slice(
                assignments, (c * chunk, 0), (chunk, s)
            )  # (chunk, S_local)
            onehot = jax.nn.one_hot(
                rows.astype(jnp.int32).T, k, dtype=lut.dtype
            )  # (S_local, chunk, K)
            return jnp.einsum(
                "bsk,sok->bo", lut, onehot,
                preferred_element_type=jnp.float32,
            )

        buf = chunk_partial((i + tp - 1) % tp)

        def body(t, buf):
            arrived = jax.lax.ppermute(buf, MODEL_AXIS, perm)
            mine = chunk_partial((i + tp - 1 - t) % tp)
            return arrived + mine

        buf = jax.lax.fori_loop(1, tp, body, buf)
        # device i now holds fully-reduced chunk i
        buf = buf + jax.lax.dynamic_slice(bias, (i * chunk,), (chunk,))
        return jax.lax.all_gather(buf, MODEL_AXIS, axis=-1, tiled=True)

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, MODEL_AXIS),      # x features split by sub-space
            P(MODEL_AXIS, None, None),     # codebooks over S
            P(None, MODEL_AXIS),           # assignments (Cout, S) over S
            P(),                           # bias replicated
        ),
        out_specs=P(DATA_AXIS, None),
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
