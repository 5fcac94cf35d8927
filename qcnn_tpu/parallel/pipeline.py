"""Pipeline parallelism (GPipe-style) for the ViT family.

The reference has no parallelism of any kind (SURVEY.md §2b); DP and TP
are introduced in mesh.py / sharding.py / shardmap_ops.py. This module
adds the third axis: PIPELINE parallelism, the TPU-idiomatic way —
`shard_map` over a ("stage",) mesh with `lax.ppermute` moving microbatch
activations along the ICI ring. No sends/recvs, no schedulers: the GPipe
schedule is a `fori_loop` the XLA compiler can see through.

ViT is the natural pipeline target here: its blocks are homogeneous, so
per-stage parameters stack into leaves with a leading (depth,) axis that
shards cleanly over the stage axis (each device holds depth/S blocks and
scans over them). CNN families have heterogeneous stages and already
scale on the data axis; sequence/expert parallelism have no axis in this
workload (SURVEY.md §5).

Schedule: with S stages and M microbatches, the loop runs M + S - 1
ticks. At tick t, stage 0 ingests microbatch min(t, M-1) (ticks beyond
M-1 recompute the last microbatch into the bubble — harmless, simpler
than masking), every stage applies its local blocks, and activations
ppermute one hop down the ring. Stage S-1's results from ticks >= S-1
are the final per-microbatch activations; they are broadcast back with a
masked psum so the (tiny) head can run replicated.

Pipeline efficiency is the standard M / (M + S - 1); pick M >= ~4*S. The
embed/head are a few percent of ViT FLOPs and run replicated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qcnn_tpu.models import vit as vit_mod

STAGE_AXIS = "stage"


def make_pipeline_mesh(devices=None, *, stages=None) -> Mesh:
    """1-D ("stage",) mesh over the given (default: all) devices."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    if stages is None:
        stages = len(devices)
    if stages > len(devices):
        # a silently truncated mesh has DIFFERENT parallelism than
        # requested and surfaces later as a confusing depth-divisibility
        # error (round-5 review)
        raise ValueError(
            f"{stages} pipeline stages > {len(devices)} devices"
        )
    return Mesh(np.asarray(devices[:stages]), (STAGE_AXIS,))


def stack_vit_blocks(spec, params: dict) -> tuple[dict, dict]:
    """Split a vit params pytree into (stacked_blocks, rest).

    stacked_blocks mirrors one block's structure with every leaf gaining
    a leading (depth,) axis; rest carries embed/head params unchanged."""
    blocks = [params[f"blk{i}"] for i in range(spec.depth)]
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *blocks)
    rest = {k: v for k, v in params.items() if not k.startswith("blk")}
    return stacked, rest


def place_pipeline_params(mesh: Mesh, stacked: dict, rest: dict):
    """Shard stacked block leaves over the stage axis ((depth,) leading
    dim); replicate embed/head."""
    s_stages = mesh.shape[STAGE_AXIS]
    depth = next(iter(jax.tree_util.tree_leaves(stacked))).shape[0]
    if depth % s_stages:
        # placement runs BEFORE pipeline_vit_forward in the natural
        # setup order, so its friendly divisibility error was
        # unreachable — the failure was a cryptic GSPMD device_put
        # error here (round-5 review)
        raise ValueError(
            f"depth {depth} not divisible by {s_stages} stages"
        )
    repl = NamedSharding(mesh, P())

    def shard_leaf(leaf):
        return jax.device_put(
            leaf, NamedSharding(
                mesh, P(STAGE_AXIS, *([None] * (leaf.ndim - 1)))
            )
        )

    return (
        jax.tree.map(shard_leaf, stacked),
        jax.tree.map(lambda v: jax.device_put(v, repl), rest),
    )


def pipeline_vit_forward(
    mesh: Mesh,
    spec,
    *,
    microbatches: int,
    compute_dtype=None,
    with_softmax: bool = False,
    attn_logits_dtype=None,
):
    """-> fn(stacked_blocks, rest, x) running the blocks pipeline-parallel
    over mesh's stage axis. x: (B, H, W, 3) with B % microbatches == 0;
    output matches vit.forward on the unstacked params."""
    s_stages = mesh.shape[STAGE_AXIS]
    if spec.depth % s_stages != 0:
        raise ValueError(
            f"depth {spec.depth} not divisible by {s_stages} stages"
        )
    m = microbatches
    if attn_logits_dtype is None and compute_dtype is not None:
        attn_logits_dtype = (
            jnp.bfloat16 if compute_dtype == jnp.bfloat16 else jnp.float32
        )
    cast = vit_mod._make_cast(compute_dtype)

    def apply_local(blocks, h):
        def body(carry, blk):
            return vit_mod._run_block(
                carry, blk, spec, cast,
                attn_logits_dtype or jnp.float32,
            ), None
        h, _ = lax.scan(body, h, blocks)
        return h

    def local_fn(blocks, x_mb):
        """blocks: (depth/S, ...) local stage params; x_mb: (M, mb, N, D)
        embedded microbatches (replicated)."""
        stage = lax.axis_index(STAGE_AXIS)
        n_ticks = m + s_stages - 1
        mb_shape = x_mb.shape[1:]
        # mark the carries as stage-varying up front (the loop body makes
        # them so; shard_map's varying-axis typing requires agreement)
        outs0 = lax.pcast(jnp.zeros((m,) + mb_shape, x_mb.dtype),
                          STAGE_AXIS, to="varying")
        recv0 = lax.pcast(jnp.zeros(mb_shape, x_mb.dtype), STAGE_AXIS,
                          to="varying")

        def tick(t, carry):
            recv, outs = carry
            feed = lax.dynamic_index_in_dim(
                x_mb, jnp.minimum(t, m - 1), keepdims=False
            )
            h = jnp.where(stage == 0, feed, recv)
            h = apply_local(blocks, h)
            # stage S-1 finishes microbatch t-S+1 at tick t
            done = jnp.logical_and(stage == s_stages - 1,
                                   t >= s_stages - 1)
            idx = jnp.maximum(t - (s_stages - 1), 0)
            upd = jnp.where(
                done,
                h,
                lax.dynamic_index_in_dim(outs, idx, keepdims=False),
            )
            outs = lax.dynamic_update_index_in_dim(outs, upd, idx, 0)
            recv = lax.ppermute(
                h, STAGE_AXIS,
                [(i, i + 1) for i in range(s_stages - 1)],
            )
            return recv, outs

        _, outs = lax.fori_loop(0, n_ticks, tick, (recv0, outs0))
        # only stage S-1 holds real outputs: broadcast via masked psum
        outs = lax.psum(
            jnp.where(stage == s_stages - 1, outs,
                      jnp.zeros_like(outs)),
            STAGE_AXIS,
        )
        return outs

    from jax import shard_map

    sharded = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(STAGE_AXIS), P()),
        out_specs=P(),
    )

    @jax.jit
    def fn(stacked_blocks, rest, x):
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
        b = x.shape[0]
        # pad the batch up to a microbatch multiple (static under jit:
        # bucket shapes are fixed). Round-5 fix: the old hard error made
        # a PP-served engine FAIL every batch whose size wasn't a
        # multiple of m — e.g. the bucket-1 dispatch of a lone
        # low-traffic request (tests/test_pipeline.py engine test).
        pad = (-b) % m
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad, *x.shape[1:]), x.dtype)])
        bp = b + pad
        h = vit_mod._run_embed(x, rest, spec, cast)
        x_mb = h.reshape(m, bp // m, *h.shape[1:])
        outs = sharded(stacked_blocks, x_mb)
        h = outs.reshape(bp, *outs.shape[2:])
        return vit_mod._run_head(h, rest, with_softmax)[:b]

    return fn
