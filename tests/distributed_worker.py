"""Multi-process jax.distributed worker (launched by test_distributed.py).

Each process: initialize jax.distributed against a shared local coordinator,
build a GLOBAL mesh over all processes' CPU devices, run the sharded tiny-PQ
forward, and verify this process's addressable output shards against a
locally-computed single-device reference. This executes the multi-host
bring-up path (init_distributed -> global mesh -> cross-process collectives)
that a real pod slice uses — SURVEY.md §4's "test multi-node without a
cluster".

Usage: python tests/distributed_worker.py <coordinator> <nproc> <pid>
Env: XLA_FLAGS=--xla_force_host_platform_device_count=<local_devices>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# axon sitecustomize pins the TPU platform at interpreter start; force CPU
# post-import (same rule as tests/conftest.py), and select the gloo CPU
# collectives backend so cross-process psum/all_gather work.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np  # noqa: E402


def tiny_model(rng):
    from qcnn_tpu.core import (
        ConvSpec, FCSpec, ModelSpec, PoolSpec, ReLUSpec, SoftmaxSpec,
    )

    spec = ModelSpec(
        name="tiny-dist",
        in_height=12, in_width=12, in_channels=8,
        layers=(
            ConvSpec(kernel=3, out_channels=16, pad=1, stride=1),
            ReLUSpec(),
            PoolSpec(kernel=2, stride=2),
            FCSpec(64),
            ReLUSpec(),
            FCSpec(16),
            SoftmaxSpec(),
        ),
    )
    params = [
        {
            "codebooks": rng.standard_normal((2, 8, 4), dtype=np.float32) * 0.2,
            "assignments": rng.integers(0, 8, (16, 3, 3, 2), dtype=np.uint8),
            "bias": rng.standard_normal(16, dtype=np.float32) * 0.1,
        },
        None,
        None,
        {
            "codebooks": rng.standard_normal(
                (8, 16, 72), dtype=np.float32) * 0.2,
            "assignments": rng.integers(0, 16, (64, 8), dtype=np.uint8),
            "bias": rng.standard_normal(64, dtype=np.float32) * 0.1,
        },
        None,
        {
            "codebooks": rng.standard_normal((8, 16, 8), dtype=np.float32) * 0.2,
            "assignments": rng.integers(0, 16, (16, 8), dtype=np.uint8),
            "bias": rng.standard_normal(16, dtype=np.float32) * 0.1,
        },
        None,
    ]
    return spec, params


def global_array(value, sharding):
    value = np.asarray(value)
    # dtype must be explicit: a process may hold no addressable shard of
    # the array (e.g. the 4-stage pipeline mesh lives on process 0's
    # devices entirely when local_devices=4)
    return jax.make_array_from_callback(
        value.shape, sharding, lambda idx: value[idx], dtype=value.dtype
    )


def main() -> int:
    coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from qcnn_tpu.parallel.shardmap_ops import init_distributed

    init_distributed(coordinator, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == nproc * n_local, (n_global, n_local)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from qcnn_tpu.models import forward
    from qcnn_tpu.parallel import (
        make_mesh, make_sharded_forward, param_shardings,
    )

    rng = np.random.default_rng(99)
    spec, params = tiny_model(rng)
    x = rng.standard_normal((8, 12, 12, 8)).astype(np.float32)

    # single-device reference, computed identically in every process
    want = np.asarray(forward(params, x, spec=spec))

    mesh = make_mesh(jax.devices(), dp=n_global // 2, tp=2)
    shardings = param_shardings(spec, params, mesh, fc_mode="column")
    gparams = [
        None if p is None
        else {k: global_array(v, shardings[i][k]) for k, v in p.items()}
        for i, p in enumerate(params)
    ]
    gx = global_array(x, NamedSharding(mesh, P("data", None, None, None)))

    fwd = make_sharded_forward(spec, mesh, fc_mode="column")
    out = fwd(gparams, gx)

    for shard in out.addressable_shards:
        np.testing.assert_allclose(
            np.asarray(shard.data), want[shard.index], rtol=1e-4, atol=1e-5
        )

    # Pipeline parallelism with the stage ring SPANNING processes: 4 stages
    # over global devices 2..5 (the last two of process 0 + first two of
    # process 1 with 2x4 devices), so the stage-1 -> stage-2 ppermute hop
    # crosses the process boundary over the gloo collectives backend.
    from qcnn_tpu.models import vit
    from qcnn_tpu.parallel.pipeline import (
        STAGE_AXIS, make_pipeline_mesh, pipeline_vit_forward,
        stack_vit_blocks,
    )

    pp_spec = vit.ViTSpec("pp-dist", patch=8, image_size=16, dim=32,
                          depth=4, heads=2, num_classes=8)
    pp_params = vit.init_dense_params(pp_spec, seed=5)
    xpp = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
    want_pp = np.asarray(vit.forward(pp_params, xpp, spec=pp_spec,
                                     with_softmax=True))

    pp_mesh = make_pipeline_mesh(jax.devices()[2:6])
    stacked, rest = stack_vit_blocks(pp_spec, pp_params)
    # multi-process placement: device_put cannot target non-addressable
    # devices, so materialize global arrays from the (identical) host
    # values in every process
    stacked = jax.tree.map(
        lambda v: global_array(v, NamedSharding(
            pp_mesh, P(STAGE_AXIS, *([None] * (np.ndim(v) - 1))))),
        stacked,
    )
    rest = jax.tree.map(
        lambda v: global_array(v, NamedSharding(pp_mesh, P())), rest
    )
    pp_fn = pipeline_vit_forward(pp_mesh, pp_spec, microbatches=2,
                                 with_softmax=True)
    gx = global_array(xpp, NamedSharding(pp_mesh, P()))
    pp_out = pp_fn(stacked, rest, gx)
    for shard in pp_out.addressable_shards:
        np.testing.assert_allclose(
            np.asarray(shard.data), want_pp[shard.index],
            rtol=2e-5, atol=2e-6,
        )
    print(f"PP_OK {pid} stages=4", flush=True)

    print(f"WORKER_OK {pid} processes={nproc} global_devices={n_global}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
