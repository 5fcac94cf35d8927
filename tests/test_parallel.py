"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Checks that (a) sharded forwards numerically match the single-device result
for every FC tensor-parallel mode, (b) shardings actually place shards (not
silent replication) for the big FC tensors."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qcnn_tpu.core import FCSpec, ModelSpec, ConvSpec, ReLUSpec, SoftmaxSpec, PoolSpec
from qcnn_tpu.models import forward
from qcnn_tpu.parallel import (
    MODEL_AXIS,
    make_mesh,
    make_sharded_forward,
    param_shardings,
    shard_params,
)


def _tiny_pq_model(rng):
    """A small conv+fc PQ model with TP-friendly dimensions."""
    spec = ModelSpec(
        name="tiny",
        in_height=12,
        in_width=12,
        in_channels=8,
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

    def pq_conv(cin, cout, k_sz, s, k, d):
        return {
            "codebooks": rng.standard_normal((s, k, d), dtype=np.float32) * 0.2,
            "assignments": rng.integers(0, k, (cout, k_sz, k_sz, s), dtype=np.uint8),
            "bias": rng.standard_normal(cout, dtype=np.float32) * 0.1,
        }

    def pq_fc(cin, cout, s, k):
        d = cin // s
        return {
            "codebooks": rng.standard_normal((s, k, d), dtype=np.float32) * 0.2,
            "assignments": rng.integers(0, k, (cout, s), dtype=np.uint8),
            "bias": rng.standard_normal(cout, dtype=np.float32) * 0.1,
        }

    params = [
        pq_conv(8, 16, 3, 2, 8, 4),
        None,
        None,
        pq_fc(16 * 6 * 6, 64, 8, 16),
        None,
        pq_fc(64, 16, 8, 16),
        None,
    ]
    return spec, params


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(dp=4, tp=2)


class TestShardedForward:
    @pytest.mark.parametrize("fc_mode", ["column", "row", "replicated"])
    def test_matches_single_device(self, rng, mesh8, fc_mode):
        spec, params = _tiny_pq_model(rng)
        x = rng.standard_normal((8, 12, 12, 8), dtype=np.float32)
        want = np.asarray(forward(params, jnp.asarray(x), spec=spec))
        sharded = shard_params(spec, params, mesh8, fc_mode=fc_mode)
        fwd = make_sharded_forward(spec, mesh8, fc_mode=fc_mode)
        got = np.asarray(fwd(sharded, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_column_sharding_places_shards(self, rng, mesh8):
        spec, params = _tiny_pq_model(rng)
        sh = param_shardings(spec, params, mesh8, fc_mode="column")
        fc_sh = sh[3]["assignments"]
        assert fc_sh.spec == jax.sharding.PartitionSpec(MODEL_AXIS, None)
        sharded = shard_params(spec, params, mesh8, fc_mode="column")
        a = sharded[3]["assignments"]
        # each model-axis shard holds half the output channels
        shard_shapes = {s.data.shape for s in a.addressable_shards}
        assert shard_shapes == {(32, 8)}

    def test_row_sharding_places_shards(self, rng, mesh8):
        spec, params = _tiny_pq_model(rng)
        sharded = shard_params(spec, params, mesh8, fc_mode="row")
        cb = sharded[3]["codebooks"]
        shard_shapes = {s.data.shape for s in cb.addressable_shards}
        assert shard_shapes == {(4, 16, 72)}  # S=8 split over tp=2, D=576/8

    def test_mesh_shapes(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        m = make_mesh(dp=2, tp=4)
        assert m.shape == {"data": 2, "model": 4}
        m2 = make_mesh()
        assert m2.shape["data"] == len(jax.devices())


class TestShardMapOps:
    """Explicit-collective tensor-parallel PQ FC (shard_map + psum)."""

    def _data(self, rng, b=8, cin=64, cout=32, s=16, k=8, d=4):
        x = rng.standard_normal((b, cin)).astype(np.float32)
        params = {
            "codebooks": rng.standard_normal((s, k, d)).astype(np.float32),
            "assignments": rng.integers(0, k, size=(cout, s), dtype=np.uint8),
            "bias": rng.standard_normal(cout).astype(np.float32),
        }
        return x, params

    @pytest.mark.parametrize("impl", ["gather", "indecode"])
    def test_row_parallel_matches_single_device(self, rng, impl):
        # indecode: the memory-mode in-step one-hot decode works under
        # explicit tp sharding too (local S-span decode + psum)
        from qcnn_tpu.ops.fc import pq_fc
        from qcnn_tpu.parallel.mesh import make_mesh
        from qcnn_tpu.parallel.shardmap_ops import row_parallel_pq_fc

        x, p = self._data(rng)
        mesh = make_mesh(jax.devices(), dp=2, tp=4)
        fn = jax.jit(row_parallel_pq_fc(mesh, impl=impl))
        got = np.asarray(fn(x, p["codebooks"], p["assignments"], p["bias"]))
        want = np.asarray(pq_fc(x, p, impl="gather"))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    @pytest.mark.parametrize("impl", ["gather", "indecode"])
    def test_column_parallel_matches_single_device(self, rng, impl):
        from qcnn_tpu.ops.fc import pq_fc
        from qcnn_tpu.parallel.mesh import make_mesh
        from qcnn_tpu.parallel.shardmap_ops import column_parallel_pq_fc

        x, p = self._data(rng)
        mesh = make_mesh(jax.devices(), dp=2, tp=4)
        fn = jax.jit(column_parallel_pq_fc(mesh, impl=impl))
        got = np.asarray(fn(x, p["codebooks"], p["assignments"], p["bias"]))
        want = np.asarray(pq_fc(x, p, impl="gather"))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    @pytest.mark.parametrize("dp,tp", [(2, 4), (1, 8), (4, 2)])
    def test_row_parallel_overlapped_matches_single_device(self, rng, dp, tp):
        """Ring reduce-scatter pipelined against per-chunk gather-accumulate
        must be numerically identical to the plain psum formulation."""
        from qcnn_tpu.ops.fc import pq_fc
        from qcnn_tpu.parallel.mesh import make_mesh
        from qcnn_tpu.parallel.shardmap_ops import (
            row_parallel_pq_fc_overlapped,
        )

        x, p = self._data(rng)
        mesh = make_mesh(jax.devices(), dp=dp, tp=tp)
        fn = jax.jit(row_parallel_pq_fc_overlapped(mesh))
        got = np.asarray(fn(x, p["codebooks"], p["assignments"], p["bias"]))
        want = np.asarray(pq_fc(x, p, impl="gather"))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_dp_forward_resnet_family(rng):
    """Generic DP wrapper over the ResNet family on the virtual mesh."""
    import functools

    from qcnn_tpu.models import resnet
    from qcnn_tpu.parallel.mesh import make_mesh
    from qcnn_tpu.parallel.sharding import make_dp_forward

    spec = resnet.ResNetSpec(
        "rn-dp", (1,), (32,), num_classes=6, in_size=16, bottleneck=False
    )
    pq = resnet.quantize_params(
        spec, resnet.init_dense_params(spec, seed=3),
        conv_codewords=8, fc_codewords=8,
    )
    prepared = resnet.prepare_params(spec, pq, dtype=np.float32)
    fwd = functools.partial(resnet.forward, spec=spec)
    mesh = make_mesh(jax.devices(), dp=8, tp=1)
    dp_fwd = make_dp_forward(fwd, mesh)
    x = rng.standard_normal((16, 16, 16, 3)).astype(np.float32)
    got = np.asarray(dp_fwd(prepared, x))
    want = np.asarray(resnet.forward(prepared, x, spec=spec))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_shard_params_with_opq_perm(rng, mesh8):
    """OPQ-quantized params carry a 'perm' key; the FC shardings must
    replicate it instead of KeyError-ing (round-3 review fix)."""
    spec, params = _tiny_pq_model(rng)
    params = [dict(p) if p is not None else None for p in params]
    cin = params[3]["codebooks"].shape[0] * params[3]["codebooks"].shape[2]
    params[3]["perm"] = np.random.default_rng(0).permutation(
        cin).astype(np.int32)
    for fc_mode in ("column", "row"):
        sharded = shard_params(spec, params, mesh8, fc_mode=fc_mode)
        np.testing.assert_array_equal(
            np.asarray(sharded[3]["perm"]), params[3]["perm"])
