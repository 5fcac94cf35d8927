"""Pipeline parallelism (parallel/pipeline.py): GPipe schedule over a
("stage",) mesh must reproduce the single-device ViT forward exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcnn_tpu.models import vit
from qcnn_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    pipeline_vit_forward,
    place_pipeline_params,
    stack_vit_blocks,
)


@pytest.fixture(scope="module")
def spec():
    return vit.ViTSpec("ViT-pp-test", patch=8, image_size=32, dim=64,
                       depth=8, heads=4, num_classes=10)


@pytest.fixture(scope="module")
def params(spec):
    return vit.init_dense_params(spec, seed=0)


@pytest.mark.parametrize("stages,microbatches", [(4, 4), (2, 8), (8, 2)])
def test_pipeline_matches_single_device(spec, params, stages, microbatches):
    b = 16
    rng = np.random.default_rng(1)
    x = jnp.asarray(
        rng.standard_normal((b, spec.image_size, spec.image_size, 3)),
        jnp.float32,
    )
    want = np.asarray(vit.forward(params, x, spec=spec,
                                  with_softmax=True))

    mesh = make_pipeline_mesh(jax.devices()[:stages])
    stacked, rest = stack_vit_blocks(spec, params)
    stacked, rest = place_pipeline_params(mesh, stacked, rest)
    fn = pipeline_vit_forward(mesh, spec, microbatches=microbatches,
                              with_softmax=True)
    got = np.asarray(fn(stacked, rest, x))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("b", [1, 3])
def test_pipeline_pads_ragged_batches(spec, params, b):
    """Round-5 fix: batches that are not a microbatch multiple (the
    engine's bucket-1 dispatch of a lone request) pad statically and
    slice back, instead of raising and failing the request."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(
        rng.standard_normal((b, spec.image_size, spec.image_size, 3)),
        jnp.float32,
    )
    want = np.asarray(vit.forward(params, x, spec=spec, with_softmax=True))
    mesh = make_pipeline_mesh(jax.devices()[:2])
    stacked, rest = stack_vit_blocks(spec, params)
    stacked, rest = place_pipeline_params(mesh, stacked, rest)
    fn = pipeline_vit_forward(mesh, spec, microbatches=2,
                              with_softmax=True)
    got = np.asarray(fn(stacked, rest, x))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_pipeline_validates_divisibility(spec, params):
    mesh = make_pipeline_mesh(jax.devices()[:3])
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_vit_forward(mesh, spec, microbatches=4)


def test_stack_round_trip(spec, params):
    stacked, rest = stack_vit_blocks(spec, params)
    assert stacked["qkv"]["weight"].shape[0] == spec.depth
    np.testing.assert_array_equal(
        np.asarray(stacked["mlp1"]["bias"][3]),
        np.asarray(params["blk3"]["mlp1"]["bias"]),
    )
    assert "patch_embed" in rest and "head" in rest
    assert not any(k.startswith("blk") for k in rest)


def test_pipeline_serves_through_engine(spec, params):
    """PP composes with the continuous-batching engine: from_forward over
    the pipeline fn (stage-sharded params stay placed; device_put of
    committed sharded arrays is a no-op)."""
    import numpy as np

    from qcnn_tpu.serve.engine import BatchingEngine, EngineConfig

    mesh = make_pipeline_mesh(jax.devices()[:4])
    stacked, rest = stack_vit_blocks(spec, params)
    stacked, rest = place_pipeline_params(mesh, stacked, rest)
    pipe = pipeline_vit_forward(mesh, spec, microbatches=2,
                                with_softmax=True)

    def fwd(p, x):
        return pipe(p[0], p[1], x)

    eng = BatchingEngine.from_forward(
        fwd, (stacked, rest), (spec.image_size, spec.image_size, 3),
        config=EngineConfig(max_batch=2, max_wait_ms=5.0),
    ).start()
    try:
        rng = np.random.default_rng(7)
        futs = [
            eng.submit(rng.standard_normal(
                (spec.image_size, spec.image_size, 3)).astype(np.float32))
            for _ in range(4)
        ]
        res = [f.result(timeout=120) for f in futs]
        assert all(r.shape == (spec.num_classes,) for r in res)
        for r in res:
            np.testing.assert_allclose(r.sum(), 1.0, rtol=1e-3)
    finally:
        eng.stop()
