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
