"""ResNet and ViT PQ model families: shapes, PQ==decode exactness, and
quantization round-trips (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcnn_tpu.models import resnet, vit


class TestResNet:
    @pytest.fixture(scope="class")
    def small(self):
        # resnet18-style, 2 stages, tiny input for CPU speed
        spec = resnet.ResNetSpec(
            "rn-test", (1, 1), (64, 128), num_classes=12, in_size=32,
            bottleneck=False,
        )
        dense = resnet.init_dense_params(spec, seed=4)
        x = np.random.default_rng(0).standard_normal(
            (2, 32, 32, 3)
        ).astype(np.float32)
        return spec, dense, x

    def test_dense_forward_shapes(self, small):
        spec, dense, x = small
        out = np.asarray(resnet.forward(dense, x, spec=spec))
        assert out.shape == (2, 12)

    def test_bottleneck_resnet50_shapes(self):
        spec = resnet.resnet50()
        dense = resnet.init_dense_params(spec, seed=1)
        x = np.zeros((1, 224, 224, 3), np.float32)
        out = np.asarray(resnet.forward(dense, x, spec=spec))
        assert out.shape == (1, 1000)

    def test_pq_equals_prepared_decode(self, small):
        spec, dense, x = small
        pq = resnet.quantize_params(
            spec, dense, conv_codewords=16, fc_codewords=16
        )
        direct = np.asarray(resnet.forward(pq, x, spec=spec))
        prepared = resnet.prepare_params(spec, pq, dtype=jnp.float32)
        prep = np.asarray(resnet.forward(prepared, x, spec=spec))
        np.testing.assert_allclose(direct, prep, rtol=1e-4, atol=1e-4)

    def test_quantization_approximates_dense(self, small):
        spec, dense, x = small
        pq = resnet.quantize_params(
            spec, dense, conv_subvec_len=2, conv_codewords=64,
            fc_subvec_len=2, fc_codewords=64,
        )
        ref = np.asarray(resnet.forward(dense, x, spec=spec))
        got = np.asarray(resnet.forward(pq, x, spec=spec))
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.6  # residual nets compound error; bounded + runs

    def test_int8_prepare_and_forward(self, small):
        """Family int8 (round-1 verdict item 7): per-channel weight quant
        with bf16 activations must track the float path."""
        spec, dense, x = small
        pq = resnet.quantize_params(
            spec, dense, conv_codewords=16, fc_codewords=16
        )
        p_f32 = resnet.prepare_params(spec, pq, dtype=jnp.float32)
        p_i8 = resnet.prepare_params(spec, pq, dtype=jnp.int8)
        assert "kernel_q" in p_i8["s0b0"]["conv1"]
        ref = np.asarray(resnet.forward(p_f32, x, spec=spec))
        got = np.asarray(resnet.forward(
            p_i8, x, spec=spec, compute_dtype=jnp.bfloat16
        ))
        assert got.shape == ref.shape
        assert np.array_equal(got.argmax(1), ref.argmax(1))
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.2

    def test_memory_prepare_keeps_pq_and_matches_decode(self, small):
        """Family memory mode: prepare(memory=True) keeps codebooks+
        assignments resident; the in-step one-hot decode matches
        decode-at-load in f32."""
        spec, dense, x = small
        pq = resnet.quantize_params(spec, dense)
        p_dec = resnet.prepare_params(spec, pq, dtype=jnp.float32)
        p_mem = resnet.prepare_params(spec, pq, dtype=jnp.float32,
                                      memory=True)
        leaves = jax.tree_util.tree_leaves_with_path(p_mem)
        assert any("codebooks" in str(k) for k, _ in leaves)
        want = np.asarray(resnet.forward(p_dec, x, spec=spec))
        got = np.asarray(resnet.forward(p_mem, x, spec=spec))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_prepare_handles_opq_perm(self, small, rng):
        """Round-5 review regression: family prepare_params used to DROP
        'perm' in memory mode and skip the inverse-permutation fold in
        decode mode — silently wrong logits for any OPQ-quantized layer.
        Both modes must agree on perm-carrying params (the ops apply the
        permutation per call; the fold bakes its inverse into the
        decoded weight — models/prepare.py's linear-path contract)."""
        spec, dense, x = small
        pq = resnet.quantize_params(spec, dense)
        # inject a random perm on a conv and the fc: equality between
        # the two prepare modes holds for ANY (codebooks, perm) pair
        conv_cin = dense["s0b0"]["conv1"]["kernel"].shape[2]
        pq["s0b0"]["conv1"]["perm"] = rng.permutation(
            conv_cin).astype(np.int32)
        pq["fc"]["perm"] = rng.permutation(
            dense["fc"]["weight"].shape[0]).astype(np.int32)
        p_dec = resnet.prepare_params(spec, pq, dtype=jnp.float32)
        p_mem = resnet.prepare_params(spec, pq, dtype=jnp.float32,
                                      memory=True)
        # the memory tree carries the perm; the decode tree folded it
        assert "perm" in p_mem["s0b0"]["conv1"]
        assert "perm" not in p_dec["s0b0"]["conv1"]
        want = np.asarray(resnet.forward(p_dec, x, spec=spec))
        got = np.asarray(resnet.forward(p_mem, x, spec=spec))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_forward_segments_compose_to_forward(self, small):
        """forward_segments (the profile CLI's family path) composes to
        exactly the full forward."""
        spec, dense, x = small
        want = np.asarray(resnet.forward(dense, x, spec=spec))
        y = x
        for _, fn in resnet.forward_segments(spec):
            y = fn(y, dense)
        np.testing.assert_array_equal(np.asarray(y), want)

    def test_fold_batchnorm(self):
        rng = np.random.default_rng(2)
        conv = {
            "kernel": rng.standard_normal((3, 3, 4, 8)).astype(np.float32),
            "bias": rng.standard_normal(8).astype(np.float32),
        }
        gamma = rng.standard_normal(8).astype(np.float32)
        beta = rng.standard_normal(8).astype(np.float32)
        mean = rng.standard_normal(8).astype(np.float32)
        var = np.abs(rng.standard_normal(8)).astype(np.float32) + 0.5
        folded = resnet.fold_batchnorm(conv, gamma, beta, mean, var)
        x = rng.standard_normal((1, 6, 6, 4)).astype(np.float32)
        from qcnn_tpu.ops.conv import conv_dense

        raw = np.asarray(conv_dense(x, conv["kernel"], conv["bias"],
                                    stride=1, pad=1))
        want = (raw - mean) * (gamma / np.sqrt(var + 1e-5)) + beta
        got = np.asarray(conv_dense(x, folded["kernel"], folded["bias"],
                                    stride=1, pad=1))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestViT:
    @pytest.fixture(scope="class")
    def tiny(self):
        spec = vit.vit_tiny_test()
        dense = vit.init_dense_params(spec, seed=5)
        x = np.random.default_rng(1).standard_normal(
            (2, 32, 32, 3)
        ).astype(np.float32)
        return spec, dense, x

    def test_dense_forward_shapes(self, tiny):
        spec, dense, x = tiny
        out = np.asarray(vit.forward(dense, x, spec=spec))
        assert out.shape == (2, 10)

    def test_pq_equals_prepared_decode(self, tiny):
        spec, dense, x = tiny
        pq = vit.quantize_params(spec, dense, num_codewords=16)
        direct = np.asarray(vit.forward(pq, x, spec=spec))
        prepared = vit.prepare_params(spec, pq, dtype=jnp.float32)
        prep = np.asarray(vit.forward(prepared, x, spec=spec))
        np.testing.assert_allclose(direct, prep, rtol=1e-4, atol=1e-4)

    def test_quantization_approximates_dense(self, tiny):
        spec, dense, x = tiny
        pq = vit.quantize_params(spec, dense, subvec_len=2, num_codewords=64)
        ref = np.asarray(vit.forward(dense, x, spec=spec))
        got = np.asarray(vit.forward(pq, x, spec=spec))
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.6

    def test_masked_attention_padding_is_exact(self):
        # the -inf key mask must make padded attention IDENTICAL to
        # unpadded (not just close): padded keys get softmax weight
        # exp(-inf)=0 and the max/denominator see only real keys
        rng = np.random.default_rng(7)
        q, k, v = (
            jnp.asarray(rng.standard_normal((2, 17, 4, 8)), jnp.float32)
            for _ in range(3)
        )
        ref = np.asarray(vit._masked_attention(q, k, v, 0))
        for n_pad in (1, 111, 239):
            got = np.asarray(vit._masked_attention(q, k, v, n_pad))
            np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    def test_bf16_compute_path(self, tiny):
        spec, dense, x = tiny
        out = np.asarray(
            vit.forward(dense, x, spec=spec, compute_dtype=jnp.bfloat16)
        )
        assert out.dtype == np.float32
        ref = np.asarray(vit.forward(dense, x, spec=spec))
        assert np.argmax(out, -1).tolist() == np.argmax(ref, -1).tolist()

    def test_memory_prepare_keeps_pq_and_matches_decode(self, tiny):
        spec, dense, x = tiny
        pq = vit.quantize_params(spec, dense, num_codewords=16)
        p_dec = vit.prepare_params(spec, pq, dtype=jnp.float32)
        p_mem = vit.prepare_params(spec, pq, dtype=jnp.float32, memory=True)
        leaves = jax.tree_util.tree_leaves_with_path(p_mem)
        assert any("codebooks" in str(k) for k, _ in leaves)
        want = np.asarray(vit.forward(p_dec, x, spec=spec))
        got = np.asarray(vit.forward(p_mem, x, spec=spec))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_forward_segments_compose_to_forward(self, tiny):
        spec, dense, x = tiny
        want = np.asarray(vit.forward(dense, x, spec=spec,
                                      compute_dtype=jnp.bfloat16))
        y = x
        for _, fn in vit.forward_segments(spec, compute_dtype=jnp.bfloat16):
            y = fn(y, dense)
        np.testing.assert_array_equal(np.asarray(y), want)

    def test_bf16_attn_logits(self, tiny):
        """bf16 attention-logits materialization (the default whenever
        compute is bf16, KERNEL_STUDIES §7): top-1 identical, probs
        close."""
        spec, dense, x = tiny
        ref = np.asarray(vit.forward(dense, x, spec=spec,
                                     compute_dtype=jnp.bfloat16))
        got = np.asarray(vit.forward(
            dense, x, spec=spec, compute_dtype=jnp.bfloat16,
            attn_logits_dtype=jnp.bfloat16,
        ))
        assert np.argmax(got, -1).tolist() == np.argmax(ref, -1).tolist()
        np.testing.assert_allclose(
            jax.nn.softmax(got, -1), jax.nn.softmax(ref, -1), atol=5e-3
        )

    def test_int8_prepare_and_forward(self, tiny):
        spec, dense, x = tiny
        pq = vit.quantize_params(spec, dense, num_codewords=16)
        p_f32 = vit.prepare_params(spec, pq, dtype=jnp.float32)
        p_i8 = vit.prepare_params(spec, pq, dtype=jnp.int8)
        assert "weight_q" in p_i8["blk0"]["qkv"]
        ref = np.asarray(vit.forward(p_f32, x, spec=spec))
        got = np.asarray(vit.forward(
            p_i8, x, spec=spec, compute_dtype=jnp.bfloat16
        ))
        assert np.array_equal(got.argmax(1), ref.argmax(1))
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.2
