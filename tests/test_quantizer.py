"""Quantizer tests: k-means convergence, PQ round-trip through the engine,
and error-corrected PQ beating plain PQ on response error."""

import numpy as np

import jax
import jax.numpy as jnp

from qcnn_tpu.ops import decode_fc_weight, pq_fc
from qcnn_tpu.quantizer import (
    quantize_conv_layer,
    quantize_error_corrected,
    quantize_fc_layer,
    quantize_input_weighted,
    quantize_plain,
    subspace_kmeans,
)


class TestKMeans:
    def test_recovers_separated_clusters(self, rng):
        # 4 well-separated centers per sub-space
        s, k, d, per = 3, 4, 2, 50
        centers = rng.standard_normal((s, k, d)).astype(np.float32) * 10
        noise = rng.standard_normal((s, k, per, d)).astype(np.float32) * 0.05
        x = (centers[:, :, None, :] + noise).reshape(s, k * per, d)
        res = subspace_kmeans(
            jax.random.key(0), jnp.asarray(x), num_codewords=k, iters=30
        )
        assert float(res.mse) < 0.02
        # every learned centroid is near a true center
        for si in range(s):
            dists = np.linalg.norm(
                np.asarray(res.centroids)[si][:, None] - centers[si][None], axis=-1
            )
            assert dists.min(axis=1).max() < 0.5

    def test_mse_decreases_with_more_codewords(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 400, 4), dtype=np.float32))
        mses = [
            float(
                subspace_kmeans(
                    jax.random.key(1), x, num_codewords=k, iters=20
                ).mse
            )
            for k in (2, 8, 32)
        ]
        assert mses[0] > mses[1] > mses[2]


class TestPQQuantize:
    def test_fc_roundtrip_through_engine(self, rng):
        cin, cout, s, k = 32, 48, 8, 16
        w = rng.standard_normal((cout, cin)).astype(np.float32)
        bias = rng.standard_normal(cout).astype(np.float32)
        params = quantize_fc_layer(
            jax.random.key(2), w, bias, num_subspaces=s, num_codewords=k
        )
        assert params["codebooks"].shape == (s, k, cin // s)
        assert params["assignments"].shape == (cout, s)
        # engine decode uses the same layout conventions
        w_hat = np.asarray(
            decode_fc_weight(params["codebooks"], params["assignments"], cin)
        )
        assert w_hat.shape == (cin, cout)
        rel = np.linalg.norm(w_hat.T - w) / np.linalg.norm(w)
        assert rel < 0.9  # K=16 codewords on random data: coarse but bounded
        # forward parity: engine PQ(x) == x @ w_hat + b
        x = rng.standard_normal((4, cin)).astype(np.float32)
        got = np.asarray(pq_fc(jnp.asarray(x), params, impl="onehot"))
        want = x @ w_hat + bias
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_conv_layout(self, rng):
        cout, cg, kh, kw, s, k = 16, 12, 3, 3, 3, 8
        kern = rng.standard_normal((cout, cg, kh, kw)).astype(np.float32)
        bias = np.zeros(cout, np.float32)
        params = quantize_conv_layer(
            jax.random.key(3), kern, bias, num_subspaces=s, num_codewords=k
        )
        assert params["codebooks"].shape == (s, k, cg // s)
        assert params["assignments"].shape == (cout, kh, kw, s)

    def test_structured_weights_quantize_well(self, rng):
        # weights drawn from K true codewords must quantize near-exactly
        cin, cout, s, k = 16, 64, 4, 8
        d = cin // s
        true_cb = rng.standard_normal((s, k, d)).astype(np.float32)
        true_asmt = rng.integers(0, k, (cout, s))
        w = np.concatenate(
            [true_cb[si, true_asmt[:, si]] for si in range(s)], axis=1
        ).astype(np.float32)
        params = quantize_fc_layer(
            jax.random.key(4), w, np.zeros(cout, np.float32),
            num_subspaces=s, num_codewords=k, iters=40,
        )
        w_hat = np.asarray(
            decode_fc_weight(params["codebooks"], params["assignments"], cin)
        ).T
        rel = np.linalg.norm(w_hat - w) / np.linalg.norm(w)
        assert rel < 0.15


class TestErrorCorrected:
    def test_beats_plain_on_response_error(self):
        # Local rng: the margin asserted below is draw-sensitive, so this
        # test must not share the session fixture's draw sequence (which
        # shifts whenever tests are added elsewhere).
        rng = np.random.default_rng(20260817)
        cin, cout, s, k, b = 32, 64, 8, 8, 256
        w = rng.standard_normal((cout, cin)).astype(np.float32)
        # anisotropic calibration inputs: error correction must exploit this
        scales = np.geomspace(5.0, 0.1, cin).astype(np.float32)
        xcal = rng.standard_normal((b, cin)).astype(np.float32) * scales

        plain = quantize_plain(
            jax.random.key(5), jnp.asarray(w), num_subspaces=s, num_codewords=k
        )
        ec = quantize_error_corrected(
            jax.random.key(5), jnp.asarray(w), jnp.asarray(xcal),
            num_subspaces=s, num_codewords=k, rounds=3,
        )

        def resp_err(cb, asmt):
            w_hat = np.asarray(
                decode_fc_weight(np.asarray(cb), np.asarray(asmt, np.uint8), cin)
            ).T
            return np.linalg.norm(xcal @ (w_hat - w).T) / np.linalg.norm(xcal @ w.T)

        err_plain = resp_err(plain.codebooks, plain.assignments)
        err_ec = resp_err(ec.codebooks, ec.assignments)
        # Random gaussian weights are PQ's worst case (no structure to
        # exploit); EC's edge there is a consistent but small 3.5-5 %
        # relative (measured over seeds). Assert the direction with margin.
        assert err_ec < err_plain * 0.98

    def test_input_weighted_between(self, rng):
        cin, cout, s, k, b = 24, 48, 6, 8, 200
        w = rng.standard_normal((cout, cin)).astype(np.float32)
        scales = np.geomspace(4.0, 0.2, cin).astype(np.float32)
        xcal = rng.standard_normal((b, cin)).astype(np.float32) * scales
        iw = quantize_input_weighted(
            jax.random.key(6), jnp.asarray(w), jnp.asarray(xcal),
            num_subspaces=s, num_codewords=k,
        )
        assert np.isfinite(float(iw.output_mse))
        assert iw.codebooks.shape == (s, k, cin // s)
