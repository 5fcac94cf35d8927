"""Op-level parity tests.

Oracles:
- hand-written NumPy loop implementations transcribing the reference semantics
  (ceil-pool CaffeEva.cc:367-370, LRN :1038-1089, LUT+gather :848-861,
  :1006-1017);
- cross-implementation agreement: every PQ formulation (gather / one-hot /
  decode-to-dense) must agree to float tolerance since they are the same math.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from qcnn_tpu.ops import (
    build_lut,
    caffe_max_pool,
    conv_dense,
    decode_conv_kernel,
    decode_fc_weight,
    fc_dense,
    lrn,
    pq_conv,
    pq_fc,
)


# ---------------------------------------------------------------------------
# NumPy oracles (independent re-derivations of reference semantics)
# ---------------------------------------------------------------------------

def np_lut(x, codebooks):
    """x: (B, Cin), codebooks: (S, K, D) -> (B, S, K), clamped like
    GetInPdMat (CaffeEva.cc:1277)."""
    b, cin = x.shape
    s, k, d = codebooks.shape
    out = np.zeros((b, s, k), np.float32)
    for si in range(s):
        lo = si * d
        hi = min(cin, lo + d)
        out[:, si, :] = x[:, lo:hi] @ codebooks[si, :, : hi - lo].T
    return out


def np_pq_fc(x, codebooks, assignments, bias):
    lut = np_lut(x, codebooks)
    b = x.shape[0]
    cout, s = assignments.shape
    out = np.tile(bias, (b, 1)).astype(np.float32)
    for bi in range(b):
        for si in range(s):
            out[bi] += lut[bi, si, assignments[:, si]]
    return out


def np_pq_conv(x, codebooks, assignments, bias, stride, pad, groups):
    """Direct transcription of CalcFeatMap_ConvAprx (CaffeEva.cc:795-867)."""
    b, h, w, cin = x.shape
    cout, kh, kw, s = assignments.shape
    cg = cin // groups
    cout_g = cout // groups
    oh = (h + 2 * pad - kh) // stride + 1
    ow = (w + 2 * pad - kw) // stride + 1
    out = np.zeros((b, oh, ow, cout), np.float32)
    out[...] = bias
    for g in range(groups):
        xg = x[..., g * cg : (g + 1) * cg].reshape(b * h * w, cg)
        lut = np_lut(xg, codebooks).reshape(b, h, w, s, -1)
        for ho in range(oh):
            for wo in range(ow):
                hi0 = ho * stride - pad
                wi0 = wo * stride - pad
                for ki in range(kh):
                    for kj in range(kw):
                        hi, wi = hi0 + ki, wi0 + kj
                        if not (0 <= hi < h and 0 <= wi < w):
                            continue
                        for si in range(s):
                            sel = assignments[
                                g * cout_g : (g + 1) * cout_g, ki, kj, si
                            ]
                            out[:, ho, wo, g * cout_g : (g + 1) * cout_g] += lut[
                                :, hi, wi, si, sel
                            ]
    return out


def np_max_pool(x, kernel, stride):
    """Transcription of CalcFeatMap_Pool with ceil sizing (pad=0)."""
    b, h, w, c = x.shape
    oh = -(-(h - kernel) // stride) + 1
    ow = -(-(w - kernel) // stride) + 1
    out = np.zeros((b, oh, ow, c), np.float32)
    for ho in range(oh):
        for wo in range(ow):
            h0, w0 = ho * stride, wo * stride
            h1, w1 = min(h, h0 + kernel), min(w, w0 + kernel)
            out[:, ho, wo] = x[:, h0:h1, w0:w1].max(axis=(1, 2))
    return out


def np_lrn(x, size, alpha, beta, k):
    b, h, w, c = x.shape
    radius = (size - 1) // 2
    sq = x * x
    padded = np.zeros((b, h, w, c + 2 * radius), np.float32)
    padded[..., radius : radius + c] = sq
    out = np.zeros_like(x)
    for ci in range(c):
        win = padded[..., ci : ci + size].sum(axis=-1)
        out[..., ci] = x[..., ci] * np.power(k + alpha / size * win, -beta)
    return out


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

def _rand_pq_fc(rng, b=3, cin=22, s=6, k=16, cout=24):
    d = -(-cin // s)
    x = rng.standard_normal((b, cin), dtype=np.float32)
    codebooks = rng.standard_normal((s, k, d), dtype=np.float32)
    assignments = rng.integers(0, k, size=(cout, s), dtype=np.uint8)
    bias = rng.standard_normal(cout, dtype=np.float32)
    return x, {"codebooks": codebooks, "assignments": assignments, "bias": bias}


class TestLUT:
    def test_build_lut_matches_oracle_exact_span(self, rng):
        x = rng.standard_normal((4, 24), dtype=np.float32)
        cb = rng.standard_normal((6, 8, 4), dtype=np.float32)
        np.testing.assert_allclose(
            np.asarray(build_lut(jnp.asarray(x), jnp.asarray(cb))),
            np_lut(x, cb),
            rtol=1e-5, atol=1e-5,
        )

    def test_build_lut_overhang_clamp(self, rng):
        # Cin=3 in one 8-wide subspace, the AlexNet conv1 case
        x = rng.standard_normal((5, 3), dtype=np.float32)
        cb = rng.standard_normal((1, 128, 8), dtype=np.float32)
        np.testing.assert_allclose(
            np.asarray(build_lut(jnp.asarray(x), jnp.asarray(cb))),
            np_lut(x, cb),
            rtol=1e-5, atol=1e-5,
        )


class TestPQFC:
    @pytest.mark.parametrize("impl", ["gather", "onehot", "decode", "indecode"])
    def test_matches_oracle(self, rng, impl):
        x, params = _rand_pq_fc(rng)
        want = np_pq_fc(x, params["codebooks"], params["assignments"], params["bias"])
        got = np.asarray(pq_fc(jnp.asarray(x), params, impl=impl))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_decode_weight_shape_and_truncation(self, rng):
        x, params = _rand_pq_fc(rng, cin=22, s=6)  # 22 < 6*4=24: overhang
        w = np.asarray(
            decode_fc_weight(params["codebooks"], params["assignments"], 22)
        )
        assert w.shape == (22, 24)
        got = np.asarray(fc_dense(jnp.asarray(x), jnp.asarray(w), params["bias"]))
        want = np_pq_fc(x, params["codebooks"], params["assignments"], params["bias"])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestPQConv:
    @pytest.mark.parametrize("impl", ["decode", "indecode", "lut"])
    @pytest.mark.parametrize(
        "groups,cin,pad,stride", [(1, 8, 1, 1), (2, 12, 2, 2), (1, 3, 0, 2)]
    )
    def test_matches_oracle(self, rng, impl, groups, cin, pad, stride):
        b, h, w = 2, 9, 9
        kh = kw = 3
        cout = 16
        cg = cin // groups
        d = 4 if cg >= 4 else 8  # force overhang in the cin=3 case
        s = -(-cg // d)
        k = 12
        x = rng.standard_normal((b, h, w, cin), dtype=np.float32)
        codebooks = rng.standard_normal((s, k, d), dtype=np.float32)
        assignments = rng.integers(0, k, size=(cout, kh, kw, s), dtype=np.uint8)
        bias = rng.standard_normal(cout, dtype=np.float32)
        params = {"codebooks": codebooks, "assignments": assignments, "bias": bias}
        want = np_pq_conv(x, codebooks, assignments, bias, stride, pad, groups)
        got = np.asarray(
            pq_conv(jnp.asarray(x), params, stride=stride, pad=pad, groups=groups,
                    impl=impl)
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_onehot_decode_bit_exact(self, rng):
        """The one-hot matmul decode (in-step 'indecode' formulation) is
        bit-identical to the gather decode: each output element is a sum of
        zeros plus exactly one codebook value."""
        from qcnn_tpu.ops.lut import (
            decode_conv_kernel_onehot, decode_fc_weight_onehot,
        )

        cb = rng.standard_normal((6, 16, 4), dtype=np.float32)
        asmt = rng.integers(0, 16, size=(24, 3, 3, 6), dtype=np.uint8)
        np.testing.assert_array_equal(
            np.asarray(decode_conv_kernel_onehot(cb, asmt, 22)),
            np.asarray(decode_conv_kernel(cb, asmt, 22)),
        )
        asmt_fc = rng.integers(0, 16, size=(32, 6), dtype=np.uint8)
        np.testing.assert_array_equal(
            np.asarray(decode_fc_weight_onehot(cb, asmt_fc, 22)),
            np.asarray(decode_fc_weight(cb, asmt_fc, 22)),
        )

    def test_decode_kernel_groups_share_codebook(self, rng):
        cb = rng.standard_normal((3, 8, 4), dtype=np.float32)
        asmt = rng.integers(0, 8, size=(8, 3, 3, 3), dtype=np.uint8)
        kern = np.asarray(decode_conv_kernel(cb, asmt, 12))
        assert kern.shape == (3, 3, 12, 8)
        # each output channel decodes from the shared codebook
        np.testing.assert_allclose(
            kern[0, 0, :, 0],
            np.concatenate([cb[s, asmt[0, 0, 0, s]] for s in range(3)]),
            rtol=1e-6,
        )


class TestPoolLRN:
    @pytest.mark.parametrize(
    "h,kernel,stride",
    [(55, 3, 2), (27, 3, 2), (13, 3, 2), (10, 2, 2), (9, 3, 3)],
)
    def test_ceil_pool_matches_oracle(self, rng, h, kernel, stride):
        x = rng.standard_normal((2, h, h, 5), dtype=np.float32)
        want = np_max_pool(x, kernel, stride)
        got = np.asarray(caffe_max_pool(jnp.asarray(x), kernel=kernel, stride=stride))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_alexnet_pool_shapes(self, rng):
        # pool1: 55 -> 27 (ceil(52/2)+1), pool2: 27 -> 13, pool5: 13 -> 6
        for h, expect in [(55, 27), (27, 13), (13, 6)]:
            x = jnp.zeros((1, h, h, 4))
            out = caffe_max_pool(x, kernel=3, stride=2)
            assert out.shape[1] == expect

    def test_lrn_matches_oracle(self, rng):
        x = rng.standard_normal((2, 4, 4, 16), dtype=np.float32)
        want = np_lrn(x, 5, 1e-4, 0.75, 1.0)
        got = np.asarray(lrn(jnp.asarray(x), size=5, alpha=1e-4, beta=0.75, k=1.0))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestDenseConv:
    def test_grouped_conv_matches_manual(self, rng):
        b, h, w, cin, cout, ks, groups = 2, 8, 8, 6, 8, 3, 2
        x = rng.standard_normal((b, h, w, cin), dtype=np.float32)
        kern = rng.standard_normal((ks, ks, cin // groups, cout), dtype=np.float32)
        bias = rng.standard_normal(cout, dtype=np.float32)
        got = np.asarray(
            conv_dense(jnp.asarray(x), jnp.asarray(kern), jnp.asarray(bias),
                       stride=1, pad=1, groups=groups)
        )
        # manual: group 0 outputs use channels 0:3, group 1 outputs use 3:6
        xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        want = np.zeros_like(got)
        for o in range(cout):
            g = o // (cout // groups)
            for ho in range(h):
                for wo in range(w):
                    patch = xp[:, ho : ho + ks, wo : wo + ks,
                               g * 3 : (g + 1) * 3]
                    want[:, ho, wo, o] = (
                        patch * kern[:, :, :, o]
                    ).sum(axis=(1, 2, 3)) + bias[o]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestSpaceToDepthConv:
    """The stem-conv space-to-depth rewrite must be exact vs the plain conv."""

    @pytest.mark.parametrize(
        "h,w,k,s,cin",
        [
            (227, 227, 11, 4, 3),   # AlexNet conv1
            (224, 224, 7, 2, 3),    # VggCnnS conv1
            (230, 231, 11, 4, 3),   # ragged: (H-k) % s != 0
            (64, 64, 5, 3, 4),      # non-divisible stride
        ],
    )
    def test_matches_plain_conv(self, rng, h, w, k, s, cin):
        from jax import lax

        from qcnn_tpu.ops.conv import conv_dense, _DN

        x = rng.standard_normal((2, h, w, cin)).astype(np.float32)
        kernel = rng.standard_normal((k, k, cin, 32)).astype(np.float32)
        bias = rng.standard_normal(32).astype(np.float32)
        got = np.asarray(
            conv_dense(x, kernel, bias, stride=s, pad=0,
                       space_to_depth=True)
        )
        want = np.asarray(
            lax.conv_general_dilated(
                x, kernel, (s, s), [(0, 0), (0, 0)],
                dimension_numbers=_DN,
                preferred_element_type=np.float32,
            ) + bias
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_int8_static_scale_zero_floor():
    """A zero static activation scale (all-ReLU-dead calibration layer)
    must quantize to zeros, never divide to NaN (round-2 review)."""
    import jax.numpy as jnp

    from qcnn_tpu.ops.fc import quantize_activations_int8

    x = jnp.asarray(np.zeros((2, 8), np.float32))
    xq, scale = quantize_activations_int8(x, act_scale=0.0)
    assert np.all(np.isfinite(np.asarray(scale)))
    np.testing.assert_array_equal(np.asarray(xq), 0)
    # nonzero input with a zero scale still saturates finitely
    x2 = jnp.asarray(np.ones((2, 8), np.float32))
    xq2, _ = quantize_activations_int8(x2, act_scale=0.0)
    assert np.all(np.abs(np.asarray(xq2)) <= 127)


def test_caffe_max_pool_ceil_pad_clamp(rng):
    """Caffe clamps a ceil-mode output whose window lies entirely in
    padding (pooling_layer.cpp); torch's ceil_mode has the same rule —
    cross-check shapes and values against torch."""
    import torch

    from qcnn_tpu.ops.misc import caffe_max_pool

    for h, k, s, p in [(3, 2, 2, 1), (5, 3, 2, 1), (7, 3, 3, 1),
                       (6, 2, 2, 1)]:
        x = rng.standard_normal((2, h, h, 3)).astype(np.float32)
        got = np.asarray(caffe_max_pool(
            jnp.asarray(x), kernel=k, stride=s, pad=p, ceil_mode=True))
        want = torch.nn.functional.max_pool2d(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            kernel_size=k, stride=s, padding=p, ceil_mode=True,
        ).numpy().transpose(0, 2, 3, 1)
        assert got.shape == want.shape, (h, k, s, p, got.shape, want.shape)
        np.testing.assert_allclose(got, want, rtol=1e-6)
        assert np.isfinite(got).all()
