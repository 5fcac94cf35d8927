"""Pallas kernel parity tests (interpreter mode on the CPU mesh).

The jnp gather implementation (ops/fc.py pq_fc_gather) is the oracle — it is
itself parity-tested against the decode path and mirrors the reference's
pointer walk (CaffeEva.cc:1006-1017).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from qcnn_tpu.ops.fc import pq_fc_gather
from qcnn_tpu.ops.pallas import pq_fc_pallas


def _mk(rng, b, cin, cout, s, k, d):
    x = rng.standard_normal((b, cin)).astype(np.float32)
    params = {
        "codebooks": rng.standard_normal((s, k, d)).astype(np.float32),
        "assignments": rng.integers(0, k, size=(cout, s), dtype=np.uint8),
        "bias": rng.standard_normal(cout).astype(np.float32),
    }
    return x, params


@pytest.mark.parametrize(
    "b,cin,cout,s,k,d",
    [
        (8, 64, 256, 16, 32, 4),     # fc-like, everything aligned
        (1, 64, 256, 16, 32, 4),     # batch 1 (padded to sublane tile)
        (5, 60, 250, 15, 32, 4),     # nothing divisible: Cin<S*D, odd Cout/S
        (4, 64, 128, 64, 16, 1),     # fc8 geometry: scalar sub-spaces, K=16
        (2, 96, 200, 12, 128, 8),    # K=128 -> G=1 (conv-style codebook)
        (3, 32, 96, 8, 200, 4),      # K>128 -> int32 index path
    ],
)
def test_pq_fc_pallas_matches_gather(rng, b, cin, cout, s, k, d):
    x, params = _mk(rng, b, cin, cout, s, k, d)
    ref = np.asarray(pq_fc_gather(x, params))
    got = np.asarray(
        pq_fc_pallas(x, params, block_b=8, block_o=128, interpret=True)
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_pq_fc_pallas_alexnet_fc7_shape(rng):
    """Real fc7 geometry: (1024, 32, 4) codebooks, 4096 outputs."""
    x, params = _mk(rng, 8, 4096, 4096, 1024, 32, 4)
    ref = np.asarray(pq_fc_gather(x, params))
    got = np.asarray(pq_fc_pallas(x, params, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=3e-3)


class TestLRNBand:
    @pytest.mark.parametrize("c", [8, 96, 128, 256, 200])
    def test_matches_jnp(self, rng, c):
        from qcnn_tpu.ops.misc import lrn

        x = rng.standard_normal((3, 5, 4, c)).astype(np.float32)
        ref = np.asarray(
            lrn(x, size=5, alpha=1e-4, beta=0.75, k=1.0, impl="jnp")
        )
        got = np.asarray(
            lrn(x, size=5, alpha=1e-4, beta=0.75, k=1.0, impl="band")
        )
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_bf16_and_other_params(self, rng):
        import jax.numpy as jnp

        from qcnn_tpu.ops.misc import lrn

        x = rng.standard_normal((2, 3, 3, 96)).astype(np.float32)
        xb = jnp.asarray(x).astype(jnp.bfloat16)
        ref = np.asarray(
            lrn(xb, size=5, alpha=5e-4, beta=0.75, k=2.0, impl="jnp")
        ).astype(np.float32)
        got = np.asarray(
            lrn(xb, size=5, alpha=5e-4, beta=0.75, k=2.0, impl="band")
        ).astype(np.float32)
        np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize(
    "b,cin,cout,s,k,d",
    [
        (8, 64, 256, 16, 32, 4),     # fc-like, aligned
        (1, 64, 256, 16, 32, 4),     # batch 1 (padded to sublane tile)
        (5, 60, 250, 15, 32, 4),     # Cin < S*D overhang, odd Cout/S
        (4, 64, 128, 64, 16, 1),     # fc8 geometry: D=1, K=16
        (3, 96, 200, 12, 127, 8),    # K at the int8-compare limit
    ],
)
def test_pq_fc_fused_matches_gather(rng, b, cin, cout, s, k, d):
    """Oracle = decode path with bf16 weights/activations — the kernel
    computes in bf16 internally, so the f32 gather oracle differs by bf16
    rounding; against the same-precision decode it matches tightly."""
    import jax.numpy as jnp

    from qcnn_tpu.ops.fc import pq_fc_decode
    from qcnn_tpu.ops.pallas import pq_fc_fused

    x, params = _mk(rng, b, cin, cout, s, k, d)
    bf_params = dict(params)
    bf_params["codebooks"] = params["codebooks"].astype(jnp.bfloat16)
    ref = np.asarray(
        pq_fc_decode(np.asarray(x).astype(jnp.bfloat16), bf_params)
    )
    got = np.asarray(
        pq_fc_fused(x, params, block_o=128, interpret=True)
    )
    assert got.shape == ref.shape
    scale = max(1e-6, float(np.abs(ref).max()))
    assert float(np.abs(got - ref).max()) / scale < 1e-5


def test_pq_fc_fused_rejects_wide_codebooks(rng):
    from qcnn_tpu.ops.pallas import pq_fc_fused

    x, params = _mk(rng, 2, 32, 64, 8, 200, 4)
    with pytest.raises(ValueError, match="K <= 128"):
        pq_fc_fused(x, params, interpret=True)


def test_memory_strategy_resolution(rng):
    """'memory' resolves per measurement (KERNEL_STUDIES §9b-9f): conv ->
    in-step one-hot decode (OHWI); fc -> the gather kernels only for
    weight-dominated (fc6-class) layers — lutgather at batch<=2, the
    fused gather-decode GEMM otherwise — and indecode for small layers
    (the ViT/resnet-head class), K>128, or huge row counts."""
    from qcnn_tpu.core import ConvSpec, FCSpec, ModelSpec, SoftmaxSpec
    from qcnn_tpu.models.network import resolve_strategy

    spec = ModelSpec(
        name="m", in_height=4, in_width=4, in_channels=8,
        layers=(ConvSpec(kernel=3, out_channels=16, pad=1),
                FCSpec(4096), FCSpec(10), SoftmaxSpec()),
    )
    params = [
        {
            "codebooks": np.zeros((1, 16, 8), np.float32),
            "assignments": np.zeros((16, 3, 3, 1), np.uint8),
            "bias": np.zeros(16, np.float32),
        },
        {  # fc6-class: weight-dominated -> gather kernels
            "codebooks": np.zeros((2304, 32, 4), np.float32),
            "assignments": np.zeros((4096, 2304), np.uint8),
            "bias": np.zeros(4096, np.float32),
        },
        {  # small classifier (vit/resnet-head class) -> indecode
            "codebooks": np.zeros((128, 16, 1), np.float32),
            "assignments": np.zeros((10, 128), np.uint8),
            "bias": np.zeros(10, np.float32),
        },
        None,
    ]
    for batch in (8, 256):
        conv_i, fc_i = resolve_strategy(spec, params, batch, "memory",
                                        "memory")
        assert conv_i == ("indecode_ohwi", "-", "-", "-")
        assert fc_i == ("-", "fgather", "indecode", "-")
    conv_i, fc_i = resolve_strategy(spec, params, 1, "memory", "memory")
    assert fc_i == ("-", "lutgather", "indecode", "-")
    # huge row counts (ViT token batches) -> indecode even at fc6 scale
    _, fc_i = resolve_strategy(spec, params, 6304, "memory", "memory")
    assert fc_i == ("-", "indecode", "indecode", "-")
    # K > 128 exceeds the one-vreg gather table -> indecode fallback
    params_wide = list(params)
    params_wide[1] = dict(
        params[1],
        codebooks=np.zeros((2304, 256, 4), np.float32),
    )
    _, fc_i = resolve_strategy(spec, params_wide, 256, "memory", "memory")
    assert fc_i == ("-", "indecode", "indecode", "-")


# ---------------------------------------------------------------------------
# fused single-pass LRN (ops/pallas/lrn_fused.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape,tile_m", [
    ((4, 7, 7, 96), 64),     # AlexNet channel count, ragged M
    ((2, 5, 5, 256), 32),    # norm2 channel count, exact M
    ((3, 130), 16),          # rank-2, >128 lanes, ragged M
])
def test_lrn_fused_bit_identical(rng, shape, tile_m):
    """The fused kernel must bit-match the shipped XLA band path (same
    bf16-square + f32-accumulate precision contract)."""
    from qcnn_tpu.ops.misc import lrn
    from qcnn_tpu.ops.pallas.lrn_fused import lrn_fused

    kw = dict(size=5, alpha=1e-4, beta=0.75, k=1.0)
    x = jnp.asarray(rng.standard_normal(shape) * 3, jnp.bfloat16)
    want = lrn(x, impl="band", **kw)
    for pad in (True, False):
        got = lrn_fused(x, tile_m=tile_m, pad_lanes=pad, interpret=True,
                        **kw)
        assert jnp.all(got == want), f"pad_lanes={pad}"
    # 'roll' (the round-3 negative, §2b): same bf16-square precision as
    # the band path but f32 adds in a different order — tolerance, not
    # bit-equality
    got = lrn_fused(x, window="roll", tile_m=tile_m, interpret=True, **kw)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2)


def test_lrn_fused_other_betas(rng):
    from qcnn_tpu.ops.misc import lrn
    from qcnn_tpu.ops.pallas.lrn_fused import lrn_fused

    x = jnp.asarray(rng.standard_normal((2, 3, 3, 96)), jnp.bfloat16)
    for beta in (0.5, 1.0):
        kw = dict(size=5, alpha=2e-5, beta=beta, k=2.0)
        got = lrn_fused(x, tile_m=16, interpret=True, **kw)
        want = lrn(x, impl="band", **kw)
        assert jnp.all(got == want)


@pytest.mark.parametrize(
    "cout,s,k,d,cin",
    [
        (256, 16, 32, 4, 64),    # fc-like, aligned
        (250, 15, 32, 4, 58),    # ragged everything, Cin < S*D
        (64, 8, 128, 4, 32),     # ResNet conv geometry: K=128
        (128, 64, 16, 1, 64),    # scalar sub-spaces
    ],
)
def test_decode_fc_gather_matches_oracle(rng, cout, s, k, d, cin):
    """The Pallas gather decode must bit-match the jnp gather decode."""
    from qcnn_tpu.ops import lut
    from qcnn_tpu.ops.pallas import decode_fc_weight_gather

    cb = rng.standard_normal((s, k, d)).astype(np.float32)
    asmt = rng.integers(0, k, size=(cout, s), dtype=np.uint8)
    want = np.asarray(lut.decode_fc_weight(jnp.asarray(cb), asmt, cin))
    got = np.asarray(
        decode_fc_weight_gather(jnp.asarray(cb), jnp.asarray(asmt), cin,
                                interpret=True)
    )
    assert got.shape == want.shape
    assert np.array_equal(got, want)


@pytest.mark.parametrize(
    "cout,kh,kw,s,k,d,cg",
    [
        (96, 11, 11, 1, 32, 8, 3),   # AlexNet conv1: overhang (3 < 8)
        (64, 3, 3, 16, 128, 4, 64),  # ResNet-style 3x3, K=128
        (40, 1, 1, 9, 16, 4, 36),    # 1x1 projection, ragged Cout
    ],
)
def test_decode_conv_gather_matches_oracle(rng, cout, kh, kw, s, k, d, cg):
    from qcnn_tpu.ops import lut
    from qcnn_tpu.ops.pallas import decode_conv_kernel_gather

    cb = rng.standard_normal((s, k, d)).astype(np.float32)
    asmt = rng.integers(0, k, size=(cout, kh, kw, s), dtype=np.uint8)
    want = np.asarray(lut.decode_conv_kernel(jnp.asarray(cb), asmt, cg))
    got = np.asarray(
        decode_conv_kernel_gather(jnp.asarray(cb), jnp.asarray(asmt), cg,
                                  interpret=True)
    )
    assert got.shape == want.shape
    assert np.array_equal(got, want)


def test_decode_gather_bf16(rng):
    """bf16 codebooks decode to bf16, bit-identical to the gather oracle."""
    from qcnn_tpu.ops import lut
    from qcnn_tpu.ops.pallas import decode_fc_weight_gather

    cb = jnp.asarray(rng.standard_normal((12, 32, 4)), jnp.bfloat16)
    asmt = rng.integers(0, 32, size=(100, 12), dtype=np.uint8)
    want = lut.decode_fc_weight(cb, jnp.asarray(asmt), 48)
    got = decode_fc_weight_gather(cb, jnp.asarray(asmt), 48, interpret=True)
    assert got.dtype == jnp.bfloat16
    assert jnp.all(got == want)


def test_network_gdecode_matches_decode(rng):
    """Full tiny network with conv/fc impl='gdecode' (Pallas gather decode,
    interpret mode on CPU) must match the decode-at-trace path."""
    from qcnn_tpu.core import (ConvSpec, FCSpec, ModelSpec, ReLUSpec,
                               SoftmaxSpec)
    from qcnn_tpu.models import network, synth

    spec = ModelSpec(
        name="tg", in_height=8, in_width=8, in_channels=4,
        layers=(
            ConvSpec(kernel=3, out_channels=16, pad=1),
            ReLUSpec(),
            FCSpec(32),
            ReLUSpec(),
            FCSpec(10),
            SoftmaxSpec(),
        ),
    )
    params = synth.random_pq_params(spec, seed=2)
    x = synth.random_input(spec, 4, seed=3)
    want = np.asarray(network.forward(params, x, spec=spec,
                                      conv_impl="decode", fc_impl="decode"))
    got = np.asarray(network.forward(params, x, spec=spec,
                                     conv_impl="gdecode", fc_impl="gdecode"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize(
    "b,cin,cout,s,k,d",
    [
        (8, 64, 256, 16, 32, 4),
        (5, 60, 250, 15, 32, 4),   # ragged everything, Cin < S*D
        (4, 64, 128, 64, 16, 1),   # scalar sub-spaces
    ],
)
def test_pq_fc_fused_gather_decode(rng, b, cin, cout, s, k, d):
    """decode='gather' (in-kernel dynamic gather) must bit-match the
    select-accumulate decode — same tile values, different mechanics."""
    from qcnn_tpu.ops.pallas import pq_fc_fused

    x, params = _mk(rng, b, cin, cout, s, k, d)
    want = np.asarray(
        pq_fc_fused(x, params, block_b=8, block_o=128, block_s=128,
                    interpret=True, decode="select")
    )
    got = np.asarray(
        pq_fc_fused(x, params, block_b=8, block_o=128, block_s=128,
                    interpret=True, decode="gather")
    )
    assert np.array_equal(got, want)


@pytest.mark.parametrize(
    "b,cin,cout,s,k,d",
    [
        (8, 64, 256, 16, 32, 4),
        (1, 64, 256, 16, 32, 4),     # batch 1 — the kernel's target case
        (5, 60, 250, 15, 32, 4),     # ragged, Cin < S*D overhang
        (4, 64, 128, 64, 16, 1),     # scalar sub-spaces
        (2, 96, 200, 12, 128, 8),    # K at the one-vreg lane limit
    ],
)
def test_pq_fc_lut_gather_matches_gather(rng, b, cin, cout, s, k, d):
    """LUT + in-kernel gather-accumulate vs the jnp gather oracle (both
    build the same f32 LUT; only the accumulation order differs)."""
    from qcnn_tpu.ops.pallas import pq_fc_lut_gather

    x, params = _mk(rng, b, cin, cout, s, k, d)
    ref = np.asarray(pq_fc_gather(x, params))
    got = np.asarray(
        pq_fc_lut_gather(x, params, block_s=128, interpret=True)
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_pq_fc_lut_gather_rejects_wide_codebooks(rng):
    from qcnn_tpu.ops.pallas import pq_fc_lut_gather

    x, params = _mk(rng, 2, 32, 64, 8, 200, 4)
    with pytest.raises(ValueError, match="K <= 128"):
        pq_fc_lut_gather(x, params, interpret=True)


@pytest.mark.parametrize(
    "cout,kh,kw,s,k,d,cg",
    [
        (96, 11, 11, 1, 32, 8, 3),   # overhang (3 < 8)
        (64, 3, 3, 16, 128, 4, 64),  # ResNet-style 3x3, K=128
        (40, 1, 1, 9, 16, 4, 36),    # 1x1 projection, ragged Cout
    ],
)
def test_decode_conv_gather_iohw_layout(rng, cout, kh, kw, s, k, d, cg):
    """layout='iohw' (interleaved kernel, no post-transpose) must equal the
    HWIO decode re-ordered."""
    from qcnn_tpu.ops import lut
    from qcnn_tpu.ops.pallas import decode_conv_kernel_gather

    cb = rng.standard_normal((s, k, d)).astype(np.float32)
    asmt = rng.integers(0, k, size=(cout, kh, kw, s), dtype=np.uint8)
    want = np.asarray(lut.decode_conv_kernel(jnp.asarray(cb), asmt, cg))
    got = np.asarray(decode_conv_kernel_gather(
        jnp.asarray(cb), jnp.asarray(asmt), cg, layout="iohw",
        interpret=True))
    assert got.shape == (cg, cout, kh, kw)
    np.testing.assert_array_equal(np.transpose(got, (2, 3, 0, 1)), want)


def test_decode_fc_gather_interleaved_matches(rng):
    from qcnn_tpu.ops import lut
    from qcnn_tpu.ops.pallas import decode_fc_weight_gather

    s, k, d, cout, cin = 33, 32, 4, 100, 130
    cb = rng.standard_normal((s, k, d)).astype(np.float32)
    asmt = rng.integers(0, k, size=(cout, s), dtype=np.uint8)
    want = np.asarray(lut.decode_fc_weight(jnp.asarray(cb), asmt, cin))
    for interleaved in (False, True):
        got = np.asarray(decode_fc_weight_gather(
            jnp.asarray(cb), jnp.asarray(asmt), cin, interpret=True,
            interleaved=interleaved))
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("impl", ["indecode_ohwi", "gdecode_iohw"])
def test_pq_conv_layout_impls_match_decode(rng, impl):
    """The layout-preserving conv impls are bit-compatible with 'decode'
    (stride/pad/groups exercised)."""
    from qcnn_tpu.ops.conv import pq_conv

    s, k, d = 12, 16, 4
    cout, kh, kw, groups = 32, 3, 3, 2
    cg = s * d // 1  # per-group channels = S*D
    cb = rng.standard_normal((s, k, d)).astype(np.float32)
    asmt = rng.integers(0, k, size=(cout, kh, kw, s), dtype=np.uint8)
    params = {"codebooks": jnp.asarray(cb), "assignments": jnp.asarray(asmt),
              "bias": jnp.asarray(rng.standard_normal(cout), jnp.float32)}
    x = jnp.asarray(
        rng.standard_normal((2, 9, 9, cg * groups)), jnp.float32)
    want = np.asarray(pq_conv(x, params, stride=2, pad=1, groups=groups,
                              impl="decode"))
    got = np.asarray(pq_conv(x, params, stride=2, pad=1, groups=groups,
                             impl=impl))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "cout,kh,kw,s,k,d,cg,stride,pad",
    [
        (32, 3, 3, 12, 16, 4, 48, 1, 1),
        (24, 3, 3, 12, 16, 4, 48, 2, 1),   # strided
        (16, 5, 5, 8, 16, 4, 32, 2, 0),    # 5x5, no pad
    ],
)
def test_pq_conv_gemm_matches_decode(rng, cout, kh, kw, s, k, d, cg,
                                     stride, pad):
    """im2col-GEMM memory conv (§9f) vs the decode oracle."""
    from qcnn_tpu.ops.conv import pq_conv

    cb = rng.standard_normal((s, k, d)).astype(np.float32)
    asmt = rng.integers(0, k, size=(cout, kh, kw, s), dtype=np.uint8)
    params = {"codebooks": jnp.asarray(cb), "assignments": jnp.asarray(asmt),
              "bias": jnp.asarray(rng.standard_normal(cout), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((2, 9, 9, cg)), jnp.float32)
    want = np.asarray(pq_conv(x, params, stride=stride, pad=pad,
                              impl="decode"))
    got = np.asarray(pq_conv(x, params, stride=stride, pad=pad,
                             impl="gemm"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_pq_conv_memory_impl_routes_by_geometry(rng):
    """'memory' picks GEMM for weight-heavy multi-tap convs and the OHWI
    one-hot decode otherwise — both must match 'decode'."""
    from qcnn_tpu.ops.conv import _gemm_wins, pq_conv

    # tiny spatial, big weight -> gemm; big spatial, small weight -> conv
    assert _gemm_wins((4, 7, 7, 512), 512, 3, 3, 1, 1, 1)
    assert not _gemm_wins((64, 56, 56, 64), 64, 3, 3, 1, 1, 1)
    assert not _gemm_wins((4, 7, 7, 512), 512, 1, 1, 1, 1, 0)

    s, k, d, cout, cg = 16, 16, 4, 40, 64
    cb = rng.standard_normal((s, k, d)).astype(np.float32)
    asmt = rng.integers(0, k, size=(cout, 3, 3, s), dtype=np.uint8)
    params = {"codebooks": jnp.asarray(cb), "assignments": jnp.asarray(asmt),
              "bias": jnp.asarray(rng.standard_normal(cout), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((2, 5, 5, cg)), jnp.float32)
    want = np.asarray(pq_conv(x, params, stride=1, pad=1, impl="decode"))
    got = np.asarray(pq_conv(x, params, stride=1, pad=1, impl="memory"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


# ---------------------------------------------------------------------------
# fused in-kernel decode-conv (ops/pallas/pq_conv_fused.py, round 4)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "b,h,w,cin,cout,kh,pad,s,k,d",
    [
        (2, 7, 7, 64, 96, 3, 1, 16, 16, 4),     # stage3-shaped
        (3, 9, 11, 32, 128, 3, 1, 8, 32, 4),    # non-square spatial
        (1, 14, 14, 48, 64, 5, 2, 24, 128, 2),  # 5x5 taps, D=2, K=128
        (2, 7, 7, 50, 70, 3, 1, 13, 16, 4),     # ragged cin/cout/S
    ],
)
def test_pq_conv_fused_matches_decode(rng, b, h, w, cin, cout, kh, pad,
                                      s, k, d):
    """In-kernel gather-decode + tap GEMMs vs the decode oracle (interpret
    mode; the compiled path is gated by tools/tpu_smoke.py)."""
    from qcnn_tpu.ops.conv import pq_conv
    from qcnn_tpu.ops.pallas.pq_conv_fused import pq_conv_fused

    cb = (rng.standard_normal((s, k, d)) * 0.3).astype(np.float32)
    asmt = rng.integers(0, k, size=(cout, kh, kh, s), dtype=np.uint8)
    params = {"codebooks": jnp.asarray(cb), "assignments": jnp.asarray(asmt),
              "bias": jnp.asarray(rng.standard_normal(cout), jnp.float32)}
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    want = np.asarray(pq_conv(jnp.asarray(x), params, stride=1, pad=pad,
                              impl="decode"))
    got = np.asarray(pq_conv_fused(jnp.asarray(x, jnp.bfloat16), params,
                                   stride=1, pad=pad, interpret=True))
    assert got.shape == want.shape
    rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
    assert rel < 2e-2, rel  # bf16 activation quantization


def test_pq_conv_memory_fused_mix(rng):
    """'memory_fused' routes qualifying bf16 geometries to the fused
    kernel, everything else (incl. EVERY f32 caller — the round-4 review
    dtype gate) to the OHWI one-hot decode."""
    from qcnn_tpu.ops.conv import pq_conv
    from qcnn_tpu.ops.pallas.pq_conv_fused import _auto_block_b, supports

    s, k, d, cout = 64, 16, 4, 40
    cb = (rng.standard_normal((s, k, d)) * 0.3).astype(np.float32)
    asmt = rng.integers(0, k, size=(cout, 3, 3, s), dtype=np.uint8)
    params = {"codebooks": jnp.asarray(cb), "assignments": jnp.asarray(asmt),
              "bias": jnp.asarray(rng.standard_normal(cout), jnp.float32)}
    x32 = jnp.asarray(rng.standard_normal((2, 5, 5, 256)), jnp.float32)
    x16 = x32.astype(jnp.bfloat16)
    for stride in (1, 2):  # stride-2 exercises the geometry fallback arm
        want = np.asarray(pq_conv(x16, params, stride=stride, pad=1,
                                  impl="decode"))
        got = np.asarray(pq_conv(x16, params, stride=stride, pad=1,
                                 impl="memory_fused"))
        # fused computes with bf16 activations; scale tolerance to |y|max
        rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
        assert rel < 2e-2, rel
    # dtype gate: an f32 caller must get the f32-EXACT one-hot decode,
    # never a silent bf16 quantization (review finding: f32 memory-mode
    # resnet runs degraded 2.4e-3 before this gate)
    want32 = np.asarray(pq_conv(x32, params, stride=1, pad=1,
                                impl="decode"))
    got32 = np.asarray(pq_conv(x32, params, stride=1, pad=1,
                               impl="memory_fused"))
    np.testing.assert_allclose(got32, want32, rtol=1e-5, atol=1e-5)
    # ... while the explicit 'fusedconv' impl honors the caller's choice
    got_exp = np.asarray(pq_conv(x32, params, stride=1, pad=1,
                                 impl="fusedconv"))
    rel = np.abs(got_exp - want32).max() / max(np.abs(want32).max(), 1e-9)
    assert 1e-5 < rel < 2e-2, rel  # really the bf16 kernel
    # the cin gate: small-channel convs stay on the one-hot decode
    assert supports(params, stride=1, groups=1, cin=512)
    assert not supports(params, stride=1, groups=1, cin=64)
    assert not supports(params, stride=2, groups=1)
    # VMEM-aware batch tile: 56x56 grids shrink the block, 7x7 keeps it
    assert _auto_block_b(56, 56, 1, 3, 3, 8) < 8
    assert _auto_block_b(7, 7, 1, 3, 3, 8) == 8


# ---------------------------------------------------------------------------
# fc1x1: memory-mode 1x1 convs through the fc fused-gather kernel (round 5)
# ---------------------------------------------------------------------------

def _fc1x1_params(rng, cout, s, k=16, d=4):
    cb = (rng.standard_normal((s, k, d)) * 0.3).astype(np.float32)
    asmt = rng.integers(0, k, size=(cout, 1, 1, s), dtype=np.uint8)
    return {"codebooks": jnp.asarray(cb), "assignments": jnp.asarray(asmt),
            "bias": jnp.asarray(rng.standard_normal(cout), jnp.float32)}


@pytest.mark.parametrize("stride,hw", [(1, 5), (2, 5), (2, 7)])
def test_pq_conv_fc1x1_matches_decode(rng, stride, hw):
    """impl='fc1x1' (1x1 conv as the memory-mode fc fused-gather kernel
    over the flattened spatial batch) vs the decode oracle, including the
    stride pre-slice arm (odd spatial dims -> ceil rows)."""
    from qcnn_tpu.ops.conv import pq_conv

    cin, cout = 64, 16  # cin >= 4*cout
    params = _fc1x1_params(rng, cout, s=cin // 4)
    x = jnp.asarray(rng.standard_normal((2, hw, hw, cin)), jnp.bfloat16)
    want = np.asarray(pq_conv(x, params, stride=stride, pad=0,
                              impl="decode"))
    got = np.asarray(pq_conv(x, params, stride=stride, pad=0,
                             impl="fc1x1"))
    assert got.shape == want.shape
    rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
    assert rel < 2e-2, rel  # bf16 activations in-kernel (§16b precision)


def test_pq_conv_fc1x1_rejects_bad_geometry(rng):
    from qcnn_tpu.ops.conv import pq_conv

    params = _fc1x1_params(rng, 16, s=16)
    x = jnp.asarray(rng.standard_normal((1, 5, 5, 64)), jnp.bfloat16)
    with pytest.raises(ValueError, match="fc1x1"):
        pq_conv(x, params, stride=1, pad=1, impl="fc1x1")  # pad != 0
    with pytest.raises(ValueError, match="fc1x1"):
        pq_conv(x, params, stride=1, pad=0, groups=2, impl="fc1x1")
    multi = _fc1x1_params(rng, 16, s=16)
    multi["assignments"] = jnp.asarray(
        rng.integers(0, 16, size=(16, 3, 3, 16), dtype=np.uint8))
    with pytest.raises(ValueError, match="fc1x1"):
        pq_conv(x, multi, stride=1, pad=0, impl="fc1x1")


def test_memory_fused_route_gates(rng):
    """Boundary tests for the production routing predicate shared by
    pq_conv('memory_fused') and the profiler phase split.

    The fc1x1 reroute is DISABLED in production (_FC1X1_MAX_ROWS = 0:
    measured negative, KERNEL_STUDIES §16d) — the gate boundary logic is
    tested with the rule toggled on, as the A/B tools do."""
    from qcnn_tpu.ops import conv as conv_mod
    from qcnn_tpu.ops.conv import memory_fused_route

    bf16, f32 = jnp.bfloat16, jnp.float32
    p = _fc1x1_params(rng, 64, s=64)  # 1x1, cout=64 -> needs cin >= 256

    def route(shape, dtype=bf16, **kw):
        kw.setdefault("stride", 1)
        kw.setdefault("pad", 0)
        return memory_fused_route(p, shape, dtype, **kw)

    # production default: the reroute is OFF — every 1x1 takes the decode
    assert conv_mod._FC1X1_MAX_ROWS == 0
    assert route((1, 8, 8, 256)) == "indecode_ohwi"
    saved = conv_mod._FC1X1_MAX_ROWS
    try:
        conv_mod._FC1X1_MAX_ROWS = 4096
        # qualifying reduction: cin/cout ratio exactly at the gate
        assert route((1, 8, 8, 256)) == "fc1x1"
        assert route((1, 8, 8, 255)) == "indecode_ohwi"  # ratio below 4x
        # row cap: 4096 rows pass, 4097 don't
        assert route((64, 8, 8, 256)) == "fc1x1"
        assert route((65, 8, 8, 256)) == "indecode_ohwi"
        # bf16-only (both fused kernels compute with bf16 activations)
        assert route((1, 8, 8, 256), dtype=f32) == "indecode_ohwi"
        # pad / groups exclude the FC reformulation
        assert route((1, 8, 8, 256), pad=1) == "indecode_ohwi"
        assert route((1, 8, 8, 512), groups=2) == "indecode_ohwi"
        # stride rows use the PRE-SLICE shape, ceil(h/stride): 9x9/s2 ->
        # 5x5 rows; b=163 -> 4075 <= 4096 passes, b=164 -> 4100 rejects —
        # the floor rule (164*16=2624) would have (wrongly) accepted
        assert route((163, 9, 9, 256), stride=2) == "fc1x1"
        assert route((164, 9, 9, 256), stride=2) == "indecode_ohwi"
    finally:
        conv_mod._FC1X1_MAX_ROWS = saved
    # multi-tap stays on the fused conv kernel where supported,
    # independent of the fc1x1 rule
    pm = _fc1x1_params(rng, 64, s=64)
    pm["assignments"] = jnp.asarray(
        rng.integers(0, 16, size=(64, 3, 3, 64), dtype=np.uint8))
    assert memory_fused_route(pm, (1, 8, 8, 256), bf16, stride=1,
                              pad=1) == "fusedconv"


def test_fused_kernel_guards(rng):
    """Round-5 hardening: mismatched params and oversized grids fail
    with clear errors (or fall back) instead of silently corrupting or
    dying in the Mosaic compiler."""
    from qcnn_tpu.ops.conv import memory_fused_route
    from qcnn_tpu.ops.pallas import pq_fc_fused
    from qcnn_tpu.ops.pallas.pq_conv_fused import fits_vmem, pq_conv_fused

    # assignments S != codebooks S: silent decode corruption -> error
    cb = (rng.standard_normal((64, 16, 4)) * 0.3).astype(np.float32)
    asmt = rng.integers(0, 16, size=(40, 3, 3, 60), dtype=np.uint8)
    p = {"codebooks": jnp.asarray(cb), "assignments": jnp.asarray(asmt),
         "bias": jnp.asarray(np.zeros(40, np.float32))}
    x = jnp.asarray(rng.standard_normal((1, 7, 7, 256)), jnp.bfloat16)
    with pytest.raises(ValueError, match="S=60 != codebooks"):
        pq_conv_fused(x, p, stride=1, pad=1, interpret=True)
    # codebooks covering fewer features than Cin: clear error, not a
    # negative-pad trace failure
    fc_p = {"codebooks": jnp.asarray(cb),
            "assignments": jnp.asarray(
                rng.integers(0, 16, size=(40, 64), dtype=np.uint8)),
            "bias": jnp.asarray(np.zeros(40, np.float32))}
    with pytest.raises(ValueError, match="cover 256 features"):
        pq_fc_fused(jnp.zeros((2, 512), jnp.bfloat16), fc_p,
                    interpret=True)
    # oversized single image: route falls back instead of compiling
    assert fits_vmem(7, 7, 1, 3, 3)
    assert not fits_vmem(96, 96, 1, 3, 3)
    pm = {"codebooks": jnp.asarray(cb),
          "assignments": jnp.asarray(
              rng.integers(0, 16, size=(40, 3, 3, 64), dtype=np.uint8)),
          "bias": jnp.asarray(np.zeros(40, np.float32))}
    assert memory_fused_route(pm, (1, 7, 7, 256), jnp.bfloat16,
                              stride=1, pad=1) == "fusedconv"
    assert memory_fused_route(pm, (1, 96, 96, 256), jnp.bfloat16,
                              stride=1, pad=1) == "indecode_ohwi"


def test_pq_conv_memory_fused_fc1x1_with_perm(rng):
    """Regression for the round-4 advisor HIGH finding: an OPQ perm
    carried into the memory_fused fc1x1 reroute was applied twice
    (rel err 1.34). The recursion must strip 'perm' after x is permuted."""
    from qcnn_tpu.ops import conv as conv_mod
    from qcnn_tpu.ops.conv import pq_conv

    cin, cout = 64, 16
    params = _fc1x1_params(rng, cout, s=cin // 4)
    params["perm"] = jnp.asarray(rng.permutation(cin).astype(np.int32))
    x = jnp.asarray(rng.standard_normal((2, 5, 5, cin)), jnp.bfloat16)
    want = np.asarray(pq_conv(x, params, stride=1, pad=0, impl="decode"))
    saved = conv_mod._FC1X1_MAX_ROWS
    try:
        conv_mod._FC1X1_MAX_ROWS = 4096  # the rule is off in production
        got = np.asarray(pq_conv(x, params, stride=1, pad=0,
                                 impl="memory_fused"))
    finally:
        conv_mod._FC1X1_MAX_ROWS = saved
    rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
    assert rel < 2e-2, rel
    # and the multi-tap fused route with perm, same invariant
    pm = _fc1x1_params(rng, 40, s=64)
    pm["assignments"] = jnp.asarray(
        rng.integers(0, 16, size=(40, 3, 3, 64), dtype=np.uint8))
    pm["perm"] = jnp.asarray(rng.permutation(256).astype(np.int32))
    xm = jnp.asarray(rng.standard_normal((2, 5, 5, 256)), jnp.bfloat16)
    want = np.asarray(pq_conv(xm, pm, stride=1, pad=1, impl="decode"))
    got = np.asarray(pq_conv(xm, pm, stride=1, pad=1,
                             impl="memory_fused"))
    rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
    assert rel < 2e-2, rel
