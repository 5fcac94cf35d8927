"""OPQ input-permutation quantization (quantizer/opq.py).

The permutation changes which dims share a sub-space codeword, never the
algebra: every execution path (in-graph PQ impls, prepare-time decode fold,
checkpoint round-trip) must produce the same y for the same params.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcnn_tpu.quantizer.opq import inverse_permutation, variance_permutation
from qcnn_tpu.quantizer.pq import quantize_conv_layer, quantize_fc_layer


def _aniso_weight(rng, cout, cin, block=4, hi=10.0, lo=0.1):
    """Alternating blocks of high/low column variance — adversarial for
    contiguous sub-space splitting, favourable for balanced allocation."""
    scales = np.where((np.arange(cin) // block) % 2 == 0, hi, lo)
    return (rng.standard_normal((cout, cin)) * scales).astype(np.float32)


def test_variance_permutation_shape_and_validity(rng):
    w = _aniso_weight(rng, 32, 60)
    perm = variance_permutation(w, 16)  # D=4, last group short (60=15*4)
    assert perm.shape == (60,)
    assert sorted(perm.tolist()) == list(range(60))
    inv = inverse_permutation(perm)
    np.testing.assert_array_equal(perm[inv], np.arange(60))


def test_variance_permutation_balances(rng):
    """Each full sub-space gets a mix of high- and low-variance dims."""
    w = _aniso_weight(rng, 64, 64)
    perm = variance_permutation(w, 16)  # D=4
    var = w.var(axis=0)
    groups = perm.reshape(16, 4)
    hi_counts = [(var[g] > 1.0).sum() for g in groups]
    # 32 high-variance dims over 16 groups -> exactly 2 per group
    assert all(c == 2 for c in hi_counts)


def test_opq_reduces_fc_error(rng):
    from qcnn_tpu.ops import lut as lut_ops

    cin, cout, s = 64, 96, 16
    w = _aniso_weight(rng, cout, cin)
    key = jax.random.key(0)

    def rel_err(p):
        wd = np.asarray(lut_ops.decode_fc_weight(
            jnp.asarray(p["codebooks"]), jnp.asarray(p["assignments"]), cin
        ))  # (Cin, Cout) of the (possibly permuted) weight
        wp = w[:, p["perm"]] if "perm" in p else w
        return float(np.linalg.norm(wd.T - wp) / np.linalg.norm(w))

    plain = quantize_fc_layer(key, w, np.zeros(cout),
                              num_subspaces=s, num_codewords=8)
    opq = quantize_fc_layer(key, w, np.zeros(cout),
                            num_subspaces=s, num_codewords=8,
                            opq="variance")
    assert "perm" in opq and "perm" not in plain
    assert rel_err(opq) < 0.75 * rel_err(plain)


@pytest.mark.parametrize(
    "impl", ["onehot", "gather", "decode", "indecode", "gdecode",
             "lutgather"]
)
def test_fc_impls_agree_with_perm(rng, impl):
    from qcnn_tpu.ops.fc import pq_fc

    cin, cout = 48, 64
    w = _aniso_weight(rng, cout, cin)
    p = quantize_fc_layer(jax.random.key(1), w, np.zeros(cout),
                          num_subspaces=12, num_codewords=8, opq="variance")
    pj = {k: (jnp.asarray(v) if k != "perm" else v) for k, v in p.items()}
    x = jnp.asarray(rng.standard_normal((5, cin)), jnp.float32)
    want = np.asarray(pq_fc(x, pj, impl="decode"))
    got = np.asarray(pq_fc(x, pj, impl=impl))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_conv_groups_perm_equivalence(rng):
    """Grouped conv: the shared within-group permutation applies to every
    group's channel block identically."""
    from qcnn_tpu.ops.conv import pq_conv

    cg, cout, k = 8, 12, 3
    kern = rng.standard_normal((cout, cg, k, k)).astype(np.float32)
    kern *= np.where(np.arange(cg) % 2 == 0, 5.0, 0.2)[None, :, None, None]
    p = quantize_conv_layer(jax.random.key(2), kern, np.zeros(cout),
                            num_subspaces=4, num_codewords=8,
                            opq="variance")
    pj = {k_: (jnp.asarray(v) if k_ != "perm" else v) for k_, v in p.items()}
    x = jnp.asarray(rng.standard_normal((2, 9, 9, cg * 2)), jnp.float32)
    y1 = np.asarray(pq_conv(x, pj, stride=1, pad=1, groups=2, impl="decode"))
    y2 = np.asarray(pq_conv(x, pj, stride=1, pad=1, groups=2,
                            impl="indecode"))
    np.testing.assert_allclose(y1, y2, rtol=1e-4, atol=1e-4)


def test_prepare_folds_perm_into_dense(rng):
    """Decode-at-load params must bake the permutation in: the prepared
    dense forward equals the in-graph PQ forward on the same params."""
    from qcnn_tpu.core import (ConvSpec, FCSpec, ModelSpec, ReLUSpec,
                               SoftmaxSpec)
    from qcnn_tpu.models import network
    from qcnn_tpu.models.prepare import prepare_params

    spec = ModelSpec(
        name="opq-t", in_height=8, in_width=8, in_channels=8,
        layers=(
            ConvSpec(kernel=3, out_channels=16, pad=1),
            ReLUSpec(),
            FCSpec(32),
            ReLUSpec(),
            FCSpec(10),
            SoftmaxSpec(),
        ),
    )
    key = jax.random.key(3)
    kern = rng.standard_normal((16, 8, 3, 3)).astype(np.float32)
    kern *= np.where(np.arange(8) % 2 == 0, 4.0, 0.25)[None, :, None, None]
    w1 = _aniso_weight(rng, 32, 16 * 8 * 8)
    w2 = _aniso_weight(rng, 10, 32, block=2)
    params = [
        quantize_conv_layer(key, kern, rng.standard_normal(16),
                            num_subspaces=2, num_codewords=8,
                            opq="variance"),
        None,
        quantize_fc_layer(key, w1, rng.standard_normal(32),
                          num_subspaces=256, num_codewords=8,
                          opq="variance"),
        None,
        quantize_fc_layer(key, w2, rng.standard_normal(10),
                          num_subspaces=16, num_codewords=8,
                          opq="variance"),
        None,
    ]
    x = jnp.asarray(rng.standard_normal((3, 8, 8, 8)), jnp.float32)
    y_graph = np.asarray(network.forward(
        params, x, spec=spec, conv_impl="indecode", fc_impl="indecode"
    ))
    prepared, cis, fis = prepare_params(
        spec, params, conv_impl="decode", fc_impl="decode",
        dtype=jnp.float32,
    )
    assert cis[0] == "dense" and fis[2] == "dense"
    y_dense = np.asarray(network.forward(
        prepared, x, spec=spec, conv_impls=cis, fc_impls=fis,
        compute_dtype=jnp.float32,
    ))
    np.testing.assert_allclose(y_dense, y_graph, rtol=1e-4, atol=1e-5)


def test_checkpoint_roundtrip_with_perm(tmp_path, rng):
    from qcnn_tpu.core import FCSpec, ModelSpec, SoftmaxSpec
    from qcnn_tpu.formats.checkpoint import load_checkpoint, save_checkpoint

    spec = ModelSpec(
        name="opq-ck", in_height=1, in_width=1, in_channels=24,
        layers=(FCSpec(16), SoftmaxSpec()),
    )
    p = quantize_fc_layer(jax.random.key(4),
                          _aniso_weight(rng, 16, 24), np.zeros(16),
                          num_subspaces=6, num_codewords=8, opq="variance")
    save_checkpoint(str(tmp_path / "ck"), spec, [p, None])
    _, params2 = load_checkpoint(str(tmp_path / "ck"))
    np.testing.assert_array_equal(params2[0]["perm"], p["perm"])


def test_reference_export_rejects_perm(tmp_path, rng):
    from qcnn_tpu.core import FCSpec, ModelSpec, SoftmaxSpec
    from qcnn_tpu.models.loader import save_reference_model

    spec = ModelSpec(
        name="opq-exp", in_height=1, in_width=1, in_channels=24,
        layers=(FCSpec(16), SoftmaxSpec()),
    )
    p = quantize_fc_layer(jax.random.key(5),
                          _aniso_weight(rng, 16, 24), np.zeros(16),
                          num_subspaces=6, num_codewords=8, opq="variance")
    with pytest.raises(ValueError, match="OPQ"):
        save_reference_model(spec, [p, None], str(tmp_path), "x")


def test_opq_guard_drops_regressing_permutation(rng, recwarn):
    """quantize --opq fits both splits and keeps the better (round-3
    verdict item 6): on a PQ-degenerate weight (every contiguous sub-space
    holds few distinct sub-vectors) the permutation must be dropped with a
    warning; on the anisotropic case it must be kept silently."""
    import warnings

    from qcnn_tpu.ops import lut as lut_ops

    s, k, d, cout = 16, 4, 4, 64
    # degenerate: each contiguous sub-space = k distinct random sub-vectors
    cw = rng.standard_normal((s, k, d)).astype(np.float32)
    ids = rng.integers(0, k, size=(cout, s))
    w_deg = cw[np.arange(s)[None, :], ids].reshape(cout, s * d)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        res = quantize_fc_layer(
            jax.random.key(0), w_deg, np.zeros(cout),
            num_subspaces=s, num_codewords=k, opq="variance",
        )
    assert "perm" not in res, "regressing permutation must be dropped"
    assert any("regressed" in str(c.message) for c in caught)
    # and the kept contiguous fit reconstructs the degenerate matrix ~exactly
    wd = np.asarray(lut_ops.decode_fc_weight(
        jnp.asarray(res["codebooks"]), jnp.asarray(res["assignments"]),
        s * d))
    assert np.linalg.norm(wd.T - w_deg) / np.linalg.norm(w_deg) < 0.05

    # anisotropic case: permutation helps and is kept, no warning
    w_ani = _aniso_weight(rng, 96, 64)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        res2 = quantize_fc_layer(
            jax.random.key(0), w_ani, np.zeros(96),
            num_subspaces=16, num_codewords=8, opq="variance",
        )
    assert "perm" in res2
    assert not any("regressed" in str(c.message) for c in caught)


def test_conv_opq_guard_drops_regressing_permutation(rng):
    """The conv path applies the same fit-both keep/drop guard as FC:
    a PQ-degenerate kernel (contiguous sub-spaces trivially clusterable)
    must drop the permutation."""
    import warnings

    s, k, d, cout = 8, 4, 4, 16
    cw = rng.standard_normal((s, k, d)).astype(np.float32)
    ids = rng.integers(0, k, size=(cout * 9, s))
    w2 = cw[np.arange(s)[None, :], ids].reshape(cout * 9, s * d)
    kern = np.transpose(
        w2.reshape(cout, 3, 3, s * d), (0, 3, 1, 2))  # OIHW
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        res = quantize_conv_layer(
            jax.random.key(0), kern, np.zeros(cout),
            num_subspaces=s, num_codewords=k, opq="variance",
        )
    assert "perm" not in res
    assert any("regressed" in str(c.message) for c in caught)


def test_quantize_rejects_more_than_256_codewords(rng):
    """uint8 assignments: K > 256 must fail loudly, not wrap mod 256."""
    w = rng.standard_normal((32, 64)).astype(np.float32)
    with pytest.raises(ValueError, match="<= 256"):
        quantize_fc_layer(jax.random.key(0), w, np.zeros(32),
                          num_subspaces=16, num_codewords=512)
    kern = rng.standard_normal((8, 16, 3, 3)).astype(np.float32)
    with pytest.raises(ValueError, match="<= 256"):
        quantize_conv_layer(jax.random.key(0), kern, np.zeros(8),
                            num_subspaces=4, num_codewords=300)
