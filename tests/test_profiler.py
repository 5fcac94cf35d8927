"""Per-layer profiler (the DispElpsTime contract, CaffeEva.cc:297-326)
including the round-4 PQ phase split: memory-mode layers report decode/
LUT-build vs contract time per call (swCompLkupTblConv/swEstiInPdValConv).
"""

import jax.numpy as jnp
import numpy as np

from qcnn_tpu.core import (
    ConvSpec, FCSpec, ModelSpec, PoolSpec, ReLUSpec, SoftmaxSpec,
)
from qcnn_tpu.eval.profiler import format_table, profile_layers
from qcnn_tpu.models import synth
from qcnn_tpu.models.prepare import prepare_params


def _spec():
    return ModelSpec(
        name="tprof", in_height=8, in_width=8, in_channels=8,
        layers=(
            ConvSpec(kernel=3, out_channels=16, pad=1),
            ReLUSpec(),
            PoolSpec(kernel=2, stride=2),
            FCSpec(32),
            ReLUSpec(),
            FCSpec(10),
            SoftmaxSpec(),
        ),
    )


def test_phase_split_memory_mode(rng):
    spec = _spec()
    params = synth.random_pq_params(spec, seed=0)
    prep, ci, fi = prepare_params(
        spec, params, batch_hint=4, conv_impl="indecode",
        fc_impl="indecode", dtype=jnp.bfloat16,
    )
    x = synth.random_input(spec, 4, seed=1)
    profs = profile_layers(spec, prep, x, conv_impls=ci, fc_impls=fi,
                           compute_dtype=jnp.bfloat16, k1=1, k2=3,
                           verbose=False)
    by_idx = {p.index: p for p in profs}
    # in-step decode layers report the decode phase; its time never exceeds
    # the layer total (clamped) and phase2 is the difference
    for i in (0, 3, 5):
        p = by_idx[i]
        assert p.phase_label == "decode"
        assert p.phase1_seconds is not None
        assert 0.0 <= p.phase1_seconds <= p.seconds + 1e-9
        assert abs(p.phase2_seconds - (p.seconds - p.phase1_seconds)) < 1e-9
    # parameter-free layers have no phases
    assert by_idx[1].phase_label is None and by_idx[2].phase_label is None
    table = format_table(profs)
    assert "decode=" in table and "contract=" in table


def test_phase_split_fused_and_lut(rng):
    spec = _spec()
    params = synth.random_pq_params(spec, seed=0)
    prep, ci, fi = prepare_params(
        spec, params, batch_hint=4, conv_impl="lut", fc_impl="fused",
        dtype=jnp.float32,
    )
    x = synth.random_input(spec, 4, seed=1)
    profs = profile_layers(spec, prep, x, conv_impls=ci, fc_impls=fi,
                           compute_dtype=jnp.float32, k1=1, k2=3,
                           verbose=False)
    conv = next(p for p in profs if p.kind == "Conv")
    assert conv.phase_label == "lut-build"
    assert conv.phase1_seconds is not None
    fc = next(p for p in profs if p.kind == "FC")
    # fused kernels are inseparable by timing; the profiler reports the
    # §9 roofline-model estimate of the in-kernel decode phase (round-5
    # verdict item 7) so the DispElpsTime contract stays complete
    assert fc.phase_label == "fused-est-decode"
    assert fc.phase1_seconds is not None
    assert 0.0 <= fc.phase1_seconds <= fc.seconds + 1e-9
    table = format_table(profs)
    assert "fused[est decode=" in table and "lut-build=" in table


def test_dense_layers_report_no_phases(rng):
    spec = _spec()
    params = synth.random_pq_params(spec, seed=0)
    prep, ci, fi = prepare_params(spec, params, batch_hint=4,
                                  dtype=jnp.float32)
    x = synth.random_input(spec, 4, seed=1)
    profs = profile_layers(spec, prep, x, conv_impls=ci, fc_impls=fi,
                           compute_dtype=jnp.float32, k1=1, k2=3,
                           verbose=False)
    assert all(p.phase_label is None for p in profs)
    # table sums match the per-layer seconds
    total = sum(p.seconds for p in profs)
    assert f"TOTAL {total*1e6:10.1f}" in format_table(profs)
    # shapes thread through the pipeline
    assert profs[-1].out_shape == (4, 10)
    assert np.isfinite(total)
