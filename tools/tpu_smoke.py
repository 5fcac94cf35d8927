#!/usr/bin/env python
"""Compiled-mode Pallas correctness smoke test on REAL TPU hardware.

The pytest suite runs the Pallas kernels in interpreter mode on CPU
(tests/conftest.py forces the virtual mesh), so a Mosaic compile/numerics
regression would pass CI silently (round-1 verdict, weakness #2). This
script runs every Pallas kernel COMPILED on the attached chip against the
decode oracle and exits non-zero on any mismatch. Run it on the TPU rig
after kernel changes (see .claude/skills/verify/SKILL.md); ~2-4 min of
which most is remote compiles.

Usage: timeout 580 python tools/tpu_smoke.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def check(name: str, got: np.ndarray, want: np.ndarray, tol: float) -> bool:
    scale = max(1e-6, float(np.abs(want).max()))
    rel = float(np.abs(got - want).max()) / scale
    ok = rel < tol
    print(f"{'PASS' if ok else 'FAIL'} {name}: max rel err {rel:.3e}",
          flush=True)
    return ok


def main() -> int:
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print("ERROR: no TPU attached (backend="
              f"{jax.default_backend()}); this smoke test is only "
              "meaningful compiled on hardware", file=sys.stderr)
        return 2

    from qcnn_tpu.ops import lut as lut_ops
    from qcnn_tpu.ops.fc import pq_fc_decode
    from qcnn_tpu.ops.pallas import (
        decode_fc_weight_gather,
        pq_fc_fused,
        pq_fc_lut_gather,
        pq_fc_pallas,
    )

    rng = np.random.default_rng(0)
    ok = True
    geoms = [
        ("fc6-like", 2304, 32, 4, 512, 9216, 8),
        ("fc8-like", 512, 16, 1, 256, 512, 3),
        ("odd", 15, 32, 4, 250, 60, 5),
    ]
    for name, s, k, d, cout, cin, b in geoms:
        cb = rng.standard_normal((s, k, d)).astype(np.float32) * 0.1
        asmt = rng.integers(0, k, size=(cout, s), dtype=np.uint8)
        bias = rng.standard_normal(cout).astype(np.float32)
        x = rng.standard_normal((b, cin)).astype(np.float32)
        p = {"codebooks": jnp.asarray(cb), "assignments": jnp.asarray(asmt),
             "bias": jnp.asarray(bias)}
        p_bf = dict(p)
        p_bf["codebooks"] = p["codebooks"].astype(jnp.bfloat16)
        want = np.asarray(
            pq_fc_decode(jnp.asarray(x).astype(jnp.bfloat16), p_bf)
        )
        got = np.asarray(pq_fc_fused(jnp.asarray(x), p, interpret=False))
        ok &= check(f"pq_fc_fused/{name}", got, want, 1e-4)
        got = np.asarray(pq_fc_pallas(jnp.asarray(x), p, interpret=False))
        want_f32 = np.asarray(pq_fc_decode(jnp.asarray(x), p))
        ok &= check(f"pq_fc_pallas/{name}", got, want_f32, 2e-2)
        # dynamic-gather kernels (§9c/§9d): lane orientation compiles on
        # this toolchain (tools/pallas_gather_probe.py) — hard checks, no
        # skips (round-2 ADVICE: skip-on-exception masked real kernel bugs)
        got = np.asarray(pq_fc_fused(
            jnp.asarray(x), p, interpret=False, decode="gather"))
        ok &= check(f"pq_fc_fused-gather/{name}", got, want, 1e-4)
        wd = np.asarray(decode_fc_weight_gather(
            p_bf["codebooks"], p["assignments"], cin, interpret=False))
        wd_want = np.asarray(lut_ops.decode_fc_weight_onehot(
            p_bf["codebooks"], p["assignments"], cin))
        ok &= check(f"decode_gather/{name}", wd, wd_want, 1e-6)
        got = np.asarray(pq_fc_lut_gather(
            jnp.asarray(x), p, interpret=False))
        ok &= check(f"pq_fc_lut_gather/{name}", got, want_f32, 2e-2)

    # conv gather decode (ResNet-style K=128 geometry — the memory-mode
    # decode the one-hot path pays 32x MXU MACs for), both layouts
    from qcnn_tpu.ops.pallas import decode_conv_kernel_gather

    cb = jnp.asarray(
        rng.standard_normal((16, 128, 4)).astype(np.float32) * 0.1,
        jnp.bfloat16)
    asmt_c = jnp.asarray(
        rng.integers(0, 128, size=(64, 3, 3, 16), dtype=np.uint8))
    wk = np.asarray(decode_conv_kernel_gather(cb, asmt_c, 64,
                                              interpret=False))
    wk_want = np.asarray(lut_ops.decode_conv_kernel_onehot(cb, asmt_c, 64))
    ok &= check("decode_conv_gather/resnet-k128", wk, wk_want, 1e-6)
    wk2 = np.asarray(decode_conv_kernel_gather(cb, asmt_c, 64,
                                               layout="iohw",
                                               interpret=False))
    ok &= check("decode_conv_gather-iohw/resnet-k128",
                np.transpose(wk2, (2, 3, 0, 1)), wk_want, 1e-6)

    # full pq_conv impl matrix vs the decode oracle (compiled) — the
    # memory-mode conv arms ship through these (§9e/9f)
    from qcnn_tpu.ops.conv import pq_conv

    xc = jnp.asarray(rng.standard_normal((4, 9, 9, 64)), jnp.float32)
    pc = {"codebooks": cb, "assignments": asmt_c,
          "bias": jnp.asarray(rng.standard_normal(64), jnp.float32)}
    conv_want = np.asarray(pq_conv(xc, pc, stride=2, pad=1, impl="decode"))
    for impl in ("indecode", "indecode_ohwi", "indecode_hwoi",
                 "gdecode", "gdecode_iohw", "gemm"):
        got_c = np.asarray(pq_conv(xc, pc, stride=2, pad=1, impl=impl))
        ok &= check(f"pq_conv/{impl}", got_c, conv_want, 5e-3)

    # fused in-kernel decode-conv (§16b): stride-1 stage3-class geometry
    # (cin >= 256 trips the memory_fused routing gate); bf16 activations
    # inside the kernel -> 2e-2 tolerance like the other bf16 kernels
    cbf3 = jnp.asarray(
        rng.standard_normal((64, 128, 4)).astype(np.float32) * 0.1)
    af3 = jnp.asarray(
        rng.integers(0, 128, size=(96, 3, 3, 64), dtype=np.uint8))
    pf3 = {"codebooks": cbf3, "assignments": af3,
           "bias": jnp.asarray(rng.standard_normal(96), jnp.float32)}
    xf3 = jnp.asarray(rng.standard_normal((2, 7, 7, 256)), jnp.float32)
    fused_want = np.asarray(pq_conv(xf3, pf3, stride=1, pad=1,
                                    impl="decode"))
    # 'memory_fused' routes only bf16 activations to the fused kernel
    # (round-4 review dtype gate) — drive it as production does; the
    # explicit 'fusedconv' arm honors any dtype
    for impl, xa in (("fusedconv", xf3),
                     ("memory_fused", xf3.astype(jnp.bfloat16))):
        got_f = np.asarray(pq_conv(xa, pf3, stride=1, pad=1, impl=impl))
        ok &= check(f"pq_conv/{impl}", got_f, fused_want, 2e-2)

    # fc1x1: the 1x1-as-fc fused-gather arm (round 5). The memory_fused
    # reroute is OFF in production (measured negative, KERNEL_STUDIES
    # §16d) — compile-check the explicit impl, and the reroute machinery
    # with the rule toggled on as the A/B tools run it.
    from qcnn_tpu.ops import conv as conv_mod
    from qcnn_tpu.ops.conv import memory_fused_route

    cb11 = jnp.asarray(
        rng.standard_normal((128, 128, 4)).astype(np.float32) * 0.1)
    a11 = jnp.asarray(
        rng.integers(0, 128, size=(64, 1, 1, 128), dtype=np.uint8))
    p11 = {"codebooks": cb11, "assignments": a11,
           "bias": jnp.asarray(rng.standard_normal(64), jnp.float32)}
    x11 = jnp.asarray(rng.standard_normal((2, 7, 7, 512)), jnp.bfloat16)
    want11 = np.asarray(pq_conv(x11, p11, stride=1, pad=0, impl="decode"))
    saved_rows = conv_mod._FC1X1_MAX_ROWS
    try:
        conv_mod._FC1X1_MAX_ROWS = 4096
        assert memory_fused_route(p11, x11.shape, x11.dtype, stride=1,
                                  pad=0) == "fc1x1", "fc1x1 gate must trip"
        for impl in ("fc1x1", "memory_fused"):
            got11 = np.asarray(pq_conv(x11, p11, stride=1, pad=0,
                                       impl=impl))
            ok &= check(f"pq_conv/{impl}-1x1", got11, want11, 2e-2)
    finally:
        conv_mod._FC1X1_MAX_ROWS = saved_rows

    # batch-1 fc memory arms (the serving path, §9d)
    cbf = jnp.asarray(rng.standard_normal((64, 32, 4)), jnp.float32)
    af1 = jnp.asarray(rng.integers(0, 32, size=(250, 64), dtype=np.uint8))
    p1 = {"codebooks": cbf, "assignments": af1,
          "bias": jnp.asarray(rng.standard_normal(250), jnp.float32)}
    x1 = jnp.asarray(rng.standard_normal((1, 256)), jnp.float32)
    w1_want = np.asarray(pq_fc_decode(x1, p1))
    got1 = np.asarray(pq_fc_lut_gather(x1, p1, interpret=False))
    ok &= check("pq_fc_lut_gather/b1", got1, w1_want, 2e-2)
    got1 = np.asarray(pq_fc_fused(x1, p1, interpret=False,
                                  decode="gather"))
    ok &= check("pq_fc_fused-gather/b1", got1, w1_want, 2e-2)

    # fused LRN (documented negative for perf, but must stay compiled-
    # correct: it is the in-tree Mosaic reference for the §2b study)
    from qcnn_tpu.ops.misc import lrn
    from qcnn_tpu.ops.pallas.lrn_fused import lrn_fused

    kw = dict(size=5, alpha=1e-4, beta=0.75, k=1.0)
    xl = jnp.asarray(rng.standard_normal((8, 13, 13, 96)) * 2, jnp.bfloat16)
    want_l = np.asarray(lrn(xl, impl="band", **kw), np.float32)
    for variant in ("dot", "shift", "roll"):
        got_l = np.asarray(
            lrn_fused(xl, window=variant, tile_m=256, interpret=False, **kw),
            np.float32,
        )
        ok &= check(f"lrn_fused/{variant}", got_l, want_l, 1e-2)
    print("TPU_SMOKE", "OK" if ok else "FAILED", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
