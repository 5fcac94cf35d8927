"""Quantizer quality on REAL weight distributions.

No FP32 checkpoints ship offline, but the reference's decoded PQ weights
W̃ = decode(codebooks, assignments) are real (trained) weight statistics.
Re-quantizing W̃ with our JAX k-means at the same (S, K, D) geometry answers:
does our quantizer find codebooks as good as the reference's MATLAB ones?

Metric: relative reconstruction error ||Q(W̃) - W̃|| / ||W̃||. The reference's
own codebooks reconstruct W̃ exactly (error 0) by construction, so the
interesting comparison is against theory: a fresh quantization of an
already-K-clustered matrix should reach near-zero error if k-means recovers
the clusters.

Usage: python benchmarks/quantizer_quality.py [--layers 18 21]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# 0-based layer index -> (name, kind); files are numbered index+1
# (SURVEY.md §2a: fc7 = file 19, fc8 = file 22)
LAYERS = {
    8: ("conv3", "conv"),
    18: ("fc7", "fc"),
    21: ("fc8", "fc"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, nargs="+", default=[18, 21])
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--ec", action="store_true",
                    help="also compare error-corrected vs plain at K/2")
    ap.add_argument("--opq", action="store_true",
                    help="also compare OPQ variance permutation vs "
                         "contiguous split at K/2")
    ap.add_argument("--opq-dense", action="store_true",
                    help="OPQ A/B on NON-PQ-degenerate weights: W-tilde "
                         "re-split at S/2 + a correlated synthetic dense "
                         "ensemble (round-3 verdict item 6)")
    args = ap.parse_args()

    import jax

    from qcnn_tpu.formats import read_asmt, read_bin
    from qcnn_tpu.models.prepare import _decode_fc_weight_np
    from qcnn_tpu.quantizer.pq import quantize_plain
    from qcnn_tpu.ops.lut import decode_fc_weight

    bin_dir = "/root/reference/AlexNet/Bin.Files"
    for layer in args.layers:
        if layer not in LAYERS:
            raise SystemExit(
                f"--layers takes 0-based indices from {sorted(LAYERS)} "
                f"(got {layer}; file numbers are index+1)"
            )
        name, kind = LAYERS[layer]
        ctrd = read_bin(
            os.path.join(bin_dir, f"bvlc_alexnet_aCaF.ctrdLst.{layer+1:02d}.bin"),
            np.float32,
        )
        asmt = read_asmt(
            os.path.join(bin_dir, f"bvlc_alexnet_aCaF.asmtLst.{layer+1:02d}.cbn")
        )
        s, k, d = ctrd.shape
        if kind != "fc":
            print(f"{name}: conv re-quantization not wired here", flush=True)
            continue
        w = _decode_fc_weight_np(ctrd, asmt, s * d).T  # (Cout, Cin)
        t0 = time.perf_counter()
        res = quantize_plain(
            jax.random.key(0), w, num_subspaces=s, num_codewords=k,
            iters=args.iters,
        )
        dt = time.perf_counter() - t0
        w_hat = np.asarray(
            decode_fc_weight(res.codebooks, res.assignments, s * d)
        ).T
        rel = np.linalg.norm(w_hat - w) / np.linalg.norm(w)
        print(
            f"{name}: (S,K,D)=({s},{k},{d}) shape={w.shape} "
            f"re-quantize rel err={rel:.4f} in {dt:.1f}s",
            flush=True,
        )

        # OPQ permutation vs contiguous split at HALF the codewords (the
        # re-quantization above is ~lossless by construction, so the
        # quantizer choice only shows at a lossy operating point) — real
        # trained weight statistics.
        if args.opq:
            from qcnn_tpu.quantizer.opq import variance_permutation

            k2 = max(2, k // 2)
            perm = variance_permutation(w, s)

            def werr(res, wp):
                wh = np.asarray(decode_fc_weight(
                    np.asarray(res.codebooks), np.asarray(res.assignments),
                    s * d,
                )).T
                return float(np.linalg.norm(wh - wp) / np.linalg.norm(w))

            plain = quantize_plain(
                jax.random.key(1), w, num_subspaces=s, num_codewords=k2,
                iters=args.iters,
            )
            opq = quantize_plain(
                jax.random.key(1), w[:, perm], num_subspaces=s,
                num_codewords=k2, iters=args.iters,
            )
            ep, eo = werr(plain, w), werr(opq, w[:, perm])
            print(
                f"{name}: K={k2} weight err plain={ep:.4f} "
                f"OPQ-perm={eo:.4f} ({100 * (1 - eo / ep):.1f}% better)",
                flush=True,
            )

        # Error-corrected vs plain at HALF the codewords (a lossy setting
        # where the quantizer choice matters) under anisotropic calibration
        # inputs — the CVPR'16 EC-PQ scenario, on real trained weights.
        if args.ec and kind == "fc":
            from qcnn_tpu.quantizer.pq import quantize_error_corrected

            k2 = max(2, k // 2)
            rng = np.random.default_rng(0)
            scales = np.geomspace(4.0, 0.25, w.shape[1]).astype(np.float32)
            xcal = rng.standard_normal((512, w.shape[1])).astype(
                np.float32
            ) * scales

            def resp_err(cb, asmt):
                wh = np.asarray(
                    decode_fc_weight(np.asarray(cb), np.asarray(asmt), s * d)
                ).T
                return float(
                    np.linalg.norm(xcal @ (wh - w).T)
                    / np.linalg.norm(xcal @ w.T)
                )

            plain = quantize_plain(
                jax.random.key(1), w, num_subspaces=s, num_codewords=k2,
                iters=args.iters,
            )
            ec = quantize_error_corrected(
                jax.random.key(1), w, xcal, num_subspaces=s,
                num_codewords=k2, rounds=3,
            )
            ep = resp_err(plain.codebooks, plain.assignments)
            ee = resp_err(ec.codebooks, ec.assignments)
            print(
                f"{name}: K={k2} response err plain={ep:.4f} "
                f"EC={ee:.4f} ({100 * (1 - ee / ep):.1f}% better)",
                flush=True,
            )

        # OPQ on NON-degenerate weights (round-3 verdict item 6): the W̃
        # re-quantization at the ORIGINAL geometry is maximally favourable
        # to the contiguous split (each original sub-space holds exactly K
        # distinct sub-vectors). Two realistic cases instead:
        #   (a) W̃ re-split at HALF the sub-spaces (paired original
        #       sub-spaces -> K^2 distinct combined vectors per new
        #       sub-space; real trained second-order statistics, nothing
        #       trivially clusterable);
        #   (b) a correlated synthetic dense ensemble: low-rank structure +
        #       log-normal per-input-dim scales — the heterogeneous-variance
        #       regime trained dense layers exhibit and OPQ targets.
        if args.opq_dense:
            from qcnn_tpu.quantizer.opq import variance_permutation

            cases = []
            s2 = s // 2
            cases.append((f"{name} resplit S={s2} K={k}", w, s2, k))
            rng2 = np.random.default_rng(3)
            n_u, cin = 512, 1024
            u = rng2.standard_normal((n_u, 48)).astype(np.float32)
            v = rng2.standard_normal((48, cin)).astype(np.float32)
            scales = np.exp(rng2.normal(0, 1.0, cin)).astype(np.float32)
            wd = (u @ v + 0.3 * rng2.standard_normal((n_u, cin))
                  ).astype(np.float32) * scales
            cases.append(("synth lowrank+lognormal S=256 K=16",
                          wd, 256, 16))
            for label, wm, sm, km in cases:
                perm = variance_permutation(wm, sm)
                pl_ = quantize_plain(
                    jax.random.key(2), wm, num_subspaces=sm,
                    num_codewords=km, iters=args.iters)
                op_ = quantize_plain(
                    jax.random.key(2), wm[:, perm], num_subspaces=sm,
                    num_codewords=km, iters=args.iters)

                def err2(res, wp):
                    wh = np.asarray(decode_fc_weight(
                        np.asarray(res.codebooks),
                        np.asarray(res.assignments), wp.shape[1])).T
                    return float(np.linalg.norm(wh - wp)
                                 / np.linalg.norm(wp))

                ep2, eo2 = err2(pl_, wm), err2(op_, wm[:, perm])
                print(f"{label}: err plain={ep2:.4f} OPQ-perm={eo2:.4f} "
                      f"({100 * (1 - eo2 / ep2):.1f}% better)", flush=True)


if __name__ == "__main__":
    main()
