"""Product quantization of dense layers: plain and error-corrected.

Implements the CVPR'16 Quantized-CNN quantization scheme as a JAX program
(the piece the reference performed offline in MATLAB):

- **plain**: per-sub-space k-means over the weight sub-vectors (one sample per
  output unit per kernel position).
- **input-weighted**: k-means in the metric induced by calibration
  activations — minimizes E_x ||(w - c)·x_s||² = (w-c)ᵀ Σ_s (w-c), i.e.
  Lloyd's in the Σ_s^{1/2}-transformed space.
- **error-corrected**: block coordinate descent over sub-spaces; each round
  refits sub-space s's codebook and assignments against the *residual* of the
  layer response left by all other sub-spaces (the paper's error-correcting
  training-free variant).

Conventions match the reference layouts (SURVEY.md §2a):
  FC weight (Cout, Cin) → codebooks (S, K, D), assignments (Cout, S)
  Conv kernel (Cout, Cg, kh, kw) → assignments (Cout, kh, kw, S)
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qcnn_tpu.quantizer.kmeans import subspace_kmeans


class PQResult(NamedTuple):
    codebooks: jax.Array    # (S, K, D)
    assignments: jax.Array  # (n_units, S) int32
    output_mse: jax.Array   # scalar; weight-space or response-space MSE


def _split_subvectors(w_units_in: jax.Array, num_subspaces: int) -> jax.Array:
    """(N_units, Cin) -> (S, N_units, D) with zero padding of the tail
    sub-space (the loader's overhang convention, GetInPdMat clamp)."""
    n, cin = w_units_in.shape
    d = -(-cin // num_subspaces)
    pad = num_subspaces * d - cin
    if pad:
        w_units_in = jnp.pad(w_units_in, ((0, 0), (0, pad)))
    return jnp.transpose(
        w_units_in.reshape(n, num_subspaces, d), (1, 0, 2)
    )


def quantize_plain(
    key: jax.Array,
    w_units_in: jax.Array,
    *,
    num_subspaces: int,
    num_codewords: int,
    iters: int = 25,
) -> PQResult:
    """Plain sub-space k-means on the weights."""
    x = _split_subvectors(w_units_in, num_subspaces)
    res = subspace_kmeans(
        key, x, num_codewords=num_codewords, iters=iters
    )
    return PQResult(res.centroids, res.assignments.T, res.mse)


def _chol_transform(xcal_sub: jax.Array, ridge: float) -> jax.Array:
    """Cholesky factors L_s of Σ_s = X_sᵀX_s/N + ridge·I, shape (S, D, D)."""
    s, n, d = xcal_sub.shape
    cov = jnp.einsum(
        "snd,sne->sde", xcal_sub, xcal_sub, preferred_element_type=jnp.float32
    ) / n
    tr = jnp.trace(cov, axis1=1, axis2=2)[:, None, None] / d
    cov = cov + (ridge * tr + 1e-8) * jnp.eye(d)
    return jnp.linalg.cholesky(cov)


def quantize_input_weighted(
    key: jax.Array,
    w_units_in: jax.Array,
    xcal: jax.Array,
    *,
    num_subspaces: int,
    num_codewords: int,
    iters: int = 25,
    ridge: float = 1e-3,
) -> PQResult:
    """k-means in the activation-covariance metric: cluster L_sᵀ·w sub-vectors
    with Euclidean Lloyd's, map centroids back through L_s⁻ᵀ."""
    w_sub = _split_subvectors(w_units_in, num_subspaces)      # (S, N, D)
    x_sub = _split_subvectors(xcal, num_subspaces)            # (S, B, D)
    chol = _chol_transform(x_sub, ridge)                      # (S, D, D), lower
    w_t = jnp.einsum("sde,sne->snd", jnp.transpose(chol, (0, 2, 1)), w_sub)
    res = subspace_kmeans(key, w_t, num_codewords=num_codewords, iters=iters)
    # back-transform: c = L⁻ᵀ c̃  (solve Lᵀ c = c̃)
    c = jax.vmap(
        lambda l, ck: jax.scipy.linalg.solve_triangular(l.T, ck.T, lower=False).T
    )(chol, res.centroids)
    quantized = jnp.take_along_axis(c, res.assignments[..., None], axis=1)
    # accumulate the response MSE sub-space by sub-space: materializing the
    # full (S, N, B) error tensor is ~52 GB for VGG-16 fc6 geometry
    err = w_sub - quantized

    def _mse_body(si, acc):
        e = jnp.einsum(
            "bd,nd->bn", x_sub[si], err[si],
            preferred_element_type=jnp.float32,
        )
        return acc + jnp.sum(e * e)

    total = jax.lax.fori_loop(0, x_sub.shape[0], _mse_body, jnp.float32(0.0))
    resp_mse = total / (err.shape[0] * err.shape[1] * x_sub.shape[1])
    return PQResult(c, res.assignments.T, resp_mse)


@functools.partial(
    jax.jit, static_argnames=("num_subspaces", "num_codewords", "iters", "rounds")
)
def quantize_error_corrected(
    key: jax.Array,
    w_units_in: jax.Array,
    xcal: jax.Array,
    *,
    num_subspaces: int,
    num_codewords: int,
    iters: int = 15,
    rounds: int = 3,
    ridge: float = 1e-3,
) -> PQResult:
    """Error-corrected PQ: alternate per-sub-space refits against the residual
    layer response (block coordinate descent on ||X·W − X·Ŵ||²).

    Memory shape: O(B·N) — only the TOTAL approximate response is kept, and
    sub-space si's contribution is recomputed from its (unchanged-this-round)
    codebook when its residual is needed, then the total is updated in place.
    Algorithmically identical to materializing the per-sub-space (S, B, N)
    tensor (which is ~52 GB f32 at VGG-16 fc6 geometry: S=6272, B=512,
    N=4096); the total is re-summed fresh at each round start so incremental
    update error cannot accumulate across rounds."""
    s_cnt, k_cnt = num_subspaces, num_codewords
    w_sub = _split_subvectors(w_units_in, num_subspaces)      # (S, N, D)
    x_sub = _split_subvectors(xcal, num_subspaces)            # (S, B, D)
    n_units = w_sub.shape[1]
    d = w_sub.shape[2]
    b = x_sub.shape[1]

    init = quantize_input_weighted(
        key, w_units_in, xcal,
        num_subspaces=num_subspaces, num_codewords=num_codewords,
        iters=iters, ridge=ridge,
    )
    codebooks = init.codebooks                       # (S, K, D)
    assigns = init.assignments.T                     # (S, N)

    # target responses y = X Wᵀ as ONE dense GEMM over the flattened
    # (zero-padded) feature axis — never the per-sub-space (S, B, N) tensor
    x_flat = jnp.transpose(x_sub, (1, 0, 2)).reshape(b, s_cnt * d)
    w_flat = jnp.transpose(w_sub, (1, 0, 2)).reshape(n_units, s_cnt * d)
    y_total = jnp.einsum(
        "bf,nf->bn", x_flat, w_flat, preferred_element_type=jnp.float32
    )

    gram = jnp.einsum(
        "sbd,sbe->sde", x_sub, x_sub, preferred_element_type=jnp.float32
    )
    tr = jnp.trace(gram, axis1=1, axis2=2)[:, None, None] / d
    gram = gram + (ridge * tr + 1e-8) * jnp.eye(d)

    def subspace_response(si, codebooks, assigns):
        """(B, N) response of sub-space si under the current quantization."""
        cw = codebooks[si][assigns[si]]              # (N, D)
        return jnp.einsum(
            "bd,nd->bn", x_sub[si], cw, preferred_element_type=jnp.float32
        )

    def approx_total(codebooks, assigns):
        return jax.lax.fori_loop(
            0, s_cnt,
            lambda si, acc: acc + subspace_response(si, codebooks, assigns),
            jnp.zeros((b, n_units), jnp.float32),
        )

    def round_body(_, state):
        codebooks, assigns = state

        def per_subspace(si, state):
            codebooks, assigns, total = state
            approx_si = subspace_response(si, codebooks, assigns)
            resid = y_total - (total - approx_si)                # (B, N)
            xs = x_sub[si]                                       # (B, D)
            # 1) re-assign: codeword responses (B, K) vs residual targets
            cand = jnp.einsum(
                "bd,kd->bk", xs, codebooks[si],
                preferred_element_type=jnp.float32,
            )
            # cost[n,k] = ||resid[:,n] - cand[:,k]||²
            cost = (
                jnp.sum(cand * cand, axis=0)[None, :]
                - 2.0 * jnp.einsum("bn,bk->nk", resid, cand)
            )
            a_new = jnp.argmin(cost, axis=1)                     # (N,)
            # 2) refit codebook: per codeword k solve
            #    G c_k = X_sᵀ · mean residual of its members
            onehot = jax.nn.one_hot(a_new, k_cnt, dtype=xs.dtype)   # (N, K)
            counts = onehot.sum(axis=0)                             # (K,)
            rhs = jnp.einsum(
                "db,bk->kd", xs.T, resid @ onehot,
                preferred_element_type=jnp.float32,
            ) / jnp.maximum(counts, 1.0)[:, None]
            # solve G·c = rhs per codeword — ONE factorization with K
            # right-hand sides (G is shared across codewords; the old
            # (K,D,D) broadcast LU-factorized the identical system K
            # times per sub-space per round — round-5 review)
            c_new = jnp.linalg.solve(gram[si], rhs.T).T
            c_new = jnp.where(counts[:, None] > 0, c_new, codebooks[si])
            codebooks = codebooks.at[si].set(c_new)
            assigns = assigns.at[si].set(a_new)
            approx_si_new = jnp.einsum(
                "bd,nd->bn", xs, c_new[a_new],
                preferred_element_type=jnp.float32,
            )
            total = total - approx_si + approx_si_new
            return codebooks, assigns, total

        codebooks, assigns, _ = jax.lax.fori_loop(
            0, s_cnt, per_subspace,
            (codebooks, assigns, approx_total(codebooks, assigns)),
        )
        return codebooks, assigns

    codebooks, assigns = jax.lax.fori_loop(
        0, rounds, round_body, (codebooks, assigns)
    )
    resp_mse = jnp.mean((y_total - approx_total(codebooks, assigns)) ** 2)
    return PQResult(codebooks, assigns.T.astype(jnp.int32), resp_mse)


# ---------------------------------------------------------------------------
# Layer-level wrappers
# ---------------------------------------------------------------------------

def quantize_fc_layer(
    key,
    weight_out_in: np.ndarray,
    bias: np.ndarray,
    *,
    num_subspaces: int,
    num_codewords: int,
    xcal: Optional[np.ndarray] = None,
    opq: Optional[str] = None,
    **kwargs,
) -> dict:
    """weight (Cout, Cin) -> PQ fc params dict.

    opq="variance" permutes input dims by balanced variance allocation
    before sub-space splitting (quantizer/opq.py); the permutation rides in
    the params dict ("perm") and is applied/folded by ops.fc / prepare.
    """
    _check_uint8_codewords(num_codewords)
    res, perm = _quantize_2d_maybe_opq(
        key, np.asarray(weight_out_in), xcal,
        num_subspaces=num_subspaces, num_codewords=num_codewords,
        opq=opq, **kwargs,
    )
    out = {
        "codebooks": np.asarray(res.codebooks, np.float32),
        "assignments": np.asarray(res.assignments, np.uint8),
        "bias": np.asarray(bias, np.float32).reshape(-1),
    }
    if perm is not None:
        out["perm"] = perm
    return out


def _check_uint8_codewords(num_codewords: int) -> None:
    """Assignments are stored uint8 end-to-end (the reference's data
    model, SURVEY.md §2a); casting K>256 fits would silently wrap the
    indices mod 256 and decode garbage."""
    if num_codewords > 256:
        raise ValueError(
            f"PQ assignments are uint8: num_codewords must be <= 256, "
            f"got {num_codewords}"
        )


def _opq_perm(w2d, num_subspaces: int, method: str) -> np.ndarray:
    from qcnn_tpu.quantizer.opq import variance_permutation

    if method != "variance":
        raise ValueError(f"unknown opq method: {method!r}")
    return variance_permutation(np.asarray(w2d), num_subspaces)


def _guard_mse(res, w: np.ndarray, xcal: Optional[np.ndarray]) -> float:
    """Guard metric for the OPQ keep/drop decision: plain reconstruction
    MSE, or — when calibration inputs are present — the RESPONSE error
    ||X(W - Ŵ)^T||² that the error-corrected fit actually minimizes
    (comparing weight MSE there could prefer the variant that is worse on
    the real objective)."""
    # NumPy decode, not the jnp op: this is host-side tooling, and each
    # eager device decode costs a ~20-40 s remote compile per shape on
    # the tunneled TPU (the exact cost models/prepare.py documents
    # avoiding; round-5 review)
    from qcnn_tpu.models.prepare import _decode_fc_weight_np

    w_hat = _decode_fc_weight_np(
        np.asarray(res.codebooks, np.float32),
        np.asarray(res.assignments), w.shape[1],
    ).T
    if xcal is None:
        return float(np.mean((w_hat - w) ** 2))
    xc = np.asarray(xcal, np.float32)
    return float(np.mean((xc @ (w_hat - w).T.astype(np.float32)) ** 2))


def _quantize_2d_maybe_opq(key, w, xcal, *, num_subspaces, num_codewords,
                           opq, **kwargs):
    """Quantize an (N, Cin) matrix; with opq set, fit BOTH the permuted and
    the contiguous split and keep the lower-MSE one (the OPQ premise —
    variance balancing helps — fails on some weight families, measured in
    KERNEL_STUDIES §14; the guard makes --opq never worse, with a warning
    when the permutation regressed and was dropped)."""
    def fit(wm, xc):
        wj = jnp.asarray(wm, jnp.float32)
        if xc is None:
            # EC-only knobs (rounds, ridge) are meaningless without
            # calibration inputs: drop them instead of crashing
            # quantize_plain with an unexpected-kwarg TypeError
            # (round-5 review)
            plain_kw = {k: v for k, v in kwargs.items()
                        if k in ("iters",)}
            return quantize_plain(
                key, wj, num_subspaces=num_subspaces,
                num_codewords=num_codewords, **plain_kw,
            )
        return quantize_error_corrected(
            key, wj, jnp.asarray(xc, jnp.float32),
            num_subspaces=num_subspaces, num_codewords=num_codewords,
            **kwargs,
        )

    if opq is None:
        return fit(w, xcal), None
    perm = _opq_perm(w, num_subspaces, opq)
    xcal_p = None if xcal is None else np.asarray(xcal)[:, perm]
    res_perm = fit(w[:, perm], xcal_p)
    res_plain = fit(w, xcal)
    mse_perm = _guard_mse(res_perm, w[:, perm], xcal_p)
    mse_plain = _guard_mse(res_plain, w, xcal)
    if mse_perm <= mse_plain:
        return res_perm, perm
    import warnings

    warnings.warn(
        f"OPQ variance permutation regressed reconstruction MSE "
        f"({mse_perm:.3e} vs {mse_plain:.3e} contiguous) — keeping the "
        f"contiguous split for this layer (KERNEL_STUDIES §14)",
        stacklevel=3,
    )
    return res_plain, None


def quantize_conv_layer(
    key,
    kernel_oihw: np.ndarray,
    bias: np.ndarray,
    *,
    num_subspaces: int,
    num_codewords: int,
    xcal: Optional[np.ndarray] = None,
    opq: Optional[str] = None,
    **kwargs,
) -> dict:
    """kernel (Cout, Cg, kh, kw) (reference convKnl layout) -> PQ conv params.

    Sub-vectors are the input-channel slices per (output, kernel position)
    — the reference's data model (SURVEY.md §2a). opq="variance" permutes
    the Cg input channels (same permutation for every group — the codebook
    is shared across groups, CaffeEva.cc:534-560).
    """
    _check_uint8_codewords(num_codewords)
    cout, cg, kh, kw = kernel_oihw.shape
    # (Cout, kh, kw, Cg): one Cg-vector per (o, i, j)
    w = np.transpose(kernel_oihw, (0, 2, 3, 1)).reshape(cout * kh * kw, cg)
    # same fit-both OPQ keep/drop guard as the FC path: '--opq is never
    # worse' must hold per layer for convs too (KERNEL_STUDIES §14)
    res, perm = _quantize_2d_maybe_opq(
        key, np.asarray(w), xcal,
        num_subspaces=num_subspaces, num_codewords=num_codewords,
        opq=opq, **kwargs,
    )
    assigns = np.asarray(res.assignments, np.uint8).reshape(
        cout, kh, kw, num_subspaces
    )
    out = {
        "codebooks": np.asarray(res.codebooks, np.float32),
        "assignments": assigns,
        "bias": np.asarray(bias, np.float32).reshape(-1),
    }
    if perm is not None:
        out["perm"] = perm
    return out
