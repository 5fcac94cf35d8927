"""Batched sub-space k-means in JAX.

The reference delegates quantization to offline MATLAB (SURVEY.md: the only
trace is the 1-based index fixup, CaffePara.cc:284-288); here it is a
first-class JAX program so any FP32 checkpoint can be product-quantized
on-device.

Design: all S sub-spaces are clustered *simultaneously* — the data is
(S, N, D) and every Lloyd iteration is one batched distance computation
(S·N·K·D MACs on the MXU) + one masked mean. No Python loop over sub-spaces,
no data-dependent shapes; `lax.fori_loop` over iterations keeps the program
compiled once.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class KMeansResult(NamedTuple):
    centroids: jax.Array    # (S, K, D)
    assignments: jax.Array  # (S, N) int32
    mse: jax.Array          # () mean squared quantization error


def _pairwise_sq_dists(x: jax.Array, c: jax.Array) -> jax.Array:
    """x: (S, N, D), c: (S, K, D) -> (S, N, K) squared distances."""
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)            # (S, N, 1)
    c2 = jnp.sum(c * c, axis=-1)[:, None, :]               # (S, 1, K)
    xc = jnp.einsum(
        "snd,skd->snk", x, c, preferred_element_type=jnp.float32
    )
    return x2 + c2 - 2.0 * xc


def _assign(x: jax.Array, c: jax.Array) -> jax.Array:
    return jnp.argmin(_pairwise_sq_dists(x, c), axis=-1)


def _update(x: jax.Array, assign: jax.Array, k: int) -> jax.Array:
    """Masked mean per (sub-space, cluster); empty clusters keep their
    previous position via the caller's where()."""
    onehot = jax.nn.one_hot(assign, k, dtype=x.dtype)      # (S, N, K)
    sums = jnp.einsum(
        "snk,snd->skd", onehot, x, preferred_element_type=jnp.float32
    )
    counts = onehot.sum(axis=1)[..., None]                 # (S, K, 1)
    return sums, counts


def _init_centroids(key: jax.Array, x: jax.Array, k: int) -> jax.Array:
    """k-means++ init (D² sampling), batched over sub-spaces.

    Plain random-sample init frequently drops a true cluster on tight data;
    D²-weighted seeding fixes recovery without a Python loop over sub-spaces.
    """
    s, n, d = x.shape

    def per_subspace(key, xs):
        k0, key = jax.random.split(key)
        first = xs[jax.random.randint(k0, (), 0, n)]
        cents = jnp.zeros((k, d), xs.dtype).at[0].set(first)
        min_d2 = jnp.sum((xs - first) ** 2, axis=-1)

        def body(j, state):
            cents, min_d2, key = state
            kj, key = jax.random.split(key)
            probs = min_d2 / jnp.maximum(min_d2.sum(), 1e-30)
            idx = jax.random.choice(kj, n, p=probs)
            cj = xs[idx]
            cents = cents.at[j].set(cj)
            min_d2 = jnp.minimum(min_d2, jnp.sum((xs - cj) ** 2, axis=-1))
            return cents, min_d2, key

        cents, _, _ = jax.lax.fori_loop(1, k, body, (cents, min_d2, key))
        return cents

    return jax.vmap(per_subspace)(jax.random.split(key, s), x)


@functools.partial(jax.jit, static_argnames=("num_codewords", "iters"))
def subspace_kmeans(
    key: jax.Array,
    x: jax.Array,
    *,
    num_codewords: int,
    iters: int = 25,
) -> KMeansResult:
    """Cluster each sub-space of x (S, N, D) into `num_codewords` centroids."""
    k = num_codewords
    c0 = _init_centroids(key, x, k)

    def body(_, c):
        assign = _assign(x, c)
        sums, counts = _update(x, assign, k)
        fresh = sums / jnp.maximum(counts, 1.0)
        return jnp.where(counts > 0, fresh, c)

    c = jax.lax.fori_loop(0, iters, body, c0)
    assign = _assign(x, c)
    quantized = jnp.take_along_axis(c, assign[..., None], axis=1)
    mse = jnp.mean((x - quantized) ** 2)
    return KMeansResult(c, assign.astype(jnp.int32), mse)


def kmeans_step(c: jax.Array, x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """One Lloyd iteration (assign + update), exposed for the distributed
    training-step dryrun: with x sharded over N on the data axis, the sums
    and counts reduce with psums GSPMD inserts automatically."""
    assign = _assign(x, c)
    sums, counts = _update(x, assign, c.shape[1])
    fresh = sums / jnp.maximum(counts, 1.0)
    c_new = jnp.where(counts > 0, fresh, c)
    mse = jnp.mean(
        (x - jnp.take_along_axis(c_new, assign[..., None], axis=1)) ** 2
    )
    return c_new, mse
