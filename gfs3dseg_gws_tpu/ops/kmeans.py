"""Batched k-means for geometric-word extraction.

TPU-native replacement for the sklearn KMeans call in the reference's basis
extraction (reference get_basis.py:210-213): k-means++ seeding on a subsample
followed by Lloyd iterations as a `lax.scan`, with the assignment step as one
big (N, D) x (D, K) matmul per iteration — MXU-friendly, no host round trips.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def kmeans_plus_plus_init(rng: np.random.Generator, x: np.ndarray, k: int,
                          subsample: int = 100_000) -> np.ndarray:
    """k-means++ seeding (host-side numpy — inherently sequential).

    Seeds from a subsample for speed; with n_local_trials like sklearn's
    default (2 + log(k)) greedy variant.
    """
    n = x.shape[0]
    if n > subsample:
        idx = rng.choice(n, subsample, replace=False)
        x = x[idx]
        n = subsample
    n_trials = 2 + int(np.log(k))
    centers = np.empty((k, x.shape[1]), dtype=x.dtype)
    centers[0] = x[rng.integers(n)]
    # matmul distance form |c|^2 + |x|^2 - 2 c.x: the naive broadcast
    # difference was ~70 G element-ops at k=180/n=100k (measured 411 s in
    # the full-size ScanNet get_basis); BLAS brings seeding to ~2 s.
    # Accumulated in float64: the f32 cancellation for near-duplicate /
    # high-norm points (masked by the clamp to 0) would slightly perturb
    # the D^2 sampling distribution vs the exact difference form
    # (advisor r2); the f64 matmul cost is negligible next to the speedup.
    x64 = x.astype(np.float64)
    xx = np.einsum("nd,nd->n", x64, x64)
    c0 = centers[0].astype(np.float64)
    closest = np.maximum(xx - 2.0 * (x64 @ c0) + c0 @ c0, 0.0)
    for i in range(1, k):
        pot = closest.sum()
        cand = rng.choice(n, n_trials, p=closest / pot)
        xc = x64[cand]                                       # (T, D)
        d_cand = np.maximum(
            xx[None, :] - 2.0 * (xc @ x64.T)
            + np.einsum("td,td->t", xc, xc)[:, None], 0.0)   # (T, n)
        new_closest = np.minimum(closest[None, :], d_cand)
        best = new_closest.sum(-1).argmin()
        centers[i] = x[cand[best]]
        closest = new_closest[best]
    return centers


@functools.partial(jax.jit, static_argnames=("n_iters",), donate_argnums=())
def _lloyd(x: jax.Array, centers0: jax.Array, n_iters: int
           ) -> Tuple[jax.Array, jax.Array]:
    """Lloyd iterations. x: (N, D), centers0: (K, D)."""
    xx = jnp.sum(x * x, axis=-1)                             # (N,)

    def assign(centers):
        cc = jnp.sum(centers * centers, axis=-1)             # (K,)
        # argmin_k ||x - c_k||^2 = argmin_k (cc_k - 2 x.c_k)
        scores = 2.0 * jnp.dot(x, centers.T,
                               preferred_element_type=jnp.float32) - cc[None, :]
        return jnp.argmax(scores, axis=-1)                   # (N,)

    def step(centers, _):
        labels = assign(centers)
        onehot = jax.nn.one_hot(labels, centers.shape[0], dtype=jnp.float32)
        sums = jnp.einsum("nk,nd->kd", onehot, x,
                          preferred_element_type=jnp.float32)
        counts = jnp.sum(onehot, axis=0)                     # (K,)
        new_centers = sums / jnp.maximum(counts, 1.0)[:, None]
        # keep empty clusters where they were
        new_centers = jnp.where(counts[:, None] > 0, new_centers, centers)
        return new_centers, None

    centers, _ = jax.lax.scan(step, centers0.astype(jnp.float32), None,
                              length=n_iters)
    return centers, assign(centers)


def kmeans(x, k: int, n_iters: int = 50, seed: int = 0,
           init: str = "k-means++") -> Tuple[np.ndarray, np.ndarray]:
    """Cluster rows of x into k groups.

    Returns (centers (k, D) float32, labels (N,) int32) as numpy arrays.
    Note the reference then recomputes per-cluster MEANS of the members
    (get_basis.py:27-44) — after convergence that equals the centers, and we
    do the same downstream for exact behavioural parity.
    """
    x = np.asarray(x, dtype=np.float32)
    rng = np.random.default_rng(seed)
    if init == "k-means++":
        centers0 = kmeans_plus_plus_init(rng, x, k)
    else:
        centers0 = x[rng.choice(x.shape[0], k, replace=False)]
    centers, labels = _lloyd(jnp.asarray(x), jnp.asarray(centers0), n_iters)
    return np.asarray(centers), np.asarray(labels, dtype=np.int32)


def cluster_means(x: np.ndarray, labels: np.ndarray, k: int) -> np.ndarray:
    """Per-cluster means of members (reference get_basis.py:27-44). Asserts
    every cluster is non-empty, like the reference."""
    x = np.asarray(x, dtype=np.float64)
    sums = np.zeros((k, x.shape[1]), dtype=np.float64)
    np.add.at(sums, labels, x)
    counts = np.bincount(labels, minlength=k).astype(np.float64)
    assert (counts > 0).all(), "empty k-means cluster"
    return (sums / counts[:, None]).astype(np.float32)
