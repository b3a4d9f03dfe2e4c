"""Farthest point sampling.

TPU-native replacement for the reference's torch_cluster.fps call
(reference pretrain/models/mpti.py:153): a fixed-iteration `lax.fori_loop`
over a running min-distance field, so shapes stay static for XLA.

Matches `fps(..., random_start=False)`: the walk starts at index 0.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_samples",))
def farthest_point_sampling(x: jax.Array, n_samples: int,
                            valid_mask: jax.Array | None = None) -> jax.Array:
    """Select n_samples indices by iterative farthest-point selection.

    Args:
      x: (N, C) points.
      n_samples: number of samples (static).
      valid_mask: optional (N,) bool; invalid rows are never selected. Useful
        for padded fixed-shape batches. If fewer valid points than n_samples
        exist, indices repeat — callers should de-duplicate like the
        reference does with `.unique()`.
    Returns:
      (n_samples,) int32 indices, first index = first valid point.
    """
    n = x.shape[0]
    if valid_mask is None:
        valid_mask = jnp.ones((n,), dtype=bool)
    big = jnp.float32(1e30)
    # first selected point: first valid index (index 0 when all valid)
    first = jnp.argmax(valid_mask).astype(jnp.int32)

    def body(i, state):
        min_d, selected = state
        last = selected[i - 1]
        d = jnp.sum((x - x[last]) ** 2, axis=-1)
        min_d = jnp.minimum(min_d, d)
        masked = jnp.where(valid_mask, min_d, -big)
        nxt = jnp.argmax(masked).astype(jnp.int32)
        selected = selected.at[i].set(nxt)
        return min_d, selected

    selected0 = jnp.zeros((n_samples,), dtype=jnp.int32).at[0].set(first)
    min_d0 = jnp.full((n,), big, dtype=jnp.float32)
    _, selected = jax.lax.fori_loop(1, n_samples, body, (min_d0, selected0))
    return selected
