"""Energy-threshold multi-hot coding of geometric-word histograms.

Vectorised equivalent of the reference's sequential pruning loop
(reference train.py:132-152, model/capl.py:413-433): sort descending,
accumulate until the running sum exceeds `energy * total`, keep everything up
to AND INCLUDING the element that crosses the threshold.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def energy_multihot(coding: jax.Array, energy: float) -> jax.Array:
    """Convert probability/frequency vector(s) to an energy-truncated multi-hot.

    An element (in descending-value order) is kept iff the EXCLUSIVE prefix sum
    before it is <= energy * total — the element that pushes the running sum
    over the threshold is still kept, matching the reference's post-increment
    break.

    Args:
      coding: (..., K) nonnegative vector(s).
      energy: threshold in (0, 1].
    Returns:
      (..., K) float multi-hot in {0., 1.}.
    """
    total = jnp.sum(coding, axis=-1, keepdims=True)
    order = jnp.argsort(-coding, axis=-1, stable=True)
    sorted_vals = jnp.take_along_axis(coding, order, axis=-1)
    inclusive = jnp.cumsum(sorted_vals, axis=-1)
    exclusive = inclusive - sorted_vals
    keep_sorted = exclusive <= energy * total                 # (..., K) bool
    # scatter back to original positions
    keep = jnp.zeros_like(coding)
    keep = jnp.put_along_axis(keep, order, keep_sorted.astype(coding.dtype),
                              axis=-1, inplace=False)
    return keep
