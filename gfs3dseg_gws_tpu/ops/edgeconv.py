"""Neighbour gather for EdgeConv.

The reference builds an explicit (B, 2C, N, K) edge tensor and pushes it
through 1x1 convs (reference model/dgcnn.py:26-42,113-119). On TPU we avoid
materialising the 2C concat: the first 1x1 conv over concat([x_j - x_i, x_i])
decomposes into two per-POINT matmuls plus a gather-add, cutting its FLOPs by
the neighbourhood factor K (see models/dgcnn.py EdgeConvBlock). This module
provides the gather primitive that remains — with a custom VJP whose
backward (a scatter-add, which XLA lowers poorly on TPU) runs as one-hot
MXU matmuls in a Pallas kernel (~4x faster than the native scatter).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_fwd_impl(x: jax.Array, idx: jax.Array) -> jax.Array:
    b, n, c = x.shape
    k = idx.shape[-1]
    # one global row-gather over the flattened (B*N, C) table: lowers to a
    # single dynamic-gather that the TPU executes ~2.4x faster than the
    # per-batch take_along_axis formulation
    offset = (jnp.arange(b, dtype=idx.dtype) * n)[:, None, None]
    flat = (idx + offset).reshape(-1)                         # (B*N*K,)
    out = jnp.take(x.reshape(b * n, c), flat, axis=0,
                   unique_indices=False, indices_are_sorted=False)
    return out.reshape(b, n, k, c)


def _scatter_bwd_kernel(idx_ref, g_ref, out_ref, *, k: int, n: int):
    """Accumulate grad wrt the gather table: out[j] += sum over (i,kk) with
    idx[i,kk]==j of g[i,kk]. One grid step per (batch, neighbour-slot,
    query-tile): the equality onehot against an iota turns the scatter into
    an (N, TQ)x(TQ, C) MXU matmul. The neighbour slot is a GRID dimension
    (not an in-kernel loop), keeping the Mosaic program tiny."""
    kk = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when((kk == 0) & (j == 0))
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    idx_all = idx_ref[0]                                     # (K, TQ)
    tq = idx_all.shape[1]
    # masked-reduce row kk (the sublane dim cannot be dynamically indexed)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k, tq), 0)
    idx_row = jnp.sum(jnp.where(iota_k == kk, idx_all, 0), axis=0)  # (TQ,)
    g_slab = g_ref[0, kk]                    # (TQ, C) — leading dim is untiled
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (tq, n), 1)
    onehot = (iota_n == idx_row[:, None])                    # (TQ, N)
    contrib = jax.lax.dot_general(
        onehot.astype(jnp.bfloat16), g_slab.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (N, C)
    out_ref[0] = out_ref[0] + contrib


def _scatter_bwd_pallas(idx: jax.Array, g: jax.Array, n: int,
                        tile_q: int = 1024) -> jax.Array:
    b, nq, k, c = g.shape
    tile_q = min(tile_q, nq)
    if nq % tile_q != 0:
        return _scatter_bwd_xla(idx, g, n)
    idx_t = jnp.transpose(idx, (0, 2, 1))                    # (B, K, NQ)
    g_t = jnp.transpose(g, (0, 2, 1, 3))                     # (B, K, NQ, C)
    kern = functools.partial(_scatter_bwd_kernel, k=k, n=n)
    return pl.pallas_call(
        kern,
        grid=(b, k, nq // tile_q),
        in_specs=[
            pl.BlockSpec((1, k, tile_q), lambda i, kk, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, tile_q, c), lambda i, kk, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i, kk, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(idx_t, g_t)


def _scatter_bwd_xla(idx: jax.Array, g: jax.Array, n: int) -> jax.Array:
    b, nq, k, c = g.shape
    offset = (jnp.arange(b, dtype=idx.dtype) * n)[:, None, None]
    flat = (idx + offset).reshape(-1)
    out = jax.ops.segment_sum(g.reshape(-1, c), flat, num_segments=b * n)
    return out.reshape(b, n, c)


@jax.custom_vjp
def gather_neighbors(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather per-point neighbour features.

    Args:
      x:   (B, N, C) point features.
      idx: (B, N, K) int32 neighbour indices into the N axis.
    Returns:
      (B, N, K, C) neighbour features.
    """
    return _gather_fwd_impl(x, idx)


def _gather_fwd(x, idx):
    return _gather_fwd_impl(x, idx), (idx, x.shape)


def _gather_bwd(res, g):
    idx, x_shape = res
    n = x_shape[1]
    if jax.default_backend() == "tpu":
        dx = _scatter_bwd_pallas(idx, g, n)
    else:
        dx = _scatter_bwd_xla(idx, g, n)
    return dx.astype(g.dtype), None


gather_neighbors.defvjp(_gather_fwd, _gather_bwd)
