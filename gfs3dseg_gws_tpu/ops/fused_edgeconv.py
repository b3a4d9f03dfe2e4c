"""Fully-fused dynamic EdgeConv inference kernel.

One Pallas kernel computes, per query tile, the ENTIRE EdgeConv block
(reference model/dgcnn.py:26-42,113-119 semantics, eval mode):

    scores  = -pairwise squared distance        (MXU)
    top-k   = packed min-extraction (see ops/knn.py)
    gather  = the per-round equality mask IS a one-hot matrix; neighbour
              features come from onehot @ table on the MXU (bf16 inputs,
              fp32 accumulation) — the TPU-idiomatic replacement for a
              dynamic gather, which Mosaic cannot lower
    layer1  = leaky(a'_j + b'_i)     with BatchNorm folded into a', b'
    layer2  = leaky(e @ W2' + bias2) with BatchNorm folded into W2', bias2
    output  = running max over the k neighbours

The (B, N, K, C) edge tensor never exists: HBM traffic drops from ~4 passes
over ~670 MB per block (batch 64) to just the input/output feature maps.
Training still uses the unfused path (BatchNorm batch statistics need a
global reduction the per-tile kernel cannot do).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INT_MAX = 2 ** 31 - 1


def _fused_kernel(x_tile_ref, x_all_ref, a_ref, b_ref, w2_ref, bias2_ref,
                  out_ref, keys_ref, acc_ref, *, k: int, unroll: int,
                  idx_bits: int, neg_slope: float):
    q = x_tile_ref[0].astype(jnp.float32)                   # (TQ, C)
    kk = x_all_ref[0].astype(jnp.float32)                   # (N, C)
    qq = jnp.sum(q * q, axis=-1, keepdims=True)
    kk2 = jnp.sum(kk * kk, axis=-1)[None, :]
    dots = jnp.dot(q, kk.T, preferred_element_type=jnp.float32)
    d2 = jnp.maximum(qq + kk2 - 2.0 * dots, 0.0)            # (TQ, N)

    m, n = d2.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
    bits = pltpu.bitcast(d2, jnp.int32)
    mask = (1 << idx_bits) - 1
    keys_ref[:] = (bits & ~mask) | col

    a_tab = a_ref[0].astype(jnp.bfloat16)                   # (N, W0)
    b_cen = b_ref[0].astype(jnp.float32)                    # (TQ, W0)
    w2 = w2_ref[:].astype(jnp.bfloat16)                     # (W0, W1)
    bias2 = bias2_ref[:].astype(jnp.float32)                # (1, W1)
    acc_ref[:] = jnp.full_like(acc_ref[:], -jnp.inf)

    # chunk-unrolled extraction: `unroll` rounds per fori_loop iteration
    # balances Mosaic compile time (full unroll: minutes/shape) against
    # runtime (fully rolled: ~1.5x slower)
    def body(i, _):
        keys = keys_ref[:]
        acc = acc_ref[:]
        # NOTE measured negative (do not re-attempt without new evidence):
        # grouping rounds so several one-hot gathers batch into one deep
        # (G*TQ, N) @ (N, W0) matmul — the train-side GSF win — is SLOWER
        # here: stack 1/2/4/5/10/20 = 2.76/3.49/3.65/2.96/3.18/4.04 ms at
        # (16, 2048, 64); a rebuild-from-columns variant matches
        # (2.80/3.60/3.09 at 1/5/10). kNN-alone is 1.40 ms of the fused
        # 2.76, so these matmuls already run at ~66% effective bf16 peak
        # and the stacked one-hot concatenation costs more than the
        # deeper matmul saves. The SPLIT variant (precomputed idx + cheap
        # compare one-hots, fused_edgeconv_infer_split below) is ALSO a
        # measured negative: 3.36-3.58 ms across all tile_q/stack configs
        # vs 2.659 fused — splitting un-hides the extraction VPU time the
        # per-round interleave here overlaps (docs/ARCHITECTURE.md).
        for _u in range(unroll):
            best = jnp.min(keys, axis=-1)                   # (TQ,)
            hit = keys == best[:, None]                     # (TQ, N) onehot
            keys = jnp.where(hit, _INT_MAX, keys)
            nbr = jnp.dot(hit.astype(jnp.bfloat16), a_tab,
                          preferred_element_type=jnp.float32)   # (TQ, W0)
            e = nbr + b_cen
            e = jnp.where(e >= 0, e, neg_slope * e)         # leaky
            l2 = jnp.dot(e.astype(jnp.bfloat16), w2,
                         preferred_element_type=jnp.float32) + bias2
            l2 = jnp.where(l2 >= 0, l2, neg_slope * l2)
            acc = jnp.maximum(acc, l2)
        keys_ref[:] = keys
        acc_ref[:] = acc
        return 0

    jax.lax.fori_loop(0, k // unroll, body, 0)
    out_ref[0] = acc_ref[:]


def fused_edgeconv_infer(x: jax.Array, a_table: jax.Array, b_table: jax.Array,
                         w2: jax.Array, bias2: jax.Array, k: int,
                         neg_slope: float = 0.2,
                         tile_q: int = 512) -> jax.Array:
    # tile_q swept on v5e at (64, 2048, 64): 128 -> 12.6ms, 256 -> 10.9ms,
    # 512 -> 9.9ms (best), 1024 -> 11.9ms
    """Fused eval-mode EdgeConv block.

    Args:
      x:        (B, N, C) features the kNN graph is built on.
      a_table:  (B, N, W0) = scale1 * (x @ Wd)                 (neighbour term)
      b_table:  (B, N, W0) = scale1 * (x @ (Wc - Wd)) + shift1 (centre term)
                where scale1/shift1 are the eval-mode BatchNorm affine.
      w2:       (W0, W1) layer-2 kernel pre-scaled by BatchNorm2 scale.
      bias2:    (W1,) BatchNorm2 shift.
      k:        neighbours per point.
    Returns:
      (B, N, W1) max-pooled EdgeConv output.
    """
    b, n, c = x.shape
    w0 = a_table.shape[-1]
    w1 = w2.shape[-1]
    tile_q = min(tile_q, n)
    if n % tile_q != 0:
        return _fused_edgeconv_xla(x, a_table, b_table, w2, bias2, k,
                                   neg_slope)
    from gfs3dseg_gws_tpu.ops.knn import _pick_unroll

    # Mosaic compile time is wildly non-monotonic in the unroll factor:
    # at production N (2048) a FULL unroll with scratch-ref state compiles in
    # ~20s and runs fastest; at small N partial unrolls compile 100x faster.
    unroll = k if n >= 2048 else _pick_unroll(k, 5)
    kern = functools.partial(_fused_kernel, k=k,
                             unroll=unroll,
                             idx_bits=(n - 1).bit_length(),
                             neg_slope=neg_slope)
    return pl.pallas_call(
        kern,
        grid=(b, n // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, w0), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, w0), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w0, w1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, w1), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, w1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_q, n), jnp.int32),
                        pltpu.VMEM((tile_q, w1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, x, a_table, b_table, w2, bias2.reshape(1, w1))


def _gather_conv_kernel(idxt_ref, a_ref, b_ref, w2_ref, bias2_ref, out_ref,
                        acc_ref, *, k: int, n: int, stack: int,
                        neg_slope: float):
    """Eval gather+conv from PRECOMPUTED idx (the split-kernel variant the
    negative-results analysis predicted should pay: one-hots come from cheap
    index compares, so `stack` rounds batch into one deep (G*TQ, N) @ (N, W0)
    MXU matmul — the train GSF structure minus stats/residuals)."""
    from gfs3dseg_gws_tpu.ops.fused_edgeconv_train import (_stack_rows,
                                                           _stacked_onehot)

    idxt = idxt_ref[0]                                      # (K, TQ)
    a_tab = a_ref[0].astype(jnp.bfloat16)                   # (N, W0)
    b_cen = b_ref[0].astype(jnp.float32)                    # (TQ, W0)
    w2 = w2_ref[:].astype(jnp.bfloat16)                     # (W0, W1)
    bias2 = bias2_ref[:].astype(jnp.float32)                # (1, W1)
    tq = b_cen.shape[0]
    b_stack = _stack_rows(b_cen, stack)

    acc_ref[:] = jnp.full_like(acc_ref[:], -jnp.inf)
    for base in range(0, k, stack):
        oh = _stacked_onehot(idxt, base, stack, n, jnp.bfloat16)  # (G*TQ, N)
        nbr = jnp.dot(oh, a_tab, preferred_element_type=jnp.float32)
        e = nbr + b_stack
        e = jnp.where(e >= 0, e, neg_slope * e)
        l2 = jnp.dot(e.astype(jnp.bfloat16), w2,
                     preferred_element_type=jnp.float32) + bias2
        l2 = jnp.where(l2 >= 0, l2, neg_slope * l2)
        acc = acc_ref[:]
        for u in range(stack):
            acc = jnp.maximum(acc, jax.lax.slice_in_dim(
                l2, u * tq, (u + 1) * tq, axis=0))
        acc_ref[:] = acc
    out_ref[0] = acc_ref[:]


def _gather_conv_pallas(idxt, a_table, b_table, w2, bias2, k, neg_slope,
                        tile_q, stack):
    b, n, w0 = a_table.shape
    w1 = w2.shape[-1]
    kern = functools.partial(_gather_conv_kernel, k=k, n=n, stack=stack,
                             neg_slope=neg_slope)
    return pl.pallas_call(
        kern,
        grid=(b, n // tile_q),
        in_specs=[
            pl.BlockSpec((1, k, tile_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, w0), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, w0), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w0, w1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, w1), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, w1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_q, w1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(idxt, a_table, b_table, w2, bias2.reshape(1, w1))


def fused_edgeconv_infer_split(x: jax.Array, a_table: jax.Array,
                               b_table: jax.Array, w2: jax.Array,
                               bias2: jax.Array, k: int,
                               neg_slope: float = 0.2, tile_q: int = 512,
                               stack: int = 5) -> jax.Array:
    """MEASURED NEGATIVE RESULT — not wired into the model; kept compilable
    so the measurement can be reproduced (like `_knn_pallas_fold`).

    Split-kernel eval EdgeConv: the kNN extraction kernel emits idx, then a
    stacked gather+conv kernel builds one-hots from cheap idx compares (the
    train GSF structure minus stats). Bit-identical to
    `fused_edgeconv_infer` on TPU (same packed-top-k idx, same bf16 one-hot
    matmuls; verified max|diff| = 0.0 at (4, 2048, 64, K=20)) but SLOWER:
    3.36-3.58 ms/layer across tile_q {256,512} x stack {4,5,10,20} vs 2.659
    fused at (16, 2048, 64) — splitting un-hides the extraction VPU time
    the fused per-round interleave overlaps (docs/ARCHITECTURE.md
    negative-results list). Same args as `fused_edgeconv_infer`.
    """
    from gfs3dseg_gws_tpu.ops.fused_edgeconv_train import _pick_unroll
    from gfs3dseg_gws_tpu.ops.knn import _knn_pallas

    b, n, c = x.shape
    tile_q = min(tile_q, n)
    if n % tile_q != 0 or n < 2048:
        return _fused_edgeconv_xla(x, a_table, b_table, w2, bias2, k,
                                   neg_slope)
    idx = _knn_pallas(x, k)
    idxt = jnp.transpose(idx, (0, 2, 1)).astype(jnp.int32)
    return _gather_conv_pallas(idxt, a_table, b_table, w2, bias2, k,
                               neg_slope, tile_q, _pick_unroll(k, stack))


def _fused_edgeconv_xla(x, a_table, b_table, w2, bias2, k, neg_slope):
    """Reference XLA composition with identical numerics (CPU/test path) —
    exact-distance top-k instead of the packed truncation."""
    from gfs3dseg_gws_tpu.ops.edgeconv import gather_neighbors
    from gfs3dseg_gws_tpu.ops.knn import _knn_xla

    idx = _knn_xla(x, k)
    nbr = gather_neighbors(a_table, idx)                    # (B, N, K, W0)
    e = nbr + b_table[:, :, None, :]
    e = jnp.where(e >= 0, e, neg_slope * e)
    l2 = jnp.einsum("bnkc,cd->bnkd", e, w2,
                    preferred_element_type=jnp.float32) + bias2
    l2 = jnp.where(l2 >= 0, l2, neg_slope * l2)
    return jnp.max(l2, axis=2)
