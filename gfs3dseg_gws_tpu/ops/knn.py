"""k-nearest-neighbour graph construction for dynamic EdgeConv.

Semantics match the reference kNN (reference model/dgcnn.py:17-23): similarity
score = -squared-L2 distance, top-k of the score (self-match included, so the
first neighbour of each point is usually itself).

Two paths:
  * `_knn_xla`    — pure XLA: (B,N,N) score matrix + `lax.top_k`. Used on CPU
                    and as the reference for tests.
  * `_knn_pallas` — fused Pallas TPU kernel: tiles over query points, keeps
                    the score tile in VMEM and extracts the top-k by iterative
                    max-and-mask, so the (N,N) matrix never round-trips
                    through HBM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -jnp.inf


def pairwise_sq_dists(x: jax.Array, y: jax.Array) -> jax.Array:
    """Squared L2 distances between rows of x (..., M, C) and y (..., N, C)."""
    xx = jnp.sum(x * x, axis=-1, keepdims=True)            # (..., M, 1)
    yy = jnp.sum(y * y, axis=-1, keepdims=True)            # (..., N, 1)
    xy = jnp.einsum("...mc,...nc->...mn", x, y,
                    preferred_element_type=jnp.float32)    # (..., M, N)
    return xx - 2.0 * xy + jnp.swapaxes(yy, -1, -2)


def _knn_xla(x: jax.Array, k: int) -> jax.Array:
    """x: (B, N, C) -> neighbour indices (B, N, k), nearest first."""
    score = -pairwise_sq_dists(x, x)                       # (B, N, N)
    _, idx = jax.lax.top_k(score, k)
    return idx.astype(jnp.int32)


def _topk_iterative(scores: jax.Array, k: int) -> jax.Array:
    """Top-k indices along the last axis by k rounds of max-and-mask.

    Runs inside the Pallas kernel where a full sort would be wasteful for
    k << N. scores: (M, N) float32 -> (M, k) int32.
    """
    m, n = scores.shape
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (m, n), dimension=1)

    # unrolled (k is small and static) — Mosaic lowers this cleanly, whereas a
    # scan carrying the (M, N) score tile does not
    s = scores
    cols = []
    for _ in range(k):
        best = jnp.argmax(s, axis=-1).astype(jnp.int32)    # (M,)
        cols.append(best)
        s = jnp.where(col_ids == best[:, None], _NEG_INF, s)
    return jnp.stack(cols, axis=-1)                         # (M, k)


@functools.lru_cache(maxsize=None)
def _warn_gate_fallback(n: int, tile_q: int) -> None:
    """One-time notice that the fused kNN kernel gate (n >= 2048 and
    n % tile_q == 0) sent this shape to the exact XLA path."""
    import logging
    logging.getLogger(__name__).warning(
        "knn: n=%d fails the Pallas-kernel gate (needs n >= 2048 and "
        "n %% %d == 0) — using the exact XLA fallback (slower at scale).",
        n, tile_q)


def _pick_unroll(k: int, unroll: int) -> int:
    """Largest divisor of k that is <= unroll (chunked-unroll factor)."""
    for u in range(min(unroll, k), 0, -1):
        if k % u == 0:
            return u
    return 1


def _knn_kernel(x_tile_ref, x_all_ref, out_ref, keys_ref, cols_ref, *,
                k: int, unroll: int, idx_bits: int):
    """Packed min-extraction kNN.

    Squared distances are nonnegative, so their IEEE-754 bit patterns are
    order-isomorphic to their values: truncate the low `idx_bits` mantissa
    bits and pack the column index there instead. Each of the k rounds is
    then ONE int32 min-reduction (the winner carries its own index) plus a
    compare-and-mask — ~4x faster than an argmax-based extraction, at the
    cost of neighbour swaps only between points whose distances agree to
    ~2^-12 relative (ties for all practical purposes).

    The round loop is CHUNK-unrolled (`unroll` rounds per fori_loop
    iteration): full unrolling makes Mosaic compile minutes-slow per shape,
    full rolling costs ~2x runtime; chunks of ~5 get both. Results land in a
    (TQ, k) scratch via masked selects because the lane dimension cannot be
    dynamically indexed.
    """
    q = x_tile_ref[0].astype(jnp.float32)                   # (TQ, C)
    kk = x_all_ref[0].astype(jnp.float32)                   # (N, C)
    qq = jnp.sum(q * q, axis=-1, keepdims=True)             # (TQ, 1)
    kk2 = jnp.sum(kk * kk, axis=-1)[None, :]                # (1, N)
    dots = jnp.dot(q, kk.T, preferred_element_type=jnp.float32)
    d2 = jnp.maximum(qq + kk2 - 2.0 * dots, 0.0)            # (TQ, N)

    m, n = d2.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
    mask = (1 << idx_bits) - 1
    keys_ref[:] = (pltpu.bitcast(d2, jnp.int32) & ~mask) | col
    int_max = 2 ** 31 - 1
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (m, k), 1)

    def body(i, _):
        keys = keys_ref[:]
        cols = cols_ref[:]
        for u in range(unroll):
            best = jnp.min(keys, axis=-1)                   # (TQ,)
            cols = jnp.where(iota_k == i * unroll + u,
                             (best & mask)[:, None], cols)
            keys = jnp.where(keys == best[:, None], int_max, keys)
        keys_ref[:] = keys
        cols_ref[:] = cols
        return 0

    jax.lax.fori_loop(0, k // unroll, body, 0)
    out_ref[0] = cols_ref[:]


# sorting networks (min at index 0) used by the fold-merge kernel
_SORT_NET = {
    2: [(0, 1)],
    4: [(0, 1), (2, 3), (0, 2), (1, 3), (1, 2)],
    8: [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7),
        (1, 2), (5, 6), (0, 4), (1, 5), (2, 6), (3, 7), (2, 4), (3, 5),
        (1, 2), (3, 4), (5, 6)],
}


def _knn_fold_kernel(x_tile_ref, x_all_ref, out_ref, f_ref, cols_ref, *,
                     k: int, idx_bits: int, folds: int):
    """Fold-merge tournament top-k.

    The packed-key trick of `_knn_kernel`, but the (TQ, N) key tile is
    split into `folds` lane-slices that are SORTED ACROSS FOLDS per column
    (a 5-compare-exchange network for 4 folds), giving every column a
    sorted list with the column minimum in fold 0.  Each extraction round
    then only min-reduces fold 0 (N/folds lanes instead of N) and pops the
    winning column by one cascade shift — ~2x fewer VPU ALU ops per round
    than the full-width min-and-mask.  Exact: each pop removes the global
    minimum of the remaining keys (every column stays sorted, so the
    global min is always in fold 0), and packed keys are unique.
    """
    q = x_tile_ref[0].astype(jnp.float32)                   # (TQ, C)
    kk = x_all_ref[0].astype(jnp.float32)                   # (N, C)
    qq = jnp.sum(q * q, axis=-1, keepdims=True)             # (TQ, 1)
    kk2 = jnp.sum(kk * kk, axis=-1)[None, :]                # (1, N)
    dots = jnp.dot(q, kk.T, preferred_element_type=jnp.float32)
    d2 = jnp.maximum(qq + kk2 - 2.0 * dots, 0.0)            # (TQ, N)

    m, n = d2.shape
    w = n // folds
    col = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
    mask = (1 << idx_bits) - 1
    keys = (pltpu.bitcast(d2, jnp.int32) & ~mask) | col
    int_max = 2 ** 31 - 1
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (m, k), 1)

    fs = [keys[:, f * w:(f + 1) * w] for f in range(folds)]
    for a_i, b_i in _SORT_NET[folds]:
        lo = jnp.minimum(fs[a_i], fs[b_i])
        hi = jnp.maximum(fs[a_i], fs[b_i])
        fs[a_i], fs[b_i] = lo, hi
    for f in range(folds):
        f_ref[f] = fs[f]

    def round_body(r, cols):
        r0 = f_ref[0]
        best = jnp.min(r0, axis=-1)                         # (TQ,)
        cols = jnp.where(iota_k == r, (best & mask)[:, None], cols)
        hit = r0 == best[:, None]
        for f in range(folds - 1):
            f_ref[f] = jnp.where(hit, f_ref[f + 1], f_ref[f])
        f_ref[folds - 1] = jnp.where(hit, int_max, f_ref[folds - 1])
        return cols

    cols = cols_ref[:]
    for r in range(k):                                      # full unroll
        cols = round_body(r, cols)
    out_ref[0] = cols


def _knn_pallas_fold(x: jax.Array, k: int, tile_q: int = 512,
                     folds: int = 4) -> jax.Array:
    """MEASURED NEGATIVE RESULT — not wired into knn_indices. Bit-identical
    to _knn_pallas but 1.74/1.89 ms vs 1.44 ms at (16, 2048, 64, K=20) for
    folds 2/4: the cascade's folds x read/write per round outweighs the
    narrower min-reduce (docs/ARCHITECTURE.md negative-results list). Kept
    compilable so the measurement can be reproduced."""
    b, n, c = x.shape
    tile_q = min(tile_q, n)
    if n % tile_q != 0 or n < 2048 or (n // folds) % 128 != 0:
        _warn_gate_fallback(n, tile_q)
        return _knn_xla(x, k)
    grid = (b, n // tile_q)
    kern = functools.partial(_knn_fold_kernel, k=k, folds=folds,
                             idx_bits=(n - 1).bit_length())
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, k), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, k), jnp.int32),
        scratch_shapes=[pltpu.VMEM((folds, tile_q, n // folds), jnp.int32),
                        pltpu.VMEM((tile_q, k), jnp.int32)],
    )(x, x)


def _knn_pallas(x: jax.Array, k: int, tile_q: int = 512,
                unroll: int = 5) -> jax.Array:
    b, n, c = x.shape
    tile_q = min(tile_q, n)
    # Mosaic compiles this kernel in seconds at n=2048 but takes minutes at
    # smaller point counts (observed 73s@768, 209s@1024 — a compiler
    # pathology around the masked-select scratch writes); the exact XLA path
    # is fast enough below production size.
    if n % tile_q != 0 or n < 2048:
        _warn_gate_fallback(n, tile_q)
        return _knn_xla(x, k)
    grid = (b, n // tile_q)
    # full unroll at production N compiles fast with scratch-ref state and
    # runs ~2x faster than chunked; see fused_edgeconv for the same trade
    u = k if n >= 2048 else _pick_unroll(k, unroll)
    kern = functools.partial(_knn_kernel, k=k, unroll=u,
                             idx_bits=(n - 1).bit_length())
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, k), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, k), jnp.int32),
        scratch_shapes=[pltpu.VMEM((tile_q, n), jnp.int32),
                        pltpu.VMEM((tile_q, k), jnp.int32)],
    )(x, x)


def neighbor_stats_xla(idx: jax.Array, btab: jax.Array):
    """In-degree counts and transposed b-scatter from a kNN graph.

    cnt[b, 0, j] = |{(i, r) : idx[b, i, r] == j}|  (how many queries chose j)
    scb[b, j, :] = sum over those (i, r) of btab[b, i, :]

    Exact XLA path (scatter-add); the TPU train path gets both for ~free from
    `knn_with_stats`, which reuses the extraction equality masks.
    """
    b, n, k = idx.shape
    # multi-hot accumulation (k one-hot matmuls) instead of scatter-add —
    # XLA lowers scatters poorly on TPU, and this fallback IS the TPU path
    # below the Pallas gate (n < 2048, e.g. the N=512 CLI drives)
    mh = jnp.zeros((b, n, n), btab.dtype)
    for kk in range(k):
        mh = mh + jax.nn.one_hot(idx[:, :, kk], n, dtype=btab.dtype)
    cnt = jnp.sum(mh, axis=1, keepdims=True)                # (B, 1, N)
    scb = jnp.einsum("bqn,bqc->bnc", mh, btab)              # (B, N, C)
    return cnt, scb


def _knn_stats_kernel(x_tile_ref, x_all_ref, btab_ref, out_ref, cnt_ref,
                      scb_ref, keys_ref, cols_ref, *,
                      k: int, unroll: int, idx_bits: int):
    """Packed min-extraction kNN + neighbour statistics.

    Identical extraction to `_knn_kernel`.  The multi-hot matrix costs ONE
    compare at the end: extraction overwrites exactly the chosen keys with
    INT_MAX (a value no packed key can take — it would need a NaN d^2), so
    mh = (keys == INT_MAX) after the rounds.  It is then reduced to the
    in-degree counts and contracted against the per-tile b rows on the
    otherwise-idle MXU:
        cnt_j  = sum_q mh[q, j]
        scB_j  = sum_q mh[q, j] * b[q]   (f32 matmul — exact)
    Both are inputs-only quantities consumed by the fused training EdgeConv
    (they let the e0 batch stats be computed BEFORE any gather, collapsing
    its stats pass into the gather pass).
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        cnt_ref[0] = jnp.zeros_like(cnt_ref[0])
        scb_ref[0] = jnp.zeros_like(scb_ref[0])

    q = x_tile_ref[0].astype(jnp.float32)                   # (TQ, C)
    kk = x_all_ref[0].astype(jnp.float32)                   # (N, C)
    qq = jnp.sum(q * q, axis=-1, keepdims=True)
    kk2 = jnp.sum(kk * kk, axis=-1)[None, :]
    dots = jnp.dot(q, kk.T, preferred_element_type=jnp.float32)
    d2 = jnp.maximum(qq + kk2 - 2.0 * dots, 0.0)            # (TQ, N)

    m, n = d2.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
    mask = (1 << idx_bits) - 1
    keys_ref[:] = (pltpu.bitcast(d2, jnp.int32) & ~mask) | col
    int_max = 2 ** 31 - 1
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (m, k), 1)

    def body(i, _):
        keys = keys_ref[:]
        cols = cols_ref[:]
        for u in range(unroll):
            best = jnp.min(keys, axis=-1)                   # (TQ,)
            cols = jnp.where(iota_k == i * unroll + u,
                             (best & mask)[:, None], cols)
            keys = jnp.where(keys == best[:, None], int_max, keys)
        keys_ref[:] = keys
        cols_ref[:] = cols
        return 0

    jax.lax.fori_loop(0, k // unroll, body, 0)
    out_ref[0] = cols_ref[:]
    mh = (keys_ref[:] == int_max).astype(jnp.float32)       # (TQ, N)
    cnt_ref[0] = cnt_ref[0] + jnp.sum(mh, axis=0, keepdims=True)
    scb_ref[0] = scb_ref[0] + jax.lax.dot_general(
        mh, btab_ref[0].astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # (N, C)


def _knn_stats_pallas(x: jax.Array, btab: jax.Array, k: int,
                      tile_q: int = 512):
    b, n, c = x.shape
    cb = btab.shape[-1]
    tile_q = min(tile_q, n)
    grid = (b, n // tile_q)
    u = k if n >= 2048 else _pick_unroll(k, 5)
    kern = functools.partial(_knn_stats_kernel, k=k, unroll=u,
                             idx_bits=(n - 1).bit_length())
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, cb), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile_q, k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cb), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, k), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((b, n, cb), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((tile_q, n), jnp.int32),
                        pltpu.VMEM((tile_q, k), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, x, btab)


@functools.partial(jax.jit, static_argnames=("k", "use_pallas"))
def knn_with_stats(x: jax.Array, btab: jax.Array, k: int = 20,
                   use_pallas: bool = True):
    """kNN indices + (in-degree counts, transposed b-scatter).

    Same gate/fallback policy as `knn_indices`. Inputs should be
    stop_gradient'ed by the caller — the stats are inputs-only side
    quantities whose gradient contribution is carried in closed form by
    the fused EdgeConv VJP.
    Returns (idx (B,N,K) i32, cnt (B,1,N) f32, scb (B,N,C) f32).
    """
    b, n, c = x.shape
    tile_q = 512
    if (use_pallas and jax.default_backend() == "tpu"
            and n % min(tile_q, n) == 0 and n >= 2048):
        return _knn_stats_pallas(x, btab, k, tile_q)
    idx = _knn_xla(x, k)
    cnt, scb = neighbor_stats_xla(idx, btab)
    return idx, cnt, scb


@functools.partial(jax.jit, static_argnames=("k", "use_pallas"))
def knn_indices(x: jax.Array, k: int = 20, use_pallas: bool = True) -> jax.Array:
    """Neighbour indices for each point.

    Args:
      x: point features, (B, N, C).
      k: neighbours per point (self included).
      use_pallas: fused TPU kernel when running on TPU.
    Returns:
      (B, N, k) int32 indices into the N axis, nearest first.
    """
    if use_pallas and jax.default_backend() == "tpu":
        return _knn_pallas(x, k)
    return _knn_xla(x, k)
