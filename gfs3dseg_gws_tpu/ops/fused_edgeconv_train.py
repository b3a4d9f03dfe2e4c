"""Fully-fused dynamic EdgeConv TRAINING block (fwd + custom VJP).

Training-mode EdgeConv (reference model/dgcnn.py:26-42,113-119 with
train-mode BatchNorm) is, per block:

    e0  = gather(a, idx) + b[:, :, None]        # (B, N, K, C) edge tensor
    h1  = leaky(bn1_batch(e0))                  # stats over (B, N, K)
    z1  = h1 @ W2
    out = max_k leaky(bn2_batch(z1))

The unfused path materialises the (B, N, K, C) edge tensor ~4x forward and
again backward — pure HBM traffic.  Here the edge tensor never exists and
the gather happens ONCE.  BatchNorm batch statistics need TWO global
reductions (bn2's input depends on bn1's stats); the e0 stats come for
free from the kNN kernel's neighbour statistics (ops/knn.knn_with_stats:
the post-extraction key buffer IS the multi-hot, yielding the in-degrees
cnt_j and the transposed b-scatter scB_j), because e0 = a_j + b_i
separates and only GLOBAL sums matter:
    sum_edges a_j = sum_j cnt_j a_j,  sum_edges a_j b_i = sum_j a_j scB_j.
With mu1/var1 (hence the bn1 affine) known BEFORE any gather, the op is
two Pallas passes wrapped in one `custom_vjp`:

  fwd GSF the ONLY one-hot gather: per k-round one-hot rows against `a`
          on the MXU.  Emits nbr = a[idx] (B, K, N, C) as a LOSSLESS bf16
          HBM residual (each element is exactly one bf16 table entry;
          ~85 MB, ~0.2 ms of traffic — far cheaper than ONE repeated
          gather) plus the per-query sums sum_k a[idx] (for db), and in
          the same pass h1 -> z1 = h1 @ W2, accumulating sum(h1), h1^T h1
          (bn2 stats via E[(h1 W2)^2] = diag(W2^T E[h1h1^T] W2)) and
          running max_k/min_k z1 with arg slots.  bn2+leaky is monotone
          per channel (the sign of gamma2*inv2 picks max vs min), so the
          block output is an XLA epilogue on (B, N, W1).
  bwd B   gather-free: reads nbr back, recomputes h1/z1 per round
          (cheap (G*TQ, C) elementwise + narrow matmuls), accumulates
          dW2 = sum h1^T dz1, the bn1-backward reductions sum(dy1) /
          sum(dy1*yhat1), the per-point sum_k(G1*dy1), and the scatter
          onehot^T @ [G1*dy1 | yhat1] (2C-wide = one 128-lane matmul).
          The TRANSPOSED one-hot (N, G*TQ) is built directly from a
          sublane-iota compare, so the scatter matmul needs no MXU-side
          operand transpose.  da/db then assemble in XLA from closed-form
          batch-stat corrections:
            da_j = S_j − (G1 D1)·cnt_j − (G1 D2)·Y_j
            db_i = P_i − K·(G1 D1) − (G1 D2)·inv1·(s_i + K b_i − K mu1)
          with D1 = E[dy1], D2 = E[dy1 yhat1], S/Y the scatter halves,
          P the per-point sum, s the forward neighbour-sum, cnt the
          in-degrees from the kNN kernel.

History: round 2 ran a one-hot gather in all three passes (64-wide = half
MXU width) plus a separate multi-hot stats pass; measured at
(16, 2048, 64, K=20) that cost gs 0.85 + sf 2.31 + bwd 4.51 = 7.7 ms per
layer vs ~4.8 for GSF+B (bench numbers in docs/ARCHITECTURE.md, incl. the
measured negative results: backward software-pipelining and fold-merge
extraction).  Matmul passes STACK `stack` rounds into one deep matmul —
20 separate narrow (TQ, N)x(N, C) matmuls run at ~35% of bf16 peak.

Gradients THROUGH the batch statistics are exact (standard BN backward);
deviations from the unfused XLA path are the documented kernel numerics:
bf16 MXU inputs, gradient routed to the first max slot on exact ties (the
XLA max splits ties), and zero variance-clamp subgradient at var == 0.
Cotangents of the returned batch stats (used only for running-average
updates, which are not differentiated) are ignored.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5  # torch BatchNorm eps used everywhere in this framework


def _pick_unroll(k: int, unroll: int) -> int:
    for u in range(min(unroll, k), 0, -1):
        if k % u == 0:
            return u
    return 1


def supported(n: int, k: int, tile_q: int = 256) -> bool:
    """Whether the Pallas path handles this (N, K) without falling back."""
    return n % min(tile_q, n) == 0


# ---------------------------------------------------------------------------
# shared in-kernel helpers
# ---------------------------------------------------------------------------


def _idx_row(idxt, kk):
    """Row kk of the (K, TQ) index block (sublane dim is not dynamically
    indexable -> masked reduce)."""
    kdim, tq = idxt.shape
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (kdim, tq), 0)
    return jnp.sum(jnp.where(iota_k == kk, idxt, 0), axis=0)      # (TQ,)


def _stacked_onehot(idxt, base, g, n, dt):
    """One-hot rows for rounds base..base+g stacked to (g*TQ, N)."""
    _, tq = idxt.shape
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (tq, n), 1)
    parts = []
    for u in range(g):
        row = _idx_row(idxt, base + u)
        parts.append((iota_n == row[:, None]).astype(dt))
    return jnp.concatenate(parts, axis=0) if g > 1 else parts[0]


def _stack_rows(x, g):
    """Tile a (TQ, C) tensor to (g*TQ, C) (per-round broadcast)."""
    return jnp.concatenate([x] * g, axis=0) if g > 1 else x


def _nbr_chunk(nbr_ref, base, g, tq, c):
    """Rounds base..base+g of the (1, K, TQ, C) nbr block as (g*TQ, C)."""
    if g == 1:
        return nbr_ref[0, base]
    return nbr_ref[0, base:base + g].reshape(g * tq, c)


# ---------------------------------------------------------------------------
# forward pass GSF: the one gather + bn2 stats + max/min_k selection
# ---------------------------------------------------------------------------


def _gsf_kernel(a_ref, b_ref, idxt_ref, p1_ref, w2_ref,
                nbr_ref, snbr_ref, zmax_ref, zmin_ref, kmax_ref, kmin_ref,
                sumh1_ref, gram_ref, *, k: int, n: int, stack: int,
                slope: float, dt):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        sumh1_ref[:] = jnp.zeros_like(sumh1_ref[:])
        gram_ref[:] = jnp.zeros_like(gram_ref[:])

    a_all = a_ref[0].astype(dt)                                   # (N, C)
    b_tile = b_ref[0].astype(jnp.float32)                         # (TQ, C)
    idxt = idxt_ref[0]                                            # (K, TQ)
    s1 = p1_ref[0:1, :]
    t1 = p1_ref[1:2, :]
    w2 = w2_ref[:].astype(dt)
    tq, c = b_tile.shape
    b_stack = _stack_rows(b_tile, stack)

    zmax_ref[0] = jnp.full_like(zmax_ref[0], -jnp.inf)
    zmin_ref[0] = jnp.full_like(zmin_ref[0], jnp.inf)
    kmax_ref[0] = jnp.zeros_like(kmax_ref[0])
    kmin_ref[0] = jnp.zeros_like(kmin_ref[0])

    acc = jnp.zeros((tq, c), jnp.float32)
    for base in range(0, k, stack):
        oh = _stacked_onehot(idxt, base, stack, n, dt)            # (G*TQ, N)
        nbr = jnp.dot(oh, a_all, preferred_element_type=jnp.float32)
        for u in range(stack):
            piece = jax.lax.slice_in_dim(nbr, u * tq, (u + 1) * tq, axis=0)
            acc = acc + piece
            # each nbr element is exactly ONE bf16 table entry (one-hot row
            # against the bf16-cast table), so bf16 storage is LOSSLESS and
            # halves the residual's HBM traffic
            nbr_ref[0, base + u] = piece.astype(dt)
        pre1 = (nbr + b_stack) * s1 + t1
        h1 = jnp.where(pre1 >= 0, pre1, slope * pre1)
        h1b = h1.astype(dt)
        z1 = jnp.dot(h1b, w2, preferred_element_type=jnp.float32)
        sumh1_ref[:] = sumh1_ref[:] + jnp.sum(h1, axis=0, keepdims=True)
        gram_ref[:] = gram_ref[:] + jax.lax.dot_general(
            h1b, h1b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for u in range(stack):
            z1u = jax.lax.slice_in_dim(z1, u * tq, (u + 1) * tq, axis=0)
            up = z1u > zmax_ref[0]
            zmax_ref[0] = jnp.where(up, z1u, zmax_ref[0])
            kmax_ref[0] = jnp.where(up, base + u, kmax_ref[0])
            dn = z1u < zmin_ref[0]
            zmin_ref[0] = jnp.where(dn, z1u, zmin_ref[0])
            kmin_ref[0] = jnp.where(dn, base + u, kmin_ref[0])
    snbr_ref[0] = acc


def _gsf_pallas(a, b, idxt, s1, t1, w2, k, tile_q, slope, stack, dt):
    bsz, n, c = a.shape
    w1 = w2.shape[1]
    p1 = jnp.stack([s1, t1])                                      # (2, C)
    kern = functools.partial(_gsf_kernel, k=k, n=n, stack=stack, slope=slope,
                             dt=dt)
    grid = (bsz, n // tile_q)

    def tile_spec(width):
        return pl.BlockSpec((1, tile_q, width), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            tile_spec(c),
            pl.BlockSpec((1, k, tile_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, w1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, k, tile_q, c), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            tile_spec(c), tile_spec(w1), tile_spec(w1), tile_spec(w1),
            tile_spec(w1),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, k, n, c), dt),             # nbr
            jax.ShapeDtypeStruct((bsz, n, c), jnp.float32),       # s_nbr
            jax.ShapeDtypeStruct((bsz, n, w1), jnp.float32),      # zmax
            jax.ShapeDtypeStruct((bsz, n, w1), jnp.float32),      # zmin
            jax.ShapeDtypeStruct((bsz, n, w1), jnp.int32),        # kmax
            jax.ShapeDtypeStruct((bsz, n, w1), jnp.int32),        # kmin
            jax.ShapeDtypeStruct((1, c), jnp.float32),            # sum h1
            jax.ShapeDtypeStruct((c, c), jnp.float32),            # h1^T h1
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(a, b, idxt, p1, w2)


# ---------------------------------------------------------------------------
# merged backward pass (gather-free; direct-transposed one-hot scatter)
# ---------------------------------------------------------------------------


def _bwd_kernel(nbr_ref, b_ref, idxt_ref, p1_ref, w2_ref, gsel_ref, ksel_ref,
                pk_ref, scat_ref, psum_ref, dw2_ref, sums_ref,
                oht_ref, *, k: int, n: int, stack: int, slope: float, dt):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        dw2_ref[:] = jnp.zeros_like(dw2_ref[:])
        sums_ref[:] = jnp.zeros_like(sums_ref[:])

    @pl.when(j == 0)
    def _():
        scat_ref[0] = jnp.zeros_like(scat_ref[0])

    b_tile = b_ref[0].astype(jnp.float32)
    idxt = idxt_ref[0]
    s1 = p1_ref[0:1, :]
    t1 = p1_ref[1:2, :]
    mu1 = p1_ref[2:3, :]
    inv1 = p1_ref[3:4, :]
    g1s = p1_ref[4:5, :]                                          # gamma1*inv1
    w2 = w2_ref[:].astype(dt)
    gsel = gsel_ref[0]                                            # (TQ, W1)
    ksel = ksel_ref[0]
    pk = pk_ref[:]
    tq, c = b_tile.shape
    b_stack = _stack_rows(b_tile, stack)
    iota_sub = jax.lax.broadcasted_iota(jnp.int32, (n, tq), 0)

    psum_ref[0] = jnp.zeros_like(psum_ref[0])

    for base in range(0, k, stack):
        nbr = _nbr_chunk(nbr_ref, base, stack, tq, c)             # (G*TQ, C)
        e0 = nbr + b_stack
        pre1 = e0 * s1 + t1
        h1 = jnp.where(pre1 >= 0, pre1, slope * pre1)
        h1b = h1.astype(dt)
        z1 = jnp.dot(h1b, w2, preferred_element_type=jnp.float32)
        y2hat = (z1 - pk[3:4, :]) * pk[4:5, :]
        dy2 = jnp.concatenate(
            [jnp.where(ksel == base + u, gsel, 0.0) for u in range(stack)],
            axis=0) if stack > 1 else jnp.where(ksel == base, gsel, 0.0)
        dz1 = pk[0:1, :] * (dy2 - pk[1:2, :] - y2hat * pk[2:3, :])
        dz1b = dz1.astype(dt)
        dw2_ref[:] = dw2_ref[:] + jax.lax.dot_general(
            h1b, dz1b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh1 = jax.lax.dot_general(
            dz1b, w2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dy1 = dh1 * jnp.where(pre1 >= 0, 1.0, slope)
        y1hat = (e0 - mu1) * inv1
        sums_ref[0:1, :] = sums_ref[0:1, :] + jnp.sum(dy1, axis=0,
                                                      keepdims=True)
        sums_ref[1:2, :] = sums_ref[1:2, :] + jnp.sum(dy1 * y1hat, axis=0,
                                                      keepdims=True)
        gdy1 = g1s * dy1
        # transposed one-hot (N, G*TQ) built directly via a sublane-iota
        # compare — the scatter matmul contracts over its lane dim with no
        # MXU-side operand transpose
        for u in range(stack):
            row = _idx_row(idxt, base + u)
            oht_ref[:, u * tq:(u + 1) * tq] = (
                iota_sub == row[None, :]).astype(dt)
            psum_ref[0] = psum_ref[0] + jax.lax.slice_in_dim(
                gdy1, u * tq, (u + 1) * tq, axis=0)
        tbl = jnp.concatenate([gdy1, y1hat], axis=1)              # (G*TQ, 2C)
        scat_ref[0] = scat_ref[0] + jnp.dot(
            oht_ref[:], tbl.astype(dt),
            preferred_element_type=jnp.float32)                   # (N, 2C)


def _bwd_pallas(nbr, b, idxt, p1, w2, gsel, ksel, pk, k, tile_q, slope,
                stack, dt):
    bsz, n, c = b.shape
    w1 = w2.shape[1]
    grid = (bsz, n // tile_q)
    kern = functools.partial(_bwd_kernel, k=k, n=n, stack=stack, slope=slope,
                             dt=dt)
    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[
            pl.BlockSpec((1, k, tile_q, c), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, tile_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, w1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, w1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, w1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, w1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n, 2 * c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, w1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, n, 2 * c), jnp.float32),   # scat
            jax.ShapeDtypeStruct((bsz, n, c), jnp.float32),       # psum
            jax.ShapeDtypeStruct((c, w1), jnp.float32),           # dW2
            jax.ShapeDtypeStruct((2, c), jnp.float32)),           # bn1 sums
        scratch_shapes=[pltpu.VMEM((n, stack * tile_q), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(nbr, b, idxt, p1, w2, gsel, ksel, pk)


# ---------------------------------------------------------------------------
# the custom-VJP op
# ---------------------------------------------------------------------------


def _affines(gamma, beta, mu, var):
    inv = jax.lax.rsqrt(var + _EPS)
    s = gamma * inv
    return s, beta - mu * s, inv


def _fwd_impl(a, b, g1, be1, w2, g2, be2, idx, cnt, scb, neg_slope, tile_q,
              stack, dt):
    bsz, n, c = a.shape
    k = idx.shape[-1]
    e = bsz * n * k
    tile_q = min(tile_q, n)
    stack = _pick_unroll(k, stack)
    idxt = jnp.transpose(idx, (0, 2, 1)).astype(jnp.int32)        # (B, K, N)

    # e0 batch stats from the inputs-only neighbour statistics — BEFORE any
    # gather (sum_k a[idx] over everything = cnt-weighted table sum, and
    # sum_edges a_j*b_i = sum_j a_j*scB_j), so the stats pass and the gather
    # pass collapse into one kernel
    sum_e0 = jnp.einsum("bn,bnc->c", cnt[:, 0], a) + k * b.sum((0, 1))
    sum_e02 = (jnp.einsum("bn,bnc->c", cnt[:, 0], a * a)
               + 2.0 * jnp.einsum("bnc,bnc->c", scb, a)
               + k * (b * b).sum((0, 1)))
    mu1 = sum_e0 / e
    var1 = jnp.maximum(sum_e02 / e - mu1 * mu1, 0.0)
    s1, t1, inv1 = _affines(g1, be1, mu1, var1)

    nbr, s_nbr, zmax, zmin, kmax, kmin, sumh1, gram = _gsf_pallas(
        a, b, idxt, s1, t1, w2, k, tile_q, neg_slope, stack, dt)
    mu2 = (sumh1[0] / e) @ w2
    ez2 = jnp.einsum("cd,ce,ed->d", w2, gram / e, w2)
    var2 = jnp.maximum(ez2 - mu2 * mu2, 0.0)
    s2a, t2, inv2 = _affines(g2, be2, mu2, var2)

    pos = s2a > 0
    z1sel = jnp.where(pos, zmax, zmin)
    ksel = jnp.where(pos, kmax, kmin)
    pre2 = z1sel * s2a + t2
    out = jnp.where(pre2 >= 0, pre2, neg_slope * pre2)
    return out, mu1, var1, mu2, var2, (nbr, b, idxt, w2, g1, g2, mu1, var1,
                                       mu2, var2, z1sel, ksel, out, s_nbr,
                                       cnt)


def fused_edgeconv_train(a, b, gamma1, beta1, w2, gamma2, beta2, idx, *,
                         cnt=None, scb=None,
                         neg_slope: float = 0.2, tile_q: int = 256,
                         stack: int = 5, mxu_dtype=jnp.bfloat16):
    """Fused train-mode EdgeConv block.

    Args:
      a:      (B, N, C) neighbour-term table  x @ Wd.
      b:      (B, N, C) centre-term table     x @ (Wc - Wd).
      gamma1/beta1: (C,) bn1 scale/shift; w2: (C, W1); gamma2/beta2: (W1,).
      idx:    (B, N, K) int32 kNN indices.
      cnt/scb: optional neighbour statistics from ops.knn.knn_with_stats
        (cnt (B,1,N) in-degrees, scb (B,N,C) transposed b-scatter). Computed
        from idx/b in XLA when omitted. Treated as inputs-only: their
        gradient contribution is already carried by the closed-form VJP, so
        they are stop_gradient'ed here.
    Returns:
      (out (B, N, W1), mu1, var1, mu2, var2) — the batch stats are for
      running-average updates only; their cotangents are ignored.
    """
    if cnt is None or scb is None:
        from gfs3dseg_gws_tpu.ops.knn import neighbor_stats_xla
        cnt, scb = neighbor_stats_xla(idx, b)
    cnt = jax.lax.stop_gradient(cnt)
    scb = jax.lax.stop_gradient(scb)
    return _fused_train(a, b, gamma1, beta1, w2, gamma2, beta2, idx, cnt,
                        scb, neg_slope, tile_q, stack, mxu_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def _fused_train(a, b, gamma1, beta1, w2, gamma2, beta2, idx, cnt, scb,
                 neg_slope, tile_q, stack, dt):
    out, mu1, var1, mu2, var2, _ = _fwd_impl(
        a, b, gamma1, beta1, w2, gamma2, beta2, idx, cnt, scb, neg_slope,
        tile_q, stack, dt)
    return out, mu1, var1, mu2, var2


def _vjp_fwd(a, b, gamma1, beta1, w2, gamma2, beta2, idx, cnt, scb,
             neg_slope, tile_q, stack, dt):
    out, mu1, var1, mu2, var2, res = _fwd_impl(
        a, b, gamma1, beta1, w2, gamma2, beta2, idx, cnt, scb, neg_slope,
        tile_q, stack, dt)
    return (out, mu1, var1, mu2, var2), res + (beta1,)


def _vjp_bwd(neg_slope, tile_q, stack, dt, res, cts):
    (nbr, b, idxt, w2, g1, g2, mu1, var1, mu2, var2, z1sel, ksel, out,
     s_nbr, cnt, beta1) = res
    gout = cts[0]  # stat cotangents (running-average side channel) ignored
    bsz, n, c = b.shape
    k = idxt.shape[1]
    e = bsz * n * k
    tq = min(tile_q, n)
    stack = _pick_unroll(k, stack)

    s1, t1, inv1 = _affines(g1, beta1, mu1, var1)
    inv2 = jax.lax.rsqrt(var2 + _EPS)
    g2s = g2 * inv2
    g1s = g1 * inv1

    gsel = gout * jnp.where(out >= 0, 1.0, neg_slope)
    y2hat_sel = (z1sel - mu2) * inv2
    c1 = gsel.sum((0, 1)) / e
    c2 = (gsel * y2hat_sel).sum((0, 1)) / e
    dbeta2 = c1 * e
    dgamma2 = c2 * e

    p1 = jnp.stack([s1, t1, mu1, inv1, g1s])                      # (5, C)
    pk = jnp.stack([g2s, c1, c2, mu2, inv2])                      # (5, W1)
    scat, psum, dw2, sums = _bwd_pallas(
        nbr, b, idxt, p1, w2, gsel, ksel, pk, k, tq, neg_slope, stack, dt)
    dbeta1 = sums[0]
    dgamma1 = sums[1]
    d1 = sums[0] / e
    d2 = sums[1] / e
    gd1 = g1s * d1
    gd2 = g1s * d2
    da = (scat[..., :c] - gd1 * cnt[:, 0, :, None]
          - gd2 * scat[..., c:])
    db = (psum - k * gd1
          - gd2 * ((s_nbr + k * b - k * mu1) * inv1))
    return (da.astype(b.dtype), db.astype(b.dtype), dgamma1, dbeta1, dw2,
            dgamma2, dbeta2, None, jnp.zeros_like(cnt), jnp.zeros((bsz, n, c),
                                                                  b.dtype))


_fused_train.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# exact XLA reference (CPU/test path; also the oracle for kernel tests)
# ---------------------------------------------------------------------------


def fused_edgeconv_train_xla(a, b, gamma1, beta1, w2, gamma2, beta2, idx, *,
                             neg_slope: float = 0.2):
    """Unfused train-mode composition with identical semantics (materialises
    the edge tensor; used on CPU and as the test oracle)."""
    from gfs3dseg_gws_tpu.ops.edgeconv import gather_neighbors

    def bn(x, gamma, beta):
        axes = tuple(range(x.ndim - 1))
        mu = jnp.mean(x, axes)
        var = jnp.maximum(jnp.mean(jnp.square(x), axes) - mu * mu, 0.0)
        inv = jax.lax.rsqrt(var + _EPS)
        return (x - mu) * (inv * gamma) + beta, mu, var

    e0 = gather_neighbors(a, idx) + b[:, :, None, :]
    y1, mu1, var1 = bn(e0, gamma1, beta1)
    h1 = jnp.where(y1 >= 0, y1, neg_slope * y1)
    z1 = jnp.einsum("bnkc,cd->bnkd", h1, w2,
                    preferred_element_type=jnp.float32)
    y2, mu2, var2 = bn(z1, gamma2, beta2)
    h2 = jnp.where(y2 >= 0, y2, neg_slope * y2)
    return jnp.max(h2, axis=2), mu1, var1, mu2, var2
