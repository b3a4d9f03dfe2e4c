"""Fully-fused dynamic EdgeConv TRAINING block (fwd + custom VJP).

Training-mode EdgeConv (reference model/dgcnn.py:26-42,113-119 with
train-mode BatchNorm) is, per block:

    e0  = gather(a, idx) + b[:, :, None]        # (B, N, K, C) edge tensor
    h1  = leaky(bn1_batch(e0))                  # stats over (B, N, K)
    z1  = h1 @ W2
    out = max_k leaky(bn2_batch(z1))

The unfused path materialises the (B, N, K, C) tensor ~4x forward and again
backward — pure HBM traffic. This module never materialises it. BatchNorm
batch statistics need TWO global reductions (bn2's input depends on bn1's
stats), so the forward is two passes and the backward two more:

  fwd S1  stats of e0 in closed form: only a neighbour-SUM is needed
          (sum_k a[idx]), so E[e0] and E[e0^2] come from per-point tensors.
  fwd SF  one Pallas pass: per k-round one-hot MXU gather -> h1 ->
          z1 = h1 @ W2, accumulating   sum(h1), h1^T h1 (for bn2 stats via
          E[(h1 W2)^2] = diag(W2^T E[h1 h1^T] W2)),  and  max_k/min_k z1
          with arg slots. Because bn2+leaky is monotone per channel (sign
          of gamma2*inv2 decides max vs min), the block output is an XLA
          epilogue on (B, N, W1) — no third edge pass.
  bwd B1  recompute rounds; accumulate dW2 = sum h1^T dz1 and the bn1
          backward reductions sum(dy1), sum(dy1*yhat1). dz1's sparse term
          routes the output cotangent to the arg-selected slot only; its
          dense terms are the batch-stat couplings.
  bwd B2  recompute rounds; de0 -> da via one-hot^T MXU scatter, db by
          summing rounds.

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


def supported(n: int, k: int, tile_q: int = 512) -> bool:
    """Whether the Pallas path handles this (N, K) without falling back."""
    return n % min(tile_q, n) == 0


# ---------------------------------------------------------------------------
# shared per-round recompute
# ---------------------------------------------------------------------------


def _round_state(kk, idxt, a_all, b_tile, s1, t1, *, n, slope, dt):
    """One neighbour slot: one-hot gather -> e0 -> pre1 -> h1."""
    kdim, tq = idxt.shape
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (kdim, tq), 0)
    idx_row = jnp.sum(jnp.where(iota_k == kk, idxt, 0), axis=0)   # (TQ,)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (tq, n), 1)
    onehot = (iota_n == idx_row[:, None])
    nbr = jnp.dot(onehot.astype(dt), a_all,
                  preferred_element_type=jnp.float32)             # (TQ, C)
    e0 = nbr + b_tile
    pre1 = e0 * s1 + t1
    h1 = jnp.where(pre1 >= 0, pre1, slope * pre1)
    return onehot, e0, pre1, h1


# ---------------------------------------------------------------------------
# forward pass SF: max/min_k z1 + bn2-stat reductions
# ---------------------------------------------------------------------------


def _sf_kernel(a_ref, b_ref, idxt_ref, p1_ref, w2_ref,
               zmax_ref, zmin_ref, kmax_ref, kmin_ref, sumh1_ref, gram_ref,
               *, k: int, n: int, unroll: int, slope: float, dt):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        sumh1_ref[:] = jnp.zeros_like(sumh1_ref[:])
        gram_ref[:] = jnp.zeros_like(gram_ref[:])

    a_all = a_ref[0].astype(dt)                         # (N, C)
    b_tile = b_ref[0].astype(jnp.float32)                         # (TQ, C)
    idxt = idxt_ref[0]                                            # (K, TQ)
    s1 = p1_ref[0:1, :]
    t1 = p1_ref[1:2, :]
    w2 = w2_ref[:].astype(dt)

    zmax_ref[0] = jnp.full_like(zmax_ref[0], -jnp.inf)
    zmin_ref[0] = jnp.full_like(zmin_ref[0], jnp.inf)
    kmax_ref[0] = jnp.zeros_like(kmax_ref[0])
    kmin_ref[0] = jnp.zeros_like(kmin_ref[0])

    def body(c, _):
        for u in range(unroll):
            kk = c * unroll + u
            _, _, _, h1 = _round_state(kk, idxt, a_all, b_tile, s1, t1,
                                       n=n, slope=slope, dt=dt)
            h1b = h1.astype(dt)
            z1 = jnp.dot(h1b, w2, preferred_element_type=jnp.float32)
            sumh1_ref[:] = sumh1_ref[:] + jnp.sum(h1, axis=0,
                                                  keepdims=True)
            gram_ref[:] = gram_ref[:] + jax.lax.dot_general(
                h1b, h1b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            up = z1 > zmax_ref[0]
            zmax_ref[0] = jnp.where(up, z1, zmax_ref[0])
            kmax_ref[0] = jnp.where(up, kk, kmax_ref[0])
            dn = z1 < zmin_ref[0]
            zmin_ref[0] = jnp.where(dn, z1, zmin_ref[0])
            kmin_ref[0] = jnp.where(dn, kk, kmin_ref[0])
        return 0

    jax.lax.fori_loop(0, k // unroll, body, 0)


def _sf_pallas(a, b, idxt, s1, t1, w2, k, tile_q, slope, unroll, dt):
    bsz, n, c = a.shape
    w1 = w2.shape[1]
    p1 = jnp.stack([s1, t1])                                      # (2, C)
    kern = functools.partial(_sf_kernel, k=k, n=n, unroll=unroll,
                             slope=slope, dt=dt)
    grid = (bsz, n // tile_q)
    out_shapes = (
        jax.ShapeDtypeStruct((bsz, n, w1), jnp.float32),          # zmax
        jax.ShapeDtypeStruct((bsz, n, w1), jnp.float32),          # zmin
        jax.ShapeDtypeStruct((bsz, n, w1), jnp.int32),            # kmax
        jax.ShapeDtypeStruct((bsz, n, w1), jnp.int32),            # kmin
        jax.ShapeDtypeStruct((1, c), jnp.float32),                # sum h1
        jax.ShapeDtypeStruct((c, c), jnp.float32),                # h1^T h1
    )
    tile_spec = pl.BlockSpec((1, tile_q, w1), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, tile_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, w1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(tile_spec, tile_spec,
                   pl.BlockSpec((1, tile_q, w1), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, tile_q, w1), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, c), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((c, c), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(a, b, idxt, p1, w2)


# ---------------------------------------------------------------------------
# backward pass B1: dW2 + bn1 backward reductions
# ---------------------------------------------------------------------------


def _dz1_round(kk, z1, gsel, ksel, pk):
    """Batch-stat BN2 backward at one slot: sparse arg-slot term + the two
    dense stat-coupling terms (pk rows: G2, C1, C2, mu2, inv2)."""
    y2hat = (z1 - pk[3:4, :]) * pk[4:5, :]
    dy2 = jnp.where(ksel == kk, gsel, 0.0)
    return pk[0:1, :] * (dy2 - pk[1:2, :] - y2hat * pk[2:3, :])


def _b1_kernel(a_ref, b_ref, idxt_ref, p1_ref, w2_ref, gsel_ref, ksel_ref,
               pk_ref, dw2_ref, sums_ref,
               *, k: int, n: int, unroll: int, slope: float, dt):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        dw2_ref[:] = jnp.zeros_like(dw2_ref[:])
        sums_ref[:] = jnp.zeros_like(sums_ref[:])

    a_all = a_ref[0].astype(dt)
    b_tile = b_ref[0].astype(jnp.float32)
    idxt = idxt_ref[0]
    s1 = p1_ref[0:1, :]
    t1 = p1_ref[1:2, :]
    mu1 = p1_ref[2:3, :]
    inv1 = p1_ref[3:4, :]
    w2 = w2_ref[:].astype(dt)
    gsel = gsel_ref[0]
    ksel = ksel_ref[0]
    pk = pk_ref[:]

    def body(c, _):
        for u in range(unroll):
            kk = c * unroll + u
            _, e0, pre1, h1 = _round_state(kk, idxt, a_all, b_tile, s1, t1,
                                           n=n, slope=slope, dt=dt)
            h1b = h1.astype(dt)
            z1 = jnp.dot(h1b, w2, preferred_element_type=jnp.float32)
            dz1 = _dz1_round(kk, z1, gsel, ksel, pk)
            dz1b = dz1.astype(dt)
            dw2_ref[:] = dw2_ref[:] + jax.lax.dot_general(
                h1b, dz1b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dh1 = jax.lax.dot_general(
                dz1b, w2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dy1 = dh1 * jnp.where(pre1 >= 0, 1.0, slope)
            y1hat = (e0 - mu1) * inv1
            sums_ref[0:1, :] = sums_ref[0:1, :] + jnp.sum(
                dy1, axis=0, keepdims=True)
            sums_ref[1:2, :] = sums_ref[1:2, :] + jnp.sum(
                dy1 * y1hat, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, k // unroll, body, 0)


# ---------------------------------------------------------------------------
# backward pass B2: de0 -> (da, db)
# ---------------------------------------------------------------------------


def _b2_kernel(a_ref, b_ref, idxt_ref, p1_ref, w2_ref, gsel_ref, ksel_ref,
               pk_ref, pd_ref, da_ref, db_ref,
               *, k: int, n: int, unroll: int, slope: float, dt):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        da_ref[0] = jnp.zeros_like(da_ref[0])

    a_all = a_ref[0].astype(dt)
    b_tile = b_ref[0].astype(jnp.float32)
    idxt = idxt_ref[0]
    s1 = p1_ref[0:1, :]
    t1 = p1_ref[1:2, :]
    mu1 = p1_ref[2:3, :]
    inv1 = p1_ref[3:4, :]
    w2 = w2_ref[:].astype(dt)
    gsel = gsel_ref[0]
    ksel = ksel_ref[0]
    pk = pk_ref[:]
    g1s = pd_ref[0:1, :]                                          # gamma1*inv1
    d1 = pd_ref[1:2, :]
    d2 = pd_ref[2:3, :]

    db_ref[0] = jnp.zeros_like(db_ref[0])

    def body(c, _):
        for u in range(unroll):
            kk = c * unroll + u
            onehot, e0, pre1, h1 = _round_state(
                kk, idxt, a_all, b_tile, s1, t1, n=n, slope=slope, dt=dt)
            h1b = h1.astype(dt)
            z1 = jnp.dot(h1b, w2, preferred_element_type=jnp.float32)
            dz1 = _dz1_round(kk, z1, gsel, ksel, pk)
            dh1 = jax.lax.dot_general(
                dz1.astype(dt), w2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dy1 = dh1 * jnp.where(pre1 >= 0, 1.0, slope)
            y1hat = (e0 - mu1) * inv1
            de0 = g1s * (dy1 - d1 - y1hat * d2)
            da_ref[0] = da_ref[0] + jax.lax.dot_general(
                onehot.astype(dt), de0.astype(dt),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)               # (N, C)
            db_ref[0] = db_ref[0] + de0
        return 0

    jax.lax.fori_loop(0, k // unroll, body, 0)


def _bwd_pallas(which, a, b, idxt, p1, w2, gsel, ksel, pk, pd,
                k, tile_q, slope, unroll, dt):
    bsz, n, c = a.shape
    w1 = w2.shape[1]
    grid = (bsz, n // tile_q)
    common_in = [
        pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k, tile_q), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((4, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, w1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_q, w1), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_q, w1), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((5, w1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    if which == "b1":
        kern = functools.partial(_b1_kernel, k=k, n=n, unroll=unroll,
                                 slope=slope, dt=dt)
        return pl.pallas_call(
            kern, grid=grid, in_specs=common_in,
            out_specs=(
                pl.BlockSpec((c, w1), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, c), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((c, w1), jnp.float32),
                       jax.ShapeDtypeStruct((2, c), jnp.float32)),
            compiler_params=params,
        )(a, b, idxt, p1, w2, gsel, ksel, pk)
    kern = functools.partial(_b2_kernel, k=k, n=n, unroll=unroll,
                             slope=slope, dt=dt)
    return pl.pallas_call(
        kern, grid=grid,
        in_specs=common_in + [
            pl.BlockSpec((3, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((bsz, n, c), jnp.float32),
                   jax.ShapeDtypeStruct((bsz, n, c), jnp.float32)),
        compiler_params=params,
    )(a, b, idxt, p1, w2, gsel, ksel, pk, pd)


# ---------------------------------------------------------------------------
# the custom-VJP op
# ---------------------------------------------------------------------------


def _gather_sum(tbl, idx):
    """sum_k tbl[idx[:, :, k]] without keeping the (B, N, K, C) tensor
    (XLA fuses the gather into the reduction)."""
    bsz, n, c = tbl.shape
    off = (jnp.arange(bsz, dtype=idx.dtype) * n)[:, None, None]
    flat = (idx + off).reshape(-1)
    g = jnp.take(tbl.reshape(bsz * n, c), flat, axis=0)
    return g.reshape(bsz, n, -1, c).sum(axis=2)


def _affines(gamma, beta, mu, var):
    inv = jax.lax.rsqrt(var + _EPS)
    s = gamma * inv
    return s, beta - mu * s, inv


def _fwd_impl(a, b, g1, be1, w2, g2, be2, idx, neg_slope, tile_q, unroll,
              dt):
    bsz, n, c = a.shape
    k = idx.shape[-1]
    e = bsz * n * k
    tile_q = min(tile_q, n)
    unroll = k if n >= 2048 else _pick_unroll(k, unroll)

    gs = _gather_sum(jnp.concatenate([a, a * a], axis=-1), idx)
    s_nbr, s2_nbr = gs[..., :c], gs[..., c:]
    sum_e0 = s_nbr.sum((0, 1)) + k * b.sum((0, 1))
    sum_e02 = (s2_nbr.sum((0, 1)) + 2.0 * (b * s_nbr).sum((0, 1))
               + k * (b * b).sum((0, 1)))
    mu1 = sum_e0 / e
    var1 = jnp.maximum(sum_e02 / e - mu1 * mu1, 0.0)
    s1, t1, inv1 = _affines(g1, be1, mu1, var1)

    idxt = jnp.transpose(idx, (0, 2, 1)).astype(jnp.int32)        # (B, K, N)
    zmax, zmin, kmax, kmin, sumh1, gram = _sf_pallas(
        a, b, idxt, s1, t1, w2, k, tile_q, neg_slope, unroll, dt)
    mu2 = (sumh1[0] / e) @ w2
    ez2 = jnp.einsum("cd,ce,ed->d", w2, gram / e, w2)
    var2 = jnp.maximum(ez2 - mu2 * mu2, 0.0)
    s2a, t2, inv2 = _affines(g2, be2, mu2, var2)

    pos = s2a > 0
    z1sel = jnp.where(pos, zmax, zmin)
    ksel = jnp.where(pos, kmax, kmin)
    pre2 = z1sel * s2a + t2
    out = jnp.where(pre2 >= 0, pre2, neg_slope * pre2)
    return out, mu1, var1, mu2, var2, (a, b, idxt, w2, g1, g2, mu1, var1,
                                       mu2, var2, z1sel, ksel, out)


def fused_edgeconv_train(a, b, gamma1, beta1, w2, gamma2, beta2, idx, *,
                         neg_slope: float = 0.2, tile_q: int = 512,
                         unroll: int = 5, mxu_dtype=jnp.bfloat16):
    """Fused train-mode EdgeConv block.

    Args:
      a:      (B, N, C) neighbour-term table  x @ Wd.
      b:      (B, N, C) centre-term table     x @ (Wc - Wd).
      gamma1/beta1: (C,) bn1 scale/shift; w2: (C, W1); gamma2/beta2: (W1,).
      idx:    (B, N, K) int32 kNN indices.
    Returns:
      (out (B, N, W1), mu1, var1, mu2, var2) — the batch stats are for
      running-average updates only; their cotangents are ignored.
    """
    return _fused_train(a, b, gamma1, beta1, w2, gamma2, beta2, idx,
                        neg_slope, tile_q, unroll, mxu_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def _fused_train(a, b, gamma1, beta1, w2, gamma2, beta2, idx,
                 neg_slope, tile_q, unroll, dt):
    out, mu1, var1, mu2, var2, _ = _fwd_impl(
        a, b, gamma1, beta1, w2, gamma2, beta2, idx, neg_slope, tile_q,
        unroll, dt)
    return out, mu1, var1, mu2, var2


def _vjp_fwd(a, b, gamma1, beta1, w2, gamma2, beta2, idx,
             neg_slope, tile_q, unroll, dt):
    out, mu1, var1, mu2, var2, res = _fwd_impl(
        a, b, gamma1, beta1, w2, gamma2, beta2, idx, neg_slope, tile_q,
        unroll, dt)
    return (out, mu1, var1, mu2, var2), res + (beta1,)


def _vjp_bwd(neg_slope, tile_q, unroll, dt, res, cts):
    (a, b, idxt, w2, g1, g2, mu1, var1, mu2, var2, z1sel, ksel, out,
     beta1) = res
    gout = cts[0]  # stat cotangents (running-average side channel) ignored
    bsz, n, c = a.shape
    k = idxt.shape[1]
    e = bsz * n * k
    tq = min(tile_q, n)
    ur = k if n >= 2048 else _pick_unroll(k, unroll)

    s1, t1, inv1 = _affines(g1, beta1, mu1, var1)
    inv2 = jax.lax.rsqrt(var2 + _EPS)
    g2s = g2 * inv2

    gsel = gout * jnp.where(out >= 0, 1.0, neg_slope)
    y2hat_sel = (z1sel - mu2) * inv2
    c1 = gsel.sum((0, 1)) / e
    c2 = (gsel * y2hat_sel).sum((0, 1)) / e
    dbeta2 = c1 * e
    dgamma2 = c2 * e

    p1 = jnp.stack([s1, t1, mu1, inv1])                           # (4, C)
    pk = jnp.stack([g2s, c1, c2, mu2, inv2])                      # (5, W1)
    dw2, sums = _bwd_pallas("b1", a, b, idxt, p1, w2, gsel, ksel, pk, None,
                            k, tq, neg_slope, ur, dt)
    dbeta1 = sums[0]
    dgamma1 = sums[1]
    pd = jnp.stack([g1 * inv1, sums[0] / e, sums[1] / e])         # (3, C)
    da, db = _bwd_pallas("b2", a, b, idxt, p1, w2, gsel, ksel, pk, pd,
                         k, tq, neg_slope, ur, dt)
    return (da.astype(a.dtype), db.astype(b.dtype), dgamma1, dbeta1, dw2,
            dgamma2, dbeta2, None)


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
