"""Fused single-head attention for TRAINING (fwd + custom VJP).

The reference trains attention with dropout on the (N, N) weight matrix
(model/attention.py:24-48). The XLA path materialises the weights, the
dropout mask, and their backward counterparts in HBM — ~6 round trips over
(B, N, N) fp32. This kernel keeps every (TQ, N) tile in VMEM:

  fwd   scores -> softmax (saving row max + denominator, (B, N) each) ->
        dropout via the in-kernel PRNG -> @V.
  bwd   recompute scores and the softmax from the saved max/denominator
        (bitwise-identical P), REGENERATE the dropout mask from the same
        per-(batch, tile) seed, then the standard chain:
            dv += A^T dy        dA = dy V^T        dP = dA * mask/(1-p)
            dS = P * (dP - rowsum(dP * P))
            dq = dS K / t       dk += dS^T q / t

The dropout mask therefore never exists outside VMEM. The mask is drawn
from the Pallas per-core PRNG seeded with (seed, batch, tile) — a DIFFERENT
stream than flax's `nn.Dropout`, which is a documented deviation (dropout
only needs to be i.i.d. Bernoulli; tests pin rate-0 exactness and the
mask statistics).

Matmuls run in fp32 (the D=64 contractions are cheap; scores dominate VMEM
not FLOPs), so rate-0 gradients match autodiff of the XLA composition
tightly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _keep_mask(shape, rate: float):
    """Bernoulli(1-rate) keep mask from the seeded per-core PRNG."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # uniform in [0, 1) from the top 24 bits (via int32: Mosaic has no
    # uint32 -> float32 cast; after >> 8 the value fits in 24 bits)
    top = pltpu.bitcast(bits >> 8, jnp.int32)
    u = top.astype(jnp.float32) * (1.0 / (1 << 24))
    return u >= rate


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, out_ref, m_ref, den_ref,
                *, temperature: float, rate: float):
    i = pl.program_id(0)
    j = pl.program_id(1)
    # Mosaic supports at most two seed values: fold (batch, tile) into one
    pltpu.prng_seed(seed_ref[0], i * pl.num_programs(1) + j)
    q = q_ref[0].astype(jnp.float32)                         # (TQ, D)
    k = k_ref[0].astype(jnp.float32)                         # (N, D)
    v = v_ref[0].astype(jnp.float32)                         # (N, D)
    s = jnp.dot(q * (1.0 / temperature), k.T,
                preferred_element_type=jnp.float32)          # (TQ, N)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    den = jnp.sum(p, axis=-1, keepdims=True)
    m_ref[0] = m.T                                           # (1, TQ)
    den_ref[0] = den.T
    a = p * (1.0 / den)
    if rate > 0.0:
        keep = _keep_mask(a.shape, rate)
        a = jnp.where(keep, a * (1.0 / (1.0 - rate)), 0.0)
    out_ref[0] = jnp.dot(a, v, preferred_element_type=jnp.float32)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, m_ref, den_ref, dy_ref,
                dq_ref, dk_ref, dv_ref,
                *, temperature: float, rate: float):
    i = pl.program_id(0)
    j = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0], i * pl.num_programs(1) + j)

    @pl.when(j == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)                       # (TQ, D)
    s = jnp.dot(q * (1.0 / temperature), k.T,
                preferred_element_type=jnp.float32)
    p = jnp.exp(s - m_ref[0].T) * (1.0 / den_ref[0].T)       # == fwd's a
    if rate > 0.0:
        keep = _keep_mask(p.shape, rate)
        scale = 1.0 / (1.0 - rate)
        a = jnp.where(keep, p * scale, 0.0)
    else:
        a = p
    dv_ref[0] = dv_ref[0] + jax.lax.dot_general(
        a, dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (N, D)
    da = jnp.dot(dy, v.T, preferred_element_type=jnp.float32)  # (TQ, N)
    if rate > 0.0:
        dp = jnp.where(keep, da * scale, 0.0)
    else:
        dp = da
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq_ref[0] = jnp.dot(ds, k,
                        preferred_element_type=jnp.float32) * (
                            1.0 / temperature)
    dk_ref[0] = dk_ref[0] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * (1.0 / temperature)


def _common_specs(n, d, tile_q):
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, tile_q, d), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def attention_train(q, k, v, seed, *, temperature: float,
                    rate: float = 0.1, tile_q: int = 512):
    """Dropout-softmax attention, (B, N, D) -> (B, N, D) fp32.

    seed: (1,) int32 — per-step dropout seed (mixed with batch/tile ids
    in-kernel). Gradient-transparent.
    """
    return _attn_train(q, k, v, seed, temperature, rate, tile_q)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _attn_train(q, k, v, seed, temperature, rate, tile_q):
    out, _, _ = _fwd_pallas(q, k, v, seed, temperature, rate, tile_q)
    return out


def _fwd_pallas(q, k, v, seed, temperature, rate, tile_q):
    b, n, d = q.shape
    tile_q = min(tile_q, n)
    kern = functools.partial(_fwd_kernel, temperature=temperature,
                             rate=rate)
    return pl.pallas_call(
        kern,
        grid=(b, n // tile_q),
        in_specs=_common_specs(n, d, tile_q),
        out_specs=(
            pl.BlockSpec((1, tile_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, n, d), jnp.float32),
                   jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
                   jax.ShapeDtypeStruct((b, 1, n), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(seed, q, k, v)


def _attn_vjp_fwd(q, k, v, seed, temperature, rate, tile_q):
    out, m, den = _fwd_pallas(q, k, v, seed, temperature, rate, tile_q)
    return out, (q, k, v, seed, m, den)


def _attn_vjp_bwd(temperature, rate, tile_q, res, dy):
    q, k, v, seed, m, den = res
    b, n, d = q.shape
    tq = min(tile_q, n)
    kern = functools.partial(_bwd_kernel, temperature=temperature,
                             rate=rate)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(b, n // tq),
        in_specs=_common_specs(n, d, tq) + [
            pl.BlockSpec((1, 1, tq), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tq), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, n, d), jnp.float32),
                   jax.ShapeDtypeStruct((b, n, d), jnp.float32),
                   jax.ShapeDtypeStruct((b, n, d), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(seed, q, k, v, m, den, dy)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None)


_attn_train.defvjp(_attn_vjp_fwd, _attn_vjp_bwd)
