"""Fused single-head attention for inference.

The reference's self-attention (model/attention.py) materialises the
(B, N, N) weight matrix; at N=2048, batch 64 that is a 1 GB fp32 tensor
round-tripping HBM twice. This kernel tiles over queries and keeps the
(TQ, N) score tile in VMEM: scores -> softmax -> @V in one pass. N=2048
fits whole rows in VMEM, so no online-softmax bookkeeping is needed.

Eval-mode only (the reference applies dropout on the attention weights
during training, which needs the XLA path's RNG).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, out_ref, *, temperature: float):
    q = q_ref[0].astype(jnp.float32)                        # (TQ, D)
    k = k_ref[0].astype(jnp.float32)                        # (N, D)
    v = v_ref[0].astype(jnp.float32)                        # (N, D)
    s = jnp.dot(q * (1.0 / temperature), k.T,
                preferred_element_type=jnp.float32)         # (TQ, N)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32)


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    temperature: float, tile_q: int = 512) -> jax.Array:
    """softmax(q kᵀ / temperature) v without materialising (B, N, N) in HBM.

    q/k/v: (B, N, D). Returns (B, N, D) float32.
    """
    b, n, d = q.shape
    tile_q = min(tile_q, n)
    if n % tile_q != 0:
        return _attention_xla(q, k, v, temperature)
    kern = functools.partial(_attn_kernel, temperature=temperature)
    return pl.pallas_call(
        kern,
        grid=(b, n // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v)


def _attention_xla(q, k, v, temperature):
    attn = jnp.einsum("bmc,bnc->bmn", q / temperature, k,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bmn,bnc->bmc", attn, v,
                      preferred_element_type=jnp.float32)
