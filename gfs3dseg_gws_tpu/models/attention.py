"""Single-head self-attention over points.

Semantics follow reference model/attention.py:10-48: bias-free QKV 1x1 convs,
temperature sqrt(out_channels), dropout on the attention weights. Channel-last
layout keeps both matmuls (N,C)x(C,N) and (N,N)x(N,C) on the MXU; XLA fuses
the softmax into the chain.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class SelfAttention(nn.Module):
    out_channels: int = 64
    attn_dropout: float = 0.1
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """x: (B, N, C_in) -> (B, N, out_channels)."""
        q = nn.Dense(self.out_channels, use_bias=False, name="q_map")(x)
        k = nn.Dense(self.out_channels, use_bias=False, name="k_map")(x)
        v = nn.Dense(self.out_channels, use_bias=False, name="v_map")(x)

        temperature = float(self.out_channels) ** 0.5
        on_tpu = self.use_pallas and jax.default_backend() == "tpu"
        if not train and on_tpu:
            # fused kernel: the (B, N, N) weight matrix stays in VMEM
            from gfs3dseg_gws_tpu.ops.attention_kernel import fused_attention

            return fused_attention(q, k, v, temperature).astype(x.dtype)
        if train and on_tpu and not self.is_initializing():
            # fused train kernel with in-kernel dropout PRNG (its Bernoulli
            # stream differs from nn.Dropout's — documented deviation)
            from gfs3dseg_gws_tpu.ops.attention_train import attention_train

            seed = jax.random.randint(self.make_rng("dropout"), (1,), 0,
                                      2 ** 31 - 1, dtype=jnp.int32)
            return attention_train(q, k, v, seed, temperature=temperature,
                                   rate=self.attn_dropout).astype(x.dtype)

        attn = jnp.einsum("bmc,bnc->bmn", q / temperature, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(rate=self.attn_dropout, deterministic=not train)(attn)
        y = jnp.einsum("bmn,bnc->bmc", attn.astype(x.dtype), v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        return y
