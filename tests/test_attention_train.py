"""Fused training attention: rate-0 exactness (fwd + VJP) and dropout-mask
statistics/determinism (Pallas interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from gfs3dseg_gws_tpu.ops.attention_train import attention_train

B, N, D = 2, 128, 8
TEMP = float(D) ** 0.5


def _setup(seed=0):
    r = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(r.standard_normal((B, N, D)).astype(np.float32))
    return mk(), mk(), mk(), jnp.asarray([7], jnp.int32)


def _xla(q, k, v):
    attn = jnp.einsum("bmc,bnc->bmn", q / TEMP, k,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bmn,bnc->bmc", attn, v,
                      preferred_element_type=jnp.float32)


def test_rate0_forward_exact():
    q, k, v, seed = _setup()
    with pltpu.force_tpu_interpret_mode():
        out = attention_train(q, k, v, seed, temperature=TEMP, rate=0.0,
                              tile_q=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_xla(q, k, v)),
                               rtol=1e-5, atol=1e-5)


def test_rate0_gradients_exact():
    q, k, v, seed = _setup(1)
    cot = jnp.asarray(np.random.default_rng(2).standard_normal(
        (B, N, D)).astype(np.float32))

    def loss_f(q, k, v):
        return jnp.sum(attention_train(q, k, v, seed, temperature=TEMP,
                                       rate=0.0, tile_q=64) * cot)

    def loss_r(q, k, v):
        return jnp.sum(_xla(q, k, v) * cot)

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-4, err_msg=f"grad {name}")


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pltpu.prng_random_bits returns zeros in "
                           "interpret mode; dropout is TPU-validated by "
                           "scripts/check_attention_dropout.py")
def test_dropout_statistics_and_determinism_tpu():
    q, k, v, seed = _setup(3)
    rate = 0.5
    o1 = attention_train(q, k, v, seed, temperature=TEMP, rate=rate)
    o2 = attention_train(q, k, v, seed, temperature=TEMP, rate=rate)
    o3 = attention_train(q, k, v, seed + 1, temperature=TEMP, rate=rate)
    # same seed -> identical (backward recompute relies on this)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    # different seed -> different mask
    assert not np.allclose(np.asarray(o1), np.asarray(o3))
    # E[dropout(A)] = A: the output should track the no-dropout output
    base = np.asarray(_xla(q, k, v))
    assert abs((np.asarray(o1) - base).mean()) < 0.05
    # corr ~= sqrt(1 - rate) for near-uniform attention weights
    assert np.corrcoef(np.asarray(o1).ravel(), base.ravel())[0, 1] > 0.5
