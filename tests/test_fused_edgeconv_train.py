"""Fused TRAINING EdgeConv: forward + custom-VJP gradients vs the exact
unfused composition (Pallas interpret mode on CPU)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from gfs3dseg_gws_tpu.ops.fused_edgeconv_train import (
    fused_edgeconv_train,
    fused_edgeconv_train_xla,
)
from gfs3dseg_gws_tpu.ops.knn import _knn_xla

B, N, C, W1, K = 2, 128, 8, 8, 5


def _setup(seed=0):
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.standard_normal((B, N, 3)).astype(np.float32))
    idx = _knn_xla(x, K)
    args = dict(
        a=jnp.asarray(r.standard_normal((B, N, C)).astype(np.float32)),
        b=jnp.asarray(r.standard_normal((B, N, C)).astype(np.float32)),
        gamma1=jnp.asarray(0.5 + r.uniform(0, 1, C).astype(np.float32)),
        beta1=jnp.asarray(0.3 * r.standard_normal(C).astype(np.float32)),
        w2=jnp.asarray(0.4 * r.standard_normal((C, W1)).astype(np.float32)),
        # include a NEGATIVE bn2 scale: exercises the min-branch of the
        # monotone max/min trick
        gamma2=jnp.asarray(
            np.concatenate([0.5 + r.uniform(0, 1, W1 - 2),
                            -0.7 - r.uniform(0, 1, 2)]).astype(np.float32)),
        beta2=jnp.asarray(0.3 * r.standard_normal(W1).astype(np.float32)),
    )
    return args, idx


def _fused(args, idx):
    with pltpu.force_tpu_interpret_mode():
        return fused_edgeconv_train(args["a"], args["b"], args["gamma1"],
                                    args["beta1"], args["w2"],
                                    args["gamma2"], args["beta2"], idx,
                                    tile_q=64)


def test_forward_matches_unfused():
    args, idx = _setup()
    out, mu1, var1, mu2, var2 = _fused(args, idx)
    ref = fused_edgeconv_train_xla(args["a"], args["b"], args["gamma1"],
                                   args["beta1"], args["w2"], args["gamma2"],
                                   args["beta2"], idx)
    np.testing.assert_allclose(mu1, ref[1], rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(var1, ref[2], rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(mu2, ref[3], rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(var2, ref[4], rtol=5e-2, atol=5e-2)
    # bf16 gather/matmul inputs: coarse elementwise, tight correlation
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[0]),
                               rtol=0.06, atol=0.06)
    assert np.corrcoef(np.asarray(out).ravel(),
                       np.asarray(ref[0]).ravel())[0, 1] > 0.999


def _grads(args, idx, mxu_dtype):
    names = list(args)
    r = np.random.default_rng(2)
    cot = jnp.asarray(r.standard_normal((B, N, W1)).astype(np.float32))

    def loss_fused(vals):
        a = dict(zip(names, vals))
        out, *_ = fused_edgeconv_train(
            a["a"], a["b"], a["gamma1"], a["beta1"], a["w2"],
            a["gamma2"], a["beta2"], idx, tile_q=64, mxu_dtype=mxu_dtype)
        return jnp.sum(out * cot)

    def loss_ref(vals):
        a = dict(zip(names, vals))
        out, *_ = fused_edgeconv_train_xla(
            a["a"], a["b"], a["gamma1"], a["beta1"], a["w2"],
            a["gamma2"], a["beta2"], idx)
        return jnp.sum(out * cot)

    vals = [args[k] for k in names]
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused)(vals)
    g_ref = jax.grad(loss_ref)(vals)
    return names, g_fused, g_ref


def test_gradients_match_unfused_fp32():
    """With fp32 MXU inputs the custom VJP (incl. gradients through batch
    statistics) matches autodiff of the unfused composition tightly."""
    args, idx = _setup(1)
    for name, gf, gr in zip(*_grads(args, idx, jnp.float32)):
        gf, gr = np.asarray(gf), np.asarray(gr)
        scale = np.abs(gr).max() + 1e-6
        np.testing.assert_allclose(gf / scale, gr / scale, atol=3e-3,
                                   err_msg=f"grad mismatch for {name}")


def test_gradients_bf16_statistically_close():
    """Production bf16 mode: a few argmax slots flip between near-tied
    neighbours (gradient re-routes within the neighbourhood), so compare
    statistically, not elementwise."""
    args, idx = _setup(1)
    for name, gf, gr in zip(*_grads(args, idx, jnp.bfloat16)):
        gf, gr = np.asarray(gf).ravel(), np.asarray(gr).ravel()
        assert np.corrcoef(gf, gr)[0, 1] > 0.99, name
        if name in ("a", "b", "w2"):
            # the small bn vectors are near-cancelling sums over all edges
            # (rel-RMS is ill-conditioned there); corr covers them above
            rel_rms = (np.sqrt(np.mean((gf - gr) ** 2))
                       / (np.sqrt(np.mean(gr ** 2)) + 1e-9))
            assert rel_rms < 0.15, (name, rel_rms)


def test_running_stat_values_are_batch_stats():
    """mu/var outputs equal the oracle's batch stats (they feed the
    module's running-average updates)."""
    args, idx = _setup(3)
    _, mu1, var1, _, _ = _fused(args, idx)
    e0 = None
    from gfs3dseg_gws_tpu.ops.edgeconv import gather_neighbors

    e0 = gather_neighbors(args["a"], idx) + args["b"][:, :, None, :]
    np.testing.assert_allclose(mu1, jnp.mean(e0, (0, 1, 2)), rtol=1e-2,
                               atol=1e-2)
    np.testing.assert_allclose(
        var1, jnp.maximum(jnp.mean(e0**2, (0, 1, 2))
                          - jnp.mean(e0, (0, 1, 2))**2, 0.0),
        rtol=2e-2, atol=2e-2)


def test_manualbn_record_matches_call_update():
    """record_batch_stats (used by the fused train path) must update the
    running averages exactly like ManualBN.__call__ in train mode."""
    from flax import linen as nn

    from gfs3dseg_gws_tpu.models.layers import ManualBN

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, 16, 8)).astype(np.float32))

    class ViaCall(nn.Module):
        def setup(self):
            self.bn = ManualBN(8)

        def __call__(self, x):
            return self.bn(x, use_running_average=False)

    class ViaRecord(nn.Module):
        def setup(self):
            self.bn = ManualBN(8)

        def __call__(self, x):
            mu = jnp.mean(x, (0, 1))
            var = jnp.maximum(jnp.mean(x * x, (0, 1)) - mu * mu, 0.0)
            self.bn.record_batch_stats(mu, var, n=x.shape[0] * x.shape[1])
            return x

    va = ViaCall().init(jax.random.PRNGKey(0), x)
    vb = ViaRecord().init(jax.random.PRNGKey(0), x)
    _, ua = ViaCall().apply(va, x, mutable=["batch_stats"])
    _, ub = ViaRecord().apply(vb, x, mutable=["batch_stats"])
    sa = jax.tree.leaves(ua["batch_stats"])
    sb = jax.tree.leaves(ub["batch_stats"])
    for a, b in zip(sa, sb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
