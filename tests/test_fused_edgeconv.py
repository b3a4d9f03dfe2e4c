"""Fused EdgeConv kernel: XLA-composition equivalence + Pallas interpret."""
import jax
import jax.numpy as jnp
import numpy as np

from gfs3dseg_gws_tpu.models.dgcnn import EdgeConvBlock
from gfs3dseg_gws_tpu.ops.fused_edgeconv import (
    _fused_edgeconv_xla,
    fused_edgeconv_infer,
)

B, N, C, W = 2, 128, 9, 8


def _setup(seed=0):
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.standard_normal((B, N, C)).astype(np.float32))
    a = jnp.asarray(r.standard_normal((B, N, W)).astype(np.float32))
    b = jnp.asarray(r.standard_normal((B, N, W)).astype(np.float32))
    w2 = jnp.asarray(r.standard_normal((W, W)).astype(np.float32) * 0.3)
    bias2 = jnp.asarray(r.standard_normal((W,)).astype(np.float32) * 0.1)
    return x, a, b, w2, bias2


def test_xla_fallback_matches_manual():
    """The XLA composition equals a hand-rolled numpy computation."""
    x, a, b, w2, bias2 = _setup()
    out = np.asarray(_fused_edgeconv_xla(x, a, b, w2, bias2, k=5,
                                         neg_slope=0.2))
    xn, an, bn = map(np.asarray, (x, a, b))
    for bi in range(B):
        d = ((xn[bi][:, None, :] - xn[bi][None, :, :]) ** 2).sum(-1)
        idx = np.argsort(d, axis=-1, kind="stable")[:, :5]
        e = an[bi][idx] + bn[bi][:, None, :]
        e = np.where(e >= 0, e, 0.2 * e)
        l2 = e @ np.asarray(w2) + np.asarray(bias2)
        l2 = np.where(l2 >= 0, l2, 0.2 * l2)
        ref = l2.max(axis=1)
        np.testing.assert_allclose(out[bi], ref, rtol=1e-4, atol=1e-4)


def test_pallas_interpret_close_to_xla():
    """Interpreted Pallas kernel matches the XLA path up to bf16 rounding of
    the gather/matmul inputs and packed-top-k near-tie swaps."""
    from jax.experimental.pallas import tpu as pltpu

    x, a, b, w2, bias2 = _setup(1)
    ref = np.asarray(_fused_edgeconv_xla(x, a, b, w2, bias2, k=5,
                                         neg_slope=0.2))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_edgeconv_infer(x, a, b, w2, bias2, k=5,
                                              tile_q=64))
    # bf16 matmul inputs: ~2-3 decimal digits
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.999


def test_split_variant_matches_xla():
    """The split-kernel variant (measured negative, kept reproducible):
    wrapper gate routes small N to the exact XLA path; the gather+conv
    kernel itself matches under interpret mode when fed exact idx."""
    from jax.experimental.pallas import tpu as pltpu

    from gfs3dseg_gws_tpu.ops.fused_edgeconv import (_gather_conv_pallas,
                                                     fused_edgeconv_infer_split)
    from gfs3dseg_gws_tpu.ops.knn import _knn_xla

    x, a, b, w2, bias2 = _setup(2)
    ref = np.asarray(_fused_edgeconv_xla(x, a, b, w2, bias2, k=5,
                                         neg_slope=0.2))
    got = np.asarray(fused_edgeconv_infer_split(x, a, b, w2, bias2, k=5))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    idxt = jnp.transpose(_knn_xla(x, 5), (0, 2, 1)).astype(jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_gather_conv_pallas(idxt, a, b, w2, bias2, 5, 0.2,
                                             64, 5))
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.999


def test_edgeconv_block_train_eval_paths_agree_statistically():
    """After setting realistic running stats, the (unfused) eval path output
    is finite and shaped; fused path only activates on TPU."""
    blk = EdgeConvBlock((W, W), k=5, use_pallas=False)
    r = np.random.default_rng(2)
    x = jnp.asarray(r.standard_normal((B, N, C)).astype(np.float32))
    variables = blk.init(jax.random.PRNGKey(0), x)
    out, upd = blk.apply(variables, x, True, mutable=["batch_stats"])
    assert out.shape == (B, N, W)
    out_eval = blk.apply({"params": variables["params"],
                          "batch_stats": upd["batch_stats"]}, x, False)
    assert np.isfinite(np.asarray(out_eval)).all()
