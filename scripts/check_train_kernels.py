"""TPU gate for the fused TRAINING kernels (run on real TPU; CPU interpret
mode cannot exercise the Mosaic-compiled paths at production shapes).

Validates, at the production shape (16, 2048, 64, K=20):
  1. knn_with_stats: indices identical to the plain packed kernel; the
     in-degree counts and transposed b-scatter match the exact XLA
     computation (cnt exactly, scb to f32-matmul reordering tolerance).
  2. fused_edgeconv_train (kNN+GSF+backward) value_and_grad against the
     unfused XLA oracle: forward and every gradient within the documented
     bf16/tie-rerouting envelope, and the error must not regress past the
     recorded r3 levels (fwd 3e-3, da/dg1 2e-2, db/dbe1 6e-2, dw2 2e-2).

Prints OK on success. Referenced by .claude/skills/verify/SKILL.md.
"""
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gfs3dseg_gws_tpu.ops import fused_edgeconv_train as fet  # noqa: E402
from gfs3dseg_gws_tpu.ops import knn as knn_mod  # noqa: E402


def main():
    if jax.default_backend() != "tpu":
        print("SKIP: no TPU backend")
        return
    b, n, c, k = 16, 2048, 64, 20
    x = jax.random.normal(jax.random.PRNGKey(0), (b, n, c), jnp.float32)
    a = jax.random.normal(jax.random.PRNGKey(1), (b, n, c))
    bt = jax.random.normal(jax.random.PRNGKey(2), (b, n, c)) * 0.3
    w2 = jax.random.normal(jax.random.PRNGKey(3), (c, c)) * 0.1
    g1 = jnp.ones((c,)) * 1.1
    be1 = jnp.ones((c,)) * 0.05
    g2 = jnp.ones((c,)) * 0.9
    be2 = jnp.zeros((c,))

    idx, cnt, scb = knn_mod.knn_with_stats(x, bt, k)
    idx2 = knn_mod._knn_pallas(x, k)
    assert (np.asarray(idx) == np.asarray(idx2)).all(), \
        "knn_with_stats indices diverge from the packed kernel"
    cnt_x, scb_x = knn_mod.neighbor_stats_xla(idx, bt)
    assert float(jnp.abs(cnt - cnt_x).max()) == 0.0, "cnt not exact"
    scb_rel = float(jnp.linalg.norm(scb - scb_x) / jnp.linalg.norm(scb_x))
    assert scb_rel < 5e-3, f"scb rel {scb_rel}"
    print(f"knn_with_stats: idx identical, cnt exact, scb rel {scb_rel:.1e}")

    def f_fused(a_, b_, w2_, g1_, be1_, g2_, be2_):
        i2, c2_, s2_ = knn_mod.knn_with_stats(
            jax.lax.stop_gradient(x), jax.lax.stop_gradient(b_), k)
        out, mu1, var1, mu2, var2 = fet.fused_edgeconv_train(
            a_, b_, g1_, be1_, w2_, g2_, be2_, i2, cnt=c2_, scb=s2_)
        return ((out * jnp.cos(out)).sum() + (mu1 * var1).sum() * 0.1
                + (mu2 * var2).sum() * 0.1)

    def f_xla(a_, b_, w2_, g1_, be1_, g2_, be2_):
        out, mu1, var1, mu2, var2 = fet.fused_edgeconv_train_xla(
            a_, b_, g1_, be1_, w2_, g2_, be2_, idx)
        return ((out * jnp.cos(out)).sum() + (mu1 * var1).sum() * 0.1
                + (mu2 * var2).sum() * 0.1)

    args = (a, bt, w2, g1, be1, g2, be2)
    grad_all = tuple(range(7))
    vf, gf = jax.jit(jax.value_and_grad(f_fused, argnums=grad_all))(*args)
    vx, gx = jax.jit(jax.value_and_grad(f_xla, argnums=grad_all))(*args)
    fwd_rel = float(abs(vf - vx) / abs(vx))
    assert fwd_rel < 3e-3, f"fwd rel {fwd_rel}"
    limits = {"da": 2e-2, "db": 6e-2, "dw2": 2e-2, "dg1": 2e-2,
              "dbe1": 6e-2, "dg2": 5e-3, "dbe2": 5e-3}
    for name, u, v in zip(limits, gf, gx):
        rel = float(jnp.linalg.norm(u - v) / (jnp.linalg.norm(v) + 1e-9))
        assert rel < limits[name], f"{name} rel {rel} > {limits[name]}"
        print(f"{name} rel {rel:.2e} (< {limits[name]})")
    print(f"fused train EdgeConv vs XLA oracle: fwd rel {fwd_rel:.2e}")
    print("OK")


if __name__ == "__main__":
    main()
