"""Micro-bench the fused training EdgeConv passes at production shape.

Times each pass (S1 multi-hot stats, SF forward, merged backward), the
whole op fwd and fwd+bwd, the unfused XLA composition, and the kNN kernel,
using the on-device fori_loop differencing methodology (see bench.py).

Usage: PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/bench_edgeconv_train.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp

from gfs3dseg_gws_tpu.ops import fused_edgeconv_train as fet
from gfs3dseg_gws_tpu.ops.knn import knn_indices


def timer(make_body, name, lo=2, hi=10):
    @jax.jit
    def run(iters):
        def body(i, acc):
            return acc + make_body(i)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(run(jnp.int32(1)))  # compile + warmup
    def t(n):
        t0 = time.perf_counter()
        float(run(jnp.int32(n)))
        return time.perf_counter() - t0
    dt = (min(t(hi) for _ in range(2)) - min(t(lo) for _ in range(2))) / (
        hi - lo)
    print(f"{name:28s} {dt*1e3:8.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--npts", type=int, default=2048)
    ap.add_argument("--stack", type=int, default=5)
    ap.add_argument("--tile_q", type=int, default=512)
    args = ap.parse_args()
    b, n, c, k = args.batch, args.npts, 64, 20
    stack, tile_q = args.stack, args.tile_q

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)
    x = jax.random.normal(ks[0], (b, n, 3))
    a = jax.random.normal(ks[1], (b, n, c))
    bb = jax.random.normal(ks[2], (b, n, c))
    g1 = jnp.abs(jax.random.normal(ks[3], (c,))) + 0.5
    be1 = jax.random.normal(ks[4], (c,)) * 0.1
    w2 = jax.random.normal(ks[5], (c, c)) * 0.2
    g2 = jax.random.normal(ks[6], (c,))
    be2 = jax.random.normal(ks[7], (c,)) * 0.1
    idx = knn_indices(x, k, use_pallas=False)
    idxt = jnp.transpose(idx, (0, 2, 1)).astype(jnp.int32)
    gsel = jax.random.normal(ks[8], (b, n, c))
    ksel = jax.random.randint(ks[9], (b, n, c), 0, k)
    s1 = jnp.ones((c,))
    t1 = jnp.zeros((c,))
    p1 = jnp.stack([s1, t1, t1, s1, s1])
    pk = jnp.stack([g2, be2, be2, be2, g2])
    dt16 = jnp.bfloat16

    timer(lambda i: knn_indices(x + 0.0 * i, k).sum().astype(jnp.float32),
          "knn (pallas)")

    def s1_body(i):
        av = a + 0.0 * i
        gs = fet._gs_pallas(jnp.concatenate([av, av * av], -1), idxt, k,
                            tile_q, dt16)
        return gs.sum()
    timer(s1_body, "S1 multihot gather-sum")

    def sf_body(i):
        outs = fet._sf_pallas(a + 0.0 * i, bb, idxt, s1, t1, w2, k, tile_q,
                              0.2, stack, dt16)
        return outs[0].sum() + outs[4].sum()
    timer(sf_body, f"SF fwd pass (stack={stack})")

    def bwd_body(i):
        scat, psum, cnt, dw2, sums = fet._bwd_pallas(
            a + 0.0 * i, bb, idxt, p1, w2, gsel, ksel, pk, k, tile_q, 0.2,
            stack, dt16)
        return scat.sum() + psum.sum() + dw2.sum()
    timer(bwd_body, "merged bwd pass")

    def fwd_body(i):
        out, *_ = fet.fused_edgeconv_train(a + 0.0 * i, bb, g1, be1, w2,
                                           g2, be2, idx, stack=stack,
                                           tile_q=tile_q)
        return out.sum()
    timer(fwd_body, "fused op fwd")

    loss = lambda aa, bbv: fet.fused_edgeconv_train(
        aa, bbv, g1, be1, w2, g2, be2, idx, stack=stack,
        tile_q=tile_q)[0].sum()
    grad = jax.grad(loss, argnums=(0, 1))

    def full_body(i):
        da, db = grad(a + 0.0 * i, bb)
        return da.sum() + db.sum()
    timer(full_body, "fused op fwd+bwd")

    loss_x = lambda aa, bbv: fet.fused_edgeconv_train_xla(
        aa, bbv, g1, be1, w2, g2, be2, idx)[0].sum()
    grad_x = jax.grad(loss_x, argnums=(0, 1))

    def unfused_body(i):
        da, db = grad_x(a + 0.0 * i, bb)
        return da.sum() + db.sum()
    timer(unfused_body, "unfused XLA fwd+bwd")


if __name__ == "__main__":
    main()
