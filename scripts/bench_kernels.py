"""Per-kernel microbenchmark for the training-step hot path on the TPU.

Times each Pallas kernel of the train pipeline at production shapes
(B=16, N=2048, C=64, K=20) with the fori_loop-difference methodology from
bench.py (axon tunnel: host transfer = the only true sync; loop bodies must
depend on the index or XLA hoists them).

Usage: python scripts/bench_kernels.py [--batch 16] [--which knn,stats,gsf,bwd]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import functools
import time

import jax
import jax.numpy as jnp


def timed_loop(fn, *args, iters_lo=4, iters_hi=24, reps=3):
    """Per-call seconds for fn(*args) via two jitted fori_loop lengths."""

    @functools.partial(jax.jit, static_argnums=(0,))
    def run(n, *a):
        def body(i, carry):
            out = fn(*jax.tree.map(lambda x: x + 0.0 * i
                                   if jnp.issubdtype(x.dtype, jnp.floating)
                                   else x, a))
            leaves = [l for l in jax.tree.leaves(out)
                      if jnp.issubdtype(l.dtype, jnp.floating)]
            return carry + sum(jnp.sum(l) * 1e-9 for l in leaves)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def once(n):
        t0 = time.perf_counter()
        float(run(n, *args))
        return time.perf_counter() - t0

    once(1)  # compile both loop lengths happens per n; warm each
    once(iters_lo)
    once(iters_hi)
    lo = min(once(iters_lo) for _ in range(reps))
    hi = min(once(iters_hi) for _ in range(reps))
    return (hi - lo) / (iters_hi - iters_lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--npts", type=int, default=2048)
    ap.add_argument("--cin", type=int, default=64)
    ap.add_argument("--which", type=str, default="knn,stats,gsf,bwd")
    args = ap.parse_args()
    b, n, c, k = args.batch, args.npts, args.cin, 20
    which = set(args.which.split(","))

    from gfs3dseg_gws_tpu.ops import knn as knn_mod
    from gfs3dseg_gws_tpu.ops import fused_edgeconv_train as fet

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, n, c), jnp.float32)
    idx = knn_mod.knn_indices(x, k)
    idxt = jnp.transpose(idx, (0, 2, 1)).astype(jnp.int32)
    a = jax.random.normal(jax.random.PRNGKey(1), (b, n, c))
    bt = jax.random.normal(jax.random.PRNGKey(2), (b, n, c))
    w2 = jax.random.normal(jax.random.PRNGKey(3), (c, c)) * 0.1
    s1 = jnp.ones((c,))
    t1 = jnp.zeros((c,))
    gsel = jax.random.normal(jax.random.PRNGKey(4), (b, n, c))
    ksel = jnp.zeros((b, n, c), jnp.int32)
    p1 = jnp.stack([s1, t1, t1, s1, s1])
    pk = jnp.stack([s1, t1, t1, t1, s1])
    dt = jnp.bfloat16

    if "evalsplit" in which:
        from gfs3dseg_gws_tpu.ops import fused_edgeconv as fe
        bias2 = jnp.zeros((c,))
        t = timed_loop(lambda xx: fe.fused_edgeconv_infer(
            xx, a, bt, w2, bias2, k), x)
        print(f"eval fused        {t*1e3:8.3f} ms/call   x3 = {3*t*1e3:6.2f} ms")
        for tq in (256, 512):
            for stack in (4, 5, 10, 20):
                t = timed_loop(lambda xx: fe.fused_edgeconv_infer_split(
                    xx, a, bt, w2, bias2, k, tile_q=tq, stack=stack), x)
                print(f"eval split tq={tq:4d} G={stack:2d} {t*1e3:8.3f} ms/call"
                      f"   x3 = {3*t*1e3:6.2f} ms")
    if "knn" in which:
        t = timed_loop(lambda xx: knn_mod._knn_pallas(xx, k).astype(jnp.float32), x)
        print(f"knn_pallas        {t*1e3:8.3f} ms/call   x3 = {3*t*1e3:6.2f} ms")
    if "knnx" in which:
        t = timed_loop(lambda xx: knn_mod._knn_xla(xx, k).astype(jnp.float32), x)
        print(f"knn_xla           {t*1e3:8.3f} ms/call")
    if "stats" in which:
        t = timed_loop(lambda xx, bb: knn_mod._knn_stats_pallas(
            xx, bb, k)[1], x, bt)
        print(f"knn_with_stats    {t*1e3:8.3f} ms/call   x3 = {3*t*1e3:6.2f} ms")
    if "gsf" in which:
        t = timed_loop(
            lambda aa, bb: fet._gsf_pallas(aa, bb, idxt, s1, t1, w2, k, 256,
                                           0.2, 5, dt)[1], a, bt)
        print(f"gsf (gather+fwd)  {t*1e3:8.3f} ms/call   x3 = {3*t*1e3:6.2f} ms")
    nbr = fet._gsf_pallas(a, bt, idxt, s1, t1, w2, k, 256, 0.2, 5, dt)[0]
    if "bwd" in which:
        t = timed_loop(
            lambda nn, bb, gg: fet._bwd_pallas(nn, bb, idxt, p1, w2, gg, ksel,
                                               pk, k, 256, 0.2, 5, dt)[:2],
            nbr, bt, gsel)
        print(f"bwd (merged B)    {t*1e3:8.3f} ms/call   x3 = {3*t*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
