"""Price the bf16-activations lever on the train step's XLA-level segments.

The fused Pallas kernels (EdgeConv GSF train, kNN, attention scores) already
run their MXU matmuls in bf16 with f32 accumulation, and the backward scatter
sits at ~95% of bf16 MXU peak (docs/ARCHITECTURE.md) — so a "bf16 training
mode" could only speed up the segments that still run f32 through plain XLA:
the attention module, the DGCNN MLP, and the CAPL head (fusion conv + cosine
logits + CE). This script times exactly those, fwd+bwd at production shape
(B=16, N=2048), in f32 vs bf16 (params + activations cast at the boundary,
f32 loss reduction = the fp32-master-weights recipe), and prints the total
step-level delta the full mode could buy. Run on an idle TPU.

Usage: python scripts/bench_bf16.py [--batch 16]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp

from scripts.bench_kernels import timed_loop


def _cast(tree, dt):
    return jax.tree.map(
        lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, tree)


def bench_module(name, apply_fn, params, *args):
    """fwd+bwd time of mean(apply(params, *args)) in f32 and bf16."""

    def run(dt):
        p = _cast(params, dt)
        a = _cast(args, dt)

        def loss(p_, *a_):
            out = apply_fn(p_, *a_)
            leaves = [jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree.leaves(out)]
            return sum(leaves) * 1e-6

        g = jax.grad(loss)
        return timed_loop(lambda pp, *aa: g(pp, *aa), p, *a)

    t32 = run(jnp.float32)
    t16 = run(jnp.bfloat16)
    print(f"{name:28s} f32 {t32 * 1e3:7.3f} ms   bf16 {t16 * 1e3:7.3f} ms"
          f"   delta {(t32 - t16) * 1e3:+7.3f} ms")
    return t32 - t16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    b, n = args.batch, 2048

    rng = jax.random.PRNGKey(0)
    total = 0.0

    # 1) SelfAttention at its production operating point (input 192 =
    #    concatenated EdgeConv outputs, output_dim 64), train mode w/o
    #    dropout rng dependence (rate folded out: timing only)
    from gfs3dseg_gws_tpu.models.attention import SelfAttention

    x = jax.random.normal(rng, (b, n, 192))
    attn = SelfAttention(out_channels=64, attn_dropout=0.1, use_pallas=True)
    av = attn.init({"params": rng, "dropout": rng}, x, True)

    def attn_apply(p, xx):
        return attn.apply(p, xx, True, rngs={"dropout": jax.random.PRNGKey(1)})

    total += bench_module("attention fwd+bwd (train)", attn_apply, av, x)

    # 2) DGCNN MLP[512,256] (the global-feature trunk)
    from gfs3dseg_gws_tpu.models.layers import MLPStack

    mlp = MLPStack((512, 256))
    mv = mlp.init(rng, x, True)

    def mlp_apply(p, xx):
        out, _ = mlp.apply(p, xx, True, mutable=["batch_stats"])
        return out

    total += bench_module("dgcnn mlp[512,256] fwd+bwd", mlp_apply, mv, x)

    # 3) CAPL head proxy: fusion conv (feat 320 -> 128) + l2norm cosine
    #    logits against 20 prototypes + CE (capl.py:297-335 hot math)
    feat = jax.random.normal(rng, (b, n, 320))
    w = jax.random.normal(rng, (320, 128)) * 0.05
    protos = jax.random.normal(rng, (20, 128))
    labels = jax.random.randint(rng, (b, n), 0, 20)
    onehot = jax.nn.one_hot(labels, 20, dtype=jnp.float32)

    def head_apply(p, ff, oh):
        wt, pr = p
        z = ff @ wt
        z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True),
                            1e-12)
        pn = pr / jnp.maximum(jnp.linalg.norm(pr, axis=-1, keepdims=True),
                              1e-12)
        logits = 10.0 * (z @ pn.T)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.sum(logp * oh, -1))

    total += bench_module("capl head+CE fwd+bwd", head_apply,
                          (w, protos), feat, onehot)

    print(f"\nsummed bf16 delta over XLA-level segments: "
          f"{total * 1e3:+.3f} ms per step "
          f"(train step is ~24 ms at (16,2048); Pallas kernels already "
          f"bf16-internal)")


if __name__ == "__main__":
    main()
