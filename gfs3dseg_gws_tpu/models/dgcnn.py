"""DGCNN backbone: stacked dynamic EdgeConv blocks + point MLP.

Behavioural parity with reference model/dgcnn.py:83-127, but restructured for
the TPU:

* kNN graphs come from the fused Pallas pairwise-distance/top-k kernel
  (ops/knn.py) instead of materialising (B,N,N) in HBM.
* The first 1x1 conv of each EdgeConv block acts on concat([x_j - x_i, x_i]).
  That linear map decomposes into two PER-POINT matmuls plus a gather-add:
      (x_j - x_i) @ Wd + x_i @ Wc  ==  (x_j @ Wd) + x_i @ (Wc - Wd)
  which removes the K-fold FLOP blow-up of the reference's (B, 2C, N, K)
  edge tensor for that layer (K=20 -> ~20x fewer MACs on layer 1).
* Remaining per-edge layers run on the (B, N, K, C) tensor; XLA fuses
  BN + LeakyReLU + max-over-K into the matmul epilogue.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gfs3dseg_gws_tpu.models.layers import (
    LEAKY_SLOPE,
    BatchNorm,
    Conv1x1,
    ManualBN,
    MLPStack,
    leaky_relu,
)
from gfs3dseg_gws_tpu.ops.edgeconv import gather_neighbors
from gfs3dseg_gws_tpu.ops.fused_edgeconv import fused_edgeconv_infer
from gfs3dseg_gws_tpu.ops.fused_edgeconv_train import (
    fused_edgeconv_train,
    supported as fused_train_supported,
)
from gfs3dseg_gws_tpu.ops.knn import knn_indices, knn_with_stats


class _ConvBNLayer(nn.Module):
    """Conv1x1 + ManualBN (+ LeakyReLU) with the same parameter paths as the
    generic ConvBN block, exposing the folded eval affine for kernel fusion."""

    in_features: int
    features: int

    def setup(self):
        self.conv = Conv1x1(self.in_features, self.features, name="conv")
        self.bn = ManualBN(self.features, name="bn")

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return leaky_relu(self.bn(self.conv(x), use_running_average=not train))

    def folded(self):
        """(W * bn_scale, bn_shift) of the eval-mode conv+BN composition."""
        s, t = self.bn.affine()
        return self.conv.kernel * s[None, :], t


class EdgeConvBlock(nn.Module):
    """One dynamic EdgeConv: kNN graph -> edge MLP -> max over neighbours.

    The first layer's kernel has shape (2*C_in, widths[0]) with row blocks
    [Wd; Wc] for the (x_j - x_i) and x_i slots — the same parameterisation as
    the reference's Conv2d over the channel concat, so torch checkpoints map
    1:1 onto it. That linear map decomposes into two per-POINT matmuls:
        (x_j - x_i) @ Wd + x_i @ Wc == (x_j @ Wd) + x_i @ (Wc - Wd)
    removing the K-fold FLOP blow-up of the first layer.

    In eval mode on TPU the whole block (kNN + gather + both conv/BN/LeakyReLU
    layers + max) runs as ONE fused Pallas kernel with the BatchNorm affines
    folded in (ops/fused_edgeconv.py); training uses the composable XLA path
    because BN batch statistics need a global reduction.
    """

    widths: Sequence[int]
    k: int = 20
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """x: (B, N, C) -> (B, N, widths[-1])."""
        b, n, c = x.shape
        w0 = self.widths[0]
        kernel = self.param(
            "layer0_kernel",
            nn.initializers.lecun_normal(),
            (2 * c, w0), x.dtype)
        bn1 = ManualBN(w0, name="layer0_bn")
        layers = [
            _ConvBNLayer(self.widths[i - 1], w, name=f"layer{i}")
            for i, w in enumerate(self.widths[1:], start=1)
        ]

        wd, wc = kernel[:c], kernel[c:]
        on_tpu = (self.use_pallas and len(self.widths) == 2
                  and jax.default_backend() == "tpu")
        if on_tpu and not train:
            s1, t1 = bn1.affine()
            a_table = (x @ wd) * s1
            b_table = (x @ (wc - wd)) * s1 + t1
            w2f, bias2 = layers[0].folded()
            return fused_edgeconv_infer(x, a_table, b_table, w2f, bias2,
                                        self.k, neg_slope=LEAKY_SLOPE)

        if (on_tpu and train and not self.is_initializing()
                and fused_train_supported(n, self.k)):
            a_tab = x @ wd
            b_tab = x @ (wc - wd)
            # the kNN kernel also emits the inputs-only neighbour stats
            # (in-degrees + transposed b-scatter) that let the fused op
            # compute the e0 batch stats before its single gather pass
            idx, cnt, scb = knn_with_stats(
                jax.lax.stop_gradient(x), jax.lax.stop_gradient(b_tab),
                self.k, use_pallas=self.use_pallas)
            bn2 = layers[0].bn
            out, mu1, var1, mu2, var2 = fused_edgeconv_train(
                a_tab, b_tab, bn1.scale, bn1.bias,
                layers[0].conv.kernel, bn2.scale, bn2.bias, idx,
                cnt=cnt, scb=scb, neg_slope=LEAKY_SLOPE)
            n_stats = b * n * self.k        # stats reduce over (B, N, K)
            bn1.record_batch_stats(mu1, var1, n_stats)
            bn2.record_batch_stats(mu2, var2, n_stats)
            return out
        idx = knn_indices(jax.lax.stop_gradient(x), self.k,
                          use_pallas=self.use_pallas)        # (B, N, K)
        h_nbr = x @ wd                                       # (B, N, w0)
        h_cen = x @ (wc - wd)                                # (B, N, w0)
        h = gather_neighbors(h_nbr, idx) + h_cen[:, :, None, :]  # (B,N,K,w0)
        h = leaky_relu(bn1(h, use_running_average=not train))
        for layer in layers:
            h = layer(h, train)                              # (B, N, K, w)
        return jnp.max(h, axis=2)                            # (B, N, w_last)


class DGCNN(nn.Module):
    """Stacked EdgeConv blocks + point MLP (reference model/dgcnn.py:83-127).

    Returns (edgeconv_outputs, final_feat): the per-block outputs (each
    (B, N, 64) by default) and the (B, N, mlp_widths[-1]) point feature.
    """

    edgeconv_widths: Sequence[Sequence[int]] = ((64, 64), (64, 64), (64, 64))
    mlp_widths: Sequence[int] = (512, 256)
    k: int = 20
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Tuple[List[jax.Array], jax.Array]:
        outputs = []
        h = x
        for i, widths in enumerate(self.edgeconv_widths):
            h = EdgeConvBlock(widths, k=self.k, use_pallas=self.use_pallas,
                              name=f"edgeconv{i}")(h, train)
            outputs.append(h)
        cat = jnp.concatenate(outputs, axis=-1)              # (B, N, 192)
        out = MLPStack(self.mlp_widths, name="mlp")(cat, train)
        return outputs, out


class BaseLearner(nn.Module):
    """Inner-loop feature head (reference model/dgcnn.py:130-152): 1x1 convs
    WITH bias + BN; ReLU between layers but not after the last."""

    widths: Sequence[int] = (128, 64)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        num = len(self.widths)
        for i, w in enumerate(self.widths):
            x = nn.Dense(w, use_bias=True, name=f"conv{i}")(x)
            x = BatchNorm(use_running_average=not train, name=f"bn{i}")(x)
            if i != num - 1:
                x = nn.relu(x)
        return x
