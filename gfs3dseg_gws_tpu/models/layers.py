"""Shared building blocks.

A reference `nn.Conv1d(k=1)`/`nn.Conv2d(k=1)` is a per-point linear map, so
here every "conv" is an `nn.Dense` over the trailing channel axis — on TPU
that is exactly one MXU matmul, and XLA fuses the BatchNorm scale/shift and
LeakyReLU into it.

BatchNorm matches torch semantics (momentum 0.1 torch == 0.9 flax, eps 1e-5,
running stats in the `batch_stats` collection, and — unlike flax's
nn.BatchNorm — the running variance is updated with torch's UNBIASED batch
variance, x n/(n-1); normalisation itself uses the biased variance exactly
like torch BatchNorm1d/2d).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

LEAKY_SLOPE = 0.2  # reference uses LeakyReLU(0.2) everywhere


def l2norm(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2-normalise along `axis` with torch F.normalize's eps clamp."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def leaky_relu(x: jax.Array) -> jax.Array:
    return nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)


class BatchNorm(nn.Module):
    """torch-semantics BatchNorm over the trailing channel axis.

    Variable names/shapes match flax.linen.BatchNorm (params scale/bias,
    batch_stats mean/var) so checkpoints are interchangeable. The one
    behavioural difference from flax is torch parity: the running variance
    EMA uses the UNBIASED batch variance (x n/(n-1)) while normalisation
    uses the biased one — exactly torch BatchNorm1d/2d
    (reference model/dgcnn.py:45-80).
    """

    use_running_average: bool | None = None
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array,
                 use_running_average: bool | None = None) -> jax.Array:
        ura = nn.merge_param("use_running_average",
                             self.use_running_average, use_running_average)
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,)))
        if ura:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axes)
            var = jnp.maximum(
                jnp.mean(jnp.square(x), axes) - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = x.size // feat
                m = self.momentum
                ubvar = jax.lax.stop_gradient(var) * (n / max(n - 1, 1))
                ra_mean.value = (m * ra_mean.value
                                 + (1 - m) * jax.lax.stop_gradient(mean))
                ra_var.value = m * ra_var.value + (1 - m) * ubvar
        inv = jax.lax.rsqrt(var + self.epsilon)
        return (x - mean) * (inv * scale) + bias


class ManualBN(nn.Module):
    """BatchNorm with the same math AND variable names (params scale/bias,
    batch_stats mean/var) as flax's BatchNorm, but with its parameters
    declared in setup() so siblings can FOLD the eval-mode affine into
    adjacent matmuls (used by the fused EdgeConv kernel)."""

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones,
                                (self.features,))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,))
        self.ra_mean = self.variable("batch_stats", "mean",
                                     lambda: jnp.zeros((self.features,)))
        self.ra_var = self.variable("batch_stats", "var",
                                    lambda: jnp.ones((self.features,)))

    def __call__(self, x: jax.Array, use_running_average: bool) -> jax.Array:
        if use_running_average:
            mean, var = self.ra_mean.value, self.ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axes)
            mean2 = jnp.mean(jnp.square(x), axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = x.size // self.features
                m = self.momentum
                ubvar = var * (n / max(n - 1, 1))  # torch: unbiased EMA
                self.ra_mean.value = m * self.ra_mean.value + (1 - m) * mean
                self.ra_var.value = m * self.ra_var.value + (1 - m) * ubvar
        inv = jax.lax.rsqrt(var + self.epsilon)
        return (x - mean) * (inv * self.scale) + self.bias

    def affine(self):
        """(scale_eff, shift_eff) of the eval-mode normalisation."""
        s = self.scale * jax.lax.rsqrt(self.ra_var.value + self.epsilon)
        return s, self.bias - self.ra_mean.value * s

    def record_batch_stats(self, mean: jax.Array, var: jax.Array,
                           n: int) -> None:
        """Fold externally-computed batch stats into the running averages —
        the train-mode side effect of __call__ for callers (the fused
        training EdgeConv kernel) that normalise out-of-module. `n` is the
        number of elements reduced per channel (torch's unbiased running-var
        correction n/(n-1) is applied here, matching __call__)."""
        if not self.is_initializing():
            m = self.momentum
            mean = jax.lax.stop_gradient(mean)
            var = jax.lax.stop_gradient(var) * (n / max(n - 1, 1))
            self.ra_mean.value = m * self.ra_mean.value + (1 - m) * mean
            self.ra_var.value = m * self.ra_var.value + (1 - m) * var


class Conv1x1(nn.Module):
    """Dense with setup()-declared params (names match nn.Dense) so the
    kernel is readable without applying the module."""

    in_features: int
    features: int
    use_bias: bool = False

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.in_features, self.features))
        if self.use_bias:
            self.bias = self.param("bias", nn.initializers.zeros,
                                   (self.features,))

    def __call__(self, x: jax.Array) -> jax.Array:
        y = x @ self.kernel
        if self.use_bias:
            y = y + self.bias
        return y


class ConvBN(nn.Module):
    """1x1 conv (Dense) + BatchNorm + optional LeakyReLU.

    Mirrors reference conv1d/conv2d blocks (model/dgcnn.py:45-80).
    """

    features: int
    use_bias: bool = False
    relu: bool = True
    relu_slope: float = LEAKY_SLOPE

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Dense(self.features, use_bias=self.use_bias, name="conv")(x)
        x = BatchNorm(use_running_average=not train, name="bn")(x)
        if self.relu:
            x = nn.leaky_relu(x, negative_slope=self.relu_slope)
        return x


class MLPStack(nn.Module):
    """Stack of ConvBN layers (reference conv1d with multiple widths)."""

    widths: Sequence[int]
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i, w in enumerate(self.widths):
            x = ConvBN(w, use_bias=self.use_bias, name=f"layer{i}")(x, train)
        return x


def cross_entropy(logits: jax.Array, labels: jax.Array,
                  ignore_index: int | None = None) -> jax.Array:
    """Mean CE over points; logits (..., C), labels (...,) int.

    Matches torch nn.CrossEntropyLoss(ignore_index=...) reduction semantics.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    if ignore_index is None:
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        return jnp.mean(nll)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)  # keep the gather in-bounds
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    v = valid.astype(nll.dtype)
    return jnp.sum(nll * v) / jnp.maximum(jnp.sum(v), 1.0)
