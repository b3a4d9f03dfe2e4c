"""Fully-supervised segmentors used for backbone pre-training and baselines.

DGCNNSeg mirrors reference pretrain/runs/pre_train.py:22-48 (and the local
copy in get_basis.py:77-106): DGCNN encoder, global-max feature broadcast,
segmenter MLP 256->128->C with Dropout 0.3.

DGCNNSegAtt mirrors reference model/dgcnn.py:155-202 (attention variant).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gfs3dseg_gws_tpu.models.attention import SelfAttention
from gfs3dseg_gws_tpu.models.dgcnn import DGCNN, BaseLearner
from gfs3dseg_gws_tpu.models.layers import BatchNorm, leaky_relu


class Segmenter(nn.Module):
    """Conv(256, no bias)+BN+Leaky -> Conv(128)+BN+Leaky -> Dropout -> Conv(C)."""

    num_classes: int
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Dense(256, use_bias=False, name="conv0")(x)
        x = BatchNorm(use_running_average=not train, name="bn0")(x)
        x = leaky_relu(x)
        x = nn.Dense(128, use_bias=True, name="conv1")(x)
        x = BatchNorm(use_running_average=not train, name="bn1")(x)
        x = leaky_relu(x)
        x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes, use_bias=True, name="conv2")(x)


class DGCNNSeg(nn.Module):
    """Pre-training segmentor: encoder + global-max broadcast + segmenter."""

    num_classes: int
    edgeconv_widths: Sequence[Sequence[int]] = ((64, 64), (64, 64), (64, 64))
    mlp_widths: Sequence[int] = (512, 256)
    k: int = 20
    use_pallas: bool = True
    dropout: float = 0.3  # reference pre_train.py:36 (0 = deterministic)

    def setup(self):
        self.encoder = DGCNN(self.edgeconv_widths, self.mlp_widths, k=self.k,
                             use_pallas=self.use_pallas)
        self.segmenter = Segmenter(self.num_classes, dropout=self.dropout)

    def __call__(self, pc: jax.Array, train: bool = False,
                 return_feat: bool = False):
        """pc: (B, N, C_in) -> logits (B, N, num_classes)."""
        edge_feats, point_feat = self.encoder(pc, train)
        global_feat = jnp.max(point_feat, axis=1, keepdims=True)  # (B,1,256)
        n = pc.shape[1]
        feats = edge_feats + [jnp.broadcast_to(
            global_feat, (pc.shape[0], n, global_feat.shape[-1]))]
        pc_feat = jnp.concatenate(feats, axis=-1)            # (B, N, 448)
        logits = self.segmenter(pc_feat, train)
        if return_feat:
            # EdgeConv1-3 concat — the geometric-word feature space
            return logits, jnp.concatenate(edge_feats[:3], axis=-1)
        return logits


class DGCNNSegAtt(nn.Module):
    """Attention-augmented segmentor (reference model/dgcnn.py:155-202)."""

    num_classes: int
    edgeconv_widths: Sequence[Sequence[int]] = ((64, 64), (64, 64), (64, 64))
    mlp_widths: Sequence[int] = (512, 256)
    base_widths: Sequence[int] = (128, 64)
    output_dim: int = 64
    k: int = 20
    use_pallas: bool = True

    def setup(self):
        self.encoder = DGCNN(self.edgeconv_widths, self.mlp_widths, k=self.k,
                             use_pallas=self.use_pallas)
        self.base_learner = BaseLearner(self.base_widths)
        self.att_learner = SelfAttention(self.output_dim)
        self.segmenter = Segmenter(self.num_classes)

    def __call__(self, pc: jax.Array, train: bool = False,
                 return_feat: bool = False):
        edge_feats, feat_level2 = self.encoder(pc, train)
        feat_level1 = edge_feats[0]
        feat_level3 = self.base_learner(feat_level2, train)
        att_feat = self.att_learner(feat_level2, train)
        pc_feat = jnp.concatenate([feat_level1, att_feat, feat_level3], axis=-1)
        logits = self.segmenter(pc_feat, train)
        if return_feat:
            return logits, feat_level1
        return logits
