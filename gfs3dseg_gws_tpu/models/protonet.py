"""ProtoNet few-shot baseline (reference pretrain/models/protonet.py:38-163).

N-way K-shot masked-average prototypes with cosine (x10) or squared-euclidean
point-to-prototype similarity, trained episodically with CE on the query set.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gfs3dseg_gws_tpu.models.attention import SelfAttention
from gfs3dseg_gws_tpu.models.dgcnn import DGCNN, BaseLearner
from gfs3dseg_gws_tpu.models.layers import cross_entropy, l2norm


class FewShotEncoder(nn.Module):
    """Shared encoder of the few-shot baselines: DGCNN + base-learner +
    attention (or linear mapper); feature = concat(edgeconv1, att, base)."""

    edgeconv_widths: Sequence[Sequence[int]] = ((64, 64), (64, 64), (64, 64))
    mlp_widths: Sequence[int] = (512, 256)
    base_widths: Sequence[int] = (128, 64)
    output_dim: int = 64
    k: int = 20
    use_attention: bool = True
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        edge_feats, feat2 = DGCNN(self.edgeconv_widths, self.mlp_widths,
                                  k=self.k, use_pallas=self.use_pallas,
                                  name="encoder")(x, train)
        feat3 = BaseLearner(self.base_widths, name="base_learner")(feat2,
                                                                   train)
        if self.use_attention:
            mapped = SelfAttention(self.output_dim,
                                   name="att_learner")(feat2, train)
        else:
            mapped = nn.Dense(self.output_dim, use_bias=False,
                              name="linear_mapper")(feat2)
        return jnp.concatenate([edge_feats[0], mapped, feat3], axis=-1)


class ProtoNet(nn.Module):
    n_way: int = 2
    k_shot: int = 5
    dist_method: str = "cosine"
    edgeconv_widths: Sequence[Sequence[int]] = ((64, 64), (64, 64), (64, 64))
    mlp_widths: Sequence[int] = (512, 256)
    base_widths: Sequence[int] = (128, 64)
    output_dim: int = 64
    k: int = 20
    use_attention: bool = True
    use_pallas: bool = True

    def setup(self):
        self.feat = FewShotEncoder(
            self.edgeconv_widths, self.mlp_widths, self.base_widths,
            self.output_dim, self.k, self.use_attention, self.use_pallas)

    def get_features(self, x: jax.Array, train: bool = False) -> jax.Array:
        return self.feat(x, train)

    def __call__(self, support_x, support_y, query_x, query_y,
                 train: bool = False) -> Tuple[jax.Array, jax.Array]:
        """
        support_x: (n_way, k_shot, N, C); support_y: (n_way, k_shot, N) binary
        query_x: (n_q, N, C); query_y: (n_q, N) in {0..n_way}
        Returns (query_pred (n_q, N, n_way+1), loss).
        """
        n_way, k_shot, n_pts, cin = support_x.shape
        s_feat = self.feat(support_x.reshape(n_way * k_shot, n_pts, cin),
                           train)
        s_feat = s_feat.reshape(n_way, k_shot, n_pts, -1)
        q_feat = self.feat(query_x, train)                 # (n_q, N, D)

        fg = support_y[..., None].astype(s_feat.dtype)     # (w, s, N, 1)
        bg = 1.0 - fg
        # masked average per way/shot then prototype per way
        fg_feat = jnp.sum(s_feat * fg, axis=2) / (jnp.sum(fg, axis=2) + 1e-5)
        bg_feat = jnp.sum(s_feat * bg, axis=2) / (jnp.sum(bg, axis=2) + 1e-5)
        fg_protos = jnp.sum(fg_feat, axis=1) / k_shot      # (n_way, D)
        bg_proto = jnp.sum(bg_feat, axis=(0, 1)) / (n_way * k_shot)  # (D,)
        protos = jnp.concatenate([bg_proto[None], fg_protos], axis=0)

        if self.dist_method == "cosine":
            sim = 10.0 * jnp.einsum("qnd,pd->qnp", l2norm(q_feat, -1),
                                    l2norm(protos, -1))
        elif self.dist_method == "euclidean":
            diff = q_feat[:, :, None, :] - protos[None, None, :, :]
            sim = -jnp.sum(diff * diff, axis=-1)
        else:
            raise NotImplementedError(self.dist_method)

        loss = cross_entropy(sim, query_y)
        return sim, loss
