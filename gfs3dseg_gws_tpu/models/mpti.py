"""MPTI baseline: multi-prototype transductive inference
(reference pretrain/models/mpti.py:48-297).

Per class: 100 sub-prototypes from FPS seeds + nearest-seed pooling of the
masked point features; a k-NN-sparsified gaussian affinity graph over
prototypes + query points; closed-form label propagation (I - alpha*S)^-1 Y.

TPU-first notes: the reference leans on faiss (exact kNN) and torch_cluster
FPS and materialises ragged per-class point sets. Here everything is fixed
shape: masked FPS (ops/fps.py) selects seeds among valid points only, every
class always yields exactly `n_subprototypes` prototypes (with duplicate
seeds when a class has fewer masked points than prototypes — the reference
instead shrinks the prototype set), the affinity top-k and the linear SOLVE
(ops/linalg.py) run on device.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gfs3dseg_gws_tpu.models.layers import cross_entropy
from gfs3dseg_gws_tpu.models.protonet import FewShotEncoder
from gfs3dseg_gws_tpu.ops.fps import farthest_point_sampling
from gfs3dseg_gws_tpu.ops.knn import pairwise_sq_dists
from gfs3dseg_gws_tpu.ops.linalg import label_propagate, local_constrained_affinity


def multi_prototypes(feat: jax.Array, valid: jax.Array, k: int
                     ) -> jax.Array:
    """k sub-prototypes of the masked rows of feat (M, D).

    FPS seeds over valid rows, then mean-pool each seed's nearest valid rows
    (reference mpti.py:139-172). Empty clusters keep their seed feature.
    Seed indices are SORTED like the reference's `fps(...).unique()`
    (torch.unique sorts), so prototype rows line up with the reference's
    when no duplicate seeds occur; downstream is row-order invariant
    anyway (per-class constant labels).
    """
    seeds_idx = jnp.sort(farthest_point_sampling(feat, k, valid_mask=valid > 0))
    seeds = feat[seeds_idx]                                  # (k, D)
    d = pairwise_sq_dists(feat[None], seeds[None])[0]        # (M, k)
    assign = jnp.argmin(d, axis=-1)                          # (M,)
    onehot = jax.nn.one_hot(assign, k, dtype=feat.dtype) * valid[:, None]
    sums = jnp.einsum("mk,md->kd", onehot, feat)
    counts = jnp.sum(onehot, axis=0)                         # (k,)
    means = sums / jnp.maximum(counts, 1.0)[:, None]
    return jnp.where(counts[:, None] > 0, means, seeds)


class MPTI(nn.Module):
    n_way: int = 2
    k_shot: int = 5
    n_subprototypes: int = 100
    k_connect: int = 200
    sigma: float = 1.0
    dist_method: str = "gaussian"
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
        """Shapes as ProtoNet. Returns (query_pred (n_q, N, n_way+1), loss)."""
        n_way, k_shot, n_pts, cin = support_x.shape
        n_classes = self.n_way + 1
        kp = self.n_subprototypes

        s_feat = self.feat(support_x.reshape(n_way * k_shot, n_pts, cin),
                           train)
        dim = s_feat.shape[-1]
        s_feat = s_feat.reshape(n_way, k_shot * n_pts, dim)
        q_feat = self.feat(query_x, train).reshape(-1, dim)  # (n_q*N, D)

        fg_mask = support_y.reshape(n_way, k_shot * n_pts).astype(s_feat.dtype)
        protos, labels = [], []
        # foreground prototypes per way
        for i in range(n_way):
            p = multi_prototypes(s_feat[i], fg_mask[i], kp)
            protos.append(p)
            lab = jnp.zeros((kp, n_classes)).at[:, i + 1].set(1.0)
            labels.append(lab)
        # background prototypes over all ways/shots. The reference SKIPS
        # them entirely when the support set has no background points
        # (mpti.py:219-228 returns None); static shapes keep the rows but
        # neutralise them: labels zeroed (class 0 never propagates) and
        # features shifted to a far sentinel so their gaussian affinity to
        # every real node vanishes (the shift is translation-invariant
        # among the sentinels themselves, so no degenerate degrees).
        bg_feat = s_feat.reshape(n_way * k_shot * n_pts, dim)
        bg_mask = 1.0 - fg_mask.reshape(-1)
        bg_valid = (jnp.sum(bg_mask) > 0).astype(s_feat.dtype)
        bg_protos = multi_prototypes(bg_feat, bg_mask, kp)
        protos.insert(0, bg_protos + (1.0 - bg_valid) * 1e6)
        labels.insert(0,
                      jnp.zeros((kp, n_classes)).at[:, 0].set(bg_valid))

        prototypes = jnp.concatenate(protos, axis=0)         # (P, D)
        proto_labels = jnp.concatenate(labels, axis=0)       # (P, n_classes)
        num_p = prototypes.shape[0]

        node_feat = jnp.concatenate([prototypes, q_feat], axis=0)
        y0 = jnp.concatenate(
            [proto_labels,
             jnp.zeros((q_feat.shape[0], n_classes), proto_labels.dtype)],
            axis=0)
        a = local_constrained_affinity(node_feat, self.k_connect, self.sigma,
                                       method=self.dist_method
                                       if self.dist_method in
                                       ("gaussian", "cosine") else "gaussian")
        z = label_propagate(a, y0)                           # (M, n_classes)
        query_pred = z[num_p:].reshape(query_y.shape[0], n_pts, n_classes)
        loss = cross_entropy(query_pred, query_y)
        return query_pred, loss
