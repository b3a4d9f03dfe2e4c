"""GW/CAPL head — the paper's GFS method (reference model/capl.py:21-433).

Generalized Few-Shot segmentation via Geometric Words:
  * DGCNN features + self-attention + base-learner -> 192-d semantic feature.
  * Cosine match of EdgeConv1-3 features against the geometric-word basis,
    sharpened softmax(10*cos) + hard one-hot assignment.
  * Fusion conv -> 128-d point feature; learnable per-class prototypes
    (main_proto) + background prototype; cosine classifier (x10).
  * Training: fake-novel episodes (CAPL eqn.8) + transductive prototype
    refinement (eqn.6); loss = 0.5*CE1 + 0.5*CE2.
  * Evaluation: refined base + registered novel prototypes, logits reweighted
    by geometric-word multi-hot agreement (x eval_weight beta).

TPU-first notes: everything is fixed-shape and jit-compatible. The reference
picks "half of the classes present in the batch" with host-side python RNG
(capl.py:378-389); here the same distribution is produced on-device with a
uniform-noise top-k over the present-class mask, so the whole train step stays
one compiled XLA program.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gfs3dseg_gws_tpu.models.attention import SelfAttention
from gfs3dseg_gws_tpu.models.dgcnn import DGCNN, BaseLearner
from gfs3dseg_gws_tpu.models.layers import BatchNorm, l2norm, leaky_relu, cross_entropy


class GWCAPL(nn.Module):
    """Geometric-words CAPL model.

    Attributes:
      classes: total classes in the dataset (base + novel).
      base_num: number of base classes.
      num_gw: number of geometric words (rows of the basis).
      energy: coding energy threshold (used by pipelines, stored for parity).
      eval_weight: beta logit re-weighting at evaluation.
    """

    classes: int = 13
    base_num: int = 7
    num_gw: int = 150
    main_dim: int = 128
    energy: float = 0.9
    eval_weight: float = 1.0
    cosine_scale: float = 10.0
    edgeconv_widths: Sequence[Sequence[int]] = ((64, 64), (64, 64), (64, 64))
    mlp_widths: Sequence[int] = (512, 256)
    base_widths: Sequence[int] = (128, 64)
    output_dim: int = 64
    attn_dropout: float = 0.1
    k: int = 20
    use_pallas: bool = True

    def setup(self):
        self.encoder = DGCNN(self.edgeconv_widths, self.mlp_widths, k=self.k,
                             use_pallas=self.use_pallas)
        self.base_learner = BaseLearner(self.base_widths)
        self.att_learner = SelfAttention(self.output_dim, self.attn_dropout)
        # fusion of geometric-word code with the semantic feature
        # (reference capl.py:63-65); input order [cosine_feat, semantic_feat]
        self.fusion_conv = nn.Dense(self.main_dim, use_bias=True, name="fusion")
        self.fusion_bn = BatchNorm(name="fusion_bn")
        self.main_proto = self.param(
            "main_proto", nn.initializers.normal(1.0),
            (self.classes, self.main_dim))
        self.bg_proto = self.param(
            "bg_proto", nn.initializers.normal(1.0), (1, self.main_dim))

    # ------------------------------------------------------------------ #
    # feature extraction
    # ------------------------------------------------------------------ #

    def get_features(self, x: jax.Array, gp: jax.Array, train: bool = False
                     ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Reference capl.py:324-362.

        Args:
          x: (B, N, C_in) point clouds.
          gp: (num_gw, 192) geometric-word basis (constant, no grad).
        Returns:
          point_feat (B, N, main_dim), semantic_feat (B, N, 192),
          one_hot_gw (B, N, num_gw).
        """
        edge_feats, feat_level2 = self.encoder(x, train)
        feat_level3 = self.base_learner(feat_level2, train)
        att_feat = self.att_learner(feat_level2, train)
        feat_level1 = edge_feats[0]
        semantic_feat = jnp.concatenate(
            [feat_level1, att_feat, feat_level3], axis=-1)    # (B, N, 192)

        edge_cat = jnp.concatenate(edge_feats, axis=-1)       # (B, N, 192)
        edge_l2 = l2norm(edge_cat, axis=-1)
        gp_l2 = l2norm(jax.lax.stop_gradient(gp), axis=-1)    # (num_gw, 192)
        cos = jnp.einsum("bnd,kd->bnk", edge_l2, gp_l2,
                         preferred_element_type=jnp.float32)  # (B, N, num_gw)
        cosine_feat = jax.nn.softmax(self.cosine_scale * cos, axis=-1)
        assignment = jnp.argmax(cosine_feat, axis=-1)         # (B, N)
        one_hot_gw = jax.nn.one_hot(assignment, self.num_gw, dtype=cos.dtype)

        fused_in = jnp.concatenate([cosine_feat.astype(x.dtype),
                                    semantic_feat], axis=-1)
        point_feat = self.fusion_conv(fused_in)
        point_feat = self.fusion_bn(point_feat,
                                    use_running_average=not train)
        point_feat = leaky_relu(point_feat)                   # (B, N, main_dim)
        return point_feat, semantic_feat, one_hot_gw

    def get_fg_feat(self, x: jax.Array, mask: jax.Array, gp: jax.Array
                    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Masked foreground features of support shots (capl.py:71-88).

        Fixed-shape variant: instead of boolean indexing it returns per-shot
        mask SUM/COUNT so callers average across shots exactly like the
        reference. Batched over shots — the reference registers prototypes
        one bs=1 forward per shot (train.py:266-277); here all S shots of
        all seeds run as ONE compiled step.

        Args:
          x: (S, N, C_in), mask: (S, N) binary.
        Returns:
          (fg_feat_sums (S, main_dim), fg_counts (S,), fg_gw_hists (S, num_gw))
        """
        point_feat, _, gw = self.get_features(x, gp, train=False)
        m = mask.astype(point_feat.dtype)                     # (S, N)
        fg_sums = jnp.einsum("snc,sn->sc", point_feat, m)
        fg_cnts = jnp.sum(m, axis=-1)
        gw_hists = jnp.einsum("snk,sn->sk", gw, m.astype(gw.dtype))
        return fg_sums, fg_cnts, gw_hists

    # ------------------------------------------------------------------ #
    # prototype classifier
    # ------------------------------------------------------------------ #

    def get_pred(self, x: jax.Array, proto: jax.Array,
                 use_bg_proto: bool = False) -> jax.Array:
        """Cosine-similarity logits x10 (reference capl.py:290-322).

        x: (B, N, C); proto: (cls, C) or (B, cls, C).
        Returns (B, N, cls[+1 with bg]).
        """
        if proto.ndim == 2:
            if use_bg_proto:
                proto = jnp.concatenate([self.bg_proto, proto], axis=0)
            xn = l2norm(x, axis=-1)
            pn = l2norm(proto, axis=-1)
            pred = jnp.einsum("bnc,kc->bnk", xn, pn,
                              preferred_element_type=jnp.float32)
        else:
            if use_bg_proto:
                bg = jnp.broadcast_to(self.bg_proto[None],
                                      (proto.shape[0], 1, proto.shape[-1]))
                proto = jnp.concatenate([bg, proto], axis=1)
            xn = l2norm(x, axis=-1)
            pn = l2norm(proto, axis=-1)
            pred = jnp.einsum("bnc,bkc->bnk", xn, pn,
                              preferred_element_type=jnp.float32)
        return pred.astype(x.dtype) * self.cosine_scale

    def post_refine_proto(self, proto: jax.Array, point_feat: jax.Array,
                          use_bg_proto: bool = False) -> jax.Array:
        """Transductive prototype refinement, eqn.6 (capl.py:245-287).

        The per-class softmax runs over POINTS (not classes) — each class
        aggregates its own soft point assignment into a predicted prototype,
        which is blended with the learned prototype by their (clamped) cosine
        agreement.

        proto: (cls, C); point_feat: (B, N, C). Returns (B, cls, C).
        """
        pred = self.get_pred(point_feat, proto, use_bg_proto)  # (B, N, cls*)
        pred = jax.nn.softmax(pred, axis=1)                    # over points
        pred_proto = jnp.einsum("bnk,bnc->bkc", pred, point_feat,
                                preferred_element_type=jnp.float32
                                ).astype(point_feat.dtype)
        if use_bg_proto:
            pred_proto = pred_proto[:, 1:, :]                  # drop bg row
        pred_proto_n = l2norm(pred_proto, axis=-1)
        proto_n = l2norm(proto, axis=-1)[None]                 # (1, cls, C)
        w = jnp.sum(pred_proto_n * proto_n, axis=-1, keepdims=True)
        w = w * (w > 0).astype(w.dtype)                        # clamp at 0
        return w * pred_proto + (1.0 - w) * proto[None]

    # ------------------------------------------------------------------ #
    # fake-novel episode construction (training only)
    # ------------------------------------------------------------------ #

    def generate_fake_proto(self, feats: jax.Array, y: jax.Array,
                            main_proto: jax.Array,
                            rng: Optional[jax.Array] = None,
                            fake_row: Optional[jax.Array] = None
                            ) -> Tuple[jax.Array, jax.Array]:
        """CAPL eqn.8 (reference capl.py:364-411).

        Half of the classes present in `y` (excluding background 0) become
        "fake novel": their prototype rows are replaced by the masked average
        of the L2-normalised features; the rest keep the (normalised) learned
        prototype.

        Args:
          feats: (B2, N, C) second-half-of-batch point features.
          y: (B2, N) labels in {0..base_num} (0 = background).
          main_proto: (cls, C).
          rng: PRNG key for the fake-class draw (ignored when `fake_row`
            is given).
          fake_row: optional explicit (cls,) {0,1} fake-class mask. The
            reference draws its set with host python `random.sample`
            (capl.py:381-385); this override lets the cross-framework
            oracle tests pin both frameworks to the same draw.
        Returns:
          (new_proto (cls, C) — L2-normalised rows except fake rows,
           fake_row_mask (cls,) in {0.,1.} — rows replaced by feature means)
        """
        n_cls = main_proto.shape[0]
        onehot = jax.nn.one_hot(y, n_cls + 1, dtype=feats.dtype)  # (B2,N,cls+1)
        counts = jnp.sum(onehot, axis=(0, 1))                  # (cls+1,)
        present = counts[1:] > 0                               # (cls,) excl bg

        if fake_row is None:
            if rng is None:
                raise ValueError(
                    "generate_fake_proto: rng is required when fake_row "
                    "is not given")
            n_present = jnp.sum(present.astype(jnp.int32))
            novel_num = n_present // 2
            # uniform subset of size novel_num among present classes
            noise = jax.random.uniform(rng, (n_cls,))
            score = jnp.where(present, noise, -1.0)
            rank = jnp.argsort(jnp.argsort(-score))            # descending rank
            fake_row = (present & (rank < novel_num)).astype(feats.dtype)
        else:
            fake_row = fake_row.astype(feats.dtype)            # (cls,)

        feats_n = l2norm(feats, axis=-1)
        class_sums = jnp.einsum("bnk,bnc->kc", onehot, feats_n,
                                preferred_element_type=jnp.float32
                                ).astype(feats.dtype)          # (cls+1, C)
        class_means = class_sums[1:] / (counts[1:, None] + 1e-12)  # (cls, C)

        proto_n = l2norm(main_proto, axis=-1)
        new_proto = (1.0 - fake_row[:, None]) * proto_n \
            + fake_row[:, None] * class_means
        return new_proto, fake_row

    # ------------------------------------------------------------------ #
    # geometric-word re-weighting (evaluation)
    # ------------------------------------------------------------------ #

    def gp_weight(self, gp_coding: jax.Array, gw_onehot: jax.Array,
                  th: float, y: Optional[jax.Array] = None,
                  base_num: Optional[int] = None,
                  mask: Optional[jax.Array] = None
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Reference capl.py:92-142 (test branch).

        gp_coding: (cls, num_gw) multi-hot class codings.
        gw_onehot: (B, N, num_gw) hard word assignment.
        mask: optional (B, N) validity mask — padded rows of the final short
        batch are excluded from the gp_acc/gp_novel_acc means (the reference
        never pads, so its per-batch means only ever see real points).
        Returns (weight (B, N, cls), gp_acc, gp_novel_acc).
        """
        score = jnp.einsum("kw,bnw->bnk", gp_coding, gw_onehot,
                           preferred_element_type=jnp.float32)  # in {0,1}
        weight = jnp.where(score == 1.0, jnp.asarray(th, score.dtype),
                           jnp.ones_like(score))
        if y is not None:
            n_cls = gp_coding.shape[0]
            gt_onehot = jax.nn.one_hot(y, n_cls, dtype=score.dtype)
            per_point = jnp.sum(gt_onehot * score, axis=-1)     # (B, N)
            if mask is None:
                w = jnp.ones_like(per_point)
            else:
                w = mask.astype(score.dtype)
            acc = jnp.sum(per_point * w) / jnp.maximum(jnp.sum(w), 1.0)
            if base_num is None:
                base_num = self.base_num
            novel_mask = (y > base_num - 1).astype(score.dtype) * w
            novel_cnt = jnp.sum(novel_mask)
            novel_acc = jnp.where(
                novel_cnt > 0,
                jnp.sum(per_point * novel_mask) / jnp.maximum(novel_cnt, 1.0),
                0.0)
        else:
            acc = jnp.float32(0.0)
            novel_acc = jnp.float32(0.0)
        return weight, acc, novel_acc

    # ------------------------------------------------------------------ #
    # top-level train / eval passes
    # ------------------------------------------------------------------ #

    def __call__(self, x: jax.Array, y: jax.Array, gp: jax.Array,
                 train: bool = True,
                 fake_row: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, jax.Array]:
        """Base-stage training pass (reference capl.py:194-242).

        `fake_row` optionally pins the fake-novel class draw (see
        generate_fake_proto) — used by the reference-oracle parity tests.
        Returns (pred_labels (B, N), ce_loss scalar).
        """
        point_feat, _, _ = self.get_features(x, gp, train=train)
        fake_num = x.shape[0] // 2
        rng = (self.make_rng("fake") if train and fake_row is None
               else jax.random.PRNGKey(0))

        ori_proto, _ = self.generate_fake_proto(
            point_feat[fake_num:], y[fake_num:], self.main_proto, rng,
            fake_row=fake_row)

        x_pre_1 = self.get_pred(point_feat, ori_proto, use_bg_proto=True)
        loss_ce_1 = cross_entropy(x_pre_1, y, ignore_index=255)

        refine_proto = self.post_refine_proto(self.main_proto, point_feat,
                                              use_bg_proto=True)
        base = self.base_num
        post = jnp.concatenate([
            refine_proto[:, :base] + ori_proto[None, :base],
            jnp.broadcast_to(ori_proto[None, base:],
                             (refine_proto.shape[0],
                              refine_proto.shape[1] - base,
                              refine_proto.shape[2])),
        ], axis=1)
        x_pre_2 = self.get_pred(point_feat, post, use_bg_proto=True)
        loss_ce_2 = cross_entropy(x_pre_2, y, ignore_index=255)

        ce_loss = 0.5 * loss_ce_2 + 0.5 * loss_ce_1
        pred = jnp.argmax(x_pre_2, axis=-1)
        return pred, ce_loss

    def evaluate_multi(self, x: jax.Array, gp: jax.Array,
                       gened_protos: jax.Array, base_coding: jax.Array,
                       novel_codings: jax.Array,
                       y: Optional[jax.Array] = None,
                       valid: Optional[jax.Array] = None) -> Tuple[jax.Array,
                                                                   jax.Array,
                                                                   jax.Array]:
        """Evaluate S registered prototype sets in ONE feature sweep.

        The reference's 5-support-seed evaluation (train.py:465-489) reruns
        the full network per seed; the encoder does not depend on the seed,
        so here features are computed once and the S heads (prototype merge,
        cosine logits, GW re-weighting) are vmapped over the seed axis —
        an ~S-fold reduction of evaluation wall clock.

        gened_protos: (S, cls, main_dim); novel_codings: (S, n_novel, num_gw).
        Returns (logits (S, B, N, cls), gp_acc (S,), gp_novel_acc (S,)).
        """
        point_feat, _, gw_onehot = self.get_features(x, gp, train=False)
        base = self.base_num
        refine = self.post_refine_proto(self.main_proto, point_feat,
                                        use_bg_proto=False)   # (B, cls, C)
        mask = None
        if valid is not None:
            mask = jnp.broadcast_to(
                (jnp.arange(x.shape[0]) < valid)[:, None], x.shape[:2])

        def head(gened_proto, novel_coding):
            merged = jnp.concatenate([
                refine[:, :base] + gened_proto[None, :base],
                jnp.broadcast_to(gened_proto[None, base:],
                                 (refine.shape[0], refine.shape[1] - base,
                                  refine.shape[2])),
            ], axis=1)
            x_pre = self.get_pred(point_feat, merged)
            gp_coding = jnp.concatenate([base_coding, novel_coding], axis=0)
            weight, gp_acc, gp_nacc = self.gp_weight(
                gp_coding, gw_onehot, th=self.eval_weight, y=y, mask=mask)
            return x_pre * weight, gp_acc, gp_nacc

        return jax.vmap(head)(gened_protos, novel_codings)

    def evaluate(self, x: jax.Array, gp: jax.Array, gened_proto: jax.Array,
                 base_coding: jax.Array, novel_coding: jax.Array,
                 y: Optional[jax.Array] = None,
                 valid: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """GFS evaluation pass (reference capl.py:170-192).

        gened_proto: (cls, main_dim) registered prototypes (L2-normalised).
        base_coding/novel_coding: (n_base, num_gw)/(n_novel, num_gw).
        Returns (logits (B, N, cls), gp_acc, gp_novel_acc).
        """
        point_feat, _, gw_onehot = self.get_features(x, gp, train=False)
        base = self.base_num

        refine = self.post_refine_proto(self.main_proto, point_feat,
                                        use_bg_proto=False)   # (B, cls, C)
        merged = jnp.concatenate([
            refine[:, :base] + gened_proto[None, :base],
            jnp.broadcast_to(gened_proto[None, base:],
                             (refine.shape[0], refine.shape[1] - base,
                              refine.shape[2])),
        ], axis=1)
        x_pre = self.get_pred(point_feat, merged)             # (B, N, cls)

        mask = None
        if valid is not None:
            mask = jnp.broadcast_to(
                (jnp.arange(x.shape[0]) < valid)[:, None], x.shape[:2])
        gp_coding = jnp.concatenate([base_coding, novel_coding], axis=0)
        weight, gp_acc, gp_novel_acc = self.gp_weight(
            gp_coding, gw_onehot, th=self.eval_weight, y=y, mask=mask)
        return x_pre * weight, gp_acc, gp_novel_acc
