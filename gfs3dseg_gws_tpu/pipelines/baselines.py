"""Legacy few-shot baselines: ProtoNet / MPTI training + eval, FineTune.

TPU re-design of reference pretrain/runs/{proto_train,mpti_train,eval,
fine_tune}.py: one jitted episode step (fixed episode shapes mean a single
compilation), encoder param group at lr 1e-4 with heads at args.lr
(reference proto_learner.py:24-32), StepLR stepped per ITERATION, and the
classic few-shot metric accumulated as on-device confusion matrices.

Note: reference `--phase mptitrain` crashes on an unresolvable `from gfs
import load_base_protoes` import (mpti_train.py:15) — here MPTI training is
functional; the GFS-style MPTI evaluation (mpti_learner.py:107-245) is
implemented as `mpti_test_gfs`.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gfs3dseg_gws_tpu.data.episodes import EpisodeDataset, StaticEpisodeBank
from gfs3dseg_gws_tpu.models.mpti import MPTI
from gfs3dseg_gws_tpu.models.protonet import ProtoNet
from gfs3dseg_gws_tpu.ops.metrics import (
    confusion_matrix,
    fewshot_accumulate,
    fewshot_miou,
)
from gfs3dseg_gws_tpu.parallel.optim import step_lr
from gfs3dseg_gws_tpu.parallel.steps import (jit_init, unpack_labels,
                                             unpack_points)
from gfs3dseg_gws_tpu.utils.checkpoint import (
    load_checkpoint,
    restore_into,
    save_checkpoint,
)
from gfs3dseg_gws_tpu.utils.logging import init_logger


@dataclass(frozen=True)
class FewShotConfig:
    """Mirrors pretrain/main.py:36-91 defaults."""

    n_way: int = 2
    k_shot: int = 1
    n_queries: int = 1
    n_iters: int = 30_000
    lr: float = 0.001
    step_size: int = 5000
    gamma: float = 0.5
    eval_interval: int = 1500
    n_episode_test: int = 100
    dist_method: str = "euclidean"
    n_subprototypes: int = 100
    k_connect: int = 200
    sigma: float = 1.0
    use_attention: bool = True
    log_dir: str = "log_fewshot"
    seed: int = 321
    h2d: str = "auto"   # episode transfer: packed u8 buffers on TPU
                        # (one support + one query put instead of four)


def _build_model(kind: str, model_cfg, fs_cfg: FewShotConfig):
    kw = dict(n_way=fs_cfg.n_way, k_shot=fs_cfg.k_shot,
              edgeconv_widths=model_cfg.edgeconv_widths,
              mlp_widths=model_cfg.dgcnn_mlp_widths,
              base_widths=model_cfg.base_widths,
              output_dim=model_cfg.output_dim, k=model_cfg.dgcnn_k,
              use_attention=fs_cfg.use_attention,
              use_pallas=model_cfg.use_pallas)
    if kind == "proto":
        return ProtoNet(dist_method=fs_cfg.dist_method, **kw)
    if kind == "mpti":
        return MPTI(n_subprototypes=fs_cfg.n_subprototypes,
                    k_connect=fs_cfg.k_connect, sigma=fs_cfg.sigma, **kw)
    raise ValueError(kind)


def _make_optimizer(fs_cfg: FewShotConfig) -> optax.GradientTransformation:
    """Encoder at 1e-4, heads at lr; StepLR per iteration."""

    def _adam(base):
        return optax.adam(step_lr(base, fs_cfg.step_size, fs_cfg.gamma,
                                  steps_per_epoch=1))

    def label_fn(params):
        def top(path, _):
            keys = [getattr(p, "key", None) for p in path[:2]]
            return "encoder" if "encoder" in keys else "rest"

        return jax.tree_util.tree_map_with_path(top, params)

    return optax.multi_transform({"encoder": _adam(1e-4),
                                  "rest": _adam(fs_cfg.lr)}, label_fn)


class FewShotLearner:
    """Jitted episodic train/test steps for ProtoNet/MPTI."""

    def __init__(self, kind: str, model_cfg, data_cfg, fs_cfg: FewShotConfig,
                 pretrain_checkpoint_path: str = "",
                 model_checkpoint_path: str = ""):
        self.model = _build_model(kind, model_cfg, fs_cfg)
        self.fs_cfg = fs_cfg
        from gfs3dseg_gws_tpu.parallel.mesh import make_batch_putter
        from gfs3dseg_gws_tpu.pipelines.gfs import _h2d_mode
        self._put_pair = make_batch_putter(
            None, _h2d_mode(getattr(fs_cfg, "h2d", "auto")) == "packed")
        rng = jax.random.PRNGKey(fs_cfg.seed)
        n, cin = data_cfg.pc_npts, len(data_cfg.pc_attribs)
        sx = jnp.zeros((fs_cfg.n_way, fs_cfg.k_shot, n, cin))
        sy = jnp.zeros((fs_cfg.n_way, fs_cfg.k_shot, n), jnp.int32)
        qx = jnp.zeros((fs_cfg.n_way * fs_cfg.n_queries, n, cin))
        qy = jnp.zeros((fs_cfg.n_way * fs_cfg.n_queries, n), jnp.int32)
        variables = jit_init(self.model, {"params": rng, "dropout": rng},
                             sx, sy, qx, qy, train=True)
        self.params = variables["params"]
        self.batch_stats = variables["batch_stats"]

        if model_checkpoint_path:
            if model_checkpoint_path.endswith(".tar") or os.path.exists(
                    os.path.join(model_checkpoint_path, "checkpoint.tar")):
                # the reference's episodic-baseline checkpoint format
                # (pretrain/runs/proto_train.py:72-78), given as the dir
                # (like pretrain/utils/checkpoint_util.py:26) or the file
                from gfs3dseg_gws_tpu.utils.checkpoint import (
                    _flatten, load_torch_fewshot_checkpoint)

                t_params, t_stats, _ = load_torch_fewshot_checkpoint(
                    model_checkpoint_path)
                self.params = restore_into(self.params, _flatten(t_params),
                                           strict=False)
                self.batch_stats = restore_into(
                    self.batch_stats, _flatten(t_stats), strict=False)
            else:
                flat, _ = load_checkpoint(model_checkpoint_path)
                self.params = restore_into(
                    self.params,
                    {k[len("params/"):]: v for k, v in flat.items()
                     if k.startswith("params/")})
                self.batch_stats = restore_into(
                    self.batch_stats,
                    {k[len("batch_stats/"):]: v for k, v in flat.items()
                     if k.startswith("batch_stats/")})
        elif pretrain_checkpoint_path:
            self._load_encoder(pretrain_checkpoint_path)

        self.tx = _make_optimizer(fs_cfg)
        self.opt_state = self.tx.init(self.params)
        self.step_count = 0

        model = self.model
        tx = self.tx

        @jax.jit
        def train_step(params, batch_stats, opt_state, sx, sy, qx, qy, rng):
            sx, sy = unpack_points(sx), unpack_labels(sy)
            qx, qy = unpack_points(qx), unpack_labels(qy)

            def loss_fn(p):
                (logits, loss), upd = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    sx, sy, qx, qy, True, rngs={"dropout": rng},
                    mutable=["batch_stats"])
                return loss, (logits, upd["batch_stats"])

            (loss, (logits, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            pred = jnp.argmax(logits, axis=-1)
            acc = jnp.mean((pred == qy).astype(jnp.float32))
            return new_params, new_bs, new_opt, loss, acc

        @jax.jit
        def test_step(params, batch_stats, sx, sy, qx, qy):
            sx, sy = unpack_points(sx), unpack_labels(sy)
            qx, qy = unpack_points(qx), unpack_labels(qy)
            logits, loss = model.apply(
                {"params": params, "batch_stats": batch_stats},
                sx, sy, qx, qy, False)
            pred = jnp.argmax(logits, axis=-1)
            cm = confusion_matrix(pred, qy, sy.shape[0] + 1)
            acc = jnp.mean((pred == qy).astype(jnp.float32))
            return pred, cm, loss, acc

        self._train_step = train_step
        self._test_step = test_step

    def _load_encoder(self, path: str):
        from gfs3dseg_gws_tpu.pipelines.gfs import _load_encoder_any, _flat

        enc_p, enc_s = _load_encoder_any(path)
        feat_p = dict(self.params["feat"])
        feat_p["encoder"] = restore_into(feat_p["encoder"], _flat(enc_p),
                                         strict=False)
        self.params = {**self.params, "feat": feat_p}
        feat_s = dict(self.batch_stats["feat"])
        feat_s["encoder"] = restore_into(feat_s["encoder"], _flat(enc_s),
                                         strict=False)
        self.batch_stats = {**self.batch_stats, "feat": feat_s}

    def _episode_args(self, episode):
        """(sx, sy, qx, qy) transfer via the shared transfer policy
        (parallel.mesh.make_batch_putter): packed mode ships ONE u8 buffer
        for support and one for query (labels in byte 9, each buffer passed
        as both the points and labels argument) — 2 H2D transfers per
        episode instead of 4, each transfer through the axon tunnel costing
        ~60 ms fixed latency; non-9-feature attribs / out-of-u8 labels fall
        back to exact dense transfers inside the putter."""
        sx, sy, qx, qy = episode[:4]
        return (*self._put_pair(np.asarray(sx), np.asarray(sy, np.int32)),
                *self._put_pair(np.asarray(qx), np.asarray(qy, np.int32)))

    def train_async(self, episode, rng):
        """One episodic update; returns DEVICE scalars (loss, acc) so the
        caller can defer the host sync off the dispatch critical path."""
        (self.params, self.batch_stats, self.opt_state, loss,
         acc) = self._train_step(self.params, self.batch_stats,
                                 self.opt_state, *self._episode_args(episode),
                                 rng)
        self.step_count += 1
        return loss, acc

    def train(self, episode, rng):
        loss, acc = self.train_async(episode, rng)
        return float(loss), float(acc)

    def test(self, episode):
        pred, cm, loss, acc = self._test_step(
            self.params, self.batch_stats, *self._episode_args(episode))
        return np.asarray(pred), np.asarray(cm), float(loss), float(acc)

    def save(self, path: str, meta: Optional[Dict] = None):
        save_checkpoint(path, {"params": jax.device_get(self.params),
                               "batch_stats": jax.device_get(
                                   self.batch_stats)}, meta)


def test_few_shot(bank: StaticEpisodeBank, learner: FewShotLearner, logger,
                  test_classes) -> tuple:
    """Reference pretrain/runs/eval.py:175-202."""
    total_loss = 0.0
    num_global = len(test_classes) + 1
    cm_global = np.zeros((num_global, num_global), np.float64)
    for i in range(len(bank)):
        episode = bank[i]
        sampled_classes = episode[4]
        pred, cm, loss, _ = learner.test(episode)
        total_loss += loss
        fewshot_accumulate(cm_global, cm, sampled_classes, test_classes)
        if (i + 1) % 50 == 0:
            logger.cprint(f"[Eval] Iter: {i + 1} | Loss: {loss:.4f}")
    mean_iou, iou = fewshot_miou(cm_global)
    for c, v in enumerate(iou):
        logger.cprint(f"----- [class {c}]  IoU: {v:f} -----")
    return total_loss / max(len(bank), 1), mean_iou


def episodic_train(kind: str, model_cfg, data_cfg, fs_cfg: FewShotConfig,
                   pretrain_checkpoint_path: str = "",
                   model_checkpoint_path: str = "",
                   logger=None, max_iters: Optional[int] = None,
                   bank_episodes: Optional[int] = None) -> Dict:
    """prototrain / mptitrain (reference proto_train.py:17-80)."""
    logger = logger or init_logger(fs_cfg.log_dir, phase=f"{kind}train")
    learner = FewShotLearner(kind, model_cfg, data_cfg, fs_cfg,
                             pretrain_checkpoint_path, model_checkpoint_path)

    train_ds = EpisodeDataset(
        data_cfg.data_path, data_cfg.dataset, cvfold=data_cfg.cvfold,
        num_episode=fs_cfg.n_iters, n_way=fs_cfg.n_way, k_shot=fs_cfg.k_shot,
        n_queries=fs_cfg.n_queries, mode="train",
        num_point=data_cfg.pc_npts, pc_attribs=data_cfg.pc_attribs,
        pc_augm=data_cfg.pc_augm, pc_augm_config=data_cfg.augment_config)
    bank = StaticEpisodeBank(
        data_cfg.data_path, data_cfg.dataset, cvfold=data_cfg.cvfold,
        num_episode_per_comb=bank_episodes or fs_cfg.n_episode_test,
        n_way=fs_cfg.n_way, k_shot=fs_cfg.k_shot, n_queries=fs_cfg.n_queries,
        num_point=data_cfg.pc_npts, pc_attribs=data_cfg.pc_attribs,
        mode="valid")
    valid_classes = sorted(bank.classes.tolist())

    best_iou = -1.0
    history = []      # (iteration, valid mean IoU) — the trajectory the
                      # cross-framework ProtoNet oracle asserts on
    n_iters = min(fs_cfg.n_iters, max_iters or fs_cfg.n_iters)
    rng0 = np.random.default_rng(fs_cfg.seed)
    # defer the per-episode loss sync ~16 dispatches (float() would put a
    # tunnel round-trip on every episode's critical path; see gfs.validate)
    pending = []
    for it in range(n_iters):
        episode = train_ds.__getitem__(it, rng=np.random.default_rng(
            (fs_cfg.seed, it)))
        loss, acc = learner.train_async(episode, jax.random.PRNGKey(it))
        pending.append((loss, acc))
        if (it + 1) % 50 == 0 or it == 0:
            pending = pending[-1:]
            loss, acc = float(pending[0][0]), float(pending[0][1])
            logger.cprint(f"=====[Train] Iter: {it} | Loss: {loss:.4f} | "
                          f"Accuracy: {acc:f} =====")
        while len(pending) > 16:
            l, a = pending.pop(0)
            float(l), float(a)
        if (it + 1) % fs_cfg.eval_interval == 0 or it + 1 == n_iters:
            valid_loss, mean_iou = test_few_shot(bank, learner, logger,
                                                 valid_classes)
            logger.cprint(f"\n=====[VALID] Loss: {valid_loss:.4f} | "
                          f"Mean IoU: {mean_iou:f} =====\n")
            history.append({"iteration": it + 1, "miou": float(mean_iou)})
            if mean_iou > best_iou:
                best_iou = mean_iou
                logger.cprint("*******************Model Saved****************")
                learner.save(os.path.join(fs_cfg.log_dir, "checkpoint.npz"),
                             {"iteration": it + 1, "IoU": best_iou})
    return {"best_iou": best_iou, "history": history, "learner": learner}


def episodic_eval(kind: str, model_cfg, data_cfg, fs_cfg: FewShotConfig,
                  model_checkpoint_path: str, logger=None,
                  mode: str = "test",
                  bank_episodes: Optional[int] = None) -> float:
    """protoeval / mptieval (reference pretrain/runs/eval.py:205-223)."""
    logger = logger or init_logger(fs_cfg.log_dir, phase=f"{kind}eval")
    learner = FewShotLearner(kind, model_cfg, data_cfg, fs_cfg,
                             model_checkpoint_path=model_checkpoint_path)
    bank = StaticEpisodeBank(
        data_cfg.data_path, data_cfg.dataset, cvfold=data_cfg.cvfold,
        num_episode_per_comb=bank_episodes or fs_cfg.n_episode_test,
        n_way=fs_cfg.n_way, k_shot=fs_cfg.k_shot, n_queries=fs_cfg.n_queries,
        num_point=data_cfg.pc_npts, pc_attribs=data_cfg.pc_attribs, mode=mode)
    test_loss, mean_iou = test_few_shot(bank, learner, logger,
                                        sorted(bank.classes.tolist()))
    logger.cprint(f"\n=====[TEST] Loss: {test_loss:.4f} | "
                  f"Mean IoU: {mean_iou:f} =====\n")
    return mean_iou


def make_finetune_loop(model_cfg, fs_cfg, n_cls: int,
                       dropout: float = 0.3):
    """The FineTune inner loop (reference fine_tune.py:21-75): full
    train-mode forward (so encoder BN running stats update exactly like
    the reference's), but Adam steps only the segmenter head.

    Returns (model, tx, inner_step, test_step); `dropout`=0 makes the
    trajectory deterministic (the reference-oracle test pins it that way).
    """
    from gfs3dseg_gws_tpu.models.dgcnnseg import DGCNNSeg
    from gfs3dseg_gws_tpu.models.layers import cross_entropy

    model = DGCNNSeg(num_classes=n_cls,
                     edgeconv_widths=model_cfg.edgeconv_widths,
                     mlp_widths=model_cfg.dgcnn_mlp_widths,
                     k=model_cfg.dgcnn_k, use_pallas=model_cfg.use_pallas,
                     dropout=dropout)
    # only the segmenter trains (reference fine_tune.py:35)
    tx = optax.multi_transform(
        {"seg": optax.adam(fs_cfg.lr), "frozen": optax.set_to_zero()},
        lambda p: jax.tree_util.tree_map_with_path(
            lambda path, _: "seg" if path[0].key == "segmenter"
            else "frozen", p))

    @jax.jit
    def inner_step(params, batch_stats, opt_state, sx, sy, rng):
        def loss_fn(p):
            logits, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, sx, True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            return cross_entropy(logits, sy), upd["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    @jax.jit
    def test_step(params, batch_stats, qx, qy):
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             qx, False)
        pred = jnp.argmax(jax.nn.softmax(logits, -1), axis=-1)
        return pred, confusion_matrix(pred, qy, n_cls)

    return model, tx, inner_step, test_step


def finetune(model_cfg, data_cfg, fs_cfg: FewShotConfig,
             pretrain_checkpoint_path: str = "", inner_iters: int = 100,
             logger=None, max_episodes: Optional[int] = None,
             bank_episodes: Optional[int] = None) -> float:
    """FineTune baseline (reference pretrain/runs/fine_tune.py:97-152):
    per episode, train only the segmenter head on the support set for
    `inner_iters` steps, then test on the query set."""
    from gfs3dseg_gws_tpu.models.dgcnnseg import DGCNNSeg
    from gfs3dseg_gws_tpu.models.layers import cross_entropy
    from gfs3dseg_gws_tpu.pipelines.gfs import _flat, _load_encoder_any

    logger = logger or init_logger(fs_cfg.log_dir, phase="finetune")
    n_cls = fs_cfg.n_way + 1
    n, cin = data_cfg.pc_npts, len(data_cfg.pc_attribs)
    model, tx, inner_step, test_step = make_finetune_loop(
        model_cfg, fs_cfg, n_cls)
    rng = jax.random.PRNGKey(fs_cfg.seed)
    variables = jit_init(model, {"params": rng, "dropout": rng},
                         jnp.zeros((2, n, cin)), True)
    params, batch_stats = variables["params"], variables["batch_stats"]
    if pretrain_checkpoint_path:
        enc_p, enc_s = _load_encoder_any(pretrain_checkpoint_path)
        params = dict(params)
        params["encoder"] = restore_into(params["encoder"], _flat(enc_p),
                                         strict=False)
        batch_stats = dict(batch_stats)
        batch_stats["encoder"] = restore_into(batch_stats["encoder"],
                                              _flat(enc_s), strict=False)
    opt_state0 = tx.init(params)

    bank = StaticEpisodeBank(
        data_cfg.data_path, data_cfg.dataset, cvfold=data_cfg.cvfold,
        num_episode_per_comb=bank_episodes or fs_cfg.n_episode_test,
        n_way=fs_cfg.n_way, k_shot=fs_cfg.k_shot, n_queries=fs_cfg.n_queries,
        num_point=data_cfg.pc_npts, pc_attribs=data_cfg.pc_attribs,
        mode="test")
    test_classes = sorted(bank.classes.tolist())

    num_global = len(test_classes) + 1
    cm_global = np.zeros((num_global, num_global), np.float64)
    n_episodes = min(len(bank), max_episodes or len(bank))
    for ep in range(n_episodes):
        s_pc, s_mask, q_pc, q_lbl, sampled = bank[ep]
        # support masks -> labels 1..n_way (fine_tune.py:77-94)
        sy = (s_mask * (np.arange(fs_cfg.n_way)[:, None, None] + 1)).astype(
            np.int32)
        sx = jnp.asarray(s_pc.reshape(-1, n, cin))
        sy = jnp.asarray(sy.reshape(-1, n))
        # NOTE: like the reference, the segmenter state carries over episodes
        opt_state = opt_state0
        for i in range(inner_iters):
            params, batch_stats, opt_state, loss = inner_step(
                params, batch_stats, opt_state, sx, sy,
                jax.random.PRNGKey(ep * inner_iters + i))
        pred, cm = test_step(params, batch_stats, jnp.asarray(q_pc),
                             jnp.asarray(q_lbl.astype(np.int32)))
        fewshot_accumulate(cm_global, np.asarray(cm), sampled, test_classes)
        logger.cprint(f"=====[FineTune] Episode {ep} done =====")

    mean_iou, iou = fewshot_miou(cm_global)
    for c, v in enumerate(iou):
        logger.cprint(f"----- [class {c}]  IoU: {v:f} -----")
    logger.cprint(f"\n=====[Test] Mean IoU: {mean_iou:f} =====\n")
    return mean_iou


def mpti_gfs_core(feat_fn, base_blocks, supp_items, query_blocks,
                  base_classes, novel_classes, kp: int, k_connect: int,
                  sigma: float, rng, n_all: int, max_pts: int = 200_000):
    """Data-agnostic GFS-MPTI chain (reference mpti_learner.py:107-245).

    feat_fn maps one (N, C) block to its (N, D) features (the production
    wrapper passes the jitted encoder closure; the reference-oracle test
    passes a fixed projection shared bit-for-bit with the torch side);
    base_blocks yields (pc (N,C), lbl (N,) with labels 1+base-index);
    supp_items yields (pcd (N,C), mask (N,), class-name id);
    query_blocks yields (pcd (N,C), label in class-NAME ids).
    `rng` drains the >max_pts subsample draws exactly like the reference's
    global np.random (pass LegacyRNG(seed).np_rs for parity).
    Returns (pred_list, gt_list, base_proto_dict) like the reference's
    test_gfs — the metric layers on top.
    """
    from gfs3dseg_gws_tpu.models.mpti import multi_prototypes
    from gfs3dseg_gws_tpu.ops.linalg import (
        label_propagate, local_constrained_affinity)

    per_class = {i: [] for i in range(len(base_classes))}
    for pc, lbl in base_blocks:
        feat = np.asarray(feat_fn(pc))
        for i in range(len(base_classes)):
            mask = lbl == i + 1
            if mask.sum() > 0:
                per_class[i].append(feat[mask])

    protos_list, labels_list = [], []
    base_proto_dict = {}
    for i, cls in enumerate(base_classes):
        feat = np.concatenate(per_class[i], axis=0)
        if feat.shape[0] > max_pts:
            feat = feat[rng.choice(np.arange(feat.shape[0]), max_pts,
                                   replace=False)]
        protos = np.asarray(multi_prototypes(
            jnp.asarray(feat), jnp.ones(feat.shape[0]), kp))
        base_proto_dict[cls] = protos
        protos_list.append(protos)
        lab = np.zeros((kp, n_all))
        lab[:, cls] = 1
        labels_list.append(lab)
        per_class[i] = []

    novel_feats = {c: [] for c in novel_classes}
    for pcd, mask, cls in supp_items:
        feat = np.asarray(feat_fn(pcd))
        novel_feats[int(cls)].append(feat[mask == 1])
    for cls in novel_classes:
        feat = np.concatenate(novel_feats[cls], axis=0)
        protos = np.asarray(multi_prototypes(
            jnp.asarray(feat), jnp.ones(feat.shape[0]), kp))
        protos_list.append(protos)
        lab = np.zeros((kp, n_all))
        lab[:, cls] = 1
        labels_list.append(lab)

    prototypes = jnp.asarray(np.concatenate(protos_list))
    proto_labels = jnp.asarray(np.concatenate(labels_list))
    num_p = prototypes.shape[0]

    @jax.jit
    def propagate(q_feat):
        node_feat = jnp.concatenate([prototypes, q_feat], axis=0)
        y0 = jnp.concatenate(
            [proto_labels, jnp.zeros((q_feat.shape[0], n_all))], axis=0)
        a = local_constrained_affinity(node_feat, k_connect, sigma)
        z = label_propagate(a, y0)
        return jnp.argmax(jax.nn.softmax(z[num_p:], -1), axis=-1)

    pred_list, gt_list = [], []
    for pcd, label in query_blocks:
        feat = np.asarray(feat_fn(pcd))
        pred_list.append(np.asarray(propagate(jnp.asarray(feat))))
        gt_list.append(np.asarray(label))
    return pred_list, gt_list, base_proto_dict


def mpti_test_gfs(model_cfg, data_cfg, fs_cfg: FewShotConfig,
                  model_checkpoint_path: str, testing_data_path: str,
                  logger=None, max_base_blocks: Optional[int] = None,
                  max_query_blocks: Optional[int] = None) -> Dict:
    """GFS-style MPTI evaluation (reference mpti_learner.py:107-245):
    100 multi-prototypes per base class from the full base train set (cap
    200k pts/class) + 100 per novel class from the static supports, then
    per-query-block label propagation over prototypes + query points."""
    from gfs3dseg_gws_tpu.data.datasets import (
        PretrainBlockDataset, TestingDataset, ValSuppDataset)
    from gfs3dseg_gws_tpu.data.registry import make_registry
    from gfs3dseg_gws_tpu.data.sampler import LegacyRNG
    from gfs3dseg_gws_tpu.ops.metrics import gfs_miou

    logger = logger or init_logger(fs_cfg.log_dir, phase="mptigfs")

    learner = FewShotLearner("mpti", model_cfg, data_cfg, fs_cfg,
                             model_checkpoint_path=model_checkpoint_path)
    model = learner.model
    variables = {"params": learner.params,
                 "batch_stats": learner.batch_stats}

    reg_train = make_registry(data_cfg.dataset, data_cfg.cvfold,
                              data_cfg.data_path)
    reg_test = make_registry(data_cfg.dataset, data_cfg.cvfold,
                             testing_data_path)
    base_classes = sorted(reg_train.train_classes)
    novel_classes = sorted(reg_train.test_classes)
    all_order = base_classes + novel_classes
    all_names = sorted(all_order)
    n_all = len(all_names)

    # ONE legacy stream drives both the base-pass block sampling and the
    # >200k subsample caps — the reference consumes the single global
    # np.random stream for both (mpti_learner.py:125-160)
    rng = LegacyRNG(fs_cfg.seed)

    c2s = {c: reg_train.class2scans[c] for c in base_classes}
    base_ds = PretrainBlockDataset(
        data_cfg.data_path, base_classes, c2s, mode="train",
        num_point=data_cfg.pc_npts, pc_attribs=data_cfg.pc_attribs)
    n_blocks = min(len(base_ds), max_base_blocks or len(base_ds))

    def base_blocks():
        for bi in range(n_blocks):
            pc, lbl, _ = base_ds.__getitem__(bi, rng=rng)
            yield pc, lbl

    supp = ValSuppDataset(data_cfg.data_path, data_cfg.dataset,
                          cvfold=data_cfg.cvfold, k_shot=data_cfg.k_shot,
                          mode="test", num_point=data_cfg.pc_npts,
                          pc_attribs=data_cfg.pc_attribs, seed=10,
                          registry=reg_train)

    def supp_items():
        for i in range(len(supp)):
            pcd, mask, cls = supp[i]
            yield pcd, mask, cls

    test_c2s = {c: reg_test.class2scans[c] for c in all_names}
    query_ds = TestingDataset(testing_data_path, all_names, all_order,
                              test_c2s, mode="test",
                              num_point=data_cfg.pc_npts,
                              pc_attribs=data_cfg.pc_attribs)
    n_query = min(len(query_ds), max_query_blocks or len(query_ds))

    def query_blocks():
        for qi in range(n_query):
            pcd, label, _ = query_ds[qi]
            # TestingDataset returns learning-order labels; the chain (and
            # the reference) scores in class-NAME space
            yield pcd, np.asarray(all_order)[label]

    feat_jit = jax.jit(lambda v, x: model.apply(v, x, False,
                                                method="get_features"))

    def feat_fn(pc):
        return np.asarray(feat_jit(variables, jnp.asarray(pc[None])))[0]

    pred_list, gt_list, _ = mpti_gfs_core(
        feat_fn, base_blocks(), supp_items(), query_blocks(),
        base_classes, novel_classes, fs_cfg.n_subprototypes,
        fs_cfg.k_connect, fs_cfg.sigma, rng.np_rs, n_all)

    cm = np.zeros((n_all, n_all), np.float64)
    for pred, gt in zip(pred_list, gt_list):
        np.add.at(cm, (gt, pred), 1)

    scannet = n_all > 13
    # cm here is already in class-name space -> identity learning order
    mean_iou, base_iou, novel_iou, hm, iou_list = gfs_miou(
        cm, list(range(n_all)), novel_classes, scannet=scannet)
    logger.cprint(f"MPTI GFS: mean {mean_iou}, base {base_iou}, "
                  f"novel {novel_iou}, hm {hm}")
    return {"mean_iou": mean_iou, "base_iou": base_iou,
            "novel_iou": novel_iou, "hm_iou": hm}
