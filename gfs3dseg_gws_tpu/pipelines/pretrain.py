"""Backbone pre-training (reference pretrain/runs/pre_train.py:86-198).

Fully-supervised segmentation on base classes + background; saves the best
encoder (by validation mIoU over classes 1..C-1) in both our npz format and
the reference's `checkpoint.tar` torch format.
"""
from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gfs3dseg_gws_tpu.data.datasets import PretrainBlockDataset
from gfs3dseg_gws_tpu.data.pipeline import batch_iterator
from gfs3dseg_gws_tpu.data.registry import make_registry
from gfs3dseg_gws_tpu.models.dgcnnseg import DGCNNSeg
from gfs3dseg_gws_tpu.ops.metrics import overall_accuracy_and_miou
from gfs3dseg_gws_tpu.parallel import (TrainState, jit_init,
                                       make_batch_putter, make_mesh,
                                       make_pretrain_multi_step,
                                       make_pretrain_step, replicate,
                                       shard_batch)
from gfs3dseg_gws_tpu.parallel.optim import make_pretrain_optimizer
from gfs3dseg_gws_tpu.parallel.steps import (cached_int32,
                                             make_eval_logits_step)
from gfs3dseg_gws_tpu.utils.checkpoint import save_checkpoint, save_torch_pretrain_checkpoint
from gfs3dseg_gws_tpu.utils.logging import AverageMeter, init_logger
from gfs3dseg_gws_tpu.utils.observability import MetricsWriter


def pretrain(model_cfg, data_cfg, pretrain_cfg, mesh=None, logger=None,
             max_steps_per_epoch: Optional[int] = None,
             export_torch: bool = True,
             init_checkpoint_path: str = "") -> Dict:
    """`init_checkpoint_path` (npz with the full DGCNNSeg params +
    batch_stats tree) warm-starts the loop from explicit weights — the
    reference pretrain loop always starts from torch random init
    (pre_train.py:131), so this is framework-only surface; the
    cross-framework pretrain trajectory oracle uses it to train both
    frameworks from matched converted inits."""
    logger = logger or init_logger(pretrain_cfg.log_dir, phase="pretrain")
    writer = MetricsWriter(pretrain_cfg.log_dir)
    if mesh is None and jax.device_count() > 1:
        mesh = make_mesh()

    reg = make_registry(data_cfg.dataset, data_cfg.cvfold, data_cfg.data_path)
    classes = reg.train_classes
    num_classes = len(classes) + 1  # + background
    c2s = {c: reg.class2scans[c] for c in classes}

    train_ds = PretrainBlockDataset(
        data_cfg.data_path, classes, c2s, mode="train",
        num_point=data_cfg.pc_npts, pc_attribs=data_cfg.pc_attribs,
        pc_augm=data_cfg.pc_augm, pc_augm_config=data_cfg.augment_config,
        split_ratio=0.1)
    valid_ds = PretrainBlockDataset(
        data_cfg.data_path, classes, c2s, mode="test",
        num_point=data_cfg.pc_npts, pc_attribs=data_cfg.pc_attribs,
        split_ratio=0.1)
    logger.cprint(
        f"=== Pre-train Dataset (classes: {classes}) | "
        f"Train: {len(train_ds)} blocks | Valid: {len(valid_ds)} blocks ===")

    model = DGCNNSeg(num_classes=num_classes,
                     edgeconv_widths=model_cfg.edgeconv_widths,
                     mlp_widths=model_cfg.dgcnn_mlp_widths,
                     k=model_cfg.dgcnn_k, use_pallas=model_cfg.use_pallas)
    rng = jax.random.PRNGKey(pretrain_cfg.seed)
    x0 = jnp.zeros((2, data_cfg.pc_npts, len(data_cfg.pc_attribs)))
    variables = jit_init(model, {"params": rng, "dropout": rng}, x0,
                         True)
    if init_checkpoint_path:
        from gfs3dseg_gws_tpu.utils.checkpoint import (load_checkpoint,
                                                       restore_into)
        flat, _ = load_checkpoint(init_checkpoint_path)
        variables = restore_into(variables, flat, strict=True)

    steps_per_epoch = max(len(train_ds) // pretrain_cfg.batch_size, 1)
    tx = make_pretrain_optimizer(pretrain_cfg.lr, steps_per_epoch,
                                 pretrain_cfg.weight_decay,
                                 pretrain_cfg.step_size, pretrain_cfg.gamma)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    if mesh is not None:
        state = replicate(state, mesh)
    train_step = make_pretrain_step(model, mesh)
    eval_step = make_eval_logits_step(model, num_classes, mesh)
    # same dispatch/transfer policy as the GFS loop (pipelines/gfs.py):
    # chain S steps per lax.scan dispatch, ship packed u8 buffers on TPU
    spd = max(int(getattr(pretrain_cfg, "steps_per_dispatch", 1)), 1)
    multi_step = make_pretrain_multi_step(model, mesh) if spd > 1 else None
    from gfs3dseg_gws_tpu.pipelines.gfs import _h2d_mode
    put_pair = make_batch_putter(
        mesh, _h2d_mode(getattr(pretrain_cfg, "h2d", "auto")) == "packed")

    # start below zero so the first evaluation always checkpoints (the
    # reference's 0 init works because real runs never stay at exactly 0)
    best_iou = -1.0
    history = []
    for epoch in range(pretrain_cfg.n_iters):
        loss_m = AverageMeter()
        t0 = time.time()
        from gfs3dseg_gws_tpu.pipelines.gfs import train_batches

        # defer the loss sync ~16 steps so float() never sits on the
        # dispatch critical path (one tunnel round-trip per step otherwise);
        # multi-step dispatches park one (S,) array and drain it whole
        pending = []

        def drain(upto: int):
            # bound pending STEPS, not dispatch entries: a multi-step
            # dispatch parks S losses in one (S,) array (same bookkeeping
            # as pipelines.gfs.train — with entry-counting, spd=8 would
            # let 16*8 steps + their stacked input buffers queue in HBM)
            while sum(p[1] for p in pending) > upto:
                for lv in np.atleast_1d(np.asarray(pending.pop(0)[0])):
                    loss_m.update(float(lv))

        chunk = []

        def flush_chunk():
            nonlocal state
            pts = np.stack([c[0] for c in chunk])
            lbs = np.stack([c[1] for c in chunk])
            n_steps = len(chunk)
            chunk.clear()
            p_dev, l_dev = put_pair(pts, lbs, stacked=True)
            state, losses = multi_step(state, p_dev, l_dev, rng)
            pending.append((losses, n_steps))

        for i, batch in enumerate(train_batches(
                train_ds, pretrain_cfg.batch_size, seed=pretrain_cfg.seed,
                epoch=epoch)):
            if max_steps_per_epoch and i >= max_steps_per_epoch:
                break
            points, labels = batch[0], batch[1].astype(np.int32)
            if spd > 1:
                chunk.append((points, labels))
                if len(chunk) == spd:
                    flush_chunk()
            else:
                p_dev, l_dev = put_pair(points, labels)
                state, loss = train_step(state, p_dev, l_dev, rng)
                pending.append((loss, 1))
            drain(16)
        # leftover sub-S chunk through the single-step jit (one scan length)
        for points, labels in list(chunk):
            p_dev, l_dev = put_pair(points, labels)
            state, loss = train_step(state, p_dev, l_dev, rng)
            pending.append((loss, 1))
        chunk.clear()
        drain(0)
        logger.cprint(f"=====[Train] Epoch: {epoch} | Loss: {loss_m.avg:.4f} "
                      f"| {time.time() - t0:.1f}s =====")
        writer.scalar("Train/loss", loss_m.avg, epoch)

        if (epoch + 1) % pretrain_cfg.eval_interval == 0 and len(valid_ds):
            variables_now = {"params": state.params,
                             "batch_stats": state.batch_stats}
            if mesh is not None:
                variables_d = variables_now
            else:
                variables_d = variables_now
            # bounded async dispatch (see gfs.validate)
            cm = np.zeros((num_classes, num_classes), np.float64)
            results = []
            for batch in batch_iterator(valid_ds, pretrain_cfg.batch_size,
                                        pad_final=True):
                points, labels = batch[0], batch[1].astype(np.int32)
                valid = int(batch[-1])
                if mesh is not None:
                    points = shard_batch(points, mesh)
                    labels = shard_batch(labels, mesh)
                results.append(eval_step(variables_d, points, labels,
                                         cached_int32(valid)))
                if len(results) > 48:
                    np.add(cm, np.asarray(results.pop(0), np.float64),
                           out=cm)
            for r in results:
                np.add(cm, np.asarray(r, np.float64), out=cm)
            oa, miou, _ = overall_accuracy_and_miou(cm)
            logger.cprint(f"===== EPOCH [{epoch}]: Accuracy: {oa:.6f} | "
                          f"mIoU: {miou:.6f} =====")
            history.append({"epoch": epoch, "oa": oa, "miou": miou})
            writer.scalar("Valid/overall_accuracy", oa, epoch)
            writer.scalar("Valid/meanIoU", miou, epoch)
            if miou > best_iou:
                best_iou = miou
                logger.cprint("*******************Model Saved**************")
                tree = {"params": jax.device_get(state.params),
                        "batch_stats": jax.device_get(state.batch_stats)}
                save_checkpoint(os.path.join(pretrain_cfg.log_dir,
                                             "checkpoint.npz"),
                                tree, {"epoch": epoch, "miou": miou})
                if export_torch:
                    try:
                        save_torch_pretrain_checkpoint(
                            tree["params"]["encoder"],
                            tree["batch_stats"]["encoder"],
                            pretrain_cfg.log_dir)
                    except ImportError:
                        pass

    writer.close()
    return {"best_iou": best_iou, "history": history, "state": state}
