"""Vectorised segmentation metrics.

Replaces the reference's pure-Python per-point confusion loops
(reference runs/eval.py:31-48, pretrain/runs/pre_train.py:61-70) with an
on-device confusion matrix: predictions never leave the TPU during an eval
sweep; only the final (C, C) counts transfer to host.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(pred: jax.Array, gt: jax.Array, num_classes: int,
                     mask: jax.Array | None = None) -> jax.Array:
    """Confusion counts cm[gt, pred] over all elements.

    Implemented as a one-hot matmul so it rides the MXU instead of scatters.
    pred/gt: integer arrays of identical shape. `mask` (same shape, optional)
    zeroes out excluded elements (e.g. padding rows of a final short batch).
    Returns (C, C) float32.
    """
    p = jax.nn.one_hot(pred.reshape(-1), num_classes, dtype=jnp.float32)
    g = jax.nn.one_hot(gt.reshape(-1), num_classes, dtype=jnp.float32)
    if mask is not None:
        g = g * mask.reshape(-1, 1).astype(jnp.float32)
    return jnp.einsum("mc,md->cd", g, p, preferred_element_type=jnp.float32)


def iou_from_confusion(cm: np.ndarray, safe: bool = False) -> np.ndarray:
    """Per-class IoU from a confusion matrix cm[gt, pred].

    With safe=False, a never-seen class (zero denominator) raises
    FloatingPointError, matching the reference's ZeroDivisionError from its
    per-point Python loop (runs/eval.py:57). safe=True yields 0 instead.
    """
    cm = np.asarray(cm, dtype=np.float64)
    tp = np.diag(cm)
    denom = cm.sum(axis=0) + cm.sum(axis=1) - tp
    if safe:
        return np.where(denom > 0, tp / np.maximum(denom, 1), 0.0)
    with np.errstate(divide="raise", invalid="raise"):
        return tp / denom


def gfs_miou(
    cm_learning_order: np.ndarray,
    all_learning_order: Sequence[int],
    novel_class_names: Sequence[int],
    scannet: bool = False,
) -> Tuple[float, float, float, float, np.ndarray]:
    """GFS metric: base/novel/mean/harmonic-mean mIoU.

    Args:
      cm_learning_order: (C, C) confusion counts where ids are LEARNING-order
        ids (base classes first, then novel), as produced during evaluation.
      all_learning_order: all_learning_order[i] = class-NAME id of learning
        id i (reference train.py:341-342).
      novel_class_names: class-name ids of the novel classes.
      scannet: skip class-name id 0 ("unannotated") from all aggregates
        (reference runs/eval.py:79-106).
    Returns:
      (mean_iou, base_iou, novel_iou, hm_iou, per_class_iou_in_name_order)
    """
    order = np.asarray(all_learning_order)
    num_class = len(order)
    # permute learning-order ids -> class-name ids (reference runs/eval.py:41-48)
    perm = np.zeros(num_class, dtype=np.int64)
    perm[np.arange(num_class)] = order
    cm_name = np.zeros_like(cm_learning_order, dtype=np.float64)
    cm_name[perm[:, None], perm[None, :]] = np.asarray(cm_learning_order,
                                                       dtype=np.float64)

    iou = iou_from_confusion(cm_name)
    novel = set(int(c) for c in novel_class_names)

    base_list, novel_list = [], []
    for c in range(num_class):
        if scannet and c == 0:
            continue
        (novel_list if c in novel else base_list).append(iou[c])

    iou_list = iou[1:] if scannet else iou
    mean_iou = float(np.mean(iou_list))
    base_iou = float(np.mean(base_list))
    novel_iou = float(np.mean(novel_list))
    hm = 2.0 * base_iou * novel_iou / (base_iou + novel_iou)
    return mean_iou, base_iou, novel_iou, float(hm), iou_list


def intersection_and_union(pred: jax.Array, gt: jax.Array, num_classes: int,
                           ignore_index: int = 255):
    """Histogram IoU counts (reference util/util.py:64-104): per-class
    intersection, prediction-area, and target-area counts, vectorised."""
    pred = pred.reshape(-1)
    gt = gt.reshape(-1)
    valid = gt != ignore_index
    pred = jnp.where(valid, pred, num_classes)  # overflow bucket
    gt = jnp.where(valid, gt, num_classes)
    inter_mask = pred == gt
    area_inter = jnp.bincount(jnp.where(inter_mask, pred, num_classes),
                              length=num_classes + 1)[:num_classes]
    area_pred = jnp.bincount(pred, length=num_classes + 1)[:num_classes]
    area_gt = jnp.bincount(gt, length=num_classes + 1)[:num_classes]
    area_union = area_pred + area_gt - area_inter
    return area_inter, area_union, area_gt


def fewshot_accumulate(cm_global: np.ndarray, cm_episode: np.ndarray,
                       label2class: Sequence[int],
                       test_classes: Sequence[int]) -> None:
    """Scatter one episode's (n_way+1, n_way+1) confusion counts into the
    global (len(test_classes)+1, ...) matrix, mapping episode label i+1 ->
    test_classes.index(label2class[i]) + 1 and 0 -> background 0
    (reference pretrain/runs/eval.py:35-60)."""
    classes = list(test_classes)
    n_way = len(label2class)
    perm = np.zeros(n_way + 1, dtype=np.int64)
    for i, cls in enumerate(label2class):
        perm[i + 1] = classes.index(int(cls)) + 1
    cm_global[perm[:, None], perm[None, :]] += np.asarray(cm_episode,
                                                          np.float64)


def fewshot_miou(cm_global: np.ndarray) -> Tuple[float, np.ndarray]:
    """Classic FS metric: per-class IoU; mean over foreground classes only
    (reference pretrain/runs/eval.py:62-70)."""
    iou = iou_from_confusion(cm_global, safe=True)
    return float(np.mean(iou[1:])), iou


def overall_accuracy_and_miou(cm: np.ndarray, skip_class0_in_miou: bool = True
                              ) -> Tuple[float, float, np.ndarray]:
    """Pretrain-style metric (reference pretrain/runs/pre_train.py:51-83):
    overall accuracy + mean IoU over classes 1..C-1 (class 0 = background)."""
    cm = np.asarray(cm, dtype=np.float64)
    oa = float(np.trace(cm) / cm.sum())
    iou = iou_from_confusion(cm, safe=True)
    miou = float(np.mean(iou[1:] if skip_class0_in_miou else iou))
    return oa, miou, iou
