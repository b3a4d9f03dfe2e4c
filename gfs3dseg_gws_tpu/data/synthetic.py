"""Synthetic scene/block generation for tests and benchmarks.

Produces on-disk trees with the exact reference layout:
    <root>/blocks_bs1.0_s1.0/data/*.npy      (N x 7 xyzrgbL blocks)
    <root>/blocks_bs1.0_s1.0_test/data/*.npy
    <root>/meta/{dataset}_classnames.txt
so every registry/dataset/pipeline/CLI code path can run hermetically.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from gfs3dseg_gws_tpu.data.registry import (
    S3DIS_CLASSNAMES,
    SCANNET_CLASSNAMES,
)


def _class_signature(cls: int, n_classes: int):
    """Stable per-class attributes so synthetic datasets carry a LEARNABLE
    cross-block signal: a fixed colour (deterministic per class) and a
    class-dependent height band."""
    rng = np.random.default_rng(1000 + cls)
    color = rng.uniform(30, 225, size=3)
    z_center = 0.3 + 2.2 * (cls / max(n_classes - 1, 1))
    return color, z_center


def make_synthetic_room(rng: np.random.Generator, n_points: int = 8000,
                        n_classes: int = 13,
                        present: Optional[Sequence[int]] = None) -> np.ndarray:
    """One synthetic room: clustered class blobs, N x 7 (xyz rgb label).

    Classes have stable colour/height signatures (plus noise), so models can
    genuinely generalise from train blocks to test blocks — learning-signal
    tests would be vacuous on pure noise."""
    if present is None:
        n_present = rng.integers(3, min(8, n_classes) + 1)
        present = rng.choice(n_classes, n_present, replace=False)
    present = np.asarray(present)
    pts_per = np.maximum(rng.multinomial(
        n_points, np.ones(len(present)) / len(present)), 150)
    rows = []
    for cls, cnt in zip(present, pts_per):
        color, z_center = _class_signature(int(cls), n_classes)
        center_xy = rng.uniform(0, 4, size=2)
        xyz = np.stack([
            center_xy[0] + 0.35 * rng.standard_normal(cnt),
            center_xy[1] + 0.35 * rng.standard_normal(cnt),
            z_center + 0.15 * rng.standard_normal(cnt),
        ], axis=1)
        # integer-valued like the real collectors' output (S3DIS txt /
        # ScanNet ply store rgb as 0-255 ints) — also what makes the
        # packed-H2D uint8 round-trip exact
        rgb = np.rint(np.clip(color + 20.0 * rng.standard_normal((cnt, 3)),
                              0, 255))
        lbl = np.full((cnt, 1), cls, dtype=np.float64)
        rows.append(np.concatenate([xyz, rgb, lbl], axis=1))
    room = np.concatenate(rows, axis=0)
    room[:, :2] -= room[:, :2].min(axis=0)
    return room


def make_synthetic_blocks(
    root: str,
    dataset: str = "s3dis",
    n_train_blocks: int = 24,
    n_test_blocks: int = 8,
    points_per_block: int = 3000,
    n_classes: int = 13,
    seed: int = 0,
    classnames: Optional[List[str]] = None,
) -> tuple[str, str]:
    """Write a reference-layout synthetic dataset; returns
    (train_blocks_dir, test_blocks_dir)."""
    rng = np.random.default_rng(seed)
    if classnames is None:
        if dataset == "s3dis":
            classnames = S3DIS_CLASSNAMES[:n_classes]
        elif dataset == "scannet":
            # real table names so the registry's fold lists resolve
            classnames = SCANNET_CLASSNAMES[:n_classes]
        else:
            classnames = [f"class{i}" for i in range(n_classes)]

    meta = os.path.join(root, "meta")
    os.makedirs(meta, exist_ok=True)
    with open(os.path.join(meta, f"{dataset}_classnames.txt"), "w") as f:
        f.write("\n".join(classnames) + "\n")

    train_dir = os.path.join(root, "blocks_bs1.0_s1.0")
    test_dir = os.path.join(root, "blocks_bs1.0_s1.0_test")
    for d, n_blocks, tag in ((train_dir, n_train_blocks, "train"),
                             (test_dir, n_test_blocks, "test")):
        data_dir = os.path.join(d, "data")
        os.makedirs(data_dir, exist_ok=True)
        for i in range(n_blocks):
            # guarantee every class appears in several blocks
            forced = [i % n_classes, (i + 1) % n_classes, (i + 2) % n_classes]
            extra = rng.choice(n_classes, 3, replace=False).tolist()
            present = sorted(set(forced + extra))
            block = make_synthetic_room(rng, points_per_block, n_classes,
                                        present)
            np.save(os.path.join(
                data_dir, f"Area_{tag}_room_{i}_block_0.npy"), block)
    return train_dir, test_dir
