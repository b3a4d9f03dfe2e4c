"""Geometric-word extraction (reference get_basis.py:112-222).

One pass of the pretrained DGCNN over all base-class blocks collects
EdgeConv1-3 features per class (capped at 300k points/class), then a global
k-means (k-means++ init, Lloyd on device) over the pooled features, per-
cluster means, and an SVD reconstruction keeping 0.95 singular-value energy.
The basis pickles to the reference's filename/format.
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
from gfs3dseg_gws_tpu.ops.kmeans import cluster_means, kmeans
from gfs3dseg_gws_tpu.parallel.steps import jit_init
from gfs3dseg_gws_tpu.ops.linalg import svd_energy_reconstruct
from gfs3dseg_gws_tpu.utils.checkpoint import (
    load_checkpoint,
    load_torch_pretrain_checkpoint,
    restore_into,
    save_basis,
)

MAX_PTS_PER_CLASS = 300_000  # reference get_basis.py:189


def extract_basis(model_cfg, data_cfg, num_cnt: int,
                  pretrain_checkpoint_path: str, save_dir: str,
                  seed: int = 123, batch_size: int = 8,
                  kmeans_iters: int = 100, svd_energy: float = 0.95,
                  max_blocks: Optional[int] = None) -> np.ndarray:
    rng = np.random.default_rng(seed)
    reg = make_registry(data_cfg.dataset, data_cfg.cvfold, data_cfg.data_path)
    classes = sorted(reg.train_classes)
    num_classes = len(classes) + 1
    c2s = {c: reg.class2scans[c] for c in classes}
    ds = PretrainBlockDataset(
        data_cfg.data_path, classes, c2s, mode="train",
        num_point=data_cfg.pc_npts, pc_attribs=data_cfg.pc_attribs)

    model = DGCNNSeg(num_classes=num_classes,
                     edgeconv_widths=model_cfg.edgeconv_widths,
                     mlp_widths=model_cfg.dgcnn_mlp_widths,
                     k=model_cfg.dgcnn_k, use_pallas=model_cfg.use_pallas)
    x0 = jnp.zeros((1, data_cfg.pc_npts, len(data_cfg.pc_attribs)))
    variables = jit_init(model, {"params": jax.random.PRNGKey(seed),
                                  "dropout": jax.random.PRNGKey(seed)},
                         x0, True)
    variables = _load_encoder(variables, pretrain_checkpoint_path)

    @jax.jit
    def feat_step(points):
        _, feat = model.apply(variables, points, False, True)
        return feat                                        # (B, N, 192)

    # reservoir-less collection with per-class cap: keep everything up to the
    # cap, then random-subsample at the end like the reference
    per_class: Dict[int, list] = {c: [] for c in range(1, num_classes)}
    n_seen = 0
    for batch in batch_iterator(ds, batch_size, shuffle=False,
                                pad_final=True):
        points, labels, valid = batch[0], batch[1], int(batch[-1])
        feats = np.asarray(feat_step(points))
        for b in range(valid):
            lb = labels[b]
            for c in np.unique(lb):
                if c == 0:
                    continue
                per_class[int(c)].append(feats[b][lb == c])
        n_seen += valid
        if max_blocks and n_seen >= max_blocks:
            break

    pooled = []
    for c in range(1, num_classes):
        if not per_class[c]:
            continue
        feat = np.concatenate(per_class[c], axis=0)
        print(f"cls : {c} has {feat.shape[0]} features")
        if feat.shape[0] > MAX_PTS_PER_CLASS:
            idx = rng.choice(feat.shape[0], MAX_PTS_PER_CLASS, replace=False)
            feat = feat[idx]
        pooled.append(feat)
        per_class[c] = []
    point_feat = np.concatenate(pooled, axis=0)

    t0 = time.time()
    _, labels_km = kmeans(point_feat, num_cnt, n_iters=kmeans_iters,
                         seed=seed)
    print(f"kmean : {time.time() - t0:.1f}s")
    protos = cluster_means(point_feat, labels_km, num_cnt)
    basis = svd_energy_reconstruct(protos, energy=svd_energy)

    os.makedirs(save_dir, exist_ok=True)
    out = os.path.join(
        save_dir,
        f"GlobalKmeans_EdgeConv123_cnt={num_cnt}_energy=095_SVDReconstruct"
        f".pkl")
    save_basis(out, basis)
    print(out)
    return basis


def _load_encoder(variables, path: str):
    """Load encoder weights from torch checkpoint.tar or our npz."""
    if path.endswith(".npz") or (os.path.isdir(path) and os.path.exists(
            os.path.join(path, "checkpoint.npz")) and not os.path.exists(
            os.path.join(path, "checkpoint.tar"))):
        npz = path if path.endswith(".npz") else os.path.join(
            path, "checkpoint.npz")
        flat, _ = load_checkpoint(npz)
        return {
            "params": restore_into(
                variables["params"],
                {k[len("params/"):]: v for k, v in flat.items()
                 if k.startswith("params/")}, strict=False),
            "batch_stats": restore_into(
                variables["batch_stats"],
                {k[len("batch_stats/"):]: v for k, v in flat.items()
                 if k.startswith("batch_stats/")}, strict=False),
        }
    from gfs3dseg_gws_tpu.utils.checkpoint import _flatten

    enc_p, enc_s = load_torch_pretrain_checkpoint(path)
    params = dict(variables["params"])
    params["encoder"] = restore_into(params["encoder"], _flatten(enc_p),
                                     strict=False)
    stats = dict(variables["batch_stats"])
    stats["encoder"] = restore_into(stats["encoder"], _flatten(enc_s),
                                    strict=False)
    return {"params": params, "batch_stats": stats}
