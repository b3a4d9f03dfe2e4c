"""Pipelines driven by TORCH-format checkpoints: evaluate_gfs on a .pth and
encoder loading from a checkpoint.tar — the reference-interop round trip."""
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gfs3dseg_gws_tpu.data import make_synthetic_blocks
from gfs3dseg_gws_tpu.pipelines.gfs import _flat, _load_encoder_any, evaluate_gfs
from gfs3dseg_gws_tpu.utils.checkpoint import (
    restore_into,
    save_torch_gfs_checkpoint,
    save_torch_pretrain_checkpoint,
)
from gfs3dseg_gws_tpu.utils.config import DataConfig, ModelConfig, TrainConfig

NPTS = 96
TINY = dict(edgeconv_widths=((8, 8), (8, 8), (8, 8)),
            dgcnn_mlp_widths=(16, 16), base_widths=(8, 8), output_dim=8,
            main_dim=16, dgcnn_k=5, use_pallas=False, pc_npts=NPTS)


@pytest.mark.slow
def test_evaluate_gfs_from_torch_pth(tmp_path):
    root = str(tmp_path)
    train_dir, test_dir = make_synthetic_blocks(
        root, n_train_blocks=40, n_test_blocks=13, points_per_block=1500,
        seed=12)
    basis = np.random.default_rng(0).standard_normal((10, 24)).astype(
        np.float32)
    basis_path = os.path.join(root, "basis.pkl")
    with open(basis_path, "wb") as f:
        pickle.dump(basis, f)

    # build a GWCAPL, export it to the reference .pth format, then evaluate
    # straight from that file
    from gfs3dseg_gws_tpu.models.capl import GWCAPL

    model = GWCAPL(classes=13, base_num=7, num_gw=10, **{
        k: v for k, v in TINY.items() if k not in ("pc_npts", "dgcnn_k",
                                                   "dgcnn_mlp_widths")},
        mlp_widths=TINY["dgcnn_mlp_widths"], k=TINY["dgcnn_k"])
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, NPTS, 9))
    y = jnp.zeros((2, NPTS), jnp.int32)
    variables = model.init({"params": rng, "dropout": rng, "fake": rng},
                           x, y, jnp.asarray(basis), train=True)
    pth = os.path.join(root, "reference_style.pth")
    save_torch_gfs_checkpoint(variables["params"], variables["batch_stats"],
                              pth, epoch=9, max_iou=0.1)

    model_cfg = ModelConfig(**TINY)
    data_cfg = DataConfig(dataset="s3dis", cvfold=0, data_path=train_dir,
                          testing_data_path=test_dir, pc_npts=NPTS, k_shot=2)
    train_cfg = TrainConfig(batch_size=8, basis_path=basis_path,
                            save_path=os.path.join(root, "eval"),
                            model_checkpoint_path=pth, only_evaluate=True,
                            eval_weight=1.2)
    metrics = evaluate_gfs(model_cfg, data_cfg, train_cfg, mesh=None)
    assert np.isfinite(metrics["mean_iou"])
    assert len(metrics["per_class"]) == 13


def test_load_encoder_any_from_tar(tmp_path):
    from gfs3dseg_gws_tpu.models.dgcnn import DGCNN

    model = DGCNN(edgeconv_widths=((8, 8),) * 3, mlp_widths=(16, 16), k=5,
                  use_pallas=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 9)))
    out_dir = str(tmp_path / "pre")
    save_torch_pretrain_checkpoint(variables["params"],
                                   variables["batch_stats"], out_dir)
    enc_p, enc_s = _load_encoder_any(os.path.join(out_dir, "checkpoint.tar"))
    restored = restore_into(variables["params"], _flat(enc_p), strict=False)
    np.testing.assert_allclose(
        np.asarray(restored["edgeconv0"]["layer0_kernel"]),
        np.asarray(variables["params"]["edgeconv0"]["layer0_kernel"]),
        rtol=1e-6)
