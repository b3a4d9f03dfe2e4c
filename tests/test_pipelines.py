"""End-to-end pipeline tests on the hermetic synthetic dataset.

Exercises the full artifact chain on tiny shapes:
    pretrain -> checkpoint -> get_basis -> basis.pkl -> GFS train ->
    checkpoint -> GFS evaluate (5-seed average)
mirroring the reference's stage flow (SURVEY.md §1 dataflow diagram).
"""
import os

import numpy as np
import pytest

from gfs3dseg_gws_tpu.data import make_synthetic_blocks
from gfs3dseg_gws_tpu.pipelines.basis import extract_basis
from gfs3dseg_gws_tpu.pipelines.gfs import evaluate_gfs, train_gfs
from gfs3dseg_gws_tpu.pipelines.pretrain import pretrain
from gfs3dseg_gws_tpu.utils.config import (
    DataConfig,
    ModelConfig,
    PretrainConfig,
    TrainConfig,
    replace,
)

NPTS = 128
TINY = dict(edgeconv_widths=((8, 8), (8, 8), (8, 8)),
            dgcnn_mlp_widths=(16, 16), base_widths=(8, 8), output_dim=8,
            main_dim=16, dgcnn_k=5, use_pallas=False, pc_npts=NPTS)


@pytest.fixture(scope="module")
def chain(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    train_dir, test_dir = make_synthetic_blocks(
        root, n_train_blocks=40, n_test_blocks=8, points_per_block=2000,
        seed=1)
    model_cfg = ModelConfig(**TINY)
    data_cfg = DataConfig(dataset="s3dis", cvfold=0, data_path=train_dir,
                          testing_data_path=test_dir, pc_npts=NPTS, k_shot=2,
                          n_workers=2)
    return root, model_cfg, data_cfg


def test_full_chain(chain):
    root, model_cfg, data_cfg = chain
    log_dir = os.path.join(root, "log_pretrain")

    # --- stage 1: backbone pretrain (2 tiny epochs)
    pre_cfg = PretrainConfig(batch_size=8, n_iters=2, eval_interval=2,
                             log_dir=log_dir)
    result = pretrain(model_cfg, data_cfg, pre_cfg, mesh=None,
                      max_steps_per_epoch=3, export_torch=False)
    assert os.path.exists(os.path.join(log_dir, "checkpoint.npz"))

    # --- stage 2: geometric words
    basis = extract_basis(model_cfg, data_cfg, num_cnt=10,
                          pretrain_checkpoint_path=os.path.join(
                              log_dir, "checkpoint.npz"),
                          save_dir=log_dir, batch_size=4, kmeans_iters=5,
                          max_blocks=12)
    assert basis.shape == (10, 24)  # (num_cnt, 3 * edgeconv width)
    basis_path = os.path.join(
        log_dir, "GlobalKmeans_EdgeConv123_cnt=10_energy=095_SVDReconstruct"
        ".pkl")
    assert os.path.exists(basis_path)

    # --- stage 3: GFS base-stage training (2 tiny epochs)
    save_path = os.path.join(root, "log_gfs")
    train_cfg = TrainConfig(batch_size=8, epochs=2, eval_interval=2,
                            coding_interval=1, basis_path=basis_path,
                            save_path=save_path, print_freq=100,
                            use_pretrain_weight=True,
                            pretrain_checkpoint_path=os.path.join(
                                log_dir, "checkpoint.npz"))
    out = train_gfs(model_cfg, data_cfg, train_cfg, mesh=None,
                    max_steps_per_epoch=3)
    assert out["history"], "validation should have run at least once"
    ckpts = [f for f in os.listdir(save_path) if f.endswith(".npz")
             and f.startswith("train_")]
    assert ckpts, "best checkpoint should be saved"

    # --- stage 4: evaluation over all support seeds
    eval_cfg = replace(train_cfg, only_evaluate=True,
                       model_checkpoint_path=os.path.join(save_path,
                                                          ckpts[0]))
    metrics = evaluate_gfs(model_cfg, data_cfg, eval_cfg, mesh=None)
    for key in ("mean_iou", "base_iou", "novel_iou", "hm_iou"):
        assert np.isfinite(metrics[key]), key
    assert len(metrics["per_class"]) == 13


def test_load_base_coding_prefix_preference(tmp_path):
    """hm-checkpoint evaluation prefers the hm_-prefixed coding artifact
    (reference saves best-hm codings as hm_base_class_gp_coding_energy={e},
    train.py:582-584); plain checkpoints keep the unprefixed name."""
    import numpy as np

    from gfs3dseg_gws_tpu.pipelines.gfs import load_base_coding

    d = str(tmp_path)
    plain = np.ones((3, 5), np.float32)
    hm = np.full((3, 5), 2.0, np.float32)
    np.savez(f"{d}/base_class_gp_coding_energy=0.9.npz", coding=plain)
    np.savez(f"{d}/hm_base_class_gp_coding_energy=0.9.npz", coding=hm)

    got_plain = load_base_coding(d, 0.9)
    np.testing.assert_array_equal(got_plain, plain)
    got_hm = load_base_coding(d, 0.9, prefixes=("hm_", ""))
    np.testing.assert_array_equal(got_hm, hm)
    # hm_ preferred but falls back to unprefixed when absent
    import os
    os.remove(f"{d}/hm_base_class_gp_coding_energy=0.9.npz")
    got_fb = load_base_coding(d, 0.9, prefixes=("hm_", ""))
    np.testing.assert_array_equal(got_fb, plain)


def test_pretrain_multi_dispatch_packed(chain, tmp_path):
    """Pretrain with steps_per_dispatch=2 + packed u8 transfers (the TPU
    default policy, forced on CPU): loop runs one scanned chunk plus a
    leftover single step per epoch, losses finite, checkpoint written."""
    root, model_cfg, data_cfg = chain
    log_dir = str(tmp_path / "log_pretrain_spd")
    pre_cfg = PretrainConfig(batch_size=8, n_iters=2, eval_interval=2,
                             log_dir=log_dir, steps_per_dispatch=2,
                             h2d="packed")
    result = pretrain(model_cfg, data_cfg, pre_cfg, mesh=None,
                      max_steps_per_epoch=3, export_torch=False)
    assert np.isfinite(result["history"][-1]["miou"])
    assert os.path.exists(os.path.join(log_dir, "checkpoint.npz"))
