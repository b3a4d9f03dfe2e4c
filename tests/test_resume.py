"""Checkpoint/resume: training restarts from a saved checkpoint with
params, BN stats, optimizer moments and step counter intact."""
import os
import pickle

import numpy as np
import pytest

from gfs3dseg_gws_tpu.data import make_synthetic_blocks
from gfs3dseg_gws_tpu.pipelines.gfs import train_gfs
from gfs3dseg_gws_tpu.utils.checkpoint import load_checkpoint
from gfs3dseg_gws_tpu.utils.config import DataConfig, ModelConfig, TrainConfig, replace

NPTS = 96
TINY = dict(edgeconv_widths=((8, 8), (8, 8), (8, 8)),
            dgcnn_mlp_widths=(16, 16), base_widths=(8, 8), output_dim=8,
            main_dim=16, dgcnn_k=5, use_pallas=False, pc_npts=NPTS)


@pytest.mark.slow
def test_resume_continues_training(tmp_path):
    root = str(tmp_path)
    train_dir, test_dir = make_synthetic_blocks(
        root, n_train_blocks=40, n_test_blocks=13, points_per_block=1500,
        seed=6)
    basis_path = os.path.join(root, "basis.pkl")
    with open(basis_path, "wb") as f:
        pickle.dump(np.random.default_rng(0).standard_normal(
            (10, 24)).astype(np.float32), f)

    model_cfg = ModelConfig(**TINY)
    data_cfg = DataConfig(dataset="s3dis", cvfold=0, data_path=train_dir,
                          testing_data_path=test_dir, pc_npts=NPTS, k_shot=2)
    save1 = os.path.join(root, "run1")
    cfg1 = TrainConfig(batch_size=8, epochs=2, eval_interval=2,
                       coding_interval=2, basis_path=basis_path,
                       save_path=save1, print_freq=1000)
    train_gfs(model_cfg, data_cfg, cfg1, mesh=None, max_steps_per_epoch=2)
    ckpts = [f for f in os.listdir(save1) if f.startswith("train_")
             and f.endswith(".npz")]
    assert ckpts
    ckpt_path = os.path.join(save1, ckpts[0])

    # checkpoint carries optimizer state and step counter
    flat, meta = load_checkpoint(ckpt_path)
    assert any(k.startswith("opt_state/") for k in flat)
    assert int(flat["step"]) > 0
    assert meta["epoch"] == 1

    # resume into epochs 2..3
    save2 = os.path.join(root, "run2")
    cfg2 = replace(cfg1, start_epoch=2, epochs=4, save_path=save2,
                   model_checkpoint_path=ckpt_path)
    out = train_gfs(model_cfg, data_cfg, cfg2, mesh=None,
                    max_steps_per_epoch=2)
    assert out["history"], "resumed run should evaluate"

    # misaligned resume: start_epoch=3 is NOT a multiple of
    # coding_interval=2 — the coding must still be computed on the first
    # loop iteration so validation has one (regression for the round-1
    # NameError; the reference shares the aligned-only flaw)
    save3 = os.path.join(root, "run3")
    cfg3 = replace(cfg1, start_epoch=3, epochs=4, save_path=save3,
                   model_checkpoint_path=ckpt_path)
    out = train_gfs(model_cfg, data_cfg, cfg3, mesh=None,
                    max_steps_per_epoch=2)
    assert out["history"], "misaligned resume should evaluate"
