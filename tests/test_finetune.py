"""FineTune baseline + few-shot encoder warm-start coverage."""
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfs3dseg_gws_tpu.data import make_synthetic_blocks
from gfs3dseg_gws_tpu.pipelines.baselines import (
    FewShotConfig,
    FewShotLearner,
    finetune,
)
from gfs3dseg_gws_tpu.utils.config import DataConfig, ModelConfig

NPTS = 96
TINY = dict(edgeconv_widths=((8, 8), (8, 8), (8, 8)),
            dgcnn_mlp_widths=(16, 16), base_widths=(8, 8), output_dim=8,
            dgcnn_k=5, use_pallas=False, pc_npts=NPTS)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ft"))
    train_dir, _ = make_synthetic_blocks(root, n_train_blocks=40,
                                         n_test_blocks=4,
                                         points_per_block=1500, seed=14)
    return root, train_dir


def _pretrain_ckpt(tmp_path, model_cfg, data_cfg):
    """Minimal encoder checkpoint in our npz format."""
    from gfs3dseg_gws_tpu.models.dgcnnseg import DGCNNSeg
    from gfs3dseg_gws_tpu.utils.checkpoint import save_checkpoint

    model = DGCNNSeg(num_classes=8, edgeconv_widths=model_cfg.edgeconv_widths,
                     mlp_widths=model_cfg.dgcnn_mlp_widths,
                     k=model_cfg.dgcnn_k, use_pallas=False)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros((1, NPTS, 9)), True)
    path = os.path.join(str(tmp_path), "pre.npz")
    save_checkpoint(path, {"params": variables["params"],
                           "batch_stats": variables["batch_stats"]})
    return path


@pytest.mark.slow
def test_finetune_runs(synth, tmp_path):
    root, train_dir = synth
    model_cfg = ModelConfig(**TINY)
    data_cfg = DataConfig(dataset="s3dis", cvfold=0, data_path=train_dir,
                          pc_npts=NPTS, k_shot=2)
    fs_cfg = FewShotConfig(n_way=2, k_shot=2, n_episode_test=1,
                           log_dir=str(tmp_path / "ft"))
    ckpt = _pretrain_ckpt(tmp_path, model_cfg, data_cfg)
    miou = finetune(model_cfg, data_cfg, fs_cfg,
                    pretrain_checkpoint_path=ckpt, inner_iters=3,
                    max_episodes=2, bank_episodes=1)
    assert np.isfinite(miou)


def test_fewshot_learner_encoder_warmstart(synth, tmp_path):
    root, train_dir = synth
    model_cfg = ModelConfig(**TINY)
    data_cfg = DataConfig(dataset="s3dis", cvfold=0, data_path=train_dir,
                          pc_npts=NPTS, k_shot=2)
    fs_cfg = FewShotConfig(n_way=2, k_shot=2)
    ckpt = _pretrain_ckpt(tmp_path, model_cfg, data_cfg)

    cold = FewShotLearner("proto", model_cfg, data_cfg, fs_cfg)
    warm = FewShotLearner("proto", model_cfg, data_cfg, fs_cfg,
                          pretrain_checkpoint_path=ckpt)
    from gfs3dseg_gws_tpu.utils.checkpoint import load_checkpoint

    flat, _ = load_checkpoint(ckpt)
    loaded = flat["params/encoder/edgeconv0/layer0_kernel"]
    got = np.asarray(
        warm.params["feat"]["encoder"]["edgeconv0"]["layer0_kernel"])
    np.testing.assert_allclose(got, loaded, rtol=1e-6)
    # cold init differs from the checkpoint (different PRNG stream)
    cold_k = np.asarray(
        cold.params["feat"]["encoder"]["edgeconv0"]["layer0_kernel"])
    assert not np.allclose(cold_k, loaded)
