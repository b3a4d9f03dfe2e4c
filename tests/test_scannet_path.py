"""ScanNet-specific behaviour: 21 classes, fold splits, metric skips class 0."""
import os

import numpy as np
import pytest

from gfs3dseg_gws_tpu.data import DatasetRegistry, make_synthetic_blocks
from gfs3dseg_gws_tpu.data.registry import SCANNET_CLASSNAMES
from gfs3dseg_gws_tpu.ops.metrics import confusion_matrix, gfs_miou
from gfs3dseg_gws_tpu.pipelines.gfs import build_setup, init_variables
from gfs3dseg_gws_tpu.utils.config import DataConfig, ModelConfig, TrainConfig

import jax.numpy as jnp


@pytest.fixture(scope="module")
def scannet_synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scannet"))
    train_dir, test_dir = make_synthetic_blocks(
        root, dataset="scannet", n_train_blocks=50, n_test_blocks=6,
        points_per_block=1500, n_classes=21,
        classnames=SCANNET_CLASSNAMES, seed=7)
    return root, train_dir, test_dir


class TestScanNetRegistry:
    def test_fold0_split(self, scannet_synth):
        _, train_dir, _ = scannet_synth
        reg = DatasetRegistry("scannet", 0, train_dir)
        assert reg.classes == 21
        novel_names = {reg.class2type[c] for c in reg.test_classes}
        assert novel_names == {"sink", "toilet", "bathtub", "shower curtain",
                               "picture", "counter"}
        assert len(reg.train_classes) == 15
        # class 0 (unannotated) stays in the base split for fold 0
        assert 0 in reg.train_classes

    def test_fold1_split(self, scannet_synth):
        _, train_dir, _ = scannet_synth
        reg = DatasetRegistry("scannet", 1, train_dir)
        assert len(reg.test_classes) == 15
        assert 0 in reg.test_classes


class TestScanNetMetric:
    def test_class0_skipped(self, rng):
        n_cls = 21
        base = sorted(set(range(21)) - {9, 11, 10, 16, 18, 13})
        novel = [9, 10, 11, 13, 16, 18]
        order = base + novel
        gt = rng.integers(0, n_cls, (4, 128))
        pred = rng.integers(0, n_cls, (4, 128))
        cm = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(gt),
                                         n_cls))
        mean_iou, base_iou, novel_iou, hm, iou_list = gfs_miou(
            cm, order, novel, scannet=True)
        # iou_list excludes class-name 0; base mean excludes it too
        assert len(iou_list) == 20
        # recompute base mean without class 0 manually
        cm_name = np.zeros_like(cm)
        o = np.asarray(order)
        cm_name[o[:, None], o[None, :]] = cm
        tp = np.diag(cm_name)
        denom = cm_name.sum(0) + cm_name.sum(1) - tp
        iou = tp / denom
        base_ref = np.mean([iou[c] for c in range(1, n_cls)
                            if c not in novel])
        np.testing.assert_allclose(base_iou, base_ref, rtol=1e-6)


class TestScanNetSetup:
    def test_build_setup_21_classes(self, scannet_synth):
        _, train_dir, test_dir = scannet_synth
        model_cfg = ModelConfig(edgeconv_widths=((8, 8),) * 3,
                                dgcnn_mlp_widths=(16, 16), base_widths=(8, 8),
                                output_dim=8, main_dim=16, dgcnn_k=5,
                                use_pallas=False, pc_npts=96)
        data_cfg = DataConfig(dataset="scannet", cvfold=0,
                              data_path=train_dir,
                              testing_data_path=test_dir, total_classes=21,
                              pc_npts=96, k_shot=2)
        train_cfg = TrainConfig(energy=0.95, batch_size=4)
        basis = np.random.default_rng(0).standard_normal(
            (12, 24)).astype(np.float32)
        setup = build_setup(model_cfg, data_cfg, train_cfg, basis)
        assert setup.model.classes == 21
        assert setup.model.base_num == 15
        assert len(setup.all_learning_order) == 21
        assert len(setup.supp_datasets) == 5
        variables = init_variables(setup, data_cfg)
        assert variables["params"]["main_proto"].shape == (21, 16)
