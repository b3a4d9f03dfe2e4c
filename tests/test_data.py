"""Data-layer tests on a hermetic synthetic dataset."""
import os
import pickle

import numpy as np
import pytest

from gfs3dseg_gws_tpu.data import (
    DatasetRegistry,
    PretrainBlockDataset,
    ValSuppDataset,
    augment_pointcloud,
    batch_iterator,
    make_synthetic_blocks,
    sample_pointcloud,
)
from gfs3dseg_gws_tpu.data.datasets import TestingDataset as StaticTestDataset
from gfs3dseg_gws_tpu.data.preprocess import room2blocks, split_rooms_to_blocks
from gfs3dseg_gws_tpu.data.synthetic import make_synthetic_room


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    train_dir, test_dir = make_synthetic_blocks(root, n_train_blocks=40,
                                                n_test_blocks=6, seed=0)
    return root, train_dir, test_dir


class TestRegistry:
    def test_folds_and_class2scans(self, synth):
        root, train_dir, _ = synth
        reg = DatasetRegistry("s3dis", 0, train_dir)
        assert reg.classes == 13
        # fold-0 novel classes by name
        novel_names = {reg.class2type[c] for c in reg.test_classes}
        assert novel_names == {"table", "window", "column", "beam", "board",
                               "sofa"}
        assert len(reg.train_classes) == 7
        # cache written and reused
        assert os.path.exists(os.path.join(train_dir, "class2scans.pkl"))
        reg2 = DatasetRegistry("s3dis", 0, train_dir)
        assert reg2.class2scans == reg.class2scans

    def test_qualification_rule(self, tmp_path):
        # block with 2000 points: class A 150 pts (> max(100, 100)=100 ok),
        # class B 90 pts (fails)
        data_dir = tmp_path / "blocks" / "data"
        data_dir.mkdir(parents=True)
        block = np.zeros((2000, 7))
        block[:150, 6] = 1
        block[150:240, 6] = 2
        np.save(data_dir / "b0.npy", block)
        (tmp_path / "meta").mkdir()
        (tmp_path / "meta" / "s3dis_classnames.txt").write_text(
            "\n".join(f"c{i}" for i in range(13)))
        from gfs3dseg_gws_tpu.data.registry import S3DIS_CLASSNAMES
        reg = DatasetRegistry("s3dis", 0, str(tmp_path / "blocks"),
                              classnames=S3DIS_CLASSNAMES)
        assert reg.class2scans[1] == ["b0"]
        assert reg.class2scans[2] == []
        assert reg.class2scans[0] == ["b0"]  # 1760 zeros qualify


class TestSampler:
    def test_shapes_and_attribs(self, synth):
        _, train_dir, _ = synth
        name = os.listdir(os.path.join(train_dir, "data"))[0][:-4]
        rng = np.random.default_rng(0)
        pc, gt, seg = sample_pointcloud(
            train_dir, 512, "xyzrgbXYZ", False, None, name,
            list(range(13)), random_sample=True, use_all_classes=True, rng=rng)
        assert pc.shape == (512, 9)
        assert gt.shape == (512,)
        # xyz shifted to min 0
        assert np.all(pc[:, :3].min(axis=0) >= -1e-6)
        # rgb in [0,1]
        assert pc[:, 3:6].min() >= 0 and pc[:, 3:6].max() <= 1
        # XYZ normalised to [0,1]
        assert np.allclose(pc[:, 6:9].min(axis=0), 0, atol=1e-6)
        assert np.allclose(pc[:, 6:9].max(axis=0), 1, atol=1e-6)

    def test_support_mask_and_coverage(self, synth):
        _, train_dir, _ = synth
        reg = DatasetRegistry("s3dis", 0, train_dir)
        cls = next(c for c in range(13) if reg.class2scans[c])
        name = reg.class2scans[cls][0]
        rng = np.random.default_rng(1)
        pc, gt, _ = sample_pointcloud(
            train_dir, 512, "xyzrgbXYZ", False, None, name,
            [cls], sampled_class=cls, support=True, rng=rng)
        assert set(np.unique(gt)) <= {0, 1}
        assert gt.sum() > 0  # coverage-aware sampling keeps the class

    def test_augmentation_preserves_shape_and_z_norms(self):
        rng = np.random.default_rng(0)
        xyz = rng.random((100, 3)).astype(np.float32)
        out = augment_pointcloud(xyz, {"scale": 0, "rot": 1, "mirror_prob": 0,
                                       "jitter": 0}, rng)
        # pure z-rotation preserves xy radius and z
        r_in = np.linalg.norm(xyz[:, :2], axis=1)
        r_out = np.linalg.norm(out[:, :2], axis=1)
        np.testing.assert_allclose(r_in, r_out, rtol=1e-5)
        np.testing.assert_allclose(xyz[:, 2], out[:, 2], rtol=1e-6)

    def test_labels_learning_order(self, synth):
        _, train_dir, _ = synth
        reg = DatasetRegistry("s3dis", 0, train_dir)
        classes = sorted(reg.train_classes)
        ds = PretrainBlockDataset(train_dir, classes, {
            c: reg.class2scans[c] for c in classes}, mode="train",
            num_point=256)
        pc, label, _ = ds.__getitem__(0, rng=np.random.default_rng(0))
        assert label.max() <= len(classes)
        assert label.min() >= 0


class TestStaticSets:
    def test_valsupp_materialization(self, synth):
        _, train_dir, _ = synth
        reg = DatasetRegistry("s3dis", 0, train_dir)
        order = sorted(reg.train_classes) + sorted(reg.test_classes)
        ds = ValSuppDataset(train_dir, "s3dis", cvfold=0, k_shot=2,
                            num_point=256, seed=10, learning_order=order,
                            registry=reg)
        assert len(ds) == 2 * len(reg.test_classes)
        pcd, mask, cls = ds[0]
        assert pcd.shape == (256, 9)
        assert set(np.unique(mask)) <= {0.0, 1.0}
        assert cls >= len(reg.train_classes)  # novel -> late learning order
        # re-open: reads the static files, same content
        ds2 = ValSuppDataset(train_dir, "s3dis", cvfold=0, k_shot=2,
                             num_point=256, seed=10, learning_order=order,
                             registry=reg)
        pcd2, mask2, cls2 = ds2[0]
        np.testing.assert_array_equal(pcd, pcd2)
        np.testing.assert_array_equal(mask, mask2)

    def test_testing_dataset(self, synth):
        _, _, test_dir = synth
        reg = DatasetRegistry("s3dis", 0, test_dir)
        all_names = sorted(range(13))
        order = sorted(reg.train_classes) + sorted(reg.test_classes)
        ds = StaticTestDataset(test_dir, all_names, order,
                            {c: reg.class2scans[c] for c in all_names},
                            num_point=256)
        assert len(ds) == len(os.listdir(os.path.join(test_dir, "data")))
        pcd, label, seg = ds[0]
        assert pcd.shape == (256, 9)
        # labels are learning-order ids
        assert label.max() < 13
        # static: same read twice
        pcd2, label2, _ = ds[0]
        np.testing.assert_array_equal(pcd, pcd2)
        np.testing.assert_array_equal(label, label2)

    def test_packed_cache_matches_getitem(self, synth):
        """The memmap fast path (packed_arrays) must reproduce the pickle
        path exactly, including the name->learning-order label remap; and
        eval_batches over it must agree with the generic iterator."""
        _, _, test_dir = synth
        reg = DatasetRegistry("s3dis", 0, test_dir)
        all_names = sorted(range(13))
        order = sorted(reg.train_classes) + sorted(reg.test_classes)
        ds = StaticTestDataset(test_dir, all_names, order,
                               {c: reg.class2scans[c] for c in all_names},
                               num_point=256)
        pcd_mm, lbl_mm, lut = ds.packed_arrays()
        assert pcd_mm.shape == (len(ds), 256, 9)
        for i in (0, len(ds) // 2, len(ds) - 1):
            p, l, _ = ds[i]
            np.testing.assert_array_equal(np.asarray(pcd_mm[i]), p)
            np.testing.assert_array_equal(lut[np.asarray(lbl_mm[i])], l)

        from gfs3dseg_gws_tpu.pipelines.gfs import eval_batches
        fast = list(eval_batches(ds, 4))
        os.environ["GFS3D_NO_PACKED"] = "1"
        try:
            slow = list(eval_batches(ds, 4))
        finally:
            del os.environ["GFS3D_NO_PACKED"]
        assert len(fast) == len(slow)
        for (fp, fl, fv), (sp, sl, sv) in zip(fast, slow):
            assert fv == sv
            np.testing.assert_array_equal(fp[:fv], sp[:fv])
            np.testing.assert_array_equal(fl[:fv], sl[:fv])

    def test_valsupp_partial_dir_fails_loudly(self, tmp_path):
        """A crash mid-materialisation must not leave a silently-reused
        partial support set (prototypes registered for only some novel
        classes) — re-opening a dir with missing shots raises.

        Uses its own tmp_path blocks (NOT the module-scoped `synth` fixture):
        the test deletes a shot from the materialised ValSupp dir, which would
        otherwise leave a permanently broken tree for any later test with the
        same (k_shot, seed)."""
        root = str(tmp_path)
        train_dir, _ = make_synthetic_blocks(root, n_train_blocks=40,
                                             n_test_blocks=2, seed=0)
        reg = DatasetRegistry("s3dis", 0, train_dir)
        order = sorted(reg.train_classes) + sorted(reg.test_classes)
        kw = dict(k_shot=2, num_point=256, seed=30, learning_order=order,
                  registry=reg)
        ds = ValSuppDataset(train_dir, "s3dis", cvfold=0, **kw)
        victim = os.path.join(ds.save_path, "pcd",
                              sorted(os.listdir(
                                  os.path.join(ds.save_path, "pcd")))[0])
        os.remove(victim)
        with pytest.raises(RuntimeError, match="re-materialise"):
            ValSuppDataset(train_dir, "s3dis", cvfold=0, **kw)

    def test_static_test_stale_dir_fails_loudly(self, tmp_path):
        """reference loader.py:471 — a static_test dir that does not match
        the registry's block list (partial materialisation, or blocks added
        since) must not be silently evaluated as if complete."""
        root = str(tmp_path)
        _, test_dir = make_synthetic_blocks(root, n_train_blocks=4,
                                            n_test_blocks=4,
                                            points_per_block=600, seed=11)
        reg = DatasetRegistry("s3dis", 0, test_dir)
        all_names = sorted(range(13))
        order = sorted(reg.train_classes) + sorted(reg.test_classes)
        c2s = {c: reg.class2scans[c] for c in all_names}
        ds = StaticTestDataset(test_dir, all_names, order, c2s,
                               num_point=128)
        victim = os.path.join(ds.save_path, "pcd",
                              os.listdir(os.path.join(ds.save_path,
                                                      "pcd"))[0])
        os.remove(victim)
        with pytest.raises(AssertionError, match="re-materialise"):
            StaticTestDataset(test_dir, all_names, order, c2s,
                              num_point=128)


class TestPipeline:
    def test_batch_iterator_shapes(self, synth):
        _, train_dir, _ = synth
        reg = DatasetRegistry("s3dis", 0, train_dir)
        classes = sorted(reg.train_classes)
        ds = PretrainBlockDataset(train_dir, classes, {
            c: reg.class2scans[c] for c in classes}, num_point=128)
        batches = list(batch_iterator(ds, 8, shuffle=True, drop_last=True,
                                      seed=0))
        assert all(b[0].shape == (8, 128, 9) for b in batches)
        assert all(b[1].shape == (8, 128) for b in batches)

    def test_batch_iterator_deterministic(self, synth):
        _, train_dir, _ = synth
        reg = DatasetRegistry("s3dis", 0, train_dir)
        classes = sorted(reg.train_classes)
        ds = PretrainBlockDataset(train_dir, classes, {
            c: reg.class2scans[c] for c in classes}, num_point=64)
        b1 = list(batch_iterator(ds, 4, shuffle=True, seed=7))
        b2 = list(batch_iterator(ds, 4, shuffle=True, seed=7))
        for x, y in zip(b1, b2):
            np.testing.assert_array_equal(x[0], y[0])
        b3 = list(batch_iterator(ds, 4, shuffle=True, seed=8))
        assert not np.array_equal(b1[0][0], b3[0][0])

    def test_pad_final(self, synth):
        _, train_dir, _ = synth
        reg = DatasetRegistry("s3dis", 0, train_dir)
        classes = sorted(reg.train_classes)
        ds = PretrainBlockDataset(train_dir, classes, {
            c: reg.class2scans[c] for c in classes}, num_point=64)
        n = len(ds)
        bs = 7
        batches = list(batch_iterator(ds, bs, pad_final=True))
        assert all(b[0].shape[0] == bs for b in batches)
        assert sum(int(b[-1]) for b in batches) == n


class TestPreprocess:
    def test_room2blocks(self):
        rng = np.random.default_rng(0)
        room = make_synthetic_room(rng, 6000, present=[0, 1, 2])
        blocks = room2blocks(room, block_size=1.0, stride=1.0, min_npts=50)
        assert len(blocks) >= 1
        total = sum(b.shape[0] for b in blocks)
        assert total > 0
        for b in blocks:
            assert b.shape[1] == room.shape[1]
            shifted = b[:, :2] - (room[:, :2].min(axis=0))
            # blocks restricted to <= 1m span in x and y
            span = b[:, :2].max(axis=0) - b[:, :2].min(axis=0)
            assert (span <= 1.0 + 1e-6).all()

    def test_split_rooms_to_blocks(self, tmp_path):
        rng = np.random.default_rng(0)
        scenes = tmp_path / "scenes" / "train_data"
        scenes.mkdir(parents=True)
        np.save(scenes / "room0.npy", make_synthetic_room(rng, 4000))
        count = split_rooms_to_blocks(str(tmp_path / "scenes"), str(tmp_path),
                                      train=True, min_npts=10)
        out = tmp_path / "blocks_bs1_s1" / "data"
        assert out.exists()
        assert len(list(out.glob("*.npy"))) == count > 0
