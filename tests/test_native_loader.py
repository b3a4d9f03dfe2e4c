"""Native C++ block-loader tests: build, semantics vs the numpy sampler,
determinism, pool batching."""
import os

import numpy as np
import pytest

from gfs3dseg_gws_tpu.data import DatasetRegistry, make_synthetic_blocks
from gfs3dseg_gws_tpu.data import native_loader as nl

NPTS = 256


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("native"))
    train_dir, _ = make_synthetic_blocks(root, n_train_blocks=12,
                                         n_test_blocks=2,
                                         points_per_block=1200, seed=5)
    return train_dir


@pytest.fixture(scope="module")
def lib_ok():
    if not nl.build():
        pytest.skip("toolchain unavailable")
    assert nl.is_available()
    return True


class TestSampleOne:
    def test_attribs_and_labels(self, synth, lib_ok):
        reg = DatasetRegistry("s3dis", 0, synth)
        classes = sorted(reg.train_classes)
        name = os.listdir(os.path.join(synth, "data"))[0][:-4]
        path = os.path.join(synth, "data", f"{name}.npy")
        pts, lbl, seg = nl.sample_one(path, classes, NPTS,
                                      label_mode=nl.LABEL_LEARNING_ORDER,
                                      seed=7)
        assert pts.shape == (NPTS, 9)
        # same attribute invariants as the numpy sampler
        assert pts[:, :3].min() >= -1e-5
        assert 0 <= pts[:, 3:6].min() and pts[:, 3:6].max() <= 1
        np.testing.assert_allclose(pts[:, 6:9].min(0), 0, atol=1e-6)
        np.testing.assert_allclose(pts[:, 6:9].max(0), 1, atol=1e-6)
        assert lbl.min() >= 0 and lbl.max() <= len(classes)

        # labels consistent with the raw block content
        raw = np.load(path)
        raw_labels = set(int(v) for v in np.unique(raw[:, 6]))
        for v in np.unique(lbl):
            if v == 0:
                continue
            assert classes[v - 1] in raw_labels

    def test_deterministic_per_seed(self, synth, lib_ok):
        reg = DatasetRegistry("s3dis", 0, synth)
        classes = sorted(reg.train_classes)
        name = os.listdir(os.path.join(synth, "data"))[0][:-4]
        path = os.path.join(synth, "data", f"{name}.npy")
        a = nl.sample_one(path, classes, NPTS, seed=3)
        b = nl.sample_one(path, classes, NPTS, seed=3)
        c = nl.sample_one(path, classes, NPTS, seed=4)
        np.testing.assert_array_equal(a[0], b[0])
        assert not np.array_equal(a[0], c[0])

    def test_binary_mask_mode(self, synth, lib_ok):
        reg = DatasetRegistry("s3dis", 0, synth)
        cls = next(c for c in range(13) if reg.class2scans[c])
        name = reg.class2scans[cls][0]
        path = os.path.join(synth, "data", f"{name}.npy")
        pts, lbl, _ = nl.sample_one(path, [cls], NPTS,
                                    label_mode=nl.LABEL_BINARY, coverage=True,
                                    target_class=cls, seed=1)
        assert set(np.unique(lbl)) <= {0, 1}
        assert lbl.sum() > 0

    def test_augmentation_preserves_z(self, synth, lib_ok):
        reg = DatasetRegistry("s3dis", 0, synth)
        classes = sorted(reg.train_classes)
        name = os.listdir(os.path.join(synth, "data"))[0][:-4]
        path = os.path.join(synth, "data", f"{name}.npy")
        plain = nl.sample_one(path, classes, NPTS, seed=3)[0]
        rot = nl.sample_one(path, classes, NPTS, augment=True,
                            aug_config={"rot": 1}, seed=3)[0]
        # pure z-rotation: xy radii of the (identically sampled) points match
        r1 = np.sort(np.linalg.norm(plain[:, :2] - plain[:, :2].mean(0),
                                    axis=1))
        assert rot.shape == plain.shape
        assert not np.allclose(plain[:, :2], rot[:, :2])


class TestPool:
    def test_batches_cover_dataset(self, synth, lib_ok):
        reg = DatasetRegistry("s3dis", 0, synth)
        classes = sorted(reg.train_classes)
        names = sorted(n[:-4] for n in os.listdir(os.path.join(synth,
                                                               "data")))
        pool = nl.NativeBatchPool(synth, names, classes, NPTS, batch_size=5,
                                  seed=1, shuffle=True, n_threads=3)
        batches = list(pool)
        assert len(pool) == (len(names) + 4) // 5
        assert sum(v for *_, v in batches) == len(names)
        for pts, lbl, seg, valid in batches:
            assert pts.shape == (5, NPTS, 9)
            assert np.isfinite(pts).all()
        pool.close()

    def test_pool_deterministic(self, synth, lib_ok):
        reg = DatasetRegistry("s3dis", 0, synth)
        classes = sorted(reg.train_classes)
        names = sorted(n[:-4] for n in os.listdir(os.path.join(synth,
                                                               "data")))

        def collect(seed):
            pool = nl.NativeBatchPool(synth, names, classes, NPTS,
                                      batch_size=4, seed=seed, shuffle=True)
            out = [b[0].copy() for b in pool]
            pool.close()
            return out

        a, b, c = collect(9), collect(9), collect(10)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
        assert not np.array_equal(a[0], c[0])


    def test_corrupt_block_raises_not_zero_fills(self, synth, lib_ok,
                                                 tmp_path):
        """A truncated/corrupt .npy must surface as an error (like the
        Python path's np.load), never as silent zero-filled rows counted
        in `valid` (advisor r3); the pool must also shut down cleanly
        (the poison path exercises the epoch-end close/join)."""
        import shutil

        reg = DatasetRegistry("s3dis", 0, synth)
        classes = sorted(reg.train_classes)
        data_dir = os.path.join(str(tmp_path), "data")
        shutil.copytree(os.path.join(synth, "data"), data_dir)
        names = sorted(n[:-4] for n in os.listdir(data_dir))
        # truncate one block mid-payload
        bad = os.path.join(data_dir, f"{names[2]}.npy")
        with open(bad, "rb") as f:
            head = f.read(200)
        with open(bad, "wb") as f:
            f.write(head)

        pool = nl.NativeBatchPool(str(tmp_path), names, classes, NPTS,
                                  batch_size=4, seed=1, n_threads=2)
        with pytest.raises(RuntimeError, match="corrupt"):
            for _ in pool:
                pass
        pool.close()  # must not hang on the poisoned workers

    def test_pool_close_after_partial_consumption(self, synth, lib_ok):
        """Breaking out of the iterator early (max_steps_per_epoch) then
        closing must join workers promptly — the lost-wakeup regression
        (advisor r3) hung exactly here when batches backed up against
        max_inflight."""
        import threading

        reg = DatasetRegistry("s3dis", 0, synth)
        classes = sorted(reg.train_classes)
        names = sorted(n[:-4] for n in os.listdir(os.path.join(synth,
                                                               "data")))
        pool = nl.NativeBatchPool(synth, names, classes, NPTS, batch_size=1,
                                  seed=3, n_threads=3)
        it = iter(pool)
        next(it)  # consume one batch, leave the rest in flight
        done = threading.Event()

        def closer():
            pool.close()
            done.set()

        t = threading.Thread(target=closer)
        t.start()
        t.join(timeout=30)
        assert done.is_set(), "pool.close() hung joining workers"

    def test_pool_is_single_pass(self, synth, lib_ok):
        """Batches are destructively consumed in C++; a second iteration
        used to block forever on batch 0's condition variable — it must
        raise instead (pipelines construct a fresh pool per epoch)."""
        reg = DatasetRegistry("s3dis", 0, synth)
        classes = sorted(reg.train_classes)
        names = sorted(n[:-4] for n in os.listdir(os.path.join(synth,
                                                               "data")))
        pool = nl.NativeBatchPool(synth, names, classes, NPTS, batch_size=4,
                                  seed=2, n_threads=2)
        n = sum(1 for _ in pool)
        assert n == len(pool)
        with pytest.raises(RuntimeError, match="single-pass"):
            next(iter(pool))
        pool.close()
