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


class TestNativePack:
    """bl_pack must be byte-identical to pack_batch's numpy path (it IS the
    pack_batch hot path on hosts with the library built)."""

    def _numpy_pack(self, monkeypatch, pts, lbl):
        from gfs3dseg_gws_tpu.parallel.steps import pack_batch
        monkeypatch.setenv("GFS3D_NO_NATIVE", "1")
        return pack_batch(pts, lbl)

    def test_byte_identical_to_numpy(self, lib_ok, monkeypatch):
        assert nl.pack_available()
        rng = np.random.default_rng(7)
        pts = rng.uniform(-40, 40, (3, 5, 257, 9)).astype(np.float32)
        pts[..., 3:6] = rng.uniform(0, 1, (3, 5, 257, 3))
        # f16 rounding stress: exact halfway mantissa patterns + subnormals
        pts[0, 0, :10, 0] = np.float32(
            [0.0, -0.0, 2.0 ** -25, -(2.0 ** -25), 2.0 ** -24,
             3 * 2.0 ** -26, 1e-7, 2048.5, 2049.5, 65504.0])
        # rgb rint half-to-even cases (v*255 landing exactly on .5)
        pts[0, 0, :4, 4] = np.float32([0.5 / 255, 1.5 / 255, 2.5 / 255,
                                       254.5 / 255])
        lbl = rng.integers(0, 256, (3, 5, 257)).astype(np.int32)
        from gfs3dseg_gws_tpu.parallel.steps import pack_batch
        got = pack_batch(pts, lbl)
        want = self._numpy_pack(monkeypatch, pts, lbl)
        assert got.dtype == np.uint8 and got.shape == want.shape
        np.testing.assert_array_equal(got, want)

    def test_no_labels_and_noncontiguous(self, lib_ok, monkeypatch):
        rng = np.random.default_rng(8)
        base = rng.uniform(0, 5, (4, 300, 18)).astype(np.float32)
        pts = base[:, :, ::2]                      # non-contiguous view
        from gfs3dseg_gws_tpu.parallel.steps import pack_batch
        got = pack_batch(pts)
        want = self._numpy_pack(monkeypatch, pts, None)
        np.testing.assert_array_equal(got, want)

    def test_guard_errors_match_numpy(self, lib_ok):
        from gfs3dseg_gws_tpu.parallel.steps import pack_batch
        pts = np.zeros((2, 64, 9), np.float32)
        pts[0, 0, 0] = 1e30                        # finite -> f16 inf
        with pytest.raises(ValueError, match="overflow float16"):
            pack_batch(pts, np.zeros((2, 64), np.int32))
        pts2 = np.zeros((2, 64, 9), np.float32)
        bad = np.zeros((2, 64), np.int32)
        bad[1, 3] = -1
        with pytest.raises(ValueError, match="outside the u8 range"):
            pack_batch(pts2, bad)
        # input already inf: NO overflow raise (matches the numpy guard,
        # which only fires when every input coordinate was finite)
        pts3 = np.zeros((2, 64, 9), np.float32)
        pts3[0, 0, 0] = np.inf
        pts3[0, 1, 1] = 1e30
        buf = pack_batch(pts3, np.zeros((2, 64), np.int32))
        assert buf.shape == (2, 64, 10)

    def test_f64_input_uses_numpy_path(self, lib_ok, monkeypatch):
        # f64 -> f16 must round ONCE; the native encoder is f32-only, so
        # pack_batch must not route doubles through it
        pts = np.zeros((1, 32, 9), np.float64)
        # a value that rounds differently under f64->f32->f16 double
        # rounding: 2048.2500000001 -> f32 2048.25 -> f16 2048 (ties-even),
        # but f64->f16 direct rounds up to 2049... construct via nextafter
        pts[0, :, 0] = np.nextafter(np.float64(2048.5), np.float64(0))
        from gfs3dseg_gws_tpu.parallel.steps import pack_batch
        got = pack_batch(pts)
        want = self._numpy_pack(monkeypatch, pts, None)
        np.testing.assert_array_equal(got, want)
