"""Unit tests for core ops against plain-numpy references.

The numpy oracles re-derive the semantics documented from the reference
(model/dgcnn.py knn, train.py post_processing_hard_coding, runs/eval.py
metric, get_basis.py compute_svd, pretrain/models/mpti.py label_propagate)
rather than porting its code.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfs3dseg_gws_tpu.ops import (
    confusion_matrix,
    energy_multihot,
    farthest_point_sampling,
    gather_neighbors,
    iou_from_confusion,
    kmeans,
    knn_indices,
    label_propagate,
    pairwise_sq_dists,
    svd_energy_reconstruct,
)
from gfs3dseg_gws_tpu.ops.knn import _knn_pallas, _knn_xla
from gfs3dseg_gws_tpu.ops.linalg import local_constrained_affinity
from gfs3dseg_gws_tpu.ops.metrics import gfs_miou


def _np_knn(x, k):
    """Oracle: exact k nearest by squared L2, self included."""
    d = ((x[:, :, None, :] - x[:, None, :, :]) ** 2).sum(-1)  # (B,N,N)
    return np.argsort(d, axis=-1, kind="stable")[..., :k]


class TestKnn:
    def test_matches_numpy(self, rng):
        x = rng.standard_normal((2, 64, 9)).astype(np.float32)
        idx = np.asarray(knn_indices(jnp.asarray(x), k=5, use_pallas=False))
        ref = _np_knn(x, 5)
        # distances must match even if tie order differs
        for b in range(2):
            for n in range(64):
                d = ((x[b] - x[b, n]) ** 2).sum(-1)
                # the matmul expansion (|x|^2 - 2xy + |y|^2) differs from the
                # direct form by ~1e-4 relative, so near-ties may swap
                np.testing.assert_allclose(
                    np.sort(d[idx[b, n]]), np.sort(d[ref[b, n]]), rtol=1e-3,
                    atol=1e-3)

    def test_self_is_first(self, rng):
        x = rng.standard_normal((1, 32, 3)).astype(np.float32)
        idx = np.asarray(knn_indices(jnp.asarray(x), k=4, use_pallas=False))
        np.testing.assert_array_equal(idx[0, :, 0], np.arange(32))

    def test_pallas_interpret_matches_xla(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 128, 16)).astype(np.float32))
        ref = _knn_xla(x, 8)
        # run the Pallas kernel in interpreter mode on CPU
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            got = _knn_pallas(x, 8, tile_q=64)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestGather:
    def test_gather_neighbors(self, rng):
        x = rng.standard_normal((2, 16, 4)).astype(np.float32)
        idx = rng.integers(0, 16, size=(2, 16, 3)).astype(np.int32)
        got = np.asarray(gather_neighbors(jnp.asarray(x), jnp.asarray(idx)))
        for b in range(2):
            for n in range(16):
                np.testing.assert_array_equal(got[b, n], x[b, idx[b, n]])


class TestEnergyMultihot:
    @staticmethod
    def _oracle(coding, energy):
        """Literal re-derivation of the sequential pruning rule."""
        order = np.argsort(-coding, kind="stable")
        total = coding.sum()
        acc = 0.0
        mask = np.zeros_like(coding)
        for i in order:
            acc += coding[i]
            mask[i] = 1.0
            if acc > energy * total:
                break
        return mask

    @pytest.mark.parametrize("energy", [0.5, 0.9, 0.95, 1.0])
    def test_matches_sequential(self, rng, energy):
        for _ in range(20):
            coding = rng.random(37).astype(np.float64)
            got = np.asarray(energy_multihot(jnp.asarray(coding), energy))
            np.testing.assert_array_equal(got, self._oracle(coding, energy))

    def test_batched(self, rng):
        codings = rng.random((5, 23))
        got = np.asarray(energy_multihot(jnp.asarray(codings), 0.9))
        for i in range(5):
            np.testing.assert_array_equal(got[i], self._oracle(codings[i], 0.9))

    def test_uniform_keeps_energy_fraction(self):
        coding = np.ones(100)
        got = np.asarray(energy_multihot(jnp.asarray(coding), 0.9))
        assert got.sum() == 91  # element crossing the threshold is kept


class TestMetrics:
    def test_confusion_matrix(self, rng):
        gt = rng.integers(0, 7, size=(4, 100))
        pred = rng.integers(0, 7, size=(4, 100))
        cm = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(gt), 7))
        ref = np.zeros((7, 7))
        for g, p in zip(gt.ravel(), pred.ravel()):
            ref[g, p] += 1
        np.testing.assert_array_equal(cm, ref)

    def test_gfs_miou_matches_pointwise_loop(self, rng):
        # 13-class S3DIS-like setup: learning order = base sorted + novel
        base = [0, 1, 2, 6, 8, 10, 12]
        novel = [3, 4, 5, 7, 9, 11]
        order = base + novel
        n_cls = 13
        gt = rng.integers(0, n_cls, size=(8, 256))
        pred = rng.integers(0, n_cls, size=(8, 256))

        # oracle: literal per-point loop in class-name space
        gt_c = np.zeros(n_cls)
        pos_c = np.zeros(n_cls)
        tp_c = np.zeros(n_cls)
        for g, p in zip(gt.ravel(), pred.ravel()):
            gt_c[order[g]] += 1
            pos_c[order[p]] += 1
            tp_c[order[g]] += int(g == p)
        iou_ref = tp_c / (gt_c + pos_c - tp_c)
        base_ref = np.mean([iou_ref[c] for c in range(n_cls) if c not in novel])
        novel_ref = np.mean([iou_ref[c] for c in novel])

        cm = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(gt),
                                         n_cls))
        mean_iou, base_iou, novel_iou, hm, iou_list = gfs_miou(cm, order, novel)
        np.testing.assert_allclose(iou_list, iou_ref, rtol=1e-9)
        np.testing.assert_allclose(base_iou, base_ref, rtol=1e-9)
        np.testing.assert_allclose(novel_iou, novel_ref, rtol=1e-9)
        np.testing.assert_allclose(
            hm, 2 * base_ref * novel_ref / (base_ref + novel_ref), rtol=1e-9)

    def test_iou_never_seen_class_strict_raises_safe_zeroes(self):
        """A class absent from both gt and pred has a zero IoU denominator:
        strict mode must raise (matching the reference per-point loop's
        ZeroDivisionError, runs/eval.py:57), safe mode must yield 0."""
        cm = np.zeros((3, 3))
        cm[0, 0] = 5
        cm[1, 1] = 3
        cm[1, 0] = 2  # class 2 never appears anywhere
        with pytest.raises(FloatingPointError):
            iou_from_confusion(cm)
        safe = iou_from_confusion(cm, safe=True)
        np.testing.assert_allclose(safe, [5 / 7, 3 / 5, 0.0])


class TestFPS:
    def test_first_index_and_spread(self, rng):
        x = rng.standard_normal((100, 3)).astype(np.float32)
        idx = np.asarray(farthest_point_sampling(jnp.asarray(x), 10))
        assert idx[0] == 0
        assert len(set(idx.tolist())) == 10
        # oracle: greedy farthest point
        sel = [0]
        mind = ((x - x[0]) ** 2).sum(-1)
        for _ in range(9):
            nxt = int(np.argmax(mind))
            sel.append(nxt)
            mind = np.minimum(mind, ((x - x[nxt]) ** 2).sum(-1))
        np.testing.assert_array_equal(idx, sel)

    def test_valid_mask(self, rng):
        x = rng.standard_normal((50, 3)).astype(np.float32)
        mask = np.zeros(50, dtype=bool)
        mask[10:30] = True
        idx = np.asarray(farthest_point_sampling(jnp.asarray(x), 5,
                                                 jnp.asarray(mask)))
        assert all(10 <= i < 30 for i in idx)


class TestKmeans:
    def test_separable_clusters(self, rng):
        centers = np.array([[0, 0], [10, 10], [-10, 10]], dtype=np.float32)
        x = np.concatenate([
            centers[i] + 0.1 * rng.standard_normal((50, 2)).astype(np.float32)
            for i in range(3)])
        got_centers, labels = kmeans(x, 3, n_iters=20, seed=0)
        # every true cluster maps to one distinct k-means cluster
        assert len(set(labels[:50])) == 1
        assert len(set(labels[50:100])) == 1
        assert len(set(labels[100:])) == 1
        assert len({labels[0], labels[50], labels[100]}) == 3
        d = ((got_centers[:, None, :] - centers[None]) ** 2).sum(-1)
        assert (d.min(axis=1) < 0.1).all()


class TestSvd:
    def test_energy_reconstruct(self, rng):
        protos = rng.standard_normal((30, 16)).astype(np.float64)
        basis = svd_energy_reconstruct(protos, energy=0.95)
        assert basis.shape == (30, 16)
        # oracle: sequential loop
        u, s, vh = np.linalg.svd(protos.T, full_matrices=False)
        for i in range(len(s)):
            if np.sum(s[: i + 1]) > 0.95 * np.sum(s):
                break
        ref = (u[:, : i + 1] @ np.diag(s[: i + 1]) @ vh[: i + 1, :]).T
        np.testing.assert_allclose(basis, ref, rtol=1e-4, atol=1e-5)

    def test_full_energy_is_identity(self, rng):
        protos = rng.standard_normal((10, 8))
        basis = svd_energy_reconstruct(protos, energy=0.999999)
        np.testing.assert_allclose(basis, protos, rtol=1e-4, atol=1e-5)


class TestLabelPropagation:
    def test_against_explicit_inverse(self, rng):
        m, c = 40, 4
        feats = rng.standard_normal((m, 8)).astype(np.float32)
        a = np.asarray(local_constrained_affinity(jnp.asarray(feats), k=10))
        assert np.allclose(a, a.T)
        assert np.allclose(np.diag(a), 0)
        y = np.zeros((m, c), dtype=np.float32)
        y[np.arange(10), rng.integers(0, c, 10)] = 1
        z = np.asarray(label_propagate(jnp.asarray(a), jnp.asarray(y)))
        # oracle with explicit inverse
        eps = np.finfo(np.float64).eps
        d = a.sum(1)
        dmh = np.diag(1.0 / np.sqrt(d + eps))
        s = dmh @ a @ dmh
        ref = np.linalg.inv(np.eye(m) - 0.99 * s + eps) @ y
        np.testing.assert_allclose(z, ref, rtol=1e-3, atol=1e-4)


class TestKnnWithStats:
    """knn_with_stats: indices match knn_indices; cnt/scb match the exact
    XLA computation (kernel validated via Pallas interpret mode on CPU)."""

    def test_stats_fallback_and_kernel_agree(self):
        from jax.experimental.pallas import tpu as pltpu

        from gfs3dseg_gws_tpu.ops.knn import (
            _knn_stats_pallas,
            _knn_xla,
            neighbor_stats_xla,
        )

        b, n, c, k = 2, 256, 8, 5
        x = jax.random.normal(jax.random.PRNGKey(0), (b, n, c))
        btab = jax.random.normal(jax.random.PRNGKey(1), (b, n, c))
        idx = _knn_xla(x, k)
        cnt_x, scb_x = neighbor_stats_xla(idx, btab)
        assert float(cnt_x.sum()) == b * n * k
        with pltpu.force_tpu_interpret_mode():
            idx_p, cnt_p, scb_p = _knn_stats_pallas(x, btab, k, tile_q=128)
        # packed-key extraction may swap exact ties only; on random data
        # the indices agree outright
        np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx))
        np.testing.assert_allclose(np.asarray(cnt_p), np.asarray(cnt_x),
                                   atol=0)
        np.testing.assert_allclose(np.asarray(scb_p), np.asarray(scb_x),
                                   rtol=1e-5, atol=1e-5)
