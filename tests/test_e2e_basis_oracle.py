"""END-TO-END `get_basis` equivalence vs the reference's own driver.

`TestBasisOracle` (test_reference_oracle.py) pins Kmean2Proto + compute_svd
on identical cluster assignments; this test closes the remaining gap: our
k-means (MXU Lloyd, k-means++ with our RNG — a different stream than
sklearn's by construction) must yield a basis that is DOWNSTREAM-EQUIVALENT,
not bit-identical. It runs both full drivers on identical blocks and the
same converted encoder checkpoint:

  reference: get_basis.py::Get_GlobalProto_GlobalKmeans (get_basis.py:
    112-222) — its own loader, DGCNNSeg feature extraction, sklearn
    KMeans(k-means++), Kmean2Proto, compute_svd — in-process on CPU torch.
  ours:      pipelines.basis.extract_basis — same chain through JAX.

Asserts, in order of increasing composition:
  1. the pooled per-class feature matrices agree (the collection stage is
     deterministic and stage-pinned; this isolates k-means as the only
     divergent stage);
  2. k-means INERTIA agrees within a few % (the clusterings are equally
     good, though the centers differ by RNG);
  3. evaluating ONE GFS checkpoint with each basis (coding re-estimated
     per basis — the reference's recompute path, train.py:466-472) yields
     GFS metrics within a band.

Mutation evidence (measured on this setup, recorded below in the test):
swapping our basis for an iid Gaussian one with matched shape/scale moves
the aggregate metrics far outside the band, so the downstream check is
sensitive to basis quality — it does not pass vacuously.
"""
import importlib.util
import os
import pickle
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from gfs3dseg_gws_tpu.data import make_synthetic_blocks
from gfs3dseg_gws_tpu.models.dgcnnseg import DGCNNSeg
from gfs3dseg_gws_tpu.pipelines import basis as basis_mod
from gfs3dseg_gws_tpu.pipelines.gfs import evaluate_gfs, train_gfs
from gfs3dseg_gws_tpu.parallel.steps import jit_init
from gfs3dseg_gws_tpu.utils.checkpoint import (save_torch_gfs_checkpoint,
                                               save_torch_pretrain_checkpoint)
from gfs3dseg_gws_tpu.utils.config import DataConfig, ModelConfig, TrainConfig

REFERENCE_ROOT = "/root/reference"

NPTS = 384               # == exact synthetic block size (see _exact_blocks)
NUM_CNT = 16
K_SHOT = 2
BATCH = 8
N_CLS = 13
N_BASE = 7
EDGE_WIDTHS = ((32, 32), (32, 32), (32, 32))
MLP_WIDTHS = (64, 64)
BASE_WIDTHS = (64, 32)
OUTPUT_DIM = 32
MAIN_DIM = 64
FEAT_DIM = 96            # sum of EdgeConv output widths
EVAL_WEIGHT = 1.2
ENERGY = 0.9

pytestmark = pytest.mark.slow


def _import_ref_basis():
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference tree not available")
    from ref_shims import install_transforms3d_stub

    install_transforms3d_stub()
    if not hasattr(np, "int"):
        np.int = int
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_get_basis_e2e", os.path.join(REFERENCE_ROOT, "get_basis.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(REFERENCE_ROOT)
    return mod


def _ref_args(train_dir, ckpt_dir):
    return types.SimpleNamespace(
        dataset="s3dis", cvfold=0, data_path=train_dir,
        pretrain_checkpoint_path=ckpt_dir, n_workers=0, num_cnt=NUM_CNT,
        pc_npts=NPTS, pc_attribs="xyzrgbXYZ", pc_in_dim=9, dgcnn_k=20,
        edgeconv_widths=[list(w) for w in EDGE_WIDTHS],
        dgcnn_mlp_widths=list(MLP_WIDTHS))


def _exact_blocks(train_dir, n_blocks=24, per_class=128, seed=23):
    """Overwrite the train blocks with EXACTLY-NPTS-point blocks (3 classes
    x 128 points). With block size == num_point,
    sample_pointcloud(random_sample=True) draws a PERMUTATION of every block
    (reference loader.py:64-65), so the pooled per-class feature multisets
    are framework-RNG-independent and k-means is isolated as the only
    divergent stage. 128 >= the class2scans threshold max(0.05*N, 100)
    (reference s3dis.py:58-71), so every block class registers."""
    from gfs3dseg_gws_tpu.data.synthetic import _class_signature

    rng = np.random.default_rng(seed)
    data_dir = os.path.join(train_dir, "data")
    for f in os.listdir(data_dir):
        os.remove(os.path.join(data_dir, f))
    for i in range(n_blocks):
        rows = []
        for cls in (i % N_CLS, (i + 1) % N_CLS, (i + 2) % N_CLS):
            color, z_center = _class_signature(cls, N_CLS)
            cxy = rng.uniform(0, 4, size=2)
            xyz = np.stack([
                cxy[0] + 0.35 * rng.standard_normal(per_class),
                cxy[1] + 0.35 * rng.standard_normal(per_class),
                z_center + 0.15 * rng.standard_normal(per_class)], axis=1)
            rgb = np.rint(np.clip(
                color + 20.0 * rng.standard_normal((per_class, 3)), 0, 255))
            lbl = np.full((per_class, 1), cls, np.float64)
            rows.append(np.concatenate([xyz, rgb, lbl], axis=1))
        block = np.concatenate(rows, axis=0)
        block[:, :2] -= block[:, :2].min(axis=0)
        assert block.shape == (NPTS, 7)
        np.save(os.path.join(data_dir, f"Area_train_room_{i}_block_0.npy"),
                block)


def test_basis_swap_downstream_equivalence(tmp_path, monkeypatch):
    monkeypatch.setenv("GFS3D_NO_NATIVE", "1")
    root = str(tmp_path)
    train_dir, test_dir = make_synthetic_blocks(
        root, dataset="s3dis", n_train_blocks=24, n_test_blocks=N_CLS,
        points_per_block=NPTS + NPTS // 2, n_classes=N_CLS, seed=23)
    _exact_blocks(train_dir)

    # ---- shared converted encoder checkpoint (pretrain format)
    model_cfg = ModelConfig(pc_npts=NPTS, edgeconv_widths=EDGE_WIDTHS,
                            dgcnn_mlp_widths=MLP_WIDTHS,
                            base_widths=BASE_WIDTHS, output_dim=OUTPUT_DIM,
                            main_dim=MAIN_DIM, use_pallas=False)
    data_cfg = DataConfig(dataset="s3dis", cvfold=0, data_path=train_dir,
                          testing_data_path=test_dir, pc_npts=NPTS,
                          k_shot=K_SHOT, n_workers=0, total_classes=N_CLS)
    seg = DGCNNSeg(num_classes=N_BASE + 1, edgeconv_widths=EDGE_WIDTHS,
                   mlp_widths=MLP_WIDTHS, k=20, use_pallas=False)
    seg_vars = jit_init(seg, {"params": jax.random.PRNGKey(5),
                              "dropout": jax.random.PRNGKey(5)},
                        jnp.zeros((1, NPTS, 9)), True)
    ckpt_dir = os.path.join(root, "pretrain_ckpt")
    save_torch_pretrain_checkpoint(seg_vars["params"]["encoder"],
                                   seg_vars["batch_stats"]["encoder"],
                                   ckpt_dir)

    # ---- reference driver (records sklearn KMeans input + inertia)
    ref_mod = _import_ref_basis()
    rec = {}
    real_kmeans = ref_mod.KMeans

    class _RecKMeans(real_kmeans):
        def fit(self, X, *a, **k):
            out = super().fit(X, *a, **k)
            rec["X"] = np.asarray(X)
            rec["inertia"] = float(self.inertia_)
            return out

    ref_mod.KMeans = _RecKMeans
    orig_t_cuda = torch.Tensor.cuda
    orig_m_cuda = torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    ref_dir = os.path.join(root, "ref_basis")
    os.makedirs(ref_dir, exist_ok=True)
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        np.random.seed(321)   # sklearn k-means++ draws from the global RNG
        torch.manual_seed(321)
        ref_mod.Get_GlobalProto_GlobalKmeans(_ref_args(train_dir, ckpt_dir),
                                             num_cnt=NUM_CNT,
                                             save_dir=ref_dir)
    finally:
        sys.path.remove(REFERENCE_ROOT)
        torch.Tensor.cuda = orig_t_cuda
        torch.nn.Module.cuda = orig_m_cuda
        ref_mod.KMeans = real_kmeans
    ref_basis_path = os.path.join(
        ref_dir, f"GlobalKmeans_EdgeConv123_cnt={NUM_CNT}_energy=095_"
                 f"SVDReconstruct.pkl")
    with open(ref_basis_path, "rb") as f:
        ref_basis = pickle.load(f)
    assert ref_basis.shape == (NUM_CNT, FEAT_DIM)

    # ---- our driver (records our k-means input + assignment)
    ours_rec = {}
    real_ours = basis_mod.kmeans

    def rec_kmeans(X, num_cnt, **kw):
        centers, labels = real_ours(X, num_cnt, **kw)
        ours_rec["X"] = np.asarray(X)
        ours_rec["centers"] = np.asarray(centers)
        ours_rec["labels"] = np.asarray(labels)
        return centers, labels

    monkeypatch.setattr(basis_mod, "kmeans", rec_kmeans)
    our_dir = os.path.join(root, "our_basis")
    our_basis = basis_mod.extract_basis(
        model_cfg, data_cfg, NUM_CNT, ckpt_dir, our_dir, seed=321,
        batch_size=4)
    assert our_basis.shape == (NUM_CNT, FEAT_DIM)

    # 1) identical pooled feature MULTISETS (row order differs by sampling
    #    permutation) -> k-means is the only divergent stage. Compared via
    #    permutation-invariant statistics: sorted row norms, the mean row,
    #    and the Gram matrix.
    X_ref, X_our = rec["X"], ours_rec["X"]
    assert X_our.shape == X_ref.shape
    np.testing.assert_allclose(np.sort(np.linalg.norm(X_our, axis=1)),
                               np.sort(np.linalg.norm(X_ref, axis=1)),
                               rtol=1e-3, atol=1e-3,
                               err_msg="pooled feature norms diverge")
    np.testing.assert_allclose(X_our.mean(0), X_ref.mean(0), rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(X_our.T @ X_our, X_ref.T @ X_ref, rtol=1e-3,
                               atol=max(1e-3 * float(np.abs(
                                   X_ref.T @ X_ref).max()), 1e-3),
                               err_msg="pooled feature Gram diverges")

    # 2) clustering quality parity: inertia within a few %
    ours_inertia = float(np.sum(
        (ours_rec["X"] - ours_rec["centers"][ours_rec["labels"]]) ** 2))
    rel = abs(ours_inertia - rec["inertia"]) / rec["inertia"]
    assert rel < 0.05, (ours_inertia, rec["inertia"])

    # ---- 3) downstream: evaluate ONE briefly-TRAINED checkpoint with each
    # basis (a random-init model predicts base classes nowhere, making the
    # metrics basis-insensitive — measured: gaussian-basis mutation moved
    # them only 0.018)
    gen = np.random.default_rng(77)
    train_save = os.path.join(root, "gfs_train")
    train_out = train_gfs(
        ModelConfig(pc_npts=NPTS, edgeconv_widths=EDGE_WIDTHS,
                    dgcnn_mlp_widths=MLP_WIDTHS, base_widths=BASE_WIDTHS,
                    output_dim=OUTPUT_DIM, main_dim=MAIN_DIM,
                    use_pallas=False),
        data_cfg,
        TrainConfig(batch_size=BATCH, epochs=20, energy=ENERGY,
                    eval_weight=EVAL_WEIGHT, seed=11, save_path=train_save,
                    basis_path=ref_basis_path, evaluate=False, h2d="exact",
                    print_freq=1000),
        mesh=None)
    state = train_out["state"]
    gfs_ckpt = os.path.join(root, "gfs_model.pth")
    save_torch_gfs_checkpoint(jax.device_get(state.params),
                              jax.device_get(state.batch_stats), gfs_ckpt,
                              epoch=5, max_iou=0.5)

    def eval_with(basis_path, tag):
        save = os.path.join(root, f"eval_{tag}")
        os.makedirs(save, exist_ok=True)
        cfg = TrainConfig(batch_size=BATCH, energy=ENERGY,
                          eval_weight=EVAL_WEIGHT, seed=321, save_path=save,
                          basis_path=basis_path,
                          model_checkpoint_path=gfs_ckpt,
                          only_evaluate=True, h2d="exact")
        out = evaluate_gfs(model_cfg, data_cfg, cfg, mesh=None)
        return (np.array([out["mean_iou"], out["base_iou"],
                          out["novel_iou"], out["hm_iou"]]),
                np.asarray(out["per_class"]))

    our_basis_path = os.path.join(
        our_dir, f"GlobalKmeans_EdgeConv123_cnt={NUM_CNT}_energy=095_"
                 f"SVDReconstruct.pkl")
    m_ref, pc_ref = eval_with(ref_basis_path, "ref")
    m_ours, pc_ours = eval_with(our_basis_path, "ours")
    print(f"\nmetrics with reference basis: {m_ref}"
          f"\nmetrics with our basis:       {m_ours}"
          f"\nper-class |diff| ours-ref:    {np.abs(pc_ours - pc_ref)}")
    # bands calibrated on this setup (2026-08): ours-vs-ref aggregate
    # max|diff| 0.0028 vs gaussian-mutation 0.018 — the aggregate band 0.01
    # sits between them and is the discriminator; per-class IoUs are noisier
    # (ours-vs-ref max 0.035 on 13 small test blocks) so that band is a
    # coarse sanity check only
    np.testing.assert_allclose(m_ours, m_ref, atol=0.01,
                               err_msg="GFS metrics diverge across bases")
    np.testing.assert_allclose(pc_ours, pc_ref, atol=0.06,
                               err_msg="per-class GFS IoU diverges")

    # mutation: an iid Gaussian basis with matched shape/scale must NOT
    # pass the same bands — proves the eval is basis-sensitive
    fake = gen.standard_normal(ref_basis.shape).astype(np.float32)
    fake *= np.linalg.norm(ref_basis) / np.linalg.norm(fake)
    fake_path = os.path.join(root, "fake_basis.pkl")
    with open(fake_path, "wb") as f:
        pickle.dump(fake, f)
    m_fake, pc_fake = eval_with(fake_path, "fake")
    print(f"metrics with gaussian basis:  {m_fake}"
          f"\nper-class |diff| fake-ref:    {np.abs(pc_fake - pc_ref)}")
    assert np.abs(m_fake - m_ref).max() > 0.01, (
        "mutation not detected — the downstream band is vacuous")
