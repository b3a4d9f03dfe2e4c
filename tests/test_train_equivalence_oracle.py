"""Cross-framework TRAINING-trajectory equivalence oracle.

Every compute stage and both deterministic driver chains are already pinned
against the reference's own torch code (test_reference_oracle.py,
test_e2e_eval_oracle.py); the one remaining unpinned composition is the
TRAINING LOOP — optimizer/schedule/BatchNorm/coding-re-estimation
interactions over many steps, where exact agreement is impossible by
construction (framework RNG streams differ: torch data-shuffle/dropout vs
jax PRNG; docs/PARITY.md "Oracle coverage boundary"). This test closes it
STATISTICALLY:

  reference: train.py::main(--phase train) (train.py:503-588) — its own
    loaders, Adam param groups (encoder at 0.1x lr, train.py:425-434),
    StepLR, coding re-estimation every 5 epochs (train.py:509-512), epoch
    training (train.py:590-662) and periodic validation (train.py:518-544),
    executed in-process on CPU torch. `load_pretrain_checkpoint` is rebound
    to the reference's own full-model `load_model_checkpoint` so the run
    starts from OUR converted initial weights.
  ours:      pipelines.gfs.train_gfs on the same data dir, same basis, and
    the SAME initial weights (model_checkpoint_path warm start).

Both frameworks train from matched inits, with their own RNG streams, for
EPOCHS epochs x SEEDS seeds, then their own validation chains score the
result. Asserts (calibrated on 4 observation runs, see numbers below):

  1. every run LEARNS: final mean mIoU >= LEARN_FLOOR, and improves on the
     first-eval checkpoint — a flat/broken loop cannot pass;
  2. the frameworks land in the SAME QUALITY BASIN: per metric
     (mean/base/novel mIoU) the across-seed [min, max] bands, padded by the
     larger framework's internal spread + ATOL, overlap.

Calibration (this exact setup, 2026-08): ref finals (mean/base/novel) =
[0.448, 0.597, 0.275] and [0.449, 0.604, 0.268]; ours = [0.416, 0.597,
0.205] and [0.415, 0.561, 0.243]; first evals 0.15-0.23. Within-framework
seed spread is tiny (<0.01 mean), the cross-framework mean gap ~0.03 — the
by-construction RNG-stream deviation, well inside ATOL. Known extra
variance source on the REFERENCE side (diagnosed r5 on the pretrain
oracle): its datasets order blocks via `list(set(...))`, so the ref
trajectory also follows the per-PROCESS string-hash seed — if this test
ever flakes near a band edge across pytest processes, suspect hash order
before suspecting the frameworks (see
test_pretrain_equivalence_oracle.py's split floors for the pattern).

Mutation evidence (measured, single seed 321): zeroing the encoder
learning-rate group (encoder_lr_scale=0 vs the reference's 0.1,
train.py:428) drops our final mean mIoU to 0.281 — below LEARN_FLOOR and
0.167 outside the padded band → both assertions fail; base_lr=0.1 (10x the
reference's) collapses it to 0.147 → fails. So the oracle detects
optimizer-composition divergence — it does not pass vacuously. Boundary:
a coding-energy mutation (0.5 vs 0.9) is NOT detected at this synthetic
scale (finals 0.448/0.586/0.287, inside the band) — the GW coding
threshold is robust on well-separated synthetic blobs; energy semantics
are pinned exactly elsewhere (test_reference_oracle.py coding cases).
"""
import importlib.util
import os
import pickle
import random
import re
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from gfs3dseg_gws_tpu.data import make_synthetic_blocks
from gfs3dseg_gws_tpu.models.capl import GWCAPL
from gfs3dseg_gws_tpu.pipelines.gfs import train_gfs
from gfs3dseg_gws_tpu.utils.checkpoint import (save_checkpoint,
                                               save_torch_gfs_checkpoint)
from gfs3dseg_gws_tpu.utils.config import DataConfig, ModelConfig, TrainConfig

REFERENCE_ROOT = "/root/reference"

NPTS = 128
NUM_GW = 32
K_SHOT = 2
BATCH = 8
EPOCHS = 25
EVAL_WEIGHT = 1.2
ENERGY = 0.9
BASE_LR = 0.01
N_CLS = 13
N_BASE = 7
EDGE_WIDTHS = ((64, 64), (64, 64), (64, 64))
MLP_WIDTHS = (512, 256)
BASE_WIDTHS = (128, 64)
OUTPUT_DIM = 64
FEAT_DIM = 192
SEEDS = (321, 7)

pytestmark = pytest.mark.slow


def _import_ref_train():
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference tree not available")
    from ref_shims import install_transforms3d_stub

    install_transforms3d_stub()
    if not hasattr(np, "int"):
        np.int = int
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_train_equiv", os.path.join(REFERENCE_ROOT, "train.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(REFERENCE_ROOT)
    return mod


def _ref_args(train_dir, test_dir, save_path, basis_path, ckpt_path, seed):
    """The argparse namespace train.py:733-831 would produce for the same
    --phase train invocation our TrainConfig below describes."""
    return types.SimpleNamespace(
        phase="train", dataset="s3dis", cvfold=0,
        data_path=train_dir, testing_data_path=test_dir,
        save_path=save_path, basis_path=basis_path,
        model_checkpoint_path="", pretrain_checkpoint_path=ckpt_path,
        use_pretrain_weight=True, only_evaluate=False, evaluate=True,
        batch_size=BATCH, n_workers=0, k_shot=K_SHOT, pc_npts=NPTS,
        pc_attribs="xyzrgbXYZ", pc_in_dim=9, pc_augm=False,
        pc_augm_scale=0.0, pc_augm_rot=1, pc_augm_mirror_prob=0.0,
        pc_augm_jitter=1, dgcnn_k=20,
        edgeconv_widths=[list(w) for w in EDGE_WIDTHS],
        dgcnn_mlp_widths=list(MLP_WIDTHS), base_widths=list(BASE_WIDTHS),
        output_dim=OUTPUT_DIM, eval_weight=EVAL_WEIGHT, energy=ENERGY,
        total_classes=N_CLS, base_lr=BASE_LR, step_size=50, gamma=0.5,
        epochs=EPOCHS, start_epoch=0, print_freq=1000, seed=seed)


def _parse_ref_history(log_path):
    """(epoch, mean, base, novel) rows from the reference's periodic
    validation lines (train.py:544)."""
    with open(log_path) as f:
        text = f.read()
    rows = re.findall(r"Epoch: (\d+), Final mIoU: ([\d.eE+-]+), BASE: "
                      r"([\d.eE+-]+), NOVEL: ([\d.eE+-]+), hm: ", text)
    assert rows, f"no validation lines in {log_path}"
    return [(int(e), float(m), float(b), float(n)) for e, m, b, n in rows]


def _run_reference(tmp_root, train_dir, test_dir, basis_path, ckpt_path,
                   seed):
    ref_train = _import_ref_train()
    # matched inits: rebind the encoder-only pretrain hook to the
    # reference's OWN full-model loader so --use_pretrain_weight restores
    # the complete converted initial state (encoder + learners + protos)
    ref_train.load_pretrain_checkpoint = (
        lambda model, path: ref_train.load_model_checkpoint(model, path,
                                                            mode="test"))
    save = os.path.join(tmp_root, f"ref_train_s{seed}")
    os.makedirs(save, exist_ok=True)
    orig_t_cuda = torch.Tensor.cuda
    orig_m_cuda = torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        args = _ref_args(train_dir, test_dir, save, basis_path, ckpt_path,
                         seed)
        # replicate the reference __main__ seeding (train.py:825-828)
        torch.manual_seed(seed)
        np.random.seed(seed)
        random.seed(seed)
        ref_train.main(args, basis_path=basis_path)
    finally:
        sys.path.remove(REFERENCE_ROOT)
        torch.Tensor.cuda = orig_t_cuda
        torch.nn.Module.cuda = orig_m_cuda
    return _parse_ref_history(os.path.join(save, "log_train.txt"))


def _run_ours(tmp_root, train_dir, test_dir, basis_path, npz_path, seed,
              encoder_lr_scale=0.1, energy=ENERGY, base_lr=BASE_LR):
    model_cfg = ModelConfig(pc_npts=NPTS, edgeconv_widths=EDGE_WIDTHS,
                            dgcnn_mlp_widths=MLP_WIDTHS,
                            base_widths=BASE_WIDTHS, output_dim=OUTPUT_DIM,
                            use_pallas=False)
    data_cfg = DataConfig(dataset="s3dis", cvfold=0, data_path=train_dir,
                          testing_data_path=test_dir, pc_npts=NPTS,
                          k_shot=K_SHOT, n_workers=0, total_classes=N_CLS)
    save = os.path.join(tmp_root, f"our_train_s{seed}")
    train_cfg = TrainConfig(batch_size=BATCH, base_lr=base_lr,
                            encoder_lr_scale=encoder_lr_scale,
                            epochs=EPOCHS, energy=energy,
                            eval_weight=EVAL_WEIGHT, seed=seed,
                            save_path=save, basis_path=basis_path,
                            model_checkpoint_path=npz_path, h2d="exact",
                            print_freq=1000)
    out = train_gfs(model_cfg, data_cfg, train_cfg, mesh=None)
    return [(h["epoch"], h["mean_iou"], h["base_iou"], h["novel_iou"])
            for h in out["history"]]


def _final(history):
    """Mean of the last two validations — one eval is noisy at this scale."""
    tail = sorted(history)[-2:]
    return np.mean([r[1:] for r in tail], axis=0)  # (mean, base, novel)


def _first(history):
    return np.asarray(sorted(history)[0][1:])


@pytest.fixture(scope="module")
def shared_setup(tmp_path_factory):
    """Synthetic data + basis + matched converted initial weights shared by
    every run (the reference's first run also materialises the ValSupp /
    static_test fixtures all later runs reuse)."""
    root = str(tmp_path_factory.mktemp("train_equiv"))
    train_dir, test_dir = make_synthetic_blocks(
        root, dataset="s3dis", n_train_blocks=36, n_test_blocks=N_CLS,
        points_per_block=NPTS + NPTS // 2, n_classes=N_CLS, seed=19)

    gen = np.random.default_rng(41)
    basis = gen.standard_normal((NUM_GW, FEAT_DIM)).astype(np.float32)
    basis_path = os.path.join(root, "basis.pkl")
    with open(basis_path, "wb") as f:
        pickle.dump(basis, f)

    model = GWCAPL(classes=N_CLS, base_num=N_BASE, num_gw=NUM_GW,
                   main_dim=128, eval_weight=EVAL_WEIGHT,
                   edgeconv_widths=EDGE_WIDTHS, mlp_widths=MLP_WIDTHS,
                   base_widths=BASE_WIDTHS, output_dim=OUTPUT_DIM,
                   k=20, use_pallas=False)
    rng = jax.random.PRNGKey(3)
    variables = model.init(
        {"params": rng, "dropout": rng, "fake": rng},
        jnp.zeros((2, NPTS, 9)), jnp.zeros((2, NPTS), jnp.int32),
        jnp.zeros((NUM_GW, FEAT_DIM)), train=True)

    ckpt_path = os.path.join(root, "init_full.pth")
    save_torch_gfs_checkpoint(variables["params"], variables["batch_stats"],
                              ckpt_path, epoch=0, max_iou=0.0)
    npz_path = os.path.join(root, "init_full.npz")
    save_checkpoint(npz_path, {"params": variables["params"],
                               "batch_stats": variables["batch_stats"]})
    return root, train_dir, test_dir, basis_path, ckpt_path, npz_path


def test_trains_to_the_same_quality_basin(shared_setup, monkeypatch):
    monkeypatch.setenv("GFS3D_NO_NATIVE", "1")  # python loader == reference
                                                # sampling semantics
    root, train_dir, test_dir, basis_path, ckpt_path, npz_path = shared_setup

    ref_runs, our_runs = [], []
    for seed in SEEDS:
        ref_runs.append(_run_reference(root, train_dir, test_dir, basis_path,
                                       ckpt_path, seed))
    for seed in SEEDS:
        our_runs.append(_run_ours(root, train_dir, test_dir, basis_path,
                                  npz_path, seed))

    ref_final = np.stack([_final(h) for h in ref_runs])   # (S, 3)
    our_final = np.stack([_final(h) for h in our_runs])
    ref_first = np.stack([_first(h) for h in ref_runs])
    our_first = np.stack([_first(h) for h in our_runs])
    print(f"\nref first evals:\n{ref_first}\nref finals:\n{ref_final}"
          f"\nour first evals:\n{our_first}\nour finals:\n{our_final}")

    # 1) every run learned (calibration: finals ~0.5-0.65 mean mIoU, first
    #    evals ~0.2-0.4 on this synthetic setup; a broken loop stays < 0.1)
    LEARN_FLOOR = 0.30
    assert ref_final[:, 0].min() >= LEARN_FLOOR, ref_final
    assert our_final[:, 0].min() >= LEARN_FLOOR, our_final
    assert (our_final[:, 0] > our_first[:, 0]).all(), (our_first, our_final)

    # 2) same quality basin: padded across-seed bands overlap per metric
    ATOL = 0.05
    names = ("mean", "base", "novel")
    for j, name in enumerate(names):
        r_lo, r_hi = ref_final[:, j].min(), ref_final[:, j].max()
        o_lo, o_hi = our_final[:, j].min(), our_final[:, j].max()
        pad = max(r_hi - r_lo, o_hi - o_lo) + ATOL
        gap = max(o_lo - r_hi, r_lo - o_hi, 0.0)
        assert gap <= pad, (
            f"{name} mIoU basin diverges: ref [{r_lo:.4f}, {r_hi:.4f}] vs "
            f"ours [{o_lo:.4f}, {o_hi:.4f}] (gap {gap:.4f} > pad {pad:.4f})")
