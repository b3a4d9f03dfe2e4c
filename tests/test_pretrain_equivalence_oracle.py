"""Cross-framework PRETRAIN-trajectory equivalence oracle.

The backbone pre-training loop produces the encoder every downstream stage
consumes (get_basis, GFS train, the episodic baselines), yet until round 5
it was pinned at single-forward parity only (TestPretrainSegOracle). This
closes the loop STATISTICALLY with the same recipe as the GFS trajectory
oracle (test_train_equivalence_oracle.py):

  reference: pretrain/runs/pre_train.py::pretrain (pre_train.py:86-196) —
    its own MyPretrainDataset 90/10 split + DataLoader shuffle, Adam over
    {encoder, segmenter} param groups at one lr (pre_train.py:137-139),
    StepLR, CE loss, periodic full-valid metric_evaluate — executed
    in-process on CPU torch, with its DGCNNSeg monkeypatched to load OUR
    converted initial weights after construction (the reference has no
    warm-start hook of its own).
  ours:      pipelines.pretrain.pretrain on the same data dir with
    init_checkpoint_path pointing at the SAME initial weights.

Both frameworks train from matched inits with their own RNG streams
(torch data-shuffle/per-block sampling vs ours) for EPOCHS epochs x SEEDS
seeds; their own validation chains score the result. Asserts:

  1. every run LEARNS: final valid mIoU >= LEARN_FLOOR and improves on the
     first evaluation — a flat/broken loop cannot pass;
  2. the frameworks land in the SAME QUALITY BASIN: the across-seed
     [min, max] mIoU bands, padded by the larger framework's internal
     spread + ATOL, overlap.

Known benign asymmetry: the reference's valid DataLoader uses
drop_last=True (pre_train.py:122-123) so it scores floor(V/bs)*bs blocks,
while our sweep pads and scores all V (pipelines/pretrain.py); the block
counts below make V divisible by the batch size so both frameworks score
the identical valid set.

Calibration (this exact setup, 2 seeds, 2026-08): ref finals (mIoU)
[0.654, 0.742] in one pytest process and [0.539, 0.737] in another — the
reference's block order is `list(set(...))`
(pretrain/dataloaders/loader.py:399), so its trajectory follows the
per-PROCESS string-hash seed on top of the torch seed; ours = [0.740,
0.807] (first evals ~0.457), reproducible. Mutation evidence (measured,
seed 321, our loop): lr/100 (1e-5) -> final 0.150 and weight_decay
x1000 (0.1) -> final 0.470, both below OUR 0.55 floor (the wd mutation
also failed the band in the tighter-ref-spread process). Sensitivity
boundary, recorded honestly: lr x10 (0.01) still converges to 0.641 at
this synthetic scale and is NOT detected — the loss surface here is
forgiving of a hot learning rate; the GFS trajectory oracle catches
base_lr composition errors on its own setup instead.
"""
import importlib.util
import os
import random
import re
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from gfs3dseg_gws_tpu.data import make_synthetic_blocks
from gfs3dseg_gws_tpu.pipelines.pretrain import pretrain
from gfs3dseg_gws_tpu.utils.checkpoint import (convert_torch_dgcnn_encoder,
                                               convert_torch_segmenter,
                                               save_checkpoint)
from gfs3dseg_gws_tpu.utils.config import (DataConfig, ModelConfig,
                                           PretrainConfig, replace)

REFERENCE_ROOT = "/root/reference"

NPTS = 128
BATCH = 4      # upper bound; the fixture picks the largest divisor of
               # the realized valid-set size (ref valid loader drop_last)
EPOCHS = 14
EVAL_INTERVAL = 2
LR = 1e-3
WEIGHT_DECAY = 1e-4
N_CLS = 13            # registry table size; 7 base train classes on fold 0
EDGE_WIDTHS = ((64, 64), (64, 64), (64, 64))
MLP_WIDTHS = (512, 256)
SEEDS = (321, 7)

pytestmark = pytest.mark.slow


def _import_ref_pretrain():
    """Load the reference pre_train module. Call ONLY inside
    `_pretrain_import_scope` (test_e2e_protoeval_oracle): other oracle
    tests cache the TOP-LEVEL reference's `dataloaders`/`utils` packages
    in sys.modules, whose MyPretrainDataset has a different item shape —
    the scope stashes those families around both the import and the run."""
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference tree not available")
    if not hasattr(np, "int"):
        np.int = int
    spec = importlib.util.spec_from_file_location(
        "ref_pre_train_equiv",
        os.path.join(REFERENCE_ROOT, "pretrain", "runs", "pre_train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ref_args(data_path, log_dir, seed, batch):
    """The argparse namespace pretrain/main.py:15-102 would produce for
    --phase pretrain with our PretrainConfig below."""
    return types.SimpleNamespace(
        phase="pretrain", dataset="s3dis", cvfold=0, data_path=data_path,
        log_dir=log_dir, batch_size=batch, n_workers=0, n_iters=EPOCHS,
        eval_interval=EVAL_INTERVAL, pretrain_lr=LR,
        pretrain_weight_decay=WEIGHT_DECAY, pretrain_step_size=50,
        pretrain_gamma=0.5, pc_npts=NPTS, pc_attribs="xyzrgbXYZ",
        pc_in_dim=9, pc_augm=False, pc_augm_scale=0.0, pc_augm_rot=1,
        pc_augm_mirror_prob=0.0, pc_augm_jitter=1, dgcnn_k=20,
        edgeconv_widths=[list(w) for w in EDGE_WIDTHS],
        dgcnn_mlp_widths=list(MLP_WIDTHS), seed=seed)


def _parse_ref_history(log_path):
    """(epoch, mIoU) rows from the reference's eval lines
    (pre_train.py:191)."""
    with open(log_path) as f:
        text = f.read()
    rows = re.findall(
        r"===== EPOCH \[(\d+)\]: Accuracy: [\d.eE+-]+ \| "
        r"mIoU: ([\d.eE+-]+) =====", text)
    assert rows, f"no eval lines in {log_path}"
    return [(int(e), float(m)) for e, m in rows]


def _run_reference(tmp_root, train_dir, init_sd, seed, batch):
    from test_e2e_protoeval_oracle import _pretrain_import_scope

    log_dir = os.path.join(tmp_root, f"ref_pretrain_s{seed}")
    os.makedirs(log_dir, exist_ok=True)
    with _pretrain_import_scope():
        ref_pt = _import_ref_pretrain()
        cls = ref_pt.DGCNNSeg
        orig_init = cls.__init__

        def warm_init(self, args, num_classes):
            """Reference model, but starting from the shared converted
            init (the reference loop has no warm-start hook,
            pre_train.py:131). Patched onto the CLASS, not the module
            global: the reference's __init__ resolves
            `super(DGCNNSeg, self)` through the module-global name, so
            replacing that global with a wrapper breaks super()."""
            orig_init(self, args, num_classes)
            self.load_state_dict(init_sd)

        cls.__init__ = warm_init
        try:
            torch.manual_seed(seed)
            np.random.seed(seed)
            random.seed(seed)
            ref_pt.pretrain(_ref_args(train_dir, log_dir, seed, batch))
        finally:
            cls.__init__ = orig_init
    return _parse_ref_history(os.path.join(log_dir, "log_pretrain.txt"))


def _run_ours(tmp_root, train_dir, npz_path, seed, batch, lr=LR,
              wd=WEIGHT_DECAY):
    model_cfg = ModelConfig(pc_npts=NPTS, edgeconv_widths=EDGE_WIDTHS,
                            dgcnn_mlp_widths=MLP_WIDTHS, use_pallas=False)
    data_cfg = DataConfig(dataset="s3dis", cvfold=0, data_path=train_dir,
                          pc_npts=NPTS, n_workers=0, pc_augm=False)
    cfg = PretrainConfig(batch_size=batch, lr=lr,
                         weight_decay=wd, n_iters=EPOCHS,
                         eval_interval=EVAL_INTERVAL, seed=seed,
                         log_dir=os.path.join(tmp_root,
                                              f"our_pretrain_s{seed}"))
    # 1-device mesh: pretrain() auto-meshes over the 8-device CI mesh
    # otherwise, and the adaptive (valid-set-divisor) batch size need not
    # divide 8
    from gfs3dseg_gws_tpu.parallel import make_mesh

    out = pretrain(model_cfg, data_cfg, cfg, mesh=make_mesh(1),
                   export_torch=False, init_checkpoint_path=npz_path)
    return [(h["epoch"], h["miou"]) for h in out["history"]]


def _final(history):
    """Mean of the last two evals — one eval is noisy at this scale."""
    tail = sorted(history)[-2:]
    return float(np.mean([m for _, m in tail]))


def _first(history):
    return sorted(history)[0][1]


@pytest.fixture(scope="module")
def shared_setup(tmp_path_factory):
    """Synthetic data + ONE matched initial DGCNNSeg state shared by every
    run: torch-side the raw state_dict, our-side the converted npz."""
    root = str(tmp_path_factory.mktemp("pretrain_equiv"))
    train_dir, _ = make_synthetic_blocks(
        root, dataset="s3dis", n_train_blocks=90, n_test_blocks=2,
        points_per_block=NPTS + NPTS // 2, n_classes=N_CLS, seed=23)
    # Coverage blocks for the VALID split: 8 extra blocks named to sort
    # LAST in every class2scans list (block lists are sorted-filename
    # order), so the 90/10 split (pretrain/dataloaders/loader.py:389-401)
    # holds them out alongside whatever stragglers it produces. Their
    # class coverage spans all 13 classes because the reference's
    # metric_evaluate divides by per-class gt+pos counts (pre_train.py:77)
    # and 0/0-crashes if the scored valid set misses a class. The fixture
    # asserts the REALIZED valid set (deterministic for this data+seed):
    # size divisible by BATCH (the ref valid loader is drop_last=True, so
    # both frameworks then score the identical full set) and every
    # segmentation class covered by >= 2 valid blocks.
    import numpy as np_

    from gfs3dseg_gws_tpu.data.synthetic import make_synthetic_room

    zz_rng = np_.random.default_rng(77)
    for i in range(8):
        present = sorted({(3 * i + j) % N_CLS for j in range(3)})
        if i == 7:
            present = [5, 9, 12]    # second valid appearance of class 12
        block = make_synthetic_room(zz_rng, NPTS + NPTS // 2, N_CLS,
                                    present)
        np_.save(os.path.join(train_dir, "data",
                              f"Area_train_room_zz{i}_block_0.npy"), block)

    from gfs3dseg_gws_tpu.data.datasets import PretrainBlockDataset
    from gfs3dseg_gws_tpu.data.registry import DatasetRegistry

    reg = DatasetRegistry("s3dis", 0, train_dir)
    cls = sorted(reg.train_classes)
    valid_ds = PretrainBlockDataset(
        train_dir, cls, {c: reg.class2scans[c] for c in cls}, mode="test",
        num_point=NPTS, split_ratio=0.1)
    batch = max(b for b in range(1, BATCH + 1)
                if len(valid_ds) % b == 0)
    cover = np_.zeros(len(cls) + 1)
    for j in range(len(valid_ds)):
        _, lbl, _ = valid_ds.__getitem__(j, rng=np_.random.default_rng(j))
        cover += np_.bincount(np_.unique(lbl), minlength=len(cls) + 1)
    assert (cover >= 2).all(), cover

    from test_e2e_protoeval_oracle import _pretrain_import_scope

    with _pretrain_import_scope():
        ref_pt = _import_ref_pretrain()
        torch.manual_seed(5)
        args = types.SimpleNamespace(
            edgeconv_widths=[list(w) for w in EDGE_WIDTHS],
            dgcnn_mlp_widths=list(MLP_WIDTHS), pc_in_dim=9, dgcnn_k=20)
        n_base = 7                  # s3dis fold-0 train classes
        ref_model = ref_pt.DGCNNSeg(args, n_base + 1)
        init_sd = {k: v.clone() for k, v in ref_model.state_dict().items()}

    enc_sd = {k[len("encoder."):]: v for k, v in init_sd.items()
              if k.startswith("encoder.")}
    enc_p, enc_s = convert_torch_dgcnn_encoder(enc_sd)
    seg_p, seg_s = convert_torch_segmenter(init_sd)
    npz_path = os.path.join(root, "init_dgcnnseg.npz")
    save_checkpoint(npz_path,
                    {"params": {"encoder": enc_p, "segmenter": seg_p},
                     "batch_stats": {"encoder": enc_s, "segmenter": seg_s}})
    return root, train_dir, init_sd, npz_path, batch


def test_pretrains_to_the_same_quality_basin(shared_setup, monkeypatch):
    monkeypatch.setenv("GFS3D_NO_NATIVE", "1")  # python loader == reference
                                                # sampling semantics
    root, train_dir, init_sd, npz_path, batch = shared_setup

    ref_runs = [_run_reference(root, train_dir, init_sd, s, batch)
                for s in SEEDS]
    our_runs = [_run_ours(root, train_dir, npz_path, s, batch)
                for s in SEEDS]

    ref_final = np.array([_final(h) for h in ref_runs])
    our_final = np.array([_final(h) for h in our_runs])
    ref_first = np.array([_first(h) for h in ref_runs])
    our_first = np.array([_first(h) for h in our_runs])
    print(f"\nref first evals: {ref_first} finals: {ref_final}"
          f"\nour first evals: {our_first} finals: {our_final}")

    # 1) every run learned. OUR floor is the mutation detector (healthy
    #    finals 0.740-0.807; mutations land at 0.150 / 0.470). The
    #    REFERENCE gets a lower sanity floor: its MyPretrainDataset block
    #    order is `list(set(...))` (pretrain/dataloaders/loader.py:399),
    #    which follows the per-PROCESS string-hash seed — measured ref
    #    finals for the same torch seed span 0.539-0.742 across pytest
    #    processes, so a tight ref floor would flake on hash order.
    LEARN_FLOOR = 0.55
    REF_FLOOR = 0.40
    assert ref_final.min() >= REF_FLOOR, ref_final
    assert our_final.min() >= LEARN_FLOOR, our_final
    assert (our_final > our_first).all(), (our_first, our_final)

    # 2) same quality basin: padded across-seed bands overlap
    ATOL = 0.05
    r_lo, r_hi = ref_final.min(), ref_final.max()
    o_lo, o_hi = our_final.min(), our_final.max()
    pad = max(r_hi - r_lo, o_hi - o_lo) + ATOL
    gap = max(o_lo - r_hi, r_lo - o_hi, 0.0)
    assert gap <= pad, (
        f"pretrain mIoU basin diverges: ref [{r_lo:.4f}, {r_hi:.4f}] vs "
        f"ours [{o_lo:.4f}, {o_hi:.4f}] (gap {gap:.4f} > pad {pad:.4f})")
