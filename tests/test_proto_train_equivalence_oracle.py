"""Cross-framework PROTOTRAIN-trajectory equivalence oracle (stretch item
from the round-4 verdict: extend the trajectory recipe to an episodic
baseline so every TRAINING driver has cross-framework evidence).

  reference: pretrain/runs/proto_train.py::train (proto_train.py:17-80) —
    its own MyDataset episodic sampler, ProtoLearner Adam param groups
    (encoder pinned at 1e-4, heads at args.lr; proto_learner.py:24-32),
    StepLR, and periodic test_few_shot over the shared static h5 valid
    bank — executed in-process on CPU torch. Matched inits: the learner's
    `load_pretrain_checkpoint` (encoder-only hook) is rebound to the
    reference's own full-model `load_model_checkpoint`, fed our exported
    fewshot checkpoint.tar (same trick as the GFS trajectory oracle).
  ours:      pipelines.baselines.episodic_train("proto", ...) from the
    SAME checkpoint via model_checkpoint_path, reading the SAME h5 bank
    (byte-identical materialisation, test_fixture_rng_oracle.py).

Both frameworks train 300 episodes x SEEDS seeds with their own episode
streams; the shared static bank scores them. Asserts learning + same
quality basin (same scheme as the GFS/pretrain trajectory oracles).

Calibration (this exact setup, 2 seeds, 2026-08): ref finals (bank mIoU)
= [0.530, 0.534] (first evals 0.476/0.465), ours = [0.518, 0.526] (first
evals 0.471/0.499) — cross-framework gap ~0.008, within-framework spread
<= 0.016. Mutation evidence (seed 321, our loop): lr x30 (0.03) -> final
0.379, dist_method 'euclidean' vs the reference's cosine -> final 0.403;
both fail the LEARN_FLOOR (0.45) AND the basin band (gaps 0.151 / 0.127
vs pad 0.066). So the oracle detects optimizer and metric-head
divergence and does not pass vacuously.
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

from test_e2e_protoeval_oracle import _pretrain_import_scope

from gfs3dseg_gws_tpu.data import make_synthetic_blocks
from gfs3dseg_gws_tpu.pipelines.baselines import (FewShotConfig,
                                                  FewShotLearner,
                                                  episodic_train)
from gfs3dseg_gws_tpu.utils.checkpoint import save_torch_fewshot_checkpoint
from gfs3dseg_gws_tpu.utils.config import DataConfig, ModelConfig

REFERENCE_ROOT = "/root/reference"

NPTS = 128
N_WAY, K_SHOT, N_QUERIES = 2, 2, 1
N_ITERS = 300
EVAL_INTERVAL = 100
LR = 1e-3
EDGE_WIDTHS = ((64, 64), (64, 64), (64, 64))
MLP_WIDTHS = (512, 256)
BASE_WIDTHS = (128, 64)
OUTPUT_DIM = 64
SEEDS = (321, 7)

pytestmark = pytest.mark.slow


def _model_cfg():
    return ModelConfig(pc_npts=NPTS, edgeconv_widths=EDGE_WIDTHS,
                       dgcnn_mlp_widths=MLP_WIDTHS,
                       base_widths=BASE_WIDTHS, output_dim=OUTPUT_DIM,
                       use_pallas=False)


def _fs_cfg(log_dir, seed, lr=LR, dist="cosine"):
    return FewShotConfig(n_way=N_WAY, k_shot=K_SHOT, n_queries=N_QUERIES,
                         n_iters=N_ITERS, lr=lr, step_size=5000, gamma=0.5,
                         eval_interval=EVAL_INTERVAL, n_episode_test=1,
                         dist_method=dist, log_dir=log_dir, seed=seed,
                         h2d="exact")


def _ref_args(train_dir, log_dir, ckpt_dir):
    """pretrain/main.py:15-102 namespace for --phase prototrain."""
    return types.SimpleNamespace(
        phase="prototrain", dataset="s3dis", cvfold=0, data_path=train_dir,
        log_dir=log_dir, pretrain_checkpoint_path=ckpt_dir,
        model_checkpoint_path="", n_way=N_WAY, k_shot=K_SHOT,
        n_queries=N_QUERIES, n_iters=N_ITERS, eval_interval=EVAL_INTERVAL,
        n_episode_test=1, lr=LR, step_size=5000, gamma=0.5, pc_npts=NPTS,
        pc_attribs="xyzrgbXYZ", pc_in_dim=9, pc_augm=False,
        pc_augm_scale=0.0, pc_augm_rot=1, pc_augm_mirror_prob=0.0,
        pc_augm_jitter=1, dgcnn_k=20,
        edgeconv_widths=[list(w) for w in EDGE_WIDTHS],
        dgcnn_mlp_widths=list(MLP_WIDTHS), base_widths=list(BASE_WIDTHS),
        output_dim=OUTPUT_DIM, use_attention=True, dist_method="cosine",
        n_workers=0)


def _parse_valid_lines(log_path):
    with open(log_path) as f:
        rows = re.findall(r"=====\[VALID\] Loss: [\d.eE+-]+ \| Mean IoU: "
                          r"([\d.eE+-]+) =====", f.read())
    assert rows, f"no VALID lines in {log_path}"
    return [float(m) for m in rows]


def _run_reference(root, train_dir, ckpt_dir, seed):
    log_dir = os.path.join(root, f"ref_proto_s{seed}")
    os.makedirs(log_dir, exist_ok=True)
    orig_m_cuda = torch.nn.Module.cuda
    torch.nn.Module.cuda = lambda self, *a, **k: self
    try:
        with _pretrain_import_scope():
            spec = importlib.util.spec_from_file_location(
                "ref_proto_train", os.path.join(
                    REFERENCE_ROOT, "pretrain", "runs", "proto_train.py"))
            ref_pt = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(ref_pt)
            # matched inits: rebind the encoder-only pretrain hook to the
            # reference's own FULL-model loader (same trick as the GFS
            # trajectory oracle) so training starts from our exported
            # complete weights, not torch-random heads
            pl_mod = sys.modules["models.proto_learner"]
            pl_mod.load_pretrain_checkpoint = (
                lambda model, path: pl_mod.load_model_checkpoint(
                    model, path, mode="test"))
            torch.manual_seed(seed)
            np.random.seed(seed)
            random.seed(seed)
            ref_pt.train(_ref_args(train_dir, log_dir, ckpt_dir))
    finally:
        torch.nn.Module.cuda = orig_m_cuda
    return _parse_valid_lines(os.path.join(log_dir, "log_prototrain.txt"))


def _run_ours(root, train_dir, ckpt_dir, seed, lr=LR, dist="cosine"):
    data_cfg = DataConfig(dataset="s3dis", cvfold=0, data_path=train_dir,
                          pc_npts=NPTS, n_workers=0, pc_augm=False)
    out = episodic_train(
        "proto", _model_cfg(), data_cfg,
        _fs_cfg(os.path.join(root, f"our_proto_s{seed}"), seed, lr, dist),
        model_checkpoint_path=ckpt_dir)
    return [h["miou"] for h in out["history"]]


@pytest.fixture(scope="module")
def shared_setup(tmp_path_factory):
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference tree not available")
    root = str(tmp_path_factory.mktemp("proto_equiv"))
    train_dir, _ = make_synthetic_blocks(
        root, n_train_blocks=36, n_test_blocks=8,
        points_per_block=NPTS + NPTS // 2, seed=29)
    # one matched initial ProtoNet state, exported in the reference's
    # episodic format ({'iteration','model_state_dict',...}) both sides load
    data_cfg = DataConfig(dataset="s3dis", cvfold=0, data_path=train_dir,
                          pc_npts=NPTS, n_workers=0)
    learner = FewShotLearner("proto", _model_cfg(), data_cfg,
                             _fs_cfg(os.path.join(root, "seed_log"), 0))
    ckpt_dir = os.path.join(root, "init_ckpt")
    save_torch_fewshot_checkpoint(learner.params, learner.batch_stats,
                                  ckpt_dir, iteration=0, iou=0.0)
    return root, train_dir, ckpt_dir


def test_prototrains_to_the_same_quality_basin(shared_setup, monkeypatch):
    monkeypatch.setenv("GFS3D_NO_NATIVE", "1")
    root, train_dir, ckpt_dir = shared_setup

    # reference first: materialises the shared static h5 valid bank
    ref_runs = [_run_reference(root, train_dir, ckpt_dir, s) for s in SEEDS]
    our_runs = [_run_ours(root, train_dir, ckpt_dir, s) for s in SEEDS]

    ref_final = np.array([np.mean(h[-2:]) for h in ref_runs])
    our_final = np.array([np.mean(h[-2:]) for h in our_runs])
    ref_first = np.array([h[0] for h in ref_runs])
    our_first = np.array([h[0] for h in our_runs])
    print(f"\nref first evals: {ref_first} finals: {ref_final}"
          f"\nour first evals: {our_first} finals: {our_final}")

    # 1) learning floor (calibration: finals 0.518-0.534; mutations land
    #    at 0.379 / 0.403)
    LEARN_FLOOR = 0.45
    assert ref_final.min() >= LEARN_FLOOR, ref_final
    assert our_final.min() >= LEARN_FLOOR, our_final

    # 2) same quality basin (same scheme as the other trajectory oracles)
    ATOL = 0.05
    r_lo, r_hi = ref_final.min(), ref_final.max()
    o_lo, o_hi = our_final.min(), our_final.max()
    pad = max(r_hi - r_lo, o_hi - o_lo) + ATOL
    gap = max(o_lo - r_hi, r_lo - o_hi, 0.0)
    assert gap <= pad, (
        f"prototrain mIoU basin diverges: ref [{r_lo:.4f}, {r_hi:.4f}] vs "
        f"ours [{o_lo:.4f}, {o_hi:.4f}] (gap {gap:.4f} > pad {pad:.4f})")
