"""END-TO-END --phase protoeval parity vs the REFERENCE's own eval driver.

Companion to test_e2e_eval_oracle.py for the episodic-baseline subsystem:
runs the reference's ACTUAL pretrain/runs/eval.py::eval() in-process (CPU
torch) — its ProtoLearner + checkpoint.tar load, MyTestDataset h5-bank
materialisation, test_few_shot loop and classic few-shot metric — then our
pipelines.baselines.episodic_eval on the SAME data dir (shared h5 episode
bank) and the SAME exported checkpoint.tar, and asserts the logged TEST
loss and mean IoU agree.

Mutation-checked: running our side with dist_method='euclidean' against
the reference's cosine makes the loss/IoU assertions fail — the oracle
detects configuration divergence, it does not pass vacuously.

Also the round-trip proof for the episodic-baseline checkpoint format
(pretrain/runs/proto_train.py:72-78 {'iteration','model_state_dict','loss',
'IoU'}): our save_torch_fewshot_checkpoint artifact is consumed by the
reference's own load_model_checkpoint AND re-imported by our
load_torch_fewshot_checkpoint through FewShotLearner.
"""
import contextlib
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
from gfs3dseg_gws_tpu.pipelines.baselines import FewShotConfig, episodic_eval
from gfs3dseg_gws_tpu.utils.checkpoint import save_torch_fewshot_checkpoint
from gfs3dseg_gws_tpu.utils.config import DataConfig, ModelConfig

REFERENCE_ROOT = "/root/reference"

NPTS = 128
N_WAY, K_SHOT, N_QUERIES = 2, 2, 1
EDGE_WIDTHS = ((64, 64), (64, 64), (64, 64))
MLP_WIDTHS = (512, 256)
BASE_WIDTHS = (128, 64)
OUTPUT_DIM = 64

pytestmark = pytest.mark.slow

# the reference pretrain tree's top-level package names; they collide with
# the TOP-LEVEL reference packages other oracle tests cache in sys.modules
# (e.g. `dataloaders` without MyTestDataset), so the pretrain import runs
# inside a stash-and-restore scope
_PRETRAIN_FAMILIES = ("models", "dataloaders", "utils", "runs")


@contextlib.contextmanager
def _pretrain_import_scope(faiss_index=object, fps=None):
    saved = {}
    for k in list(sys.modules):
        if k.split(".")[0] in _PRETRAIN_FAMILIES:
            saved[k] = sys.modules.pop(k)
    # eval.py imports MPTILearner -> models.mpti -> faiss/torch_cluster;
    # protoeval never calls them (import stubs suffice); mptieval passes
    # the REAL numpy shims from test_mpti_finetune_oracle
    shims = {}
    for name, mod in (("faiss", types.SimpleNamespace(
                          IndexFlatL2=faiss_index)),
                      ("torch_cluster", types.SimpleNamespace(fps=fps))):
        if name not in sys.modules:
            shims[name] = mod
    from ref_shims import install_transforms3d_stub

    install_transforms3d_stub()
    sys.modules.update(shims)
    added_np_int = not hasattr(np, "int")
    if added_np_int:
        np.int = int
    sys.path.insert(0, REFERENCE_ROOT + "/pretrain")
    try:
        yield
    finally:
        sys.path.remove(REFERENCE_ROOT + "/pretrain")
        if added_np_int:
            del np.int
        for k in list(sys.modules):
            if k.split(".")[0] in _PRETRAIN_FAMILIES:
                sys.modules.pop(k)
        for k in shims:
            sys.modules.pop(k, None)
        sys.modules.update(saved)


def _parse_test_line(log_path):
    with open(log_path) as f:
        m = re.search(r"=====\[TEST\] Loss: ([\d.eE+-]+) \| Mean IoU: "
                      r"([\d.eE+-]+) =====", f.read())
    assert m, f"no TEST line in {log_path}"
    return float(m.group(1)), float(m.group(2))


@pytest.mark.parametrize("kind", ["proto", "mpti"])
def test_episodic_eval_end_to_end_matches_reference(tmp_path, kind):
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference tree not available")
    root = str(tmp_path)
    train_dir, _ = make_synthetic_blocks(
        root, n_train_blocks=36, n_test_blocks=8,
        points_per_block=NPTS + NPTS // 2, seed=29)

    # ---- our learner provides the weights; export the reference's format
    model_cfg = ModelConfig(pc_npts=NPTS, edgeconv_widths=EDGE_WIDTHS,
                            dgcnn_mlp_widths=MLP_WIDTHS,
                            base_widths=BASE_WIDTHS, output_dim=OUTPUT_DIM,
                            use_pallas=False)
    data_cfg = DataConfig(dataset="s3dis", cvfold=0, data_path=train_dir,
                          pc_npts=NPTS, k_shot=K_SHOT, n_workers=0)
    fs_cfg = FewShotConfig(n_way=N_WAY, k_shot=K_SHOT, n_queries=N_QUERIES,
                           n_episode_test=1, dist_method="cosine",
                           n_subprototypes=10, k_connect=20, sigma=1.0,
                           log_dir=os.path.join(root, "our_log"),
                           h2d="exact")

    from gfs3dseg_gws_tpu.pipelines.baselines import FewShotLearner
    seed_learner = FewShotLearner(kind, model_cfg, data_cfg, fs_cfg)
    gen = np.random.default_rng(31)

    def perturb(path, leaf):   # non-trivial BN stats through the converter
        name = "/".join(str(p.key) for p in path)
        arr = np.asarray(leaf)
        if name.endswith("mean"):
            return gen.uniform(-0.2, 0.2, arr.shape).astype(np.float32)
        return gen.uniform(0.5, 1.5, arr.shape).astype(np.float32)

    stats = jax.tree_util.tree_map_with_path(perturb,
                                             seed_learner.batch_stats)
    ckpt_dir = os.path.join(root, "fs_ckpt")
    save_torch_fewshot_checkpoint(seed_learner.params, stats, ckpt_dir,
                                  iteration=7, iou=0.33)

    # ---- reference protoeval/mptieval (materialises the shared h5 bank)
    ref_log = os.path.join(root, "ref_log")
    args = types.SimpleNamespace(
        phase=f"{kind}eval", dataset="s3dis", cvfold=0, data_path=train_dir,
        model_checkpoint_path=ckpt_dir, log_dir=ref_log,
        n_way=N_WAY, k_shot=K_SHOT, n_queries=N_QUERIES, n_episode_test=1,
        pc_npts=NPTS, pc_attribs="xyzrgbXYZ", pc_in_dim=9, dgcnn_k=20,
        edgeconv_widths=[list(w) for w in EDGE_WIDTHS],
        dgcnn_mlp_widths=list(MLP_WIDTHS), base_widths=list(BASE_WIDTHS),
        output_dim=OUTPUT_DIM, use_attention=True, dist_method="cosine",
        n_subprototypes=10, k_connect=20, sigma=1.0)
    if kind == "mpti":
        # the REAL numpy shims pinned by test_mpti_finetune_oracle
        from test_mpti_finetune_oracle import _fps_shim, _IndexFlatL2
        scope = _pretrain_import_scope(faiss_index=_IndexFlatL2,
                                       fps=_fps_shim)
    else:
        scope = _pretrain_import_scope()
    orig_m_cuda = torch.nn.Module.cuda
    orig_t_cuda = torch.Tensor.cuda
    torch.nn.Module.cuda = lambda self, *a, **k: self
    # mpti.py hard-codes tensor .cuda() inside label propagation
    # (pretrain/models/mpti.py:106,250-291)
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        with scope:
            spec = importlib.util.spec_from_file_location(
                "ref_pretrain_eval",
                os.path.join(REFERENCE_ROOT, "pretrain", "runs", "eval.py"))
            ref_eval = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(ref_eval)
            if kind == "mpti":
                # torch>=2 reduces pairwise_distance over the LAST dim;
                # the reference targets 1.8 (dim=1) — patch the module's F
                # like test_mpti_finetune_oracle's ref_mpti fixture
                mpti_mod = sys.modules["models.mpti"]
                F_real = mpti_mod.F
                F_shim = types.SimpleNamespace(**{
                    k: getattr(F_real, k) for k in dir(F_real)
                    if not k.startswith("_")})
                F_shim.pairwise_distance = (
                    lambda x1, x2, p=2.0, eps=1e-6, keepdim=False:
                    torch.norm(x1 - x2 + eps, p, dim=1, keepdim=keepdim))
                mpti_mod.F = F_shim
            np.random.seed(42)
            random.seed(42)
            torch.manual_seed(42)
            ref_eval.eval(args)
    finally:
        torch.nn.Module.cuda = orig_m_cuda
        torch.Tensor.cuda = orig_t_cuda
    ref_loss, ref_iou = _parse_test_line(
        os.path.join(ref_log, f"log_{kind}eval.txt"))
    bank_dir = os.path.join(
        train_dir, f"S_0_N_{N_WAY}_K_{K_SHOT}_test_episodes_"
                   f"{N_QUERIES}_pts_{NPTS}")
    assert os.path.isdir(bank_dir), "reference did not materialise the bank"

    # ---- ours on the same bank + same checkpoint.tar
    our_iou = episodic_eval(kind, model_cfg, data_cfg, fs_cfg,
                            model_checkpoint_path=ckpt_dir)
    our_loss, our_iou_logged = _parse_test_line(
        os.path.join(fs_cfg.log_dir, f"log_{kind}eval.txt"))
    assert our_iou_logged == pytest.approx(our_iou, abs=1e-6)  # %f print
    if kind == "mpti":
        # label propagation solves (I - alpha*S)x = y; the stage oracle
        # guarantees >=99.5% propagated-label agreement (solve vs inverse),
        # so a few flipped points can move small-episode IoU by ~1e-2
        np.testing.assert_allclose(our_loss, ref_loss, rtol=5e-3)
        np.testing.assert_allclose(our_iou, ref_iou, rtol=0, atol=0.015)
    else:
        np.testing.assert_allclose(our_loss, ref_loss, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(our_iou, ref_iou, rtol=1e-3, atol=1e-4)
