"""CLI smoke tests: run the real entry scripts in subprocesses on the
synthetic dataset (CPU), validating end-to-end argument wiring and artifact
handoff between stages."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from gfs3dseg_gws_tpu.data import make_synthetic_blocks

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TINY_FLAGS = [
    "--edgeconv_widths", "[[8,8],[8,8],[8,8]]",
    "--dgcnn_mlp_widths", "[16,16]",
    "--base_widths", "[8,8]",
    "--output_dim", "8",
    "--dgcnn_k", "5",
    "--pc_npts", "128",
    "--n_workers", "2",
    "--no_pallas",
]


def run_cli(script, args, cwd=REPO):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script)] + args,
        capture_output=True, text=True, env=env, cwd=cwd, timeout=900)
    assert proc.returncode == 0, (
        f"{script} failed:\nSTDOUT: {proc.stdout[-3000:]}\n"
        f"STDERR: {proc.stderr[-3000:]}")
    return proc


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli"))
    train_dir, test_dir = make_synthetic_blocks(
        root, n_train_blocks=40, n_test_blocks=6, points_per_block=1500,
        seed=3)
    return root, train_dir, test_dir


@pytest.mark.slow
def test_pretrain_and_basis_cli(synth):
    root, train_dir, _ = synth
    save = os.path.join(root, "logs")

    run_cli("pretrain/main.py", [
        "--phase", "pretrain", "--dataset", "s3dis", "--cvfold", "0",
        "--data_path", train_dir, "--save_path", save,
        "--n_iters", "2", "--eval_interval", "2", "--batch_size", "8",
        "--seed", "0"] + TINY_FLAGS)
    ckpt_dir = os.path.join(save, "log_pretrain_s3dis_S0_LongTail")
    assert os.path.exists(os.path.join(ckpt_dir, "checkpoint.npz"))
    # torch-format export alongside
    assert os.path.exists(os.path.join(ckpt_dir, "checkpoint.tar"))

    run_cli("get_basis.py", [
        "--dataset", "s3dis", "--cvfold", "0", "--data_path", train_dir,
        "--pretrain_checkpoint_path",
        os.path.join(ckpt_dir, "checkpoint.npz"),
        "--num_cnt", "8", "--save_path", save, "--seed", "0"] + TINY_FLAGS)
    basis_path = os.path.join(
        save, "GlobalKmeans_EdgeConv123_cnt=8_energy=095_SVDReconstruct.pkl")
    assert os.path.exists(basis_path)
    import pickle

    with open(basis_path, "rb") as f:
        basis = pickle.load(f)
    assert basis.shape == (8, 24)


@pytest.mark.slow
def test_gfs_train_cli(synth):
    root, train_dir, test_dir = synth
    save = os.path.join(root, "gfs_logs")
    # make a quick basis without the pretrain stage
    import pickle

    basis_path = os.path.join(root, "basis.pkl")
    with open(basis_path, "wb") as f:
        pickle.dump(np.random.default_rng(0).standard_normal(
            (8, 24)).astype(np.float32), f)

    run_cli("train.py", [
        "--phase", "train", "--dataset", "s3dis", "--cvfold", "0",
        "--data_path", train_dir, "--testing_data_path", test_dir,
        "--basis_path", basis_path, "--save_path", save,
        "--epochs", "5", "--batch_size", "8", "--k_shot", "2",
        "--print_freq", "100", "--energy", "0.9",
        "--seed", "0"] + TINY_FLAGS)
    ckpts = [f for f in os.listdir(save)
             if f.startswith("train_") and f.endswith(".npz")]
    assert ckpts, f"no checkpoint in {os.listdir(save)}"

    run_cli("train.py", [
        "--phase", "test", "--only_evaluate", "--dataset", "s3dis",
        "--cvfold", "0", "--data_path", train_dir,
        "--testing_data_path", test_dir, "--basis_path", basis_path,
        "--save_path", save, "--batch_size", "8", "--k_shot", "2",
        "--eval_weight", "1.2", "--energy", "0.9",
        "--model_checkpoint_path", os.path.join(save, ckpts[0]),
        "--seed", "0"] + TINY_FLAGS)
    log = open(os.path.join(save, "log_test.txt")).read()
    assert "Eval result: Final mIoU" in log


@pytest.mark.slow
def test_gfs_train_cli_scannet(tmp_path):
    """ScanNet variant: 21 classes, energy 0.95, metric skips class 0."""
    from gfs3dseg_gws_tpu.data.registry import SCANNET_CLASSNAMES

    root = str(tmp_path)
    train_dir, test_dir = make_synthetic_blocks(
        root, dataset="scannet", n_train_blocks=60, n_test_blocks=21,
        points_per_block=1200, n_classes=21, classnames=SCANNET_CLASSNAMES,
        seed=21)
    import pickle

    basis_path = os.path.join(root, "basis.pkl")
    with open(basis_path, "wb") as f:
        pickle.dump(np.random.default_rng(0).standard_normal(
            (8, 24)).astype(np.float32), f)
    save = os.path.join(root, "gfs_scannet")
    run_cli("train.py", [
        "--phase", "train", "--dataset", "scannet", "--cvfold", "0",
        "--total_classes", "21",
        "--data_path", train_dir, "--testing_data_path", test_dir,
        "--basis_path", basis_path, "--save_path", save,
        "--epochs", "5", "--batch_size", "8", "--k_shot", "1",
        "--print_freq", "100", "--energy", "0.95",
        "--seed", "0"] + TINY_FLAGS)
    log = open(os.path.join(save, "log_train.txt")).read()
    assert "Final mIoU" in log
    # k_shot=1: exactly one support shot per novel class materialised
    supp = os.path.join(train_dir, "ValSupp_S0_K1_Seed10", "pcd")
    assert len(os.listdir(supp)) == 6


def test_apply_platform_env_no_cpu_compile_cache(monkeypatch):
    """The persistent compile cache must stay OFF on CPU backends: with a
    cache dir set, XLA:CPU switches to its AOT pipeline and the same
    compile runs up to 65x slower (measured r5, CLAUDE.md). On the CPU
    test backend apply_platform_env must therefore leave the cache dir
    unset."""
    import jax

    from gfs3dseg_gws_tpu.cli.common import apply_platform_env

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    before = getattr(jax.config, "jax_compilation_cache_dir", None)
    apply_platform_env()
    after = getattr(jax.config, "jax_compilation_cache_dir", None)
    assert after == before
    assert after is None or "gfs3d" not in str(after)
