"""Shared argparse groups (flags mirror reference train.py:733-817 /
get_basis.py:226-299 / pretrain/main.py:15-102) and config construction."""
from __future__ import annotations

import argparse
import os

from gfs3dseg_gws_tpu.utils.config import DataConfig, ModelConfig, parse_widths


def apply_platform_env():
    """Honour JAX_PLATFORMS for CLI runs, and persist TPU executables.

    Some environments pre-register a TPU plugin that wins over the env var;
    applying the value through jax.config makes `JAX_PLATFORMS=cpu python
    train.py ...` behave as documented.

    On a TPU backend the persistent compile cache is enabled (same policy
    as bench.py) so repeated CLI invocations reuse the train/eval-step
    executables. TPU-only: with a cache dir set, XLA:CPU switches to its
    AOT pipeline and compiles up to 65x slower (measured, CLAUDE.md);
    host_init independently masks the cache around its CPU init compile.
    """
    plat = os.environ.get("JAX_PLATFORMS", "")
    import jax

    if plat and "axon" not in plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    # decide TPU-ness from the env string alone: calling
    # jax.default_backend() here would initialise the backend before
    # argparse even runs, making `--help` block on the axon attach stall
    # (60-900 s after a previous TPU process's detach) and freezing the
    # platform choice for the whole process
    if plat and ("tpu" in plat or "axon" in plat):
        try:
            jax.config.update("jax_compilation_cache_dir",
                              "/tmp/gfs3d_jax_compile_cache")
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
        except Exception:
            pass


def add_data_args(p: argparse.ArgumentParser):
    p.add_argument("--dataset", type=str, default="s3dis",
                   help="Dataset name: s3dis|scannet")
    p.add_argument("--cvfold", type=int, default=0,
                   help="Fold left-out for testing. Options:{0,1}")
    p.add_argument("--data_path", type=str, default="datasets/S3DIS/"
                   "blocks_bs1.0_s1.0", help="Directory to the source data")
    p.add_argument("--testing_data_path", type=str,
                   default="datasets/S3DIS/blocks_bs1.0_s1.0_test")
    p.add_argument("--total_classes", type=int, default=13,
                   help="number of classes to be evaluated in the gfs")
    p.add_argument("--k_shot", type=int, default=5,
                   help="Number of samples/shots for each class: 1|5")
    p.add_argument("--n_workers", type=int, default=16,
                   help="number of workers to load data")


def add_pc_args(p: argparse.ArgumentParser):
    p.add_argument("--pc_npts", type=int, default=2048,
                   help="Number of input points.")
    p.add_argument("--pc_attribs", default="xyzrgbXYZ",
                   help="Point attributes: xyz, rgb, XYZ (normalised)")
    p.add_argument("--pc_augm", action="store_true",
                   help="Training augmentation")
    p.add_argument("--pc_augm_scale", type=float, default=0)
    p.add_argument("--pc_augm_rot", type=int, default=1)
    p.add_argument("--pc_augm_mirror_prob", type=float, default=0)
    p.add_argument("--pc_augm_jitter", type=int, default=1)


def add_dispatch_args(p: argparse.ArgumentParser):
    """TPU dispatch/transfer flags shared by the train and pretrain CLIs
    (no reference counterpart — pure TPU-side throughput knobs)."""
    p.add_argument("--h2d", choices=("auto", "exact", "packed"),
                   default="auto",
                   help="train/eval batch transfer: packed = one u8 "
                        "buffer per batch (f16 coords, 4x fewer bytes); "
                        "auto = packed on TPU, exact elsewhere")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help=">1 chains S train steps into one compiled "
                        "lax.scan dispatch (bit-identical update sequence; "
                        "amortises per-dispatch launch latency)")


def add_model_args(p: argparse.ArgumentParser,
                   attention_action: str = "store_false"):
    p.add_argument("--dgcnn_k", type=int, default=20,
                   help="Number of nearest neighbors in Edgeconv")
    p.add_argument("--edgeconv_widths", default="[[64,64], [64,64], "
                   "[64,64]]", help="DGCNN Edgeconv widths")
    p.add_argument("--dgcnn_mlp_widths", default="[512, 256]",
                   help="DGCNN MLP widths")
    p.add_argument("--base_widths", default="[128, 64]",
                   help="BaseLearner widths")
    p.add_argument("--output_dim", type=int, default=64,
                   help="attention learner output dim")
    # the two reference trees DISAGREE on this flag's polarity: the GFS
    # CLI uses store_false, so attention is ON unless flagged
    # (train.py:807-808 quirk), while the pretrain/baseline CLI uses
    # store_true, so attention is OFF unless flagged (pretrain/main.py:79)
    p.add_argument("--use_attention", action=attention_action,
                   help="use attention learner (default "
                        f"{attention_action == 'store_false'}, matching "
                        "the reference CLI's polarity)")
    p.add_argument("--no_pallas", action="store_true",
                   help="disable fused Pallas TPU kernels")


def model_config_from_args(args) -> ModelConfig:
    return ModelConfig(
        pc_attribs=args.pc_attribs,
        pc_npts=args.pc_npts,
        dgcnn_k=args.dgcnn_k,
        edgeconv_widths=parse_widths(args.edgeconv_widths),
        dgcnn_mlp_widths=parse_widths(args.dgcnn_mlp_widths),
        base_widths=parse_widths(args.base_widths),
        output_dim=args.output_dim,
        use_attention=args.use_attention,
        use_pallas=not getattr(args, "no_pallas", False),
    )


def data_config_from_args(args) -> DataConfig:
    return DataConfig(
        dataset=args.dataset,
        cvfold=args.cvfold,
        data_path=args.data_path,
        testing_data_path=getattr(args, "testing_data_path", ""),
        total_classes=getattr(args, "total_classes", 13),
        k_shot=getattr(args, "k_shot", 5),
        pc_npts=args.pc_npts,
        pc_attribs=args.pc_attribs,
        pc_augm=args.pc_augm,
        pc_augm_scale=args.pc_augm_scale,
        pc_augm_rot=args.pc_augm_rot,
        pc_augm_mirror_prob=args.pc_augm_mirror_prob,
        pc_augm_jitter=args.pc_augm_jitter,
        n_workers=args.n_workers,
    )
