"""GFS train/evaluate CLI (reference train.py:733-831)."""
from __future__ import annotations

import argparse

from gfs3dseg_gws_tpu.cli.common import (
    add_data_args,
    add_dispatch_args,
    add_model_args,
    add_pc_args,
    data_config_from_args,
    model_config_from_args,
)
from gfs3dseg_gws_tpu.utils.config import TrainConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="TPU-native GFS 3D segmentation via Geometric Words")
    # kept-for-compatibility flags (unused, like the reference's)
    p.add_argument("--train_gpu", default=[0])
    p.add_argument("--ngpus_per_node", type=int, default=1)
    p.add_argument("--batch_size_val", type=int, default=1)
    p.add_argument("--save_freq", type=int, default=5)
    p.add_argument("--start_val_epoch", type=int, default=25)
    p.add_argument("--n_iters", type=int, default=100)

    p.add_argument("--base_lr", type=float, default=0.01)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--start_epoch", type=int, default=0)
    p.add_argument("--manual_seed", type=int, default=321)
    p.add_argument("--print_freq", type=int, default=20)
    p.add_argument("--save_path", type=str, default="log_s3dis/S0_K5/debug")
    p.add_argument("--evaluate", type=bool, default=True)
    p.add_argument("--phase", type=str, default="train",
                   choices=["train", "test"])

    add_data_args(p)
    p.add_argument("--use_pretrain_weight", action="store_true")
    p.add_argument("--pretrain_checkpoint_path", type=str, default="")
    p.add_argument("--model_checkpoint_path", type=str, default="")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--eval_batch_size", type=int, default=0,
                   help="validation sweep batch (0 = auto: 256 on TPU; "
                        "results are batch-invariant, larger batches "
                        "amortise dispatch latency)")
    add_dispatch_args(p)
    p.add_argument("--step_size", type=int, default=50)
    p.add_argument("--gamma", type=float, default=0.5)
    add_pc_args(p)
    add_model_args(p)
    p.add_argument("--seed", default=321, type=int)
    p.add_argument("--only_evaluate", action="store_true", default=False)
    p.add_argument("--basis_path", type=str, default="")
    p.add_argument("--base_class_gp_coding_path", type=str, default="")
    p.add_argument("--energy", type=float, default=0.9,
                   help="coding energy threshold, must be <= 1")
    p.add_argument("--eval_weight", type=float, default=1.0,
                   help="beta re-weighting; validation=1.0, testing > 1.0")
    p.add_argument("--mesh", type=str, default="data",
                   choices=["data", "dxp"], dest="mesh_shape",
                   help="device mesh for evaluation: 'data' = 1-D data "
                        "parallel; 'dxp' = 2-D data x points (sequence "
                        "parallelism over the point axis for N >> 2048)")
    p.add_argument("--mesh_sp", type=int, default=2,
                   help="devices along the points axis of the dxp mesh")
    return p


def main(argv=None):
    from gfs3dseg_gws_tpu.cli.common import apply_platform_env

    apply_platform_env()
    args = build_parser().parse_args(argv)
    assert args.energy <= 1

    model_cfg = model_config_from_args(args)
    data_cfg = data_config_from_args(args)
    train_cfg = TrainConfig(
        batch_size=args.batch_size,
        eval_batch_size=args.eval_batch_size,
        base_lr=args.base_lr,
        epochs=args.epochs,
        start_epoch=args.start_epoch,
        step_size=args.step_size,
        gamma=args.gamma,
        energy=args.energy,
        eval_weight=args.eval_weight,
        seed=args.seed,
        save_path=args.save_path,
        print_freq=args.print_freq,
        steps_per_dispatch=args.steps_per_dispatch,
        h2d=args.h2d,
        evaluate=args.evaluate,
        only_evaluate=args.only_evaluate,
        use_pretrain_weight=args.use_pretrain_weight,
        pretrain_checkpoint_path=args.pretrain_checkpoint_path,
        model_checkpoint_path=args.model_checkpoint_path,
        basis_path=args.basis_path,
        mesh_shape=args.mesh_shape,
        mesh_sp=args.mesh_sp,
    )

    from gfs3dseg_gws_tpu.pipelines.gfs import evaluate_gfs, train_gfs

    if args.only_evaluate:
        return evaluate_gfs(model_cfg, data_cfg, train_cfg)
    return train_gfs(model_cfg, data_cfg, train_cfg)
