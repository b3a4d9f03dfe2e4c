"""Geometric-word extraction CLI (reference get_basis.py:226-313)."""
from __future__ import annotations

import argparse
import os

from gfs3dseg_gws_tpu.cli.common import (
    add_data_args,
    add_model_args,
    add_pc_args,
    data_config_from_args,
    model_config_from_args,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    add_data_args(p)
    p.add_argument("--pretrain_checkpoint_path", type=str, default="",
                   help="pretrain weight (torch checkpoint.tar dir or our "
                        ".npz)")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--n_iters", type=int, default=100)
    p.add_argument("--pretrain_lr", type=float, default=0.001)
    p.add_argument("--pretrain_weight_decay", type=float, default=0.0001)
    p.add_argument("--pretrain_step_size", type=int, default=50)
    p.add_argument("--pretrain_gamma", type=float, default=0.5)
    p.add_argument("--n_way", type=int, default=2)
    p.add_argument("--n_queries", type=int, default=1)
    p.add_argument("--n_episode_test", type=int, default=100)
    add_pc_args(p)
    add_model_args(p)
    p.add_argument("--dist_method", default="gaussian")
    p.add_argument("--n_subprototypes", type=int, default=100)
    p.add_argument("--k_connect", type=int, default=200)
    p.add_argument("--sigma", type=float, default=1.0)
    p.add_argument("--num_cnt", type=int, default=10,
                   help="number of geometric words (global k-means centres)")
    p.add_argument("--seed", default=123, type=int)
    p.add_argument("--save_path", type=str, default="log_s3dis/S0_K5",
                   help="path to save the basis")
    return p


def main(argv=None):
    from gfs3dseg_gws_tpu.cli.common import apply_platform_env

    apply_platform_env()
    args = build_parser().parse_args(argv)
    model_cfg = model_config_from_args(args)
    data_cfg = data_config_from_args(args)
    os.makedirs(args.save_path, exist_ok=True)

    from gfs3dseg_gws_tpu.pipelines.basis import extract_basis

    return extract_basis(
        model_cfg, data_cfg, num_cnt=args.num_cnt,
        pretrain_checkpoint_path=args.pretrain_checkpoint_path,
        save_dir=args.save_path, seed=args.seed)
