"""Pretrain/baselines CLI (reference pretrain/main.py:14-136).

Phases: pretrain | finetune | prototrain | protoeval | mptitrain | mptieval
(+ mptigfs for the GFS-style MPTI evaluation from mpti_learner.test_gfs).
Log-dir naming mirrors the reference's composition per phase.
"""
from __future__ import annotations

import argparse
import os

from gfs3dseg_gws_tpu.cli.common import (
    add_dispatch_args,
    add_model_args,
    add_pc_args,
    data_config_from_args,
    model_config_from_args,
)
from gfs3dseg_gws_tpu.utils.config import PretrainConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--phase", type=str, default="pretrain",
                   choices=["pretrain", "finetune", "prototrain", "protoeval",
                            "mptitrain", "mptieval", "mptigfs"])
    p.add_argument("--dataset", type=str, default="s3dis")
    p.add_argument("--cvfold", type=int, default=0)
    p.add_argument("--data_path", type=str,
                   default="./datasets/S3DIS/blocks_bs1_s1")
    p.add_argument("--pretrain_checkpoint_path", type=str, default=None)
    p.add_argument("--model_checkpoint_path", type=str, default=None)
    p.add_argument("--save_path", type=str, default="./log_s3dis/")
    p.add_argument("--eval_interval", type=int, default=1500)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--n_workers", type=int, default=16)
    p.add_argument("--n_iters", type=int, default=30000)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--step_size", type=int, default=5000)
    p.add_argument("--gamma", type=float, default=0.5)
    p.add_argument("--pretrain_lr", type=float, default=0.001)
    p.add_argument("--pretrain_weight_decay", type=float, default=0.0)
    p.add_argument("--pretrain_step_size", type=int, default=50)
    p.add_argument("--pretrain_gamma", type=float, default=0.5)
    p.add_argument("--n_way", type=int, default=2)
    p.add_argument("--k_shot", type=int, default=1)
    p.add_argument("--n_queries", type=int, default=1)
    p.add_argument("--n_episode_test", type=int, default=100)
    add_pc_args(p)
    add_model_args(p, attention_action="store_true")
    p.add_argument("--dist_method", default="euclidean",
                   help="cosine|euclidean")
    p.add_argument("--n_subprototypes", type=int, default=100)
    p.add_argument("--k_connect", type=int, default=200)
    p.add_argument("--sigma", type=float, default=1.0)
    p.add_argument("--triplet_loss_weight", type=float, default=-1)
    p.add_argument("--testing_data_path", type=str, default="")
    p.add_argument("--log_dir", type=str, default="")
    p.add_argument("--seed", type=int, default=321)
    add_dispatch_args(p)
    return p


def main(argv=None):
    from gfs3dseg_gws_tpu.cli.common import apply_platform_env

    apply_platform_env()
    args = build_parser().parse_args(argv)
    model_cfg = model_config_from_args(args)
    data_cfg = data_config_from_args(args)

    from gfs3dseg_gws_tpu.pipelines.baselines import (
        FewShotConfig,
        episodic_eval,
        episodic_train,
        finetune,
        mpti_test_gfs,
    )

    fs_cfg = FewShotConfig(
        n_way=args.n_way, k_shot=args.k_shot, n_queries=args.n_queries,
        n_iters=args.n_iters, lr=args.lr, step_size=args.step_size,
        gamma=args.gamma, eval_interval=args.eval_interval,
        n_episode_test=args.n_episode_test, dist_method=args.dist_method,
        n_subprototypes=args.n_subprototypes, k_connect=args.k_connect,
        sigma=args.sigma, use_attention=args.use_attention, seed=args.seed,
        h2d=args.h2d)

    if args.phase == "pretrain":
        log_dir = os.path.join(
            args.save_path,
            f"log_pretrain_{args.dataset}_S{args.cvfold}_LongTail")
        pre_cfg = PretrainConfig(
            batch_size=args.batch_size, lr=args.pretrain_lr,
            weight_decay=args.pretrain_weight_decay, n_iters=args.n_iters,
            step_size=args.pretrain_step_size, gamma=args.pretrain_gamma,
            eval_interval=args.eval_interval, seed=args.seed,
            log_dir=log_dir, steps_per_dispatch=args.steps_per_dispatch,
            h2d=args.h2d)
        from gfs3dseg_gws_tpu.pipelines.pretrain import pretrain

        return pretrain(model_cfg, data_cfg, pre_cfg)

    if args.phase == "prototrain":
        log_dir = args.save_path + (
            f"log_proto_{args.dataset}_S{args.cvfold}_N{args.n_way}"
            f"_K{args.k_shot}_TL{int(args.triplet_loss_weight > 0)}"
            f"_Att{int(args.use_attention)}")
        fs_cfg = _with_logdir(fs_cfg, log_dir)
        return episodic_train("proto", model_cfg, data_cfg, fs_cfg,
                              args.pretrain_checkpoint_path or "",
                              args.model_checkpoint_path or "")
    if args.phase == "mptitrain":
        log_dir = os.path.join(
            args.save_path,
            f"log_mpti_S{args.cvfold}_N{args.n_way}_K{args.k_shot}"
            f"_Att{int(args.use_attention)}_{args.log_dir}")
        fs_cfg = _with_logdir(fs_cfg, log_dir)
        return episodic_train("mpti", model_cfg, data_cfg, fs_cfg,
                              args.pretrain_checkpoint_path or "",
                              args.model_checkpoint_path or "")
    if args.phase in ("protoeval", "mptieval"):
        kind = "proto" if args.phase == "protoeval" else "mpti"
        fs_cfg = _with_logdir(fs_cfg, args.model_checkpoint_path or
                              args.save_path)
        return episodic_eval(kind, model_cfg, data_cfg, fs_cfg,
                             args.model_checkpoint_path)
    if args.phase == "mptigfs":
        fs_cfg = _with_logdir(fs_cfg, args.save_path)
        return mpti_test_gfs(model_cfg, data_cfg, fs_cfg,
                             args.model_checkpoint_path,
                             args.testing_data_path)
    if args.phase == "finetune":
        log_dir = args.save_path + (
            f"log_finetune_{args.dataset}_S{args.cvfold}_N{args.n_way}"
            f"_K{args.k_shot}")
        fs_cfg = _with_logdir(fs_cfg, log_dir)
        return finetune(model_cfg, data_cfg, fs_cfg,
                        args.pretrain_checkpoint_path or "",
                        inner_iters=args.n_iters)
    raise ValueError("Please set correct phase.")


def _with_logdir(fs_cfg, log_dir):
    import dataclasses

    return dataclasses.replace(fs_cfg, log_dir=log_dir)
