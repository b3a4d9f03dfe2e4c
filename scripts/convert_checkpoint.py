#!/usr/bin/env python
"""Convert checkpoints between the reference torch formats and our npz.

Usage:
  # reference GFS model .pth -> npz (loadable by train.py --model_checkpoint_path)
  python scripts/convert_checkpoint.py gfs-to-npz  model.pth out.npz

  # our GFS npz -> reference-format .pth (consumable by the torch reference)
  python scripts/convert_checkpoint.py npz-to-gfs  ckpt.npz out.pth

  # reference pretrain checkpoint.tar (or its dir) -> encoder npz
  python scripts/convert_checkpoint.py pretrain-to-npz  log_pretrain_dir out.npz

  # our pretrain npz -> reference checkpoint.tar (written into OUT_DIR)
  python scripts/convert_checkpoint.py npz-to-pretrain  checkpoint.npz out_dir

  # reference base_class_gp_coding_energy={e}.pth -> npz (and back)
  python scripts/convert_checkpoint.py coding-to-npz  coding.pth out.npz
  python scripts/convert_checkpoint.py npz-to-coding  coding.npz out.pth

  # reference episodic-baseline (ProtoNet/MPTI) checkpoint.tar (or its
  # dir) -> npz; and our few-shot npz -> reference checkpoint.tar dir
  python scripts/convert_checkpoint.py fewshot-to-npz  log_proto_dir out.npz
  python scripts/convert_checkpoint.py npz-to-fewshot  ckpt.npz out_dir
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["gfs-to-npz", "npz-to-gfs",
                                    "pretrain-to-npz", "npz-to-pretrain",
                                    "coding-to-npz", "npz-to-coding",
                                    "fewshot-to-npz", "npz-to-fewshot"])
    p.add_argument("src")
    p.add_argument("dst")
    args = p.parse_args()

    from gfs3dseg_gws_tpu.utils.checkpoint import (
        load_checkpoint,
        load_torch_coding,
        load_torch_gfs_checkpoint,
        load_torch_pretrain_checkpoint,
        save_checkpoint,
        save_torch_coding,
        save_torch_gfs_checkpoint,
        save_torch_pretrain_checkpoint,
    )
    from gfs3dseg_gws_tpu.pipelines.gfs import _unflat

    if args.mode == "coding-to-npz":
        import numpy as np
        np.savez(args.dst, coding=load_torch_coding(args.src))
    elif args.mode == "npz-to-coding":
        import numpy as np
        with np.load(args.src) as z:
            save_torch_coding(z["coding"], args.dst)
    elif args.mode == "gfs-to-npz":
        params, stats, meta = load_torch_gfs_checkpoint(args.src)
        save_checkpoint(args.dst, {"params": params, "batch_stats": stats},
                        meta)
    elif args.mode == "npz-to-gfs":
        flat, meta = load_checkpoint(args.src)
        params = _unflat({k[len("params/"):]: v for k, v in flat.items()
                          if k.startswith("params/")})
        stats = _unflat({k[len("batch_stats/"):]: v for k, v in flat.items()
                         if k.startswith("batch_stats/")})
        save_torch_gfs_checkpoint(params, stats, args.dst,
                                  epoch=int(meta.get("epoch", 0)),
                                  max_iou=float(meta.get("max_iou", 0.0)))
    elif args.mode == "pretrain-to-npz":
        enc_p, enc_s = load_torch_pretrain_checkpoint(args.src)
        save_checkpoint(args.dst, {"params": {"encoder": enc_p},
                                   "batch_stats": {"encoder": enc_s}})
    elif args.mode == "npz-to-pretrain":
        flat, _ = load_checkpoint(args.src)
        enc_p = _unflat({k[len("params/encoder/"):]: v
                         for k, v in flat.items()
                         if k.startswith("params/encoder/")})
        enc_s = _unflat({k[len("batch_stats/encoder/"):]: v
                         for k, v in flat.items()
                         if k.startswith("batch_stats/encoder/")})
        save_torch_pretrain_checkpoint(enc_p, enc_s, args.dst)
    elif args.mode == "fewshot-to-npz":
        from gfs3dseg_gws_tpu.utils.checkpoint import (
            load_torch_fewshot_checkpoint)
        params, stats, meta = load_torch_fewshot_checkpoint(args.src)
        save_checkpoint(args.dst, {"params": params, "batch_stats": stats},
                        meta)
    else:  # npz-to-fewshot
        from gfs3dseg_gws_tpu.utils.checkpoint import (
            save_torch_fewshot_checkpoint)
        flat, meta = load_checkpoint(args.src)
        params = _unflat({k[len("params/"):]: v for k, v in flat.items()
                          if k.startswith("params/")})
        stats = _unflat({k[len("batch_stats/"):]: v for k, v in flat.items()
                         if k.startswith("batch_stats/")})
        save_torch_fewshot_checkpoint(
            params, stats, args.dst,
            iteration=int(meta.get("iteration", 0)),
            iou=float(meta.get("IoU", meta.get("best_iou", 0.0))),
            loss=float(meta.get("loss", 0.0)))
    print(f"{args.mode}: {args.src} -> {args.dst}")


if __name__ == "__main__":
    main()
