"""Preprocessing CLI: scene collection + room->block splitting.

Mirrors reference pretrain/preprocess/{collect_s3dis_data,
collect_scannet_data,room2blocks}.py, with the reference's hard-coded
ROOT_DIR paths replaced by flags.
"""
from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="[Preprocessing] collect scenes "
                                "and split rooms into blocks")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("collect_s3dis",
                       help="Aggregate S3DIS room annotations into npy "
                            "scenes (reference collect_s3dis_data.py)")
    c.add_argument("--data_path", required=True,
                   help="Stanford3dDataset_v1.2_Aligned_Version directory")
    c.add_argument("--out_root", required=True,
                   help="destination dataset root (gets scenes/, meta/)")
    c.add_argument("--train", action="store_true",
                   help="Areas 1-5 (train) instead of Area 6 (test)")

    c = sub.add_parser("collect_scannet",
                       help="ply+json -> npy scenes (reference "
                            "collect_scannet_data.py)")
    c.add_argument("--data_path", required=True, help="scans directory")
    c.add_argument("--out_root", required=True)
    c.add_argument("--tsv_path", default=None,
                   help="scannetv2-labels.combined.tsv (default: the "
                        "vendored canonical copy)")
    c.add_argument("--val_list", default=None,
                   help="scannetv2_val.txt (default: the vendored "
                        "canonical v2 split)")

    b = sub.add_parser("room2blocks",
                       help="Split scenes into 1m XY blocks (reference "
                            "room2blocks.py)")
    b.add_argument("--data_path", required=True, help="scenes/ directory")
    b.add_argument("--dataset", default="s3dis")
    b.add_argument("--block_size", type=float, default=1.0)
    b.add_argument("--stride", type=float, default=1.0)
    b.add_argument("--min_npts", type=int, default=1000)
    b.add_argument("--train", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from gfs3dseg_gws_tpu.data import preprocess as pp
    from gfs3dseg_gws_tpu.data.registry import (
        S3DIS_CLASSNAMES,
        SCANNET_CLASSNAMES,
    )

    if args.cmd == "collect_s3dis":
        os.makedirs(os.path.join(args.out_root, "meta"), exist_ok=True)
        with open(os.path.join(args.out_root, "meta",
                               "s3dis_classnames.txt"), "w") as f:
            f.write("\n".join(S3DIS_CLASSNAMES) + "\n")
        written = pp.collect_s3dis(args.data_path, args.out_root,
                                   S3DIS_CLASSNAMES, train=args.train)
        print(f"collected {len(written)} scenes")
    elif args.cmd == "collect_scannet":
        os.makedirs(os.path.join(args.out_root, "meta"), exist_ok=True)
        with open(os.path.join(args.out_root, "meta",
                               "scannet_classnames.txt"), "w") as f:
            f.write("\n".join(SCANNET_CLASSNAMES) + "\n")
        val = pp.load_scannet_val_scenes(args.val_list)
        written = pp.collect_scannet(args.data_path, args.out_root,
                                     SCANNET_CLASSNAMES, args.tsv_path, val)
        print(f"collected {len(written)} scenes")
    elif args.cmd == "room2blocks":
        count = pp.split_rooms_to_blocks(
            args.data_path, os.path.dirname(args.data_path.rstrip("/")),
            train=args.train, block_size=args.block_size, stride=args.stride,
            min_npts=args.min_npts)
        print(f"Total samples: {count}")
