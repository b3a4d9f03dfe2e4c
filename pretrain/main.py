#!/usr/bin/env python
"""Pretrain + few-shot baselines entry point (mirrors reference
pretrain/main.py phases: pretrain/finetune/prototrain/protoeval/mptitrain/
mptieval, plus mptigfs)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gfs3dseg_gws_tpu.cli.pretrain_cli import main

if __name__ == "__main__":
    main()
