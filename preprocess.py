#!/usr/bin/env python
"""Preprocessing entry point (collect_s3dis / collect_scannet / room2blocks)."""
from gfs3dseg_gws_tpu.cli.preprocess_cli import main

if __name__ == "__main__":
    main()
