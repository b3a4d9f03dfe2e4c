#!/usr/bin/env python
"""GFS train/evaluate entry point (flags mirror the reference train.py CLI)."""
from gfs3dseg_gws_tpu.cli.train_cli import main

if __name__ == "__main__":
    main()
