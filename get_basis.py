#!/usr/bin/env python
"""Geometric-word extraction entry point (mirrors reference get_basis.py CLI)."""
from gfs3dseg_gws_tpu.cli.basis_cli import main

if __name__ == "__main__":
    main()
