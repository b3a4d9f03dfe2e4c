"""End-to-end drivers: pretrain, get_basis, GFS train/evaluate, baselines."""
