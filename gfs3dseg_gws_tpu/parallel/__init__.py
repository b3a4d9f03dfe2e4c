"""Device mesh + SPMD train/eval steps.

The reference is single-GPU (SURVEY.md §2.3); the TPU framework scales the
same workload data-parallel over an ICI mesh: batches are sharded over the
`data` axis, parameters replicated, and XLA's GSPMD partitioner inserts the
gradient all-reduce and the cross-device reductions inside BatchNorm,
fake-prototype class means and confusion matrices automatically.
"""

from gfs3dseg_gws_tpu.parallel.mesh import (
    make_batch_putter,
    make_mesh,
    make_mesh_dxp,
    shard_batch,
    shard_stacked_batch,
    replicate,
    batch_sharding,
    replicated_sharding,
)
from gfs3dseg_gws_tpu.parallel.optim import make_gfs_optimizer, step_lr
from gfs3dseg_gws_tpu.parallel.steps import (
    TrainState,
    device_put_packed,
    host_init,
    jit_init,
    make_gfs_train_step,
    make_gfs_multi_train_step,
    make_gfs_eval_step,
    make_pretrain_step,
    make_pretrain_multi_step,
    pack_batch,
    unpack_labels,
    make_coding_step,
    make_fg_feat_step,
)

__all__ = [
    "make_batch_putter",
    "make_mesh",
    "make_mesh_dxp",
    "shard_batch",
    "shard_stacked_batch",
    "replicate",
    "batch_sharding",
    "replicated_sharding",
    "make_gfs_optimizer",
    "step_lr",
    "TrainState",
    "device_put_packed",
    "host_init",
    "jit_init",
    "make_gfs_train_step",
    "make_gfs_multi_train_step",
    "make_gfs_eval_step",
    "make_pretrain_step",
    "make_pretrain_multi_step",
    "pack_batch",
    "unpack_labels",
    "make_coding_step",
    "make_fg_feat_step",
]
