from gfs3dseg_gws_tpu.utils.logging import IOStream, AverageMeter, init_logger
from gfs3dseg_gws_tpu.utils.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    restore_into,
)

__all__ = [
    "IOStream",
    "AverageMeter",
    "init_logger",
    "save_checkpoint",
    "load_checkpoint",
    "restore_into",
]
