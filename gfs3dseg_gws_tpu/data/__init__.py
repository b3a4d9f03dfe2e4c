"""Host-side data pipeline: registries, samplers, static sets, preprocessing.

Everything here is deterministic numpy feeding fixed-shape (B, N, 9) batches
to the device; on-disk formats (block .npy files, class2scans.pkl, ValSupp /
static_test pickle trees, h5 episode banks) are byte-compatible with the
reference layout so existing prepared datasets drop in unchanged.
"""

from gfs3dseg_gws_tpu.data.registry import DatasetRegistry, S3DIS_CLASSNAMES, SCANNET_CLASSNAMES
from gfs3dseg_gws_tpu.data.sampler import (
    augment_pointcloud,
    sample_k_pointclouds,
    sample_pointcloud,
)
from gfs3dseg_gws_tpu.data.datasets import (
    PretrainBlockDataset,
    TestingDataset,
    ValSuppDataset,
)
from gfs3dseg_gws_tpu.data.pipeline import batch_iterator
from gfs3dseg_gws_tpu.data.synthetic import (make_synthetic_blocks,
                                             make_synthetic_geometry_blocks)

__all__ = [
    "DatasetRegistry",
    "S3DIS_CLASSNAMES",
    "SCANNET_CLASSNAMES",
    "augment_pointcloud",
    "sample_pointcloud",
    "sample_k_pointclouds",
    "PretrainBlockDataset",
    "TestingDataset",
    "ValSuppDataset",
    "batch_iterator",
    "make_synthetic_blocks",
    "make_synthetic_geometry_blocks",
]
