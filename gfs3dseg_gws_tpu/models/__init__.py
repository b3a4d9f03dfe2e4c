"""Flax modules: DGCNN backbone, attention, segmentors, GW/CAPL head, baselines.

All modules use the TPU-friendly channel-LAST layout (B, N, C) — 1x1 convs
become plain Dense matmuls on the MXU — whereas the reference is channel-first
(B, C, N). Checkpoint converters transpose accordingly.
"""

from gfs3dseg_gws_tpu.models.layers import ConvBN, MLPStack, l2norm
from gfs3dseg_gws_tpu.models.attention import SelfAttention
from gfs3dseg_gws_tpu.models.dgcnn import DGCNN, EdgeConvBlock, BaseLearner
from gfs3dseg_gws_tpu.models.dgcnnseg import DGCNNSeg, DGCNNSegAtt
from gfs3dseg_gws_tpu.models.capl import GWCAPL

__all__ = [
    "ConvBN",
    "MLPStack",
    "l2norm",
    "SelfAttention",
    "DGCNN",
    "EdgeConvBlock",
    "BaseLearner",
    "DGCNNSeg",
    "DGCNNSegAtt",
    "GWCAPL",
]
