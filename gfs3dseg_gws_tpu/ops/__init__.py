"""TPU kernels and numerics.

Every op has a pure-XLA implementation (works on CPU for tests) and, where it
is a proven hot spot, a fused Pallas TPU kernel selected automatically.
"""

from gfs3dseg_gws_tpu.ops.knn import knn_indices, pairwise_sq_dists
from gfs3dseg_gws_tpu.ops.edgeconv import gather_neighbors
from gfs3dseg_gws_tpu.ops.coding import energy_multihot
from gfs3dseg_gws_tpu.ops.metrics import confusion_matrix, iou_from_confusion
from gfs3dseg_gws_tpu.ops.fps import farthest_point_sampling
from gfs3dseg_gws_tpu.ops.kmeans import kmeans
from gfs3dseg_gws_tpu.ops.linalg import svd_energy_reconstruct, label_propagate

__all__ = [
    "knn_indices",
    "pairwise_sq_dists",
    "gather_neighbors",
    "energy_multihot",
    "confusion_matrix",
    "iou_from_confusion",
    "farthest_point_sampling",
    "kmeans",
    "svd_energy_reconstruct",
    "label_propagate",
]
