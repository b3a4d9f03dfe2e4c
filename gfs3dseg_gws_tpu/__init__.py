"""gfs3dseg_gws_tpu — TPU-native framework for Generalized Few-Shot 3D Point Cloud
Segmentation via Geometric Words (ICCV 2023, arXiv 2309.11222).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the PyTorch/CUDA
reference (Pixie8888/GFS-3DSeg_GWs): DGCNN backbone, geometric-word extraction,
CAPL-style prototype head, GFS train/eval pipelines, plus the legacy few-shot
baselines (ProtoNet, MPTI, FineTune) and the S3DIS/ScanNet data tooling.

Layering (bottom-up):
  ops/       fused TPU kernels & numerics (kNN, EdgeConv, k-means, FPS, IoU, ...)
  models/    flax modules (DGCNN, attention, GW/CAPL head, baselines)
  parallel/  device mesh, sharded (pjit) train/eval steps
  data/      host-side pipeline: preprocessing, registries, samplers, episodes
  pipelines/ end-to-end drivers (pretrain, get_basis, train, evaluate)
  utils/     config, logging, checkpointing (incl. torch-format converters)
"""

__version__ = "0.1.0"
