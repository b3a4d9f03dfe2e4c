"""Configuration dataclasses shared by all pipelines.

Field names and defaults mirror the reference CLIs so that launch commands
carry over (reference: train.py:733-831, get_basis.py:226-299,
pretrain/main.py:15-102), while the values feed a functional JAX stack.
"""
from __future__ import annotations

import ast
import dataclasses
from dataclasses import dataclass
from typing import Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Backbone + head architecture (reference defaults: train.py:799-808)."""

    pc_attribs: str = "xyzrgbXYZ"
    pc_npts: int = 2048
    dgcnn_k: int = 20
    edgeconv_widths: Tuple[Tuple[int, ...], ...] = ((64, 64), (64, 64), (64, 64))
    dgcnn_mlp_widths: Tuple[int, ...] = (512, 256)
    base_widths: Tuple[int, ...] = (128, 64)
    output_dim: int = 64          # self-attention output channels
    attn_dropout: float = 0.1     # dropout on attention weights (attention.py:30)
    use_attention: bool = True    # baselines may swap attention for a linear map
    # CAPL head
    main_dim: int = 128           # prototype dimension (capl.py:54)
    cosine_scale: float = 10.0    # logits scaling (capl.py:322,349)
    use_pallas: bool = True       # fused Pallas TPU kernels (XLA fallback elsewhere)

    @property
    def pc_in_dim(self) -> int:
        return len(self.pc_attribs)

    @property
    def feat_dim(self) -> int:
        """Semantic feature dim = edgeconv1 + attention + base-learner outputs."""
        return self.edgeconv_widths[0][-1] + self.output_dim + self.base_widths[-1]

    @property
    def edgeconv_out_dim(self) -> int:
        """Concatenated EdgeConv1-3 output dim (geometric-word feature space)."""
        return sum(w[-1] for w in self.edgeconv_widths)


@dataclass(frozen=True)
class DataConfig:
    """Dataset + episode configuration (reference: train.py:750-797)."""

    dataset: str = "s3dis"        # s3dis | scannet
    cvfold: int = 0
    data_path: str = ""
    testing_data_path: str = ""
    total_classes: int = 13
    k_shot: int = 5
    pc_npts: int = 2048
    pc_attribs: str = "xyzrgbXYZ"
    pc_augm: bool = False
    pc_augm_scale: float = 0.0
    pc_augm_rot: int = 1
    pc_augm_mirror_prob: float = 0.0
    pc_augm_jitter: int = 1
    n_workers: int = 8
    support_seeds: Tuple[int, ...] = (10, 20, 30, 40, 50)

    @property
    def augment_config(self) -> dict:
        return {
            "scale": self.pc_augm_scale,
            "rot": self.pc_augm_rot,
            "mirror_prob": self.pc_augm_mirror_prob,
            "jitter": self.pc_augm_jitter,
        }


@dataclass(frozen=True)
class TrainConfig:
    """Optimization schedule (reference: train.py:738-746,773-778,815-816)."""

    batch_size: int = 16
    eval_batch_size: int = 0       # 0 = auto: 256 on TPU (dispatch-latency
                                   # amortisation, results are batch-
                                   # invariant), else batch_size
    base_lr: float = 0.01
    encoder_lr_scale: float = 0.1  # encoder param group: 0.1x base_lr (train.py:428)
    epochs: int = 150
    start_epoch: int = 0
    step_size: int = 50            # StepLR period (epochs)
    gamma: float = 0.5             # StepLR decay
    weight_decay: float = 0.0
    energy: float = 0.9            # GW coding energy threshold (0.9 S3DIS / 0.95 ScanNet)
    eval_weight: float = 1.0       # beta reweighting (1.0 val / 1.2 test)
    num_cnt: int = 150             # geometric words (150 S3DIS / 180 ScanNet)
    seed: int = 321
    save_path: str = "log_s3dis/S0_K5/debug"
    print_freq: int = 20
    steps_per_dispatch: int = 1    # >1: chain S train steps into one
                                   # lax.scan dispatch (bit-identical
                                   # updates; amortises tunnel launch
                                   # latency; prints at >=S granularity)
    h2d: str = "auto"              # train-batch transfer: "exact" (f32),
                                   # "packed" (one u8 buffer/batch, f16
                                   # coords), "auto" = packed on TPU
                                   # (GFS3D_EXACT_H2D=1 forces exact)
    eval_interval: int = 5         # validate every 5 epochs (train.py:518)
    coding_interval: int = 5       # re-estimate base codings every 5 epochs (train.py:512)
    evaluate: bool = True
    only_evaluate: bool = False
    use_pretrain_weight: bool = False
    pretrain_checkpoint_path: str = ""
    model_checkpoint_path: str = ""
    basis_path: str = ""
    mesh_shape: str = "data"       # "data" (1-D dp) | "dxp" (2-D data x
                                   # points sequence parallelism, eval path)
    mesh_sp: int = 2               # devices along the points axis for dxp


@dataclass(frozen=True)
class PretrainConfig:
    """Backbone pre-training schedule (reference: pretrain/pretrain_segmentor.sh)."""

    batch_size: int = 16
    lr: float = 0.001
    weight_decay: float = 1e-4
    n_iters: int = 100            # epochs
    step_size: int = 50
    gamma: float = 0.5
    eval_interval: int = 3
    dropout: float = 0.3
    seed: int = 321
    log_dir: str = "log_pretrain"
    steps_per_dispatch: int = 1    # >1: chain S steps into one lax.scan
                                   # dispatch (see TrainConfig)
    h2d: str = "auto"              # batch transfer mode (see TrainConfig)


def parse_widths(text: str) -> Tuple:
    """Parse list-valued CLI flags like '[[64,64], [64, 64], [64, 64]]'
    (reference: train.py:819-821)."""
    value = ast.literal_eval(text)

    def _tup(v):
        return tuple(_tup(x) for x in v) if isinstance(v, (list, tuple)) else v

    return _tup(value)


def replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)
