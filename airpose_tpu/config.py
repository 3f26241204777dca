"""Typed configuration (replaces the reference's argparse hparams +
editable config.py/constants.py modules — SURVEY.md §2.7).

Every field of `LossWeights`/`TrainConfig` replicates a reference hparam
with the same default (ref copenet/copenet_twoview.py:629-684).
"""

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Loss-term weights (ref copenet_twoview.py:662-676)."""

    shape: float = 50.0          # --shape_loss_weight (per-vertex)
    keypoint2d: float = 0.002    # --keypoint2d_loss_weight
    keypoint3d: float = 1.0      # --keypoint3d_loss_weight
    limbs3d: float = 3.0         # --limbs3d_loss_weight
    limbstheta: float = 1.0      # --limbstheta_loss_weight
    trans: float = 10.0          # --trans_loss_weight
    rootrot: float = 1.0         # --rootrot_loss_weight
    pose: float = 50.0           # --pose_loss_weight
    beta: float = 1.0            # --beta_loss_weight
    total_scale: float = 60.0    # ref copenet_twoview.py:150 (`loss *= 60`)


@dataclasses.dataclass(frozen=True)
class RealLossWeights:
    """Self-supervised fine-tune weights (defaults from
    ref copenet_real/copenet_twoview.py:599-614)."""

    keypoint2d: float = 0.001
    limbs2d: float = 1.5
    vposer: float = 1.0
    pose: float = 1.0      # cross-view pose consistency
    beta: float = 1.0
    total_scale: float = 60.0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    model: str = "copenet_twoview"   # MODEL_REGISTRY key
    lr: float = 5e-5                 # --lr (Adam amsgrad, wd 0)
    batch_size: int = 30             # --batch_size
    val_batch_size: int = 30
    reg_iters: int = 3               # --reg_iters
    img_res: int = 224               # --img_res
    smpltrans_noise_sigma: Optional[float] = None  # --smpltrans_noise_sigma
    trans_scale: float = 0.05        # distance scaling (copenet_twoview.py:201)
    summary_steps: int = 500
    checkpoint_steps: int = 10000
    train_reg_only: bool = False     # freeze all but fc/dec heads (real pkg)
    qat: bool = False                # STE fake-quant of trunk convs in the
                                     # train forward (int8 deployment
                                     # recovery path — ops/qat.py)
    qat_levels: float = 127.0        # quant grid (127 = int8)
    qat_act: bool = False            # also fake-quant the trunk conv INPUT
                                     # activations (per-tensor STE at the
                                     # deployed quantization points)
    loss: LossWeights = dataclasses.field(default_factory=LossWeights)
    real_loss: RealLossWeights = dataclasses.field(default_factory=RealLossWeights)
    # TPU execution
    trunk_bf16: bool = True
    mesh_axes: Tuple[str, ...] = ("data",)
    seed: int = 123                  # ref copenet_trainer.py:20-22
