from .metrics import (
    canonical_joints,
    mpe,
    mpjpe,
    pa_mpjpe,
    procrustes_align,
    twoview_eval_metrics,
)

__all__ = [
    "canonical_joints",
    "mpe",
    "mpjpe",
    "pa_mpjpe",
    "procrustes_align",
    "twoview_eval_metrics",
]
