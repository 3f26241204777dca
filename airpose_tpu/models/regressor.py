"""Iterative-error-feedback (IEF) regressor heads.

All four AirPose model families share this MLP: concat(conditioning) →
fc1(1024) → dropout → fc2(1024) → dropout → {decpose, decshape[, deccam]}
added as residual deltas to the current state (ref
copenet/models/model_copenet.py:67-76,178-204 and siblings). The concat
*order* per family is fixed by the checkpoint layout and implemented in
`airpose.py`; this module is layout-agnostic.

TPU note: the MLP runs in f32 (tiny vs the trunk, and the IEF residual
accumulation is precision-sensitive).
"""

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# torch nn.init.xavier_uniform_(w, gain=0.01) ≡ variance_scaling(gain²=1e-4,
# fan_avg, uniform) — ref model_copenet.py:74-76.
head_init = nn.initializers.variance_scaling(1e-4, "fan_avg", "uniform")


class RegressorCore(nn.Module):
    """One IEF step's MLP. Returns one delta per head."""

    head_dims: Tuple[int, ...]
    head_names: Tuple[str, ...]
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, xc: jnp.ndarray, train: bool = False):
        h = nn.Dense(1024, name="fc1")(xc)
        h = nn.Dropout(self.dropout_rate, deterministic=not train, name="drop1")(h)
        h = nn.Dense(1024, name="fc2")(h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train, name="drop2")(h)
        return tuple(
            nn.Dense(d, kernel_init=head_init, name=name)(h)
            for d, name in zip(self.head_dims, self.head_names)
        )


def load_mean_params(path: str = None):
    """Mean SMPL parameters used as IEF initialization (ref
    model_copenet.py:86-92). Returns (pose_6d (144,), shape (10,), cam (3,))
    float32 numpy arrays."""
    import os

    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(__file__)), "data", "assets",
            "smpl_mean_params.npz",
        )
    d = np.load(path)
    return (
        np.asarray(d["pose"], dtype=np.float32),
        np.asarray(d["shape"], dtype=np.float32),
        np.asarray(d["cam"], dtype=np.float32),
    )
