"""Pallas TPU kernel: fused LBS skinning.

The jnp skinning path materializes the per-vertex transform T = W·A as a
(B, V, 16) HBM intermediate (~2.7 MB/sample, written then re-read —
bodymodel/lbs.py). This kernel fuses the two steps: per (vertex-tile,
batch) grid cell it computes T's tile on the MXU in VMEM and immediately
applies it to the posed vertices on the VPU, so HBM sees only the inputs
and the (B, 3, V) output (~10× less skinning traffic).

Layout: vertices live on the LANE axis (last dim = V tiles of 512), the
joint axis is padded to 128 so the (16, 128)·(128, 512) tile matmul is
MXU-shaped. The weight tile's index map is independent of the inner batch
grid dimension, so Pallas keeps it resident across the whole batch sweep.

Numerically identical to the jnp path (test: tests/test_pallas_lbs.py);
`lbs_fused_verts` falls back to the jnp formulation off-TPU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_TILE = 2048
JOINT_PAD = 128
BATCH_TILE = 8  # 8 samples × 16 transform rows = one MXU-high (128) matmul


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _skinning_kernel(wt_ref, a_ref, pt_ref, out_ref):
    # Stacked T^T tile: (Bt·16, Vt) = A_stack (Bt·16, Jp) @ W^T (Jp, Vt).
    T = jnp.dot(
        a_ref[:].reshape(BATCH_TILE * 16, -1), wt_ref[:],
        preferred_element_type=jnp.float32,
    )
    for i in range(BATCH_TILE):
        px = pt_ref[i, 0, :]
        py = pt_ref[i, 1, :]
        pz = pt_ref[i, 2, :]
        r = 16 * i
        out_ref[i, 0, :] = T[r + 0] * px + T[r + 1] * py + T[r + 2] * pz + T[r + 3]
        out_ref[i, 1, :] = T[r + 4] * px + T[r + 5] * py + T[r + 6] * pz + T[r + 7]
        out_ref[i, 2, :] = T[r + 8] * px + T[r + 9] * py + T[r + 10] * pz + T[r + 11]


@functools.partial(jax.jit, static_argnames=("interpret",))
def skinning_pallas(
    lbs_weights: jnp.ndarray,  # (V, J)
    rel_tf: jnp.ndarray,       # (B, J, 4, 4)
    v_posed: jnp.ndarray,      # (B, V, 3)
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused skinning: returns (B, V, 3) vertices."""
    V, J = lbs_weights.shape
    B = rel_tf.shape[0]
    Vp = _round_up(V, LANE_TILE)
    Bp = _round_up(B, BATCH_TILE)
    Jp = JOINT_PAD

    wt = jnp.zeros((Jp, Vp), lbs_weights.dtype)
    wt = wt.at[:J, :V].set(lbs_weights.T)
    # A^T per sample: (Bp, 16, Jp), A[b, :, j] = rel_tf[b, j].ravel()
    a = jnp.zeros((Bp, 16, Jp), rel_tf.dtype)
    a = a.at[:B, :, :J].set(rel_tf.reshape(B, J, 16).transpose(0, 2, 1))
    pt = jnp.zeros((Bp, 3, Vp), v_posed.dtype)
    pt = pt.at[:B, :, :V].set(v_posed.transpose(0, 2, 1))

    grid = (Vp // LANE_TILE, Bp // BATCH_TILE)  # batch innermost: W resident
    out = pl.pallas_call(
        _skinning_kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, 3, Vp), v_posed.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Jp, LANE_TILE), lambda vt, b: (0, vt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BATCH_TILE, 16, Jp), lambda vt, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BATCH_TILE, 3, LANE_TILE), lambda vt, b: (b, 0, vt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BATCH_TILE, 3, LANE_TILE), lambda vt, b: (b, 0, vt),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(wt, a, pt)
    return out[:B, :, :V].transpose(0, 2, 1)


def skinning_reference(lbs_weights, rel_tf, v_posed):
    """The plain jnp formulation (bodymodel/lbs.py) for comparison/fallback."""
    B = rel_tf.shape[0]
    T = jnp.einsum(
        "vj,bjk->bvk", lbs_weights, rel_tf.reshape(B, -1, 16)
    ).reshape(B, -1, 4, 4)
    return jnp.einsum("bvij,bvj->bvi", T[..., :3, :3], v_posed) + T[..., :3, 3]
