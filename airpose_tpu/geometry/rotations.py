"""Rotation representation conversions (pure JAX, fully batched).

Numerical contracts match the reference so converted checkpoints produce
checkpoint-equivalent outputs:
  - ``batch_rodrigues`` / ``quat_to_rotmat``: ref copenet/utils/geometry.py:9-45
    (axis-angle → quaternion → rotmat, with the reference's exact +1e-8
    regularizer added elementwise before taking the norm).
  - ``rot6d_to_rotmat``: ref copenet/utils/geometry.py:47-61 (Zhou et al. 6D,
    column-major (-1,3,2) reshape, Gram–Schmidt with torch.F.normalize's
    eps=1e-12 max-clamp semantics).
  - ``rotmat_to_aa`` replaces torchgeometry's rotation_matrix_to_angle_axis
    (ref copenet/copenet_twoview.py:323-326) via a numerically-robust
    quaternion extraction.

All functions accept arbitrary leading batch dims.
"""

import jax.numpy as jnp


def _normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along the last axis with torch.nn.functional.normalize
    semantics: v / max(||v||, eps)."""
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, eps)


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion → (..., 3, 3) rotation matrix."""
    q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rot = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return rot.reshape(quat.shape[:-1] + (3, 3))


def batch_rodrigues(theta: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis-angle → (..., 3, 3) rotation matrix.

    Uses the reference's quaternion construction including its elementwise
    +1e-8 regularizer inside the norm (geometry.py:16), so outputs agree
    bitwise-closely with converted-checkpoint expectations.
    """
    angle = jnp.linalg.norm(theta + 1e-8, axis=-1, keepdims=True)
    axis = theta / angle
    half = angle * 0.5
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)
    return quat_to_rotmat(quat)


# Alias: the reference exposes the same op both from utils/geometry.py and
# from its smplx fork's lbs module (dsets/aerialpeople.py:177).
aa_to_rotmat = batch_rodrigues


def rot6d_to_rotmat(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) continuous 6D rotation → (..., 3, 3).

    The 6 numbers are interpreted column-major as the first two columns of a
    rotation matrix, i.e. reshaped to (3, 2) — matching the reference's
    ``x.reshape(-1, 3, 2)`` (geometry.py:55). Returns stacked orthonormal
    columns [b1 b2 b1×b2].
    """
    m = x.reshape(x.shape[:-1] + (3, 2))
    a1, a2 = m[..., 0], m[..., 1]
    b1 = _normalize(a1)
    b2 = _normalize(a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_rot6d(rotmat: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) → (..., 6): first two columns, column-major flatten.

    Inverse of ``rot6d_to_rotmat`` for valid rotations (ref utils/utils.py:50-55).
    """
    return rotmat[..., :, :2].reshape(rotmat.shape[:-2] + (6,))


def rotmat_to_quat(rotmat: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) → (..., 4) wxyz, branchless Shepperd-style extraction.

    Computes all four candidate quaternions (one per dominant component) and
    selects the numerically safest — robust for all rotations, and jit/grad
    friendly (no data-dependent control flow).
    """
    m = rotmat
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four squared magnitudes (times 4): w², x², y², z².
    qw2 = 1.0 + m00 + m11 + m22
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def safe_sqrt(a):
        return jnp.sqrt(jnp.maximum(a, 1e-12))

    # Candidate quaternions, each scaled by its dominant component.
    w_w = safe_sqrt(qw2) / 2.0
    cand_w = jnp.stack(
        [4 * w_w * w_w, m21 - m12, m02 - m20, m10 - m01], axis=-1
    ) / (4.0 * w_w)[..., None]
    x_x = safe_sqrt(qx2) / 2.0
    cand_x = jnp.stack(
        [m21 - m12, 4 * x_x * x_x, m01 + m10, m02 + m20], axis=-1
    ) / (4.0 * x_x)[..., None]
    y_y = safe_sqrt(qy2) / 2.0
    cand_y = jnp.stack(
        [m02 - m20, m01 + m10, 4 * y_y * y_y, m12 + m21], axis=-1
    ) / (4.0 * y_y)[..., None]
    z_z = safe_sqrt(qz2) / 2.0
    cand_z = jnp.stack(
        [m10 - m01, m02 + m20, m12 + m21, 4 * z_z * z_z], axis=-1
    ) / (4.0 * z_z)[..., None]

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    idx = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)
    quat = jnp.take_along_axis(cands, idx[..., None, None], axis=-2).squeeze(-2)
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    # Canonicalize sign: w >= 0.
    return quat * jnp.sign(jnp.where(quat[..., :1] == 0, 1.0, quat[..., :1]))


def rotmat_to_aa(rotmat: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) → (..., 3) axis-angle (JAX replacement for
    tgm.rotation_matrix_to_angle_axis used throughout the reference)."""
    quat = rotmat_to_quat(rotmat)
    w = jnp.clip(quat[..., 0], -1.0, 1.0)
    xyz = quat[..., 1:]
    sin_half = jnp.linalg.norm(xyz, axis=-1)
    angle = 2.0 * jnp.arctan2(sin_half, w)
    # sin(angle/2) → 0 as angle → 0; use a first-order-safe scale there.
    scale = jnp.where(sin_half < 1e-6, 2.0, angle / jnp.maximum(sin_half, 1e-12))
    return xyz * scale[..., None]
