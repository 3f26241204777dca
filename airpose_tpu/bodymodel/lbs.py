"""Linear blend skinning core (pure JAX, batched, jit/vmap/grad friendly).

Implements the standard SMPL-X forward pass (behavioral contract reconstructed
from the reference's call sites — SURVEY.md §2.4; the reference's smplx fork
submodule is not checked in):

  v_shaped  = v_template + shapedirs · β
  J         = J_regressor · v_shaped
  v_posed   = v_shaped + posedirs · vec(R_1..R_{J-1} − I)
  A_j       = ∏_{k∈ancestors(j)} T_k            (rigid chain)
  v_out     = Σ_j w_vj A_j · v_posed            (skinning)

TPU notes: the hot ops are three matmuls over the 10475-vertex mesh
(shape blendshapes, pose blendshapes, skinning). They are expressed as
single large einsums so XLA tiles them onto the MXU; the 55-step kinematic
chain is unrolled at trace time (static tree, negligible FLOPs).
"""

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..geometry.rotations import batch_rodrigues


def blend_shapes(betas: jnp.ndarray, shape_dirs: jnp.ndarray) -> jnp.ndarray:
    """(B, S) coefficients × (V, 3, S) dirs → (B, V, 3) offsets."""
    return jnp.einsum("bs,vcs->bvc", betas, shape_dirs)


def vertices2joints(j_regressor: jnp.ndarray, vertices: jnp.ndarray) -> jnp.ndarray:
    """(J, V) regressor × (B, V, 3) → (B, J, 3)."""
    return jnp.einsum("jv,bvc->bjc", j_regressor, vertices)


def pose_blend_offsets(rotmats: jnp.ndarray, pose_dirs: jnp.ndarray) -> jnp.ndarray:
    """Pose-corrective blendshapes.

    Args:
      rotmats: (B, J, 3, 3) full-pose rotation matrices (root included; the
        root does not contribute a pose feature).
      pose_dirs: ((J-1)*9, V*3) flattened pose blendshape basis.
    Returns: (B, V, 3) vertex offsets.
    """
    B = rotmats.shape[0]
    ident = jnp.eye(3, dtype=rotmats.dtype)
    feat = (rotmats[:, 1:] - ident).reshape(B, -1)
    return jnp.matmul(feat, pose_dirs).reshape(B, -1, 3)


def batch_rigid_transform(
    rotmats: jnp.ndarray, joints: jnp.ndarray, parents: Sequence[int]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compose per-joint rotations along the (static) kinematic tree.

    Args:
      rotmats: (B, J, 3, 3), joints: (B, J, 3) rest-pose joint locations,
      parents: length-J static parent table (parents[0] is the root).
    Returns:
      posed_joints: (B, J, 3) joint positions after posing,
      rel_transforms: (B, J, 4, 4) skinning transforms relative to rest pose.
    """
    B, J = joints.shape[:2]
    rel = joints.at[:, 1:].add(-joints[:, [parents[j] for j in range(1, J)]])

    def make_T(R, t):
        top = jnp.concatenate([R, t[..., None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), top.shape[:-2] + (1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)

    local = make_T(rotmats, rel)  # (B, J, 4, 4)

    # Unrolled chain: J is small and static; XLA folds this into a handful of
    # fused 4x4 matmuls instead of a sequential scan over dynamic indices.
    world = [local[:, 0]]
    for j in range(1, J):
        world.append(
            jnp.einsum(
                "bij,bjk->bik", world[parents[j]], local[:, j], precision="highest"
            )
        )
    world = jnp.stack(world, axis=1)  # (B, J, 4, 4)
    posed_joints = world[..., :3, 3]

    # Relative-to-rest correction: A = G · [I | -j_rest].
    correction = jnp.einsum(
        "bjJK,bjK->bjJ", world[..., :3, :3], joints, precision="highest"
    )
    rel_tf = world.at[..., :3, 3].add(-correction)
    return posed_joints, rel_tf


def lbs(
    betas: jnp.ndarray,
    full_pose_rotmats: jnp.ndarray,
    v_template: jnp.ndarray,
    shape_dirs: jnp.ndarray,
    pose_dirs: jnp.ndarray,
    j_regressor: jnp.ndarray,
    parents: Sequence[int],
    lbs_weights: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full LBS pipeline → (vertices (B, V, 3), joints (B, J, 3))."""
    v_shaped = v_template[None] + blend_shapes(betas, shape_dirs)
    joints_rest = vertices2joints(j_regressor, v_shaped)
    v_posed = v_shaped + pose_blend_offsets(full_pose_rotmats, pose_dirs)

    posed_joints, rel_tf = batch_rigid_transform(
        full_pose_rotmats, joints_rest, parents
    )

    # Skinning: per-vertex transform T_v = Σ_j w_vj A_j as one (V,J)·(B,J,16)
    # matmul — the MXU-shaped hot op.
    B = betas.shape[0]
    T = jnp.einsum(
        "vj,bjk->bvk", lbs_weights, rel_tf.reshape(B, -1, 16)
    ).reshape(B, -1, 4, 4)
    verts = (
        jnp.einsum("bvij,bvj->bvi", T[..., :3, :3], v_posed) + T[..., :3, 3]
    )
    return verts, posed_joints


def full_pose_from_parts(
    global_orient: jnp.ndarray,
    body_pose: jnp.ndarray,
    jaw_eyes_pose: jnp.ndarray,
    hand_pose: jnp.ndarray,
    pose2rot: bool,
) -> jnp.ndarray:
    """Assemble the 55-joint SMPL-X full pose from its named parts.

    With ``pose2rot`` the body parts are axis-angle and converted; jaw/eyes
    and hands arrive already as (B, k, 3, 3) rotmats.
    """
    if pose2rot:
        B = body_pose.shape[0]
        global_orient = batch_rodrigues(global_orient.reshape(B, 1, 3))
        body_pose = batch_rodrigues(body_pose.reshape(B, -1, 3))
    else:
        if global_orient.ndim == 3:
            global_orient = global_orient[:, None]
    return jnp.concatenate(
        [global_orient, body_pose, jaw_eyes_pose, hand_pose], axis=1
    )
