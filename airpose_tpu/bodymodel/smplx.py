"""SMPL-X body model as an immutable JAX parameter pytree + pure forward.

The reference consumes a torch SMPLX class from a missing submodule; its
observable contract (SURVEY.md §2.4, from call sites such as
copenet/copenet_twoview.py:237-305 and copenet/dsets/aerialpeople.py:56-64,
180-197) is:

    SMPLX(model_path, batch_size, create_transl=False, gender=...)
    .forward(betas (B,10), body_pose (B,21,3,3), global_orient (B,1,3,3),
             transl (B,3), pose2rot=False) -> .vertices (B,10475,3),
                                              .joints (B,127,3)

Here the model is a frozen array pytree (`SMPLXParams`) and the forward is a
pure function — no per-batch-size buffer pre-allocation (the reference keeps
two module-level SMPLX singletons per batch size as a workaround,
copenet_twoview.py:33-46; a functional forward makes that unnecessary).

The 127 output joints = 55 kinematic joints (J_regressor) + 21 vertex-picked
extra joints (face/feet/finger tips) + 51 facial landmarks, matching the
upstream smplx package layout that the reference's eval slices `[:, :22]` out
of (copenet_twoview.py:589-591).
"""

import os
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..geometry.rotations import batch_rodrigues
from . import lbs as _lbs

NUM_JOINTS = 55
NUM_BODY_JOINTS = 21
NUM_HAND_JOINTS = 15
NUM_FACE_LANDMARKS = 51
NUM_EXTRA_JOINTS = 21

# Vertex indices of the extra picked joints, in the upstream smplx order:
# 5 face points, 6 feet points, 10 finger tips. Public constants from the
# smplx package (VERTEX_IDS['smplx'] + tip ordering in VertexJointSelector).
SMPLX_EXTRA_VERTEX_IDS = (
    9120, 9929, 9448, 616, 6,              # nose, reye, leye, rear, lear
    5770, 5780, 8846, 8463, 8474, 8635,    # LBigToe, LSmallToe, LHeel, RBigToe, RSmallToe, RHeel
    5361, 4933, 5058, 5169, 5286,          # left thumb/index/middle/ring/pinky tips
    8079, 7669, 7794, 7905, 8022,          # right thumb/index/middle/ring/pinky tips
)


class SMPLXOutput(NamedTuple):
    vertices: jnp.ndarray  # (B, V, 3)
    joints: jnp.ndarray    # (B, 127, 3)


@struct.dataclass
class SMPLXParams:
    """Frozen SMPL-X model arrays. A pytree — can live on device, be donated
    to jit, or be sharded/replicated under a mesh like any other params."""

    v_template: jnp.ndarray      # (V, 3)
    shape_dirs: jnp.ndarray      # (V, 3, num_betas)
    pose_dirs: jnp.ndarray       # ((J-1)*9, V*3)
    j_regressor: jnp.ndarray     # (J, V)
    lbs_weights: jnp.ndarray     # (V, J)
    hand_pose: jnp.ndarray       # (2*NUM_HAND_JOINTS, 3, 3) mean-hand rotmats
    extra_joint_ids: jnp.ndarray # (21,) int32 vertex picks
    lmk_vert_ids: jnp.ndarray    # (51, 3) int32 face-triangle vertex ids
    lmk_bary: jnp.ndarray        # (51, 3) barycentric weights
    parents: Tuple[int, ...] = struct.field(pytree_node=False)
    faces: np.ndarray = struct.field(pytree_node=False)  # (F, 3) host-side

    @property
    def num_vertices(self) -> int:
        return self.v_template.shape[0]


def smplx_forward(
    params: SMPLXParams,
    betas: jnp.ndarray,
    body_pose: jnp.ndarray,
    global_orient: jnp.ndarray,
    transl: Optional[jnp.ndarray] = None,
    pose2rot: bool = False,
    jaw_eyes_pose: Optional[jnp.ndarray] = None,
    hand_pose: Optional[jnp.ndarray] = None,
) -> SMPLXOutput:
    """Pure SMPL-X forward.

    Matches the reference contract: with ``pose2rot=False``, ``body_pose`` is
    (B, 21, 3, 3) and ``global_orient`` (B, 1, 3, 3) or (B, 3, 3); with
    ``pose2rot=True`` they are axis-angle (B, 63) and (B, 3). Hands default to
    the model's mean hand pose (upstream flat_hand_mean=False semantics),
    jaw/eyes to identity.
    """
    B = betas.shape[0]
    dtype = betas.dtype
    if jaw_eyes_pose is None:
        jaw_eyes_pose = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (B, 3, 3, 3))
    if hand_pose is None:
        hand_pose = jnp.broadcast_to(
            params.hand_pose.astype(dtype), (B,) + params.hand_pose.shape
        )

    full_pose = _lbs.full_pose_from_parts(
        global_orient, body_pose, jaw_eyes_pose, hand_pose, pose2rot=pose2rot
    )
    verts, posed_joints = _lbs.lbs(
        betas,
        full_pose,
        params.v_template.astype(dtype),
        params.shape_dirs.astype(dtype),
        params.pose_dirs.astype(dtype),
        params.j_regressor.astype(dtype),
        params.parents,
        params.lbs_weights.astype(dtype),
    )

    extra = verts[:, params.extra_joint_ids]  # (B, 21, 3)
    lmk_verts = verts[:, params.lmk_vert_ids]  # (B, 51, 3, 3)
    landmarks = jnp.einsum("blvc,lv->blc", lmk_verts, params.lmk_bary.astype(dtype))
    joints = jnp.concatenate([posed_joints, extra, landmarks], axis=1)

    if transl is not None:
        verts = verts + transl[:, None]
        joints = joints + transl[:, None]
    return SMPLXOutput(vertices=verts, joints=joints)


# SMPL-X kinematic tree (55 joints): 22 body, jaw, eyes, 15+15 hand joints.
# Standard parent table from the released models' kintree_table.
SMPLX_PARENTS = (
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19,
    15, 15, 15,                                    # jaw, left eye, right eye
    20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35, 20, 37, 38,  # left hand
    21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53,  # right hand
)


def load_smplx_npz(
    path: str,
    gender: str = "neutral",
    num_betas: int = 10,
    flat_hand_mean: bool = False,
    dtype=jnp.float32,
) -> SMPLXParams:
    """Load a released SMPLX_{MALE,FEMALE,NEUTRAL}.npz into SMPLXParams.

    ``path`` may be the directory containing the npz files (the reference's
    model_path convention) or a direct file path.
    """
    if os.path.isdir(path):
        path = os.path.join(path, f"SMPLX_{gender.upper()}.npz")
    data = np.load(path, allow_pickle=True)

    v_template = np.asarray(data["v_template"], dtype=np.float32)
    shapedirs = np.asarray(data["shapedirs"], dtype=np.float32)[:, :, :num_betas]
    posedirs = np.asarray(data["posedirs"], dtype=np.float32)
    # (V, 3, (J-1)*9) → ((J-1)*9, V*3)
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T.copy()
    j_regressor = np.asarray(data["J_regressor"], dtype=np.float32)
    weights = np.asarray(data["weights"], dtype=np.float32)
    parents = tuple(int(p) for p in np.asarray(data["kintree_table"])[0])
    parents = (-1,) + parents[1:]
    faces = np.asarray(data["f"], dtype=np.int64)

    if flat_hand_mean:
        hands_mean = np.zeros(2 * NUM_HAND_JOINTS * 3, dtype=np.float32)
    else:
        hands_mean = np.concatenate(
            [np.asarray(data["hands_meanl"]), np.asarray(data["hands_meanr"])]
        ).astype(np.float32)
    hand_rotmats = np.asarray(
        batch_rodrigues(jnp.asarray(hands_mean.reshape(-1, 3)))
    )

    lmk_faces_idx = np.asarray(data["lmk_faces_idx"], dtype=np.int64)
    lmk_bary = np.asarray(data["lmk_bary_coords"], dtype=np.float32)
    lmk_vert_ids = faces[lmk_faces_idx].astype(np.int32)

    return SMPLXParams(
        v_template=jnp.asarray(v_template, dtype=dtype),
        shape_dirs=jnp.asarray(shapedirs, dtype=dtype),
        pose_dirs=jnp.asarray(posedirs, dtype=dtype),
        j_regressor=jnp.asarray(j_regressor, dtype=dtype),
        lbs_weights=jnp.asarray(weights, dtype=dtype),
        hand_pose=jnp.asarray(hand_rotmats, dtype=dtype),
        extra_joint_ids=jnp.asarray(SMPLX_EXTRA_VERTEX_IDS, dtype=jnp.int32),
        lmk_vert_ids=jnp.asarray(lmk_vert_ids, dtype=jnp.int32),
        lmk_bary=jnp.asarray(lmk_bary, dtype=dtype),
        parents=parents,
        faces=faces,
    )


def synthetic_smplx_params(
    num_vertices: int = 10475,
    num_joints: int = NUM_JOINTS,
    seed: int = 0,
    dtype=jnp.float32,
) -> SMPLXParams:
    """Deterministic synthetic model with the real schema.

    Used for tests and benchmarking when the (externally licensed) SMPL-X
    npz assets are absent: same shapes, a valid kinematic tree, smooth-ish
    skinning weights. Not anthropometric — numerical plumbing only.
    """
    rng = np.random.default_rng(seed)
    V, J = num_vertices, num_joints
    parents = SMPLX_PARENTS[:J] if J == NUM_JOINTS else tuple(
        [-1] + [max(0, j - 1) for j in range(1, J)]
    )
    v_template = rng.normal(size=(V, 3)).astype(np.float32) * 0.3
    shape_dirs = rng.normal(size=(V, 3, 10)).astype(np.float32) * 0.01
    pose_dirs = (rng.normal(size=((J - 1) * 9, V * 3)) * 0.001).astype(np.float32)
    j_regressor = rng.random(size=(J, V)).astype(np.float32) ** 8
    j_regressor /= j_regressor.sum(axis=1, keepdims=True)
    w = rng.random(size=(V, J)).astype(np.float32) ** 4
    lbs_weights = w / w.sum(axis=1, keepdims=True)
    hands_mean = (rng.normal(size=(2 * NUM_HAND_JOINTS, 3)) * 0.1).astype(np.float32)
    hand_rotmats = np.asarray(batch_rodrigues(jnp.asarray(hands_mean)))
    if J < NUM_JOINTS:
        hand_rotmats = np.broadcast_to(np.eye(3, dtype=np.float32), (30, 3, 3))
    extra_ids = rng.integers(0, V, size=(NUM_EXTRA_JOINTS,)).astype(np.int32)
    lmk_vert_ids = rng.integers(0, V, size=(NUM_FACE_LANDMARKS, 3)).astype(np.int32)
    lmk_bary = rng.random(size=(NUM_FACE_LANDMARKS, 3)).astype(np.float32)
    lmk_bary /= lmk_bary.sum(axis=1, keepdims=True)
    n_faces = max(V - 2, 1)
    faces = np.stack(
        [np.arange(n_faces), np.arange(1, n_faces + 1), np.arange(2, n_faces + 2)],
        axis=1,
    ).astype(np.int64) % V

    return SMPLXParams(
        v_template=jnp.asarray(v_template, dtype=dtype),
        shape_dirs=jnp.asarray(shape_dirs, dtype=dtype),
        pose_dirs=jnp.asarray(pose_dirs, dtype=dtype),
        j_regressor=jnp.asarray(j_regressor, dtype=dtype),
        lbs_weights=jnp.asarray(lbs_weights, dtype=dtype),
        hand_pose=jnp.asarray(hand_rotmats, dtype=dtype),
        extra_joint_ids=jnp.asarray(extra_ids, dtype=jnp.int32),
        lmk_vert_ids=jnp.asarray(lmk_vert_ids, dtype=jnp.int32),
        lmk_bary=jnp.asarray(lmk_bary, dtype=dtype),
        parents=parents,
        faces=faces,
    )
