"""Loss functions for all model families (pure JAX).

Each `*_loss` replicates its reference `fwd_pass_and_loss`+`get_loss` pair
term-for-term (weights in `config.LossWeights`):
  - twoview:    ref copenet/copenet_twoview.py:83-161,164-374
  - hmr:        ref copenet/hmr.py:76-171
  - muhmr:      ref copenet/muhmr.py:76-140
  - singleview: ref copenet/copenet_singleview.py:76-160
  - real twoview (self-supervised): ref copenet_real/copenet_twoview.py:100-160

TPU-first: both views' SMPL-X forwards run as ONE folded call (the reference
calls the body model per view), and all losses are single fused programs.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import constants as C
from ..bodymodel.smplx import SMPLXParams, smplx_forward
from ..bodymodel.vposer import VPoserParams, vposer_encode, vposer_rsample
from ..config import LossWeights, RealLossWeights
from ..geometry.rotations import rot6d_to_rotmat, rotmat_to_aa


def _limb_weight_joints(sq, w):
    """Apply limb up-weighting on the joint axis of a (..., 22, k) tensor
    (ref copenet_twoview.py:114-115)."""
    sq = sq.at[..., list(C.LIMB_JOINTS_3D_L1), :].mul(w)
    sq = sq.at[..., list(C.LIMB_JOINTS_3D_L2), :].mul(w ** 2)
    return sq


def _limb_weight_rotmats(sq, w):
    """(..., 21, 3, 3) limb weighting (ref copenet_twoview.py:133-134)."""
    sq = sq.at[..., list(C.LIMB_ROTMAT_L1), :, :].mul(w)
    sq = sq.at[..., list(C.LIMB_ROTMAT_L2), :, :].mul(w ** 2)
    return sq


def _row_mean(t, rw):
    """Batch mean of ``t`` (leading axis = batch), optionally weighted
    per row. With ``rw=None`` this is exactly ``t.mean()`` (the train
    path — bit-identical to the unweighted code). With a (B,) weight it
    is the weighted mean of per-row means — the eval path uses 1/0
    weights so tail-padded duplicate rows drop out of the reported loss
    EXACTLY (eval/compile_results pads the final partial batch to keep
    shapes static)."""
    if rw is None:
        return t.mean()
    m = t.reshape(t.shape[0], -1).mean(axis=1)
    return (m * rw).sum() / jnp.maximum(rw.sum(), 1.0)


def _sq(a, b):
    return (a - b) ** 2


def canonical_smplx_two_view(
    smplx_params: SMPLXParams, betas: jnp.ndarray, rotmat: jnp.ndarray
):
    """SMPL-X forward for both views in one folded call.

    betas (B, 2, 10), rotmat (B, 2, 22, 3, 3) → canonical (identity-root,
    zero-transl) vertices (B, 2, V, 3) and joints (B, 2, 127, 3) — the frame
    the reference computes its 3D losses in (copenet_twoview.py:281-298).
    """
    B, V = betas.shape[:2]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=betas.dtype), (B * V, 1, 3, 3))
    out = smplx_forward(
        smplx_params,
        betas.reshape(B * V, -1),
        body_pose=rotmat[:, :, 1:].reshape(B * V, 21, 3, 3),
        global_orient=eye,
    )
    return (
        out.vertices.reshape(B, V, -1, 3),
        out.joints.reshape(B, V, -1, 3),
    )


def cam_frame_and_project(rotmat_root, trans, joints, intr, focal):
    """Rotate canonical joints by the root, translate, project.

    rotmat_root (B, V, 3, 3), trans (B, V, 3), joints (B, V, N, 3),
    intr (B, V, 3, 3) → (cam_joints (B,V,N,3), j2d (B,V,N,2)).
    Matches transform_smpl + perspective_projection at
    ref copenet_twoview.py:287-317 (identity camera rotation, K from the
    global focal constant + per-sample principal point).
    """
    cam_j = (
        jnp.einsum("bvij,bvnj->bvni", rotmat_root, joints, precision="highest")
        + trans[:, :, None, :]
    )
    xy = cam_j[..., :2] / cam_j[..., 2:]
    f = jnp.asarray(focal, dtype=xy.dtype)
    if f.ndim == 2:  # per-view (V, 2) focal lengths (real DJI cameras)
        f = f[None, :, None, :]
    elif f.ndim == 3:  # per-sample per-view (B, V, 2) — dataset intrinsics
        f = f[:, :, None, :]
    center = intr[..., :2, 2]
    return cam_j, xy * f + center[:, :, None, :]


def twoview_loss(
    pred_pose: jnp.ndarray,   # (B, 2, 135) [trans*scale | 6D×22]
    pred_betas: jnp.ndarray,  # (B, 2, 10)
    batch: Dict[str, jnp.ndarray],
    smplx_params: SMPLXParams,
    w: LossWeights,
    trans_scale: float = C.TRANS_SCALE,
    vertex_mask: Optional[jnp.ndarray] = None,  # (V,) body-only mask
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    B = pred_pose.shape[0]
    trans = pred_pose[..., :3] / trans_scale
    rotmat = rot6d_to_rotmat(pred_pose[..., 3:].reshape(B, 2, 22, 6))

    verts, joints = canonical_smplx_two_view(smplx_params, pred_betas, rotmat)
    _, j2d = cam_frame_and_project(
        rotmat[:, :, 0], trans, joints, batch["intr"], C.FOCAL_LENGTH
    )

    gt_j2d = batch["gt_j2d"]          # (B, 2, 22, 2) full-image coords
    gt_joints = batch["gt_joints"]    # (B, N>=22, 3) canonical
    gt_verts = batch["gt_vertices"]   # (B, V, 3)
    gt_pose = batch["gt_pose_rotmat"] # (B, 21, 3, 3)
    gt_orient = batch["gt_orient"]    # (B, 2, 3, 3)
    gt_trans = batch["gt_trans"]      # (B, 2, 3)

    loss_kp2d = _sq(j2d[:, 0, :22], gt_j2d[:, 0, :22]).mean() + \
                _sq(j2d[:, 1, :22], gt_j2d[:, 1, :22]).mean()

    j22 = joints[:, :, :22]
    e3d = (
        _sq(j22[:, 0], gt_joints[:, :22])
        + _sq(j22[:, 1], gt_joints[:, :22])
        + _sq(j22[:, 0], j22[:, 1])
    )
    loss_kp3d = _limb_weight_joints(e3d, w.limbs3d).mean()

    if vertex_mask is not None:  # hands/face zeroed on pred AND GT
        verts = verts * vertex_mask[:, None]
        gt_verts = gt_verts * vertex_mask[:, None]
    loss_shape = (
        _sq(verts[:, 0], gt_verts).mean()
        + _sq(verts[:, 1], gt_verts).mean()
        + _sq(verts[:, 0], verts[:, 1]).mean()
    )

    loss_trans = _sq(trans, gt_trans).mean(axis=(0, 2)).sum()

    loss_rootrot = _sq(rotmat[:, 0, 0], gt_orient[:, 0]).mean() + \
                   _sq(rotmat[:, 1, 0], gt_orient[:, 1]).mean()

    epose = (
        _sq(rotmat[:, 0, 1:], gt_pose)
        + _sq(rotmat[:, 1, 1:], gt_pose)
        + _sq(rotmat[:, 0, 1:], rotmat[:, 1, 1:])
    )
    loss_pose = _limb_weight_rotmats(epose, w.limbstheta).mean()

    loss_betas = (
        (pred_betas[:, 0] ** 2).mean()
        + (pred_betas[:, 1] ** 2).mean()
        + _sq(pred_betas[:, 0], pred_betas[:, 1]).mean()
    )

    total = w.total_scale * (
        w.trans * loss_trans
        + w.keypoint2d * loss_kp2d
        + w.keypoint3d * loss_kp3d
        + w.shape * loss_shape
        + w.rootrot * loss_rootrot
        + w.pose * loss_pose
        + w.beta * loss_betas
    )
    metrics = {
        "loss": total,
        "loss_regr_trans": loss_trans,
        "loss_keypoints": loss_kp2d,
        "loss_keypoints_3d": loss_kp3d,
        "loss_regr_shape": loss_shape,
        "loss_rootrot": loss_rootrot,
        "loss_regr_pose": loss_pose,
        "loss_regul_betas": loss_betas,
    }
    return total, metrics


def joints_loss(
    pred_pose: jnp.ndarray,   # (B, 2, 135) [trans*scale | 6D×22]
    pred_betas: jnp.ndarray,  # (B, 2, 10)
    batch: Dict[str, jnp.ndarray],
    smplx_params: SMPLXParams,
    w: LossWeights,
    trans_scale: float = C.TRANS_SCALE,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Joints-only supervised two-view loss for H36M-style GT (cam-frame 3D
    joints + projected 2D, no SMPL-X parameters — data/h36m.py).

    The reference shipped h36m loaders but never wired them into a loss
    (its copies are legacy-broken, ref copenet/dsets/h36m.py:12-15); this
    is the harness that makes them trainable. Terms reuse the twoview_loss
    weights where they apply:

      * kp2d — full-frame reprojection vs ``gt_j2d`` with each camera's OWN
        intrinsics (H36M focal lengths differ per camera; the synthetic
        loss uses the global focal constant)
      * kp3d — pelvis-aligned cam-frame joints vs ``gt_joints`` (the
        name-based SMPLX_TO_H36M17 correspondence is approximate at the
        torso, so alignment cancels bone-offset bias) + the twoview
        cross-view canonical-joint consistency term
      * trans — predicted cam-frame pelvis vs the GT pelvis (the absolute
        translation H36M's cam-frame joints imply)
      * beta — shape prior to the SMPL-X mean + cross-view agreement
        (identical to twoview_loss; there is no shape GT)
    """
    from ..data.joints import SMPLX_TO_H36M17

    B = pred_pose.shape[0]
    trans = pred_pose[..., :3] / trans_scale
    rotmat = rot6d_to_rotmat(pred_pose[..., 3:].reshape(B, 2, 22, 6))

    _, joints = canonical_smplx_two_view(smplx_params, pred_betas, rotmat)
    intr = batch["intr"]
    focal = jnp.stack([intr[..., 0, 0], intr[..., 1, 1]], axis=-1)  # (B,2,2)
    cam_j, j2d = cam_frame_and_project(
        rotmat[:, :, 0], trans, joints, intr, focal
    )

    sel = list(SMPLX_TO_H36M17)
    pj3 = cam_j[:, :, sel]          # (B, 2, 17, 3) cam frame
    pj2 = j2d[:, :, sel]            # (B, 2, 17, 2) full-frame pixels
    gt3 = batch["gt_joints"]
    gt2 = batch["gt_j2d"]

    loss_kp2d = _sq(pj2, gt2).mean(axis=(0, 2, 3)).sum()

    pa = pj3 - pj3[:, :, :1]        # pelvis-aligned (joint 0 = Hip)
    ga = gt3 - gt3[:, :, :1]
    j22 = joints[:, :, :22]
    loss_kp3d = _sq(pa, ga).mean(axis=(0, 2, 3)).sum() + \
        _sq(j22[:, 0], j22[:, 1]).mean()

    loss_trans = _sq(cam_j[:, :, 0], gt3[:, :, 0]).mean(axis=(0, 2)).sum()

    loss_betas = (
        (pred_betas[:, 0] ** 2).mean()
        + (pred_betas[:, 1] ** 2).mean()
        + _sq(pred_betas[:, 0], pred_betas[:, 1]).mean()
    )

    total = w.total_scale * (
        w.trans * loss_trans
        + w.keypoint2d * loss_kp2d
        + w.keypoint3d * loss_kp3d
        + w.beta * loss_betas
    )
    metrics = {
        "loss": total,
        "loss_regr_trans": loss_trans,
        "loss_keypoints": loss_kp2d,
        "loss_keypoints_3d": loss_kp3d,
        "loss_regul_betas": loss_betas,
    }
    return total, metrics


def singleview_loss(
    pred_pose: jnp.ndarray,   # (B, 135)
    pred_betas: jnp.ndarray,  # (B, 10)
    batch: Dict[str, jnp.ndarray],
    smplx_params: SMPLXParams,
    w: LossWeights,
    trans_scale: float = C.TRANS_SCALE,
    vertex_mask: Optional[jnp.ndarray] = None,
):
    """Full-perspective single view (ref copenet_singleview.py:76-160).
    Uses view 0 of the batch layout."""
    B = pred_pose.shape[0]
    trans = pred_pose[:, :3] / trans_scale
    rotmat = rot6d_to_rotmat(pred_pose[:, 3:].reshape(B, 22, 6))

    eye = jnp.broadcast_to(jnp.eye(3, dtype=pred_betas.dtype), (B, 1, 3, 3))
    out = smplx_forward(
        smplx_params, pred_betas, body_pose=rotmat[:, 1:], global_orient=eye
    )
    _, j2d = cam_frame_and_project(
        rotmat[None, :, 0], trans[None], out.joints[None],
        batch["intr"][:, :1], C.FOCAL_LENGTH,
    )
    j2d = j2d[0]

    gt_joints = batch["gt_joints"]
    loss_kp2d = _sq(j2d[:, :22], batch["gt_j2d"][:, 0, :22]).mean()
    e3d = _sq(out.joints[:, :22], gt_joints[:, :22])
    loss_kp3d = _limb_weight_joints(e3d, w.limbs3d).mean()
    verts_p, verts_g = out.vertices, batch["gt_vertices"]
    if vertex_mask is not None:
        verts_p = verts_p * vertex_mask[:, None]
        verts_g = verts_g * vertex_mask[:, None]
    loss_shape = _sq(verts_p, verts_g).mean()
    loss_trans = _sq(trans, batch["gt_trans"][:, 0]).mean()
    loss_rootrot = _sq(rotmat[:, 0], batch["gt_orient"][:, 0]).mean()
    epose = _sq(rotmat[:, 1:], batch["gt_pose_rotmat"])
    loss_pose = _limb_weight_rotmats(epose, w.limbstheta).mean()
    loss_betas = (pred_betas ** 2).mean()

    total = w.total_scale * (
        w.trans * loss_trans
        + w.keypoint2d * loss_kp2d
        + w.keypoint3d * loss_kp3d
        + w.shape * loss_shape
        + w.rootrot * loss_rootrot
        + w.pose * loss_pose
        + w.beta * loss_betas
    )
    return total, {
        "loss": total,
        "loss_regr_trans": loss_trans,
        "loss_keypoints": loss_kp2d,
        "loss_keypoints_3d": loss_kp3d,
        "loss_regr_shape": loss_shape,
        "loss_rootrot": loss_rootrot,
        "loss_regr_pose": loss_pose,
        "loss_regul_betas": loss_betas,
    }


def _weak_cam_project(pose6d_rotmat_root, cam, joints, focal, img_res):
    """HMR-family weak-perspective reprojection in crop coordinates:
    cam (s, tx, ty) → translation [tx, ty, 2f/(res·s)], camera center 0
    (ref hmr.py:163-171)."""
    B = cam.shape[0]
    cam_t = jnp.stack(
        [cam[:, 1], cam[:, 2], 2 * focal[0] / (img_res * cam[:, 0] + 1e-9)],
        axis=-1,
    )
    rot_j = jnp.einsum(
        "bij,bnj->bni", pose6d_rotmat_root, joints, precision="highest"
    ) + cam_t[:, None]
    xy = rot_j[..., :2] / rot_j[..., 2:]
    return xy * jnp.asarray(focal, dtype=xy.dtype)


def hmr_loss(
    pred_pose6d: jnp.ndarray,  # (B, 132)
    pred_betas: jnp.ndarray,   # (B, 10)
    pred_cam: jnp.ndarray,     # (B, 3)
    batch: Dict[str, jnp.ndarray],
    smplx_params: SMPLXParams,
    w: LossWeights,
    img_res: int = C.CROP_SIZE,
    vertex_mask: Optional[jnp.ndarray] = None,
):
    """Weak-perspective single view (ref hmr.py:76-130)."""
    B = pred_pose6d.shape[0]
    rotmat = rot6d_to_rotmat(pred_pose6d.reshape(B, 22, 6))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pred_betas.dtype), (B, 1, 3, 3))
    out = smplx_forward(
        smplx_params, pred_betas, body_pose=rotmat[:, 1:], global_orient=eye
    )
    j2d = _weak_cam_project(
        rotmat[:, 0], pred_cam, out.joints, C.FOCAL_LENGTH, img_res
    )

    loss_kp2d = _sq(j2d[:, :22], batch["gt_j2d_crop"][:, 0, :22]).mean()
    e3d = _sq(out.joints[:, :22], batch["gt_joints"][:, :22])
    loss_kp3d = _limb_weight_joints(e3d, w.limbs3d).mean()
    verts_p, verts_g = out.vertices, batch["gt_vertices"]
    if vertex_mask is not None:
        verts_p = verts_p * vertex_mask[:, None]
        verts_g = verts_g * vertex_mask[:, None]
    loss_shape = _sq(verts_p, verts_g).mean()
    loss_rootrot = _sq(rotmat[:, :1], batch["gt_orient"][:, :1]).mean()
    epose = _sq(rotmat[:, 1:], batch["gt_pose_rotmat"])
    loss_pose = _limb_weight_rotmats(epose, w.limbstheta).mean()
    loss_betas = (pred_betas ** 2).mean()
    barrier = (jnp.exp(-pred_cam[:, 0] * 10) ** 2).mean()

    total = w.total_scale * (
        w.keypoint2d * loss_kp2d
        + w.keypoint3d * loss_kp3d
        + w.shape * loss_shape
        + w.rootrot * loss_rootrot
        + w.pose * loss_pose
        + w.beta * loss_betas
        + barrier
    )
    return total, {
        "loss": total,
        "loss_keypoints": loss_kp2d,
        "loss_keypoints_3d": loss_kp3d,
        "loss_regr_shape": loss_shape,
        "loss_rootrot": loss_rootrot,
        "loss_regr_pose": loss_pose,
        "loss_regul_betas": loss_betas,
    }


def muhmr_loss(
    pred_pose6d: jnp.ndarray,  # (B, 2, 132)
    pred_betas: jnp.ndarray,   # (B, 2, 10)
    pred_cam: jnp.ndarray,     # (B, 2, 3)
    batch: Dict[str, jnp.ndarray],
    smplx_params: SMPLXParams,
    w: LossWeights,
    img_res: int = C.CROP_SIZE,
    vertex_mask: Optional[jnp.ndarray] = None,
):
    """Two-view weak-perspective (ref muhmr.py:76-140): per-view hmr terms,
    cross-view consistency on body rotmats only, two cam barriers."""
    B = pred_pose6d.shape[0]
    rotmat = rot6d_to_rotmat(pred_pose6d.reshape(B, 2, 22, 6))
    verts, joints = canonical_smplx_two_view(smplx_params, pred_betas, rotmat)

    j2d = jnp.stack(
        [
            _weak_cam_project(
                rotmat[:, v, 0], pred_cam[:, v], joints[:, v],
                C.FOCAL_LENGTH, img_res,
            )
            for v in (0, 1)
        ],
        axis=1,
    )
    gt_crop = batch["gt_j2d_crop"]
    loss_kp2d = _sq(j2d[:, 0, :22], gt_crop[:, 0, :22]).mean() + \
                _sq(j2d[:, 1, :22], gt_crop[:, 1, :22]).mean()

    gt_joints = batch["gt_joints"]
    e3d = _sq(joints[:, 0, :22], gt_joints[:, :22]) + \
          _sq(joints[:, 1, :22], gt_joints[:, :22])
    loss_kp3d = _limb_weight_joints(e3d, w.limbs3d).mean()

    gt_verts = batch["gt_vertices"]
    if vertex_mask is not None:
        verts = verts * vertex_mask[:, None]
        gt_verts = gt_verts * vertex_mask[:, None]
    loss_shape = _sq(verts[:, 0], gt_verts).mean() + _sq(verts[:, 1], gt_verts).mean()

    gt_orient = batch["gt_orient"]
    loss_rootrot = _sq(rotmat[:, 0, :1], gt_orient[:, :1]).mean() + \
                   _sq(rotmat[:, 1, :1], gt_orient[:, 1:2]).mean()

    gt_pose = batch["gt_pose_rotmat"]
    epose = (
        _sq(rotmat[:, 0, 1:], gt_pose)
        + _sq(rotmat[:, 1, 1:], gt_pose)
        + _sq(rotmat[:, 0, 1:], rotmat[:, 1, 1:])
    )
    loss_pose = _limb_weight_rotmats(epose, w.limbstheta).mean()

    loss_betas = (pred_betas[:, 0] ** 2).mean() + (pred_betas[:, 1] ** 2).mean()
    barrier = (jnp.exp(-pred_cam[:, 0, 0] * 10) ** 2).mean() + \
              (jnp.exp(-pred_cam[:, 1, 0] * 10) ** 2).mean()

    total = w.total_scale * (
        w.keypoint2d * loss_kp2d
        + w.keypoint3d * loss_kp3d
        + w.shape * loss_shape
        + w.rootrot * loss_rootrot
        + w.pose * loss_pose
        + w.beta * loss_betas
        + barrier
    )
    return total, {
        "loss": total,
        "loss_keypoints": loss_kp2d,
        "loss_keypoints_3d": loss_kp3d,
        "loss_regr_shape": loss_shape,
        "loss_rootrot": loss_rootrot,
        "loss_regr_pose": loss_pose,
        "loss_regul_betas": loss_betas,
    }


def real_twoview_loss(
    pred_pose: jnp.ndarray,    # (B, 2, 135)
    pred_betas: jnp.ndarray,   # (B, 2, 10)
    batch: Dict[str, jnp.ndarray],
    smplx_params: SMPLXParams,
    vposer_params: VPoserParams,
    w: RealLossWeights,
    key,
    trans_scale: float = C.TRANS_SCALE,
):
    """Self-supervised fine-tune loss on real data (ref
    copenet_real/copenet_twoview.py:100-160): confidence-weighted OpenPose
    2D reprojection with limb weights, VPoser latent L2, cross-view pose
    consistency, β regularizers, trans-z barrier.

    ``batch["gt_j2d_conf"]`` is (B, 2, 22, 3): [u, v, confidence].
    """
    B = pred_pose.shape[0]
    trans = pred_pose[..., :3] / trans_scale
    rotmat = rot6d_to_rotmat(pred_pose[..., 3:].reshape(B, 2, 22, 6))
    _, joints = canonical_smplx_two_view(smplx_params, pred_betas, rotmat)
    focal = batch.get("focal", jnp.asarray(C.FOCAL_LENGTH))
    _, j2d = cam_frame_and_project(
        rotmat[:, :, 0], trans, joints, batch["intr"], focal
    )

    rw = batch.get("row_weight")  # (B,) 1/0 eval tail mask; None in training
    kp = batch["gt_j2d_conf"]
    e2d = _sq(j2d[..., :22, :], kp[..., :22, :2]) * kp[..., :22, 2:]
    e2d = _limb_weight_joints(e2d, w.limbs2d)
    # The reference SUMS the two views' weighted errors elementwise BEFORE
    # the mean (ref copenet_real/copenet_twoview.py:117-123: loss_keypoints
    # = err0 + err1, then .mean()), i.e. the term equals mean(err0) +
    # mean(err1) — unlike its own synthetic loss, which means per view and
    # adds. Folding the views into one mean would halve the term
    # (oracle-caught: tests/test_reference_oracle_losses.py).
    loss_kp2d = _row_mean(e2d.sum(axis=1), rw)

    # VPoser prior on predicted body pose (both views folded).
    pose_aa = rotmat_to_aa(rotmat[:, :, 1:]).reshape(B * 2, 63)
    mu, sigma = vposer_encode(vposer_params, pose_aa)
    z = vposer_rsample(mu, sigma, key)
    # two views summed as in ref (:136-137)
    loss_vposer = _row_mean((z ** 2).reshape(B, 2, -1), rw) * 2.0

    loss_pose = _row_mean(_sq(rotmat[:, 0, 1:], rotmat[:, 1, 1:]), rw)
    loss_betas = (
        _row_mean(pred_betas[:, 0] ** 2, rw)
        + _row_mean(pred_betas[:, 1] ** 2, rw)
        + _row_mean(_sq(pred_betas[:, 0], pred_betas[:, 1]), rw)
    )
    barrier = _row_mean(jnp.exp(-trans[:, 0, 2]) ** 2, rw) + \
              _row_mean(jnp.exp(-trans[:, 1, 2]) ** 2, rw)

    total = w.total_scale * (
        w.keypoint2d * loss_kp2d
        + w.beta * loss_betas
        + w.vposer * loss_vposer
        + w.pose * loss_pose
        + barrier
    )
    return total, {
        "loss": total,
        "loss_keypoints": loss_kp2d,
        "loss_regul_vposer": loss_vposer,
        "loss_regr_pose": loss_pose,
        "loss_regul_betas": loss_betas,
    }


def real_singleview_loss(
    pred_pose6d: jnp.ndarray,  # (B, 132)
    pred_betas: jnp.ndarray,   # (B, 10)
    pred_cam: jnp.ndarray,     # (B, 3) weak-persp (s, tx, ty)
    batch: Dict[str, jnp.ndarray],
    smplx_params: SMPLXParams,
    vposer_params: VPoserParams,
    w: RealLossWeights,
    key,
    focal=(5000.0, 5000.0),
    img_res: int = C.CROP_SIZE,
    view: int = 0,
):
    """Self-supervised single-view loss shared by the real-data hmr variants
    ('hmr_camswap_difffl', ref copenet_real/hmr_camswap_difffl.py:92-128, and
    'spin', ref copenet_real/spin.py:86-123): confidence-weighted crop-frame
    2D keypoints (weak-persp, crop focal 5000), VPoser latent L2, β L2,
    camera-depth barrier exp(-t_z)².

    ``batch["gt_j2d_crop_conf"]`` is (B, V, 24, 3) crop-frame [u, v, conf].
    """
    B = pred_pose6d.shape[0]
    rotmat = rot6d_to_rotmat(pred_pose6d.reshape(B, 22, 6))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pred_betas.dtype), (B, 1, 3, 3))
    out = smplx_forward(
        smplx_params, pred_betas, body_pose=rotmat[:, 1:], global_orient=eye
    )
    cam_t = jnp.stack(
        [pred_cam[:, 1], pred_cam[:, 2],
         2 * focal[0] / (img_res * pred_cam[:, 0] + 1e-9)],
        axis=-1,
    )
    j2d = _weak_cam_project(rotmat[:, 0], pred_cam, out.joints, focal, img_res)

    rw = batch.get("row_weight")  # (B,) 1/0 eval tail mask; None in training
    kp = batch["gt_j2d_crop_conf"][:, view]
    e2d = _sq(j2d[:, :22], kp[:, :22, :2]) * kp[:, :22, 2:]
    e2d = _limb_weight_joints(e2d, w.limbs2d)
    loss_kp2d = _row_mean(e2d, rw)

    pose_aa = rotmat_to_aa(rotmat[:, 1:]).reshape(B, 63)
    mu, sigma = vposer_encode(vposer_params, pose_aa)
    z = vposer_rsample(mu, sigma, key)
    loss_vposer = _row_mean(z ** 2, rw)
    loss_betas = _row_mean(pred_betas ** 2, rw)
    barrier = _row_mean(jnp.exp(-cam_t[:, 2]) ** 2, rw)

    total = w.total_scale * (
        w.keypoint2d * loss_kp2d
        + w.beta * loss_betas
        + w.vposer * loss_vposer
        + barrier
    )
    return total, {
        "loss": total,
        "loss_keypoints": loss_kp2d,
        "loss_regul_vposer": loss_vposer,
        "loss_regul_betas": loss_betas,
    }
