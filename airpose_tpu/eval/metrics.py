"""Evaluation metrics: MPJPE, MPE, PA-MPJPE.

MPJPE/MPE replicate the reference's test_epoch_end exactly (ref
copenet/copenet_twoview.py:539-593): per-view SMPL-X forward of predicted
and GT (pose, orient) at identity root, mean L2 over the first 22 joints;
MPE is the root-translation L2. PA-MPJPE (Procrustes-aligned) is NOT in the
reference tree (SURVEY.md §2.6) and is added fresh per the rebuild target.

TPU-first: the reference re-runs SMPL-X per batch in a host loop at epoch
end (copenet_twoview.py:572-587); here the whole eval set's joints are
computed in one folded jit call.
"""

from typing import Dict

import jax
import jax.numpy as jnp

from ..bodymodel.smplx import SMPLXParams, smplx_forward


def canonical_joints(
    smplx_params: SMPLXParams, betas: jnp.ndarray, rotmat22: jnp.ndarray
) -> jnp.ndarray:
    """(N, 10) betas + (N, 22, 3, 3) [root|body] rotmats → (N, 22, 3) joints
    with the root rotation applied as global_orient (matching the eval
    convention at ref copenet_twoview.py:575-587)."""
    out = smplx_forward(
        smplx_params,
        betas,
        body_pose=rotmat22[:, 1:],
        global_orient=rotmat22[:, :1],
    )
    return out.joints[:, :22]


def mpjpe(pred_joints: jnp.ndarray, gt_joints: jnp.ndarray) -> jnp.ndarray:
    """Mean per-joint position error over the first 22 joints (no
    alignment) — ref copenet_twoview.py:589-591."""
    return jnp.sqrt(
        jnp.sum((pred_joints[:, :22] - gt_joints[:, :22]) ** 2, axis=-1)
    ).mean()


def mpe(pred_trans: jnp.ndarray, gt_trans: jnp.ndarray) -> jnp.ndarray:
    """Mean root-translation error — ref copenet_twoview.py:542-554."""
    return jnp.sqrt(jnp.sum((pred_trans - gt_trans) ** 2, axis=-1)).mean()


def procrustes_align(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Per-sample similarity (rotation+translation+scale) alignment of pred
    onto gt. pred/gt: (N, J, 3). Classic Umeyama via SVD, batched."""
    mu_p = pred.mean(axis=1, keepdims=True)
    mu_g = gt.mean(axis=1, keepdims=True)
    pc = pred - mu_p
    gc = gt - mu_g
    cov = jnp.einsum("nji,njk->nik", gc, pc, precision="highest")  # (N,3,3)
    U, S, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(jnp.einsum("nij,njk->nik", U, Vt))
    D = jnp.broadcast_to(jnp.eye(3), cov.shape).copy()
    D = D.at[:, 2, 2].set(det)
    R = jnp.einsum("nij,njk,nkl->nil", U, D, Vt)
    var_p = (pc ** 2).sum(axis=(1, 2))
    trace = (S * jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], -1)).sum(-1)
    scale = trace / jnp.maximum(var_p, 1e-9)
    aligned = scale[:, None, None] * jnp.einsum("nij,nkj->nki", R, pc) + mu_g
    return aligned


def pa_mpjpe(pred_joints: jnp.ndarray, gt_joints: jnp.ndarray) -> jnp.ndarray:
    """Procrustes-aligned MPJPE over the first 22 joints (paper protocol;
    new code — not present in the reference tree)."""
    aligned = procrustes_align(pred_joints[:, :22], gt_joints[:, :22])
    return jnp.sqrt(jnp.sum((aligned - gt_joints[:, :22]) ** 2, axis=-1)).mean()


def twoview_eval_metrics(
    smplx_params: SMPLXParams,
    pred_rotmat: jnp.ndarray,  # (N, 2, 22, 3, 3)
    pred_betas: jnp.ndarray,   # (N, 2, 10)
    pred_trans: jnp.ndarray,   # (N, 2, 3)
    gt_pose_rotmat: jnp.ndarray,  # (N, 21, 3, 3)
    gt_orient: jnp.ndarray,       # (N, 2, 3, 3)
    gt_betas: jnp.ndarray,        # (N, 10)
    gt_trans: jnp.ndarray,        # (N, 2, 3)
) -> Dict[str, jnp.ndarray]:
    """Full synthetic-eval metric set, both views folded into one SMPL-X
    batch. NOTE the reference quirk reproduced deliberately: GT joints use
    the *default* betas of its module-level smplx singleton (zeros), i.e.
    the eval compares pose-only bodies (ref copenet_twoview.py:575-578 —
    `smplx.forward(body_pose=..., global_orient=...)` with no betas)."""
    N = pred_rotmat.shape[0]

    gt_rm = jnp.concatenate(
        [gt_orient[:, :, None], jnp.broadcast_to(
            gt_pose_rotmat[:, None], (N, 2) + gt_pose_rotmat.shape[1:]
        )], axis=2,
    )  # (N, 2, 22, 3, 3)

    pj = canonical_joints(
        smplx_params,
        jnp.zeros((N * 2, pred_betas.shape[-1]), pred_betas.dtype),
        pred_rotmat.reshape(N * 2, 22, 3, 3),
    ).reshape(N, 2, 22, 3)
    gj = canonical_joints(
        smplx_params,
        jnp.zeros((N * 2, gt_betas.shape[-1]), gt_betas.dtype),
        gt_rm.reshape(N * 2, 22, 3, 3),
    ).reshape(N, 2, 22, 3)

    return {
        "mpjpe0": mpjpe(pj[:, 0], gj[:, 0]),
        "mpjpe1": mpjpe(pj[:, 1], gj[:, 1]),
        "pa_mpjpe0": pa_mpjpe(pj[:, 0], gj[:, 0]),
        "pa_mpjpe1": pa_mpjpe(pj[:, 1], gj[:, 1]),
        "mpe0": mpe(pred_trans[:, 0], gt_trans[:, 0]),
        "mpe1": mpe(pred_trans[:, 1], gt_trans[:, 1]),
    }


def h36m_eval_metrics(
    smplx_params: SMPLXParams,
    pred_rotmat: jnp.ndarray,  # (N, 2, 22, 3, 3)
    pred_betas: jnp.ndarray,   # (N, 2, 10)
    pred_trans: jnp.ndarray,   # (N, 2, 3)
    gt_joints: jnp.ndarray,    # (N, 2, 17, 3) cam-frame H36M movable GT
) -> Dict[str, jnp.ndarray]:
    """Joints-GT eval for h36m:// datasets: root-aligned MPJPE (the H36M
    protocol-1 metric), PA-MPJPE (protocol 2), and MPE on the camera-frame
    pelvis, per view, over the 17 movable joints via the name-based
    SMPLX_TO_H36M17 correspondence (data/joints.py). Unlike the synthetic
    metrics there is no parameter GT — predictions are composed into the
    camera frame (R_root·j_canon + t, the same composition the losses
    train under) and compared to the dataset's joint GT directly."""
    from ..data.joints import SMPLX_TO_H36M17

    N = pred_rotmat.shape[0]
    out = smplx_forward(
        smplx_params,
        pred_betas.reshape(N * 2, -1),
        body_pose=pred_rotmat[:, :, 1:].reshape(N * 2, 21, 3, 3),
        global_orient=jnp.broadcast_to(
            jnp.eye(3, dtype=pred_betas.dtype), (N * 2, 1, 3, 3)
        ),
    )
    canon = out.joints.reshape(N, 2, -1, 3)[:, :, list(SMPLX_TO_H36M17)]
    cam_j = (
        jnp.einsum("nvij,nvkj->nvki", pred_rotmat[:, :, 0], canon,
                   precision="highest")
        + pred_trans[:, :, None]
    )
    res = {}
    for v in (0, 1):
        p, g = cam_j[:, v], gt_joints[:, v]
        pa, ga = p - p[:, :1], g - g[:, :1]  # root (Hip) alignment
        res[f"mpjpe{v}"] = jnp.sqrt(((pa - ga) ** 2).sum(-1)).mean()
        res[f"pa_mpjpe{v}"] = pa_mpjpe(p, g)
        res[f"mpe{v}"] = mpe(p[:, 0], g[:, 0])
    return res
