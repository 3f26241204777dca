"""AirPose+ — post-hoc per-sequence bundle adjustment.

Re-implements ref copenet_real_data/scripts/bundle_adj.py:120-412 as a fully
jitted optax program:

  variables   per-frame VPoser latent z (32), per-view root 6D rot φ and
              translation τ, one shared β per chunk        (ref :263-275)
  init        z = vposer.encode(AirPose pred pose).mean, φ/τ from AirPose
              predictions                                  (ref :178-194)
  loss        confidence-weighted Geman–McClure (σ=30) 2D reprojection on
              BOTH OpenPose and AlphaPose sets, both views (ref :344-350);
              β L2 ×2000; VPoser z L2 ×0.05; temporal smoothness
              10·Δθ + 100·(Δφ0,Δφ1,Δτ0,Δτ1) on robust-adjacent frames
              (ref :358-366); robust frames = AlphaPose conf sum > 14
              (ref :200); hip joints' confidence halved    (ref :341-342)
  schedule    Adam lr 0.01; 100 iters with z frozen, then 200 with all
              (ref :276-303)

TPU-first deltas (same math, better mapping):
  * each optimization stage is ONE jitted lax.scan — no per-iteration
    dispatch (the reference does 300 python-loop steps with full-mesh
    SMPL-X forward each);
  * the loss needs only the first 24 kinematic-chain joints, so the inner
    loop runs a joints-only SMPL-X forward (no 10475-vertex skinning);
    full vertices are computed once at the end for export;
  * the hip down-weighting is applied ONCE up front — the reference
    re-halves the confidences every iteration (an accumulation bug that
    drives them to zero; documented divergence);
  * the β regularizer penalizes the *optimized* β — the reference
    accidentally regularizes its constant init (loss term frozen at 0).
"""

import dataclasses
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..bodymodel import lbs as _lbs
from ..bodymodel.smplx import SMPLXParams
from ..bodymodel.vposer import VPoserParams, vposer_decode, vposer_encode
from ..geometry.robust import geman_mcclure
from ..geometry.rotations import batch_rodrigues, rot6d_to_rotmat, rotmat_to_rot6d


@dataclasses.dataclass(frozen=True)
class BAConfig:
    lr: float = 0.01
    iters_stage1: int = 100
    iters_stage2: int = 200
    sigma: float = 30.0
    w_beta: float = 2000.0
    w_vposer: float = 0.05
    w_temporal: float = 1.0
    w_temporal_theta: float = 10.0
    w_temporal_rigid: float = 100.0
    robust_conf_threshold: float = 14.0
    num_joints_2d: int = 24


class BAState(NamedTuple):
    z: jnp.ndarray     # (N, 32)
    phi: jnp.ndarray   # (N, 2, 6)
    tau: jnp.ndarray   # (N, 2, 3)
    beta: jnp.ndarray  # (10,)


def joints_only_forward(
    params: SMPLXParams, betas: jnp.ndarray, body_pose_rm: jnp.ndarray
) -> jnp.ndarray:
    """Canonical (identity-root) kinematic-chain joints without skinning:
    shape blendshapes → joint regression → rigid chain. (B, 55, 3)."""
    B = betas.shape[0]
    v_shaped = params.v_template[None] + _lbs.blend_shapes(betas, params.shape_dirs)
    joints_rest = _lbs.vertices2joints(params.j_regressor, v_shaped)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=betas.dtype), (B, 1, 3, 3))
    hands = jnp.broadcast_to(params.hand_pose.astype(betas.dtype),
                             (B,) + params.hand_pose.shape)
    jaw_eyes = jnp.broadcast_to(jnp.eye(3, dtype=betas.dtype), (B, 3, 3, 3))
    full = jnp.concatenate([eye, body_pose_rm, jaw_eyes, hands], axis=1)
    posed, _ = _lbs.batch_rigid_transform(full, joints_rest, params.parents)
    return posed


def init_from_predictions(
    vposer_params: VPoserParams,
    pred_pose_aa: jnp.ndarray,   # (N, 2, 22, 3) AirPose angles per view
    pred_trans: jnp.ndarray,     # (N, 2, 3)
) -> BAState:
    """ref :263-275: z from the view-0 body pose's VPoser mean; φ from each
    view's root rotation; τ from each view's translation."""
    N = pred_pose_aa.shape[0]
    mu, _ = vposer_encode(vposer_params, pred_pose_aa[:, 0, 1:].reshape(N, 63))
    root_rm = batch_rodrigues(pred_pose_aa[:, :, 0])  # (N, 2, 3, 3)
    return BAState(
        z=mu,
        phi=rotmat_to_rot6d(root_rm),
        tau=pred_trans,
        beta=jnp.zeros((10,), pred_trans.dtype),
    )


def _project(joints_cam: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    xy = joints_cam[..., :2] / joints_cam[..., 2:]
    f = jnp.stack([intr[..., 0, 0], intr[..., 1, 1]], axis=-1)
    c = intr[..., :2, 2]
    return xy * f[..., None, :] + c[..., None, :]


def make_loss_fn(
    smplx_params: SMPLXParams,
    vposer_params: VPoserParams,
    keypoints: jnp.ndarray,     # (N, 2 sets, 2 views, 24, 3) [u, v, conf]
    intr: jnp.ndarray,          # (2, 3, 3)
    robust: jnp.ndarray,        # (N,) bool
    cfg: BAConfig,
):
    robust_f = robust.astype(jnp.float32)
    robust_pair = robust_f[:-1] * robust_f[1:]
    J = cfg.num_joints_2d

    def loss_fn(state: BAState):
        N = state.z.shape[0]
        theta_aa = vposer_decode(vposer_params, state.z)["pose_body"].reshape(N, 63)
        body_rm = batch_rodrigues(theta_aa.reshape(N, 21, 3))
        joints = joints_only_forward(
            smplx_params, jnp.broadcast_to(state.beta, (N, 10)), body_rm
        )[:, :J]

        R = rot6d_to_rotmat(state.phi)  # (N, 2, 3, 3)
        cam_j = (
            jnp.einsum("nvij,nkj->nvki", R, joints, precision="highest")
            + state.tau[:, :, None, :]
        )
        j2d = _project(cam_j, intr[None])  # (N, 2, J, 2)

        # Both keypoint sets (OpenPose, AlphaPose), both views.
        resid = j2d[:, None] - keypoints[..., :2]          # (N, 2set, 2view, J, 2)
        rho = geman_mcclure(resid, cfg.sigma).sum(-1) / 2.0
        # gmcclure in the ref is applied elementwise to u,v then conf-
        # weighted and meaned; .sum(-1)/2 keeps the same mean.
        w2d = keypoints[..., 2] * robust_f[:, None, None, None]
        denom = jnp.maximum(robust_f.sum() * J, 1.0)
        loss_2d = (w2d * rho).sum(axis=(0, 3)) / denom     # (2 sets, 2 views)
        loss_2d = loss_2d.sum()

        loss_vposer = (state.z ** 2).mean()
        loss_beta = (state.beta ** 2).mean()

        def tdiff(a):
            d = (a[1:] - a[:-1]) ** 2
            d = d.reshape(d.shape[0], -1).mean(-1)
            return (d * robust_pair).sum() / jnp.maximum(robust_pair.sum(), 1.0)

        loss_temporal = (
            cfg.w_temporal_theta * tdiff(theta_aa)
            + cfg.w_temporal_rigid * (
                tdiff(state.phi[:, 0]) + tdiff(state.phi[:, 1])
                + tdiff(state.tau[:, 0]) + tdiff(state.tau[:, 1])
            )
        )

        total = (
            loss_2d
            + cfg.w_beta * loss_beta
            + cfg.w_vposer * loss_vposer
            + cfg.w_temporal * loss_temporal
        )
        return total, {
            "loss": total,
            "loss_2d": loss_2d,
            "loss_vposer": loss_vposer,
            "loss_beta": loss_beta,
            "loss_temporal": loss_temporal,
        }

    return loss_fn


def bundle_adjust(
    smplx_params: SMPLXParams,
    vposer_params: VPoserParams,
    init: BAState,
    openpose: jnp.ndarray,   # (N, 2, 24, 3)
    alphapose: jnp.ndarray,  # (N, 2, 24, 3)
    intr: jnp.ndarray,       # (2, 3, 3)
    cfg: BAConfig = BAConfig(),
) -> Tuple[BAState, Dict[str, np.ndarray]]:
    """Run the two-stage optimization over one chunk. Returns the optimized
    state and a metrics trace."""
    # Hip confidence halving, applied once (ref :341-342 — see module doc).
    def halve_hips(kp):
        return kp.at[:, :, (1, 2), 2].mul(0.5)

    kp = jnp.stack([halve_hips(openpose), halve_hips(alphapose)], axis=1)
    robust = alphapose[..., 2].sum(axis=(1, 2)) > cfg.robust_conf_threshold

    loss_fn = make_loss_fn(smplx_params, vposer_params, kp, intr, robust, cfg)
    grad_fn = jax.grad(lambda s: loss_fn(s)[0])

    tx = optax.adam(cfg.lr)

    def make_stage(freeze_z: bool, n_iters: int):
        def stage(state: BAState):
            opt_state = tx.init(state)

            def step(carry, _):
                st, opt = carry
                g = grad_fn(st)
                if freeze_z:
                    g = g._replace(z=jnp.zeros_like(g.z))
                updates, opt = tx.update(g, opt, st)
                st = jax.tree.map(lambda p, u: p + u, st, updates)
                _, metrics = loss_fn(st)
                return (st, opt), metrics["loss"]

            (st, _), trace = jax.lax.scan(
                step, (state, opt_state), None, length=n_iters
            )
            return st, trace

        return jax.jit(stage)

    stage1 = make_stage(True, cfg.iters_stage1)
    stage2 = make_stage(False, cfg.iters_stage2)

    state, trace1 = stage1(init)
    state, trace2 = stage2(state)
    _, final_metrics = jax.jit(loss_fn)(state)
    return state, {
        "trace": np.concatenate([np.asarray(trace1), np.asarray(trace2)]),
        **{k: float(v) for k, v in final_metrics.items()},
    }


def export_results(
    smplx_params: SMPLXParams,
    vposer_params: VPoserParams,
    state: BAState,
) -> Dict[str, np.ndarray]:
    """Final full-mesh export + relative-camera trajectory
    (cam1-wrt-cam0, ref :370-377): T_rel = T0 · T1⁻¹ where T_v = [R_v|τ_v]."""
    from ..bodymodel.smplx import smplx_forward

    N = state.z.shape[0]
    theta = vposer_decode(vposer_params, state.z)["pose_body_matrot"]
    out = smplx_forward(
        smplx_params,
        jnp.broadcast_to(state.beta, (N, 10)),
        body_pose=theta,
        global_orient=jnp.broadcast_to(jnp.eye(3), (N, 1, 3, 3)),
    )
    R = rot6d_to_rotmat(state.phi)
    verts = jnp.einsum(
        "nvij,nkj->nvki", R, out.vertices, precision="highest"
    ) + state.tau[:, :, None, :]

    T = jnp.zeros((N, 2, 4, 4)).at[:, :, 3, 3].set(1.0)
    T = T.at[:, :, :3, :3].set(R).at[:, :, :3, 3].set(state.tau)
    T_rel = jnp.einsum(
        "nij,njk->nik", T[:, 0], jnp.linalg.inv(T[:, 1]), precision="highest"
    )
    return {
        "verts0": np.asarray(verts[:, 0]),
        "verts1": np.asarray(verts[:, 1]),
        "pose_body": np.asarray(vposer_decode(vposer_params, state.z)["pose_body"]),
        "beta": np.asarray(state.beta),
        "cam1_wrt_cam0": np.asarray(T_rel),
    }
