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


def _reprojection_terms(smplx_params, vposer_params, cfg: BAConfig,
                        state: BAState, keypoints, intr, robust_f,
                        denom_2d):
    """Per-frame data terms shared by the single-device and frame-sharded
    losses: VPoser decode → kinematic joints → both views' GM reprojection,
    as a local SUM over frames divided by the caller's (global)
    denominator. Returns (loss_2d, theta_aa)."""
    L = state.z.shape[0]
    J = cfg.num_joints_2d
    theta_aa = vposer_decode(vposer_params, state.z)["pose_body"].reshape(L, 63)
    body_rm = batch_rodrigues(theta_aa.reshape(L, 21, 3))
    joints = joints_only_forward(
        smplx_params, jnp.broadcast_to(state.beta, (L, 10)), body_rm
    )[:, :J]

    R = rot6d_to_rotmat(state.phi)  # (L, 2, 3, 3)
    cam_j = (
        jnp.einsum("nvij,nkj->nvki", R, joints, precision="highest")
        + state.tau[:, :, None, :]
    )
    j2d = _project(cam_j, intr[None])  # (L, 2, J, 2)

    # Both keypoint sets (OpenPose, AlphaPose), both views.
    resid = j2d[:, None] - keypoints[..., :2]          # (L, 2set, 2view, J, 2)
    rho = geman_mcclure(resid, cfg.sigma).sum(-1) / 2.0
    # gmcclure in the ref is applied elementwise to u,v then conf-
    # weighted and meaned; .sum(-1)/2 keeps the same mean.
    w2d = keypoints[..., 2] * robust_f[:, None, None, None]
    return (w2d * rho).sum() / denom_2d, theta_aa


def _weighted_tdiff(ext, pairw, denom):
    """Pair-weighted mean-square temporal difference over consecutive rows
    of ``ext`` (len = n_pairs + 1; the sharded path appends the ppermute
    halo row)."""
    d = (ext[1:] - ext[:-1]) ** 2
    d = d.reshape(d.shape[0], -1).mean(-1)
    return (d * pairw).sum() / denom


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
    denom_2d = jnp.maximum(robust_f.sum() * cfg.num_joints_2d, 1.0)
    denom_pairs = jnp.maximum(robust_pair.sum(), 1.0)

    def loss_fn(state: BAState):
        loss_2d, theta_aa = _reprojection_terms(
            smplx_params, vposer_params, cfg, state, keypoints, intr,
            robust_f, denom_2d)

        loss_vposer = (state.z ** 2).mean()
        loss_beta = (state.beta ** 2).mean()

        def tdiff(a):
            return _weighted_tdiff(a, robust_pair, denom_pairs)

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


def ba_debug_report(
    smplx_params: SMPLXParams,
    vposer_params: VPoserParams,
    init: BAState,
    openpose: jnp.ndarray,   # (N, 2, 24, 3)
    alphapose: jnp.ndarray,  # (N, 2, 24, 3)
    intr: jnp.ndarray,       # (2, 3, 3)
    cfg: BAConfig = BAConfig(),
) -> Dict[str, Dict]:
    """Numerical-health diagnostic — the TPU analog of the reference's
    `autograd.detect_anomaly` + graphviz bad-gradient visualizer
    (ref bundle_adj.py:68-112,263). Instead of walking an autograd graph,
    report every loss term's value and, per optimization variable
    (z/phi/tau/beta), its gradient norm and finiteness on the INITIAL
    state — localizing a NaN/Inf to (term, variable) before any Adam step
    can smear it across the whole state."""
    def halve_hips(kp):
        return kp.at[:, :, (1, 2), 2].mul(0.5)

    kp = jnp.stack([halve_hips(openpose), halve_hips(alphapose)], axis=1)
    robust = alphapose[..., 2].sum(axis=(1, 2)) > cfg.robust_conf_threshold
    loss_fn = make_loss_fn(smplx_params, vposer_params, kp, intr, robust, cfg)

    # ONE jit for all terms' values + gradients (remote compiles are slow
    # on this backend; a per-term jit would compile the near-identical
    # whole-sequence graph once per row). Each term gets its OWN pruned
    # grad inside the jit — a single jacrev over the metrics dict would
    # share one backward graph, and a zero cotangent times an Inf
    # residual is NaN, smearing a poisoned data term into the
    # regularizers' rows and defeating the localization.
    terms = list(jax.eval_shape(lambda s: loss_fn(s)[1], init).keys())

    @jax.jit
    def _report(s):
        metrics = loss_fn(s)[1]
        grads = {t: jax.grad(lambda st, t=t: loss_fn(st)[1][t])(s)
                 for t in terms}
        return metrics, grads

    metrics, grads = _report(init)
    report: Dict[str, Dict] = {}
    for term in metrics:
        report[term] = {
            "value": float(metrics[term]),
            "grads": {
                name: {
                    "norm": float(jnp.sqrt((x.astype(jnp.float32) ** 2).sum())),
                    "finite": bool(jnp.isfinite(x).all()),
                }
                for name, x in zip(init._fields, grads[term])
            },
        }
    return report


def print_debug_report(report: Dict[str, Dict]) -> bool:
    """Render the (term × variable) table; returns True if healthy."""
    fields = next(iter(report.values()))["grads"].keys()
    header = f"{'term':<14}{'value':>12}  " + "".join(
        f"{f'grad|{f}|':>14}" for f in fields)
    print(header, flush=True)
    healthy = True
    for term, row in report.items():
        cells = []
        for f in fields:
            g = row["grads"][f]
            cells.append(f"{g['norm']:>14.4g}" if g["finite"]
                         else f"{'NON-FINITE':>14}")
            healthy &= g["finite"]
        ok = np.isfinite(row["value"])
        healthy &= bool(ok)
        val = f"{row['value']:>12.5g}" if ok else f"{'NON-FINITE':>12}"
        print(f"{term:<14}{val}  " + "".join(cells), flush=True)
    print("numerics: " + ("all finite" if healthy else
                          "NON-FINITE terms/gradients above"), flush=True)
    return healthy


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


# ---------------------------------------------------------------------------
# Frame-sharded whole-sequence optimization (multi-chip)
# ---------------------------------------------------------------------------

def bundle_adjust_sharded(
    smplx_params: SMPLXParams,
    vposer_params: VPoserParams,
    init: BAState,
    openpose: jnp.ndarray,   # (N, 2, 24, 3)
    alphapose: jnp.ndarray,  # (N, 2, 24, 3)
    intr: jnp.ndarray,       # (2, 3, 3)
    cfg: BAConfig = BAConfig(),
    mesh=None,
) -> Tuple[BAState, Dict[str, np.ndarray]]:
    """`bundle_adjust` over a device mesh: the frame axis shards over
    "data", so the WHOLE capture optimizes jointly in one jitted two-stage
    scan — no 2000-frame chunk boundaries in the temporal coupling (the
    TPU mapping SURVEY.md §5 prescribes for the reference's only long
    axis, ref bundle_adj.py:216-228).

    Mapping: per-frame variables (z, φ, τ) and keypoints shard over the
    mesh; β stays replicated with its gradient psum'd over ICI. The
    temporal smoothness pairs that straddle a shard boundary read the
    right neighbor's first frame via `lax.ppermute` — the halo exchange
    is inside the differentiated loss, so AD's transposed ppermute
    returns the boundary cotangent to the neighbor shard automatically.
    Numerically ≡ the single-device path up to reduction order
    (tests/test_bundle_adjust.py)."""
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel import make_mesh

    if mesh is None:
        mesh = make_mesh()
    # shard over the FIRST mesh axis only; on a 2-D ("data","model") mesh
    # the state replicates over the other axes (psum/ppermute are scoped
    # to `axis`, so n_dev must be that axis's size, not the device count)
    axis = mesh.axis_names[0]
    n_dev = int(mesh.shape[axis])

    N = int(init.z.shape[0])
    pad = (-N) % n_dev

    def halve_hips(kp):
        return kp.at[:, :, (1, 2), 2].mul(0.5)

    kp = jnp.stack([halve_hips(openpose), halve_hips(alphapose)], axis=1)
    robust_f = (alphapose[..., 2].sum(axis=(1, 2))
                > cfg.robust_conf_threshold).astype(jnp.float32)

    if pad:
        # padded frames: zero confidence, non-robust, and a SAFE pose
        # (identity 6D root, τ_z=10) so the projection divide stays finite
        kp = jnp.pad(kp, ((0, pad), (0, 0), (0, 0), (0, 0), (0, 0)))
        robust_f = jnp.pad(robust_f, (0, pad))
        # identity in the reference's (3,2)-reshape 6D convention, i.e.
        # rows interleave the two columns: (1,0, 0,1, 0,0). A zero SECOND
        # column (e.g. the row-major guess (1,0,0,0,1,0)) NaNs the
        # Gram–Schmidt normalize's gradient.
        eye6 = jnp.tile(jnp.asarray([1., 0., 0., 1., 0., 0.]), (pad, 2, 1))
        init = BAState(
            z=jnp.pad(init.z, ((0, pad), (0, 0))),
            phi=jnp.concatenate([init.phi, eye6]),
            tau=jnp.concatenate(
                [init.tau,
                 jnp.tile(jnp.asarray([0., 0., 10.]), (pad, 2, 1))]),
            beta=init.beta,
        )
    # global pair weights: pair i couples frames (i, i+1); the last pair
    # (the ppermute wrap-around from the last shard to shard 0) is dead
    pairw = jnp.pad(robust_f[:-1] * robust_f[1:], (0, 1))
    J = cfg.num_joints_2d
    denom_2d = float(jnp.maximum(robust_f.sum() * J, 1.0))
    denom_pairs = float(jnp.maximum(pairw.sum(), 1.0))
    perm = [(d, (d - 1) % n_dev) for d in range(n_dev)]

    def shard_loss(state: BAState, kp_l, robust_l, pairw_l):
        """Per-shard loss whose psum over the mesh is the global loss
        (β/z regularizers contribute 1/n_dev per shard). The frame-data
        math is `_reprojection_terms`/`_weighted_tdiff` — the SAME code
        the single-device loss runs, so the two paths cannot desync."""
        loss_2d, theta_aa = _reprojection_terms(
            smplx_params, vposer_params, cfg, state, kp_l, intr,
            robust_l, denom_2d)

        # padded z rows stay 0, so the sum is over true frames; the mean's
        # denominator must be the TRUE frame count to match `bundle_adjust`
        loss_vposer = (state.z ** 2).sum() / (N * 32)
        loss_beta = (state.beta ** 2).mean() / n_dev

        def tdiff(a):
            halo = jax.lax.ppermute(a[:1], axis, perm)
            return _weighted_tdiff(jnp.concatenate([a, halo]), pairw_l,
                                   denom_pairs)

        loss_temporal = (
            cfg.w_temporal_theta * tdiff(theta_aa)
            + cfg.w_temporal_rigid * (
                tdiff(state.phi[:, 0]) + tdiff(state.phi[:, 1])
                + tdiff(state.tau[:, 0]) + tdiff(state.tau[:, 1])
            )
        )
        total = (loss_2d + cfg.w_beta * loss_beta
                 + cfg.w_vposer * loss_vposer
                 + cfg.w_temporal * loss_temporal)
        return total

    tx = optax.adam(cfg.lr)
    state_specs = BAState(z=P(axis), phi=P(axis), tau=P(axis), beta=P())
    data_specs = (P(axis), P(axis), P(axis))

    def make_stage(freeze_z: bool, n_iters: int):
        @partial(
            shard_map, mesh=mesh,
            in_specs=(state_specs,) + data_specs,
            out_specs=(state_specs, P()),
            check_rep=False,
        )
        def stage(state, kp_l, robust_l, pairw_l):
            grad_fn = jax.grad(shard_loss)
            opt_state = tx.init(state)

            def step(carry, _):
                st, opt = carry
                g = grad_fn(st, kp_l, robust_l, pairw_l)
                # β is replicated: its update must see the GLOBAL grad
                g = g._replace(
                    beta=jax.lax.psum(g.beta, axis),
                    z=jnp.zeros_like(g.z) if freeze_z else g.z,
                )
                updates, opt = tx.update(g, opt, st)
                st = jax.tree.map(lambda p, u: p + u, st, updates)
                loss = jax.lax.psum(
                    shard_loss(st, kp_l, robust_l, pairw_l), axis)
                return (st, opt), loss

            (st, _), trace = jax.lax.scan(
                step, (state, opt_state), None, length=n_iters)
            return st, trace

        return jax.jit(stage)

    stage1 = make_stage(True, cfg.iters_stage1)
    stage2 = make_stage(False, cfg.iters_stage2)

    state, trace1 = stage1(init, kp, robust_f, pairw)
    state, trace2 = stage2(state, kp, robust_f, pairw)
    trace = np.concatenate([np.asarray(trace1), np.asarray(trace2)])
    state = BAState(z=state.z[:N], phi=state.phi[:N], tau=state.tau[:N],
                    beta=state.beta)
    return state, {
        "trace": trace,
        # a stage may legitimately run 0 iters (e.g. --iters2 0)
        "loss": float(trace[-1]) if trace.size else float("nan"),
    }


# ---------------------------------------------------------------------------
# Sequence driver (the runnable script the reference's bundle_adj.py is)
# ---------------------------------------------------------------------------

def run_sequence(
    smplx_params: SMPLXParams,
    vposer_params: VPoserParams,
    dataset,                     # CopenetRealDataset (keypoints + intr)
    airpose_outputs,             # outputs-pkl list for ONE split
    cfg: BAConfig = BAConfig(),
    chunk_size: int = 2000,
    save_verts: bool = False,
    sharded: bool = False,
    debug_nans: bool = False,
):
    """Chunked per-sequence optimization (ref bundle_adj.py:216-222: chunks
    of 2000 frames, the temporal term coupling only within a chunk) over a
    full capture. Returns a result dict in the AirPose+ export layout.

    ``sharded`` optimizes the WHOLE sequence jointly instead, frame-sharded
    over the device mesh (`bundle_adjust_sharded`): no chunk boundaries in
    the temporal coupling, one shared β for the capture."""
    from ..eval.compile_results import outputs_to_ba_init

    init = outputs_to_ba_init(airpose_outputs, vposer_params)
    N = int(init.z.shape[0])
    n_frames = min(N, len(dataset))
    openpose = jnp.asarray(
        np.stack([dataset.opose[v, :n_frames] for v in (0, 1)], axis=1)
    )  # (N, 2, 24, 3)
    alphapose = jnp.asarray(
        np.stack([dataset.apose[v, :n_frames] for v in (0, 1)], axis=1)
    )
    intr = jnp.asarray(dataset.intr)

    z = np.zeros((n_frames, 32), np.float32)
    phi = np.zeros((n_frames, 2, 6), np.float32)
    tau = np.zeros((n_frames, 2, 3), np.float32)
    betas = []
    traces = []
    verts0, verts1 = [], []
    cam1_wrt_cam0 = np.zeros((n_frames, 4, 4), np.float32)
    pose_body = np.zeros((n_frames, 21, 3), np.float32)

    if debug_nans:
        report = ba_debug_report(
            smplx_params, vposer_params,
            BAState(z=init.z[:n_frames], phi=init.phi[:n_frames],
                    tau=init.tau[:n_frames], beta=init.beta),
            openpose, alphapose, intr, cfg)
        print_debug_report(report)

    spans = ([(0, n_frames)] if sharded
             else [(b, min(b + chunk_size, n_frames))
                   for b in range(0, n_frames, chunk_size)])
    for begin, end in spans:
        chunk_init = BAState(
            z=init.z[begin:end], phi=init.phi[begin:end],
            tau=init.tau[begin:end], beta=init.beta,
        )
        optimize = bundle_adjust_sharded if sharded else bundle_adjust
        state, metrics = optimize(
            smplx_params, vposer_params, chunk_init,
            openpose[begin:end], alphapose[begin:end], intr, cfg,
        )
        z[begin:end] = np.asarray(state.z)
        phi[begin:end] = np.asarray(state.phi)
        tau[begin:end] = np.asarray(state.tau)
        betas.append(np.asarray(state.beta))
        traces.append(metrics["trace"])
        # export in bounded slices regardless of the optimization span:
        # the full-mesh forward materializes (n, 10475, 4, 4) transforms,
        # which would OOM at real capture lengths under --sharded's
        # whole-sequence span (export is frame-independent, so slicing
        # changes nothing)
        for eb in range(begin, end, chunk_size):
            ee = min(eb + chunk_size, end)
            exp = export_results(
                smplx_params, vposer_params,
                BAState(z=state.z[eb - begin:ee - begin],
                        phi=state.phi[eb - begin:ee - begin],
                        tau=state.tau[eb - begin:ee - begin],
                        beta=state.beta))
            cam1_wrt_cam0[eb:ee] = exp["cam1_wrt_cam0"]
            pose_body[eb:ee] = exp["pose_body"]
            if save_verts:
                verts0.append(exp["verts0"])
                verts1.append(exp["verts1"])
        detail = (f" (2d {metrics['loss_2d']:.4f})"
                  if "loss_2d" in metrics else "")
        print(f"chunk [{begin}:{end}) final loss {metrics['loss']:.4f}"
              + detail, flush=True)

    result = {
        "z": z, "phi": phi, "tau": tau,
        "beta_per_chunk": np.stack(betas),
        "pose_body": pose_body,
        "cam1_wrt_cam0": cam1_wrt_cam0,
        "trace": np.concatenate(traces),
    }
    if save_verts:
        result["verts0"] = np.concatenate(verts0)
        result["verts1"] = np.concatenate(verts1)
    return result


def main(argv=None):
    import argparse
    import os
    import pickle

    p = argparse.ArgumentParser(
        description="AirPose+ — per-sequence bundle adjustment over a real "
        "capture, initialized from an AirPose outputs pkl (the reference's "
        "bundle_adj.py run contract)."
    )
    p.add_argument("--datapath", required=True,
                   help="real://<dir> or <dir> with the DJI layout")
    p.add_argument("--airpose-pkl", required=True,
                   help="outputs pkl from eval.compile_results")
    p.add_argument("--split", default="test", choices=("test", "train"),
                   help="which split the pkl index holds (pkl order is the "
                        "--split order used at compile time; ref res_id)")
    p.add_argument("--split-index", type=int, default=None,
                   help="explicit index into the outputs pkl (overrides "
                        "--split's [test, train] assumption)")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--vposer_ckpt", default=None)
    p.add_argument("--smplx_model_dir", default=None)
    p.add_argument("--synthetic_verts", type=int, default=10475)
    p.add_argument("--chunk-size", type=int, default=2000)
    p.add_argument("--sharded", action="store_true",
                   help="optimize the whole sequence jointly, frame-"
                        "sharded over the device mesh (no chunk "
                        "boundaries in the temporal term). Measured at "
                        "7000 frames on an 8-device mesh: 1.8x faster "
                        "per sweep than chunked at 1.6x the memory "
                        "(PERF.md). Chunked stays the default for "
                        "bounded memory on arbitrary capture lengths "
                        "(the reference's posture); prefer --sharded "
                        "whenever a multi-device mesh is available")
    p.add_argument("--iters1", type=int, default=100)
    p.add_argument("--iters2", type=int, default=200)
    p.add_argument("--lr", type=float, default=0.01,
                   help="Adam step size (ref bundle_adj.py:279-303 uses "
                        "0.01 over 100+200 iters; at much smaller iteration "
                        "budgets a smaller lr avoids Adam's initial "
                        "overshoot from a near-converged AirPose init)")
    p.add_argument("--kp_threshold", type=float, default=50.0,
                   help="op/al agreement gate (ref bundle_adj.py:124)")
    p.add_argument("--train_frames", type=int, nargs=2, default=(0, 7000))
    p.add_argument("--test_frames", type=int, nargs=2, default=(8000, 15000))
    p.add_argument("--save-verts", action="store_true")
    p.add_argument("--debug_nans", action="store_true",
                   help="print the per-term × per-variable gradient "
                        "finiteness/norm table on the initial state before "
                        "optimizing (the reference's detect_anomaly + "
                        "bad-gradient visualizer analog, ref "
                        "bundle_adj.py:68-112,263)")
    p.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    args = p.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from ..bodymodel import (init_vposer_params, load_smplx_npz,
                             load_vposer_ckpt, synthetic_smplx_params)
    from ..data import AircapDataset, CopenetRealDataset
    from ..eval.figures import plot_trajectories, relative_camera_trajectory

    if args.smplx_model_dir:
        smplx_params = load_smplx_npz(args.smplx_model_dir)
    else:
        smplx_params = synthetic_smplx_params(num_vertices=args.synthetic_verts)
    if args.vposer_ckpt:
        vposer_params = load_vposer_ckpt(args.vposer_ckpt)
    else:
        print("WARNING: no --vposer_ckpt; optimizing against a RANDOM "
              "VPoser prior — results will be meaningless outside tests.",
              flush=True)
        vposer_params = init_vposer_params(0)

    frange = (range(*args.test_frames) if args.split == "test"
              else range(*args.train_frames))
    if args.datapath.startswith("aircap://"):
        # the reference's aircapfit.py role: the same SMPLify-style fit
        # over an AirCap capture (single keypoint set duplicated in both
        # slots by the reader)
        ds = AircapDataset(args.datapath[len("aircap://"):], drange=frange)
    else:
        path = args.datapath[len("real://"):] if args.datapath.startswith(
            "real://") else args.datapath
        ds = CopenetRealDataset(path, frame_range=frange,
                                kp_agrmnt_threshold=args.kp_threshold)

    with open(args.airpose_pkl, "rb") as f:
        per_split = pickle.load(f)
    idx = args.split_index
    if idx is None:
        idx = 0 if args.split == "test" else min(1, len(per_split) - 1)
    outputs = per_split[idx]

    cfg = BAConfig(iters_stage1=args.iters1, iters_stage2=args.iters2,
                   lr=args.lr)
    result = run_sequence(
        smplx_params, vposer_params, ds, outputs, cfg,
        chunk_size=args.chunk_size, save_verts=args.save_verts,
        sharded=args.sharded, debug_nans=args.debug_nans,
    )

    os.makedirs(args.out, exist_ok=True)
    out_pkl = os.path.join(args.out, f"airpose_plus_{args.split}.pkl")
    with open(out_pkl, "wb") as f:
        pickle.dump(result, f)

    # AirPose vs AirPose+ relative-camera trajectory (ref :590-642).
    n = result["cam1_wrt_cam0"].shape[0]
    trajs = {
        "AirPose": relative_camera_trajectory(outputs)[:n],
        "AirPose+": result["cam1_wrt_cam0"][:, :3, 3],
    }
    plot_path = os.path.join(args.out, f"cam_trajectory_{args.split}.png")
    plot_trajectories(trajs, plot_path)
    print(f"wrote {out_pkl} and {plot_path}")


if __name__ == "__main__":
    main()
