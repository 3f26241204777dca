"""Results compilation — the reference `*_res_compile.py` scripts (SURVEY.md
§2.6) as one CLI.

Runs a checkpoint over the eval data, prints MPJPE / MPE (exactly the
reference's test_epoch_end formulas) plus PA-MPJPE, and dumps the
reference-compatible "outputs" pkl — the interchange format consumed by the
AirPose+ initializer and the paper-figure tooling (ref
copenet/copenet_twoview.py:328-350, scripts/copenet_synth_res_compile.py):

    [ [ {"output": {tensor dict}} per batch ]  per split ]

with keys pred_angles0/1, pred_smpltrans0/1, pred_betas0/1, gt_angles0/1,
gt_smpltrans0/1, in_smpltrans0/1, smplorient_rel0/1, smplpose_rotmat
(+ optional vertices/j2d/j3d with --save-full).

Usage:
  python -m airpose_tpu.eval.compile_results --model copenet_twoview \
      --ckpt <orbax dir> --datapath synthetic://64 --out results.pkl
"""

import argparse
import os
import pickle
from typing import Dict, List

import numpy as np


def outputs_to_ba_init(outputs: List[Dict], vposer_params):
    """outputs pkl (one split) → AirPose+ BAState init — the consumption
    path at ref bundle_adj.py:173-194."""
    import jax.numpy as jnp

    from ..optim.bundle_adjust import init_from_predictions

    angles0 = np.concatenate([o["output"]["pred_angles0"] for o in outputs])
    angles1 = np.concatenate([o["output"]["pred_angles1"] for o in outputs])
    trans0 = np.concatenate([o["output"]["pred_smpltrans0"] for o in outputs])
    trans1 = np.concatenate([o["output"]["pred_smpltrans1"] for o in outputs])
    aa = jnp.asarray(np.stack([angles0, angles1], axis=1))
    trans = jnp.asarray(np.stack([trans0, trans1], axis=1))
    return init_from_predictions(vposer_params, aa, trans)


def compile_twoview(state, model, smplx_params, data, batch_size, cfg,
                    save_full=False):
    """Eval every batch, return (outputs list, metrics dict)."""
    import jax
    import jax.numpy as jnp

    from ..data import batch_slice
    from ..eval.metrics import twoview_eval_metrics
    from ..geometry.rotations import rotmat_to_aa
    from ..train.loop import make_twoview_step_fns
    from ..train.state import make_optimizer

    tx = make_optimizer(cfg.lr)
    _, eval_step = make_twoview_step_fns(model, smplx_params, cfg, tx)

    n = data["images"].shape[0]
    outputs = []
    all_pred_rotmat, all_pred_betas, all_pred_trans = [], [], []
    for s in range(0, n - batch_size + 1, batch_size):
        batch = batch_slice(data, s, batch_size)
        _, preds = eval_step(state, batch)
        pred_rotmat = np.asarray(preds["pred_rotmat"])
        pred_trans = np.asarray(preds["pred_trans"])
        pred_betas = np.asarray(preds["pred_betas"])
        pred_angles = np.asarray(rotmat_to_aa(jnp.asarray(pred_rotmat)))
        gt_orient = np.asarray(batch["gt_orient"])
        gt_pose = np.asarray(batch["gt_pose_rotmat"])
        gt_rm = np.concatenate(
            [gt_orient[:, :, None],
             np.broadcast_to(gt_pose[:, None], (gt_pose.shape[0], 2) + gt_pose.shape[1:])],
            axis=2,
        )
        gt_angles = np.asarray(rotmat_to_aa(jnp.asarray(gt_rm)))

        out = {
            "pred_angles0": pred_angles[:, 0], "pred_angles1": pred_angles[:, 1],
            "pred_smpltrans0": pred_trans[:, 0], "pred_smpltrans1": pred_trans[:, 1],
            "pred_betas0": pred_betas[:, 0], "pred_betas1": pred_betas[:, 1],
            "gt_angles0": gt_angles[:, 0], "gt_angles1": gt_angles[:, 1],
            "gt_smpltrans0": np.asarray(batch["gt_trans"])[:, 0],
            "gt_smpltrans1": np.asarray(batch["gt_trans"])[:, 1],
            "in_smpltrans0": np.tile([0, 0, 10.0], (batch_size, 1)).astype(np.float32),
            "in_smpltrans1": np.tile([0, 0, 10.0], (batch_size, 1)).astype(np.float32),
            "smplorient_rel0": gt_orient[:, 0:1],
            "smplorient_rel1": gt_orient[:, 1:2],
            "smplpose_rotmat": gt_pose,
        }
        if save_full:
            from ..bodymodel.smplx import smplx_forward

            B = pred_betas.shape[0]
            body = smplx_forward(
                smplx_params,
                jnp.asarray(pred_betas.reshape(B * 2, 10)),
                body_pose=jnp.asarray(pred_rotmat[:, :, 1:].reshape(B * 2, 21, 3, 3)),
                global_orient=jnp.asarray(pred_rotmat[:, :, :1].reshape(B * 2, 1, 3, 3)),
            )
            verts = np.asarray(body.vertices).reshape(B, 2, -1, 3)
            out["pred_vertices_cam0"] = verts[:, 0] + pred_trans[:, 0, None]
            out["pred_vertices_cam1"] = verts[:, 1] + pred_trans[:, 1, None]
        outputs.append({"output": out})

        all_pred_rotmat.append(pred_rotmat)
        all_pred_betas.append(pred_betas)
        all_pred_trans.append(pred_trans)

    pred_rotmat = np.concatenate(all_pred_rotmat)
    pred_betas = np.concatenate(all_pred_betas)
    pred_trans = np.concatenate(all_pred_trans)
    n_eval = pred_rotmat.shape[0]
    metrics = twoview_eval_metrics(
        smplx_params,
        jnp.asarray(pred_rotmat), jnp.asarray(pred_betas), jnp.asarray(pred_trans),
        jnp.asarray(data["gt_pose_rotmat"][:n_eval]),
        jnp.asarray(data["gt_orient"][:n_eval]),
        jnp.asarray(data["gt_betas"][:n_eval]),
        jnp.asarray(data["gt_trans"][:n_eval]),
    )
    return outputs, {k: float(v) for k, v in metrics.items()}


def compile_singleview(state, model, smplx_params, data, batch_size, cfg,
                       family):
    """Eval the hmr / muhmr / copenet_singleview families: outputs pkl in
    the reference single-view format (pred_angles, pred_smpltrans via the
    weak-cam reprojection for the weak families — ref hmr.py:178-193,
    hmr_synth_res_compile.py:129-170) + MPJPE / PA-MPJPE / MPE."""
    import jax
    import jax.numpy as jnp

    from .. import constants as C
    from ..data import batch_slice
    from ..eval.metrics import canonical_joints, mpe, mpjpe, pa_mpjpe
    from ..geometry.projection import weak_cam_crop_to_full_trans
    from ..geometry.rotations import rot6d_to_rotmat, rotmat_to_aa
    from ..train.loop import make_singleview_step_fns
    from ..train.state import make_optimizer

    tx = make_optimizer(cfg.lr)
    _, eval_step = make_singleview_step_fns(model, smplx_params, cfg, tx, family)

    n = data["images"].shape[0]
    outputs = []
    rms, betas_all, trans_all = [], [], []
    for s0 in range(0, n - batch_size + 1, batch_size):
        batch = batch_slice(data, s0, batch_size)
        _, out = eval_step(state, batch)
        if family == "copenet_singleview":
            pose = np.asarray(out.pose)
            trans = pose[:, :3] / cfg.trans_scale
            rotmat = np.asarray(rot6d_to_rotmat(jnp.asarray(pose[:, 3:]).reshape(-1, 22, 6)))
        else:
            rotmat = np.asarray(rot6d_to_rotmat(jnp.asarray(out.pose6d).reshape(-1, 22, 6)))
            if family == "muhmr":
                rotmat = rotmat.reshape(batch_size, 2, 22, 3, 3)[:, 0]
                cam = np.asarray(out.cam)[:, 0]
                bb = np.asarray(batch["bb"])[:, 0]
            else:
                cam = np.asarray(out.cam)
                bb = np.asarray(batch["bb"])[:, 0]
            trans = np.asarray(weak_cam_crop_to_full_trans(
                jnp.asarray(cam), jnp.asarray(bb), jnp.asarray(batch["intr"][:, 0]),
                C.FOCAL_LENGTH, cfg.img_res))
        betas = np.asarray(out.betas)
        if betas.ndim == 3:
            betas = betas[:, 0]
        angles = np.asarray(rotmat_to_aa(jnp.asarray(rotmat)))
        gt_orient = np.asarray(batch["gt_orient"])[:, 0]
        gt_pose = np.asarray(batch["gt_pose_rotmat"])
        gt_rm = np.concatenate([gt_orient[:, None], gt_pose], axis=1)
        outputs.append({"output": {
            "pred_angles": angles,
            "pred_betas": betas,
            "pred_smpltrans": trans,
            "gt_angles": np.asarray(rotmat_to_aa(jnp.asarray(gt_rm))),
            "gt_smpltrans": np.asarray(batch["gt_trans"])[:, 0],
        }})
        rms.append((rotmat, gt_rm))
        betas_all.append(betas)
        trans_all.append(trans)

    pred_rm = np.concatenate([r[0] for r in rms])
    gt_rm = np.concatenate([r[1] for r in rms])
    N = pred_rm.shape[0]
    pj = canonical_joints(smplx_params, jnp.zeros((N, 10)), jnp.asarray(pred_rm))
    gj = canonical_joints(smplx_params, jnp.zeros((N, 10)), jnp.asarray(gt_rm))
    metrics = {
        "mpjpe": float(mpjpe(pj, gj)),
        "pa_mpjpe": float(pa_mpjpe(pj, gj)),
        "mpe": float(mpe(jnp.asarray(np.concatenate(trans_all)),
                         jnp.asarray(data["gt_trans"][:N, 0]))),
    }
    return outputs, metrics


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="copenet_twoview")
    p.add_argument("--ckpt", default=None, help="orbax checkpoint dir (TrainState)")
    p.add_argument("--datapath", default="synthetic://64")
    p.add_argument("--out", default="results.pkl")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--save-full", action="store_true")
    p.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    p.add_argument("--smplx_model_dir", default=None)
    args = p.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from ..bodymodel import load_smplx_npz, synthetic_smplx_params
    from ..config import TrainConfig
    from ..data import make_synthetic_dataset
    from ..models import MODEL_REGISTRY
    from ..train.state import create_train_state

    cfg = TrainConfig(model=args.model)
    if args.smplx_model_dir:
        smplx_params = load_smplx_npz(args.smplx_model_dir)
    else:
        smplx_params = synthetic_smplx_params(
            num_vertices=300 if args.datapath.startswith("synthetic") else 10475
        )

    if args.datapath.startswith("synthetic://"):
        n = int(args.datapath.split("//")[1] or 64)
        data = make_synthetic_dataset(smplx_params, n, seed=7)
    else:
        raise NotImplementedError("on-disk eval lands with dataset assets")

    model = MODEL_REGISTRY[args.model](iters=cfg.reg_iters)
    B = min(args.batch_size, data["images"].shape[0])
    if args.model == "hmr":
        init_args = (jnp.asarray(data["images"][:B, 0]),)
    elif args.model == "copenet_singleview":
        init_args = (jnp.asarray(data["images"][:B, 0]),
                     jnp.asarray(data["bb"][:B, 0]), jnp.full((B, 3), 0.5))
    elif args.model == "muhmr":
        init_args = (jnp.asarray(data["images"][:B]),)
    else:
        init_args = (jnp.asarray(data["images"][:B]), jnp.asarray(data["bb"][:B]),
                     jnp.full((B, 2, 3), 0.5))
    state, _ = create_train_state(model, init_args, jax.random.PRNGKey(0), lr=cfg.lr)
    if args.ckpt:
        import orbax.checkpoint as ocp

        state = ocp.StandardCheckpointer().restore(os.path.abspath(args.ckpt), state)

    if args.model in ("copenet_twoview", "copenet_twoview_sep"):
        outputs, metrics = compile_twoview(
            state, model, smplx_params, data, B, cfg, save_full=args.save_full
        )
    else:
        outputs, metrics = compile_singleview(
            state, model, smplx_params, data, B, cfg, args.model
        )
    for k, v in metrics.items():
        print(f"test_{k}: {v:.4f}")
    with open(args.out, "wb") as f:
        pickle.dump([outputs], f)
    print(f"wrote {args.out} ({len(outputs)} batches)")


if __name__ == "__main__":
    main()
