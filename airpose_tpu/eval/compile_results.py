"""Results compilation — the reference `*_res_compile.py` scripts (SURVEY.md
§2.6) as one CLI.

Runs a checkpoint over eval data, prints MPJPE / MPE (exactly the reference's
test_epoch_end formulas) plus PA-MPJPE, and dumps the reference-compatible
"outputs" pkl — the interchange format consumed by the AirPose+ initializer
and the paper-figure tooling (ref copenet/copenet_twoview.py:328-350,
scripts/copenet_synth_res_compile.py):

    [ [ {"output": {tensor dict}} per batch ]  per split ]

with keys pred_angles0/1, pred_smpltrans0/1, pred_betas0/1, pred_pose0/1,
gt_angles0/1, gt_smpltrans0/1, in_smpltrans0/1, smplorient_rel0/1,
smplpose_rotmat (+ optional vertices with --save-full).

Data paths (mirroring the reference script family):
  synthetic://N          generated fixture data (smoke/bench)
  /path/to/aerialpeople  on-disk pkl dataset — copenet_synth_res_compile.py
  real:///path           DJI real layout — copenet_real_res_compile.py,
                         incl. the robust-frame cross-view consistency
                         metric (`err_idcs`, ref :139-143)
  h36m:///path           Human3.6M prebuilt db — joints-GT metrics
                         (root-aligned MPJPE / PA-MPJPE / pelvis MPE;
                         --split picks the camera pair, train=1/2
                         test=3/4)
  totalcap:///path       TotalCapture prebuilt db — SMPL GT converted to
                         the synthetic contract per batch; standard
                         supervised metrics; splits = the trainer's 80/20

Usage:
  python -m airpose_tpu.eval.compile_results --model copenet_twoview \
      --ckpt <orbax dir> --datapath <path> --split test train --out results.pkl
"""

import argparse
import os
import pickle
from typing import Dict, Iterable, List, Optional

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


# ---------------------------------------------------------------------------
# batch sources
# ---------------------------------------------------------------------------

def _padded_ranges(n: int, batch_size: int):
    """Cover ALL n frames in fixed-shape batches: the final partial batch
    is padded by repeating the last frame and tagged with its valid count.
    Static shapes keep XLA from recompiling for the tail, and nothing is
    silently dropped (the reference evaluates complete DataLoaders,
    ref copenet_synth_res_compile.py:64 — drop_last is train-only there).
    Yields (index list of len batch_size, n_valid)."""
    for s in range(0, n, batch_size):
        k = min(batch_size, n - s)
        yield list(range(s, s + k)) + [n - 1] * (batch_size - k), k


def _pop_valid(batch: Dict) -> int:
    """Valid-row count of a possibly tail-padded eval batch (removed from
    the dict so jitted step fns never see the tag)."""
    return int(batch.pop("_valid", batch["images"].shape[0]))


def _mesh_sharded(batches: Iterable[Dict], mesh) -> Iterable[Dict]:
    """Batch-shard every eval batch over a data-parallel mesh. The jitted
    eval step then runs SPMD across the devices (params replicated, batch
    split, GSPMD inserts any collectives — there are none in the eval
    forward, so this is embarrassingly parallel). Leaves whose leading dim
    does not divide the mesh (per-view ``focal``, ...) are replicated by
    ``shard_batch``. The reference's eval parallelism is 40 DataLoader CPU
    workers feeding one GPU (ref scripts num_workers=40); here the model
    itself fans out over the chips."""
    from ..parallel.mesh import shard_batch

    for batch in batches:
        valid = batch.pop("_valid", None)
        batch = shard_batch(batch, mesh)
        if valid is not None:
            batch["_valid"] = valid
        yield batch


def _maybe_mesh(state, batches, mesh):
    """Replicate the eval state on ``mesh`` and shard the batch stream;
    no-op when mesh is None (single device)."""
    if mesh is None:
        return state, batches
    import jax

    from ..parallel.mesh import replicate

    return jax.device_put(state, replicate(mesh)), _mesh_sharded(batches, mesh)


def synthetic_batches(data: Dict, batch_size: int) -> Iterable[Dict]:
    import jax.numpy as jnp

    n = data["images"].shape[0]
    # one device→host transfer per ARRAY, outside the batch loop —
    # make_synthetic_dataset returns device arrays, and np.asarray inside
    # the loop would re-transfer the full dataset every batch (the
    # transfer link is this environment's bottleneck, PERF.md)
    host = {key: np.asarray(v) for key, v in data.items()}
    for idx, k in _padded_ranges(n, batch_size):
        sel = np.asarray(idx)
        b = {key: jnp.asarray(v[sel]) for key, v in host.items()}
        b["_valid"] = k
        yield b


def aerialpeople_batches(ds, batch_size: int, out_size: int = 224) -> Iterable[Dict]:
    """Deterministic on-disk eval batches: no camera swap, no crop jitter —
    the parity-defined eval path (SURVEY.md §7 risks). Mirrors the trainer's
    on-disk _finish with deterministic=True."""
    import jax

    from ..data.pipeline import finish_batch

    rng_np = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    n = len(ds)
    for idx, k in _padded_ranges(n, batch_size):
        hb = ds.host_batch(idx, rng_np, swap_cams=False)
        gt = ds.canonical_gt(idx)
        hb["gt_vertices"] = gt["vertices"]
        hb["gt_joints"] = gt["joints"]
        hb["gt_j2d"] = hb["gt_j2d"][:, :, :22]
        b = finish_batch(hb, key, deterministic=True, out_size=out_size)
        b["_valid"] = k
        yield b


def h36m_batches(ds, batch_size: int, out_size: int = 224) -> Iterable[Dict]:
    """Deterministic Human3.6M eval batches (no camera swap, no crop
    jitter), tail-padded and masked like every other eval generator."""
    import jax

    from ..data.pipeline import finish_batch

    rng_np = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    n = len(ds)
    for idx, k in _padded_ranges(n, batch_size):
        hb = ds.host_batch(idx, rng_np, swap_cams=False)
        b = finish_batch(hb, key, deterministic=True, out_size=out_size)
        b["_valid"] = k
        yield b


def totalcap_batches(ds, smplx_params, batch_size: int, out_size: int = 224,
                     indices=None) -> Iterable[Dict]:
    """Deterministic TotalCapture eval batches: the SMPL parameter GT is
    converted to the synthetic twoview contract per batch
    (data.totalcap.twoview_gt_from_smpl), so compile_twoview's metrics and
    outputs-pkl format apply unchanged. ``indices`` restricts to a frame
    subset (e.g. the trainer's held-out 20%)."""
    import jax

    from ..data.pipeline import finish_batch
    from ..data.totalcap import twoview_gt_from_smpl

    rng_np = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    idx_all = list(indices) if indices is not None else list(range(len(ds)))
    rows = getattr(ds, "_canon_rows", None)
    if (getattr(ds, "_canon_cache", None) is None
            or (rows is not None and any(i not in rows for i in idx_all))):
        # one SMPL-X pass, restricted to the frames this eval consumes
        ds.precompute_canonical_gt(smplx_params, indices=idx_all)
    for idx, k in _padded_ranges(len(idx_all), batch_size):
        abs_idx = [idx_all[i] for i in idx]
        hb = ds.host_batch(abs_idx, rng_np, swap_cams=False)
        hb = twoview_gt_from_smpl(hb, smplx_params, ds=ds, indices=abs_idx)
        b = finish_batch(hb, key, deterministic=True, out_size=out_size)
        b["_valid"] = k
        yield b


def real_batches(ds, batch_size: int, out_size: int = 224) -> Iterable[Dict]:
    """Deterministic real-data eval batches (pinned camera order — the
    dataset was constructed with first_cam; ref copenet_real_res_compile.py
    evaluates with shuffle_cams off)."""
    import jax
    import jax.numpy as jnp

    from ..data.pipeline import finish_batch

    rng_np = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    # focal follows the dataset's VIEW order: with first_cam=1 the reader
    # swaps views (view 0 = camera 1), so the per-view focal pair must
    # swap with it (cam1 is ~12% shorter than cam0 — projecting with the
    # wrong one silently corrupts the eval loss). The pair comes from the
    # dataset (DJI constants for real://, the capture's own intrinsics for
    # aircap:// — ref aircap_cam*_FOCAL_LENGTH, copenet/constants.py:4-5).
    assert not getattr(ds, "shuffle_cams", False), \
        "eval requires a fixed camera order"
    pair = ds.focal_pairs()
    if getattr(ds, "first_cam", 0) == 1:
        pair = pair[::-1]
    focal = jnp.asarray(pair, dtype=jnp.float32)
    n = len(ds)
    for idx, k in _padded_ranges(n, batch_size):
        hb = ds.host_batch(idx, rng_np)
        b = finish_batch(hb, key, deterministic=True, margin=0.0,
                         out_size=out_size)
        b["gt_j2d_conf"] = b["gt_j2d_conf"][:, :, :22]
        b["focal"] = focal
        # 1/0 mask over rows: the eval loss drops the tail batch's pad
        # rows exactly (losses._row_mean); predictions are sliced host-side
        b["row_weight"] = jnp.asarray(
            (np.arange(batch_size) < k).astype(np.float32))
        b["_valid"] = k
        yield b


# ---------------------------------------------------------------------------
# compile passes
# ---------------------------------------------------------------------------

def compile_twoview(state, model, smplx_params, batches: Iterable[Dict], cfg,
                    save_full=False, int8=False, int8_calib_n=8, mesh=None):
    """Eval every batch, return (outputs list, metrics dict).

    ``int8`` evaluates the int8 PTQ serving configuration instead of the
    bf16 trunk (ops/int8_trunk.py) — THE tool for measuring what
    quantized deployment costs in MPJPE/PA-MPJPE on a given dataset.
    Activation calibration uses the first ``int8_calib_n`` eval images
    (clip rates printed — see _int8_shim). ``mesh``: data-parallel eval
    over a device mesh (see _mesh_sharded)."""
    import jax
    import jax.numpy as jnp

    from .. import constants as C
    from ..eval.metrics import twoview_eval_metrics
    from ..geometry.rotations import rotmat_to_aa
    from ..train.loop import make_twoview_step_fns
    from ..train.state import make_optimizer

    if int8:
        model, batches = _int8_shim(model, state, batches, int8_calib_n)
    state, batches = _maybe_mesh(state, batches, mesh)

    tx = make_optimizer(cfg.lr)
    _, eval_step = make_twoview_step_fns(model, smplx_params, cfg, tx)

    outputs = []
    all_pred_rotmat, all_pred_betas, all_pred_trans = [], [], []
    gt_pose_l, gt_orient_l, gt_betas_l, gt_trans_l = [], [], [], []
    for batch in batches:
        valid = _pop_valid(batch)
        B = int(batch["images"].shape[0])
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
            "in_smpltrans0": np.tile([0, 0, 10.0], (B, 1)).astype(np.float32),
            "in_smpltrans1": np.tile([0, 0, 10.0], (B, 1)).astype(np.float32),
            "smplorient_rel0": gt_orient[:, 0:1],
            "smplorient_rel1": gt_orient[:, 1:2],
            "smplpose_rotmat": gt_pose,
        }
        if save_full:
            out.update(_full_body_fields(
                smplx_params, pred_rotmat, pred_betas, pred_trans,
                np.asarray(batch["intr"]), C.FOCAL_LENGTH,
                np.stack([out["in_smpltrans0"], out["in_smpltrans1"]],
                         axis=1)))
        # padded tail rows are duplicates of the last frame — keep them out
        # of the outputs pkl and the metric accumulators
        outputs.append({"output": {k: v[:valid] for k, v in out.items()}})

        all_pred_rotmat.append(pred_rotmat[:valid])
        all_pred_betas.append(pred_betas[:valid])
        all_pred_trans.append(pred_trans[:valid])
        gt_pose_l.append(gt_pose[:valid])
        gt_orient_l.append(gt_orient[:valid])
        gt_betas_l.append(np.asarray(batch["gt_betas"])[:valid])
        gt_trans_l.append(np.asarray(batch["gt_trans"])[:valid])

    pred_rotmat = np.concatenate(all_pred_rotmat)
    pred_betas = np.concatenate(all_pred_betas)
    pred_trans = np.concatenate(all_pred_trans)
    metrics = twoview_eval_metrics(
        smplx_params,
        jnp.asarray(pred_rotmat), jnp.asarray(pred_betas), jnp.asarray(pred_trans),
        jnp.asarray(np.concatenate(gt_pose_l)),
        jnp.asarray(np.concatenate(gt_orient_l)),
        jnp.asarray(np.concatenate(gt_betas_l)),
        jnp.asarray(np.concatenate(gt_trans_l)),
    )
    return outputs, {k: float(v) for k, v in metrics.items()}


def compile_h36m_twoview(state, model, smplx_params, batches: Iterable[Dict],
                         cfg, int8=False, int8_calib_n=8, mesh=None):
    """Eval over h36m:// batches: outputs-pkl rows (pred angles/trans/betas
    + the 17-joint cam-frame GT) and the H36M metrics — root-aligned MPJPE
    (protocol 1), PA-MPJPE (protocol 2), pelvis MPE per view — via
    metrics.h36m_eval_metrics. Composes with --int8 and --mesh like every
    other compile pass."""
    import jax.numpy as jnp

    from ..eval.metrics import h36m_eval_metrics
    from ..geometry.rotations import rotmat_to_aa
    from ..train.loop import make_twoview_step_fns
    from ..train.losses import joints_loss
    from ..train.state import make_optimizer

    if int8:
        model, batches = _int8_shim(model, state, batches, int8_calib_n)
    state, batches = _maybe_mesh(state, batches, mesh)

    tx = make_optimizer(cfg.lr)
    _, eval_step = make_twoview_step_fns(model, smplx_params, cfg, tx,
                                         loss=joints_loss)

    outputs = []
    pr_l, pb_l, pt_l, gj_l = [], [], [], []
    for batch in batches:
        valid = _pop_valid(batch)
        _, preds = eval_step(state, batch)
        pred_rotmat = np.asarray(preds["pred_rotmat"])[:valid]
        pred_trans = np.asarray(preds["pred_trans"])[:valid]
        pred_betas = np.asarray(preds["pred_betas"])[:valid]
        pred_angles = np.asarray(rotmat_to_aa(jnp.asarray(pred_rotmat)))
        gt_j = np.asarray(batch["gt_joints"])[:valid]
        outputs.append({"output": {
            "pred_angles0": pred_angles[:, 0],
            "pred_angles1": pred_angles[:, 1],
            "pred_smpltrans0": pred_trans[:, 0],
            "pred_smpltrans1": pred_trans[:, 1],
            "pred_betas0": pred_betas[:, 0], "pred_betas1": pred_betas[:, 1],
            "gt_joints_cam0": gt_j[:, 0], "gt_joints_cam1": gt_j[:, 1],
        }})
        pr_l.append(pred_rotmat)
        pb_l.append(pred_betas)
        pt_l.append(pred_trans)
        gj_l.append(gt_j)

    metrics = h36m_eval_metrics(
        smplx_params,
        jnp.asarray(np.concatenate(pr_l)),
        jnp.asarray(np.concatenate(pb_l)),
        jnp.asarray(np.concatenate(pt_l)),
        jnp.asarray(np.concatenate(gj_l)),
    )
    return outputs, {k: float(v) for k, v in metrics.items()}


def _int8_shim(model, state, batches, calib_n: int = 8):
    """Peek enough leading batches to collect ``calib_n`` calibration
    images, wrap ``model`` in the Int8Inference shim (shared by all
    compile passes' --int8 modes), and print the activation clip rates of
    the peeked images under the calibrated scales — the calibration
    adequacy signal (near 0 ⇒ the sample covered the activation range;
    see ops/int8_trunk.calibration_clip_rates)."""
    import itertools

    import jax.numpy as jnp

    from ..ops import Int8Inference

    batches = iter(batches)
    peeked, imgs = [], []
    n_imgs = 0
    while n_imgs < calib_n:
        try:
            b = next(batches)
        except StopIteration:
            break
        peeked.append(b)
        im = jnp.asarray(b["images"])
        if im.ndim == 5:  # canonical (B, 2, H, W, 3) batches: fold views
            im = im.reshape((-1,) + im.shape[2:])
        imgs.append(im)
        n_imgs += im.shape[0]
    imgs = jnp.concatenate(imgs)
    model = Int8Inference(
        model, {"params": state.params, "batch_stats": state.batch_stats},
        imgs[:calib_n])
    # measure clip rates OUT of sample: on the first batch past the
    # calibration prefix (abs-max calibration guarantees ~0 clipping on
    # the calibration images themselves, which would bias the adequacy
    # signal toward zero)
    held_out = True
    try:
        peeked.append(next(batches))
        sample = jnp.asarray(peeked[-1]["images"])
    except StopIteration:
        held_out = False
        sample = jnp.asarray(peeked[-1]["images"])
    rates = model.clip_report(sample)
    vals = np.asarray(list(rates.values()))
    worst = max(rates, key=rates.get)
    print(f"int8 calibration: {min(n_imgs, calib_n)} images; "
          f"{'held-out' if held_out else 'IN-SAMPLE (dataset exhausted)'} "
          f"clip rate mean {vals.mean():.2e}, max {vals.max():.2e} "
          f"({worst}) over {len(rates)} tensors", flush=True)
    return model, itertools.chain(peeked, batches)


def _full_body_fields(smplx_params, rotmat, betas, trans, intr, focal,
                      in_trans):
    """The reference is_test output's body-derived fields, suffixed per
    view (ref copenet_twoview.py:328-335 / copenet_real same): cam-frame
    vertices/joints via the identity-root forward + origin-pivot
    composition (transform_smpl, :282-305), their 2D projection
    (per-view ``focal``, per-sample principal point), and the zero-β
    "input" mesh at the IEF init translation (pred_vertices_cam_in*,
    :249-271). rotmat (B, 2, 22, 3, 3); in_trans (B, 2, 3)."""
    import jax.numpy as jnp

    from ..bodymodel.smplx import smplx_forward
    from ..train.losses import cam_frame_and_project

    B = rotmat.shape[0]
    root = jnp.asarray(rotmat[:, :, 0])
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B * 2, 1, 3, 3))
    body = smplx_forward(
        smplx_params,
        jnp.asarray(betas.reshape(B * 2, 10)),
        body_pose=jnp.asarray(rotmat[:, :, 1:].reshape(B * 2, 21, 3, 3)),
        global_orient=eye,
    )
    verts = jnp.reshape(body.vertices, (B, 2) + body.vertices.shape[1:])
    joints = jnp.reshape(body.joints, (B, 2) + body.joints.shape[1:])
    cam_v = (jnp.einsum("bvij,bvnj->bvni", root, verts, precision="highest")
             + jnp.asarray(trans)[:, :, None])
    cam_j, j2d = cam_frame_and_project(
        root, jnp.asarray(trans), joints, jnp.asarray(intr), focal)
    # zero-β input mesh at the init translation (identity root)
    body_in = smplx_forward(
        smplx_params,
        jnp.zeros((B * 2, 10), jnp.float32),
        body_pose=jnp.asarray(rotmat[:, :, 1:].reshape(B * 2, 21, 3, 3)),
        global_orient=eye,
    )
    verts_in = (
        jnp.reshape(body_in.vertices, (B, 2) + body_in.vertices.shape[1:])
        + jnp.asarray(in_trans)[:, :, None]
    )
    f = {}
    for v in (0, 1):
        f[f"pred_vertices_cam{v}"] = np.asarray(cam_v[:, v])
        f[f"pred_j3d_cam{v}"] = np.asarray(cam_j[:, v])
        f[f"pred_j2d_cam{v}"] = np.asarray(j2d[:, v])
        f[f"pred_vertices_cam_in{v}"] = np.asarray(verts_in[:, v])
    return f


def compile_singleview(state, model, smplx_params, batches: Iterable[Dict],
                       cfg, family, int8=False, int8_calib_n=8, mesh=None):
    """Eval the hmr / muhmr / copenet_singleview families: outputs pkl in
    the reference single-view format (pred_angles, pred_smpltrans via the
    weak-cam reprojection for the weak families — ref hmr.py:178-193,
    hmr_synth_res_compile.py:129-170) + MPJPE / PA-MPJPE / MPE.
    ``int8`` evaluates the quantized serving configuration (see
    compile_twoview)."""
    import jax
    import jax.numpy as jnp

    from .. import constants as C
    from ..eval.metrics import canonical_joints, mpe, mpjpe, pa_mpjpe
    from ..geometry.projection import weak_cam_crop_to_full_trans
    from ..geometry.rotations import rot6d_to_rotmat, rotmat_to_aa
    from ..train.loop import make_singleview_step_fns
    from ..train.state import make_optimizer

    if int8:
        model, batches = _int8_shim(model, state, batches, int8_calib_n)
    state, batches = _maybe_mesh(state, batches, mesh)

    tx = make_optimizer(cfg.lr)
    _, eval_step = make_singleview_step_fns(model, smplx_params, cfg, tx, family)

    outputs = []
    rms, betas_all, trans_all, gt_trans_all = [], [], [], []
    for batch in batches:
        valid = _pop_valid(batch)
        B = int(batch["images"].shape[0])
        _, out = eval_step(state, batch)
        if family == "copenet_singleview":
            pose = np.asarray(out.pose)
            trans = pose[:, :3] / cfg.trans_scale
            rotmat = np.asarray(rot6d_to_rotmat(jnp.asarray(pose[:, 3:]).reshape(-1, 22, 6)))
        else:
            rotmat = np.asarray(rot6d_to_rotmat(jnp.asarray(out.pose6d).reshape(-1, 22, 6)))
            if family == "muhmr":
                rotmat = rotmat.reshape(B, 2, 22, 3, 3)[:, 0]
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
            "pred_angles": angles[:valid],
            "pred_betas": betas[:valid],
            "pred_smpltrans": trans[:valid],
            "gt_angles": np.asarray(rotmat_to_aa(jnp.asarray(gt_rm)))[:valid],
            "gt_smpltrans": np.asarray(batch["gt_trans"])[:valid, 0],
        }})
        rms.append((rotmat[:valid], gt_rm[:valid]))
        betas_all.append(betas[:valid])
        trans_all.append(trans[:valid])
        gt_trans_all.append(np.asarray(batch["gt_trans"])[:valid, 0])

    pred_rm = np.concatenate([r[0] for r in rms])
    gt_rm = np.concatenate([r[1] for r in rms])
    N = pred_rm.shape[0]
    pj = canonical_joints(smplx_params, jnp.zeros((N, 10)), jnp.asarray(pred_rm))
    gj = canonical_joints(smplx_params, jnp.zeros((N, 10)), jnp.asarray(gt_rm))
    metrics = {
        "mpjpe": float(mpjpe(pj, gj)),
        "pa_mpjpe": float(pa_mpjpe(pj, gj)),
        "mpe": float(mpe(jnp.asarray(np.concatenate(trans_all)),
                         jnp.asarray(np.concatenate(gt_trans_all)))),
    }
    return outputs, metrics


def robust_crossview_consistency(
    smplx_params,
    pred_rotmat: np.ndarray,   # (N, 2, 22, 3, 3)
    pred_betas: np.ndarray,    # (N, 2, 10)
    extr: np.ndarray,          # (N, 2, 4, 4) per-frame camera extrinsics
    err_idcs: np.ndarray,      # (N,) bool robust-frame mask
) -> float:
    """The reference's real-data accuracy proxy (no 3D GT): root-relative
    3D joints of each view transformed into the world frame must agree —
    mean per-joint L2 over robust frames
    (ref copenet_real_res_compile.py:139-143: world-frame
    ``j3d_wrt_origin − trans_wrt_origin`` per view, differenced over
    err_idcs). The reference's j3d are the ORIGIN-pivot cam-frame joints
    from fwd_pass (identity-root forward, then transform_smpl — ref
    copenet_real/copenet_twoview.py:227-247), so root-relative world
    joints reduce to R_extrᵀ · R_root · canonical identity-root joints
    (the translations cancel; a root-in-model forward would pivot at the
    root JOINT and add per-view (I − R_root)·j0 terms the reference's
    formula does not have). The difference runs over the FULL joint set
    (the reference differences pred_j3d_cam = output.joints, all 127
    SMPL-X joints, not the 22-joint body subset)."""
    import jax.numpy as jnp

    from ..bodymodel.smplx import smplx_forward

    N = pred_rotmat.shape[0]
    rm = jnp.asarray(pred_rotmat.reshape(N * 2, 22, 3, 3))
    body = smplx_forward(
        smplx_params,
        jnp.asarray(pred_betas.reshape(N * 2, 10)),
        body_pose=rm[:, 1:],
        global_orient=jnp.broadcast_to(
            jnp.eye(3, dtype=rm.dtype), (N * 2, 1, 3, 3)),
    )
    pj = jnp.reshape(body.joints, (N, 2) + body.joints.shape[1:])
    root = jnp.asarray(pred_rotmat[:, :, 0])
    pj = jnp.einsum("nvij,nvkj->nvki", root, pj, precision="highest")
    R = jnp.asarray(extr[:, :, :3, :3])
    world = jnp.einsum("nvji,nvkj->nvki", R, pj, precision="highest")
    d = jnp.sqrt(jnp.sum((world[:, 0] - world[:, 1]) ** 2, axis=-1))  # (N, J)
    mask = jnp.asarray(err_idcs, jnp.float32)[:, None]
    return float((d * mask).sum() / jnp.maximum(mask.sum() * d.shape[1], 1.0))


def compile_real_twoview(state, model, smplx_params, vposer_params, ds,
                         batch_size: int, cfg, save_full=False,
                         err_idcs: Optional[np.ndarray] = None,
                         out_size: int = 224, int8=False, int8_calib_n=8,
                         mesh=None):
    """Real-data (self-supervised regime) compile: outputs pkl with the raw
    135-d pose state per view (the benchtest interchange,
    ref copenet_real_res_compile.py:264-276) + the robust cross-view
    consistency metric. No 3D GT exists on this path. ``int8`` evaluates
    the quantized serving configuration (see compile_twoview)."""
    import jax
    import jax.numpy as jnp

    from ..geometry.rotations import rotmat_to_aa
    from ..train.loop import make_real_twoview_step_fns
    from ..train.state import make_optimizer

    batches = real_batches(ds, batch_size, out_size=out_size)
    if int8:
        model, batches = _int8_shim(model, state, batches, int8_calib_n)
    state, batches = _maybe_mesh(state, batches, mesh)

    tx = make_optimizer(cfg.lr)
    _, eval_step = make_real_twoview_step_fns(
        model, smplx_params, vposer_params, cfg, tx
    )

    outputs = []
    losses = []
    all_rotmat, all_betas, all_trans, all_extr = [], [], [], []
    from ..geometry.rotations import rot6d_to_rotmat

    for batch in batches:
        valid = _pop_valid(batch)
        B = int(batch["images"].shape[0])
        metrics, out = eval_step(state, batch)
        # the tail batch's loss is already an exact mean over its valid
        # rows (row_weight mask in the loss); weighting batches by valid
        # rows makes the reported loss an exact per-frame mean
        losses.append((float(metrics["loss"]), valid))
        pose = np.asarray(out.pose)
        betas = np.asarray(out.betas)
        trans = pose[..., :3] / cfg.trans_scale
        rotmat = np.asarray(
            rot6d_to_rotmat(jnp.asarray(pose[..., 3:]).reshape(B, 2, 22, 6))
        )
        angles = np.asarray(rotmat_to_aa(jnp.asarray(rotmat)))
        rec = {
            "pred_pose0": pose[:, 0], "pred_pose1": pose[:, 1],
            "pred_angles0": angles[:, 0], "pred_angles1": angles[:, 1],
            "pred_smpltrans0": trans[:, 0], "pred_smpltrans1": trans[:, 1],
            "pred_betas0": betas[:, 0], "pred_betas1": betas[:, 1],
        }
        if save_full:
            # per-view real focals (ref real fwd_pass projects
            # pred_j2d_cam with focal_length0/1, copenet_real/
            # copenet_twoview.py:297-307) — batch["focal"] is already in
            # VIEW order (real_batches swaps the pair under first_cam=1,
            # and aircap substitutes the capture's true intrinsics); the
            # IEF init translation is the fixed [0, 0, 10] of the real path
            in_t = np.tile([0, 0, 10.0], (B, 2, 1)).astype(np.float32)
            rec.update(_full_body_fields(
                smplx_params, rotmat, betas, trans,
                np.asarray(batch["intr"]),
                np.asarray(batch.get("focal", ds.focal_pairs())), in_t))
            rec["in_smpltrans0"] = in_t[:, 0]
            rec["in_smpltrans1"] = in_t[:, 1]
        outputs.append({"output": {k: v[:valid] for k, v in rec.items()}})
        all_rotmat.append(rotmat[:valid])
        all_betas.append(betas[:valid])
        all_trans.append(trans[:valid])
        all_extr.append(np.asarray(batch["extr"])[:valid])

    pred_rotmat = np.concatenate(all_rotmat)
    pred_betas = np.concatenate(all_betas)
    extr = np.concatenate(all_extr)
    N = pred_rotmat.shape[0]
    if err_idcs is None:
        # default robust mask: a person detected in AT LEAST ONE view —
        # matches the reference's ~(person_present[0]*person_present[1])
        # where person_present means ABSENT (ref :137-138; err_idcs.npy
        # overrides when given). Do not "fix" this to both-views: it would
        # change crossview_consistency and break reference parity.
        conf = ds.opose[:, :, :, 2].sum(axis=2)  # (2, n)
        err_idcs = ~((conf[0] == 0) & (conf[1] == 0))
    err_idcs = np.asarray(err_idcs)[:N]
    metrics = {
        "loss": float(np.average([l for l, _ in losses],
                                 weights=[w for _, w in losses])),
        "crossview_consistency": robust_crossview_consistency(
            smplx_params, pred_rotmat, pred_betas, extr, err_idcs
        ),
        "robust_frames": float(err_idcs.sum()),
    }
    return outputs, metrics


def compile_real_singleview(state, model, smplx_params, vposer_params, ds,
                            batch_size: int, cfg, cam: int,
                            out_size: int = 224, int8=False,
                            int8_calib_n=8, mesh=None):
    """Real-data Baseline (hmr) compile for ONE camera — the reference
    evaluates two hmr nets pinned to cam0/cam1 via ``first_cam`` and writes
    one outputs pkl per camera (ref scripts/hmr_real_res_compile.py; the
    AirPose+ driver consumes them as the 'bl_' baseline trajectories,
    bundle_adj.py:152-166). ``ds`` must be constructed with
    ``first_cam=cam`` so view 0 is that camera."""
    import jax
    import jax.numpy as jnp

    from ..geometry.projection import weak_cam_crop_to_full_trans
    from ..geometry.rotations import rot6d_to_rotmat, rotmat_to_aa
    from ..train.loop import make_real_singleview_step_fns
    from ..train.state import make_optimizer

    batches = real_batches(ds, batch_size, out_size=out_size)
    if int8:
        model, batches = _int8_shim(model, state, batches, int8_calib_n)
    state, batches = _maybe_mesh(state, batches, mesh)

    tx = make_optimizer(cfg.lr)
    _, eval_step = make_real_singleview_step_fns(
        model, smplx_params, vposer_params, cfg, tx, "hmr_camswap_difffl"
    )
    focal_full = ds.focal_pairs()[cam]

    outputs, losses = [], []
    for batch in batches:
        valid = _pop_valid(batch)
        B = int(batch["images"].shape[0])
        metrics, out = eval_step(state, batch)
        losses.append((float(metrics["loss"]), valid))
        rotmat = np.asarray(
            rot6d_to_rotmat(jnp.asarray(out.pose6d).reshape(B, 22, 6))
        )
        # full-image translation from the crop-frame weak camera, through
        # this camera's real intrinsics (ref hmr.py:163-193 reprojection;
        # the weak camera itself uses the crop focal 5000,
        # hmr_camswap_difffl.py:78-80)
        trans = np.asarray(weak_cam_crop_to_full_trans(
            jnp.asarray(out.cam), jnp.asarray(batch["bb"][:, 0]),
            jnp.asarray(batch["intr"][:, 0]), (5000.0, 5000.0), cfg.img_res,
        ))
        outputs.append({"output": {
            "pred_angles": np.asarray(rotmat_to_aa(jnp.asarray(rotmat)))[:valid],
            "pred_betas": np.asarray(out.betas)[:valid],
            "pred_smpltrans": trans[:valid],
            "pred_cam": np.asarray(out.cam)[:valid],
        }})
    return outputs, {"loss": float(np.average([l for l, _ in losses],
                                              weights=[w for _, w in losses])),
                     "camera": float(cam),
                     "focal_x": float(focal_full[0])}


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="copenet_twoview")
    p.add_argument("--ckpt", default=None, help="orbax checkpoint dir (TrainState)")
    p.add_argument("--torch_ckpt", default=None,
                   help="reference Lightning .ckpt — converted in-memory "
                        "(the copenet_synth_res_compile.py entry contract)")
    p.add_argument("--datapath", default="synthetic://64")
    p.add_argument("--split", nargs="+", default=["test"],
                   choices=("test", "train"),
                   help="on-disk splits to compile, in pkl order "
                        "(the reference runs [test, train])")
    p.add_argument("--out", default="results.pkl")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--img_res", type=int, default=224)
    p.add_argument("--synthetic_verts", type=int, default=10475,
                   help="synthetic body-model size when no --smplx_model_dir")
    p.add_argument("--save-full", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="evaluate the int8 PTQ serving configuration "
                        "(any model family, synthetic/on-disk/real "
                        "paths): measures the quantization cost on the "
                        "same metrics")
    p.add_argument("--int8_calib_n", type=int, default=8,
                   help="activation-calibration sample size for --int8; "
                        "the printed clip rates tell you whether it "
                        "covered the data's activation range (raise on "
                        "captures with exposure/contrast swings)")
    p.add_argument("--mesh", type=int, default=None, metavar="N",
                   help="data-parallel eval over the first N devices: the "
                        "state is replicated, every eval batch is sharded "
                        "on its batch axis, and the jitted forward runs "
                        "SPMD across the chips (use a --batch_size "
                        "divisible by N; non-divisible batches fall back "
                        "to replication, correct but unaccelerated)")
    p.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    p.add_argument("--smplx_model_dir", default=None)
    p.add_argument("--vposer_ckpt", default=None,
                   help="released VPoser v2 weights (torch file or npz) for "
                        "the real-data eval loss")
    p.add_argument("--first_cam", type=int, default=0,
                   help="real:// camera pinning (ref first_cam)")
    p.add_argument("--err_idcs", default=None,
                   help="real:// robust-frame .npy mask "
                        "(ref scripts/err_idcs.npy)")
    p.add_argument("--train_frames", type=int, nargs=2, default=(0, 7000))
    p.add_argument("--test_frames", type=int, nargs=2, default=(8000, 15000))
    args = p.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from ..bodymodel import load_smplx_npz, synthetic_smplx_params
    from ..config import TrainConfig
    from ..data import make_synthetic_dataset
    from ..models import MODEL_REGISTRY, family_init_args
    from ..train.state import create_train_state

    mesh = None
    if args.mesh:
        from ..parallel.mesh import make_mesh

        if args.mesh > len(jax.devices()):
            p.error(f"--mesh {args.mesh} > {len(jax.devices())} available "
                    "devices")
        if args.batch_size % args.mesh:
            print(f"WARNING: --batch_size {args.batch_size} not divisible "
                  f"by --mesh {args.mesh}; batches will be replicated, not "
                  "sharded", flush=True)
        mesh = make_mesh(args.mesh)

    cfg = TrainConfig(model=args.model, batch_size=args.batch_size,
                      img_res=args.img_res)
    if args.smplx_model_dir:
        smplx_params = load_smplx_npz(args.smplx_model_dir)
    else:
        smplx_params = synthetic_smplx_params(
            num_vertices=300 if args.datapath.startswith("synthetic")
            else args.synthetic_verts
        )

    is_real = args.datapath.startswith(("real://", "aircap://"))
    model = MODEL_REGISTRY[args.model](iters=cfg.reg_iters)
    state, _ = create_train_state(
        model, family_init_args(args.model, batch_size=1, img_res=64),
        jax.random.PRNGKey(0), lr=cfg.lr,
    )
    if args.torch_ckpt:
        import torch  # host-side conversion only

        from ..train.checkpoint import convert_reference_checkpoint

        blob = torch.load(args.torch_ckpt, map_location="cpu",
                          weights_only=False)
        sd = blob.get("state_dict", blob)
        variables = convert_reference_checkpoint(sd, args.model)
        state = state.replace(
            params=jax.tree.map(jnp.asarray, variables["params"]),
            batch_stats={**state.batch_stats,
                         **jax.tree.map(jnp.asarray, variables["batch_stats"])},
        )
    elif args.ckpt:
        # Template-free restore: the checkpoint's opt_state may belong to
        # any optimizer variant (a --train_reg_only fine-tune writes a
        # multi_transform structure) and eval never needs it — a
        # TrainState-template restore rejects exactly those checkpoints
        # (the round-2 server defect, resurfaced here by the rehearsal's
        # synthetic→real fine-tune stage).
        from ..train.checkpoint import load_model_variables

        _, variables = load_model_variables(args.model, ckpt=args.ckpt)
        state = state.replace(
            params=jax.tree.map(jnp.asarray, variables["params"]),
            batch_stats={**state.batch_stats,
                         **jax.tree.map(jnp.asarray,
                                        variables["batch_stats"])},
        )

    per_split = []
    metrics_by_split = {}
    if args.datapath.startswith("synthetic://"):
        n = int(args.datapath.split("//")[1] or 64)
        data = make_synthetic_dataset(smplx_params, n, seed=7)
        B = min(args.batch_size, n)
        splits = {"test": synthetic_batches(data, B)}
        split_names = ["test"]
    elif args.datapath.startswith("h36m://"):
        # Human3.6M prebuilt-db eval: joints-GT metrics (root-aligned
        # MPJPE / PA-MPJPE / pelvis MPE). `--split` selects the camera
        # pair per the reference's h36m_full_train/test convention
        # (train = cams 1/2, test = 3/4).
        from ..data import H36MDataset

        if args.model not in ("copenet_twoview", "copenet_twoview_sep"):
            p.error("h36m:// eval supports the twoview families only")
        path = args.datapath[len("h36m://"):]
        for split in args.split:
            ds = H36MDataset(path, split)
            if len(ds) == 0:
                p.error(f"no frames in the h36m db under {path}")
            B = min(args.batch_size, len(ds))
            outputs, metrics = compile_h36m_twoview(
                state, model, smplx_params,
                h36m_batches(ds, B, out_size=args.img_res), cfg,
                int8=args.int8, int8_calib_n=args.int8_calib_n, mesh=mesh,
            )
            per_split.append(outputs)
            metrics_by_split[split] = metrics
        splits = None
        split_names = args.split
    elif args.datapath.startswith("totalcap://"):
        # TotalCapture prebuilt-db eval: SMPL GT converted per batch to
        # the synthetic contract, then the standard supervised compile
        # passes/metrics apply. Splits mirror the trainer's 80/20.
        from ..data import TotalCaptureDataset

        path = args.datapath[len("totalcap://"):]
        ds = TotalCaptureDataset(path)
        if len(ds) == 0:
            p.error(f"no frames in the totalcap db under {path}")
        n_train = max(1, int(len(ds) * 0.8))
        ranges = {"train": range(0, n_train),
                  "test": range(n_train, len(ds))}
        splits = {}
        for split in args.split:
            idx = ranges[split]
            if len(idx) == 0:
                p.error(f"totalcap split '{split}' is empty "
                        f"({len(ds)} frames, 80/20)")
            B = min(args.batch_size, len(idx))
            splits[split] = totalcap_batches(
                ds, smplx_params, B, out_size=args.img_res, indices=idx)
        split_names = args.split
    elif is_real:
        from ..bodymodel.vposer import init_vposer_params, load_vposer_ckpt

        is_aircap = args.datapath.startswith("aircap://")
        path = args.datapath.split("://", 1)[1]
        if args.vposer_ckpt:
            vposer_params = load_vposer_ckpt(args.vposer_ckpt)
        else:
            print("WARNING: no --vposer_ckpt; the eval loss uses a RANDOM "
                  "VPoser prior (metrics other than the loss are unaffected)")
            vposer_params = init_vposer_params(0)
        from ..data import AircapDataset, CopenetRealDataset

        ranges = {"test": range(*args.test_frames),
                  "train": range(*args.train_frames)}
        err = np.load(args.err_idcs) if args.err_idcs else None

        _ds_cache: Dict = {}

        def real_ds(split, first_cam):
            # the detector pkls / calib parse is identical for both camera
            # orders (first_cam only permutes views at host_batch time), so
            # the hmr per-camera path reuses one parsed dataset per split
            if split not in _ds_cache:
                if is_aircap:
                    # cross-dataset eval (the reference's
                    # --testdata=aircapdata, ref
                    # copenet/dsets/aircapData.py:29-304)
                    _ds_cache[split] = AircapDataset(
                        path, drange=ranges[split], first_cam=first_cam)
                else:
                    _ds_cache[split] = CopenetRealDataset(
                        path, frame_range=ranges[split],
                        first_cam=first_cam)
            ds = _ds_cache[split]
            ds.first_cam = first_cam
            return ds

        if args.model == "hmr":
            # Baseline on real data: one outputs pkl PER CAMERA, suffixes
            # "0"/"1" (ref hmr_real_res_compile.py / bundle_adj.py:152-154
            # loading fname+"0", fname+"1")
            for cam in (0, 1):
                cam_splits = []
                for split in args.split:
                    ds = real_ds(split, cam)
                    if len(ds) == 0:
                        p.error(f"no frames for split '{split}' in the "
                                "requested frame range (check "
                                "--test_frames/--train_frames against the "
                                "capture length)")
                    B = min(args.batch_size, len(ds))
                    outputs, metrics = compile_real_singleview(
                        state, model, smplx_params, vposer_params, ds, B,
                        cfg, cam, out_size=args.img_res, int8=args.int8,
                        int8_calib_n=args.int8_calib_n, mesh=mesh,
                    )
                    cam_splits.append(outputs)
                    metrics_by_split[f"{split}_cam{cam}"] = metrics
                with open(args.out + str(cam), "wb") as f:
                    pickle.dump(cam_splits, f)
                print(f"wrote {args.out}{cam}")
            import json

            for split, metrics in metrics_by_split.items():
                for k, v in metrics.items():
                    print(f"{split}_{k}: {v:.4f}")
            with open(args.out + ".metrics.json", "w") as f:
                json.dump(metrics_by_split, f, indent=1)
            return
        for split in args.split:
            ds = real_ds(split, args.first_cam)
            if len(ds) == 0:
                p.error(f"no frames for split '{split}' in the requested "
                        "frame range (check --test_frames/--train_frames "
                        "against the capture length)")
            B = min(args.batch_size, len(ds))
            outputs, metrics = compile_real_twoview(
                state, model, smplx_params, vposer_params, ds, B, cfg,
                save_full=args.save_full, err_idcs=err,
                out_size=args.img_res, int8=args.int8,
                int8_calib_n=args.int8_calib_n, mesh=mesh,
            )
            per_split.append(outputs)
            metrics_by_split[split] = metrics
        splits = None
        split_names = args.split
    else:
        from ..data import AerialPeopleDataset

        splits = {}
        for split in args.split:
            ds = AerialPeopleDataset(args.datapath, split)
            if len(ds) == 0:
                p.error(f"no samples for split '{split}' under "
                        f"{args.datapath} (expected the AerialPeople pkl "
                        "layout with a non-empty split directory)")
            genders_to_params = None
            if args.smplx_model_dir:
                genders_to_params = {}
                for g in ("male", "female", "neutral"):
                    gp = os.path.join(args.smplx_model_dir,
                                      f"SMPLX_{g.upper()}.npz")
                    if os.path.exists(gp):
                        genders_to_params[g] = load_smplx_npz(
                            args.smplx_model_dir, gender=g)
                genders_to_params = genders_to_params or None
            ds.precompute_canonical_gt(smplx_params, genders_to_params)
            B = min(args.batch_size, len(ds))
            splits[split] = aerialpeople_batches(ds, B, out_size=args.img_res)
        split_names = args.split

    if splits is not None:  # synthetic / on-disk supervised paths
        for split in split_names:
            if args.model in ("copenet_twoview", "copenet_twoview_sep"):
                outputs, metrics = compile_twoview(
                    state, model, smplx_params, splits[split], cfg,
                    save_full=args.save_full, int8=args.int8,
                    int8_calib_n=args.int8_calib_n, mesh=mesh,
                )
            else:
                outputs, metrics = compile_singleview(
                    state, model, smplx_params, splits[split], cfg,
                    args.model, int8=args.int8,
                    int8_calib_n=args.int8_calib_n, mesh=mesh,
                )
            per_split.append(outputs)
            metrics_by_split[split] = metrics

    import json

    for split, metrics in metrics_by_split.items():
        for k, v in metrics.items():
            print(f"{split}_{k}: {v:.4f}")
    with open(args.out, "wb") as f:
        pickle.dump(per_split, f)
    with open(args.out + ".metrics.json", "w") as f:
        json.dump(metrics_by_split, f, indent=1)
    print(f"wrote {args.out} ({[len(o) for o in per_split]} batches per split)")


if __name__ == "__main__":
    main()
