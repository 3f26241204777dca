"""Released-asset parity runner — the BASELINE.md north star in one command.

The reference's published capability is its released checkpoints +
precalculated result pkls (ref /root/reference/README.md:22-27: each
`*_ckpt` archive ships "pretrained checkpoint ... and pkl files for
precalculated results"; scripts/copenet_synth_res_compile.py:25-64 is the
consuming contract — `res = trainer.test(...)` saved as
`[test_batches, train_batches]`, each batch `{"output": {pred_angles0/1,
pred_smpltrans0/1, pred_betas0/1, gt_smpltrans0/1, ...}}`). Every stage of
the parity chain exists in this framework; this tool chains them so the
moment the assets are mounted the north-star run is ONE command:

    python -m airpose_tpu.tools.parity_run \
        --model copenet_twoview \
        --torch-ckpt epoch=205...ckpt \
        --precalc epoch=205....pkl \
        --datapath /data/agora_copenet_uniform_new_cropped \
        --smplx-model-dir /data/smplx/models/smplx \
        --workdir parity_out

Stages:
  1. loud asset validation (ckpt loads, precalc pkl matches the res
     contract, datapath/SMPL-X layout present)
  2. reference .ckpt → orbax (train/checkpoint.convert_ckpt_file_to_orbax)
  3. eval on the synthetic dataset through compile_results (deterministic
     crops — parity is defined on the eval path, SURVEY §7 risks)
  4. comparison: per-field mean/max |Δ| of our outputs vs the
     precalculated ones over aligned frames, AND both sides' predictions
     scored with the SAME metric code (MPJPE/PA-MPJPE/MPE) against the
     dataset GT our eval collected

``--datapath real://<dir>`` switches to the REAL released bundles
(hmr_real_ckpt.zip / copenet_twoview_real_ckpt.zip): the precalc pkls
follow the same suffixed-field contract
(copenet_real_res_compile.py:116-127), there is no 3D GT, and the score
recomputed for both sides is the robust cross-view consistency
(res_compile:139-143) over the capture's extrinsics + detector mask.
``--model hmr`` with real:// consumes the per-camera pkl PAIR the
reference's hmr_real_res_compile.py writes (``<base>0``/``<base>1``,
one net per first_cam pinning, :35-74) — pass the base name as
``--precalc`` — and recomputes the same cross-view consistency its
analysis block computes over both cameras' outputs (:194-204).

Writes ``<workdir>/parity_report.json`` and prints the table. On fixtures
(no released assets) the mechanics are regression-tested by generating a
"released-like" bundle from a trained fixture checkpoint — see
tests/test_tools.py::test_parity_run_fixture_bundle.
"""

import argparse
import json
import os
import os.path as osp
import pickle

import numpy as np

# the reference res-contract fields a released precalc pkl carries
# (copenet_synth_res_compile.py commented compile block, :96-120). The
# two-view families suffix per view; the single-view families
# (hmr/copenet_singleview; muhmr's compile keeps view 0) do not.
REQUIRED_OUTPUT_KEYS = {
    "twoview": ("pred_angles0", "pred_angles1", "pred_smpltrans0",
                "pred_smpltrans1", "pred_betas0", "pred_betas1"),
    "single": ("pred_angles", "pred_smpltrans", "pred_betas"),
}


def family_kind(model: str) -> str:
    return "twoview" if model == "copenet_twoview" else "single"


def _np(t):
    """torch tensor / array → numpy (the released pkls store torch CPU
    tensors; torch stays host-side, outside the compute path)."""
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def load_precalc(path: str, split_index: int = 0,
                 required=REQUIRED_OUTPUT_KEYS["twoview"]):
    """Load a released precalculated-results pkl and return the requested
    split's outputs as {field: (N, ...) numpy}. The file is either
    `[test_batches, train_batches]` (the res_compile layout) or a bare
    batch list. Validates the contract loudly."""
    with open(path, "rb") as f:
        res = pickle.load(f)
    if not isinstance(res, (list, tuple)) or len(res) == 0:
        raise ValueError(f"{path}: expected a list (res_compile layout), "
                         f"got {type(res).__name__}")
    # [splits][batches] vs [batches]
    if isinstance(res[0], dict) and "output" in res[0]:
        batches = res
    else:
        if split_index >= len(res):
            raise ValueError(f"{path}: has {len(res)} splits, asked for "
                             f"split index {split_index}")
        batches = res[split_index]
    if (not isinstance(batches, (list, tuple)) or len(batches) == 0
            or not isinstance(batches[0], dict)
            or "output" not in batches[0]):
        raise ValueError(
            f"{path}: split {split_index} is not a list of "
            f"{{'output': {{...}}}} batches (the trainer.test layout)")
    keys = set(batches[0]["output"].keys())
    missing = [k for k in required if k not in keys]
    if missing:
        raise ValueError(
            f"{path}: precalc outputs missing {missing}; present: "
            f"{sorted(keys)}")
    fields = {}
    for k in sorted(keys):
        try:
            fields[k] = np.concatenate(
                [_np(b["output"][k]) for b in batches])
        except ValueError as e:
            raise ValueError(f"{path}: field '{k}' does not concatenate "
                             f"across batches: {e}") from None
    return fields


def compare_outputs(ours: dict, theirs: dict):
    """Per-field mean/max |Δ| over the aligned frame prefix of the shared
    fields. Row-count mismatches are expected (the reference evaluates
    with drop_last batches; this framework covers every frame) and
    reported, not fatal."""
    shared = sorted(set(ours) & set(theirs))
    report = {}
    for k in shared:
        # float32 + chunked: the vertex fields are ~GB-scale over a full
        # released split; a float64 whole-field diff would triple the peak
        a, b = np.asarray(ours[k], np.float32), np.asarray(
            theirs[k], np.float32)
        n = min(a.shape[0], b.shape[0])
        if a.shape[1:] != b.shape[1:]:
            report[k] = {"error": f"shape mismatch {a.shape} vs {b.shape}"}
            continue
        # truncate BOTH sides to the aligned prefix before chunking —
        # row-count mismatches are the expected case (drop_last batches,
        # --test_frames windows)
        a, b = a[:n], b[:n]
        tot, mx, cnt = 0.0, 0.0, 0
        for s in range(0, n, 512):
            d = np.abs(a[s:s + 512].astype(np.float64)
                       - b[s:s + 512].astype(np.float64))
            tot += float(d.sum())
            mx = max(mx, float(d.max()))
            cnt += d.size
        report[k] = {"n": int(n), "mean_abs": tot / max(cnt, 1),
                     "max_abs": mx}
    return report


def metrics_from_fields(fields: dict, gt: dict, smplx_params):
    """Score a side's predictions with this framework's metric code
    (eval/metrics.twoview_eval_metrics) against the dataset GT — the same
    formulas for both sides, so the metric deltas isolate the MODEL, not
    the metric implementation."""
    import jax.numpy as jnp

    from ..eval.metrics import twoview_eval_metrics
    from ..geometry.rotations import batch_rodrigues

    n = min(fields["pred_angles0"].shape[0], gt["gt_pose_rotmat"].shape[0])

    def rm(angles):  # (N, 22, 3) aa → (N, 22, 3, 3)
        a = np.asarray(angles[:n], np.float32)
        if a.ndim == 2:
            a = a.reshape(n, -1, 3)
        return np.asarray(
            batch_rodrigues(jnp.asarray(a.reshape(-1, 3)))
        ).reshape(n, -1, 3, 3)

    pred_rotmat = np.stack(
        [rm(fields["pred_angles0"]), rm(fields["pred_angles1"])], axis=1)
    pred_betas = np.stack([fields["pred_betas0"][:n],
                           fields["pred_betas1"][:n]], axis=1)
    pred_trans = np.stack([fields["pred_smpltrans0"][:n],
                           fields["pred_smpltrans1"][:n]], axis=1)
    m = twoview_eval_metrics(
        smplx_params,
        jnp.asarray(pred_rotmat, jnp.float32),
        jnp.asarray(pred_betas, jnp.float32),
        jnp.asarray(pred_trans, jnp.float32),
        jnp.asarray(gt["gt_pose_rotmat"][:n]),
        jnp.asarray(gt["gt_orient"][:n]),
        jnp.asarray(gt["gt_betas"][:n]),
        jnp.asarray(gt["gt_trans"][:n]),
    )
    return {k: float(v) for k, v in m.items()}


def real_crossview(fields: dict, ds, smplx_params) -> float:
    """Robust cross-view consistency of a side's predictions over the
    capture's extrinsics + detector mask — the reference's real-data
    accuracy proxy, same code path as the eval CLI
    (compile_results.robust_crossview_consistency)."""
    import jax.numpy as jnp

    from ..eval.compile_results import robust_crossview_consistency
    from ..geometry.rotations import batch_rodrigues

    n = min(fields["pred_angles0"].shape[0], ds.extr.shape[1])

    def rm(angles):
        a = np.asarray(angles[:n], np.float32)
        if a.ndim == 2:
            a = a.reshape(n, -1, 3)
        return np.asarray(
            batch_rodrigues(jnp.asarray(a.reshape(-1, 3)))
        ).reshape(n, -1, 3, 3)

    pred_rotmat = np.stack(
        [rm(fields["pred_angles0"]), rm(fields["pred_angles1"])], axis=1)
    pred_betas = np.stack([fields["pred_betas0"][:n],
                           fields["pred_betas1"][:n]], axis=1)
    extr = np.stack([ds.extr[0, :n], ds.extr[1, :n]], axis=1)
    conf = ds.opose[:, :n, :, 2].sum(axis=2)
    err = ~((conf[0] == 0) & (conf[1] == 0))
    return robust_crossview_consistency(
        smplx_params, pred_rotmat, pred_betas, extr, err)


def _suffix_cams(per_cam) -> dict:
    """[{field: arr} cam0, {field: arr} cam1] → {field+cam: arr} — the
    suffixed layout real_crossview/compare_outputs consume, mirroring how
    the reference's analysis block reads the hmr pkl pair
    (hmr_real_res_compile.py:141-146: pred_betas0/1 etc. from res0/res1)."""
    return {f"{k}{cam}": v for cam, fields in enumerate(per_cam)
            for k, v in fields.items()}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="copenet_twoview",
                   choices=("copenet_twoview", "muhmr", "hmr",
                            "copenet_singleview"))
    p.add_argument("--torch-ckpt", required=True,
                   help="released reference Lightning .ckpt")
    p.add_argument("--precalc", required=True,
                   help="released precalculated-results .pkl from the "
                        "same archive")
    p.add_argument("--datapath", required=True,
                   help="the released synthetic dataset root "
                        "(agora_copenet_* layout)")
    p.add_argument("--smplx-model-dir", default=None,
                   help="released SMPLX_*.npz dir; omit only for fixture "
                        "runs (synthetic body model, parity NOT meaningful)")
    p.add_argument("--synthetic_verts", type=int, default=99,
                   help="fixture body-model size when --smplx-model-dir "
                        "is absent")
    p.add_argument("--vposer_ckpt", default=None)
    p.add_argument("--workdir", required=True)
    p.add_argument("--split", default="test", choices=("test", "train"))
    p.add_argument("--test_frames", type=int, nargs=2, default=(8000, 15000),
                   help="real:// frame range (the reference real test "
                        "split, dsets/copenet_real.py:22)")
    p.add_argument("--batch_size", type=int, default=30)
    p.add_argument("--img_res", type=int, default=224)
    p.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    args = p.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.workdir, exist_ok=True)

    # ---- 1. loud asset validation ----
    is_real = args.datapath.startswith("real://")
    data_dir = args.datapath.split("://", 1)[-1]
    is_real_hmr = is_real and args.model == "hmr"
    precalc_paths = ([args.precalc + "0", args.precalc + "1"]
                     if is_real_hmr else [args.precalc])
    for path, what in ([(args.torch_ckpt, "--torch-ckpt"),
                        (data_dir, "--datapath")]
                       + [(pp, "--precalc") for pp in precalc_paths]):
        if not osp.exists(path):
            raise SystemExit(f"{what}: {path} does not exist")
    if is_real and args.model not in ("copenet_twoview", "hmr"):
        raise SystemExit("real:// parity supports the two RELEASED real "
                         "bundles: copenet_twoview and hmr "
                         "(ref README.md:28-29)")
    if is_real and args.split != "test":
        raise SystemExit("real:// parity runs the test split — the "
                         "reference's real analysis is defined on frames "
                         "8000:15000 (copenet_real_res_compile.py:107-116); "
                         "set --test_frames to move the window")
    kind = family_kind(args.model)
    split_index = 0 if args.split == "test" else 1
    if is_real_hmr:
        theirs = _suffix_cams([
            load_precalc(pp, split_index=split_index,
                         required=REQUIRED_OUTPUT_KEYS["single"])
            for pp in precalc_paths])
        first_key = "pred_angles0"
    else:
        theirs = load_precalc(args.precalc, split_index=split_index,
                              required=REQUIRED_OUTPUT_KEYS[kind])
        first_key = REQUIRED_OUTPUT_KEYS[kind][0]
    n_ref = theirs[first_key].shape[0]
    if is_real:
        # same fail-fast policy for the real capture: every machine file
        # the reader needs, diagnosed before the convert/eval stages
        from ..data.real import validate_capture_layout

        validate_capture_layout(data_dir)
        print("[1/4] capture first contact OK: machine_{1,2} layout "
              "complete", flush=True)
    else:
        # First contact with the released dataset unpack: relocate stale
        # builder-machine absolute paths (index pkl + sample im0/im1) and
        # schema-check sample 0 NOW, before the expensive convert/eval
        # stages — the released pkls store absolute paths, which is why
        # the reference ships a rewrite step
        # (ref copenet/scripts/prepare_aerialpeople_dataset.py:1-16).
        from ..data.aerialpeople import AerialPeopleDataset

        ds_probe = AerialPeopleDataset(data_dir, args.split)
        print(f"[1/4] dataset first contact OK: {len(ds_probe)} "
              f"{args.split} samples, sample-0 schema + paths resolve",
              flush=True)
        del ds_probe
    print(f"[1/4] assets validated: precalc has {n_ref} {args.split} "
          f"frames, fields {sorted(theirs)[:8]}…", flush=True)

    # ---- 2. convert the released checkpoint ----
    from ..train.checkpoint import convert_ckpt_file_to_orbax

    converted = osp.join(args.workdir, "converted_orbax")
    convert_ckpt_file_to_orbax(args.torch_ckpt, args.model, converted)
    print(f"[2/4] converted {args.torch_ckpt} → {converted}", flush=True)

    # ---- 3. our eval over the released dataset ----
    from ..eval.compile_results import main as compile_main

    ours_pkl = osp.join(args.workdir, f"ours_{args.split}.pkl")
    cmd = [
        "--model", args.model, "--ckpt", converted,
        "--datapath", args.datapath, "--split", args.split,
        "--out", ours_pkl, "--batch_size", str(args.batch_size),
        "--img_res", str(args.img_res),
    ]
    if args.model == "copenet_twoview":
        # the released twoview precalc pkls carry the full body-derived
        # field set (pred_vertices_cam*, pred_j3d_cam*, pred_j2d_cam*,
        # pred_vertices_cam_in*); export ours too so the stage-4 field
        # diff covers them
        cmd += ["--save-full"]
    if is_real:
        cmd += ["--test_frames", str(args.test_frames[0]),
                str(args.test_frames[1])]
    if args.smplx_model_dir:
        cmd += ["--smplx-model-dir", args.smplx_model_dir]
    else:
        print("WARNING: no --smplx-model-dir — running on the SYNTHETIC "
              "body model; field diffs remain meaningful, MPJPE does not",
              flush=True)
        cmd += ["--synthetic_verts", str(args.synthetic_verts)]
    if args.vposer_ckpt:
        cmd += ["--vposer_ckpt", args.vposer_ckpt]
    compile_main(cmd)

    def read_pkl_fields(path):
        with open(path, "rb") as f:
            batches = pickle.load(f)[0]
        return {k: np.concatenate([_np(b["output"][k]) for b in batches])
                for k in batches[0]["output"]}

    with open(ours_pkl + ".metrics.json") as f:
        metrics_json = json.load(f)
    if is_real_hmr:
        ours = _suffix_cams([read_pkl_fields(ours_pkl + "0"),
                             read_pkl_fields(ours_pkl + "1")])
        our_metrics = {f"cam{c}_{k}": v for c in (0, 1) for k, v in
                       metrics_json[f"{args.split}_cam{c}"].items()}
    else:
        ours = read_pkl_fields(ours_pkl)
        our_metrics = metrics_json[args.split]
    n_ours = ours[first_key].shape[0]
    print(f"[3/4] our eval done: {n_ours} frames", flush=True)

    # ---- 4. comparison ----
    field_report = compare_outputs(ours, theirs)
    report = {"fields": field_report, "ours_metrics": our_metrics,
              "n_ours": int(n_ours), "n_precalc": int(n_ref)}
    if is_real:
        # no 3D GT on the real path: the recomputed score for both sides
        # is the robust cross-view consistency over the capture. For hmr
        # the two cameras' independent nets are combined exactly as the
        # reference's analysis block does (hmr_real_res_compile.py:194-204).
        from ..bodymodel import load_smplx_npz, synthetic_smplx_params
        from ..data import CopenetRealDataset

        smplx_params = (load_smplx_npz(args.smplx_model_dir)
                        if args.smplx_model_dir else
                        synthetic_smplx_params(
                            num_vertices=args.synthetic_verts))
        ds = CopenetRealDataset(data_dir,
                                frame_range=range(*args.test_frames))
        if is_real_hmr:
            our_metrics["crossview_consistency"] = real_crossview(
                ours, ds, smplx_params)
        report["precalc_metrics"] = {
            "crossview_consistency": real_crossview(theirs, ds,
                                                    smplx_params)}
        report["metric_deltas"] = {
            "crossview_consistency":
                our_metrics["crossview_consistency"]
                - report["precalc_metrics"]["crossview_consistency"]}
        report["ours_metrics"] = our_metrics
    # score the PRECALC predictions with our metric code against the GT
    # our eval collected (same formulas both sides; twoview only — the
    # single-view metric recompute stays on field diffs)
    elif kind == "twoview" and all(
            k in ours for k in ("gt_angles0", "gt_smpltrans0")):
        from ..bodymodel import load_smplx_npz, synthetic_smplx_params
        from ..geometry.rotations import batch_rodrigues

        import jax.numpy as jnp

        smplx_params = (load_smplx_npz(args.smplx_model_dir)
                        if args.smplx_model_dir else
                        synthetic_smplx_params(
                            num_vertices=args.synthetic_verts))
        n = ours["gt_angles0"].shape[0]
        gt_rm = np.asarray(batch_rodrigues(jnp.asarray(
            np.asarray(ours["gt_angles0"][:, 1:], np.float32)
            .reshape(-1, 3)))).reshape(n, 21, 3, 3)
        gt = {
            "gt_pose_rotmat": gt_rm.astype(np.float32),
            "gt_orient": np.concatenate(
                [_np(ours["smplorient_rel0"]),
                 _np(ours["smplorient_rel1"])], axis=1).astype(np.float32),
            "gt_betas": np.zeros((n, 10), np.float32),  # zero-betas eval
            #                      quirk, eval/metrics.py:87-91
            "gt_trans": np.stack([ours["gt_smpltrans0"],
                                  ours["gt_smpltrans1"]],
                                 axis=1).astype(np.float32),
        }
        report["precalc_metrics"] = metrics_from_fields(
            theirs, gt, smplx_params)
        report["metric_deltas"] = {
            k: our_metrics[k] - report["precalc_metrics"][k]
            for k in our_metrics if k in report["precalc_metrics"]
        }

    print("\n=== parity report ===")
    for k, v in field_report.items():
        if "error" in v:
            print(f"  {k:22s} {v['error']}")
        else:
            print(f"  {k:22s} n={v['n']:5d}  mean|Δ| {v['mean_abs']:.6f}  "
                  f"max|Δ| {v['max_abs']:.6f}")
    print(f"  ours metrics:    {our_metrics}")
    if "precalc_metrics" in report:
        print(f"  precalc metrics: {report['precalc_metrics']}")
        print(f"  deltas:          {report['metric_deltas']}")
    out = osp.join(args.workdir, "parity_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out}")
    return report


if __name__ == "__main__":
    main()
