"""Tooling tests: cluster requeue cycle, dataset builder + reader round
trip, hdf5 export, aruco generate->detect->pose, calibration from points."""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest


# module-level so the cluster subprocess can unpickle it
def _square(x):
    return x * x


def test_cluster_local_mixedmap(tmp_path):
    from airpose_tpu.utils.cluster import mixedmap

    results = mixedmap(_square, [(2,), (3,), (4,)], str(tmp_path))
    assert results == [4, 9, 16]


def test_cluster_scripts_contain_requeue(tmp_path):
    from airpose_tpu.utils.cluster import condor_submit_file, slurm_script

    s = slurm_script(str(tmp_path))
    assert "requeue" in s and " 3 ]" in s
    c = condor_submit_file(str(tmp_path))
    assert "on_exit_hold = (ExitCode =?= 3)" in c
    assert "periodic_release" in c


def test_create_aerialpeople_tool_roundtrip(tmp_path, rng):
    from airpose_tpu.tools.create_aerialpeople import main as create_main
    from airpose_tpu.data.aerialpeople import AerialPeopleDataset
    from airpose_tpu.bodymodel import synthetic_smplx_params

    out = str(tmp_path / "ds")
    create_main([
        "--out", out, "--subjects", "3", "--poses-per-subject", "2",
        "--num-vertices", "120", "--render-blobs",
    ])
    ds_train = AerialPeopleDataset(out, "train")
    ds_test = AerialPeopleDataset(out, "test")
    assert len(ds_train) == 4 and len(ds_test) == 2

    params = synthetic_smplx_params(num_vertices=120, seed=0)
    cache = ds_train.precompute_canonical_gt(params)
    assert cache["vertices"].shape == (4, 120, 3)
    hb = ds_train.host_batch([0, 1], rng, swap_cams=False)
    assert hb["context"].shape[0] == 2
    assert np.isfinite(hb["gt_j2d"]).all()


def test_hdf5_export(tmp_path):
    from airpose_tpu.tools.create_aerialpeople import main as create_main
    from airpose_tpu.tools.to_hdf5 import export_split

    out = str(tmp_path / "ds")
    create_main(["--out", out, "--subjects", "2", "--poses-per-subject", "1",
                 "--num-vertices", "60"])
    h5path = str(tmp_path / "train.h5")
    n = export_split(out, "train", h5path)
    assert n == 1
    import h5py

    with h5py.File(h5path) as f:
        g = f["000000"]
        assert g["smplpose"].shape == (63,)
        assert g["cam0"]["intr"].shape == (3, 3)
        assert g.attrs["smplgender"] in ("male", "female", "neutral")


def test_aruco_generate_detect_pose():
    import cv2

    from airpose_tpu.tools.calibration import (
        detect_aruco_poses,
        generate_aruco_marker,
    )

    marker = generate_aruco_marker(0, 200)
    # place the marker in a larger frame
    frame = np.full((480, 640), 255, np.uint8)
    frame[140:340, 220:420] = marker
    K = np.asarray([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    poses = detect_aruco_poses(frame, K, np.zeros(5), marker_length=0.5)
    assert "0" in poses, poses
    tvec = poses["0"]["tvec"]
    assert tvec[2] > 0  # marker in front of camera
    # centered marker: x/y offsets near zero relative to depth
    assert abs(tvec[0]) < 0.2 * tvec[2] and abs(tvec[1]) < 0.2 * tvec[2]


def _write_chessboard_calib_frames(tmp_path, K_true, square_m=0.05, n=6):
    """Warped-chessboard calib frames: 10x7 squares = 9x6 inner corners,
    40px squares, white border so warped edges don't fake corners."""
    import cv2

    sq = 40
    tex = np.full(((7 + 2) * sq, (10 + 2) * sq), 255, np.uint8)
    for r in range(7):
        for c in range(10):
            if (r + c) % 2 == 0:
                tex[(r + 1) * sq:(r + 2) * sq,
                    (c + 1) * sq:(c + 2) * sq] = 0

    calib_dir = tmp_path / "calib_frames"
    os.makedirs(calib_dir, exist_ok=True)
    for k in range(n):
        # plane point (x,y,0) in meters ↦ texture pixel; pose varies per k
        rvec = np.asarray([0.25 * np.sin(k), 0.25 * np.cos(1.3 * k), 0.1 * k])
        tvec = np.asarray([-0.25 + 0.02 * k, -0.18, 1.2 + 0.1 * k])
        plane = np.asarray(
            [[0, 0, 0], [10 * square_m, 0, 0],
             [10 * square_m, 7 * square_m, 0], [0, 7 * square_m, 0]],
            np.float32)
        uv, _ = cv2.projectPoints(plane, rvec, tvec, K_true, np.zeros(5))
        src = np.asarray([[sq, sq], [11 * sq, sq], [11 * sq, 8 * sq],
                          [sq, 8 * sq]], np.float32)
        H, _ = cv2.findHomography(src, uv.reshape(-1, 2))
        frame = cv2.warpPerspective(tex, H, (640, 480), borderValue=255)
        cv2.imwrite(str(calib_dir / f"{k:03d}.png"), frame)
    return calib_dir


def _write_aruco_capture_frames(tmp_path, generate_aruco_marker, n=4):
    import cv2

    capture_dir = tmp_path / "capture_frames"
    os.makedirs(capture_dir, exist_ok=True)
    marker = generate_aruco_marker(0, 200)
    for k in range(n):
        frame = np.full((480, 640), 255, np.uint8)
        x = 200 + 10 * k
        frame[140:340, x:x + 200] = marker
        cv2.imwrite(str(capture_dir / f"{k:03d}.jpg"), frame)
    return capture_dir


def test_prepare_real_capture_driver(tmp_path, rng):
    """The per-machine preparation CLI end to end on synthetic imagery:
    warped-chessboard calib frames → camera_calib.yml with K near truth;
    ArUco capture frames → images/%06d.jpg + markerposes pkl in the
    CopenetRealDataset layout."""
    import cv2

    from airpose_tpu.data.real import load_calib_yml
    from airpose_tpu.tools.calibration import generate_aruco_marker
    from airpose_tpu.tools.prepare_real_capture import main

    K_true = np.asarray([[600.0, 0, 320], [0, 610.0, 240], [0, 0, 1]])
    square_m = 0.05
    calib_dir = _write_chessboard_calib_frames(tmp_path, K_true, square_m)
    capture_dir = _write_aruco_capture_frames(tmp_path, generate_aruco_marker)

    machine = str(tmp_path / "machine_1")
    main([
        "--machine_dir", machine, "--calib", str(calib_dir),
        "--capture", str(capture_dir), "--calib_stride", "1",
        "--square_size", str(square_m), "--marker_length", "0.5",
        "--plot-markers",
    ])
    assert os.path.exists(os.path.join(machine, "markerposes.png"))

    K = load_calib_yml(os.path.join(machine, "camera_calib.yml"))
    np.testing.assert_allclose(K[0, 0], 600.0, rtol=0.15)
    assert sorted(os.listdir(os.path.join(machine, "images"))) == [
        f"{i:06d}.jpg" for i in range(4)]
    import pickle
    poses = pickle.load(
        open(os.path.join(machine, "markerposes_corrected_all.pkl"), "rb"))
    assert len(poses) == 4 and "0" in next(iter(poses.values()))


def test_calibration_from_synthetic_points(rng):
    import cv2

    from airpose_tpu.tools.calibration import calibrate_from_points

    K_true = np.asarray([[800.0, 0, 320], [0, 820.0, 240], [0, 0, 1]])
    board = np.zeros((6 * 9, 3), np.float32)
    board[:, :2] = np.mgrid[0:9, 0:6].T.reshape(-1, 2) * 0.05
    obj_pts, img_pts = [], []
    for k in range(6):
        rvec = rng.normal(0, 0.3, 3)
        tvec = np.asarray([rng.normal(0, 0.1), rng.normal(0, 0.1), 1.5 + 0.2 * k])
        uv, _ = cv2.projectPoints(board, rvec, tvec, K_true, np.zeros(5))
        obj_pts.append(board)
        img_pts.append(uv.reshape(-1, 2))
    K, dist, rms = calibrate_from_points(obj_pts, img_pts, (640, 480))
    assert rms < 1.0
    np.testing.assert_allclose(K[0, 0], 800.0, rtol=0.05)
    np.testing.assert_allclose(K[1, 1], 820.0, rtol=0.05)


def test_prepare_real_capture_downsample_scales_K(tmp_path, rng):
    """--downsample N: calibration runs on full-res calib frames but the
    saved K must describe the DOWNSAMPLED capture geometry (fx,fy,cx,cy ÷ N)
    and the ArUco extrinsics must be solved with that K — otherwise the
    marker poses (and everything CopenetRealDataset derives from them) are
    silently off by factor N. The check: the marker's solved distance must
    match between a full-res and a downsample-2 preparation."""
    from airpose_tpu.data.real import load_calib_yml
    from airpose_tpu.tools.calibration import generate_aruco_marker
    from airpose_tpu.tools.prepare_real_capture import main

    K_true = np.asarray([[600.0, 0, 320], [0, 610.0, 240], [0, 0, 1]])
    square_m = 0.05
    calib_dir = _write_chessboard_calib_frames(tmp_path, K_true, square_m)
    capture_dir = _write_aruco_capture_frames(tmp_path, generate_aruco_marker)

    tvecs = {}
    for ds in (1, 2):
        machine = str(tmp_path / f"machine_ds{ds}")
        main([
            "--machine_dir", machine, "--calib", str(calib_dir),
            "--capture", str(capture_dir), "--calib_stride", "1",
            "--square_size", str(square_m), "--marker_length", "0.5",
            "--downsample", str(ds),
        ])
        K = load_calib_yml(os.path.join(machine, "camera_calib.yml"))
        np.testing.assert_allclose(K[0, 0], 600.0 / ds, rtol=0.15)
        np.testing.assert_allclose(K[0, 2], 320.0 / ds, rtol=0.15)
        poses = pickle.load(open(
            os.path.join(machine, "markerposes_corrected_all.pkl"), "rb"))
        tvecs[ds] = np.asarray(poses["000000"]["0"]["tvec"]).ravel()

    # pre-fix, the downsampled solve ran with an unscaled K: distance 2x off
    np.testing.assert_allclose(
        np.linalg.norm(tvecs[2]), np.linalg.norm(tvecs[1]), rtol=0.1)


def test_hdf5_real_export(tmp_path):
    """--real mode: capture keypoints + predicted SMPL-wrt-cam transforms
    + frame paths per split (ref copenet_data_hdf5.py:38-109, with each
    split/camera using its OWN predictions — the reference script's
    copy-paste slips are not replicated)."""
    import h5py

    from airpose_tpu.geometry.rotations import batch_rodrigues
    from airpose_tpu.tools.synth_real_capture import write_capture
    from airpose_tpu.tools.to_hdf5 import main as hdf5_main

    cap = str(tmp_path / "capture")
    write_capture(cap, n_frames=6, seed=2)

    rng = np.random.default_rng(0)

    def fake_split(n):
        return [{"output": {
            f"pred_angles{v}": rng.normal(size=(n, 22, 3)).astype(np.float32)
            for v in (0, 1)
        } | {
            f"pred_smpltrans{v}": rng.normal(size=(n, 3)).astype(np.float32)
            for v in (0, 1)
        }}]

    per_split = [fake_split(2), fake_split(4)]  # [test, train]
    res_pkl = str(tmp_path / "res.pkl")
    with open(res_pkl, "wb") as f:
        pickle.dump(per_split, f)

    h5path = str(tmp_path / "real.h5")
    hdf5_main(["--real", "--datapath", cap, "--outputs_pkl", res_pkl,
               "--out", h5path, "--splits", "test", "train",
               "--train_frames", "0", "4", "--test_frames", "4", "6"])

    with h5py.File(h5path) as f:
        # (N, 2, 24, 3): [openpose, alphapose] stacked, the reference
        # get_j2d_only concat layout
        assert f["joints2d_train_gt0"].shape == (4, 2, 24, 3)
        assert f["joints2d_test_gt1"].shape == (2, 2, 24, 3)
        T = f["smpl_wrt_cam1_train"][...]
        assert T.shape == (4, 4, 4)
        np.testing.assert_array_equal(T[:, 3], [[0, 0, 0, 1]] * 4)
        want_rot = np.asarray(batch_rodrigues(
            per_split[1][0]["output"]["pred_angles1"][:, 0]))
        np.testing.assert_allclose(T[:, :3, :3], want_rot, atol=1e-6)
        np.testing.assert_allclose(
            T[:, :3, 3], per_split[1][0]["output"]["pred_smpltrans1"])
        paths = [p.decode() for p in f["im0_test"][...]]
        assert paths[0].endswith("machine_1/images/000004.jpg")

    # --splits must match the pkl's split count (the compile run's --split)
    with pytest.raises(SystemExit):
        hdf5_main(["--real", "--datapath", cap, "--outputs_pkl", res_pkl,
                   "--out", str(tmp_path / "bad.h5"),
                   "--train_frames", "0", "4", "--test_frames", "4", "6"])

    # --first_cam 1: prediction view 0 saw machine_2, so cam key 1 pairs
    # with view-0 predictions (and cam key 0 with view 1)
    h5flip = str(tmp_path / "real_flip.h5")
    hdf5_main(["--real", "--datapath", cap, "--outputs_pkl", res_pkl,
               "--out", h5flip, "--splits", "test", "train",
               "--train_frames", "0", "4", "--test_frames", "4", "6",
               "--first_cam", "1"])
    with h5py.File(h5flip) as f:
        np.testing.assert_allclose(
            f["smpl_wrt_cam1_train"][:, :3, 3],
            per_split[1][0]["output"]["pred_smpltrans0"])
        # keypoints/paths stay machine-wise regardless of pinning
        paths = [p.decode() for p in f["im0_test"][...]]
        assert paths[0].endswith("machine_1/images/000004.jpg")


@pytest.mark.slow
def test_parity_run_fixture_bundle(tmp_path, capsys):
    """The released-asset parity runner (tools/parity_run.py) exercised on
    a self-generated 'released-like' bundle: a trained fixture checkpoint
    exported to the reference .ckpt layout + a precalculated-results pkl
    in the res_compile layout. The runner must convert, evaluate, align,
    and report ≈0 field diffs and ≈0 metric deltas — proving the chain is
    turnkey for the real assets (BASELINE.md north star)."""
    from airpose_tpu.bodymodel import synthetic_smplx_params
    from airpose_tpu.eval.compile_results import main as compile_main
    from airpose_tpu.tools.create_aerialpeople import main as create_main
    from airpose_tpu.tools.parity_run import load_precalc
    from airpose_tpu.tools.parity_run import main as parity_main
    from airpose_tpu.train.checkpoint import (convert_ckpt_file_to_orbax,
                                              export_reference_checkpoint,
                                              load_model_variables)
    from airpose_tpu.train.trainer import main as train_main

    data = str(tmp_path / "aerial")
    create_main(["--out", data, "--subjects", "2", "--poses-per-subject",
                 "2", "--num-vertices", "60", "--render-blobs"])
    logs = str(tmp_path / "logs")
    train_main([
        "--name", "p", "--version", "0", "--model", "copenet_twoview",
        "--datapath", data, "--log_dir", logs, "--batch_size", "2",
        "--val_batch_size", "2", "--max_steps", "2", "--val_every", "2",
        "--img_res", "64", "--data_workers", "1",
    ])
    ckpt = os.path.join(logs, "p", "version_0", "checkpoints", "last")

    # "released" bundle: reference-layout .ckpt + precalc pkl from an
    # eval of those same weights
    _, trained = load_model_variables("copenet_twoview", ckpt=ckpt)
    released_ckpt = str(tmp_path / "released.ckpt")
    export_reference_checkpoint(trained, "copenet_twoview", released_ckpt)
    conv = str(tmp_path / "conv")
    convert_ckpt_file_to_orbax(released_ckpt, "copenet_twoview", conv)
    precalc = str(tmp_path / "precalc.pkl")
    compile_main([
        "--model", "copenet_twoview", "--ckpt", conv, "--datapath", data,
        "--split", "test", "--out", precalc, "--batch_size", "2",
        "--img_res", "64", "--synthetic_verts", "60",
    ])
    capsys.readouterr()

    report = parity_main([
        "--model", "copenet_twoview", "--torch-ckpt", released_ckpt,
        "--precalc", precalc, "--datapath", data,
        "--synthetic_verts", "60", "--workdir", str(tmp_path / "parity"),
        "--batch_size", "2", "--img_res", "64",
    ])
    out = capsys.readouterr().out
    assert "parity report" in out
    # same weights, same eval → every shared prediction field matches
    for k in ("pred_angles0", "pred_smpltrans1", "pred_betas0"):
        assert report["fields"][k]["max_abs"] < 1e-5, (k, report["fields"][k])
    assert report["n_ours"] == report["n_precalc"]
    # and the metric recompute from the precalc side lands on our numbers
    for k, d in report["metric_deltas"].items():
        assert abs(d) < 1e-4, (k, d)
    assert os.path.exists(str(tmp_path / "parity" / "parity_report.json"))

    # loud contract validation: a precalc missing required fields raises
    bad = str(tmp_path / "bad.pkl")
    with open(precalc, "rb") as f:
        res = pickle.load(f)
    for b in res[0]:
        del b["output"]["pred_angles0"]
    with open(bad, "wb") as f:
        pickle.dump(res, f)
    with pytest.raises(ValueError, match="missing.*pred_angles0"):
        load_precalc(bad)

    # single-view contract leg (the released set also ships hmr bundles):
    # unsuffixed fields, field-diff-only report
    train_main([
        "--name", "ph", "--version", "0", "--model", "hmr",
        "--datapath", data, "--log_dir", logs, "--batch_size", "2",
        "--val_batch_size", "2", "--max_steps", "1", "--val_every", "1",
        "--img_res", "64", "--data_workers", "1",
    ])
    hckpt = os.path.join(logs, "ph", "version_0", "checkpoints", "last")
    _, htrained = load_model_variables("hmr", ckpt=hckpt)
    h_released = str(tmp_path / "released_hmr.ckpt")
    export_reference_checkpoint(htrained, "hmr", h_released)
    hconv = str(tmp_path / "hconv")
    convert_ckpt_file_to_orbax(h_released, "hmr", hconv)
    h_precalc = str(tmp_path / "precalc_hmr.pkl")
    compile_main([
        "--model", "hmr", "--ckpt", hconv, "--datapath", data,
        "--split", "test", "--out", h_precalc, "--batch_size", "2",
        "--img_res", "64", "--synthetic_verts", "60",
    ])
    capsys.readouterr()
    hreport = parity_main([
        "--model", "hmr", "--torch-ckpt", h_released,
        "--precalc", h_precalc, "--datapath", data,
        "--synthetic_verts", "60",
        "--workdir", str(tmp_path / "parity_hmr"),
        "--batch_size", "2", "--img_res", "64",
    ])
    capsys.readouterr()
    for k in ("pred_angles", "pred_smpltrans", "pred_betas"):
        assert hreport["fields"][k]["max_abs"] < 1e-5, (
            k, hreport["fields"][k])


@pytest.mark.slow
def test_train_roofline_smoke(capsys):
    """tools/train_roofline runs end to end on tiny CPU shapes: every
    requested stage produces a finite positive per-iter time and the
    trunk-only stage is bounded by the whole-model stage."""
    from airpose_tpu.tools.train_roofline import main as roofline_main

    results = roofline_main([
        "--batch", "2", "--img", "64", "--length", "2",
        "--stages", "full,fwdbwd_model,fwdbwd_trunk,opt",
    ])
    capsys.readouterr()
    assert set(results) == {"full", "fwdbwd_model", "fwdbwd_trunk", "opt"}
    for k, v in results.items():
        assert np.isfinite(v) and v > 0, (k, v)
    # structural sanity (timings are noisy; this one is structural: the
    # model fwd+bwd contains the trunk fwd+bwd)
    assert results["fwdbwd_trunk"] < results["full"] * 3


@pytest.mark.slow
def test_qat_posture_smoke(capsys):
    """tools/qat_posture runs every arm (incl. the r5 bf16_ft control)
    on tiny CPU shapes and returns finite deployed-int8 losses, in both
    the overfit-one-batch default and the --num_batches held-out mode."""
    from airpose_tpu.tools.qat_posture import main as posture_main

    results = posture_main([
        "--batch", "2", "--img", "64", "--verts", "60",
        "--steps_pre", "2", "--steps_ft", "2", "--num_batches", "2",
    ])
    capsys.readouterr()
    assert set(results) == {"bf16", "ptq", "bf16_ft", "dynamic", "frozen"}
    for k, v in results.items():
        assert np.isfinite(v), (k, v)

    # the overfit-one-batch DEFAULT path (nb == 1 branch) — same shapes,
    # so the jitted programs above are reused and this stays cheap
    results1 = posture_main([
        "--batch", "2", "--img", "64", "--verts", "60",
        "--steps_pre", "1", "--steps_ft", "1",
    ])
    capsys.readouterr()
    assert set(results1) == {"bf16", "ptq", "bf16_ft", "dynamic", "frozen"}
    for k, v in results1.items():
        assert np.isfinite(v), (k, v)


@pytest.mark.slow
def test_parity_run_real_mode(tmp_path, capsys):
    """parity_run --datapath real://: the released REAL bundles' contract
    (copenet_real_res_compile.py:116-127 suffixed fields, no 3D GT; both
    sides scored with the robust cross-view consistency over the
    capture's extrinsics + detector mask)."""
    from airpose_tpu.eval.compile_results import main as compile_main
    from airpose_tpu.tools.parity_run import main as parity_main
    from airpose_tpu.tools.synth_real_capture import write_capture
    from airpose_tpu.train.checkpoint import (convert_ckpt_file_to_orbax,
                                              export_reference_checkpoint,
                                              load_model_variables)

    cap = str(tmp_path / "cap")
    write_capture(cap, n_frames=6)

    # released-like real bundle from a deterministic random-init model
    _, variables = load_model_variables("copenet_twoview", random_init=True)
    released = str(tmp_path / "released_real.ckpt")
    export_reference_checkpoint(variables, "copenet_twoview", released)
    conv = str(tmp_path / "conv")
    convert_ckpt_file_to_orbax(released, "copenet_twoview", conv)
    precalc = str(tmp_path / "precalc_real.pkl")
    compile_main([
        "--model", "copenet_twoview", "--ckpt", conv,
        "--datapath", f"real://{cap}", "--split", "test",
        "--test_frames", "0", "6", "--out", precalc,
        "--batch_size", "3", "--img_res", "64", "--synthetic_verts", "60",
    ])
    capsys.readouterr()

    report = parity_main([
        "--model", "copenet_twoview", "--torch-ckpt", released,
        "--precalc", precalc, "--datapath", f"real://{cap}",
        "--test_frames", "0", "6", "--synthetic_verts", "60",
        "--workdir", str(tmp_path / "parity"),
        "--batch_size", "3", "--img_res", "64",
    ])
    capsys.readouterr()
    for k in ("pred_angles0", "pred_smpltrans1", "pred_betas0",
              "pred_pose0"):
        assert report["fields"][k]["max_abs"] < 1e-5, (k, report["fields"][k])
    # the cross-view score recomputed from the precalc angles lands on the
    # eval CLI's own number (aa→rotmat roundtrip tolerance)
    assert abs(report["metric_deltas"]["crossview_consistency"]) < 1e-4, (
        report["metric_deltas"])


@pytest.mark.slow
def test_parity_run_real_hmr_mode(tmp_path, capsys):
    """parity_run --model hmr --datapath real://: the hmr_real_ckpt.zip
    contract — ONE checkpoint run per camera pinning, per-camera pkl pair
    <base>0/<base>1 (hmr_real_res_compile.py:35-74), both sides scored
    with the cross-view consistency its analysis block computes over the
    two cameras' outputs (:194-204)."""
    from airpose_tpu.eval.compile_results import main as compile_main
    from airpose_tpu.tools.parity_run import main as parity_main
    from airpose_tpu.tools.synth_real_capture import write_capture
    from airpose_tpu.train.checkpoint import (convert_ckpt_file_to_orbax,
                                              export_reference_checkpoint,
                                              load_model_variables)

    cap = str(tmp_path / "cap")
    write_capture(cap, n_frames=6)

    _, variables = load_model_variables("hmr", random_init=True)
    released = str(tmp_path / "released_hmr_real.ckpt")
    export_reference_checkpoint(variables, "hmr", released)
    conv = str(tmp_path / "conv")
    convert_ckpt_file_to_orbax(released, "hmr", conv)
    precalc = str(tmp_path / "precalc_hmr_real.pkl")
    compile_main([
        "--model", "hmr", "--ckpt", conv,
        "--datapath", f"real://{cap}", "--split", "test",
        "--test_frames", "0", "6", "--out", precalc,
        "--batch_size", "3", "--img_res", "64", "--synthetic_verts", "60",
    ])
    capsys.readouterr()

    report = parity_main([
        "--model", "hmr", "--torch-ckpt", released,
        "--precalc", precalc, "--datapath", f"real://{cap}",
        "--test_frames", "0", "6", "--synthetic_verts", "60",
        "--workdir", str(tmp_path / "parity"),
        "--batch_size", "3", "--img_res", "64",
    ])
    capsys.readouterr()
    for k in ("pred_angles0", "pred_angles1", "pred_smpltrans0",
              "pred_betas1"):
        assert report["fields"][k]["max_abs"] < 1e-5, (k, report["fields"][k])
    assert abs(report["metric_deltas"]["crossview_consistency"]) < 1e-4, (
        report["metric_deltas"])
