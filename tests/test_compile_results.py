"""compile_results CLI tests: on-disk AerialPeople eval (the reference's
copenet_synth_res_compile.py path), real-data eval with the robust
cross-view consistency metric (copenet_real_res_compile.py path), and the
released-VPoser weight loading path."""

import os
import pickle
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_data import _write_fake_aerialpeople, _write_fake_real  # noqa: E402
import pytest


@pytest.mark.slow
def test_compile_results_ondisk(tmp_path, capsys):
    """On-disk eval end to end: fixture dataset → metrics printed + outputs
    pkl written with both requested splits in [test, train] order."""
    from airpose_tpu.bodymodel import synthetic_smplx_params
    from airpose_tpu.eval.compile_results import main

    params = synthetic_smplx_params(num_vertices=99, seed=4)
    data_dir = tmp_path / "aerial"
    os.makedirs(data_dir)
    _write_fake_aerialpeople(str(data_dir), params, n=3)

    out_pkl = str(tmp_path / "results.pkl")
    main([
        "--model", "copenet_twoview", "--datapath", str(data_dir),
        "--split", "test", "train", "--out", out_pkl,
        "--batch_size", "3", "--img_res", "64", "--synthetic_verts", "99",
    ])
    printed = capsys.readouterr().out
    assert "test_mpjpe0" in printed and "train_mpjpe0" in printed

    res = pickle.load(open(out_pkl, "rb"))
    assert len(res) == 2  # [test, train]
    out = res[0][0]["output"]
    for key in ("pred_angles0", "pred_smpltrans1", "gt_angles0",
                "smplpose_rotmat", "in_smpltrans0"):
        assert key in out, key
    assert out["pred_angles0"].shape == (3, 22, 3)
    assert np.isfinite(out["pred_smpltrans0"]).all()


@pytest.mark.slow
def test_compile_results_int8(tmp_path, capsys):
    """--int8 evaluates the quantized serving configuration on the same
    metrics — the MPJPE numbers must stay in the same regime as bf16
    (random weights: loose gate; the tool's job is to REPORT the delta)."""
    import json

    from airpose_tpu.bodymodel import synthetic_smplx_params
    from airpose_tpu.eval.compile_results import main

    params = synthetic_smplx_params(num_vertices=99, seed=4)
    data_dir = tmp_path / "aerial"
    os.makedirs(data_dir)
    _write_fake_aerialpeople(str(data_dir), params, n=3)

    metrics = {}
    for tag, extra in (("bf16", []), ("int8", ["--int8"])):
        out_pkl = str(tmp_path / f"results_{tag}.pkl")
        main([
            "--model", "copenet_twoview", "--datapath", str(data_dir),
            "--split", "test", "--out", out_pkl,
            "--batch_size", "3", "--img_res", "64",
            "--synthetic_verts", "99", *extra,
        ])
        capsys.readouterr()
        with open(out_pkl + ".metrics.json") as f:
            metrics[tag] = json.load(f)
    b = metrics["bf16"]["test"]["mpjpe0"]
    q = metrics["int8"]["test"]["mpjpe0"]
    assert np.isfinite(q) and q < 3 * b + 0.1, (b, q)

    # --int8 covers the single-view families too (4-D trunk input path)
    out_pkl = str(tmp_path / "results_hmr_int8.pkl")
    main([
        "--model", "hmr", "--datapath", str(data_dir),
        "--split", "test", "--out", out_pkl,
        "--batch_size", "3", "--img_res", "64",
        "--synthetic_verts", "99", "--int8",
    ])
    capsys.readouterr()
    with open(out_pkl + ".metrics.json") as f:
        hmr_m = json.load(f)
    assert np.isfinite(hmr_m["test"]["mpjpe"]), hmr_m


def test_compile_results_ondisk_singleview(tmp_path):
    from airpose_tpu.bodymodel import synthetic_smplx_params
    from airpose_tpu.eval.compile_results import main

    params = synthetic_smplx_params(num_vertices=99, seed=4)
    data_dir = tmp_path / "aerial"
    os.makedirs(data_dir)
    _write_fake_aerialpeople(str(data_dir), params, n=3)

    out_pkl = str(tmp_path / "hmr.pkl")
    main([
        "--model", "hmr", "--datapath", str(data_dir),
        "--split", "test", "--out", out_pkl,
        "--batch_size", "3", "--img_res", "64", "--synthetic_verts", "99",
    ])
    res = pickle.load(open(out_pkl, "rb"))
    assert res[0][0]["output"]["pred_angles"].shape == (3, 22, 3)


@pytest.mark.slow
def test_compile_results_real(tmp_path, capsys):
    """real:// eval: outputs pkl carries the raw 135-d pose state (the
    benchtest interchange) and the robust cross-view consistency metric."""
    from airpose_tpu.eval.compile_results import main

    ds = tmp_path / "real"
    os.makedirs(ds)
    _write_fake_real(str(ds), n=4)

    out_pkl = str(tmp_path / "real_results.pkl")
    main([
        "--model", "copenet_twoview", "--datapath", f"real://{ds}",
        "--split", "test", "--test_frames", "0", "4",
        "--out", out_pkl, "--batch_size", "2", "--img_res", "64",
        "--synthetic_verts", "99",
    ])
    printed = capsys.readouterr().out
    assert "test_crossview_consistency" in printed

    res = pickle.load(open(out_pkl, "rb"))
    out = res[0][0]["output"]
    assert out["pred_pose0"].shape == (2, 135)
    assert out["pred_betas1"].shape == (2, 10)
    assert np.isfinite(out["pred_pose0"]).all()


@pytest.mark.slow
def test_compile_results_h36m(tmp_path, capsys):
    """h36m:// eval: joints-GT metrics (root-aligned MPJPE, PA-MPJPE,
    pelvis MPE per view) over the prebuilt-db layout, with an n % B != 0
    frame count so the tail pad/mask path is exercised too."""
    from airpose_tpu.eval.compile_results import main
    from test_data import _write_fake_h36m

    ds = tmp_path / "h36m"
    os.makedirs(ds)
    _write_fake_h36m(str(ds), n=3)

    out_pkl = str(tmp_path / "h36m_results.pkl")
    main([
        "--model", "copenet_twoview", "--datapath", f"h36m://{ds}",
        "--split", "test", "--out", out_pkl, "--batch_size", "2",
        "--img_res", "64", "--synthetic_verts", "99",
    ])
    printed = capsys.readouterr().out
    for key in ("test_mpjpe0", "test_pa_mpjpe1", "test_mpe0"):
        assert key in printed, printed

    res = pickle.load(open(out_pkl, "rb"))
    rows = sum(o["output"]["pred_angles0"].shape[0] for o in res[0])
    assert rows == 3  # all frames, tail batch masked not dropped
    out = res[0][0]["output"]
    assert out["gt_joints_cam0"].shape == (2, 17, 3)
    assert np.isfinite(out["pred_smpltrans1"]).all()


def test_compile_results_totalcap(tmp_path, capsys):
    """totalcap:// eval: the SMPL-GT conversion feeds the standard
    supervised twoview metrics (MPJPE/PA-MPJPE/MPE) and outputs pkl."""
    from airpose_tpu.eval.compile_results import main
    from test_data import _write_fake_totalcap

    ds = tmp_path / "totalcap"
    os.makedirs(ds)
    _write_fake_totalcap(str(ds), n=5)

    out_pkl = str(tmp_path / "tc_results.pkl")
    main([
        "--model", "copenet_twoview", "--datapath", f"totalcap://{ds}",
        "--split", "test", "--out", out_pkl, "--batch_size", "2",
        "--img_res", "64", "--synthetic_verts", "99",
    ])
    printed = capsys.readouterr().out
    for key in ("test_mpjpe0", "test_pa_mpjpe1", "test_mpe0"):
        assert key in printed, printed
    res = pickle.load(open(out_pkl, "rb"))
    rows = sum(o["output"]["pred_angles0"].shape[0] for o in res[0])
    assert rows == 1  # n=5 → 80/20 → 1 held-out frame
    assert np.isfinite(res[0][0]["output"]["gt_angles0"]).all()


def test_compile_results_real_hmr_per_camera(tmp_path, capsys):
    """Baseline-on-real compile: one outputs pkl per camera with suffixes
    '0'/'1' (ref hmr_real_res_compile.py; the AirPose+ driver's baseline
    trajectories load exactly these files)."""
    from airpose_tpu.eval.compile_results import main

    ds = tmp_path / "real"
    os.makedirs(ds)
    _write_fake_real(str(ds), n=4)

    out_pkl = str(tmp_path / "hmr_real.pkl")
    main([
        "--model", "hmr", "--datapath", f"real://{ds}",
        "--split", "test", "--test_frames", "0", "4",
        "--out", out_pkl, "--batch_size", "2", "--img_res", "64",
        "--synthetic_verts", "99",
    ])
    for cam in (0, 1):
        res = pickle.load(open(out_pkl + str(cam), "rb"))
        out = res[0][0]["output"]
        assert out["pred_angles"].shape == (2, 22, 3)
        assert out["pred_smpltrans"].shape == (2, 3)
        assert np.isfinite(out["pred_smpltrans"]).all()
    printed = capsys.readouterr().out
    assert "test_cam0_loss" in printed and "test_cam1_loss" in printed


def test_compile_results_aircap(tmp_path):
    """Cross-dataset eval over the aircap layout (the reference's
    --testdata=aircapdata path) through the same real compile pass."""
    from test_data import _write_fake_aircap

    from airpose_tpu.eval.compile_results import main

    ds = tmp_path / "aircap"
    os.makedirs(ds)
    _write_fake_aircap(str(ds), n=4, drop_person_at=())

    out_pkl = str(tmp_path / "aircap_results.pkl")
    main([
        "--model", "copenet_twoview", "--datapath", f"aircap://{ds}",
        "--split", "test", "--test_frames", "0", "4",
        "--out", out_pkl, "--batch_size", "2", "--img_res", "64",
        "--synthetic_verts", "99",
    ])
    res = pickle.load(open(out_pkl, "rb"))
    assert res[0][0]["output"]["pred_pose0"].shape == (2, 135)


def test_robust_crossview_consistency_zero_when_views_agree(rng):
    """Identical body pose per view + identity extrinsics → zero
    consistency error; rotated-pose disagreement → nonzero."""
    from scipy.spatial.transform import Rotation

    from airpose_tpu.bodymodel import synthetic_smplx_params
    from airpose_tpu.eval.compile_results import robust_crossview_consistency

    params = synthetic_smplx_params(num_vertices=77, seed=1)
    N = 3
    aa = rng.normal(size=(N, 22, 3)).astype(np.float32) * 0.3
    rm = Rotation.from_rotvec(aa.reshape(-1, 3)).as_matrix().reshape(
        N, 22, 3, 3).astype(np.float32)
    rotmat = np.stack([rm, rm], axis=1)
    betas = np.zeros((N, 2, 10), np.float32)
    extr = np.broadcast_to(np.eye(4, dtype=np.float32), (N, 2, 4, 4)).copy()
    err_idcs = np.ones(N, bool)
    err = robust_crossview_consistency(params, rotmat, betas, extr, err_idcs)
    assert err < 1e-5

    # disagreeing body pose in view 1 → positive error
    aa2 = aa.copy()
    aa2[:, 1:] += 0.4
    rm2 = Rotation.from_rotvec(aa2.reshape(-1, 3)).as_matrix().reshape(
        N, 22, 3, 3).astype(np.float32)
    rotmat_bad = np.stack([rm, rm2], axis=1)
    err2 = robust_crossview_consistency(params, rotmat_bad, betas, extr, err_idcs)
    assert err2 > 0.01

    # mask selects only the agreeing frames → zero again
    rotmat_mixed = rotmat.copy()
    rotmat_mixed[1] = rotmat_bad[1]
    mask = np.asarray([True, False, True])
    err3 = robust_crossview_consistency(params, rotmat_mixed, betas, extr, mask)
    assert err3 < 1e-5


def test_load_vposer_ckpt_roundtrip(tmp_path):
    """Fabricated human_body_prior-style snapshot ('vp_model.' prefixes)
    → load_vposer_ckpt must reproduce convert_torch_state_dict exactly and
    decode identically."""
    import torch

    from airpose_tpu.bodymodel.vposer import (
        convert_torch_state_dict,
        load_vposer_ckpt,
        vposer_decode,
    )

    torch.manual_seed(0)
    sd = {}
    for key, (o, i) in (
        ("encoder_net.2", (512, 63)), ("encoder_net.6", (512, 512)),
        ("encoder_net.7", (512, 512)), ("encoder_net.8.mu", (32, 512)),
        ("encoder_net.8.logvar", (32, 512)), ("decoder_net.0", (512, 32)),
        ("decoder_net.3", (512, 512)), ("decoder_net.5", (126, 512)),
    ):
        sd[key + ".weight"] = torch.randn(o, i) * 0.05
        sd[key + ".bias"] = torch.randn(o) * 0.05
    for key, n in (("encoder_net.1", 63), ("encoder_net.4", 512)):
        sd[key + ".weight"] = torch.rand(n) + 0.5
        sd[key + ".bias"] = torch.randn(n) * 0.1
        sd[key + ".running_mean"] = torch.randn(n) * 0.1
        sd[key + ".running_var"] = torch.rand(n) + 0.5
        sd[key + ".num_batches_tracked"] = torch.tensor(100)

    snapshot = {"state_dict": {"vp_model." + k: v for k, v in sd.items()}}
    path = tmp_path / "V02_05_epoch=13_val_loss=0.03.ckpt"
    torch.save(snapshot, path)

    loaded = load_vposer_ckpt(str(path))
    direct = convert_torch_state_dict(sd)
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(direct)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    z = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32)),
                    dtype=jnp.float32)
    out = vposer_decode(loaded, z)
    assert out["pose_body"].shape == (2, 21, 3)
    assert np.isfinite(np.asarray(out["pose_body"])).all()


@pytest.mark.slow
def test_eval_covers_all_frames_when_batch_does_not_divide(tmp_path, capsys):
    """n % batch_size != 0 must NOT silently drop the tail: every split's
    outputs pkl must carry exactly n rows, on the on-disk supervised path,
    the hmr single-view path, and the real:// path (the round-2 defect:
    all three batch generators skipped the final partial batch)."""
    from airpose_tpu.bodymodel import synthetic_smplx_params
    from airpose_tpu.eval.compile_results import main

    params = synthetic_smplx_params(num_vertices=99, seed=4)
    data_dir = tmp_path / "aerial"
    os.makedirs(data_dir)
    _write_fake_aerialpeople(str(data_dir), params, n=5)

    def rows(pkl, split_i, key):
        res = pickle.load(open(pkl, "rb"))
        return sum(o["output"][key].shape[0] for o in res[split_i])

    out_pkl = str(tmp_path / "tv.pkl")
    main([
        "--model", "copenet_twoview", "--datapath", str(data_dir),
        "--split", "test", "--out", out_pkl,
        "--batch_size", "2", "--img_res", "64", "--synthetic_verts", "99",
    ])
    capsys.readouterr()
    # the fixture writes ceil/floor split sizes; read the actual n
    from airpose_tpu.data import AerialPeopleDataset

    n_test = len(AerialPeopleDataset(str(data_dir), "test"))
    assert n_test % 2 == 1, "fixture no longer exercises a partial tail"
    assert rows(out_pkl, 0, "pred_angles0") == n_test

    out_pkl = str(tmp_path / "hmr.pkl")
    main([
        "--model", "hmr", "--datapath", str(data_dir),
        "--split", "test", "--out", out_pkl,
        "--batch_size", "2", "--img_res", "64", "--synthetic_verts", "99",
    ])
    capsys.readouterr()
    assert rows(out_pkl, 0, "pred_angles") == n_test

    ds = tmp_path / "real"
    os.makedirs(ds)
    _write_fake_real(str(ds), n=5)
    out_pkl = str(tmp_path / "real.pkl")
    main([
        "--model", "copenet_twoview", "--datapath", f"real://{ds}",
        "--split", "test", "--test_frames", "0", "5",
        "--out", out_pkl, "--batch_size", "2", "--img_res", "64",
        "--synthetic_verts", "99",
    ])
    printed = capsys.readouterr().out
    assert rows(out_pkl, 0, "pred_pose0") == 5
    # the robust-frame metric sees all 5 frames too
    assert "test_robust_frames: 5.0000" in printed

    # synthetic:// path
    out_pkl = str(tmp_path / "syn.pkl")
    main([
        "--model", "copenet_twoview", "--datapath", "synthetic://5",
        "--out", out_pkl, "--batch_size", "2", "--img_res", "64",
    ])
    capsys.readouterr()
    assert rows(out_pkl, 0, "pred_angles0") == 5


@pytest.mark.slow
def test_compile_results_mesh_equivalence(tmp_path, capsys):
    """--mesh N: data-parallel eval over the device mesh must match the
    single-device eval numerically (state replicated, batches sharded,
    GSPMD runs the same program SPMD) — including through a padded tail
    batch, whose pad rows replicate instead of sharding cleanly."""
    import json

    from airpose_tpu.eval.compile_results import main

    metrics = {}
    for tag, extra in (("single", []), ("mesh", ["--mesh", "8"])):
        out_pkl = str(tmp_path / f"mesh_{tag}.pkl")
        main([
            "--model", "copenet_twoview", "--datapath", "synthetic://20",
            "--out", out_pkl, "--batch_size", "8", "--img_res", "64",
            *extra,
        ])
        capsys.readouterr()
        with open(out_pkl + ".metrics.json") as f:
            metrics[tag] = json.load(f)["test"]
    for k in metrics["single"]:
        assert np.isclose(metrics["single"][k], metrics["mesh"][k],
                          rtol=1e-4, atol=1e-5), (k, metrics)


def test_eval_tail_loss_is_exact_masked_mean(rng):
    """The row_weight mask makes a padded tail batch's loss EXACTLY the
    mean over its valid rows: a (B=4, valid=3) padded batch must report
    the same loss as the unpadded 3-row batch. VPoser weight is zeroed so
    the comparison is free of rsample shape-dependence (every other term
    is deterministic per row)."""
    import jax
    import jax.numpy as jnp

    from airpose_tpu.bodymodel import init_vposer_params, synthetic_smplx_params
    from airpose_tpu.config import RealLossWeights
    from airpose_tpu.train.losses import real_twoview_loss

    smplx_params = synthetic_smplx_params(num_vertices=99, seed=4)
    vposer = init_vposer_params(0)
    w = RealLossWeights(vposer=0.0)
    key = jax.random.PRNGKey(0)

    def mk(n):
        return {
            "gt_j2d_conf": jnp.asarray(
                rng.uniform(0, 1, (n, 2, 22, 3)).astype(np.float32)
                * np.asarray([900, 500, 1], np.float32)),
            "intr": jnp.broadcast_to(
                jnp.asarray([[1475.0, 0, 960], [0, 1475.0, 540], [0, 0, 1]]),
                (n, 2, 3, 3)),
        }

    pose = jnp.asarray(rng.normal(0, 0.3, (4, 2, 135)).astype(np.float32)
                       + np.concatenate([np.full(3, 0.3, np.float32),
                                         np.zeros(132, np.float32)]))
    betas = jnp.asarray(rng.normal(0, 1, (4, 2, 10)).astype(np.float32))
    base = mk(4)
    batch3 = {k: v[:3] for k, v in base.items()}
    batch4 = dict(base)
    # row 3 is garbage — it must not affect the masked loss
    batch4["gt_j2d_conf"] = batch4["gt_j2d_conf"].at[3].set(1e6)
    batch4["row_weight"] = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    loss4, m4 = real_twoview_loss(pose, betas, batch4, smplx_params,
                                  vposer, w, key)
    loss3, m3 = real_twoview_loss(pose[:3], betas[:3], batch3, smplx_params,
                                  vposer, w, key)
    np.testing.assert_allclose(float(loss4), float(loss3), rtol=1e-5)
    np.testing.assert_allclose(float(m4["loss_keypoints"]),
                               float(m3["loss_keypoints"]), rtol=1e-5)


@pytest.mark.slow
def test_compile_results_restores_reg_only_checkpoint(tmp_path, capsys):
    """The eval CLI must restore a --train_reg_only fine-tune checkpoint
    (multi_transform opt_state — the variant a TrainState-template restore
    rejects; the round-2 server defect resurfaced in eval, caught by the
    rehearsal's synthetic→real fine-tune stage in r4). Template-free
    loading makes eval accept any checkpoint this framework writes."""
    from airpose_tpu.eval.compile_results import main
    from airpose_tpu.models import MODEL_REGISTRY, family_init_args
    from airpose_tpu.train.checkpoint import CheckpointManager
    from airpose_tpu.train.state import create_train_state

    model = MODEL_REGISTRY["copenet_twoview"]()
    state, _ = create_train_state(
        model, family_init_args("copenet_twoview", 1, 64),
        jax.random.PRNGKey(3), lr=5e-5, train_reg_only=True,
    )
    ckpt_dir = str(tmp_path / "ckpts")
    CheckpointManager(ckpt_dir).save(state, "last")

    out_pkl = str(tmp_path / "res.pkl")
    main([
        "--model", "copenet_twoview", "--datapath", "synthetic://4",
        "--ckpt", os.path.join(ckpt_dir, "last"), "--out", out_pkl,
        "--batch_size", "2", "--img_res", "64",
    ])
    printed = capsys.readouterr().out
    assert "test_mpjpe0" in printed
    assert os.path.exists(out_pkl + ".metrics.json")


@pytest.mark.slow
def test_save_full_exports_reference_body_fields(tmp_path, capsys):
    """--save-full writes the reference is_test output's full body-derived
    field set (ref copenet_twoview.py:328-350 / copenet_real :316-335):
    cam-frame vertices/joints (identity-root forward + origin-pivot
    composition), their per-view-focal 2D projection, and the zero-beta
    input mesh — on the synthetic AND real paths."""
    from airpose_tpu.bodymodel import synthetic_smplx_params
    from airpose_tpu.eval.compile_results import main

    params = synthetic_smplx_params(num_vertices=99, seed=4)
    data_dir = tmp_path / "aerial"
    os.makedirs(data_dir)
    _write_fake_aerialpeople(str(data_dir), params, n=2)

    body_fields = {"pred_vertices_cam0", "pred_vertices_cam1",
                   "pred_j3d_cam0", "pred_j3d_cam1",
                   "pred_j2d_cam0", "pred_j2d_cam1",
                   "pred_vertices_cam_in0", "pred_vertices_cam_in1",
                   "in_smpltrans0", "in_smpltrans1"}

    out_pkl = str(tmp_path / "tv.pkl")
    main([
        "--model", "copenet_twoview", "--datapath", str(data_dir),
        "--split", "test", "--out", out_pkl, "--save-full",
        "--batch_size", "2", "--img_res", "64", "--synthetic_verts", "99",
    ])
    capsys.readouterr()
    out = pickle.load(open(out_pkl, "rb"))[0][0]["output"]
    assert body_fields <= set(out)
    n = out["pred_angles0"].shape[0]
    assert out["pred_vertices_cam0"].shape == (n, 99, 3)
    assert out["pred_j3d_cam0"].shape[0] == n
    assert out["pred_j2d_cam1"].shape[-1] == 2
    for k in body_fields:
        assert np.isfinite(out[k]).all(), k
    # the zero-beta input mesh is a different body than the prediction
    assert not np.allclose(out["pred_vertices_cam_in0"],
                           out["pred_vertices_cam0"], atol=1e-4)
    # origin-pivot convention: verts composed as R.v_canon + t, so
    # subtracting the translation and unrotating recovers a view-invariant
    # canonical mesh (view 0 and view 1 agree on it)
    from scipy.spatial.transform import Rotation

    r0 = Rotation.from_rotvec(out["pred_angles0"][:, 0]).as_matrix()
    c0 = np.einsum("nji,nvj->nvi", r0,
                   out["pred_vertices_cam0"] - out["pred_smpltrans0"][:, None])
    # check view 0's canonical recovery equals a direct identity-root
    # forward of its own pose (the two views' poses only agree
    # approximately on random weights, so no cross-view assertion)
    import jax.numpy as jnp

    from airpose_tpu.bodymodel import smplx_forward
    from airpose_tpu.geometry.rotations import batch_rodrigues

    rm = np.asarray(batch_rodrigues(jnp.asarray(
        out["pred_angles0"][:, 1:].reshape(-1, 3)))).reshape(n, 21, 3, 3)
    # compile_results evaluates with its own default-seed synthetic body
    # (main() builds synthetic_smplx_params(num_vertices=...) seed 0)
    eval_params = synthetic_smplx_params(num_vertices=99)
    direct = smplx_forward(
        eval_params, jnp.asarray(out["pred_betas0"]),
        body_pose=jnp.asarray(rm),
        global_orient=jnp.broadcast_to(jnp.eye(3), (n, 1, 3, 3)))
    np.testing.assert_allclose(c0, np.asarray(direct.vertices), atol=5e-4)

    # real:// path
    real_dir = tmp_path / "real"
    os.makedirs(real_dir)
    _write_fake_real(str(real_dir), n=3)
    out_pkl = str(tmp_path / "real.pkl")
    main([
        "--model", "copenet_twoview", "--datapath", f"real://{real_dir}",
        "--split", "test", "--test_frames", "0", "3", "--out", out_pkl,
        "--save-full", "--batch_size", "2", "--img_res", "64",
        "--synthetic_verts", "99",
    ])
    capsys.readouterr()
    out = pickle.load(open(out_pkl, "rb"))[0][0]["output"]
    assert body_fields <= set(out)
    np.testing.assert_allclose(out["in_smpltrans0"][0], [0, 0, 10.0])
    for k in body_fields:
        assert np.isfinite(out[k]).all(), k
