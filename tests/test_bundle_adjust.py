"""AirPose+ tests: joints-only forward matches the full forward; the
optimizer recovers a known body from synthetic 2D observations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airpose_tpu.bodymodel import (
    init_vposer_params,
    smplx_forward,
    synthetic_smplx_params,
    vposer_decode,
)
from airpose_tpu.geometry.rotations import batch_rodrigues, rotmat_to_rot6d
from airpose_tpu.optim import (
    BAConfig,
    BAState,
    bundle_adjust,
    export_results,
    init_from_predictions,
    joints_only_forward,
)


@pytest.fixture(scope="module")
def models():
    return synthetic_smplx_params(num_vertices=150, seed=7), init_vposer_params(0)


def test_joints_only_matches_full_forward(models, rng):
    smplx_params, _ = models
    B = 3
    aa = (rng.normal(size=(B, 21, 3)) * 0.3).astype(np.float32)
    body = batch_rodrigues(jnp.asarray(aa))
    betas = jnp.asarray(rng.normal(size=(B, 10)).astype(np.float32) * 0.3)
    full = smplx_forward(
        smplx_params, betas, body_pose=body,
        global_orient=jnp.broadcast_to(jnp.eye(3), (B, 1, 3, 3)),
    )
    jo = joints_only_forward(smplx_params, betas, body)
    np.testing.assert_allclose(
        np.asarray(jo), np.asarray(full.joints[:, :55]), atol=1e-5
    )


def _make_problem(models, rng, N=12):
    """Ground truth body seen by two cameras; keypoints = exact projections
    with confidence 1."""
    smplx_params, vposer_params = models
    z_true = jnp.asarray(rng.normal(size=(N, 32)).astype(np.float32) * 0.3)
    theta = vposer_decode(vposer_params, z_true)["pose_body_matrot"]
    joints = joints_only_forward(
        smplx_params, jnp.zeros((N, 10)), theta
    )[:, :24]

    from scipy.spatial.transform import Rotation
    phi_rm = np.stack([
        np.stack([Rotation.from_euler("y", 0.1 * v + 0.02 * n).as_matrix()
                  for v in (0, 1)]) for n in range(N)
    ]).astype(np.float32)
    tau = np.tile(np.asarray([[0.0, 0.0, 6.0]], np.float32), (N, 2, 1))
    tau[:, 1, 0] = 0.5
    intr = np.asarray(
        [[[1475.0, 0, 960], [0, 1475.0, 540], [0, 0, 1]]] * 2, np.float32
    )

    cam_j = np.einsum("nvij,nkj->nvki", phi_rm, np.asarray(joints)) + tau[:, :, None]
    xy = cam_j[..., :2] / cam_j[..., 2:]
    f = np.asarray([1475.0, 1475.0])
    uv = xy * f + intr[0, :2, 2]
    kp = np.concatenate([uv, np.ones((N, 2, 24, 1), np.float32)], axis=-1)
    return z_true, jnp.asarray(phi_rm), jnp.asarray(tau), jnp.asarray(intr), jnp.asarray(kp)


@pytest.mark.slow
def test_bundle_adjust_reduces_reprojection_error(models, rng):
    smplx_params, vposer_params = models
    z_true, phi_rm, tau, intr, kp = _make_problem(models, rng)
    N = kp.shape[0]

    # Perturbed init.
    init = BAState(
        z=z_true + 0.3 * jnp.asarray(rng.normal(size=z_true.shape).astype(np.float32)),
        phi=rotmat_to_rot6d(phi_rm) + 0.05 * jnp.asarray(
            rng.normal(size=(N, 2, 6)).astype(np.float32)),
        tau=tau + 0.2 * jnp.asarray(rng.normal(size=tau.shape).astype(np.float32)),
        beta=jnp.zeros(10),
    )
    cfg = BAConfig(iters_stage1=30, iters_stage2=60, w_beta=1.0)
    state, info = bundle_adjust(
        smplx_params, vposer_params, init, kp, kp, intr, cfg
    )
    trace = info["trace"]
    assert np.isfinite(trace).all()
    assert trace[-1] < trace[0] * 0.5, (trace[0], trace[-1])

    out = export_results(smplx_params, vposer_params, state)
    assert out["verts0"].shape == (N, 150, 3)
    assert out["cam1_wrt_cam0"].shape == (N, 4, 4)
    # bottom row of the relative transform stays [0,0,0,1]
    np.testing.assert_allclose(
        out["cam1_wrt_cam0"][:, 3], np.tile([0, 0, 0, 1.0], (N, 1)), atol=1e-5
    )


@pytest.mark.slow
def test_ba_debug_report_localizes_bad_gradients(models, rng):
    """The detect_anomaly / bad-grad-visualizer analog (--debug_nans):
    clean data reports all-finite; a poisoned keypoint confidence is
    localized to the data term's row while the regularizer terms stay
    finite — the (term × variable) information the reference extracted
    by walking the autograd graph (ref bundle_adj.py:68-112,263)."""
    from airpose_tpu.optim import ba_debug_report, print_debug_report

    smplx_params, vposer_params = models
    z_true, phi_rm, tau, intr, kp = _make_problem(models, rng, N=6)
    init = BAState(z=z_true, phi=rotmat_to_rot6d(phi_rm), tau=tau,
                   beta=jnp.zeros(10))
    cfg = BAConfig()

    rep = ba_debug_report(smplx_params, vposer_params, init, kp, kp, intr, cfg)
    assert set(rep) == {"loss", "loss_2d", "loss_vposer", "loss_beta",
                        "loss_temporal"}
    assert print_debug_report(rep) is True
    for term in rep.values():
        assert np.isfinite(term["value"])
        for g in term["grads"].values():
            assert g["finite"]
    # the data term pulls on the pose variables at a perturbation-free
    # optimum too (GM residuals are not exactly zero)
    assert rep["loss_beta"]["grads"]["beta"]["norm"] >= 0.0

    # poison one keypoint confidence → the 2D data term (and the total)
    # go non-finite; the pure regularizers remain healthy
    kp_bad = kp.at[0, 0, 0, 2].set(np.inf)
    rep2 = ba_debug_report(
        smplx_params, vposer_params, init, kp_bad, kp, intr, cfg)
    assert not np.isfinite(rep2["loss_2d"]["value"])
    assert not rep2["loss_2d"]["grads"]["tau"]["finite"]
    assert rep2["loss_beta"]["grads"]["beta"]["finite"]
    assert np.isfinite(rep2["loss_vposer"]["value"])
    assert print_debug_report(rep2) is False


@pytest.mark.slow
def test_sharded_matches_single_device(models, rng):
    """Frame-sharded whole-sequence BA over the 8-virtual-device mesh ≡
    the single-device path (same loss trace, same optimum) — including
    batch padding (12 frames over 8 devices) and non-robust frames whose
    temporal pairs must drop on BOTH paths."""
    from airpose_tpu.optim import bundle_adjust_sharded
    from airpose_tpu.parallel import make_mesh

    smplx_params, vposer_params = models
    z_true, phi_rm, tau, intr, kp = _make_problem(models, rng)
    N = kp.shape[0]
    # two non-robust frames (AlphaPose conf sum below the gate) — one at a
    # future shard boundary
    kp = kp.at[3, :, :, 2].mul(0.2).at[8, :, :, 2].mul(0.2)

    init = BAState(
        z=z_true + 0.3 * jnp.asarray(
            rng.normal(size=z_true.shape).astype(np.float32)),
        phi=rotmat_to_rot6d(phi_rm) + 0.05 * jnp.asarray(
            rng.normal(size=(N, 2, 6)).astype(np.float32)),
        tau=tau + 0.2 * jnp.asarray(
            rng.normal(size=tau.shape).astype(np.float32)),
        beta=jnp.zeros(10),
    )
    cfg = BAConfig(iters_stage1=5, iters_stage2=10, w_beta=1.0)
    want_state, want = bundle_adjust(
        smplx_params, vposer_params, init, kp, kp, intr, cfg)
    got_state, got = bundle_adjust_sharded(
        smplx_params, vposer_params, init, kp, kp, intr, cfg,
        mesh=make_mesh(8))

    np.testing.assert_allclose(got["trace"], want["trace"],
                               rtol=2e-4, atol=1e-5)
    for name in ("z", "phi", "tau", "beta"):
        np.testing.assert_allclose(
            np.asarray(getattr(got_state, name)),
            np.asarray(getattr(want_state, name)),
            rtol=1e-3, atol=2e-4, err_msg=name)


@pytest.mark.slow
def test_sequence_cli_end_to_end(tmp_path):
    """The AirPose+ sequence driver: real compile → outputs pkl →
    bundle_adjust CLI over chunks → result pkl + trajectory plot (the
    reference bundle_adj.py run path, incl. the 2000-frame chunking —
    exercised here with chunk 3 over 6 frames so the boundary is hit)."""
    import os
    import pickle
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_data import _write_fake_real

    from airpose_tpu.eval.compile_results import main as compile_main
    from airpose_tpu.optim.bundle_adjust import main as ba_main

    ds = str(tmp_path / "real")
    os.makedirs(ds)
    _write_fake_real(ds, n=6)

    airpose_pkl = str(tmp_path / "airpose.pkl")
    compile_main([
        "--model", "copenet_twoview", "--datapath", f"real://{ds}",
        "--split", "test", "--test_frames", "0", "6",
        "--out", airpose_pkl, "--batch_size", "3", "--img_res", "64",
        "--synthetic_verts", "80",
    ])

    out_dir = str(tmp_path / "ba")
    ba_main([
        "--datapath", f"real://{ds}", "--airpose-pkl", airpose_pkl,
        "--split", "test", "--test_frames", "0", "6",
        "--out", out_dir, "--chunk-size", "3",
        "--iters1", "5", "--iters2", "10", "--synthetic_verts", "80",
    ])

    with open(os.path.join(out_dir, "airpose_plus_test.pkl"), "rb") as f:
        result = pickle.load(f)
    assert result["z"].shape == (6, 32)
    assert result["beta_per_chunk"].shape == (2, 10)  # two chunks of 3
    assert result["cam1_wrt_cam0"].shape == (6, 4, 4)

    # --sharded: the whole sequence jointly over the 8-virtual-device mesh
    out_dir2 = str(tmp_path / "ba_sharded")
    ba_main([
        "--datapath", f"real://{ds}", "--airpose-pkl", airpose_pkl,
        "--split", "test", "--test_frames", "0", "6",
        "--out", out_dir2, "--sharded",
        "--iters1", "3", "--iters2", "5", "--synthetic_verts", "80",
    ])
    with open(os.path.join(out_dir2, "airpose_plus_test.pkl"), "rb") as f:
        result = pickle.load(f)
    assert result["z"].shape == (6, 32)
    assert result["beta_per_chunk"].shape == (1, 10)  # one joint solve
    assert np.isfinite(result["trace"]).all()
    assert os.path.exists(os.path.join(out_dir, "cam_trajectory_test.png"))


def test_init_from_predictions_shapes(models, rng):
    _, vposer_params = models
    N = 5
    aa = jnp.asarray(rng.normal(size=(N, 2, 22, 3)).astype(np.float32) * 0.2)
    trans = jnp.asarray(rng.normal(size=(N, 2, 3)).astype(np.float32))
    st = init_from_predictions(vposer_params, aa, trans)
    assert st.z.shape == (N, 32)
    assert st.phi.shape == (N, 2, 6)
    assert st.tau.shape == (N, 2, 3)
    assert st.beta.shape == (10,)
