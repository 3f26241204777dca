"""Geometry unit tests: closed-form properties + cross-checks against
independently-written torch/scipy formulations (SURVEY.md §7 step 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airpose_tpu.geometry import (
    aa_to_rotmat,
    batch_rodrigues,
    geman_mcclure,
    lstsq_triangulation,
    perspective_projection,
    rot6d_to_rotmat,
    rotmat_to_aa,
    rotmat_to_rot6d,
    transform_smpl,
    weak_cam_from_position,
    weak_cam_to_trans,
)


def random_rotmats(rng, n):
    """Random rotations via QR of gaussian matrices."""
    A = rng.normal(size=(n, 3, 3))
    Q, R = np.linalg.qr(A)
    Q = Q * np.sign(np.diagonal(R, axis1=1, axis2=2))[:, None, :]
    det = np.linalg.det(Q)
    Q[:, :, 0] *= det[:, None]
    return Q


def test_batch_rodrigues_matches_scipy(rng):
    aa = rng.normal(size=(64, 3)).astype(np.float32)
    from scipy.spatial.transform import Rotation

    want = Rotation.from_rotvec(aa).as_matrix()
    got = np.asarray(batch_rodrigues(jnp.asarray(aa)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_batch_rodrigues_zero_angle_safe():
    aa = jnp.zeros((4, 3))
    R = batch_rodrigues(aa)
    np.testing.assert_allclose(np.asarray(R), np.eye(3)[None].repeat(4, 0), atol=1e-5)
    # Gradients must be finite at zero.
    g = jax.grad(lambda x: batch_rodrigues(x).sum())(jnp.zeros((1, 3)))
    assert np.isfinite(np.asarray(g)).all()


def test_rot6d_roundtrip(rng):
    R = random_rotmats(rng, 32).astype(np.float32)
    six = rotmat_to_rot6d(jnp.asarray(R))
    R2 = rot6d_to_rotmat(six)
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)


def test_rot6d_produces_valid_rotations(rng):
    x = jnp.asarray(rng.normal(size=(50, 6)).astype(np.float32))
    R = np.asarray(rot6d_to_rotmat(x))
    np.testing.assert_allclose(
        R @ R.transpose(0, 2, 1), np.eye(3)[None].repeat(50, 0), atol=1e-5
    )
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_rot6d_matches_torch_reference_semantics(rng):
    """The 6 numbers are the first two *columns* (reshape(-1,3,2))."""
    import torch
    import torch.nn.functional as F

    x = rng.normal(size=(16, 6)).astype(np.float32)
    xt = torch.from_numpy(x).reshape(-1, 3, 2)
    a1, a2 = xt[:, :, 0], xt[:, :, 1]
    b1 = F.normalize(a1)
    b2 = F.normalize(a2 - torch.einsum("bi,bi->b", b1, a2).unsqueeze(-1) * b1)
    b3 = torch.linalg.cross(b1, b2)
    want = torch.stack((b1, b2, b3), dim=-1).numpy()
    got = np.asarray(rot6d_to_rotmat(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rotmat_to_aa_roundtrip(rng):
    R = random_rotmats(rng, 128).astype(np.float32)
    aa = rotmat_to_aa(jnp.asarray(R))
    R2 = np.asarray(aa_to_rotmat(aa))
    np.testing.assert_allclose(R2, R, atol=1e-4)


def test_rotmat_to_aa_identity():
    aa = np.asarray(rotmat_to_aa(jnp.eye(3)[None]))
    np.testing.assert_allclose(aa, np.zeros((1, 3)), atol=1e-5)


def test_rotmat_to_aa_near_pi(rng):
    from scipy.spatial.transform import Rotation

    axes = rng.normal(size=(8, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    aa_in = (axes * (np.pi - 1e-4)).astype(np.float32)
    R = Rotation.from_rotvec(aa_in).as_matrix().astype(np.float32)
    aa_out = np.asarray(rotmat_to_aa(jnp.asarray(R)))
    R2 = Rotation.from_rotvec(aa_out).as_matrix()
    np.testing.assert_allclose(R2, R, atol=1e-3)


def test_perspective_projection_pinhole():
    pts = jnp.asarray([[[0.0, 0.0, 5.0], [1.0, 2.0, 10.0]]])
    out = perspective_projection(
        pts,
        rotation=jnp.eye(3)[None],
        translation=jnp.zeros((1, 3)),
        focal_length=(1475.0, 1475.0),
        camera_center=jnp.asarray([[960.0, 540.0]]),
    )
    want = np.asarray([[[960.0, 540.0], [1475 * 0.1 + 960, 1475 * 0.2 + 540]]])
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5)


def test_perspective_projection_accepts_leading_singleton_center():
    pts = jnp.ones((4, 7, 3)) * jnp.asarray([1.0, 1.0, 4.0])
    c = jnp.broadcast_to(jnp.asarray([960.0, 540.0]), (4, 2))
    a = perspective_projection(pts, jnp.eye(3)[None].repeat(4, 0), jnp.zeros((4, 3)), (100.0, 100.0), c)
    b = perspective_projection(pts, jnp.eye(3)[None].repeat(4, 0), jnp.zeros((4, 3)), (100.0, 100.0), c[None])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_transform_smpl_roundtrip(rng):
    R = random_rotmats(rng, 5).astype(np.float32)
    t = rng.normal(size=(5, 3)).astype(np.float32)
    T = np.concatenate([R, t[:, :, None]], axis=2)
    verts = rng.normal(size=(5, 11, 3)).astype(np.float32)
    joints = rng.normal(size=(5, 4, 3)).astype(np.float32)
    orient = random_rotmats(rng, 5).astype(np.float32)
    trans = rng.normal(size=(5, 3)).astype(np.float32)
    v, j, o, tr = transform_smpl(
        jnp.asarray(T), jnp.asarray(verts), jnp.asarray(joints), jnp.asarray(orient), jnp.asarray(trans)
    )
    # Invert.
    Rinv = R.transpose(0, 2, 1)
    tinv = -np.einsum("bij,bj->bi", Rinv, t)
    Tinv = np.concatenate([Rinv, tinv[:, :, None]], axis=2)
    v2, j2, o2, tr2 = transform_smpl(jnp.asarray(Tinv), v, j, o, tr)
    np.testing.assert_allclose(np.asarray(v2), verts, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j2), joints, atol=1e-4)
    np.testing.assert_allclose(np.asarray(o2), orient, atol=1e-4)
    np.testing.assert_allclose(np.asarray(tr2), trans, atol=1e-4)


def test_weak_cam_roundtrip():
    intr = jnp.asarray(
        [[[1475.0, 0, 960.0], [0, 1475.0, 540.0], [0, 0, 1.0]]]
    ).repeat(3, 0)
    pos = jnp.asarray([[0.5, -0.2, 8.0], [1.0, 1.0, 12.0], [0.0, 0.0, 5.0]])
    wc = weak_cam_from_position(intr, pos)
    back = weak_cam_to_trans(intr, wc)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pos), rtol=1e-5)


def test_triangulation_recovers_point(rng):
    from scipy.spatial.transform import Rotation

    p_world = np.asarray([0.3, -0.5, 2.0])
    K = np.asarray([[[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1]]] * 2)
    extr = []
    pts2d = []
    for ang in (0.3, -0.4):
        R = Rotation.from_euler("y", ang).as_matrix()
        t = np.asarray([0.1 * ang, 0.0, 4.0])
        cam_pt = R @ p_world + t
        uv = (K[0] @ (cam_pt / cam_pt[2]))[:2]
        extr.append(np.concatenate([R, t[:, None]], axis=1))
        pts2d.append(uv)
    x = lstsq_triangulation(
        jnp.asarray(K, dtype=jnp.float32),
        jnp.asarray(np.stack(extr), dtype=jnp.float32),
        jnp.asarray(np.stack(pts2d), dtype=jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(x), p_world, atol=1e-3)


def test_geman_mcclure_limits():
    r = jnp.asarray([0.0, 1e6])
    out = np.asarray(geman_mcclure(r, 30.0))
    assert out[0] == 0.0
    np.testing.assert_allclose(out[1], 1.0, rtol=1e-3)  # saturates at 1 (ref)
    # and matches the reference formula at a mid-range residual
    np.testing.assert_allclose(
        np.asarray(geman_mcclure(jnp.asarray([30.0]), 30.0)), 0.5, rtol=1e-6
    )


def test_estimate_translation_recovers_truth(rng):
    from airpose_tpu.geometry.projection import estimate_translation

    B, N = 3, 24
    t_true = np.asarray([[0.2, -0.1, 7.0], [0.0, 0.3, 9.0], [-0.4, 0.1, 5.0]],
                        np.float32)
    pts = rng.normal(size=(B, N, 3)).astype(np.float32) * 0.4
    f, res = 5000.0, 224.0
    cam = pts + t_true[:, None]
    uv = cam[..., :2] / cam[..., 2:] * f + res / 2.0
    j2d = np.concatenate([uv, np.ones((B, N, 1), np.float32)], -1)
    est = np.asarray(estimate_translation(jnp.asarray(pts), jnp.asarray(j2d)))
    np.testing.assert_allclose(est, t_true, atol=1e-2)


def test_estimate_translation_ignores_zero_conf(rng):
    from airpose_tpu.geometry.projection import estimate_translation

    B, N = 1, 24
    t_true = np.asarray([[0.1, 0.2, 6.0]], np.float32)
    pts = rng.normal(size=(B, N, 3)).astype(np.float32) * 0.4
    cam = pts + t_true[:, None]
    uv = cam[..., :2] / cam[..., 2:] * 5000.0 + 112.0
    j2d = np.concatenate([uv, np.ones((B, N, 1), np.float32)], -1)
    # corrupt half the joints but zero their confidence
    j2d[:, ::2, :2] += 500.0
    j2d[:, ::2, 2] = 0.0
    est = np.asarray(estimate_translation(jnp.asarray(pts), jnp.asarray(j2d)))
    np.testing.assert_allclose(est, t_true, atol=1e-2)


def test_weak_cam_crop_to_full_trans_matches_reference_formula(rng):
    """Cross-check against an independent torch transcription of the
    reference's modif_intr reprojection (hmr.py:178-193)."""
    import torch

    from airpose_tpu.geometry.projection import weak_cam_crop_to_full_trans

    B = 5
    cam = np.abs(rng.normal(size=(B, 3)).astype(np.float32)) + 0.3
    bb = rng.normal(size=(B, 3)).astype(np.float32) * 0.2
    bb[:, 2] = np.abs(bb[:, 2]) + 0.5
    intr = np.tile(
        np.asarray([[1475.0, 0, 960], [0, 1475.0, 540], [0, 0, 1]], np.float32),
        (B, 1, 1),
    )
    f = (1475.0, 1475.0)
    res = 224

    cam_t = torch.stack([
        torch.from_numpy(cam[:, 1]), torch.from_numpy(cam[:, 2]),
        2 * f[0] / (res * torch.from_numpy(cam[:, 0]) + 1e-9)], dim=-1)
    intr_t = torch.from_numpy(intr).clone()
    intr0 = intr_t.clone()
    intr0[:, :2, 2] = 0
    modif = torch.eye(3).repeat(B, 1, 1)
    modif[:, 0, 0] = f[0] / torch.from_numpy(bb[:, 2])
    modif[:, 1, 1] = f[1] / torch.from_numpy(bb[:, 2])
    modif[:, :2, 2] = torch.from_numpy(bb[:, :2]) * intr_t[:, :2, 2]
    ct = torch.bmm(torch.inverse(intr0), torch.bmm(modif, cam_t.unsqueeze(2)))
    cz = (cam_t / ((f[0] / torch.from_numpy(bb[:, 2])) / f[0]).unsqueeze(1))[:, 2]
    want = (ct.squeeze(2) * cz.unsqueeze(1) / ct[:, 2]).numpy()

    got = np.asarray(weak_cam_crop_to_full_trans(
        jnp.asarray(cam), jnp.asarray(bb), jnp.asarray(intr), f, res))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
