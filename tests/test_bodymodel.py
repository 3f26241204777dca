"""SMPL-X / VPoser tests.

Golden check: the JAX LBS is compared against an independently written
numpy implementation of the SMPL equations (per-sample loops, explicit
4x4 chain composition) on a synthetic model with the real schema.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from airpose_tpu.bodymodel import (
    smplx_forward,
    synthetic_smplx_params,
    init_vposer_params,
    vposer_decode,
    vposer_encode,
)
from airpose_tpu.bodymodel.smplx import SMPLX_PARENTS
from airpose_tpu.bodymodel.vposer import vposer_rsample


@pytest.fixture(scope="module")
def small_model():
    return synthetic_smplx_params(num_vertices=333, seed=1)


def numpy_lbs_reference(params, betas, full_pose_rotmats):
    """Slow, loopy, textbook SMPL forward in numpy (independent of the JAX
    path: explicit homogeneous 4x4s, per-joint python recursion)."""
    v_template = np.asarray(params.v_template)
    shape_dirs = np.asarray(params.shape_dirs)
    pose_dirs = np.asarray(params.pose_dirs)
    j_reg = np.asarray(params.j_regressor)
    weights = np.asarray(params.lbs_weights)
    parents = params.parents
    B = betas.shape[0]
    V, J = v_template.shape[0], j_reg.shape[0]

    out_v = np.zeros((B, V, 3))
    out_j = np.zeros((B, J, 3))
    for b in range(B):
        v_shaped = v_template + (shape_dirs @ betas[b])
        joints = j_reg @ v_shaped
        feat = (full_pose_rotmats[b, 1:] - np.eye(3)).reshape(-1)
        v_posed = v_shaped + (feat @ pose_dirs).reshape(V, 3)

        G = np.zeros((J, 4, 4))
        for j in range(J):
            T = np.eye(4)
            T[:3, :3] = full_pose_rotmats[b, j]
            T[:3, 3] = joints[j] - (joints[parents[j]] if j > 0 else 0)
            G[j] = T if j == 0 else G[parents[j]] @ T
        out_j[b] = G[:, :3, 3]
        A = G.copy()
        for j in range(J):
            A[j, :3, 3] -= G[j, :3, :3] @ joints[j]
        for v in range(V):
            T = np.einsum("j,jkl->kl", weights[v], A)
            out_v[b, v] = T[:3, :3] @ v_posed[v] + T[:3, 3]
    return out_v, out_j


def test_lbs_matches_numpy_reference(small_model, rng):
    B = 3
    betas = rng.normal(size=(B, 10)).astype(np.float32)
    aa = rng.normal(size=(B, 55, 3)).astype(np.float32) * 0.4
    rotmats = Rotation.from_rotvec(aa.reshape(-1, 3)).as_matrix().reshape(B, 55, 3, 3)

    want_v, want_j = numpy_lbs_reference(small_model, betas, rotmats)

    out = smplx_forward(
        small_model,
        jnp.asarray(betas),
        body_pose=jnp.asarray(rotmats[:, 1:22], dtype=jnp.float32),
        global_orient=jnp.asarray(rotmats[:, :1], dtype=jnp.float32),
        jaw_eyes_pose=jnp.asarray(rotmats[:, 22:25], dtype=jnp.float32),
        hand_pose=jnp.asarray(rotmats[:, 25:], dtype=jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(out.joints[:, :55]), want_j, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.vertices), want_v, atol=2e-5)


def test_forward_output_shapes(small_model):
    B = 4
    out = smplx_forward(
        small_model,
        jnp.zeros((B, 10)),
        body_pose=jnp.broadcast_to(jnp.eye(3), (B, 21, 3, 3)),
        global_orient=jnp.broadcast_to(jnp.eye(3), (B, 1, 3, 3)),
        transl=jnp.ones((B, 3)),
    )
    assert out.vertices.shape == (B, 333, 3)
    assert out.joints.shape == (B, 127, 3)


def test_forward_pose2rot_axis_angle(small_model, rng):
    B = 2
    aa_body = rng.normal(size=(B, 63)).astype(np.float32) * 0.3
    aa_root = rng.normal(size=(B, 3)).astype(np.float32) * 0.3
    out_aa = smplx_forward(
        small_model,
        jnp.zeros((B, 10)),
        body_pose=jnp.asarray(aa_body),
        global_orient=jnp.asarray(aa_root),
        pose2rot=True,
    )
    R_body = Rotation.from_rotvec(aa_body.reshape(-1, 3)).as_matrix().reshape(B, 21, 3, 3)
    R_root = Rotation.from_rotvec(aa_root).as_matrix().reshape(B, 1, 3, 3)
    out_rm = smplx_forward(
        small_model,
        jnp.zeros((B, 10)),
        body_pose=jnp.asarray(R_body, dtype=jnp.float32),
        global_orient=jnp.asarray(R_root, dtype=jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(out_aa.vertices), np.asarray(out_rm.vertices), atol=1e-4
    )


def test_transl_shifts_everything(small_model):
    B = 2
    t = jnp.asarray([[1.0, -2.0, 3.0], [0.0, 0.5, -0.5]])
    base = smplx_forward(
        small_model, jnp.zeros((B, 10)),
        body_pose=jnp.broadcast_to(jnp.eye(3), (B, 21, 3, 3)),
        global_orient=jnp.broadcast_to(jnp.eye(3), (B, 1, 3, 3)))
    shifted = smplx_forward(
        small_model, jnp.zeros((B, 10)),
        body_pose=jnp.broadcast_to(jnp.eye(3), (B, 21, 3, 3)),
        global_orient=jnp.broadcast_to(jnp.eye(3), (B, 1, 3, 3)), transl=t)
    np.testing.assert_allclose(
        np.asarray(shifted.vertices - base.vertices),
        np.broadcast_to(np.asarray(t)[:, None], (B, 333, 3)), atol=1e-6)


def test_forward_is_jittable_and_differentiable(small_model):
    B = 2

    @jax.jit
    def loss_fn(betas):
        out = smplx_forward(
            small_model, betas,
            body_pose=jnp.broadcast_to(jnp.eye(3), (B, 21, 3, 3)),
            global_orient=jnp.broadcast_to(jnp.eye(3), (B, 1, 3, 3)))
        return jnp.sum(out.vertices ** 2)

    g = jax.grad(loss_fn)(jnp.ones((B, 10)) * 0.1)
    assert g.shape == (B, 10)
    assert np.isfinite(np.asarray(g)).all()


def test_parents_table_is_valid_tree():
    assert len(SMPLX_PARENTS) == 55
    assert SMPLX_PARENTS[0] == -1
    for j, p in enumerate(SMPLX_PARENTS[1:], start=1):
        assert 0 <= p < j  # topological


def test_vposer_encode_decode_shapes(rng):
    params = init_vposer_params(seed=0)
    pose = jnp.asarray(rng.normal(size=(5, 63)).astype(np.float32) * 0.3)
    mu, sigma = vposer_encode(params, pose)
    assert mu.shape == (5, 32) and sigma.shape == (5, 32)
    assert (np.asarray(sigma) > 0).all()
    z = vposer_rsample(mu, sigma, jax.random.PRNGKey(0))
    dec = vposer_decode(params, z)
    assert dec["pose_body"].shape == (5, 21, 3)
    assert dec["pose_body_matrot"].shape == (5, 21, 3, 3)
    R = np.asarray(dec["pose_body_matrot"]).reshape(-1, 3, 3)
    np.testing.assert_allclose(
        R @ R.transpose(0, 2, 1), np.broadcast_to(np.eye(3), R.shape), atol=1e-5
    )


def test_vposer_torch_conversion_roundtrip(rng):
    """Build a fake torch-style state dict, convert, and check encode parity
    with a hand-rolled numpy forward of the same weights."""
    import torch

    from airpose_tpu.bodymodel.vposer import convert_torch_state_dict

    sd = {}
    def lin(prefix, i, o):
        sd[prefix + ".weight"] = torch.randn(o, i) * 0.03
        sd[prefix + ".bias"] = torch.randn(o) * 0.03
    def bn(prefix, n):
        sd[prefix + ".weight"] = torch.rand(n) + 0.5
        sd[prefix + ".bias"] = torch.randn(n)
        sd[prefix + ".running_mean"] = torch.randn(n)
        sd[prefix + ".running_var"] = torch.rand(n) + 0.5

    # released VPoser v2 layout: encoder_net.0 is a parameter-less
    # BatchFlatten, so parameterized layers start at index 1
    bn("encoder_net.1", 63); lin("encoder_net.2", 63, 512); bn("encoder_net.4", 512)
    lin("encoder_net.6", 512, 512); lin("encoder_net.7", 512, 512)
    lin("encoder_net.8.mu", 512, 32); lin("encoder_net.8.logvar", 512, 32)
    lin("decoder_net.0", 32, 512); lin("decoder_net.3", 512, 512)
    lin("decoder_net.5", 512, 126)

    params = convert_torch_state_dict(sd)
    x = rng.normal(size=(3, 63)).astype(np.float32)

    # Independent numpy forward.
    def np_bn(v, p):
        return ((v - sd[p + ".running_mean"].numpy())
                / np.sqrt(sd[p + ".running_var"].numpy() + 1e-5)
                * sd[p + ".weight"].numpy() + sd[p + ".bias"].numpy())
    def np_lin(v, p):
        return v @ sd[p + ".weight"].numpy().T + sd[p + ".bias"].numpy()
    def lrelu(v):
        return np.where(v > 0, v, 0.01 * v)

    h = np_bn(x, "encoder_net.1")
    h = lrelu(np_lin(h, "encoder_net.2"))
    h = np_bn(h, "encoder_net.4")
    h = np_lin(h, "encoder_net.6")
    h = np_lin(h, "encoder_net.7")
    want_mu = np_lin(h, "encoder_net.8.mu")

    mu, sigma = vposer_encode(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mu), want_mu, rtol=1e-3, atol=1e-4)
