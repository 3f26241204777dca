"""Metric tests: MPJPE/MPE closed-form cases, PA-MPJPE invariance to
similarity transforms, perfect-prediction zero error."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from airpose_tpu.bodymodel import synthetic_smplx_params
from airpose_tpu.eval import (
    mpe,
    mpjpe,
    pa_mpjpe,
    procrustes_align,
    twoview_eval_metrics,
)


def test_mpjpe_simple():
    a = jnp.zeros((2, 22, 3))
    b = jnp.ones((2, 22, 3)) * jnp.asarray([3.0, 0.0, 4.0])
    assert float(mpjpe(a, b)) == pytest.approx(5.0)


def test_mpe_simple():
    a = jnp.zeros((4, 3))
    b = jnp.broadcast_to(jnp.asarray([0.0, 3.0, 4.0]), (4, 3))
    assert float(mpe(a, b)) == pytest.approx(5.0)


def test_pa_mpjpe_invariant_to_similarity(rng):
    gt = rng.normal(size=(5, 22, 3)).astype(np.float32)
    R = Rotation.from_euler("xyz", rng.normal(size=(3,))).as_matrix()
    pred = 1.7 * gt @ R.T + np.asarray([0.3, -1.0, 2.0])
    err = float(pa_mpjpe(jnp.asarray(pred, dtype=jnp.float32), jnp.asarray(gt)))
    assert err < 1e-4, err


def test_pa_mpjpe_nonzero_for_different_poses(rng):
    gt = rng.normal(size=(5, 22, 3)).astype(np.float32)
    pred = gt + rng.normal(size=gt.shape).astype(np.float32) * 0.1
    err = float(pa_mpjpe(jnp.asarray(pred), jnp.asarray(gt)))
    assert err > 0.01


def test_twoview_eval_perfect_prediction(rng):
    params = synthetic_smplx_params(num_vertices=111, seed=2)
    N = 3
    aa = rng.normal(size=(N, 22, 3)).astype(np.float32) * 0.3
    rm = Rotation.from_rotvec(aa.reshape(-1, 3)).as_matrix().reshape(N, 22, 3, 3)
    rm = rm.astype(np.float32)
    pred_rotmat = jnp.asarray(np.stack([rm, rm], axis=1))
    gt_pose = jnp.asarray(rm[:, 1:])
    gt_orient = jnp.asarray(np.stack([rm[:, 0], rm[:, 0]], axis=1))
    betas = jnp.zeros((N, 2, 10))
    trans = jnp.asarray(rng.normal(size=(N, 2, 3)).astype(np.float32))
    m = twoview_eval_metrics(
        params, pred_rotmat, betas, trans,
        gt_pose, gt_orient, jnp.zeros((N, 10)), trans,
    )
    for k in ("mpjpe0", "mpjpe1", "pa_mpjpe0", "pa_mpjpe1", "mpe0", "mpe1"):
        assert float(m[k]) < 1e-4, (k, float(m[k]))
