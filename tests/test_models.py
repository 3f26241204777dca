"""Model-family tests: shapes, param counts, jit, IEF/residual semantics,
cross-view coupling, staged-step equivalence (SURVEY.md §4 implication)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airpose_tpu.models import (
    AirPoseTwoView,
    AirPoseTwoViewSep,
    HMR,
    MuHMR,
    SingleViewFullCam,
    mean_init_state,
)

B = 2
IMG = (224, 224, 3)


@pytest.fixture(scope="module")
def keys():
    return jax.random.PRNGKey(0)


def small_images(n_view=None):
    shape = (B,) + ((n_view,) if n_view else ()) + IMG
    return jnp.zeros(shape, dtype=jnp.float32)


def test_hmr_shapes(keys):
    model = HMR()
    x = small_images()
    variables = model.init(keys, x)
    out = model.apply(variables, x)
    assert out.pose6d.shape == (B, 132)
    assert out.betas.shape == (B, 10)
    assert out.cam.shape == (B, 3)


def test_singleview_shapes(keys):
    model = SingleViewFullCam()
    x = small_images()
    bb = jnp.zeros((B, 3))
    pos = jnp.asarray([[0.0, 0.0, 0.5]] * B)
    variables = model.init(keys, x, bb, pos)
    out = model.apply(variables, x, bb, pos)
    assert out.pose.shape == (B, 135)
    assert out.betas.shape == (B, 10)


def test_muhmr_shapes(keys):
    model = MuHMR()
    x = small_images(2)
    variables = model.init(keys, x)
    out = model.apply(variables, x)
    assert out.pose6d.shape == (B, 2, 132)
    assert out.betas.shape == (B, 2, 10)
    assert out.cam.shape == (B, 2, 3)


def test_twoview_shapes_and_jit(keys):
    model = AirPoseTwoView()
    x = small_images(2)
    bb = jnp.zeros((B, 2, 3))
    pos = jnp.full((B, 2, 3), 0.5)
    variables = model.init(keys, x, bb, pos)
    out = jax.jit(lambda v, *a: model.apply(v, *a))(variables, x, bb, pos)
    assert out.pose.shape == (B, 2, 135)
    assert out.betas.shape == (B, 2, 10)
    # translation state starts from init_position (residual IEF on top).
    assert np.isfinite(np.asarray(out.pose)).all()


def test_twoview_param_count(keys):
    """ResNet-50 (25.56M incl fc-less trunk ≈ 23.5M) + IEF MLP heads."""
    model = AirPoseTwoView()
    x = small_images(2)
    variables = model.init(keys, x, jnp.zeros((B, 2, 3)), jnp.zeros((B, 2, 3)))
    n = sum(p.size for p in jax.tree.leaves(variables["params"]))
    # trunk 23.5M + fc1 (2332*1024) + fc2 (1024²) + heads ≈ 27.1M
    assert 26_000_000 < n < 28_500_000, n


def test_twoview_cross_view_coupling(keys):
    """Changing view 1's image must change view 0's prediction (the
    cross-view conditioning is the model's core novelty)."""
    model = AirPoseTwoView()
    bb = jnp.zeros((B, 2, 3))
    pos = jnp.full((B, 2, 3), 0.5)
    x = jax.random.normal(keys, (B, 2) + IMG) * 0.1
    variables = model.init(keys, x, bb, pos)
    out_a = model.apply(variables, x, bb, pos)
    x_mod = x.at[:, 1].add(1.0)
    out_b = model.apply(variables, x_mod, bb, pos)
    diff_v0 = np.abs(np.asarray(out_a.pose[:, 0] - out_b.pose[:, 0])).max()
    assert diff_v0 > 1e-6, "view-0 prediction ignored view-1 input"


def test_twoview_view_symmetry(keys):
    """Shared weights: swapping the two views must swap the outputs."""
    model = AirPoseTwoView()
    bb = jax.random.normal(jax.random.PRNGKey(1), (B, 2, 3)) * 0.1
    pos = jnp.full((B, 2, 3), 0.5)
    x = jax.random.normal(keys, (B, 2) + IMG) * 0.1
    variables = model.init(keys, x, bb, pos)
    out = model.apply(variables, x, bb, pos)
    out_sw = model.apply(variables, x[:, ::-1], bb[:, ::-1], pos[:, ::-1])
    np.testing.assert_allclose(
        np.asarray(out.pose), np.asarray(out_sw.pose[:, ::-1]), atol=1e-5
    )


def test_twoview_staged_equals_fused(keys):
    """step1/2/3 via regress_step must reproduce the fused 3-iter forward —
    the property that lets the same weights serve offline and on-drone."""
    model = AirPoseTwoView()
    bb = jax.random.normal(jax.random.PRNGKey(1), (B, 2, 3)) * 0.1
    pos = jnp.full((B, 2, 3), 0.5)
    x = jax.random.normal(keys, (B, 2) + IMG) * 0.1
    variables = model.init(keys, x, bb, pos)
    fused = model.apply(variables, x, bb, pos, iters=3)

    # Staged: per-view features, then 3 explicit exchanges.
    xf = jnp.stack(
        [
            model.apply(variables, x[:, v], method=AirPoseTwoView.extract_features)
            for v in (0, 1)
        ],
        axis=1,
    )
    mean_pose, mean_shape, _ = mean_init_state((B, 2))
    pose = jnp.concatenate([pos, mean_pose], axis=-1)
    shape = mean_shape
    for _ in range(3):
        new_p, new_s = [], []
        for v in (0, 1):
            o = 1 - v
            p, s = model.apply(
                variables,
                xf[:, v], bb[:, v], pose[:, v], shape[:, v],
                pose[:, o, 9:], shape[:, o],
                method=AirPoseTwoView.regress_step,
            )
            new_p.append(p)
            new_s.append(s)
        pose = jnp.stack(new_p, axis=1)
        shape = jnp.stack(new_s, axis=1)

    np.testing.assert_allclose(np.asarray(fused.pose), np.asarray(pose), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused.betas), np.asarray(shape), atol=1e-5)


def test_twoview_sep_has_independent_weights(keys):
    model = AirPoseTwoViewSep()
    x = small_images(2)
    bb = jnp.zeros((B, 2, 3))
    pos = jnp.full((B, 2, 3), 0.5)
    variables = model.init(keys, x, bb, pos)
    n = sum(p.size for p in jax.tree.leaves(variables["params"]))
    assert n > 50_000_000  # two full trunks
    out = model.apply(variables, x, bb, pos)
    assert out.pose.shape == (B, 2, 135)


def test_dropout_active_in_train_mode(keys):
    model = HMR()
    x = jax.random.normal(keys, (B,) + IMG) * 0.1
    variables = model.init(keys, x)
    out1 = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"],
    )[0]
    out2 = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
    )[0]
    assert np.abs(np.asarray(out1.pose6d - out2.pose6d)).max() > 1e-6


def test_batch_stats_update_in_train(keys):
    model = HMR()
    x = jax.random.normal(keys, (B,) + IMG)
    variables = model.init(keys, x)
    _, updates = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"],
    )
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    changed = any(np.abs(np.asarray(a - b)).max() > 0 for a, b in zip(after, before))
    assert changed
