"""Fused-bottleneck pallas kernel tests (interpret mode on CPU): BN folding,
the fused layer1 stage vs the flax trunk's layer1, and the full spliced
trunk forward vs the plain eval forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airpose_tpu.models.resnet import ResNet50
from airpose_tpu.ops.fused_bottleneck import (
    fold_bn_into_conv,
    fused_stage1,
    resnet50_fused_infer,
    stage1_params_from_variables,
)


@pytest.fixture(scope="module")
def trunk_and_vars():
    model = ResNet50(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32) * 0.3)
    variables = model.init(jax.random.PRNGKey(0), x)
    # randomize batch stats so BN folding is non-trivial
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    def perturb(path, a):
        name = str(path[-1].key if hasattr(path[-1], "key") else path[-1])
        r = np.random.default_rng(abs(hash("/".join(map(str, path)))) % 2**32)
        if name == "mean":
            return a + r.normal(0, 0.05, a.shape).astype(a.dtype)
        if name == "var":
            return a * r.uniform(0.8, 1.2, a.shape).astype(a.dtype)
        return a

    stats = jax.tree_util.tree_map_with_path(perturb, stats)
    return model, {"params": variables["params"],
                   "batch_stats": jax.tree.map(jnp.asarray, stats)}


def test_fold_bn_matches_conv_bn(rng):
    k = rng.normal(size=(1, 1, 8, 16)).astype(np.float32) * 0.2
    g = rng.uniform(0.5, 1.5, 16).astype(np.float32)
    b = rng.normal(size=16).astype(np.float32) * 0.1
    m = rng.normal(size=16).astype(np.float32) * 0.1
    v = rng.uniform(0.5, 2.0, 16).astype(np.float32)
    x = rng.normal(size=(3, 5, 5, 8)).astype(np.float32)

    y_ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y_ref = (np.asarray(y_ref) - m) / np.sqrt(v + 1e-5) * g + b

    kf, bf = fold_bn_into_conv(k, g, b, m, v)
    y = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(kf), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(y) + bf, y_ref, atol=1e-5)


def test_fused_stage1_matches_flax_layer1(trunk_and_vars, rng):
    """The pallas stage (interpret mode) must equal running the flax
    layer1 blocks in eval mode, up to bf16 rounding."""
    model, variables = trunk_and_vars
    B = 2
    x = jnp.asarray(
        rng.normal(size=(B, 64, 64, 3)).astype(np.float32) * 0.3
    )
    stem = model.apply(variables, x, part="stem")  # (B, 16, 16, 64)

    # flax reference: stem -> full forward minus (tail after layer1) ==
    # run the three layer1 Bottleneck blocks directly
    from airpose_tpu.models.resnet import Bottleneck

    h_ref = stem
    for b in range(3):
        blk = Bottleneck(planes=64, stride=1, project=(b == 0),
                         dtype=jnp.bfloat16, name=f"layer1_{b}")
        h_ref = blk.apply(
            {"params": variables["params"][f"layer1_{b}"],
             "batch_stats": variables["batch_stats"][f"layer1_{b}"]},
            h_ref, train=False,
        )

    ops = stage1_params_from_variables(variables)
    h = fused_stage1(stem.astype(jnp.bfloat16), ops, interpret=True)

    np.testing.assert_allclose(
        np.asarray(h, np.float32), np.asarray(h_ref, np.float32),
        atol=0.05, rtol=0.05,
    )
    # and it must not be trivially zero
    assert float(jnp.abs(h).mean()) > 1e-3


def test_resnet50_fused_infer_matches_eval_forward(trunk_and_vars, rng):
    """Full spliced trunk (stem -> pallas layer1 -> tail) vs the plain
    eval forward."""
    model, variables = trunk_and_vars
    x = jnp.asarray(
        rng.normal(size=(2, 64, 64, 3)).astype(np.float32) * 0.3
    )
    want = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(resnet50_fused_infer(model, variables, x, interpret=True))
    # The stage itself matches tightly (test above); through 13 further
    # RANDOM-weight bf16 blocks the rounding-point differences amplify
    # chaotically, so the end-to-end bound is a relative-L2 one.
    rel_l2 = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel_l2 < 0.1, rel_l2
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.995, corr
