"""Pallas int8 bottleneck kernel tests (CPU, interpret mode): per-block
exactness vs a plain-XLA transcription of the same quantized math, batch
padding, and full-trunk agreement with the bf16 trunk within the PTQ
bounds established for the XLA int8 path (test_int8_trunk.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from airpose_tpu.models.resnet import ResNet50
from airpose_tpu.ops import calibrate_act_scales, quantize_trunk_params
import pytest

from airpose_tpu.ops.int8_bottleneck import (
    int8_block,
    quantize_trunk_pallas,
    resnet50_int8_pallas_infer,
)


def _ref_block(x, blk):
    """The kernel's math in plain jnp/lax — int8 convs with int32
    accumulation and the identical static-scale epilogues."""
    stride = blk["meta"].stride
    cmid = blk["w1"].shape[1]

    def conv(x, w, s=1):
        return jax.lax.conv_general_dilated(
            x, w, (s, s), ((1, 1), (1, 1)) if w.shape[0] == 3 else "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    def requant(acc, m, b):
        y = jax.nn.relu(acc.astype(jnp.float32) * m + b)
        return jnp.clip(jnp.round(y), 0.0, 127.0).astype(jnp.int8)

    cin = x.shape[-1]
    acc1 = conv(x, blk["w1"].reshape(1, 1, cin, cmid))
    y1 = requant(acc1, blk["m1"], blk["b1"])
    acc2 = conv(y1, blk["w2"].reshape(3, 3, cmid, cmid), s=stride)
    y2 = requant(acc2, blk["m2"], blk["b2"])
    acc3 = conv(y2, blk["w3"].reshape(1, 1, cmid, -1))
    y3 = acc3.astype(jnp.float32) * blk["m3"] + blk["b3"]
    if "wp" in blk:
        accp = conv(x[:, ::stride, ::stride, :],
                    blk["wp"].reshape(1, 1, cin, -1))
        res = accp.astype(jnp.float32) * blk["mp"] + blk["bp"]
    else:
        res = x.astype(jnp.float32) * blk["r"]
    out = jax.nn.relu(y3 + res)
    if blk["meta"].out_int8:
        return jnp.clip(jnp.round(out), 0.0, 127.0).astype(jnp.int8)
    return out.astype(jnp.bfloat16)


def _quantized_trunk(rng, hw=64):
    model = ResNet50(dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(2, hw, hw, 3)).astype(np.float32) * 0.3)
    variables = model.init(jax.random.PRNGKey(0), x)
    scales = calibrate_act_scales(quantize_trunk_params(variables), x)
    return model, variables, x, quantize_trunk_pallas(variables, scales)


@pytest.mark.slow
def test_blocks_match_xla_transcription(rng):
    """Every block kind (projection/stride-2 and identity, incl. the
    bf16-out trunk-final) matches the lax transcription element-exact up
    to f32-epilogue rounding at the int8 clip boundary."""
    _, _, _, pb = _quantized_trunk(rng)
    # layer2_0 input: quantized front output
    x = jnp.asarray(
        rng.integers(0, 127, size=(2, 16, 16, 256)), jnp.int8)
    for blk in pb["blocks"]:
        want = np.asarray(_ref_block(x, blk), np.float32)
        got = np.asarray(int8_block(x, blk, interpret=True), np.float32)
        # integer outputs may differ by 1 where the f32 epilogue lands on
        # a rounding boundary; allow that on <0.5% of elements
        diff = np.abs(got - want)
        assert diff.max() <= 1.0 + 1e-6, diff.max()
        assert (diff > 1e-6).mean() < 5e-3, (diff > 1e-6).mean()
        x = jnp.asarray(_ref_block(x, blk))


def test_block_batch_padding(rng):
    """Batches not divisible by the kernel's image group are padded and
    sliced back — results must not depend on the grouping."""
    _, _, _, pb = _quantized_trunk(rng)
    blk = pb["blocks"][1]  # layer2_1 identity, G=2
    x = jnp.asarray(rng.integers(0, 127, size=(3, 8, 8, 512)), jnp.int8)
    got = np.asarray(int8_block(x, blk, interpret=True), np.float32)
    one = np.asarray(int8_block(x, blk, interpret=True, group=1),
                     np.float32)
    np.testing.assert_array_equal(got, one)


def test_int8_pallas_trunk_matches_bf16_within_ptq_bounds(rng):
    """Full front(bf16) + pallas-int8 layers 2-4 path vs the bf16 trunk:
    same PTQ bounds as the XLA int8 path (random weights amplify
    quantization noise; trained nets quantize far better)."""
    model, variables, x, pb = _quantized_trunk(rng)
    want = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(
        resnet50_int8_pallas_infer(model, variables, pb, x, interpret=True))
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.9, corr
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.35, rel
