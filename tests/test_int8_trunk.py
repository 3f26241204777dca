"""int8 PTQ trunk tests (CPU): weight quantization round-trip, calibration
→ static-scale inference consistency, and feature agreement with the bf16
trunk within the documented PTQ bounds."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airpose_tpu.models.resnet import ResNet50
from airpose_tpu.ops import (
    calibrate_act_scales,
    quantize_trunk_params,
    resnet50_int8_infer,
)
from airpose_tpu.ops.int8_trunk import quantize_weight


def test_quantize_weight_roundtrip(rng):
    k = rng.normal(size=(3, 3, 8, 16)).astype(np.float32) * 0.3
    q, s = quantize_weight(k)
    assert q.dtype == jnp.int8
    back = np.asarray(q, np.float32) * np.asarray(s)
    # per-channel symmetric: max error bounded by half a quantization step
    step = np.abs(k).reshape(-1, 16).max(axis=0) / 127.0
    assert (np.abs(back - k) <= step / 2 + 1e-7).all()


def test_twoview_int8_forward_close_to_bf16(rng):
    """The full int8 serving forward (int8 trunk features → from_features
    IEF) tracks the bf16 model output within the PTQ bounds measured on
    hardware (pose MAD ≈ 1.7% of pose RMS at feature corr 0.9997; random
    weights here are the worst case, so the gate is looser)."""
    from airpose_tpu.models import AirPoseTwoView
    from airpose_tpu.ops import twoview_int8_forward

    model = AirPoseTwoView(dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(2, 2, 64, 64, 3)).astype(np.float32))
    bb = jnp.zeros((2, 2, 3))
    pos = jnp.full((2, 2, 3), 0.5)
    variables = model.init(jax.random.PRNGKey(0), x, bb, pos)
    qp = quantize_trunk_params(variables)
    scales = calibrate_act_scales(qp, x.reshape(4, 64, 64, 3))

    want = model.apply(variables, x, bb, pos)
    got = twoview_int8_forward(model, variables, qp, scales, x, bb, pos)
    dpose = np.abs(np.asarray(got.pose) - np.asarray(want.pose))
    rms = np.asarray(want.pose).std()
    assert dpose.mean() < 0.15 * rms, (dpose.mean(), rms)
    assert np.isfinite(np.asarray(got.betas)).all()


def test_int8_shim_sep_family(rng):
    """Int8TwoView on the per-drone _sep model: both trunks quantized
    separately, features fed through the sep from_features core loop;
    output tracks the bf16 sep forward within the PTQ bound."""
    from airpose_tpu.models.airpose import AirPoseTwoViewSep
    from airpose_tpu.ops import Int8TwoView

    model = AirPoseTwoViewSep(dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(2, 2, 64, 64, 3)).astype(np.float32))
    bb = jnp.zeros((2, 2, 3))
    pos = jnp.full((2, 2, 3), 0.5)
    variables = model.init(jax.random.PRNGKey(0), x, bb, pos)

    shim = Int8TwoView(model, variables, x.reshape(4, 64, 64, 3))
    assert shim.sep and len(shim.qparams) == 2
    want = model.apply(variables, x, bb, pos)
    got = shim.apply(variables, x, bb, pos)
    dpose = np.abs(np.asarray(got.pose) - np.asarray(want.pose))
    assert dpose.mean() < 0.15 * np.asarray(want.pose).std()


def test_mixed_stage_trunk(rng):
    """int8_stages=() runs every stage as folded-BN bf16 convs — must
    match the flax trunk in eval mode to bf16 tolerance; partial subsets
    must sit between that and the all-int8 PTQ error."""
    model = ResNet50(dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32) * 0.3)
    variables = model.init(jax.random.PRNGKey(0), x)
    qp = quantize_trunk_params(variables)
    scales = calibrate_act_scales(qp, x)

    want = np.asarray(model.apply(variables, x, train=False))
    folded = np.asarray(
        resnet50_int8_infer(qp, x, act_scales=scales, int8_stages=()))
    rel = np.linalg.norm(folded - want) / np.linalg.norm(want)
    assert rel < 0.05, rel  # bf16 rounding + BN-folding only

    late = np.asarray(
        resnet50_int8_infer(qp, x, act_scales=scales, int8_stages=(3, 4)))
    rel_late = np.linalg.norm(late - want) / np.linalg.norm(want)
    full = np.asarray(resnet50_int8_infer(qp, x, act_scales=scales))
    rel_full = np.linalg.norm(full - want) / np.linalg.norm(want)
    assert rel_late < max(rel_full, 0.2) + 0.05, (rel_late, rel_full)


def test_int8_trunk_matches_bf16_within_ptq_bounds(rng):
    model = ResNet50(dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32) * 0.3)
    variables = model.init(jax.random.PRNGKey(0), x)
    qp = quantize_trunk_params(variables)
    scales = calibrate_act_scales(qp, x)

    want = np.asarray(model.apply(variables, x, train=False))
    got_static = np.asarray(resnet50_int8_infer(qp, x, act_scales=scales))
    got_dynamic = np.asarray(resnet50_int8_infer(qp, x))

    # dynamic and calibrated-static agree tightly (same data calibrated)
    np.testing.assert_allclose(got_static, got_dynamic, rtol=0.2, atol=0.2)

    # PTQ bound vs bf16: RANDOM-weight nets amplify quantization noise far
    # more than trained ones; the documented bound is correlation-based
    corr = np.corrcoef(got_static.ravel(), want.ravel())[0, 1]
    assert corr > 0.9, corr
    rel = np.linalg.norm(got_static - want) / np.linalg.norm(want)
    assert rel < 0.35, rel


def test_calibration_clip_rates_detect_shifted_data(rng):
    """Calibration-sensitivity diagnostics: scales calibrated on dim
    frames must report substantial clipping on bright (2x contrast)
    frames, near-zero on same-regime frames — and a calibration that
    INCLUDES the shifted regime brings both the clip rates and the
    feature error back within the PTQ bound."""
    from airpose_tpu.ops import calibration_clip_rates

    model = ResNet50(dtype=jnp.bfloat16)
    dim = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32) * 0.15)
    bright = dim * 2.0
    variables = model.init(jax.random.PRNGKey(1), dim)
    qp = quantize_trunk_params(variables)

    scales_dim = calibrate_act_scales(qp, dim)
    rates_same = calibration_clip_rates(qp, scales_dim, dim)
    rates_shift = calibration_clip_rates(qp, scales_dim, bright)
    assert max(rates_same.values()) < 1e-3, max(rates_same.values())
    assert max(rates_shift.values()) > 10 * max(
        max(rates_same.values()), 1e-6), (
        max(rates_same.values()), max(rates_shift.values()))

    # recalibrate over BOTH regimes (the --int8_calib_n remedy): clipping
    # collapses and the bright-frame features return to the PTQ bound
    scales_both = calibrate_act_scales(qp, jnp.concatenate([dim, bright]))
    rates_fixed = calibration_clip_rates(qp, scales_both, bright)
    assert max(rates_fixed.values()) < 1e-3, max(rates_fixed.values())

    want = np.asarray(model.apply(variables, bright, train=False))
    got = np.asarray(resnet50_int8_infer(qp, bright, act_scales=scales_both))
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.9, corr


@pytest.mark.slow
def test_compile_results_int8_calib_n_cli(tmp_path, capsys, rng):
    """--int8_calib_n: a larger calibration sample spans multiple eval
    batches and the clip-rate report prints; metrics stay finite."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_data import _write_fake_aerialpeople

    from airpose_tpu.bodymodel import synthetic_smplx_params
    from airpose_tpu.eval.compile_results import main

    params = synthetic_smplx_params(num_vertices=99, seed=4)
    data_dir = tmp_path / "aerial"
    os.makedirs(data_dir)
    _write_fake_aerialpeople(str(data_dir), params, n=5)

    out_pkl = str(tmp_path / "r.pkl")
    main([
        "--model", "copenet_twoview", "--datapath", str(data_dir),
        "--split", "test", "--out", out_pkl,
        "--batch_size", "2", "--img_res", "64", "--synthetic_verts", "99",
        "--int8", "--int8_calib_n", "6",
    ])
    printed = capsys.readouterr().out
    # the clip report must be measured OUT of the calibration sample
    assert "int8 calibration: 6 images; held-out clip rate" in printed
    with open(out_pkl + ".metrics.json") as f:
        m = json.load(f)
    assert np.isfinite(m["test"]["mpjpe0"])
