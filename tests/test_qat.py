"""QAT tests: STE gradient identity, fold∘quant ≡ quant∘fold (the claim
that pre-fold per-channel fake-quant models the deployed BN-folded int8
grid exactly), and the recovery property — a model degraded by coarse
quantization recovers under QAT steps while plain training does not model
the quantizer at all."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airpose_tpu.bodymodel import synthetic_smplx_params
from airpose_tpu.config import TrainConfig
from airpose_tpu.data import batch_slice, make_synthetic_dataset
from airpose_tpu.models import MODEL_REGISTRY
from airpose_tpu.ops import fake_quant_trunk_params, fake_quant_weight
from airpose_tpu.train import create_train_state, make_twoview_step_fns

B = 4


def test_fake_quant_weight_ste_gradient_is_identity(rng):
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32))
    g = jax.grad(lambda w: jnp.sum(fake_quant_weight(w, 7.0) * 2.0))(k)
    np.testing.assert_allclose(np.asarray(g), 2.0)  # straight-through

    q = np.asarray(fake_quant_weight(k, 7.0))
    # forward IS quantized: per-output-channel grid of 2*7+1 values
    for c in (0, 5):
        vals = np.unique(np.round(q[..., c] / (np.abs(q[..., c]).max() / 7.0)))
        assert len(vals) <= 15


def test_fake_quant_commutes_with_bn_fold(rng):
    """quantize(fold(W)) == fold(quantize(W)) per output channel — the
    exactness argument for doing QAT on unfolded kernels (ops/qat.py
    docstring; fold multiplies channel c by f_c = γ_c/σ_c, which rescales
    that channel's symmetric per-channel scale by |f_c|)."""
    from airpose_tpu.ops import fold_bn_into_conv

    k = jnp.asarray(rng.normal(size=(3, 3, 4, 8)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))  # ± signs
    beta = jnp.zeros(8)
    mean = jnp.zeros(8)
    var = jnp.asarray(rng.uniform(0.5, 2.0, size=(8,)).astype(np.float32))

    fold_then_q, _ = fold_bn_into_conv(
        fake_quant_weight(k, 7.0), gamma, beta, mean, var)
    q_then_fold = fake_quant_weight(
        fold_bn_into_conv(k, gamma, beta, mean, var)[0], 7.0)
    np.testing.assert_allclose(np.asarray(fold_then_q),
                               np.asarray(q_then_fold), rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_qat_recovers_quantization_degradation(rng):
    """The VERDICT-prescribed recovery check: train a twoview model
    briefly, degrade it with a coarse quantization grid (levels=7 ≈ 3-bit
    — int8 is accuracy-free on this family, so the test uses a grid where
    PTQ visibly hurts), then fine-tune WITH cfg.qat at that grid. The
    quantized-forward eval loss must recover most of the PTQ damage."""
    smplx_small = synthetic_smplx_params(num_vertices=222, seed=3)
    dataset = make_synthetic_dataset(
        smplx_small, num_samples=8, seed=5, img_size=64, blob_sigma=3.0)
    batch = batch_slice(dataset, 0, B)

    levels = 7.0
    cfg = TrainConfig(lr=1e-4, batch_size=B)
    cfg_qat = TrainConfig(lr=1e-4, batch_size=B, qat=True, qat_levels=levels)

    model = MODEL_REGISTRY["copenet_twoview"](iters=cfg.reg_iters)
    in_trans = jnp.full_like(batch["gt_trans"], 0.5)
    state, tx = create_train_state(
        model, (batch["images"], batch["bb"], in_trans),
        jax.random.PRNGKey(0), lr=cfg.lr)
    train_step, eval_step = make_twoview_step_fns(model, smplx_small, cfg, tx)
    qat_step, _ = make_twoview_step_fns(model, smplx_small, cfg_qat, tx)

    def quantized_eval_loss(state):
        qstate = state.replace(
            params=fake_quant_trunk_params(state.params, levels))
        m, _ = eval_step(qstate, batch)
        return float(m["loss"])

    key = jax.random.PRNGKey(42)
    for _ in range(15):  # plain pre-training
        key, sub = jax.random.split(key)
        state, metrics = train_step(state, batch, sub)
    bf16_loss = float(eval_step(state, batch)[0]["loss"])
    ptq_loss = quantized_eval_loss(state)
    damage = ptq_loss - bf16_loss
    assert damage > 0.05 * bf16_loss, (
        "fixture no longer shows PTQ degradation at this grid", bf16_loss,
        ptq_loss)

    for _ in range(20):  # QAT fine-tune at the same grid
        key, sub = jax.random.split(key)
        state, metrics = qat_step(state, batch, sub)
    qat_loss = quantized_eval_loss(state)
    # the quantized forward must recover most of the PTQ damage (QAT also
    # keeps optimizing the objective itself, so well below ptq_loss)
    assert qat_loss < bf16_loss + 0.5 * damage, (bf16_loss, ptq_loss, qat_loss)
    assert np.isfinite(qat_loss)


def test_fake_quant_act_grid_and_ste(rng):
    """Activation fake-quant: per-tensor grid ≡ the deployed
    int8_trunk._quantize_act dequantized values (same scale), and the
    gradient is straight-through."""
    from airpose_tpu.ops import fake_quant_act
    from airpose_tpu.ops.int8_trunk import _quantize_act

    x = jnp.asarray(rng.normal(size=(2, 5, 5, 8)).astype(np.float32) * 3.0)
    fq = np.asarray(fake_quant_act(x, 127.0))
    q, s = _quantize_act(x)  # dynamic per-tensor scale = max|x|/127
    np.testing.assert_allclose(fq, np.asarray(q, np.float32) * float(s),
                               rtol=1e-6, atol=1e-6)

    g = jax.grad(lambda t: jnp.sum(fake_quant_act(t, 7.0) * 3.0))(x)
    np.testing.assert_allclose(np.asarray(g), 3.0)

    # bf16 in → bf16 out (the trunk carries bf16 between ops)
    assert fake_quant_act(x.astype(jnp.bfloat16), 127.0).dtype == jnp.bfloat16


@pytest.mark.slow
def test_qat_act_recovers_activation_quantization_degradation(rng):
    """Activation-QAT recovery: at a coarse activation grid (levels=3 —
    activation rounding is far more benign than weight rounding on this
    family, int8/levels=127 is measured accuracy-free and even levels=7
    costs <4%) the act-quantized forward of a briefly-trained model
    degrades vs bf16; fine-tuning THROUGH the activation fake-quant
    (model act_fq, STE) recovers most of the damage. Mirrors the
    weight-QAT recovery test with the orthogonal quantizer."""
    smplx_small = synthetic_smplx_params(num_vertices=222, seed=3)
    dataset = make_synthetic_dataset(
        smplx_small, num_samples=8, seed=5, img_size=64, blob_sigma=3.0)
    batch = batch_slice(dataset, 0, B)

    levels = 3.0
    cfg = TrainConfig(lr=1e-4, batch_size=B)
    model = MODEL_REGISTRY["copenet_twoview"](iters=cfg.reg_iters)
    model_act = MODEL_REGISTRY["copenet_twoview"](
        iters=cfg.reg_iters, act_fq=levels)
    in_trans = jnp.full_like(batch["gt_trans"], 0.5)
    state, tx = create_train_state(
        model, (batch["images"], batch["bb"], in_trans),
        jax.random.PRNGKey(0), lr=cfg.lr)
    train_step, eval_step = make_twoview_step_fns(model, smplx_small, cfg, tx)
    act_train_step, act_eval_step = make_twoview_step_fns(
        model_act, smplx_small, cfg, tx)

    key = jax.random.PRNGKey(42)
    for _ in range(15):  # plain pre-training
        key, sub = jax.random.split(key)
        state, _ = train_step(state, batch, sub)
    bf16_loss = float(eval_step(state, batch)[0]["loss"])
    act_ptq_loss = float(act_eval_step(state, batch)[0]["loss"])
    damage = act_ptq_loss - bf16_loss
    assert damage > 0.05 * bf16_loss, (
        "fixture no longer shows activation-PTQ degradation at this grid",
        bf16_loss, act_ptq_loss)

    for _ in range(20):  # fine-tune through the activation quantizer
        key, sub = jax.random.split(key)
        state, _ = act_train_step(state, batch, sub)
    rec_loss = float(act_eval_step(state, batch)[0]["loss"])
    assert rec_loss < bf16_loss + 0.5 * damage, (
        bf16_loss, act_ptq_loss, rec_loss)
    assert np.isfinite(rec_loss)


@pytest.mark.slow
def test_trainer_cli_qat_smoke(tmp_path):
    """--qat (+ --qat_act) end to end through the trainer CLI (tiny
    synthetic run)."""
    from airpose_tpu.train.trainer import main

    main([
        "--name", "qat_smoke", "--version", "0", "--model", "copenet_twoview",
        "--datapath", "synthetic://8", "--log_dir", str(tmp_path),
        "--batch_size", "4", "--val_batch_size", "4", "--max_steps", "2",
        "--val_every", "2", "--img_res", "64", "--qat", "--qat_levels", "15",
        "--qat_act",
    ])
    import os

    assert os.path.exists(
        str(tmp_path / "qat_smoke" / "version_0" / "checkpoints" / "last"))


def test_fake_quant_act_frozen_scale_matches_deployed_and_clips(rng):
    """fake_quant_act with a STATIC scale reproduces the deployed
    int8_trunk._quantize_act dequantized values for that scale — including
    the CLIPPING a dynamic abs-max scale can never produce — and the STE
    gradient stays identity (clipped values included: deployment clips,
    so training must see through it to adapt)."""
    from airpose_tpu.ops import fake_quant_act
    from airpose_tpu.ops.int8_trunk import _quantize_act

    x = jnp.asarray(rng.normal(size=(2, 5, 5, 8)).astype(np.float32) * 3.0)
    s = float(jnp.max(jnp.abs(x))) / 127.0 * 0.25  # under-calibrated: clips
    fq = np.asarray(fake_quant_act(x, 127.0, scale=s))
    q, s_used = _quantize_act(x, s=jnp.float32(s))
    np.testing.assert_allclose(fq, np.asarray(q, np.float32) * float(s_used),
                               rtol=1e-6, atol=1e-6)
    assert (np.abs(np.asarray(q)) == 127).any(), "fixture did not clip"

    g = jax.grad(lambda t: jnp.sum(fake_quant_act(t, 127.0, scale=s) * 3.0))(x)
    np.testing.assert_allclose(np.asarray(g), 3.0)


@pytest.mark.slow
def test_qat_act_frozen_beats_dynamic_under_deployed_grid(rng):
    """The frozen-calibrated-scale posture, judged where it matters: from
    one pre-trained state, fine-tune two arms for the SAME step budget —
    dynamic abs-max (--qat_act) vs frozen deployment-calibrated scales
    (--qat_act_frozen) — and evaluate both under the DEPLOYED int8 trunk
    with the same static table. The frozen arm must win: its train-time
    forward IS the deployed grid, while the dynamic arm's scales track
    each batch and never exactly match the grid it ships on (measured 30%
    lower deployed eval loss, PERF.md r4; tools/qat_posture.py is the
    standalone version of this experiment).

    Deliberately NOT a clipping-recovery test: mild table shrink measures
    NEGATIVE damage on this fixture and deep shrink (×0.02-0.05) makes
    STE training diverge (r4 probes, PERF.md) — clipping calls for
    recalibration, not QAT."""
    from airpose_tpu.ops.int8_trunk import (calibrate_act_scales,
                                            quantize_trunk_params,
                                            twoview_int8_forward)
    from airpose_tpu.train import losses as L

    smplx_small = synthetic_smplx_params(num_vertices=222, seed=3)
    dataset = make_synthetic_dataset(
        smplx_small, num_samples=8, seed=5, img_size=64, blob_sigma=3.0)
    batch = batch_slice(dataset, 0, B)

    cfg = TrainConfig(lr=1e-4, batch_size=B)
    model = MODEL_REGISTRY["copenet_twoview"](iters=cfg.reg_iters)
    in_trans = jnp.full_like(batch["gt_trans"], 0.5)
    state, tx = create_train_state(
        model, (batch["images"], batch["bb"], in_trans),
        jax.random.PRNGKey(0), lr=cfg.lr)
    train_step, _ = make_twoview_step_fns(model, smplx_small, cfg, tx)

    key = jax.random.PRNGKey(42)
    for _ in range(15):  # plain pre-training
        key, sub = jax.random.split(key)
        state, _ = train_step(state, batch, sub)

    def host_vars(st):
        return {"params": jax.device_get(st.params),
                "batch_stats": jax.device_get(st.batch_stats)}

    imgs = jnp.asarray(batch["images"])
    table = calibrate_act_scales(
        quantize_trunk_params(host_vars(state)),
        imgs.reshape((-1,) + imgs.shape[-3:]))
    table = {k: float(v) for k, v in table.items()}

    def deployed_loss(st):
        variables = host_vars(st)
        qp = quantize_trunk_params(variables)
        t = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 10.0], jnp.float32) * cfg.trans_scale,
            batch["gt_trans"].shape)
        out = twoview_int8_forward(
            model, variables, qp, table, imgs, jnp.asarray(batch["bb"]), t,
            iters=cfg.reg_iters)
        loss, _ = L.twoview_loss(out.pose, out.betas, batch, smplx_small,
                                 cfg.loss, cfg.trans_scale)
        return float(loss)

    ptq_loss = deployed_loss(state)
    arms = {}
    for name, act_fq in (("dynamic", 127.0), ("frozen", (127.0, table))):
        m = MODEL_REGISTRY["copenet_twoview"](iters=cfg.reg_iters,
                                              act_fq=act_fq)
        ft_step, _ = make_twoview_step_fns(m, smplx_small, cfg, tx)
        # per-arm copy: train_step donates its state argument
        st, k = jax.tree.map(jnp.copy, state), jax.random.PRNGKey(7)
        for _ in range(20):
            k, sub = jax.random.split(k)
            st, _ = ft_step(st, batch, sub)
        arms[name] = deployed_loss(st)

    assert np.isfinite(arms["frozen"]) and np.isfinite(arms["dynamic"])
    assert arms["frozen"] < arms["dynamic"], (ptq_loss, arms)
    assert arms["frozen"] < ptq_loss, (ptq_loss, arms)


@pytest.mark.slow
@pytest.mark.parametrize("family", ["copenet_twoview", "copenet_twoview_sep"])
def test_trainer_cli_qat_act_frozen_smoke(tmp_path, family):
    """--qat --qat_act --qat_act_frozen end to end through the trainer CLI:
    calibrates per-site scales on the first batch and trains through the
    frozen grid (the wiring + site-key-naming check — a mismatched key
    KeyErrors at trace time). The _sep family calibrates each per-drone
    trunk on its OWN view's crops (104 sites total vs the shared 52)."""
    import contextlib
    import io
    import os

    from airpose_tpu.train.trainer import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main([
            "--name", "qat_fz", "--version", "0", "--model", family,
            "--datapath", "synthetic://8", "--log_dir",
            str(tmp_path), "--batch_size", "4", "--val_batch_size", "4",
            "--max_steps", "2", "--val_every", "2", "--img_res", "64",
            "--qat", "--qat_act", "--qat_act_frozen",
        ])
    out = buf.getvalue()
    assert "frozen activation-QAT" in out
    n_sites = 104 if family == "copenet_twoview_sep" else 52
    assert f"{n_sites} per-site scales" in out
    assert os.path.exists(
        str(tmp_path / "qat_fz" / "version_0" / "checkpoints" / "last"))
