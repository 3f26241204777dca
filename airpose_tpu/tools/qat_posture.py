"""Activation-QAT scale-posture experiment: dynamic abs-max vs FROZEN
calibrated scales, judged under the deployed int8 trunk.

`--qat_act` trains with dynamic per-batch abs-max scales while deployment
uses static calibrated ones (ops/int8_trunk.calibrate_act_scales). This
tool quantifies that train/deploy mismatch (VERDICT r3 weak #5): from one
pre-trained state it fine-tunes three arms for the same step budget —

  ptq      no fine-tune (the deployment baseline)
  dynamic  --qat_act's posture: act_fq = levels (per-batch abs-max)
  frozen   --qat_act_frozen's posture: act_fq = (levels, calibrated table)

— and evaluates every arm under the DEPLOYED int8 trunk with the SAME
static table (weights requantized per arm; deployment ships the table
with the checkpoint). ``--calib_shrink`` scales the table down to model
an unrepresentative calibration set (shrink < 1 → the deployed grid
CLIPS, the regime dynamic abs-max cannot represent at train time).

Usage:
    python -m airpose_tpu.tools.qat_posture [--platform cpu]
        [--calib_shrink 1.0] [--steps_pre 15] [--steps_ft 20]

Config-of-record mode (the round-4 VERDICT ask — the fixture-scale 30%
frozen-vs-dynamic headline re-measured at the training config of record,
ref copenet_twoview.py:419-425,655-675: batch 30, 224 px):

    python -m airpose_tpu.tools.qat_posture --batch 30 --img 224 \
        --num_batches 8 --steps_pre 240 --steps_ft 160

``--num_batches > 1`` cycles distinct batches during train/fine-tune and
evaluates every arm on a HELD-OUT batch (the single-batch default keeps
the original overfit-one-batch fixture semantics).

No reference counterpart (the reference serves fp32); this closes the
framework's own quantization-recovery story (PERF.md).
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--img", type=int, default=64)
    p.add_argument("--verts", type=int, default=222)
    p.add_argument("--steps_pre", type=int, default=15)
    p.add_argument("--steps_ft", type=int, default=20)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--calib_shrink", type=float, default=1.0,
                   help="scale the calibrated table by this factor "
                        "(<1 models an unrepresentative calibration set)")
    p.add_argument("--num_batches", type=int, default=1,
                   help="distinct training batches to cycle; > 1 also "
                        "holds out one extra batch for evaluation")
    p.add_argument("--platform", default=None,
                   help="jax platform override (e.g. cpu)")
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ..bodymodel import synthetic_smplx_params
    from ..config import TrainConfig
    from ..data import batch_slice, make_synthetic_dataset
    from ..models import MODEL_REGISTRY
    from ..ops.int8_trunk import (calibrate_act_scales, quantize_trunk_params,
                                  twoview_int8_forward)
    from ..train import create_train_state, make_twoview_step_fns
    from ..train import losses as L

    smplx = synthetic_smplx_params(num_vertices=args.verts, seed=3)
    nb = max(args.num_batches, 1)
    dataset = make_synthetic_dataset(
        smplx, num_samples=(nb + 1) * args.batch, seed=5, img_size=args.img,
        blob_sigma=3.0)
    train_batches = [batch_slice(dataset, i * args.batch, args.batch)
                     for i in range(nb)]
    # held-out eval batch when cycling several; the single-batch default
    # keeps the original overfit-one-batch fixture semantics
    batch = (batch_slice(dataset, nb * args.batch, args.batch)
             if nb > 1 else train_batches[0])
    cfg = TrainConfig(lr=args.lr, batch_size=args.batch, img_res=args.img)

    model = MODEL_REGISTRY["copenet_twoview"](iters=cfg.reg_iters)
    in_trans = jnp.full_like(batch["gt_trans"], 0.5)
    state, tx = create_train_state(
        model, (batch["images"], batch["bb"], in_trans),
        jax.random.PRNGKey(0), lr=cfg.lr)
    train_step, eval_step = make_twoview_step_fns(model, smplx, cfg, tx)

    key = jax.random.PRNGKey(42)
    for s in range(args.steps_pre):
        key, sub = jax.random.split(key)
        state, _ = train_step(state, train_batches[s % nb], sub)
    bf16_loss = float(eval_step(state, batch)[0]["loss"])

    # deployment calibration on the pre-trained weights, optionally shrunk
    def host_vars(st):
        return {"params": jax.device_get(st.params),
                "batch_stats": jax.device_get(st.batch_stats)}

    imgs = jnp.asarray(batch["images"])
    # calibrate on TRAINING data (the deployment recipe; never the
    # held-out eval batch)
    calib_imgs = jnp.asarray(train_batches[0]["images"])
    table = calibrate_act_scales(
        quantize_trunk_params(host_vars(state)),
        calib_imgs.reshape((-1,) + calib_imgs.shape[-3:]))
    table = {k: float(v) * args.calib_shrink for k, v in table.items()}

    def deployed_loss(st):
        """Eval loss through the DEPLOYED int8 trunk with the frozen
        table (weights requantized from this arm's checkpoint — exactly
        what shipping the arm would do)."""
        variables = host_vars(st)
        qp = quantize_trunk_params(variables)
        t = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 10.0], jnp.float32) * cfg.trans_scale,
            batch["gt_trans"].shape)
        out = twoview_int8_forward(
            model, variables, qp, table, imgs, jnp.asarray(batch["bb"]), t,
            iters=cfg.reg_iters)
        loss, _ = L.twoview_loss(out.pose, out.betas, batch, smplx,
                                 cfg.loss, cfg.trans_scale)
        return float(loss)

    arms = {"ptq": state}
    # bf16_ft is the CONTROL arm: same extra step budget, no fake-quant —
    # it separates "fake-quant training hurts" from "any continued
    # training at this budget hurts (overfit / noise floor)"
    for name, act_fq in (("bf16_ft", None), ("dynamic", 127.0),
                         ("frozen", (127.0, table))):
        m = MODEL_REGISTRY["copenet_twoview"](iters=cfg.reg_iters,
                                              act_fq=act_fq)
        ft_step, _ = make_twoview_step_fns(m, smplx, cfg, tx)
        # each arm fine-tunes its OWN copy: train_step donates its state
        # argument, so handing `state` itself to an arm would delete the
        # other arms' weights
        st, k = jax.tree.map(jnp.copy, state), jax.random.PRNGKey(7)
        for s in range(args.steps_ft):
            k, sub = jax.random.split(k)
            st, _ = ft_step(st, train_batches[s % nb], sub)
        arms[name] = st

    print(f"\nqat posture experiment: B={args.batch} @{args.img}, "
          f"pre {args.steps_pre} / ft {args.steps_ft} steps over {nb} "
          f"batch(es){' + held-out eval' if nb > 1 else ''}, "
          f"calib_shrink={args.calib_shrink}, "
          f"platform={jax.devices()[0].platform}")
    print(f"  bf16 eval loss (pretrain): {bf16_loss:.4f}")
    results = {}
    for name, st in arms.items():
        results[name] = deployed_loss(st)
        print(f"  deployed-int8 eval loss [{name:7s}]: {results[name]:.4f}")
    return {"bf16": bf16_loss, **results}


if __name__ == "__main__":
    main()
