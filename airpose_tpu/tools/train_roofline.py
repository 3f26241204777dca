"""Training-step roofline: decompose the flagship two-view train step.

The inference path got a per-stage table in PERF.md; this gives the
training step (the primary v5e-8 scaling axis, SURVEY.md §2.8; training
config of record = batch 30 @224, Adam amsgrad 5e-5, reg_iters 3 — ref
copenet/copenet_twoview.py:419-425,655-675) the same treatment: trunk
fwd/bwd, IEF+heads, SMPL-X + loss fwd+bwd, optimizer update, residual.

Method identical to bench.py / PERF.md: each stage runs inside ONE jitted
``lax.scan`` whose hot input depends on the carry (defeats hoisting) and
whose timed region ends with a device→host transfer (block_until_ready
does not synchronize on the axon relay backend). Scan length 100 amortizes
the relay's ~28 ms fixed per-call cost to <0.3 ms of the per-step figure.

Usage (owns the TPU for the duration):
    python -m airpose_tpu.tools.train_roofline [--batch 30] [--img 224]
        [--length 100] [--stages full,fwd_eval,...] [--remat]

``--remat`` wraps the trunk apply in jax.checkpoint for the full-step and
model-fwd-bwd stages (the memory-for-FLOPs trade, measured not assumed).
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..bodymodel import synthetic_smplx_params
from ..config import TrainConfig
from ..data import make_synthetic_dataset
from ..models import AirPoseTwoView
from ..train import losses as L
from ..train.loop import make_twoview_step_fns
from ..train.state import TrainState, create_train_state

ALL_STAGES = (
    "full", "fwd_eval", "fwd_train", "fwdbwd_model", "fwdbwd_trunk",
    "loss_fwd", "loss_fwdbwd", "opt",
)


def _timed(make_step, init_carry, n, warm=True):
    """make_step: carry -> carry (pure). Times a length-n scan; the caller
    guarantees the hot input depends on the carry. Returns seconds/iter."""

    @jax.jit
    def chain(c0):
        def step(carry, _):
            return make_step(carry), ()
        cN, _ = jax.lax.scan(step, c0, None, length=n)
        # reduce every leaf so nothing is dead code
        return sum(jnp.asarray(x, jnp.float32).sum()
                   for x in jax.tree.leaves(cN)
                   if hasattr(x, "dtype") and jnp.issubdtype(
                       jnp.asarray(x).dtype, jnp.number))

    if warm:
        float(chain(init_carry))  # compile + warm
    t0 = time.perf_counter()
    r = float(chain(init_carry))  # host transfer = sync barrier
    dt = (time.perf_counter() - t0) / n
    assert np.isfinite(r), "non-finite stage output"
    return dt


def build(batch_size: int, img: int, remat: bool):
    """Model, state, tx, device-resident batch, cfg — the training config
    of record on synthetic fixtures (full-size 10475-vertex body)."""
    smplx_params = synthetic_smplx_params()
    cfg = TrainConfig(model="copenet_twoview", img_res=img)
    model = AirPoseTwoView(iters=cfg.reg_iters, dtype=jnp.bfloat16)

    data = make_synthetic_dataset(smplx_params, batch_size, seed=0, img_size=img)
    batch = {k: jnp.asarray(v) for k, v in data.items()
             if hasattr(v, "shape")}

    in_trans = jnp.full((batch_size, 2, 3), 0.5)
    state, tx = create_train_state(
        model, (batch["images"], batch["bb"], in_trans),
        jax.random.PRNGKey(0), lr=cfg.lr)
    return model, smplx_params, cfg, state, tx, batch


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=30)
    p.add_argument("--img", type=int, default=224)
    p.add_argument("--length", type=int, default=100)
    p.add_argument("--stages", default=",".join(ALL_STAGES))
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint around the trunk in full/model stages")
    p.add_argument("--platform", default=None,
                   help="jax platform override (e.g. cpu for smoke tests)")
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    model, smplx_params, cfg, state, tx, batch = build(
        args.batch, args.img, args.remat)
    B = args.batch
    n = args.length
    key = jax.random.PRNGKey(1)
    stages = args.stages.split(",")
    results = {}

    def hot_batch(batch, c):
        b = dict(batch)
        b["images"] = batch["images"] + c * 1e-6
        return b

    def trunk_apply(params, stats, x2, train):
        """(2B, H, W, 3) trunk forward; optionally rematerialized."""
        def f(p, s, x):
            return model.apply(
                {"params": p, "batch_stats": s}, x, train=train,
                method=lambda m, xx, train: m.trunk(xx, train=train),
                **(dict(mutable=["batch_stats"]) if train else {}),
            )
        if args.remat:
            f = jax.checkpoint(f)
        return f(params, stats, x2)

    # ---- full train step ----
    if "full" in stages:
        train_step, _ = make_twoview_step_fns(model, smplx_params, cfg, tx)

        def full(carry):
            c, st = carry
            st2, metrics = train_step(st, hot_batch(batch, c), key)
            return (metrics["loss"] * 0 + c + 1e-9, st2)

        results["full"] = _timed(full, (jnp.float32(0.0), state), n)

    x2 = batch["images"].reshape((2 * B, args.img, args.img, 3))
    in_trans = jnp.full((B, 2, 3), 0.5)

    # ---- model forward, eval mode ----
    if "fwd_eval" in stages:
        def fwd_eval(carry):
            c = carry
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch["images"] + c * 1e-6, batch["bb"], in_trans,
                iters=cfg.reg_iters)
            return c + (out.pose.mean() + out.betas.mean()) * 1e-9

        results["fwd_eval"] = _timed(fwd_eval, jnp.float32(0.0), n)

    # ---- model forward, train mode (BN batch stats + dropout) ----
    if "fwd_train" in stages:
        def fwd_train(carry):
            c = carry
            out, _ = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch["images"] + c * 1e-6, batch["bb"], in_trans,
                iters=cfg.reg_iters, train=True,
                rngs={"dropout": key}, mutable=["batch_stats"])
            return c + (out.pose.mean() + out.betas.mean()) * 1e-9

        results["fwd_train"] = _timed(fwd_train, jnp.float32(0.0), n)

    # ---- model fwd+bwd (no SMPL-X/loss): grad wrt params of a scalar ----
    if "fwdbwd_model" in stages:
        def model_scalar(params, c):
            if args.remat:
                # remat the trunk, regress from features
                xf, _ = trunk_apply(params, state.batch_stats,
                                    x2 + c * 1e-6, True)
                out, _ = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    xf.reshape(B, 2, -1), batch["bb"], in_trans,
                    iters=cfg.reg_iters, train=True,
                    rngs={"dropout": key}, mutable=["batch_stats"],
                    method=AirPoseTwoView.from_features)
            else:
                out, _ = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["images"] + c * 1e-6, batch["bb"], in_trans,
                    iters=cfg.reg_iters, train=True,
                    rngs={"dropout": key}, mutable=["batch_stats"])
            return out.pose.sum() + out.betas.sum()

        def fwdbwd_model(carry):
            c = carry
            g = jax.grad(model_scalar)(state.params, c)
            # consume EVERY grad leaf — reducing just one lets XLA DCE the
            # rest of the backward pass (measured: trunk bwd vanished)
            return c + sum(l.mean() for l in jax.tree.leaves(g)) * 1e-12

        results["fwdbwd_model"] = _timed(fwdbwd_model, jnp.float32(0.0), n)

    # ---- trunk-only fwd+bwd ----
    if "fwdbwd_trunk" in stages:
        def trunk_scalar(params, c):
            xf, _ = trunk_apply(params, state.batch_stats, x2 + c * 1e-6, True)
            return jnp.asarray(xf, jnp.float32).sum()

        def fwdbwd_trunk(carry):
            c = carry
            g = jax.grad(trunk_scalar)(state.params, c)
            return c + sum(l.mean() for l in jax.tree.leaves(g)) * 1e-12

        results["fwdbwd_trunk"] = _timed(fwdbwd_trunk, jnp.float32(0.0), n)

    # ---- loss chain (SMPL-X + projection + terms), fwd and fwd+bwd ----
    # Use the model's real IEF init (a fabricated [1,0,0,0,1,0] 6D is
    # DEGENERATE under the column-major (3,2) reshape — a2 = 0 — and its
    # normalize gradient is NaN; mean_init_state is the trained manifold).
    from ..models.airpose import mean_init_state

    mean_pose6d, mean_shape, _ = mean_init_state((B, 2))
    pose0 = jnp.concatenate([jnp.full((B, 2, 3), 0.5), mean_pose6d], axis=-1)
    betas0 = mean_shape

    def loss_val(pose, betas, c):
        t, _ = L.twoview_loss(pose + c * 1e-6, betas, batch, smplx_params,
                              cfg.loss, cfg.trans_scale)
        return t

    if "loss_fwd" in stages:
        def loss_fwd(carry):
            c = carry
            return c + loss_val(pose0, betas0, c) * 1e-12

        results["loss_fwd"] = _timed(loss_fwd, jnp.float32(0.0), n)

    if "loss_fwdbwd" in stages:
        def loss_fwdbwd(carry):
            c = carry
            gp, gb = jax.grad(loss_val, argnums=(0, 1))(pose0, betas0, c)
            return c + gp.mean() * 1e-12 + gb.mean() * 1e-12

        results["loss_fwdbwd"] = _timed(loss_fwdbwd, jnp.float32(0.0), n)

    # ---- optimizer update alone (amsgrad over the full param tree) ----
    if "opt" in stages:
        grads0 = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-6, state.params)

        def opt(carry):
            c, params, opt_state = carry
            g = jax.tree.map(lambda x: x + c * 1e-9, grads0)
            updates, new_opt = tx.update(g, opt_state, params)
            new_params = jax.tree.map(lambda p, u: p + u, params, updates)
            return (c + jax.tree.leaves(new_params)[0].mean() * 1e-12,
                    new_params, new_opt)

        results["opt"] = _timed(
            opt, (jnp.float32(0.0), state.params, state.opt_state), n)

    # ---- report ----
    tag = " (remat)" if args.remat else ""
    print(f"\ntrain roofline{tag}: B={B} @{args.img}, reg_iters="
          f"{cfg.reg_iters}, scan length {n}, "
          f"platform={jax.devices()[0].platform}")
    for k in ALL_STAGES:
        if k in results:
            print(f"  {k:14s} {results[k]*1e3:8.2f} ms/iter")
    r = results
    if all(k in r for k in
           ("full", "fwdbwd_model", "fwdbwd_trunk", "loss_fwdbwd", "opt")):
        print("derived decomposition of the full step:")
        print(f"  trunk fwd+bwd       {r['fwdbwd_trunk']*1e3:8.2f} ms")
        print(f"  IEF+heads fwd+bwd   {(r['fwdbwd_model']-r['fwdbwd_trunk'])*1e3:8.2f} ms")
        print(f"  SMPLX+loss fwd+bwd  {r['loss_fwdbwd']*1e3:8.2f} ms")
        print(f"  optimizer (amsgrad) {r['opt']*1e3:8.2f} ms")
        resid = r["full"] - r["fwdbwd_model"] - r["loss_fwdbwd"] - r["opt"]
        print(f"  residual (loss-chain coupling, BN stat plumbing)"
              f" {resid*1e3:8.2f} ms")
        print(f"  full step           {r['full']*1e3:8.2f} ms "
              f"({2*B/r['full']:.0f} imgs/s, {B/r['full']:.0f} two-view samples/s)")
    return results


if __name__ == "__main__":
    main()
