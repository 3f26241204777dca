"""Jitted train/eval steps + data-parallel execution.

Replaces the reference's LightningModule training_step/validation_step
machinery (ref copenet/copenet_twoview.py:376-414) with pure jitted
functions. Scaling is GSPMD data parallelism: the caller shards the batch
over a ``("data",)`` mesh (parallel/mesh.py) and jit propagates — gradients
psum over ICI, BatchNorm means become global automatically.
"""

import functools
import jax
import jax.numpy as jnp

from .. import constants as C
from ..bodymodel.smplx import SMPLXParams
from ..config import TrainConfig
from . import losses as L
from .state import TrainState


def _maybe_qat(params, cfg: TrainConfig):
    """QAT hook shared by all train AND eval steps: with cfg.qat the
    forward (and the gradient's forward pass) sees deployment-fake-
    quantized trunk conv kernels via the straight-through estimator, while
    the optimizer keeps updating the latent full-precision weights
    (ops/qat.py). Eval applies the same quantizer so validation — and the
    best-checkpoint selection driven by it — scores the network that will
    actually be deployed, not the latent float weights."""
    if not cfg.qat:
        return params
    from ..ops.qat import fake_quant_trunk_params

    return fake_quant_trunk_params(params, cfg.qat_levels)


def _trans_gt(batch):
    """GT translation for the IEF init: ``gt_trans`` where the dataset has
    SMPL-X parameter GT, else the cam-frame pelvis of the joints GT
    (H36M-style joints-only batches — joint 0 is the Hip)."""
    if "gt_trans" in batch:
        return batch["gt_trans"]
    return batch["gt_joints"][:, :, 0]


def _input_trans(batch, cfg: TrainConfig, key):
    """IEF translation initialization: fixed [0,0,10] or GT+noise, then
    distance-scaled (ref copenet_twoview.py:180-203)."""
    gt = _trans_gt(batch)
    if cfg.smpltrans_noise_sigma is None:
        t = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 10.0], dtype=gt.dtype), gt.shape)
    else:
        t = gt + cfg.smpltrans_noise_sigma * jax.random.normal(key, gt.shape, gt.dtype)
    return t * cfg.trans_scale


def _eval_input_trans(batch, cfg: TrainConfig):
    """Eval-time IEF translation init, pinned to [0,0,10] regardless of
    --smpltrans_noise_sigma. Deliberate divergence from the reference, whose
    eval path reuses the train-time noise injection (copenet_twoview.py:180-
    203 called from test_step) while its real-data forward pins [0,0,10]
    (copenet_real/copenet_twoview.py:176) — evaluation here is always
    deterministic and never conditions on GT."""
    gt = _trans_gt(batch)
    t = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 10.0], dtype=gt.dtype), gt.shape)
    return t * cfg.trans_scale


def make_twoview_step_fns(model, smplx_params: SMPLXParams, cfg: TrainConfig,
                          tx, loss=None):
    """Returns (train_step, eval_step) jitted functions for the flagship
    AirPoseTwoView (or the _sep variant — same signature). ``loss``
    defaults to the SMPL-X-parameter-supervised twoview_loss; pass
    L.joints_loss for joints-only GT datasets (h36m://)."""
    if loss is None:
        loss = L.twoview_loss

    def forward(params, batch_stats, batch, in_trans, train, dropout_key):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            out, mutated = model.apply(
                variables,
                batch["images"],
                batch["bb"],
                in_trans,
                iters=cfg.reg_iters,
                train=True,
                rngs={"dropout": dropout_key},
                mutable=["batch_stats"],
            )
            return out, mutated["batch_stats"]
        out = model.apply(
            variables, batch["images"], batch["bb"], in_trans, iters=cfg.reg_iters
        )
        return out, batch_stats

    def loss_from_out(out, batch):
        return loss(
            out.pose, out.betas, batch, smplx_params, cfg.loss, cfg.trans_scale
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, key):
        k_noise, k_drop = jax.random.split(key)
        in_trans = _input_trans(batch, cfg, k_noise)

        def loss_fn(params):
            out, new_stats = forward(
                _maybe_qat(params, cfg), state.batch_stats, batch, in_trans,
                True, k_drop
            )
            loss, metrics = loss_from_out(out, batch)
            return loss, (metrics, new_stats)

        grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
            ),
            metrics,
        )

    @jax.jit
    def eval_step(state: TrainState, batch):
        in_trans = _eval_input_trans(batch, cfg)
        out, _ = forward(_maybe_qat(state.params, cfg), state.batch_stats,
                         batch, in_trans, False, None)
        loss, metrics = loss_from_out(out, batch)

        pose = out.pose
        trans = pose[..., :3] / cfg.trans_scale
        from ..geometry.rotations import rot6d_to_rotmat

        B = pose.shape[0]
        rotmat = rot6d_to_rotmat(pose[..., 3:].reshape(B, 2, 22, 6))
        return metrics, {
            "pred_trans": trans,
            "pred_rotmat": rotmat,
            "pred_betas": out.betas,
        }

    return train_step, eval_step


def make_singleview_step_fns(model, smplx_params, cfg: TrainConfig, tx, family: str,
                             vertex_mask=None):
    """Train/eval steps for the single-view families ('hmr',
    'copenet_singleview') and 'muhmr'. Shares the twoview batch layout
    (view 0 used where single-view). ``vertex_mask`` (V,) optionally
    restricts the vertex MSE to body-only vertices (--body_only_verts)."""

    def apply_model(params, batch_stats, batch, in_trans, train, dropout_key):
        variables = {"params": params, "batch_stats": batch_stats}
        kwargs = dict(iters=cfg.reg_iters)
        if train:
            kwargs.update(train=True, rngs={"dropout": dropout_key}, mutable=["batch_stats"])
        if family == "hmr":
            args = (batch["images"][:, 0],)
        elif family == "copenet_singleview":
            args = (batch["images"][:, 0], batch["bb"][:, 0], in_trans[:, 0])
        elif family == "muhmr":
            args = (batch["images"],)
        else:
            raise ValueError(family)
        res = model.apply(variables, *args, **kwargs)
        if train:
            return res[0], res[1]["batch_stats"]
        return res, batch_stats

    def loss_from_out(out, batch):
        if family == "hmr":
            return L.hmr_loss(
                out.pose6d, out.betas, out.cam, batch, smplx_params, cfg.loss,
                cfg.img_res, vertex_mask=vertex_mask,
            )
        if family == "copenet_singleview":
            return L.singleview_loss(
                out.pose, out.betas, batch, smplx_params, cfg.loss,
                cfg.trans_scale, vertex_mask=vertex_mask,
            )
        return L.muhmr_loss(
            out.pose6d, out.betas, out.cam, batch, smplx_params, cfg.loss,
            cfg.img_res, vertex_mask=vertex_mask,
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, key):
        k_noise, k_drop = jax.random.split(key)
        in_trans = _input_trans(batch, cfg, k_noise)

        def loss_fn(params):
            out, new_stats = apply_model(
                _maybe_qat(params, cfg), state.batch_stats, batch, in_trans,
                True, k_drop
            )
            loss, metrics = loss_from_out(out, batch)
            return loss, (metrics, new_stats)

        grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return (
            TrainState(
                step=state.step + 1, params=new_params,
                batch_stats=new_stats, opt_state=new_opt,
            ),
            metrics,
        )

    @jax.jit
    def eval_step(state: TrainState, batch):
        in_trans = _eval_input_trans(batch, cfg)
        out, _ = apply_model(_maybe_qat(state.params, cfg), state.batch_stats,
                             batch, in_trans, False, None)
        loss, metrics = loss_from_out(out, batch)
        return metrics, out

    return train_step, eval_step


def make_real_twoview_step_fns(
    model, smplx_params, vposer_params, cfg: TrainConfig, tx
):
    """Self-supervised fine-tune steps on real data (ref
    copenet_real/copenet_twoview.py): fixed [0,0,10] trans init, OpenPose
    2D + VPoser losses, optional train_reg_only freeze (already encoded in
    ``tx``)."""

    def forward(params, batch_stats, batch, train, dropout_key):
        B = batch["images"].shape[0]
        in_trans = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 10.0 * cfg.trans_scale]), (B, 2, 3)
        )
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            out, mutated = model.apply(
                variables, batch["images"], batch["bb"], in_trans,
                iters=cfg.reg_iters, train=True,
                rngs={"dropout": dropout_key}, mutable=["batch_stats"],
            )
            return out, mutated["batch_stats"]
        out = model.apply(
            variables, batch["images"], batch["bb"], in_trans, iters=cfg.reg_iters
        )
        return out, batch_stats

    import functools as _ft

    @_ft.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, key):
        k_vp, k_drop = jax.random.split(key)

        def loss_fn(params):
            out, new_stats = forward(
                _maybe_qat(params, cfg), state.batch_stats, batch, True, k_drop)
            loss, metrics = L.real_twoview_loss(
                out.pose, out.betas, batch, smplx_params, vposer_params,
                cfg.real_loss, k_vp, cfg.trans_scale,
            )
            return loss, (metrics, new_stats)

        grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return (
            TrainState(step=state.step + 1, params=new_params,
                       batch_stats=new_stats, opt_state=new_opt),
            metrics,
        )

    @jax.jit
    def eval_step(state: TrainState, batch):
        out, _ = forward(_maybe_qat(state.params, cfg), state.batch_stats,
                         batch, False, None)
        loss, metrics = L.real_twoview_loss(
            out.pose, out.betas, batch, smplx_params, vposer_params,
            cfg.real_loss, jax.random.PRNGKey(0), cfg.trans_scale,
        )
        return metrics, out

    return train_step, eval_step


def make_real_singleview_step_fns(
    model, smplx_params, vposer_params, cfg: TrainConfig, tx,
    family: str = "hmr_camswap_difffl",
):
    """Real-data single-view fine-tune steps for the 'hmr_camswap_difffl'
    (the real trainer's --model=hmr alias, ref copenet_real/
    copenet_trainer.py:32-38) and 'spin' baselines. 'camswap' trains on a
    per-batch random view (the camera-swapped regime); 'spin' pins view 0."""

    import functools as _ft

    def apply_model(params, batch_stats, images, train, dropout_key):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            out, mutated = model.apply(
                variables, images, iters=cfg.reg_iters, train=True,
                rngs={"dropout": dropout_key}, mutable=["batch_stats"],
            )
            return out, mutated["batch_stats"]
        return model.apply(variables, images, iters=cfg.reg_iters), batch_stats

    @_ft.partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
    def train_step(state: TrainState, batch, key, view: int = 0):
        k_vp, k_drop = jax.random.split(key)

        def loss_fn(params):
            out, new_stats = apply_model(
                _maybe_qat(params, cfg), state.batch_stats,
                batch["images"][:, view], True, k_drop
            )
            loss, metrics = L.real_singleview_loss(
                out.pose6d, out.betas, out.cam, batch, smplx_params,
                vposer_params, cfg.real_loss, k_vp, view=view,
            )
            return loss, (metrics, new_stats)

        grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return (
            TrainState(step=state.step + 1, params=new_params,
                       batch_stats=new_stats, opt_state=new_opt),
            metrics,
        )

    @jax.jit
    def eval_step(state: TrainState, batch):
        out, _ = apply_model(_maybe_qat(state.params, cfg), state.batch_stats,
                             batch["images"][:, 0], False, None)
        loss, metrics = L.real_singleview_loss(
            out.pose6d, out.betas, out.cam, batch, smplx_params,
            vposer_params, cfg.real_loss, jax.random.PRNGKey(0), view=0,
        )
        return metrics, out

    return train_step, eval_step
