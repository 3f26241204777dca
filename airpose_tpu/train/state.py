"""Training state + optimizer construction.

Optimizer matches the reference exactly: Adam with amsgrad, weight decay 0,
lr 5e-5 (ref copenet/copenet_twoview.py:416-425). The `train_reg_only`
regime (freeze everything except fc1/fc2/dec heads — ref
copenet_real/copenet_twoview.py:361-373) is an optax.multi_transform over a
param-label tree instead of requires_grad mutation.
"""

from typing import Any

import jax
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: Any
    params: Any
    batch_stats: Any
    opt_state: Any


REG_ONLY_MODULES = ("core", "core0", "core1")  # fc1/fc2/dec heads live here


def make_optimizer(lr: float, train_reg_only: bool = False) -> optax.GradientTransformation:
    base = optax.amsgrad(learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8)
    if not train_reg_only:
        return base

    def label_tree(params):
        def label(path, _):
            top = path[0].key if hasattr(path[0], "key") else str(path[0])
            return "train" if top in REG_ONLY_MODULES else "freeze"

        return jax.tree_util.tree_map_with_path(label, params)

    return optax.multi_transform(
        {"train": base, "freeze": optax.set_to_zero()}, label_tree
    )


def create_train_state(
    model, sample_args, rng, lr: float, train_reg_only: bool = False
):
    """Initialize model variables + optimizer state. ``sample_args`` are
    positional args for ``model.init`` (tiny shapes are fine)."""
    variables = model.init(rng, *sample_args)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(lr, train_reg_only)
    return (
        TrainState(
            step=0,
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
        ),
        tx,
    )
