"""Pallas fused ResNet bottleneck stage — the trunk's HBM-bound hot spot.

Why this kernel exists (measured on one v5e chip, batch 128 images):
the ResNet-50 trunk splits ~9.0 ms as stem 0.7 / layer1 2.8 / layer2 2.4 /
layer3 2.1 / layer4 1.0. Layers 3-4 run at 90-107 TF/s (near MXU peak) but
layer1 runs at ~31 TF/s: XLA cannot fuse across convolutions, so each
bottleneck block round-trips its 56×56 activations through HBM ~8 times
(≈2.5 GB/stage — exactly the measured 2.8 ms at the ~819 GB/s HBM roofline).

This kernel runs ALL of layer1 (3 bottleneck blocks: 1×1 → 3×3 → 1×1 with
residual, first block carrying the 64→256 projection; eval mode, BatchNorm
folded into conv weights) for one image per grid step entirely in VMEM:
HBM traffic drops to one read of the (56,56,64) input + one write of the
(56,56,256) output. The 3×3 convs are 9 shift-matmuls on the MXU over the
padded in-VMEM activations. The trunk architecture is unchanged — this is
an inference-time execution strategy over the SAME flax parameters
(replicating ref copenet/models/model_copenet.py:161-176's trunk math, BN
in running-stats mode), used by the bench/serving path; training still
runs the flax trunk (it needs batch-stat updates and the backward pass).

VMEM budget per grid step: in 0.4 MB + out 1.6 MB + two (58,58,256/64)
intermediates + ~0.6 MB folded weights ≈ 6 MB « 16 MB/core.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C_IN = 64           # layer1 input channels (after stem+maxpool)
C_MID = 64
C_OUT = 256


def fold_bn_into_conv(kernel, bn_scale, bn_bias, bn_mean, bn_var, eps=1e-5):
    """Inference-time BN folding: conv→BN ≡ conv with
    W' = W·γ/√(σ²+ε) (per output channel), b' = β − μ·γ/√(σ²+ε)."""
    k = np.asarray(kernel, np.float32)
    g = np.asarray(bn_scale, np.float32)
    b = np.asarray(bn_bias, np.float32)
    m = np.asarray(bn_mean, np.float32)
    v = np.asarray(bn_var, np.float32)
    s = g / np.sqrt(v + eps)
    return k * s, b - m * s


def fuse_stage_params(block_params, block_stats) -> Dict[str, np.ndarray]:
    """One bottleneck block's flax params/batch_stats → folded kernels.

    Returns w1 (Cin, Cmid), w2 (9, Cmid, Cmid), w3 (Cmid, Cout), biases,
    and optionally wp/bp for the projection shortcut. 1×1 kernels are
    squeezed to matmul form; the 3×3 kernel is flattened to 9 taps.
    """
    out = {}
    for ci in (1, 2, 3):
        name = str(ci)
        k, b = fold_bn_into_conv(
            block_params[f"conv{ci}"]["kernel"],
            block_params[f"bn{ci}"]["scale"],
            block_params[f"bn{ci}"]["bias"],
            block_stats[f"bn{ci}"]["mean"],
            block_stats[f"bn{ci}"]["var"],
        )
        if k.shape[0] == 1:  # 1x1: (1,1,Cin,Cout) -> (Cin,Cout)
            k = k[0, 0]
        else:  # 3x3: (3,3,Cin,Cout) -> (9,Cin,Cout)
            k = k.reshape(9, k.shape[2], k.shape[3])
        out[f"w{name}"] = k
        out[f"b{name}"] = b
    if "downsample_conv" in block_params:
        k, b = fold_bn_into_conv(
            block_params["downsample_conv"]["kernel"],
            block_params["downsample_bn"]["scale"],
            block_params["downsample_bn"]["bias"],
            block_stats["downsample_bn"]["mean"],
            block_stats["downsample_bn"]["var"],
        )
        out["wp"] = k[0, 0]
        out["bp"] = b
    return out


def stage1_params_from_variables(variables) -> Tuple[jnp.ndarray, ...]:
    """Extract + fold the trunk's layer1 blocks from a full model's
    variables ({'params': {'trunk': ...}, 'batch_stats': {'trunk': ...}}
    or the trunk's own variables) into the kernel's flat operand tuple."""
    params = variables["params"]
    stats = variables["batch_stats"]
    if "trunk" in params:
        params, stats = params["trunk"], stats["trunk"]
    ops = []
    for b in range(3):
        f = fuse_stage_params(params[f"layer1_{b}"], stats[f"layer1_{b}"])
        ops += [f["w1"], f["b1"], f["w2"], f["b2"], f["w3"], f["b3"]]
        if b == 0:
            ops += [f["wp"], f["bp"]]
    # bf16 weights feed the MXU; f32 biases ride the epilogue
    return tuple(
        jnp.asarray(a, dtype=jnp.bfloat16 if a.ndim > 1 else jnp.float32)
        for a in ops
    )


def _make_stage1_kernel(h: int, w: int):
    hw = h * w

    def conv3x3(y1, w2_ref, b2, cols_ref):
        """3×3 same-pad conv on a (h, w, Cmid) VMEM tensor as ONE im2col
        matmul: (h·w, 9·Cmid) @ (9·Cmid, Cmid). A 576-deep contraction
        keeps the MXU full, unlike 9 separate 64-deep shift-matmuls.
        The im2col matrix is staged through a VMEM scratch (Mosaic cannot
        concat strided slices directly)."""
        pad = jnp.pad(y1, ((1, 1), (1, 1), (0, 0)))
        for k, (di, dj) in enumerate(
            (di, dj) for di in range(3) for dj in range(3)
        ):
            cols_ref[:, k * C_MID:(k + 1) * C_MID] = (
                pad[di:di + h, dj:dj + w].reshape(hw, C_MID)
            )
        w2 = w2_ref[:].reshape(9 * C_MID, C_MID)
        acc = jnp.dot(cols_ref[:], w2, preferred_element_type=jnp.float32)
        return jax.nn.relu(acc + b2)

    def kernel(
        x_ref,
        # block 0 (projection)
        w1a, b1a, w2a, b2a, w3a, b3a, wpa, bpa,
        # block 1
        w1b, b1b, w2b, b2b, w3b, b3b,
        # block 2
        w1c, b1c, w2c, b2c, w3c, b3c,
        out_ref,
        cols_ref,
    ):
        x = x_ref[0].reshape(hw, C_IN)  # (h·w, 64) bf16

        # ---- block 0: 64 -> 256 with projection shortcut ----
        y1 = jax.nn.relu(
            jnp.dot(x, w1a[:], preferred_element_type=jnp.float32) + b1a[:]
        ).astype(jnp.bfloat16)
        y2 = conv3x3(y1.reshape(h, w, C_MID), w2a, b2a[:], cols_ref).astype(jnp.bfloat16)
        y3 = jnp.dot(y2, w3a[:], preferred_element_type=jnp.float32) + b3a[:]
        res = jnp.dot(x, wpa[:], preferred_element_type=jnp.float32) + bpa[:]
        acts = jax.nn.relu(y3 + res).astype(jnp.bfloat16)  # (h·w, 256)

        # ---- blocks 1, 2: identity shortcut ----
        for w1, b1, w2, b2, w3, b3 in (
            (w1b, b1b, w2b, b2b, w3b, b3b),
            (w1c, b1c, w2c, b2c, w3c, b3c),
        ):
            y1 = jax.nn.relu(
                jnp.dot(acts, w1[:], preferred_element_type=jnp.float32) + b1[:]
            ).astype(jnp.bfloat16)
            y2 = conv3x3(y1.reshape(h, w, C_MID), w2, b2[:], cols_ref).astype(jnp.bfloat16)
            y3 = jnp.dot(y2, w3[:], preferred_element_type=jnp.float32) + b3[:]
            acts = jax.nn.relu(y3 + acts.astype(jnp.float32)).astype(jnp.bfloat16)

        out_ref[0] = acts.reshape(h, w, C_OUT)

    return kernel


def fused_stage1(x: jnp.ndarray, stage_ops: Tuple[jnp.ndarray, ...],
                 interpret: bool = False) -> jnp.ndarray:
    """Run layer1 (3 fused bottleneck blocks) over (B, h, w, 64) bf16
    (h = w = 56 for the production 224 input). Returns (B, h, w, 256)
    bf16. ``stage_ops`` from `stage1_params_from_variables`."""
    B, h, w, _ = x.shape
    hw = h * w
    weight_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in stage_ops
    ]
    return pl.pallas_call(
        _make_stage1_kernel(h, w),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, h, w, C_IN), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=pl.BlockSpec((1, h, w, C_OUT), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, h, w, C_OUT), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((hw, 9 * C_MID), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(
            flops=B * (
                2 * hw * (C_IN * C_MID + 9 * C_MID * C_MID + C_MID * C_OUT
                          + C_IN * C_OUT)
                + 2 * 2 * hw * (C_OUT * C_MID + 9 * C_MID * C_MID
                                + C_MID * C_OUT)
            ),
            bytes_accessed=B * hw * (C_IN + C_OUT) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, *stage_ops)


def resnet50_fused_infer(trunk_module, variables, x: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """Inference-only trunk forward with the fused layer1 stage: flax for
    stem + layers 2-4 (those already run at/near their rooflines), pallas
    for layer1. Numerically ≡ `trunk_module.apply(variables, x)` in eval
    mode up to bf16 rounding (tests/test_fused_bottleneck.py)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    if "trunk" in params:
        params, stats = params["trunk"], stats["trunk"]
    trunk_vars = {"params": params, "batch_stats": stats}

    stem = trunk_module.apply(trunk_vars, x, part="stem")
    h = fused_stage1(stem.astype(jnp.bfloat16),
                     stage1_params_from_variables(trunk_vars),
                     interpret=interpret)
    return trunk_module.apply(trunk_vars, h, part="tail")
