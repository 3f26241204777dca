"""Quantization-aware training (QAT): straight-through fake-quant of the
trunk conv kernels inside the train step.

The deployment path quantizes the BN-folded trunk convs to symmetric
per-output-channel int8 (ops/int8_trunk.quantize_trunk_params). PTQ on
this model family measured accuracy-free (PERF.md), but if a checkpoint
ever quantizes badly there must be a recovery path: train (or
`--train_reg_only`-style fine-tune) THROUGH the quantizer so the weights
(or the downstream heads) adapt to the deployment grid.

Mechanics — the classic straight-through estimator (STE):

    q(W) = clip(round(W / s), ±L) · s,   s = max|W[...,c]| / L per channel
    forward sees q(W); backward sees identity (W + stop_grad(q(W) − W))

Per-channel fake-quant on the UNFOLDED kernel models the deployed
(BN-folded) quantization EXACTLY for the weight part: folding multiplies
each output channel by f_c = γ_c/σ_c, which rescales that channel's quant
scale by |f_c| and flips signs symmetrically — the quantization error
commutes with the fold (tested: fold∘q ≡ q∘fold in
tests/test_qat.py).

Activation quantization has its own (opt-in) fake-quant: `--qat_act`
applies per-tensor STE fake-quant (`fake_quant_act`) at the SAME points
the deployed int8 trunk quantizes activations — the input of every
residual-stage conv (ops/int8_trunk._qconv). The train-time scale is the
dynamic per-batch abs-max, the training analogue of the deployed static
calibrated scale (same grid formula as int8_trunk._quantize_act); it
models the rounding error of activation quantization, which is the
dominant error mode whenever calibration is adequate (clip rates ≈ 0 —
the printed diagnostic). BN runs in train mode upstream of each
fake-quant, so the activation distribution the quantizer sees converges
to the eval-mode one as the running stats do.

The stem conv is excluded — deployment keeps it bf16
(ops/int8_trunk.py: "the stem always stays bf16").

No reference counterpart (the reference serves fp32); this is the
framework's own deployment story. Wired in as `TrainConfig.qat` →
`--qat` on the trainer CLI.
"""

import jax
import jax.numpy as jnp

TRUNK_KEYS = ("trunk", "trunk0", "trunk1")


def fake_quant_weight(k: jnp.ndarray, levels: float = 127.0) -> jnp.ndarray:
    """Symmetric per-output-channel fake quantization with a straight-
    through gradient. ``levels`` = 127 is the int8 deployment grid; tests
    use coarser grids to make degradation measurable."""
    flat = jnp.abs(k).reshape(-1, k.shape[-1])
    scale = jnp.maximum(jnp.max(flat, axis=0) / levels, 1e-12)
    q = jnp.clip(jnp.round(k / scale), -levels, levels) * scale
    return k + jax.lax.stop_gradient(q - k)


def fake_quant_act(x: jnp.ndarray, levels: float = 127.0,
                   scale=None) -> jnp.ndarray:
    """Per-tensor symmetric STE fake-quant of an activation.

    ``scale=None``: dynamic abs-max scale (stop-gradded), the train-time
    analogue of the deployed static calibrated per-tensor scale; grid
    formula ≡ int8_trunk._quantize_act. ``scale`` given: the FROZEN
    calibrated step (int8_trunk.calibrate_act_scales output) — training
    then sees the deployed grid exactly, including its CLIPPING at
    ±levels·scale, which dynamic abs-max never models. Keeps the input
    dtype (the trunk carries bf16 between ops) but quantizes in f32 —
    bf16 ulp at 127 is ~0.5."""
    xf = x.astype(jnp.float32)
    if scale is None:
        s = jnp.maximum(
            jax.lax.stop_gradient(jnp.max(jnp.abs(xf))) / levels, 1e-12
        )
    else:
        s = jnp.maximum(jnp.asarray(scale, jnp.float32), 1e-12)
    q = jnp.clip(jnp.round(xf / s), -levels, levels) * s
    return (xf + jax.lax.stop_gradient(q - xf)).astype(x.dtype)


def fake_quant_trunk_params(params, levels: float = 127.0):
    """Apply STE fake-quant to every residual-stage conv kernel of the
    trunk(s) in a full param tree (`trunk` or the _sep `trunk0`/`trunk1`).
    Heads, BN affine params, and the stem stay untouched — exactly the
    tensors deployment quantizes (ops/int8_trunk.quantize_trunk_params)."""

    def visit(path, leaf):
        keys = [getattr(p, "key", str(p)) for p in path]
        if (
            len(keys) >= 4
            and keys[0] in TRUNK_KEYS
            and keys[1].startswith("layer")
            and (keys[2].startswith("conv") or keys[2] == "downsample_conv")
            and keys[-1] == "kernel"
        ):
            return fake_quant_weight(leaf, levels)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params)
