"""int8 post-training-quantized ResNet-50 inference trunk (experimental).

Motivation: on this chip an int8 matmul runs at 447 TF/s vs 131 bf16
(3.4×) and a layer3-shaped 3×3 conv at 101 vs 65 TF/s. MEASURED OUTCOME on
the full trunk, however (PERF.md): dynamic activation quantization is 2×
slower than bf16 (a reduce + rewrite pass per tensor), and even with the
static calibrated scales this module provides the end-to-end trunk is
10.75 ms vs bf16's 9.59 — XLA does not fuse the quantize casts into conv
epilogues, and int8's (32,128) tile makes the narrow early layers (C=64)
WORSE, eating the late-layer gains. Kept as the tested quantization
scaffold (per-channel PTQ weights + activation calibration), not wired
into any default path; a genuine win needs custom int8 pallas kernels for
layers 3-4 only, or an fp8-native chip.

This module quantizes the SAME flax trunk parameters (BN folded first —
ops/fused_bottleneck.fold_bn_into_conv) into an inference-only execution
strategy:

  * weights: symmetric per-output-channel int8 (scale = max|W|/127 per
    channel) — the standard PTQ recipe for convnets;
  * activations: symmetric per-tensor DYNAMIC int8 (scale from the live
    max|x|), so no calibration dataset is needed;
  * convs accumulate in int32 (`preferred_element_type`), dequantize into
    f32 epilogues (bias, relu, residual adds) that XLA fuses.

The stem conv stays bf16 (C=3 is cheap and quantization-hostile); layers
1-4 run int8. Accuracy is bounded by tests (feature correlation vs the
bf16 trunk and end-to-end pose deltas through the IEF regressor); this is
a serving-path option, never the training path.

Replicates the reference trunk's math (ref copenet/models/
model_copenet.py:53-110,161-176) in eval mode.
"""

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .fused_bottleneck import fold_bn_into_conv


def quantize_weight(kernel: np.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(kh, kw, Cin, Cout) f32 → (int8 kernel, (Cout,) f32 scale),
    symmetric per-output-channel."""
    k = np.asarray(kernel, np.float32)
    scale = np.abs(k).reshape(-1, k.shape[-1]).max(axis=0) / 127.0
    scale = np.maximum(scale, 1e-12)
    q = np.clip(np.rint(k / scale), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(scale, jnp.float32)


def _quantize_act(x: jnp.ndarray, s=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tensor symmetric int8. With a STATIC (calibrated) scale the
    round/clip/cast fuses into the producing op's epilogue; the dynamic
    fallback (s=None) adds a full reduce + rewrite pass per tensor, which
    measured 2× SLOWER end-to-end than bf16 — always calibrate for speed."""
    if s is None:
        s = jnp.maximum(jnp.max(jnp.abs(x)) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return q, s


def _qconv(x: jnp.ndarray, wq: jnp.ndarray, wscale: jnp.ndarray,
           bias: jnp.ndarray, stride: int = 1, padding="SAME",
           act_scale=None, collect=None, name=None) -> jnp.ndarray:
    xq, xs = _quantize_act(x, act_scale)
    if collect is not None:
        collect[name] = xs
    y = jax.lax.conv_general_dilated(
        xq, wq, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * (xs * wscale) + bias


def quantize_trunk_params(variables) -> Dict:
    """Fold BN and quantize every conv of the flax ResNet-50 trunk.
    Accepts full-model variables ({'params': {'trunk': ...}}) or the
    trunk's own."""
    params = variables["params"]
    stats = variables["batch_stats"]
    if "trunk" in params:
        params, stats = params["trunk"], stats["trunk"]

    out: Dict = {}

    def fold_q(p, s, conv, bn):
        k, b = fold_bn_into_conv(
            p[conv]["kernel"], p[bn]["scale"], p[bn]["bias"],
            s[bn]["mean"], s[bn]["var"],
        )
        wq, ws = quantize_weight(k)
        return {"wq": wq, "ws": ws, "b": jnp.asarray(b, jnp.float32)}

    # stem stays bf16: fold BN, keep float kernel
    k, b = fold_bn_into_conv(
        params["conv1"]["kernel"], params["bn1"]["scale"],
        params["bn1"]["bias"], stats["bn1"]["mean"], stats["bn1"]["var"],
    )
    out["stem"] = {"w": jnp.asarray(k, jnp.bfloat16),
                   "b": jnp.asarray(b, jnp.float32)}

    for stage, blocks in enumerate((3, 4, 6, 3), start=1):
        for blk in range(blocks):
            name = f"layer{stage}_{blk}"
            p, s = params[name], stats[name]
            q = {
                "conv1": fold_q(p, s, "conv1", "bn1"),
                "conv2": fold_q(p, s, "conv2", "bn2"),
                "conv3": fold_q(p, s, "conv3", "bn3"),
                "stride": 2 if (stage > 1 and blk == 0) else 1,
            }
            if "downsample_conv" in p:
                q["proj"] = fold_q(p, s, "downsample_conv", "downsample_bn")
            out[name] = q
    return out


def resnet50_int8_infer(qparams: Dict, x: jnp.ndarray,
                        act_scales: Dict = None,
                        _collect: Dict = None) -> jnp.ndarray:
    """(B, 224, 224, 3) f32 → (B, 2048) f32 GAP feature, int8 conv path.

    ``act_scales`` (from `calibrate_act_scales`) makes activation
    quantization static — required for the speed win; without it the
    dynamic fallback is correct but slow (see _quantize_act)."""
    stem = qparams["stem"]
    h = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), stem["w"], (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32) + stem["b"]
    h = jax.nn.relu(h)
    # 3x3/2 maxpool
    h = jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )

    def scale(name):
        return None if act_scales is None else act_scales[name]

    for stage, blocks in enumerate((3, 4, 6, 3), start=1):
        for blk in range(blocks):
            bname = f"layer{stage}_{blk}"
            q = qparams[bname]
            stride = q["stride"]
            if "proj" in q:
                res = _qconv(h, q["proj"]["wq"], q["proj"]["ws"],
                             q["proj"]["b"], stride=stride,
                             act_scale=scale(f"{bname}/proj"),
                             collect=_collect, name=f"{bname}/proj")
            else:
                res = h
            y = jax.nn.relu(_qconv(h, q["conv1"]["wq"], q["conv1"]["ws"],
                                   q["conv1"]["b"],
                                   act_scale=scale(f"{bname}/conv1"),
                                   collect=_collect, name=f"{bname}/conv1"))
            y = jax.nn.relu(_qconv(y, q["conv2"]["wq"], q["conv2"]["ws"],
                                   q["conv2"]["b"], stride=stride,
                                   act_scale=scale(f"{bname}/conv2"),
                                   collect=_collect, name=f"{bname}/conv2"))
            y = _qconv(y, q["conv3"]["wq"], q["conv3"]["ws"], q["conv3"]["b"],
                       act_scale=scale(f"{bname}/conv3"),
                       collect=_collect, name=f"{bname}/conv3")
            h = jax.nn.relu(y + res)

    return jnp.mean(h, axis=(1, 2))


def calibrate_act_scales(qparams: Dict, sample_x: jnp.ndarray) -> Dict:
    """One forward over a representative batch with dynamic quantization,
    recording every conv input's per-tensor scale. The returned table makes
    subsequent `resnet50_int8_infer` calls fully static (no reduces)."""
    collect: Dict = {}
    resnet50_int8_infer(qparams, sample_x, act_scales=None, _collect=collect)
    return {k: jnp.asarray(float(v), jnp.float32) for k, v in collect.items()}
