"""int8 post-training-quantized ResNet-50 inference trunk — the measured
1.38× serving execution strategy (PERF.md).

MEASURED on one v5e chip, batch 128 @224 (after two fixes that initially
masked the win — f32 inter-conv activation carriage (+2.6 ms of HBM
traffic) and lax "SAME" padding shifting stride-2 convs one pixel vs the
reference): full-int8 trunk 6.55 ms vs bf16 9.08 (1.39×, monotone per
added int8 stage: layers {4}→8.70, {3,4}→7.93, {2,3,4}→7.06, all→6.55);
end-to-end two-view perception step 7.02 ms vs 9.68 (1.38×, 9,113
two-view fps) at feature correlation 0.9997 / IEF pose mean-abs-delta
≈1.7% of pose RMS on random weights (trained nets quantize better).
Dynamic (uncalibrated) activation scales stay 2× slower — a reduce +
rewrite pass per tensor; ALWAYS calibrate for speed.

This module quantizes the SAME flax trunk parameters (BN folded first —
ops/fused_bottleneck.fold_bn_into_conv) into an inference-only execution
strategy:

  * weights: symmetric per-output-channel int8 (scale = max|W|/127 per
    channel) — the standard PTQ recipe for convnets;
  * activations: symmetric per-tensor int8, static scales calibrated once
    (`calibrate_act_scales`); a dynamic fallback needs no data;
  * convs accumulate in int32 (`preferred_element_type`), dequantize into
    f32 epilogues (bias, relu, residual adds) that XLA fuses, and carry
    bf16 between ops;
  * per-stage mixing (`int8_stages`) for accuracy/speed trade-offs; the
    stem always stays bf16 (C=3 is cheap and quantization-hostile).

Accuracy is bounded by tests (feature correlation vs the bf16 trunk and
end-to-end pose deltas through the IEF regressor); this is the
serving/bench path (`twoview_int8_forward`), never the training path.

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


def _quantize_act(x: jnp.ndarray, s=None, clip_collect=None,
                  name=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tensor symmetric int8. With a STATIC (calibrated) scale the
    round/clip/cast fuses into the producing op's epilogue; the dynamic
    fallback (s=None) adds a full reduce + rewrite pass per tensor, which
    measured 2× SLOWER end-to-end than bf16 — always calibrate for speed.

    ``clip_collect`` (diagnostics only, never on the hot path) records the
    fraction of values saturating at ±127·s for this tensor — the
    calibration-sensitivity signal (`calibration_clip_rates`)."""
    x = x.astype(jnp.float32)  # quantize math in f32 (bf16 ulp @127 ≈ 0.5)
    if s is None:
        s = jnp.maximum(jnp.max(jnp.abs(x)) / 127.0, 1e-12)
    elif clip_collect is not None:
        # saturation boundary: |x| ≤ 127.5·s still rounds to ±127 exactly,
        # so only beyond that does the clip change the quantized value
        clip_collect[name] = jnp.mean(
            (jnp.abs(x) > 127.5 * s).astype(jnp.float32))
    q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return q, s


def _pad_for(w) -> tuple:
    """3×3 convs pad (1,1)/(1,1) EXPLICITLY — lax "SAME" at stride 2
    would pad (0,1), a one-pixel shift vs the reference trunk
    (torchvision pads 1 on both sides; ref model_copenet.py:34-36)."""
    return ((1, 1), (1, 1)) if w.shape[0] == 3 else "VALID"


def _qconv(x: jnp.ndarray, wq: jnp.ndarray, wscale: jnp.ndarray,
           bias: jnp.ndarray, stride: int = 1,
           act_scale=None, collect=None, clip_collect=None,
           name=None) -> jnp.ndarray:
    xq, xs = _quantize_act(x, act_scale, clip_collect=clip_collect, name=name)
    if collect is not None:
        collect[name] = xs
    y = jax.lax.conv_general_dilated(
        xq, wq, (stride, stride), _pad_for(wq),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    # epilogue in f32, activations carried bf16: f32 inter-conv tensors
    # measured +2.6 ms/step on the full trunk (HBM traffic, PERF.md)
    return (y.astype(jnp.float32) * (xs * wscale) + bias).astype(
        jnp.bfloat16)


def quantize_trunk_params(variables, trunk_key: str = "trunk") -> Dict:
    """Fold BN and quantize every conv of the flax ResNet-50 trunk.
    Accepts full-model variables ({'params': {<trunk_key>: ...}}) or the
    trunk's own (``trunk_key`` selects among multiple trunks, e.g.
    "trunk0"/"trunk1" of the per-drone sep models). Each conv entry also
    keeps the folded bf16 kernel (`wf`) so inference can mix int8 and
    bf16 stages (`resnet50_int8_infer(int8_stages=...)`)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    if trunk_key in params:
        params, stats = params[trunk_key], stats[trunk_key]

    out: Dict = {}

    def fold_q(p, s, conv, bn):
        k, b = fold_bn_into_conv(
            p[conv]["kernel"], p[bn]["scale"], p[bn]["bias"],
            s[bn]["mean"], s[bn]["var"],
        )
        wq, ws = quantize_weight(k)
        return {"wq": wq, "ws": ws, "b": jnp.asarray(b, jnp.float32),
                "wf": jnp.asarray(k, jnp.bfloat16)}

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
            }
            if "downsample_conv" in p:
                q["proj"] = fold_q(p, s, "downsample_conv", "downsample_bn")
            out[name] = q
    return out


def _fconv(x: jnp.ndarray, wf: jnp.ndarray, bias: jnp.ndarray,
           stride: int = 1) -> jnp.ndarray:
    """Folded-BN bf16 conv + bias — the eval-mode flax trunk's math for
    stages kept OUT of int8 in a mixed-precision trunk."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), wf, (stride, stride), _pad_for(wf),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return (y.astype(jnp.float32) + bias).astype(jnp.bfloat16)


def resnet50_int8_infer(qparams: Dict, x: jnp.ndarray,
                        act_scales: Dict = None,
                        _collect: Dict = None,
                        _clip_collect: Dict = None,
                        int8_stages=(1, 2, 3, 4)) -> jnp.ndarray:
    """(B, 224, 224, 3) f32 → (B, 2048) f32 GAP feature, int8 conv path.

    ``act_scales`` (from `calibrate_act_scales`) makes activation
    quantization static — required for the speed win; without it the
    dynamic fallback is correct but slow (see _quantize_act).

    ``int8_stages`` selects which residual stages run int8; the others
    run the folded-BN bf16 convs (numerically ≡ the flax trunk in eval
    mode). Per-stage mixing exists because int8's (32,128) tiling hurts
    the narrow early stages — the PERF.md sweep measures each subset."""
    stem = qparams["stem"]
    h = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), stem["w"], (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    h = jax.nn.relu((h.astype(jnp.float32) + stem["b"]).astype(jnp.bfloat16))
    # 3x3/2 maxpool
    h = jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )

    def scale(name):
        return None if act_scales is None else act_scales[name]

    for stage, blocks in enumerate((3, 4, 6, 3), start=1):
        int8 = stage in int8_stages
        for blk in range(blocks):
            bname = f"layer{stage}_{blk}"
            q = qparams[bname]
            # static (not stored in qparams: ints would trace under jit)
            stride = 2 if (stage > 1 and blk == 0) else 1
            if "proj" in q:
                res = (_qconv(h, q["proj"]["wq"], q["proj"]["ws"],
                              q["proj"]["b"], stride=stride,
                              act_scale=scale(f"{bname}/proj"),
                              collect=_collect, clip_collect=_clip_collect,
                              name=f"{bname}/proj")
                       if int8 else
                       _fconv(h, q["proj"]["wf"], q["proj"]["b"], stride))
            else:
                res = h
            if int8:
                y = jax.nn.relu(
                    _qconv(h, q["conv1"]["wq"], q["conv1"]["ws"],
                           q["conv1"]["b"],
                           act_scale=scale(f"{bname}/conv1"),
                           collect=_collect, clip_collect=_clip_collect,
                           name=f"{bname}/conv1"))
                y = jax.nn.relu(
                    _qconv(y, q["conv2"]["wq"], q["conv2"]["ws"],
                           q["conv2"]["b"], stride=stride,
                           act_scale=scale(f"{bname}/conv2"),
                           collect=_collect, clip_collect=_clip_collect,
                           name=f"{bname}/conv2"))
                y = _qconv(y, q["conv3"]["wq"], q["conv3"]["ws"],
                           q["conv3"]["b"],
                           act_scale=scale(f"{bname}/conv3"),
                           collect=_collect, clip_collect=_clip_collect,
                           name=f"{bname}/conv3")
            else:
                y = jax.nn.relu(_fconv(h, q["conv1"]["wf"], q["conv1"]["b"]))
                y = jax.nn.relu(_fconv(y, q["conv2"]["wf"], q["conv2"]["b"],
                                       stride))
                y = _fconv(y, q["conv3"]["wf"], q["conv3"]["b"])
            h = jax.nn.relu(y + res)

    return jnp.mean(h.astype(jnp.float32), axis=(1, 2))


def twoview_int8_forward(model, variables, qparams: Dict, act_scales: Dict,
                         images: jnp.ndarray, bb: jnp.ndarray,
                         init_position: jnp.ndarray,
                         int8_stages=(1, 2, 3, 4), **kwargs):
    """AirPose two-view forward with the int8 PTQ trunk (measured 1.39×
    the bf16 trunk on v5e, PERF.md): int8 feature extraction +
    `from_features` IEF regression over the SAME flax variables. The
    serving/bench execution strategy; training always uses the flax
    trunk."""
    B, V = images.shape[:2]
    xf = resnet50_int8_infer(
        qparams, images.reshape((B * V,) + images.shape[2:]),
        act_scales=act_scales, int8_stages=int8_stages,
    ).reshape(B, V, -1)
    return model.apply(variables, xf, bb, init_position,
                       method=type(model).from_features, **kwargs)


class Int8Inference:
    """Model-like shim whose ``apply`` routes any family's eval-mode
    forward through the int8 trunk — a drop-in for the `model` argument
    of the `train/loop` step-fn factories on INFERENCE paths (the eval
    CLI's --int8 accuracy measurement). Quantize + calibrate up front
    (outside jit: the step fns trace `apply`).

    Works for every model family because they all share the shape
    `xf = trunk(images); from_features(xf, *family_args)`:
      * single-view input (B, H, W, 3) → features (B, 2048);
      * view-folded input (B, 2, H, W, 3) → features (B, 2, 2048);
      * per-drone trunk0/trunk1 (`_sep`): each trunk quantized and
        calibrated separately, per-view features stacked."""

    def __init__(self, model, variables, sample_images: jnp.ndarray,
                 int8_stages=(1, 2, 3, 4)):
        self.model = model
        self.int8_stages = tuple(int8_stages)
        self.sep = "trunk0" in variables["params"]
        keys = ("trunk0", "trunk1") if self.sep else ("trunk",)
        self.qparams = [quantize_trunk_params(variables, k) for k in keys]
        self.act_scales = [calibrate_act_scales(qp, sample_images)
                           for qp in self.qparams]

    def _features(self, images: jnp.ndarray) -> jnp.ndarray:
        if self.sep:
            return jnp.stack(
                [resnet50_int8_infer(self.qparams[v], images[:, v],
                                     act_scales=self.act_scales[v],
                                     int8_stages=self.int8_stages)
                 for v in (0, 1)],
                axis=1,
            )
        if images.ndim == 5:  # view-folded (B, V, H, W, 3)
            B, V = images.shape[:2]
            return resnet50_int8_infer(
                self.qparams[0], images.reshape((B * V,) + images.shape[2:]),
                act_scales=self.act_scales[0],
                int8_stages=self.int8_stages,
            ).reshape(B, V, -1)
        return resnet50_int8_infer(
            self.qparams[0], images, act_scales=self.act_scales[0],
            int8_stages=self.int8_stages)

    def apply(self, variables, images, *args, iters=None, train=False,
              **kwargs):
        if train or kwargs.pop("mutable", None):
            raise ValueError("the int8 trunk is inference-only")
        return self.model.apply(
            variables, self._features(images), *args,
            method=type(self.model).from_features, iters=iters, **kwargs)

    def clip_report(self, images: jnp.ndarray) -> Dict:
        """Per-tensor activation clip fractions of ``images`` under this
        shim's calibrated scales (`calibration_clip_rates`) — merged over
        trunks for _sep models. Diagnostics for calibration adequacy."""
        out: Dict = {}
        if self.sep:
            for v in (0, 1):
                rates = calibration_clip_rates(
                    self.qparams[v], self.act_scales[v], images[:, v],
                    int8_stages=self.int8_stages)
                out.update({f"trunk{v}/{k}": r for k, r in rates.items()})
            return out
        if images.ndim == 5:
            images = images.reshape((-1,) + images.shape[2:])
        return calibration_clip_rates(
            self.qparams[0], self.act_scales[0], images,
            int8_stages=self.int8_stages)


# original (two-view-only) name, kept as an alias
Int8TwoView = Int8Inference


def calibrate_act_scales(qparams: Dict, sample_x: jnp.ndarray) -> Dict:
    """One forward over a representative batch with dynamic quantization,
    recording every conv input's per-tensor scale. The returned table makes
    subsequent `resnet50_int8_infer` calls fully static (no reduces).

    Calibration-set size matters: a per-tensor max over too few frames
    under-estimates scales on data with exposure/contrast swings and the
    deployed path then saturates — measure with `calibration_clip_rates`
    on held-out frames and recalibrate with more samples if the max clip
    fraction is large."""
    collect: Dict = {}
    resnet50_int8_infer(qparams, sample_x, act_scales=None, _collect=collect)
    return {k: jnp.asarray(float(v), jnp.float32) for k, v in collect.items()}


def calibration_clip_rates(qparams: Dict, act_scales: Dict,
                           x: jnp.ndarray,
                           int8_stages=(1, 2, 3, 4)) -> Dict:
    """Per-tensor fraction of activation values saturating at ±127·scale
    when ``x`` runs through the calibrated int8 trunk — THE calibration
    sensitivity diagnostic. Rates ≈ 0 on representative frames mean the
    calibration set covered the activation range; a tensor with a large
    rate (≳1e-2) is being clipped and its scale came from an
    unrepresentative sample. Diagnostics only (extra reduces per tensor);
    never on the serving hot path."""
    collect: Dict = {}
    resnet50_int8_infer(qparams, x, act_scales=act_scales,
                        _clip_collect=collect, int8_stages=int8_stages)
    return {k: float(v) for k, v in collect.items()}
