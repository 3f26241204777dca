"""ResNet-50 feature trunk (flax.linen, NHWC, TPU dtype policy).

Architecturally identical to the reference's redefined torchvision trunk
(ref copenet/models/model_copenet.py:8-110,161-176: Bottleneck [3,4,6,3],
7x7/2 stem, 3x3/2 maxpool, global average pool → 2048-d feature) so that
ImageNet / reference checkpoints convert weight-for-weight, but laid out
TPU-first: NHWC tensors, bf16 compute with f32 params/stats, and the GAP
expressed as a spatial mean so XLA fuses it with the last block.
"""

from functools import partial
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

# torch-style conv init: normal(0, sqrt(2 / fan_out)) — ref model_copenet.py:78-81.
conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class Bottleneck(nn.Module):
    """1x1 → 3x3(stride) → 1x1(×4) with identity/projection shortcut.

    ``act_fq``: STE fake-quant grid for activation-QAT — applied to the
    input of every conv, the exact points the deployed int8 trunk
    quantizes activations (ops/int8_trunk._qconv); None = off. Either a
    float grid (dynamic per-batch abs-max scales) or a
    ``(levels, scales_dict)`` pair with FROZEN calibrated per-site steps
    keyed like int8_trunk.calibrate_act_scales output
    ('layer1_0/conv1' … '/proj') — training then sees the deployed grid
    exactly, clipping included."""

    planes: int
    stride: int = 1
    project: bool = False
    dtype: Any = jnp.float32
    act_fq: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )
        conv = partial(
            nn.Conv, use_bias=False, dtype=self.dtype, kernel_init=conv_init
        )
        if self.act_fq is not None:
            from ..ops.qat import fake_quant_act

            if isinstance(self.act_fq, tuple):
                levels, scales = self.act_fq
            else:
                levels, scales = self.act_fq, None

            def fq(t, site):
                s = None if scales is None else scales[f"{self.name}/{site}"]
                return fake_quant_act(t, levels, scale=s)
        else:
            def fq(t, site):
                return t
        # the identity shortcut carries the UNQUANTIZED activation, exactly
        # like the deployed int8 trunk (int8_trunk: `res = h` dequantized);
        # only conv inputs see the grid
        residual = x
        xq = fq(x, "conv1")
        y = conv(self.planes, (1, 1), name="conv1")(xq)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(
            self.planes,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            name="conv2",
        )(fq(y, "conv2"))
        y = norm(name="bn2")(y)
        y = nn.relu(y)
        y = conv(self.planes * 4, (1, 1), name="conv3")(fq(y, "conv3"))
        y = norm(name="bn3")(y)
        if self.project:
            # the projection quantizes the SAME input tensor under its own
            # calibrated step, exactly like the deployed '{block}/proj'
            # site (identical to conv1's fq in dynamic mode: same tensor,
            # same abs-max)
            residual = conv(
                self.planes * 4,
                (1, 1),
                strides=(self.stride, self.stride),
                name="downsample_conv",
            )(fq(x, "proj"))
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """Input (B, 224, 224, 3) → (B, 2048) GAP feature. The ``part``
    argument exposes the sub-graphs around layer1 so the inference path
    can splice in the pallas fused layer1 stage (ops/fused_bottleneck.py)
    without duplicating parameters."""

    dtype: Any = jnp.float32
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    act_fq: Any = None  # activation-QAT grid (ops/qat.fake_quant_act);
    #                     the stem is excluded, matching deployment

    def _stem(self, x, train: bool):
        x = x.astype(self.dtype)
        x = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=((3, 3), (3, 3)),
            use_bias=False,
            dtype=self.dtype,
            kernel_init=conv_init,
            name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn1",
        )(x)
        x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    def _stages(self, x, train: bool, first_stage: int = 0,
                last_stage: int = 3):
        for stage, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), self.stage_sizes)
        ):
            if stage < first_stage or stage > last_stage:
                continue
            for block in range(blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = Bottleneck(
                    planes=planes,
                    stride=stride,
                    project=(block == 0),
                    dtype=self.dtype,
                    act_fq=self.act_fq,
                    name=f"layer{stage + 1}_{block}",
                )(x, train=train)
        if last_stage < 3:
            return x  # spatial feature map for a spliced execution strategy
        # Global average pool; the feature feeds the f32 IEF regressor.
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)

    @nn.compact
    def __call__(self, x, train: bool = False, part: str = "full"):
        """``part``: 'full' (default), 'stem' ((B,224,224,3) →
        (B,56,56,64) conv1+bn+relu+maxpool), 'front' ((B,224,224,3) →
        (B,56,56,256) stem + layer1), or 'tail' ((B,56,56,256) layer1
        output → (B,2048) layers 2-4 + GAP). The split points let the
        inference path splice in pallas execution strategies (fused bf16
        layer1, int8 layers 2-4) without duplicating parameters."""
        if part in ("full", "stem", "front"):
            x = self._stem(x, train)
            if part == "stem":
                return x
            if part == "front":
                return self._stages(x, train, last_stage=0)
            return self._stages(x, train)
        assert part == "tail", part
        return self._stages(x.astype(self.dtype), train, first_stage=1)
