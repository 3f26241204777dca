"""Pallas int8 fused ResNet bottleneck blocks (layers 2-4 VMEM-resident).

MEASURED OUTCOME (PERF.md): numerically excellent (feature correlation
0.99976 vs the bf16 trunk ON HARDWARE) but SLOWER than both bf16 XLA and
the fixed XLA int8 path (`ops/int8_trunk.py`, now the production 1.38×
strategy): this chain measured 14.4 ms vs bf16's 9.2 at B=128. Root
cause isolated with bare-matmul A/Bs: on this jaxlib/Mosaic toolchain a
pallas matmul reaches only ~133 TF/s int8 / ~86 bf16 where XLA's reaches
207 / 188 on identical shapes — XLA's conv/dot pipelining cannot
currently be beaten from pallas on this hardware, so kernel fusion wins
(~0.3 ms of cast traffic saved) are swamped by the ~1.6× matmul deficit.
The module stays as the TESTED template for Mosaic int8 convolution
kernels (quantize→im2col-conv→dequant→relu→requant fused in VMEM,
phase-split stride-2) should the Mosaic matmul gap close; every block
kind is verified element-exact against a lax transcription
(tests/test_int8_bottleneck.py).

Design notes (kept accurate for reuse):

  * one pallas kernel per bottleneck block keeps the ENTIRE
    quantize → conv → dequant → relu → requant chain in VMEM; the only
    HBM traffic is the block's int8 input and int8 output (half the
    bf16 path's activation bytes);
  * only layers 2-4 run int8 (C_mid ≥ 128 fills the MXU lanes); the stem
    and layer1 stay bf16 flax — the measured lesson from int8_trunk;
  * all activation scales are STATIC (calibrated via
    `int8_trunk.calibrate_act_scales`), so requantization is a
    per-channel f32 multiply folded into the conv epilogue — no reduces.

Quantization scheme (matches `ops/int8_trunk.py` so its calibration and
accuracy tests carry over): symmetric per-output-channel int8 weights
(BN folded first), symmetric per-tensor int8 activations, int32 MXU
accumulation. Per conv, the host precomputes
    m[c] = s_in · s_w[c] / s_out      (requant multiplier)
    b[c] = bias[c] / s_out
so the kernel's epilogue is `clip(round(relu(acc·m + b)), 0, 127)`.
The residual add happens in f32 in units of the block's output scale
(identity shortcut: x_int8 · s_in/s_out; projection: its own m/b).

The 3×3 conv is a single im2col MXU matmul per block —
(G·h·w, 9·C_mid) @ (9·C_mid, C_mid) — with the column matrix staged
through a VMEM scratch (same strategy as `ops/fused_bottleneck.py`).
Stride-2 (projection) blocks need strided activation taps, which Mosaic
cannot lower (rank-4 strided slice → "only 2D gather"); instead the
CALLER parity-splits the block input into the 4 stride-2 phase planes
(an XLA copy pass, ~0.1 ms/block), conv1 runs per plane, and every 3×3
stride-2 tap becomes an UNstrided ±1-shifted slice of one phase plane:
output row 2i+di-1 lives in row-phase (di+1)%2 at index i-(di==0). The
projection shortcut reads phase (0,0) directly.

This is an inference-time execution strategy over the SAME flax trunk
parameters (ref copenet/models/model_copenet.py:53-110,161-176 in eval
mode, BN running stats); production serving uses `ops/int8_trunk.py`.
"""

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_bottleneck import fold_bn_into_conv
from .int8_trunk import quantize_weight

@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class BlockMeta:
    """Static block attributes — kept out of the traced pytree so a
    quantized-block dict can be passed straight through `jax.jit`."""
    stage: int
    stride: int
    out_int8: bool


# Images per grid step, chosen to keep each step's VMEM residency
# (input + cols scratch + int32 accumulators + weights) well under
# 16 MB/core while giving the MXU a deep M dimension.
_GROUP = {
    # (stage, identity?) -> G
    (2, False): 1, (2, True): 2,
    (3, False): 2, (3, True): 4,
    (4, False): 4, (4, True): 8,
}


def _shifted(plane, h: int, w: int, si: int, sj: int):
    """A (G, h, w, C) phase plane read at spatial offset (si, sj) ∈
    {-1, 0}², zero-filled where the shift falls off the top/left edge —
    the unstrided form of a stride-2 tap."""
    if si:
        plane = jnp.pad(plane, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :h]
    if sj:
        plane = jnp.pad(plane, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :w]
    return plane


def _requant(acc, m, b):
    """int32 conv accumulator → relu → int8 in the next conv's scale.
    `m`/`b` are per-output-channel f32 rows; relu makes the clip lower
    bound 0."""
    y = jax.nn.relu(acc.astype(jnp.float32) * m + b)
    return jnp.clip(jnp.round(y), 0.0, 127.0).astype(jnp.int8)


def _epilogue(y3, res, out_ref, G, h, w, cout, out_int8):
    out = jax.nn.relu(y3 + res)
    if out_int8:
        out = jnp.clip(jnp.round(out), 0.0, 127.0).astype(jnp.int8)
    else:
        out = out.astype(jnp.bfloat16)
    out_ref[...] = out.reshape(G, h, w, cout)


def _conv23(y1_taps, w2, m2, b2, w3, m3, b3, cols_ref, cmid):
    """im2col conv2 (ONE (·, 9·cmid)-deep MXU matmul — keeps the MXU
    full, per fused_bottleneck's measured comparison vs 9 shift-matmuls)
    + 1×1 conv3 → f32 in s_out units (no relu before the residual)."""
    M = cols_ref.shape[0]
    for k, tap in enumerate(y1_taps):
        cols_ref[:, k * cmid:(k + 1) * cmid] = tap.reshape(M, cmid)
    acc2 = jnp.dot(cols_ref[...], w2[...], preferred_element_type=jnp.int32)
    y2 = _requant(acc2, m2[...], b2[...])
    acc3 = jnp.dot(y2, w3[...], preferred_element_type=jnp.int32)
    return acc3.astype(jnp.float32) * m3[...] + b3[...]


def _make_identity_kernel(G: int, h: int, w: int, cin: int, cmid: int,
                          cout: int, out_int8: bool):
    """Stride-1 identity-shortcut block over G images: input/output
    blocks (G, h, w, cin=cout) int8 (bf16 out for the trunk-final block,
    which feeds the f32 GAP directly)."""
    hw = h * w

    def kernel(x_ref, w1, m1, b1, w2, m2, b2, w3, m3, b3, r_ref,
               out_ref, cols_ref):
        x = x_ref[...].reshape(G * hw, cin)
        acc1 = jnp.dot(x, w1[...], preferred_element_type=jnp.int32)
        y1 = _requant(acc1, m1[...], b1[...]).reshape(G, h, w, cmid)
        pad = jnp.pad(y1, ((0, 0), (1, 1), (1, 1), (0, 0)))
        taps = [pad[:, di:di + h, dj:dj + w, :]
                for di in range(3) for dj in range(3)]
        y3 = _conv23(taps, w2, m2, b2, w3, m3, b3, cols_ref, cmid)
        res = x.astype(jnp.float32) * r_ref[0, 0]
        _epilogue(y3, res, out_ref, G, h, w, cout, out_int8)

    return kernel


def _make_proj_kernel(G: int, h: int, w: int, cin: int, cmid: int,
                      cout: int, out_int8: bool):
    """Stride-2 projection block over G images. The input arrives as the
    4 stride-2 phase planes (4, G, h, w, cin) int8 (phase p = 2a+b:
    rows a::2, cols b::2 of the (2h, 2w) input). conv1 runs per plane;
    the 3×3 stride-2 taps and the 1×1/2 shortcut then need only
    unstrided shifted reads:
      output row 2i+di-1 (pad 1) ⇒ row-phase (di+1)%2, shift -(di==0)."""
    hw = h * w

    def kernel(xp_ref, w1, m1, b1, w2, m2, b2, w3, m3, b3, wp, mp, bp,
               out_ref, cols_ref):
        # conv1 on each phase plane → int8 y1 phases, in s_y1 units
        y1p = []
        for p in range(4):
            acc = jnp.dot(xp_ref[p].reshape(G * hw, cin), w1[...],
                          preferred_element_type=jnp.int32)
            y1p.append(
                _requant(acc, m1[...], b1[...]).reshape(G, h, w, cmid))
        taps = []
        for di in range(3):
            a, si = (di + 1) % 2, -(di == 0)
            for dj in range(3):
                b, sj = (dj + 1) % 2, -(dj == 0)
                taps.append(_shifted(y1p[2 * a + b], h, w, si, sj))
        y3 = _conv23(taps, w2, m2, b2, w3, m3, b3, cols_ref, cmid)
        # 1×1 stride-2 projection shortcut reads phase (0,0)
        accp = jnp.dot(xp_ref[0].reshape(G * hw, cin), wp[...],
                       preferred_element_type=jnp.int32)
        res = accp.astype(jnp.float32) * mp[...] + bp[...]
        _epilogue(y3, res, out_ref, G, h, w, cout, out_int8)

    return kernel


def int8_block(x: jnp.ndarray, blk: Dict, interpret: bool = False,
               group: int = None) -> jnp.ndarray:
    """Run one quantized bottleneck block over (B, H, W, cin) int8.
    Returns (B, h, w, cout) int8 (bf16 for the trunk-final block).
    ``blk`` from `quantize_trunk_pallas`."""
    B, H, W, cin = x.shape
    meta: BlockMeta = blk["meta"]
    stride, project = meta.stride, "wp" in blk
    h, w = H // stride, W // stride
    cmid = blk["w1"].shape[1]
    cout = blk["w3"].shape[1]
    out_int8 = meta.out_int8
    G = group or _GROUP[(meta.stage, not project)]
    G = min(G, B)
    padB = (-B) % G
    if padB:
        x = jnp.pad(x, ((0, padB), (0, 0), (0, 0), (0, 0)))
    Bp = B + padB

    ops: List[jnp.ndarray] = [
        blk["w1"], blk["m1"], blk["b1"],
        blk["w2"], blk["m2"], blk["b2"],
        blk["w3"], blk["m3"], blk["b3"],
    ]
    specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in ops]
    if project:
        # stride-2 phase split (p = 2a+b ↦ x[:, a::2, b::2]) happens here
        # in XLA — a copy pass Mosaic's DMA can then block-fetch
        # unstrided; strided in-kernel taps do not lower (rank-4 gather)
        x = jnp.stack([x[:, a::2, b::2, :]
                       for a in range(2) for b in range(2)])
        kernel = _make_proj_kernel(G, h, w, cin, cmid, cout, out_int8)
        x_spec = pl.BlockSpec((4, G, h, w, cin), lambda i: (0, i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        ops += [blk["wp"], blk["mp"], blk["bp"]]
        specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
    else:
        kernel = _make_identity_kernel(G, h, w, cin, cmid, cout, out_int8)
        x_spec = pl.BlockSpec((G, H, W, cin), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        ops.append(blk["r"].reshape(1, 1))
        specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM))

    out = pl.pallas_call(
        kernel,
        grid=(Bp // G,),
        in_specs=[x_spec, *specs],
        out_specs=pl.BlockSpec((G, h, w, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (Bp, h, w, cout), jnp.int8 if out_int8 else jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((G * h * w, 9 * cmid), jnp.int8)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * h * w * (
                stride * stride * cin * cmid + 9 * cmid * cmid
                + cmid * cout + (cin * cout if project else 0)),
            bytes_accessed=Bp * (H * W * cin + h * w * cout),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, *ops)
    return out[:B] if padB else out


def quantize_trunk_pallas(variables, act_scales: Dict) -> Dict:
    """Fold BN + quantize layers 2-4 of the flax ResNet-50 trunk into the
    pallas block operands. ``act_scales`` from
    `int8_trunk.calibrate_act_scales` (per-tensor conv-input scales);
    layer-1 scales in the table are ignored (the front stays bf16).

    Returns {"s_in": f32 scale for quantizing the bf16 front output,
    "blocks": [block operand dicts, in execution order]}."""
    params = variables["params"]
    stats = variables["batch_stats"]
    if "trunk" in params:
        params, stats = params["trunk"], stats["trunk"]

    def fold_q(p, s, conv, bn):
        k, b = fold_bn_into_conv(
            p[conv]["kernel"], p[bn]["scale"], p[bn]["bias"],
            s[bn]["mean"], s[bn]["var"],
        )
        wq, ws = quantize_weight(k)
        return np.asarray(wq), np.asarray(ws, np.float32), \
            np.asarray(b, np.float32)

    names = [(stage, blk)
             for stage, blocks in ((2, 4), (3, 6), (4, 3))
             for blk in range(blocks)]
    blocks = []
    for idx, (stage, blk) in enumerate(names):
        bname = f"layer{stage}_{blk}"
        p, s = params[bname], stats[bname]
        s_in = float(act_scales[f"{bname}/conv1"])
        s_y1 = float(act_scales[f"{bname}/conv2"])
        s_y2 = float(act_scales[f"{bname}/conv3"])
        if idx + 1 < len(names):
            nstage, nblk = names[idx + 1]
            s_out = float(act_scales[f"layer{nstage}_{nblk}/conv1"])
            out_int8 = True
        else:
            s_out = 1.0  # trunk-final: bf16 out, straight into the GAP
            out_int8 = False

        w1, ws1, b1 = fold_q(p, s, "conv1", "bn1")
        w2, ws2, b2 = fold_q(p, s, "conv2", "bn2")
        w3, ws3, b3 = fold_q(p, s, "conv3", "bn3")
        out = {
            "meta": BlockMeta(stage=stage, stride=2 if blk == 0 else 1,
                              out_int8=out_int8),
            "w1": jnp.asarray(w1[0, 0]),
            "m1": jnp.asarray(s_in * ws1 / s_y1),
            "b1": jnp.asarray(b1 / s_y1),
            # 3×3 kernel pre-reshaped to im2col form (9·cmid, cmid),
            # tap-major to match the kernel's column layout
            "w2": jnp.asarray(
                w2.reshape(9 * w2.shape[2], w2.shape[3])),
            "m2": jnp.asarray(s_y1 * ws2 / s_y2),
            "b2": jnp.asarray(b2 / s_y2),
            "w3": jnp.asarray(w3[0, 0]),
            "m3": jnp.asarray(s_y2 * ws3 / s_out),
            "b3": jnp.asarray(b3 / s_out),
        }
        if blk == 0:
            wp, wsp, bp = fold_q(p, s, "downsample_conv", "downsample_bn")
            out["wp"] = jnp.asarray(wp[0, 0])
            out["mp"] = jnp.asarray(s_in * wsp / s_out)
            out["bp"] = jnp.asarray(bp / s_out)
        else:
            out["r"] = jnp.asarray(s_in / s_out, jnp.float32)
        blocks.append(out)
    return {"s_in": jnp.asarray(float(act_scales["layer2_0/conv1"]),
                                jnp.float32),
            "blocks": blocks}


def resnet50_int8_pallas_infer(trunk_module, variables, pblocks: Dict,
                               x: jnp.ndarray,
                               interpret: bool = False) -> jnp.ndarray:
    """(B, 224, 224, 3) f32 → (B, 2048) f32 GAP feature: flax bf16 for
    stem + layer1 (narrow channels — int8 measured slower there), pallas
    int8 blocks for layers 2-4. ``pblocks`` from `quantize_trunk_pallas`.

    The front→int8 quantize is a static-scale elementwise pass XLA fuses
    into layer1's final relu epilogue (per-TENSOR, once — not the
    per-conv rewrite that sank the pure-XLA int8 path)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    if "trunk" in params:
        params, stats = params["trunk"], stats["trunk"]
    front = trunk_module.apply({"params": params, "batch_stats": stats},
                               x, part="front")
    h = jnp.clip(jnp.round(front.astype(jnp.float32) / pblocks["s_in"]),
                 0.0, 127.0).astype(jnp.int8)  # post-relu: non-negative
    for blk in pblocks["blocks"]:
        h = int8_block(h, blk, interpret=interpret)
    return jnp.mean(h.astype(jnp.float32), axis=(1, 2))
