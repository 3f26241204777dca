"""Staged single-view inference for the 3-step protocol.

The fused two-view forward's IEF loop (models/airpose.py) factors into
three per-drone steps whose cross-view inputs arrive over the network
(SURVEY.md §2.8):

  step1: trunk features + IEF iter 1, peer state = mean params
  step2: IEF iter 2 with the peer's step-1 state
  step3: IEF iter 3 with the peer's step-2 state  → final result

With both peers' messages from the same frame, step1..3 here reproduce the
fused 3-iter forward bit-for-bit (tests/test_models.py proves the identity
on the regress_step primitive). In flight the peer message lags a round —
the staged path is then deliberately *not* identical on moving subjects
(SURVEY.md §7 risks: document, don't "fix").
"""

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..models.airpose import AirPoseTwoView, mean_init_state
from .protocol import pack_params, unpack_params


def normalize_host(img_u8: np.ndarray) -> np.ndarray:
    """Host-side uint8→normalized-float crop (the serving path fuses this
    in-graph — _normalize_in_graph below; one shared definition so the
    host-side consumers, benchtest replay and tests, cannot drift)."""
    x = img_u8.astype(np.float32) / 255.0
    return (x - np.asarray(C.IMG_NORM_MEAN)) / np.asarray(C.IMG_NORM_STD)


class ViewState(NamedTuple):
    pose: np.ndarray   # (B, 135) [trans*scale | 6D×22] — host (wire access)
    shape: np.ndarray  # (B, 10) — host (wire access)
    xf: jnp.ndarray    # (B, 2048) trunk features — DEVICE-resident between
                       # steps (pulling them to host costs a transfer round
                       # trip per round; on a relay-attached chip each round
                       # trip is ~30 ms — PERF.md served-rate analysis)


def state_to_wire(state: ViewState, i: int = 0) -> np.ndarray:
    """ViewState row → 145-float message (β, scaled trans, 6D pose)."""
    return pack_params(
        np.asarray(state.shape[i]),
        np.asarray(state.pose[i, :3]) / C.TRANS_SCALE,
        np.asarray(state.pose[i, 3:]),
    )


def wire_to_peer(data: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """145-float peer message → (art_pose (126,), shape (10,)) — the two
    tensors the regressor conditions on from the other view."""
    betas, _, pose6d = unpack_params(data)
    return pose6d[6:], betas


class StagedRegressor:
    """Jitted step1/2/3 over AirPoseTwoView weights (or, with
    ``sep_view`` set, one drone's half of an AirPoseTwoViewSep
    checkpoint)."""

    def __init__(self, variables, iters: int = C.NUM_ITERS, dtype=jnp.float32,
                 sep_view: int = None, int8: bool = False):
        if sep_view is None:
            self.model = AirPoseTwoView(iters=iters, dtype=dtype)
        else:
            from ..models.airpose import AirPoseTwoViewSepView

            self.model = AirPoseTwoViewSepView(
                iters=iters, dtype=dtype, view=sep_view
            )
        self.variables = variables
        mean_pose, mean_shape, _ = mean_init_state((1,))
        self._mean_art = np.asarray(mean_pose)[:, 6:]
        self._mean_shape = np.asarray(mean_shape)

        # int8 PTQ trunk (ops/int8_trunk.py, measured 1.38×): quantized up
        # front, activation scales calibrated lazily on the FIRST real
        # frame batch — serving calibrates on deployment data by design.
        self.int8 = int8
        self._act_scales = None
        if int8:
            from ..ops import quantize_trunk_params

            self._qp = quantize_trunk_params(
                variables,
                trunk_key="trunk" if sep_view is None else f"trunk{sep_view}",
            )

        model = self.model

        # Per-frame serving is LATENCY-bound, not FLOP-bound: every jitted
        # call and every host pull is one host↔device round trip (~30 ms
        # measured on this relay-attached chip, ~0.1 ms on a local PCIe
        # host — PERF.md). So each protocol round is exactly ONE fused
        # call: step1 fuses uint8→normalize→trunk→mean-pose concat→IEF
        # iter; step2/3 reuse device-resident features. The mean-parameter
        # constants are baked into the executable.
        mean_pose_c, mean_shape_c, _ = mean_init_state((1,))
        mean_pose_c = jnp.asarray(mean_pose_c[0])
        mean_shape_c = jnp.asarray(mean_shape_c[0])
        norm_mean = jnp.asarray(C.IMG_NORM_MEAN)
        norm_std = jnp.asarray(C.IMG_NORM_STD)

        def _normalize_in_graph(image):
            if image.dtype == jnp.uint8:
                image = image.astype(jnp.float32) / 255.0
                image = (image - norm_mean) / norm_std
            return image

        def _step1_from_xf(variables, xf, bb, init_trans):
            B = xf.shape[0]
            pose = jnp.concatenate(
                [init_trans * C.TRANS_SCALE,
                 jnp.broadcast_to(mean_pose_c, (B,) + mean_pose_c.shape)],
                axis=-1,
            )
            shape = jnp.broadcast_to(mean_shape_c, (B, 10))
            peer_art = jnp.broadcast_to(mean_pose_c[6:], (B, 126))
            new_pose, new_shape = model.apply(
                variables, xf, bb, pose, shape, peer_art, shape,
                method=type(model).regress_step,
            )
            return xf, new_pose, new_shape

        @jax.jit
        def _step1(variables, image, bb, init_trans):
            xf = model.apply(
                variables, _normalize_in_graph(image),
                method=type(model).extract_features,
            )
            return _step1_from_xf(variables, xf, bb, init_trans)

        @jax.jit
        def _reg(variables, xf, bb, pose, shape, peer_art, peer_shape):
            B = xf.shape[0]
            return model.apply(
                variables, xf, bb, pose, shape,
                jnp.broadcast_to(peer_art, (B, 126)),
                jnp.broadcast_to(peer_shape, (B, 10)),
                method=type(model).regress_step,
            )

        if int8:
            from ..ops import resnet50_int8_infer

            qp = self._qp

            @jax.jit
            def _step1_int8(variables, image, bb, init_trans, scales):
                xf = resnet50_int8_infer(
                    qp, _normalize_in_graph(image), act_scales=scales)
                return _step1_from_xf(variables, xf, bb, init_trans)

            self._step1_int8 = _step1_int8
            self._norm_host = lambda img: (
                np.asarray(_normalize_in_graph(jnp.asarray(img))))

        self._step1_jit = _step1
        self._reg = _reg

    def step1(self, image: np.ndarray, bb: np.ndarray,
              init_trans: np.ndarray) -> ViewState:
        """image (B,S,S,3) — uint8 raw (preferred: 4× smaller upload,
        normalization fused in-graph) or already-normalized f32; bb (B,3);
        init_trans (B,3) unscaled. Runs trunk + IEF iter 1 against the
        mean peer state in ONE device call."""
        image = jnp.asarray(image)
        bb = jnp.asarray(bb, jnp.float32)
        init_trans = jnp.asarray(init_trans, jnp.float32)
        if not self.int8:
            xf, pose, shape = self._step1_jit(
                self.variables, image, bb, init_trans)
        else:
            if self._act_scales is None:
                from ..ops import calibrate_act_scales, calibration_clip_rates

                norm = jnp.asarray(self._norm_host(image))
                self._act_scales = calibrate_act_scales(self._qp, norm)
                rates = calibration_clip_rates(
                    self._qp, self._act_scales, norm)
                print(f"int8 serving calibrated on {int(norm.shape[0])} "
                      f"frame(s); clip rate max "
                      f"{max(rates.values()):.2e} — exposure/contrast "
                      "swings beyond this sample will clip (see "
                      "ops/int8_trunk.calibration_clip_rates)", flush=True)
            xf, pose, shape = self._step1_int8(
                self.variables, image, bb, init_trans, self._act_scales)
        pose, shape = jax.device_get((pose, shape))
        return ViewState(pose=pose, shape=shape, xf=xf)

    def step23(self, state: ViewState, bb: np.ndarray,
               peer_art: np.ndarray, peer_shape: np.ndarray) -> ViewState:
        """One further IEF iteration with an explicit peer state (used for
        both step2 and step3). One device call; trunk features stay
        device-resident."""
        new_pose, new_shape = self._reg(
            self.variables,
            state.xf, jnp.asarray(bb, jnp.float32),
            jnp.asarray(state.pose), jnp.asarray(state.shape),
            jnp.asarray(peer_art, jnp.float32),
            jnp.asarray(peer_shape, jnp.float32),
        )
        new_pose, new_shape = jax.device_get((new_pose, new_shape))
        return ViewState(pose=new_pose, shape=new_shape, xf=state.xf)
