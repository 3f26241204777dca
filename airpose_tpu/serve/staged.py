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


class ViewState(NamedTuple):
    pose: np.ndarray   # (B, 135) [trans*scale | 6D×22]
    shape: np.ndarray  # (B, 10)
    xf: np.ndarray     # (B, 2048) trunk features (kept between steps)


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

        @jax.jit
        def _features(variables, image):
            return model.apply(
                variables, image, method=type(model).extract_features
            )

        @jax.jit
        def _reg(variables, xf, bb, pose, shape, peer_art, peer_shape):
            return model.apply(
                variables, xf, bb, pose, shape, peer_art, peer_shape,
                method=type(model).regress_step,
            )

        if int8:
            from ..ops import resnet50_int8_infer

            qp = self._qp

            @jax.jit
            def _features_int8(image, scales):
                return resnet50_int8_infer(qp, image, act_scales=scales)

            self._features_int8 = _features_int8

        self._features = _features
        self._reg = _reg

    def _extract(self, image: jnp.ndarray) -> jnp.ndarray:
        if not self.int8:
            return self._features(self.variables, image)
        if self._act_scales is None:
            from ..ops import calibrate_act_scales

            self._act_scales = calibrate_act_scales(
                self._qp, image.astype(jnp.float32))
        return self._features_int8(image, self._act_scales)

    def step1(self, image: np.ndarray, bb: np.ndarray,
              init_trans: np.ndarray) -> ViewState:
        """image (B,224,224,3) normalized f32, bb (B,3), init_trans (B,3)
        unscaled. Runs trunk + IEF iter 1 against mean peer state."""
        B = image.shape[0]
        xf = self._extract(jnp.asarray(image))
        mean_pose, mean_shape, _ = mean_init_state((B,))
        pose = jnp.concatenate(
            [jnp.asarray(init_trans) * C.TRANS_SCALE, mean_pose], axis=-1
        )
        peer_art = jnp.broadcast_to(jnp.asarray(self._mean_art), (B, 126))
        peer_shape = jnp.broadcast_to(jnp.asarray(self._mean_shape), (B, 10))
        new_pose, new_shape = self._reg(
            self.variables, xf, jnp.asarray(bb), pose, mean_shape,
            peer_art, peer_shape,
        )
        return ViewState(
            pose=np.asarray(new_pose), shape=np.asarray(new_shape),
            xf=np.asarray(xf),
        )

    def step23(self, state: ViewState, bb: np.ndarray,
               peer_art: np.ndarray, peer_shape: np.ndarray) -> ViewState:
        """One further IEF iteration with an explicit peer state (used for
        both step2 and step3)."""
        B = state.pose.shape[0]
        new_pose, new_shape = self._reg(
            self.variables,
            jnp.asarray(state.xf), jnp.asarray(bb),
            jnp.asarray(state.pose), jnp.asarray(state.shape),
            jnp.broadcast_to(jnp.asarray(peer_art, jnp.float32), (B, 126)),
            jnp.broadcast_to(jnp.asarray(peer_shape, jnp.float32), (B, 10)),
        )
        return ViewState(
            pose=np.asarray(new_pose), shape=np.asarray(new_shape), xf=state.xf
        )
