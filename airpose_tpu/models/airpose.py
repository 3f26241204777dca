"""The four AirPose model families, TPU-first.

Reference architectures (SURVEY.md §2.1):
  - HMR ("Baseline"):              ref copenet/models/model_hmr.py:49-195
  - SingleViewFullCam:             ref copenet/models/model_copenet_singleview.py:49-193
  - MuHMR ("Baseline+Multiview"):  ref copenet/models/model_muhmr.py:49-226
  - AirPoseTwoView ("AirPose"):    ref copenet/models/model_copenet.py:49-227
  - AirPoseTwoViewSep:             ref copenet_real/models/model_copenet_sep.py:169-237

TPU-first re-design (vs the reference's sequential per-view torch calls):
  * The two views are an explicit leading array axis folded into the batch
    for the conv trunk — both views run in ONE compiled program on one chip,
    and the cross-view latent exchange is a pure in-array flip along the view
    axis (``x[:, ::-1]``) instead of Python-level tensor plumbing. Under a
    data-sharded mesh this stays collective-free.
  * The IEF loop (3 iterations, ref model_copenet.py:151-157) is unrolled at
    trace time: static shapes, XLA fuses the three MLP steps.
  * The trunk runs in bf16 (MXU), the IEF state/MLP in f32.

The fc1 concat orders below are load-bearing: they match the reference's
checkpoint layouts column-for-column so converted weights are equivalent.
"""

from typing import Any, NamedTuple, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .regressor import RegressorCore, load_mean_params
from .resnet import ResNet50


class WeakCamOutput(NamedTuple):
    pose6d: jnp.ndarray  # (..., 132)  22 joints × 6D (root + 21 body)
    betas: jnp.ndarray   # (..., 10)
    cam: jnp.ndarray     # (..., 3)    weak-perspective (s, tx, ty)


class FullCamOutput(NamedTuple):
    pose: jnp.ndarray    # (..., 135)  [trans(3) | root 6D | 21×6D]
    betas: jnp.ndarray   # (..., 10)


def _mean_tuple():
    pose, shape, cam = load_mean_params()
    return tuple(pose.tolist()), tuple(shape.tolist()), tuple(cam.tolist())


_MEAN_POSE, _MEAN_SHAPE, _MEAN_CAM = _mean_tuple()


def _expand(vals, batch_shape):
    a = jnp.asarray(vals, dtype=jnp.float32)
    return jnp.broadcast_to(a, batch_shape + a.shape)


def mean_init_state(batch_shape=()):
    """(pose_6d 132, shape 10, cam 3) mean-parameter IEF initialization,
    broadcast to ``batch_shape`` (ref model_copenet.py:86-92,121-136)."""
    pose = _expand(_MEAN_POSE[: 22 * 6], batch_shape)
    shape = _expand(_MEAN_SHAPE, batch_shape)
    cam = _expand(_MEAN_CAM, batch_shape)
    return pose, shape, cam


class HMR(nn.Module):
    """Single view, weak-perspective camera.

    ``__call__(x (B,224,224,3)) → WeakCamOutput``; state threads through
    ``iters`` residual IEF steps (ref model_hmr.py:112-172).
    """

    iters: int = 3
    dtype: Any = jnp.float32
    act_fq: Any = None  # activation-QAT grid, threaded to the trunk(s)

    def setup(self):
        self.trunk = ResNet50(dtype=self.dtype, act_fq=self.act_fq)
        self.core = RegressorCore(
            head_dims=(132, 10, 3), head_names=("decpose", "decshape", "deccam")
        )

    def __call__(
        self,
        x: jnp.ndarray,
        init_cam: Optional[jnp.ndarray] = None,
        init_theta: Optional[jnp.ndarray] = None,
        init_shape: Optional[jnp.ndarray] = None,
        iters: Optional[int] = None,
        train: bool = False,
    ) -> WeakCamOutput:
        xf = self.trunk(x, train=train)
        return self.from_features(xf, init_cam, init_theta, init_shape,
                                  iters, train)

    def from_features(
        self,
        xf: jnp.ndarray,  # (B, 2048)
        init_cam: Optional[jnp.ndarray] = None,
        init_theta: Optional[jnp.ndarray] = None,
        init_shape: Optional[jnp.ndarray] = None,
        iters: Optional[int] = None,
        train: bool = False,
    ) -> WeakCamOutput:
        """IEF from precomputed trunk features (alternate trunk execution
        strategies — see AirPoseTwoView.from_features)."""
        B = xf.shape[0]
        mean_pose, mean_shape, mean_cam = mean_init_state((B,))
        pose = mean_pose if init_theta is None else init_theta
        shape = mean_shape if init_shape is None else init_shape
        cam = mean_cam if init_cam is None else init_cam
        for _ in range(iters or self.iters):
            xc = jnp.concatenate([xf, pose, shape, cam], axis=-1)
            dp, ds, dc = self.core(xc, train=train)
            pose, shape, cam = pose + dp, shape + ds, cam + dc
        return WeakCamOutput(pose6d=pose, betas=shape, cam=cam)

    def extract_features(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.trunk(x, train=False)


class SingleViewFullCam(nn.Module):
    """Single view, full-perspective camera ("Baseline+Fullcam").

    State = [camera-frame translation (3, pre-scaled) | 22×6D pose]; extra
    conditioning: bb (3,) = normalized crop center + scale
    (ref model_copenet_singleview.py:112-170).
    """

    iters: int = 3
    dtype: Any = jnp.float32
    act_fq: Any = None  # activation-QAT grid, threaded to the trunk(s)

    def setup(self):
        self.trunk = ResNet50(dtype=self.dtype, act_fq=self.act_fq)
        self.core = RegressorCore(
            head_dims=(135, 10), head_names=("decpose", "decshape")
        )

    def __call__(
        self,
        x: jnp.ndarray,
        bb: jnp.ndarray,
        init_position: jnp.ndarray,
        init_theta: Optional[jnp.ndarray] = None,
        init_shape: Optional[jnp.ndarray] = None,
        iters: Optional[int] = None,
        train: bool = False,
    ) -> FullCamOutput:
        xf = self.trunk(x, train=train)
        return self.from_features(xf, bb, init_position, init_theta,
                                  init_shape, iters, train)

    def from_features(
        self,
        xf: jnp.ndarray,  # (B, 2048)
        bb: jnp.ndarray,
        init_position: jnp.ndarray,
        init_theta: Optional[jnp.ndarray] = None,
        init_shape: Optional[jnp.ndarray] = None,
        iters: Optional[int] = None,
        train: bool = False,
    ) -> FullCamOutput:
        """IEF from precomputed trunk features (alternate trunk execution
        strategies — see AirPoseTwoView.from_features)."""
        B = xf.shape[0]
        mean_pose, mean_shape, _ = mean_init_state((B,))
        theta = mean_pose if init_theta is None else init_theta
        pose = jnp.concatenate([init_position, theta], axis=-1)
        shape = mean_shape if init_shape is None else init_shape
        for _ in range(iters or self.iters):
            xc = jnp.concatenate([xf, bb, pose, shape], axis=-1)
            dp, ds = self.core(xc, train=train)
            pose, shape = pose + dp, shape + ds
        return FullCamOutput(pose=pose, betas=shape)


def _flip_views(a: jnp.ndarray) -> jnp.ndarray:
    """Exchange the two views' tensors: (B, 2, ...) → peer-ordered."""
    return a[:, ::-1]


class MuHMR(nn.Module):
    """Two views, shared weights, weak-perspective cams
    ("Baseline+Multiview", ref model_muhmr.py:112-226).

    fc1 concat: [xf | cam(3) | orient(6) | art(126) | shape(10) |
                 other art(126) | other shape(10)] (ref model_muhmr.py:183-189).
    ``images`` is (B, 2, 224, 224, 3); outputs keep the view axis.
    """

    iters: int = 3
    dtype: Any = jnp.float32
    act_fq: Any = None  # activation-QAT grid, threaded to the trunk(s)

    def setup(self):
        self.trunk = ResNet50(dtype=self.dtype, act_fq=self.act_fq)
        self.core = RegressorCore(
            head_dims=(132, 10, 3), head_names=("decpose", "decshape", "deccam")
        )

    def __call__(
        self,
        images: jnp.ndarray,
        init_cam: Optional[jnp.ndarray] = None,
        init_theta: Optional[jnp.ndarray] = None,
        init_shape: Optional[jnp.ndarray] = None,
        iters: Optional[int] = None,
        train: bool = False,
    ) -> WeakCamOutput:
        B, V = images.shape[:2]
        xf = self.trunk(
            images.reshape((B * V,) + images.shape[2:]), train=train
        ).reshape(B, V, -1)
        return self.from_features(xf, init_cam, init_theta, init_shape,
                                  iters, train)

    def from_features(
        self,
        xf: jnp.ndarray,  # (B, 2, 2048)
        init_cam: Optional[jnp.ndarray] = None,
        init_theta: Optional[jnp.ndarray] = None,
        init_shape: Optional[jnp.ndarray] = None,
        iters: Optional[int] = None,
        train: bool = False,
    ) -> WeakCamOutput:
        """IEF from precomputed trunk features (alternate trunk execution
        strategies — see AirPoseTwoView.from_features)."""
        B, V = xf.shape[:2]
        mean_pose, mean_shape, mean_cam = mean_init_state((B, V))
        pose = mean_pose if init_theta is None else init_theta
        shape = mean_shape if init_shape is None else init_shape
        cam = mean_cam if init_cam is None else init_cam

        for _ in range(iters or self.iters):
            orient, art = pose[..., :6], pose[..., 6:]
            xc = jnp.concatenate(
                [xf, cam, orient, art, shape, _flip_views(art), _flip_views(shape)],
                axis=-1,
            )
            dp, ds, dc = self.core(xc.reshape(B * V, -1), train=train)
            pose = pose + dp.reshape(B, V, -1)
            shape = shape + ds.reshape(B, V, -1)
            cam = cam + dc.reshape(B, V, -1)
        return WeakCamOutput(pose6d=pose, betas=shape, cam=cam)


class AirPoseTwoView(nn.Module):
    """The AirPose network: two views, shared weights, full perspective.

    State per view = [trans(3) | root 6D | 21×6D]; fc1 concat =
    [xf | bb(3) | trans(3) | orient(6) | art(126) | shape(10) |
     other art(126) | other shape(10)] (ref model_copenet.py:67,185-192).
    Both views run in one compiled program; the cross-view exchange is an
    in-array view flip. `regress_step` exposes a single IEF step for the
    3-round drone sync protocol (SURVEY.md §2.8).
    """

    iters: int = 3
    dtype: Any = jnp.float32
    act_fq: Any = None  # activation-QAT grid, threaded to the trunk(s)

    def setup(self):
        self.trunk = ResNet50(dtype=self.dtype, act_fq=self.act_fq)
        self.core = RegressorCore(
            head_dims=(135, 10), head_names=("decpose", "decshape")
        )

    def _reg(self, xf, bb, pose, shape, train: bool):
        """One IEF step over (B, 2, ·) state."""
        B, V = pose.shape[:2]
        trans, orient, art = pose[..., :3], pose[..., 3:9], pose[..., 9:]
        xc = jnp.concatenate(
            [xf, bb, trans, orient, art, shape, _flip_views(art), _flip_views(shape)],
            axis=-1,
        )
        dp, ds = self.core(xc.reshape(B * V, -1), train=train)
        return pose + dp.reshape(B, V, -1), shape + ds.reshape(B, V, -1)

    def __call__(
        self,
        images: jnp.ndarray,
        bb: jnp.ndarray,
        init_position: jnp.ndarray,
        init_theta: Optional[jnp.ndarray] = None,
        init_shape: Optional[jnp.ndarray] = None,
        iters: Optional[int] = None,
        train: bool = False,
    ) -> FullCamOutput:
        B, V = images.shape[:2]
        xf = self.trunk(
            images.reshape((B * V,) + images.shape[2:]), train=train
        ).reshape(B, V, -1)
        return self.from_features(xf, bb, init_position, init_theta,
                                  init_shape, iters, train)

    def from_features(
        self,
        xf: jnp.ndarray,            # (B, 2, 2048) trunk features
        bb: jnp.ndarray,
        init_position: jnp.ndarray,
        init_theta: Optional[jnp.ndarray] = None,
        init_shape: Optional[jnp.ndarray] = None,
        iters: Optional[int] = None,
        train: bool = False,
    ) -> FullCamOutput:
        """IEF regression from precomputed trunk features — the injection
        point for alternate trunk execution strategies (pallas fused bf16
        layer1, int8 layers; ops/fused_bottleneck.py, ops/int8_trunk.py)."""
        B, V = xf.shape[:2]
        mean_pose, mean_shape, _ = mean_init_state((B, V))
        theta = mean_pose if init_theta is None else init_theta
        pose = jnp.concatenate([init_position, theta], axis=-1)
        shape = mean_shape if init_shape is None else init_shape
        for _ in range(iters or self.iters):
            pose, shape = self._reg(xf, bb, pose, shape, train)
        return FullCamOutput(pose=pose, betas=shape)

    # ---- staged API for the 3-step serving protocol ----

    def extract_features(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, 224, 224, 3) → (B, 2048), single view."""
        return self.trunk(x, train=False)

    def regress_step(
        self,
        xf: jnp.ndarray,
        bb: jnp.ndarray,
        own_pose: jnp.ndarray,
        own_shape: jnp.ndarray,
        peer_art_pose: jnp.ndarray,
        peer_shape: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One single-view IEF step with an explicit peer state — the unit
        the drones exchange over the network (ref model_copenet.py:178-204
        with the peer tensors arriving via TCP instead of co-resident)."""
        trans, orient, art = own_pose[..., :3], own_pose[..., 3:9], own_pose[..., 9:]
        xc = jnp.concatenate(
            [xf, bb, trans, orient, art, own_shape, peer_art_pose, peer_shape],
            axis=-1,
        )
        dp, ds = self.core(xc, train=False)
        return own_pose + dp, own_shape + ds


class AirPoseTwoViewSep(nn.Module):
    """AirPose with per-drone weights: two full trunk+regressor copies,
    one per view (ref copenet_real/models/model_copenet_sep.py:169-237).
    Same call signature/outputs as AirPoseTwoView.

    Documented divergence: the reference's forward_reg rebinds view 0's
    shape BEFORE building view 1's concat (model_copenet_sep.py:198 then
    :192's argument on the next line of data flow), so its view 1 sees
    view 0's FRESH shape but STALE art pose within one IEF step — an
    asymmetry the shared-weight model does not have (model_copenet.py
    builds both concats before any update). Here both views update from
    the same pre-step state, so the fused forward equals the staged
    serving protocol (tests/test_serve.py::test_sep_staged_matches_sep_fused).
    The reference's exact sequential semantics remain reproducible through
    AirPoseTwoViewSepView.regress_step and are oracle-tested against the
    reference's own torch module
    (tests/test_reference_oracle.py::test_oracle_twoview_sep)."""

    iters: int = 3
    dtype: Any = jnp.float32
    act_fq: Any = None  # activation-QAT grid, threaded to the trunk(s);
    #                     (levels, (table0, table1)) gives each per-drone
    #                     trunk its OWN frozen calibrated scale table

    def setup(self):
        fq0 = fq1 = self.act_fq
        if (isinstance(self.act_fq, tuple)
                and isinstance(self.act_fq[1], (tuple, list))):
            levels, (t0, t1) = self.act_fq
            fq0, fq1 = (levels, t0), (levels, t1)
        self.trunk0 = ResNet50(dtype=self.dtype, act_fq=fq0)
        self.trunk1 = ResNet50(dtype=self.dtype, act_fq=fq1)
        self.core0 = RegressorCore(
            head_dims=(135, 10), head_names=("decpose", "decshape")
        )
        self.core1 = RegressorCore(
            head_dims=(135, 10), head_names=("decpose", "decshape")
        )

    def __call__(
        self,
        images: jnp.ndarray,
        bb: jnp.ndarray,
        init_position: jnp.ndarray,
        init_theta: Optional[jnp.ndarray] = None,
        init_shape: Optional[jnp.ndarray] = None,
        iters: Optional[int] = None,
        train: bool = False,
    ) -> FullCamOutput:
        B, V = images.shape[:2]
        assert V == 2
        xf = jnp.stack(
            [
                self.trunk0(images[:, 0], train=train),
                self.trunk1(images[:, 1], train=train),
            ],
            axis=1,
        )
        return self.from_features(xf, bb, init_position, init_theta,
                                  init_shape, iters, train)

    def from_features(
        self,
        xf: jnp.ndarray,            # (B, 2, 2048) per-drone trunk features
        bb: jnp.ndarray,
        init_position: jnp.ndarray,
        init_theta: Optional[jnp.ndarray] = None,
        init_shape: Optional[jnp.ndarray] = None,
        iters: Optional[int] = None,
        train: bool = False,
    ) -> FullCamOutput:
        """IEF regression from precomputed per-view trunk features — the
        injection point for alternate trunk execution strategies (mirrors
        AirPoseTwoView.from_features; each view runs its own core)."""
        B, V = xf.shape[:2]
        mean_pose, mean_shape, _ = mean_init_state((B, V))
        theta = mean_pose if init_theta is None else init_theta
        pose = jnp.concatenate([init_position, theta], axis=-1)
        shape = mean_shape if init_shape is None else init_shape

        for _ in range(iters or self.iters):
            trans, orient, art = pose[..., :3], pose[..., 3:9], pose[..., 9:]
            other_art, other_shape = _flip_views(art), _flip_views(shape)
            outs = []
            for v, core in ((0, self.core0), (1, self.core1)):
                xc = jnp.concatenate(
                    [
                        xf[:, v], bb[:, v], trans[:, v], orient[:, v], art[:, v],
                        shape[:, v], other_art[:, v], other_shape[:, v],
                    ],
                    axis=-1,
                )
                outs.append(core(xc, train=train))
            dp = jnp.stack([outs[0][0], outs[1][0]], axis=1)
            ds = jnp.stack([outs[0][1], outs[1][1]], axis=1)
            pose, shape = pose + dp, shape + ds
        return FullCamOutput(pose=pose, betas=shape)


def _sep_view_modules(model: "AirPoseTwoViewSep", view: int):
    return (model.trunk0, model.core0) if view == 0 else (model.trunk1, model.core1)


class AirPoseTwoViewSepView(nn.Module):
    """Single-view staged access into AirPoseTwoViewSep's per-drone weights
    (serving path for the _sep variant — each drone loads the full sep
    checkpoint and runs its own trunk/core by robot id)."""

    iters: int = 3
    dtype: Any = jnp.float32
    act_fq: Any = None  # activation-QAT grid, threaded to the trunk(s)
    view: int = 0

    def setup(self):
        # mirror AirPoseTwoViewSep's parameter tree so sep checkpoints
        # restore directly
        self.trunk0 = ResNet50(dtype=self.dtype, act_fq=self.act_fq)
        self.trunk1 = ResNet50(dtype=self.dtype, act_fq=self.act_fq)
        self.core0 = RegressorCore(
            head_dims=(135, 10), head_names=("decpose", "decshape")
        )
        self.core1 = RegressorCore(
            head_dims=(135, 10), head_names=("decpose", "decshape")
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.extract_features(x)

    def extract_features(self, x: jnp.ndarray) -> jnp.ndarray:
        trunk, _ = _sep_view_modules(self, self.view)
        return trunk(x, train=False)

    def regress_step(self, xf, bb, own_pose, own_shape, peer_art_pose,
                     peer_shape):
        _, core = _sep_view_modules(self, self.view)
        trans, orient, art = own_pose[..., :3], own_pose[..., 3:9], own_pose[..., 9:]
        xc = jnp.concatenate(
            [xf, bb, trans, orient, art, own_shape, peer_art_pose, peer_shape],
            axis=-1,
        )
        dp, ds = core(xc, train=False)
        return own_pose + dp, own_shape + ds
