"""Loss-term parity oracle against the reference's OWN `get_loss` code.

The reference's loss math lives in each LightningModule's `get_loss` — a
pure tensor function of (predictions, GT batch, hparam weights). These
tests import those modules from /root/reference (heavy deps stubbed),
call the unbound `get_loss` with a minimal fake `self` (mseloss +
hparams), and compare every term against this framework's `train/losses`
on IDENTICAL tensors.

The body-model / projection stages are NOT under test here (they have
their own oracles: tests/test_bodymodel.py goldens,
tests/test_reference_oracle_geometry.py vs the reference's geometry
utils); they are monkeypatched on our side with fixed random tensors and
those same tensors are handed to the reference's `get_loss` as the
pred_output_cam / pred_joints_2d inputs it receives from
`fwd_pass_and_loss`. What this isolates — and what nothing else covers —
is the TERM MATH: limb-weight indices, per-term reductions (the reference
mixes mean-of-each-view and mean-of-summed-views!), cross-view coupling
terms, weight application, the ×60, barrier placement.

Oracle targets:
  copenet.copenet_twoview.get_loss            (ref :83-161)
  copenet.copenet_singleview.get_loss         (ref :76-131)
  copenet.hmr.get_loss                        (ref :74-126)
  copenet.muhmr.get_loss                      (ref :76-141)
  copenet_real.copenet_singleview.get_loss    (ref :83-131; supervised,
      character-identical to the synthetic singleview — oracled so the
      real trainer's --model copenet_singleview entry is covered; the
      real trainer's --model muhmr entry imports a module that does not
      exist in the reference and is broken there, PARITY.md)
  copenet_real.copenet_twoview.get_loss       (ref :100-161)
  copenet_real.hmr_camswap_difffl.get_loss    (ref :92-128)
  copenet_real.spin.get_loss                  (ref :86-123)

Stubbing notes (all external to the reference's checked-in code):
  - torchvision / pytorch_lightning / pyrender-Renderer / smplx submodule
    / dsets modules: import-time only, never touched by get_loss.
  - torchgeometry.rotation_matrix_to_angle_axis: routed through THIS
    framework's geometry.rotations.rotmat_to_aa (documented torch-semantics
    replica) — the oracle isolates loss structure, not tgm internals.
  - VPoser (human_body_prior): replaced on BOTH sides by the same fixed
    linear encoder with a deterministic rsample (= mean), so the latent-L2
    term compares the loss plumbing, not the VAE.

Found by this oracle (and fixed): the real twoview 2D keypoint term sums
the two views' weighted errors elementwise BEFORE the mean
(ref copenet_real/copenet_twoview.py:117-123) — i.e. mean(e0)+mean(e1) —
where a view-folded mean computes (mean(e0)+mean(e1))/2.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
B = 3
NJ = 24   # joints carried by the 2D/3D tensors (losses slice [:22])
NV = 40   # fake vertex count (any V works for the MSE terms)

# Distinctive weights: every term must be multiplied by the right hparam
# for the totals to agree (defaults like 1.0 would mask mis-wiring).
W = dict(shape=3.7, keypoint2d=0.7, keypoint3d=2.1, limbs3d=1.7,
         limbstheta=1.35, trans=1.3, rootrot=1.9, pose=0.6, beta=0.11)
RW = dict(keypoint2d=0.7, limbs2d=2.3, vposer=0.23, pose=0.6, beta=0.11)

# Shared fake-VPoser encoder map (32, 63) — same matrix on both sides.
_P = np.random.default_rng(7).normal(size=(32, 63)).astype(np.float32) * 0.1


def _mod(name):
    m = sys.modules.get(name)
    if m is None:
        m = types.ModuleType(name)
        sys.modules[name] = m
    return m


def _our_rotmat_to_aa_torch(rotmat34):
    """torchgeometry.rotation_matrix_to_angle_axis stub: (N,3,4) → (N,3)
    via this framework's rotmat_to_aa (geometry/rotations.py:137)."""
    import jax.numpy as jnp

    from airpose_tpu.geometry.rotations import rotmat_to_aa

    r = rotmat34.detach().cpu().numpy()[..., :3, :3]
    # copy: jax exports are non-writable; from_numpy on them warns
    return torch.from_numpy(np.array(rotmat_to_aa(jnp.asarray(r)), copy=True))


class _FakeVPoser:
    """Deterministic stand-in for vp_model: encode(x).rsample() = x @ P.T."""

    def encode(self, x):
        mu = x @ torch.from_numpy(_P).T
        return types.SimpleNamespace(rsample=lambda: mu, mean=mu)


@pytest.fixture(scope="module")
def ref_losses():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")

    tv = _mod("torchvision")
    tvd = _mod("torchvision.datasets")
    tvd.MNIST = getattr(tvd, "MNIST", object)
    tvt = _mod("torchvision.transforms")
    tvt.Normalize = getattr(tvt, "Normalize", object)
    tvm = _mod("torchvision.models")
    tvr = _mod("torchvision.models.resnet")
    if not hasattr(tvr, "resnet50"):
        def _no_pretrained(*a, **k):
            raise AssertionError("oracle tests must not load imagenet")
        tvr.resnet50 = _no_pretrained
    tvu = _mod("torchvision.utils")
    tvu.make_grid = getattr(tvu, "make_grid", lambda *a, **k: None)
    tv.datasets, tv.transforms, tv.models, tv.utils = tvd, tvt, tvm, tvu
    tvm.resnet = tvr

    pl = _mod("pytorch_lightning")
    pl.LightningModule = getattr(pl, "LightningModule", torch.nn.Module)

    tgm = _mod("torchgeometry")
    tgm.rotation_matrix_to_angle_axis = _our_rotmat_to_aa_torch

    # copenet_real/copenet_twoview.py imports the cwd-dependent bare
    # `config` module (SURVEY §2.7 wart).
    cfg = _mod("config")
    cfg.device, cfg.vposer_weights = "cpu", None

    _mod("human_body_prior")
    _mod("human_body_prior.tools")
    hml = _mod("human_body_prior.tools.model_loader")
    hml.load_model = lambda *a, **k: (_FakeVPoser(),)
    _mod("human_body_prior.models")
    hvm = _mod("human_body_prior.models.vposer_model")
    hvm.VPoser = getattr(hvm, "VPoser", object)

    for pkg in ("copenet", "copenet_real"):
        sm = _mod(f"{pkg}.smplx")
        smm = _mod(f"{pkg}.smplx.smplx")
        smm.SMPLX, smm.lbs = object, types.SimpleNamespace()
        sm.smplx = smm
        rend = _mod(f"{pkg}.utils.renderer")
        rend.Renderer = getattr(rend, "Renderer", type("Renderer", (), {}))
        ds = _mod(f"{pkg}.dsets")
        for sub in ("aerialpeople", "copenet_real"):
            setattr(ds, sub, _mod(f"{pkg}.dsets.{sub}"))

    for p in (f"{REF}/copenet/src", f"{REF}/copenet_real/src"):
        if p not in sys.path:
            sys.path.insert(0, p)

    import copenet.copenet_singleview as sv
    import copenet.copenet_twoview as tw
    import copenet.hmr as hmr
    import copenet.muhmr as muhmr
    import copenet_real.copenet_singleview as rsv
    import copenet_real.copenet_twoview as rtw
    import copenet_real.hmr_camswap_difffl as rcs
    import copenet_real.spin as rsp
    # NOTE the real trainer's remaining entry, `--model muhmr`
    # (copenet_real/copenet_trainer.py:36), imports copenet_real.muhmr —
    # a module that does not exist in the reference tree; that entry is
    # broken in the reference itself (PARITY.md), nothing to oracle.
    return {"twoview": tw.copenet_twoview, "singleview": sv.copenet_singleview,
            "hmr": hmr.hmr, "muhmr": muhmr.muhmr,
            "real_twoview": rtw.copenet_twoview,
            "real_singleview_supervised": rsv.copenet_singleview,
            "real_camswap": rcs.hmr, "real_spin": rsp.spin}


def _fake_self(**weights):
    hp = types.SimpleNamespace(
        **{f"{k}_loss_weight": v for k, v in weights.items()})
    return types.SimpleNamespace(
        mseloss=torch.nn.MSELoss(reduction="none"), hparams=hp)


def _t(a):
    # copy: torch.from_numpy on a non-writable view warns (and would alias)
    return torch.from_numpy(np.array(a, copy=True))


def _preds(rng, two_view):
    """Shared prediction tensors: 6D pose, trans, betas, fake body-model
    outputs and fake projections."""
    vshape = (B, 2) if two_view else (B,)
    trans = rng.normal(0, 1, vshape + (3,)).astype(np.float32) + \
        np.asarray([0, 0, 10], np.float32)
    pose6d = rng.normal(0, 1, vshape + (132,)).astype(np.float32)
    betas = rng.normal(0, 1, vshape + (10,)).astype(np.float32)
    cam = rng.normal(0, 0.3, vshape + (3,)).astype(np.float32) + \
        np.asarray([1, 0, 0], np.float32)
    verts = rng.normal(0, 1, vshape + (NV, 3)).astype(np.float32)
    joints = rng.normal(0, 1, vshape + (NJ, 3)).astype(np.float32)
    j2d = rng.normal(0, 1, vshape + (NJ, 2)).astype(np.float32)
    return trans, pose6d, betas, cam, verts, joints, j2d


def _gt(rng, two_view):
    return {
        "gt_pose_rotmat": rng.normal(0, 1, (B, 21, 3, 3)).astype(np.float32),
        "gt_orient": rng.normal(0, 1, (B, 2, 3, 3)).astype(np.float32),
        "gt_trans": rng.normal(0, 1, (B, 2, 3)).astype(np.float32) + 10,
        "gt_vertices": rng.normal(0, 1, (B, NV, 3)).astype(np.float32),
        "gt_joints": rng.normal(0, 1, (B, NJ, 3)).astype(np.float32),
        "gt_j2d": rng.normal(0, 1, (B, 2, NJ, 2)).astype(np.float32),
        "gt_j2d_crop": rng.normal(0, 1, (B, 2, NJ, 2)).astype(np.float32),
        "intr": np.broadcast_to(np.eye(3, dtype=np.float32),
                                (B, 2, 3, 3)).copy(),
    }


def _rotmat(pose6d):
    """Both sides share one 6D→rotmat conversion (our rot6d_to_rotmat is
    itself oracle-tested against the reference's, test_reference_oracle_
    geometry.py); our losses recompute it internally from the same 6D."""
    import jax.numpy as jnp

    from airpose_tpu.geometry.rotations import rot6d_to_rotmat

    return np.asarray(rot6d_to_rotmat(
        jnp.asarray(pose6d.reshape(pose6d.shape[:-1] + (22, 6)))))


def _cmp(total_j, metrics_j, total_t, losses_t, keys):
    np.testing.assert_allclose(float(total_j), float(total_t),
                               rtol=5e-5, atol=1e-6)
    for k in keys:
        np.testing.assert_allclose(float(metrics_j[k]), losses_t[k],
                                   rtol=5e-5, atol=1e-6, err_msg=k)


def test_loss_oracle_twoview(ref_losses, monkeypatch):
    import jax.numpy as jnp

    import airpose_tpu.train.losses as L
    from airpose_tpu.config import LossWeights

    rng = np.random.default_rng(0)
    trans, pose6d, betas, _, verts, joints, j2d = _preds(rng, True)
    gt = _gt(rng, True)
    rotmat = _rotmat(pose6d)

    ref = ref_losses["twoview"]
    fs = _fake_self(**W)
    out_cam = [types.SimpleNamespace(joints=_t(joints[:, v]),
                                     vertices=_t(verts[:, v]))
               for v in (0, 1)]
    input_batch = {
        "smplpose_rotmat": _t(gt["gt_pose_rotmat"]),
        "smpltrans_rel0": _t(gt["gt_trans"][:, 0]),
        "smpltrans_rel1": _t(gt["gt_trans"][:, 1]),
        "smplorient_rel0": _t(gt["gt_orient"][:, 0:1]),
        "smplorient_rel1": _t(gt["gt_orient"][:, 1:2]),
        "smpl_vertices": _t(gt["gt_vertices"][:, None]),
        "smpl_joints": _t(gt["gt_joints"][:, None]),
        "smpl_joints_2d0": _t(gt["gt_j2d"][:, 0][:, None]),
        "smpl_joints_2d1": _t(gt["gt_j2d"][:, 1][:, None]),
    }
    loss_t, losses_t = ref.get_loss(
        fs, input_batch, _t(trans[:, 0]), _t(trans[:, 1]),
        _t(rotmat[:, 0]), _t(rotmat[:, 1]), _t(betas[:, 0]), _t(betas[:, 1]),
        out_cam[0], out_cam[1], _t(j2d[:, 0]), _t(j2d[:, 1]))

    monkeypatch.setattr(L, "canonical_smplx_two_view",
                        lambda *a: (jnp.asarray(verts), jnp.asarray(joints)))
    monkeypatch.setattr(L, "cam_frame_and_project",
                        lambda *a: (None, jnp.asarray(j2d)))
    pred_pose = np.concatenate([trans * 0.05, pose6d], axis=-1)
    batch = {k: jnp.asarray(v) for k, v in gt.items()}
    total, metrics = L.twoview_loss(
        jnp.asarray(pred_pose), jnp.asarray(betas), batch, None,
        LossWeights(**W))
    _cmp(total, metrics, loss_t, losses_t,
         ["loss_regr_trans", "loss_keypoints", "loss_keypoints_3d",
          "loss_regr_shape", "loss_rootrot", "loss_regr_pose",
          "loss_regul_betas"])


@pytest.mark.parametrize("family",
                         ["singleview", "real_singleview_supervised"])
def test_loss_oracle_singleview(ref_losses, monkeypatch, family):
    """The real package carries a SUPERVISED copenet_singleview too
    (ref copenet_real/copenet_singleview.py:83-131, reachable via its
    trainer's --model copenet_singleview, copenet_trainer.py:31-32) whose
    get_loss is character-identical to the synthetic one — both oracle
    rows map onto this framework's singleview_loss."""
    import jax.numpy as jnp

    import airpose_tpu.train.losses as L
    from airpose_tpu.config import LossWeights

    rng = np.random.default_rng(1)
    trans, pose6d, betas, _, verts, joints, j2d = _preds(rng, False)
    gt = _gt(rng, False)
    rotmat = _rotmat(pose6d)

    ref = ref_losses[family]
    fs = _fake_self(**W)
    input_batch = {
        "smplpose_rotmat": _t(gt["gt_pose_rotmat"]),
        "smpltrans_rel0": _t(gt["gt_trans"][:, 0]),
        "smplorient_rel0": _t(gt["gt_orient"][:, 0:1]),
        "smpl_vertices": _t(gt["gt_vertices"][:, None]),
        "smpl_joints": _t(gt["gt_joints"][:, None]),
        "smpl_joints_2d0": _t(gt["gt_j2d"][:, 0][:, None]),
    }
    out_cam = types.SimpleNamespace(joints=_t(joints), vertices=_t(verts))
    loss_t, losses_t = ref.get_loss(fs, input_batch, _t(trans), _t(rotmat),
                                    _t(betas), out_cam, _t(j2d))

    monkeypatch.setattr(
        L, "smplx_forward",
        lambda *a, **k: types.SimpleNamespace(vertices=jnp.asarray(verts),
                                              joints=jnp.asarray(joints)))
    monkeypatch.setattr(L, "cam_frame_and_project",
                        lambda *a: (None, jnp.asarray(j2d)[None]))
    pred_pose = np.concatenate([trans * 0.05, pose6d], axis=-1)
    batch = {k: jnp.asarray(v) for k, v in gt.items()}
    total, metrics = L.singleview_loss(
        jnp.asarray(pred_pose), jnp.asarray(betas), batch, None,
        LossWeights(**W))
    _cmp(total, metrics, loss_t, losses_t,
         ["loss_regr_trans", "loss_keypoints", "loss_keypoints_3d",
          "loss_regr_shape", "loss_rootrot", "loss_regr_pose",
          "loss_regul_betas"])


def test_loss_oracle_hmr(ref_losses, monkeypatch):
    import jax.numpy as jnp

    import airpose_tpu.train.losses as L
    from airpose_tpu.config import LossWeights

    rng = np.random.default_rng(2)
    _, pose6d, betas, cam, verts, joints, j2d = _preds(rng, False)
    gt = _gt(rng, False)
    rotmat = _rotmat(pose6d)

    ref = ref_losses["hmr"]
    fs = _fake_self(**W)
    input_batch = {
        "smplpose_rotmat": _t(gt["gt_pose_rotmat"]),
        "smplorient_rel0": _t(gt["gt_orient"][:, 0:1]),
        "smpl_vertices": _t(gt["gt_vertices"][:, None]),
        "smpl_joints": _t(gt["gt_joints"][:, None]),
        "smpl_joints_2d_crop0": _t(gt["gt_j2d_crop"][:, 0][:, None]),
    }
    out_cam = types.SimpleNamespace(joints=_t(joints), vertices=_t(verts))
    loss_t, losses_t = ref.get_loss(fs, input_batch, _t(cam), _t(rotmat),
                                    _t(betas), out_cam, _t(j2d))

    monkeypatch.setattr(
        L, "smplx_forward",
        lambda *a, **k: types.SimpleNamespace(vertices=jnp.asarray(verts),
                                              joints=jnp.asarray(joints)))
    monkeypatch.setattr(L, "_weak_cam_project",
                        lambda *a: jnp.asarray(j2d))
    batch = {k: jnp.asarray(v) for k, v in gt.items()}
    total, metrics = L.hmr_loss(
        jnp.asarray(pose6d), jnp.asarray(betas), jnp.asarray(cam), batch,
        None, LossWeights(**W))
    _cmp(total, metrics, loss_t, losses_t,
         ["loss_keypoints", "loss_keypoints_3d", "loss_regr_shape",
          "loss_rootrot", "loss_regr_pose", "loss_regul_betas"])


def test_loss_oracle_muhmr(ref_losses, monkeypatch):
    import jax.numpy as jnp

    import airpose_tpu.train.losses as L
    from airpose_tpu.config import LossWeights

    rng = np.random.default_rng(3)
    _, pose6d, betas, cam, verts, joints, j2d = _preds(rng, True)
    gt = _gt(rng, True)
    rotmat = _rotmat(pose6d)

    ref = ref_losses["muhmr"]
    fs = _fake_self(**W)
    out_cam = [types.SimpleNamespace(joints=_t(joints[:, v]),
                                     vertices=_t(verts[:, v]))
               for v in (0, 1)]
    input_batch = {
        "smplpose_rotmat": _t(gt["gt_pose_rotmat"]),
        "smplorient_rel0": _t(gt["gt_orient"][:, 0:1]),
        "smplorient_rel1": _t(gt["gt_orient"][:, 1:2]),
        "smpl_vertices": _t(gt["gt_vertices"][:, None]),
        "smpl_joints": _t(gt["gt_joints"][:, None]),
        "smpl_joints_2d_crop0": _t(gt["gt_j2d_crop"][:, 0][:, None]),
        "smpl_joints_2d_crop1": _t(gt["gt_j2d_crop"][:, 1][:, None]),
    }
    loss_t, losses_t = ref.get_loss(
        fs, input_batch, _t(rotmat[:, 0]), _t(betas[:, 0]), out_cam[0],
        _t(j2d[:, 0]), _t(cam[:, 0]), _t(rotmat[:, 1]), _t(betas[:, 1]),
        out_cam[1], _t(j2d[:, 1]), _t(cam[:, 1]))

    monkeypatch.setattr(L, "canonical_smplx_two_view",
                        lambda *a: (jnp.asarray(verts), jnp.asarray(joints)))
    views = iter([jnp.asarray(j2d[:, 0]), jnp.asarray(j2d[:, 1])])
    monkeypatch.setattr(L, "_weak_cam_project", lambda *a: next(views))
    batch = {k: jnp.asarray(v) for k, v in gt.items()}
    total, metrics = L.muhmr_loss(
        jnp.asarray(pose6d), jnp.asarray(betas), jnp.asarray(cam), batch,
        None, LossWeights(**W))
    _cmp(total, metrics, loss_t, losses_t,
         ["loss_keypoints", "loss_keypoints_3d", "loss_regr_shape",
          "loss_rootrot", "loss_regr_pose", "loss_regul_betas"])


def test_loss_oracle_real_twoview(ref_losses, monkeypatch):
    """The self-supervised fine-tune loss (incl. the view-sum-then-mean
    2D reduction this oracle caught, and the VPoser latent term via the
    shared fake encoder)."""
    import jax
    import jax.numpy as jnp

    import airpose_tpu.train.losses as L
    from airpose_tpu.config import RealLossWeights

    rng = np.random.default_rng(4)
    trans, pose6d, betas, _, _, joints, j2d = _preds(rng, True)
    gt = _gt(rng, True)
    rotmat = _rotmat(pose6d)
    kp_conf = np.concatenate(
        [rng.normal(0, 1, (B, 2, NJ, 2)).astype(np.float32),
         rng.uniform(0, 1, (B, 2, NJ, 1)).astype(np.float32)], axis=-1)

    ref = ref_losses["real_twoview"]
    fs = _fake_self(**RW)
    input_batch = {
        "smpl_joints_2d0": _t(kp_conf[:, 0][:, None]),
        "smpl_joints_2d1": _t(kp_conf[:, 1][:, None]),
    }
    out_cam = [types.SimpleNamespace(joints=_t(joints[:, v]))
               for v in (0, 1)]
    loss_t, losses_t = ref.get_loss(
        fs, input_batch, _t(trans[:, 0]), _t(trans[:, 1]),
        _t(rotmat[:, 0]), _t(rotmat[:, 1]), _t(betas[:, 0]), _t(betas[:, 1]),
        out_cam[0], out_cam[1], _t(j2d[:, 0]), _t(j2d[:, 1]))

    monkeypatch.setattr(L, "canonical_smplx_two_view",
                        lambda *a: (None, jnp.asarray(joints)))
    monkeypatch.setattr(L, "cam_frame_and_project",
                        lambda *a: (None, jnp.asarray(j2d)))
    monkeypatch.setattr(
        L, "vposer_encode",
        lambda params, aa: (aa @ jnp.asarray(_P).T, jnp.zeros(())))
    monkeypatch.setattr(L, "vposer_rsample", lambda mu, sigma, key: mu)
    pred_pose = np.concatenate([trans * 0.05, pose6d], axis=-1)
    batch = {"gt_j2d_conf": jnp.asarray(kp_conf),
             "intr": jnp.asarray(gt["intr"])}
    total, metrics = L.real_twoview_loss(
        jnp.asarray(pred_pose), jnp.asarray(betas), batch, None, None,
        RealLossWeights(**RW), jax.random.PRNGKey(0))
    _cmp(total, metrics, loss_t, losses_t,
         ["loss_keypoints", "loss_regul_vposer", "loss_regr_pose",
          "loss_regul_betas"])


@pytest.mark.parametrize("family", ["real_camswap", "real_spin"])
def test_loss_oracle_real_singleview(ref_losses, monkeypatch, family):
    """hmr_camswap_difffl and spin share the identical get_loss term math
    (both receive the weak-cam translation, so the depth barrier matches
    too); our real_singleview_loss must match both."""
    import jax
    import jax.numpy as jnp

    import airpose_tpu.train.losses as L
    from airpose_tpu import constants as C
    from airpose_tpu.config import RealLossWeights

    rng = np.random.default_rng(5)
    _, pose6d, betas, cam, _, joints, j2d = _preds(rng, False)
    rotmat = _rotmat(pose6d)
    kp_conf = np.concatenate(
        [rng.normal(0, 1, (B, NJ, 2)).astype(np.float32),
         rng.uniform(0, 1, (B, NJ, 1)).astype(np.float32)], axis=-1)
    # the weak-cam translation the reference's fwd_pass computes and our
    # loss reconstructs internally (same formula, crop focal 5000)
    focal = (5000.0, 5000.0)
    cam_t = np.stack(
        [cam[:, 1], cam[:, 2],
         2 * focal[0] / (C.CROP_SIZE * cam[:, 0] + 1e-9)], axis=-1)

    ref = ref_losses[family]
    fs = _fake_self(**RW)
    input_batch = {"smpl_joints_2d_crop0": _t(kp_conf[:, None])}
    out_cam = types.SimpleNamespace(joints=_t(joints))
    loss_t, losses_t = ref.get_loss(fs, input_batch, _t(cam_t), _t(rotmat),
                                    _t(betas), out_cam, _t(j2d))

    monkeypatch.setattr(
        L, "smplx_forward",
        lambda *a, **k: types.SimpleNamespace(joints=jnp.asarray(joints),
                                              vertices=None))
    monkeypatch.setattr(L, "_weak_cam_project", lambda *a: jnp.asarray(j2d))
    monkeypatch.setattr(
        L, "vposer_encode",
        lambda params, aa: (aa @ jnp.asarray(_P).T, jnp.zeros(())))
    monkeypatch.setattr(L, "vposer_rsample", lambda mu, sigma, key: mu)
    batch = {"gt_j2d_crop_conf": jnp.asarray(kp_conf[:, None])}
    total, metrics = L.real_singleview_loss(
        jnp.asarray(pose6d), jnp.asarray(betas), jnp.asarray(cam), batch,
        None, None, RealLossWeights(**RW), jax.random.PRNGKey(0),
        focal=focal)
    _cmp(total, metrics, loss_t, losses_t,
         ["loss_keypoints", "loss_regul_vposer", "loss_regul_betas"])
