"""Real (DJI) dataset-pipeline oracle vs the reference's OWN reader.

Runs the reference's ``copenet_real`` dataset class
(/root/reference/copenet_real/src/copenet_real/dsets/copenet_real.py) on a
capture written by THIS framework's ``tools/synth_real_capture.py`` and
compares field-for-field against ``data/real.CopenetRealDataset`` +
``pipeline.finish_batch`` on the same frames:

  * OpenPose(25)/AlphaPose(18) → 24-joint SMPL-order remapping
    (the op_map2smpl/al_map2smpl index maps, ref :18-19);
  * mutual-agreement gating at the threshold boundary (ref :105-110) —
    compared at the default 100 px AND at a tight threshold that flips a
    subset of joints;
  * intrinsics from the cv2 FileStorage camera_calib.yml (ref :111-116);
  * per-frame ArUco rvec/tvec extrinsics composition (ref :119-142);
  * the keypoint-extent ±50 px crop window, its bb encoding
    (center/principal − 1, resize scale appended) and crop-frame
    keypoints s·(uv − center) (ref :188-227);
  * the ``get_j2d_only`` fast path the AirPose+ optimizer consumes
    (ref :260-266);
  * images loosely (same crop geometry; cv2-bilinear vs
    scale_and_translate interpolation taps, as in the aerialpeople
    dataset oracle).

Stubs (external deps only, none touched by the compared math):
torchvision.transforms (Normalize replica), human-absent imgaug-free tree;
``torchgeometry.angle_axis_to_rotation_matrix`` is routed through the
reference's OWN ``copenet_real.utils.geometry.batch_rodrigues`` embedded
into the (N, 4, 4) layout tgm returns — the rotation math stays a pure
reference oracle; only tgm's homogeneous embedding (identity bottom row)
is replicated, the same documented in-image boundary as the loss oracle's
tgm routing (torchgeometry is not installed here).

Documented divergence (asserted below, PARITY.md "real dataset" note):
the reference indexes its extrinsics arrays POSITIONALLY while building
them over ALL marker frames (ref :125-142 ``for i in range(len(pose1))``,
``extr["0"] = self.extr0[idx]`` at :174), so any frame_range not starting
at 0 (the test split starts at 8000) pairs frame k's image/keypoints with
frame (k − start)'s extrinsics. This framework indexes extrinsics by FRAME
NUMBER. The oracle comparisons run on a range starting at 0, where the two
agree exactly; a dedicated test pins the divergence on an offset range.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _mod(name):
    m = sys.modules.get(name)
    if m is None:
        m = types.ModuleType(name)
        sys.modules[name] = m
    return m


class _Normalize:
    def __init__(self, mean, std):
        self.mean = torch.tensor(mean).view(-1, 1, 1)
        self.std = torch.tensor(std).view(-1, 1, 1)

    def __call__(self, t):
        return (t - self.mean) / self.std


@pytest.fixture(scope="module")
def ref_dataset_cls():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")

    tv = _mod("torchvision")
    tvt = _mod("torchvision.transforms")
    tvt.Normalize = _Normalize
    tv.transforms = tvt

    for p in (f"{REF}/copenet_real/src",):
        if p not in sys.path:
            sys.path.insert(0, p)

    # the reference's own aa→rotmat, embedded in tgm's (N, 4, 4) layout
    from copenet_real.utils.geometry import batch_rodrigues as ref_rodrigues

    def _aa_to_rotmat44(aa):
        out = torch.zeros(aa.shape[0], 4, 4, dtype=aa.dtype)
        out[:, :3, :3] = ref_rodrigues(aa)
        out[:, 3, 3] = 1.0
        return out

    tgm = _mod("torchgeometry")
    tgm.angle_axis_to_rotation_matrix = _aa_to_rotmat44

    # copenet_real/dsets has no __init__.py; make it traversable, and
    # evict any EMPTY stub test_reference_oracle_losses may have installed
    # earlier in this process (same hygiene as the aerialpeople oracle).
    ds_pkg = _mod("copenet_real.dsets")
    if not hasattr(ds_pkg, "__path__"):
        ds_pkg.__path__ = [f"{REF}/copenet_real/src/copenet_real/dsets"]
    stale = sys.modules.get("copenet_real.dsets.copenet_real")
    if stale is not None and not hasattr(stale, "copenet_real"):
        sys.modules.pop("copenet_real.dsets.copenet_real")

    import copenet_real.dsets.copenet_real as ref_cr
    return ref_cr.copenet_real


@pytest.fixture(scope="module")
def capture_dir(tmp_path_factory):
    from airpose_tpu.tools.synth_real_capture import write_capture

    out = str(tmp_path_factory.mktemp("real_oracle") / "cap")
    write_capture(out, n_frames=6, seed=2)
    return out


N = 6


def _ref_ds(ref_dataset_cls, capture_dir, drange=range(0, N), threshold=100):
    return ref_dataset_cls(capture_dir, drange, shuffle_cams=False,
                           first_cam=0, kp_agrmnt_threshold=threshold)


def test_keypoint_maps_and_gating(ref_dataset_cls, capture_dir):
    """Remapping + mutual-agreement gating, at the default threshold and
    at a tight one that flips a nontrivial subset of joints."""
    from airpose_tpu.data.real import CopenetRealDataset

    for thr in (100.0, 4.0):
        ref = _ref_ds(ref_dataset_cls, capture_dir, threshold=thr)
        ours = CopenetRealDataset(capture_dir, frame_range=range(0, N),
                                  kp_agrmnt_threshold=thr)
        np.testing.assert_allclose(ours.opose, ref.opose, atol=1e-5,
                                   err_msg=f"opose thr={thr}")
        np.testing.assert_allclose(ours.apose, ref.apose, atol=1e-5,
                                   err_msg=f"apose thr={thr}")
        gated = (ref.opose[..., 2] == 0)
        if thr == 4.0:
            # the tight threshold must actually flip some mapped joints
            # beyond the always-unmapped (-1) rows, or the boundary
            # comparison is vacuous
            loose = (_ref_ds(ref_dataset_cls, capture_dir).opose[..., 2] == 0)
            assert gated.sum() > loose.sum()

    # the fast path the AirPose+ optimizer consumes (ref :260-266)
    ref = _ref_ds(ref_dataset_cls, capture_dir)
    ours = CopenetRealDataset(capture_dir, frame_range=range(0, N))
    for idx in (0, N - 1):
        item = ref.get_j2d_only(idx)
        kp = ours.keypoints(idx)
        for v in (0, 1):
            got = np.stack([kp["openpose"][v], kp["alphapose"][v]])
            np.testing.assert_allclose(
                got, item[f"smpl_joints_2d{v}"].numpy(), atol=1e-5)


def test_calib_and_extrinsics(ref_dataset_cls, capture_dir):
    from airpose_tpu.data.real import CopenetRealDataset

    ref = _ref_ds(ref_dataset_cls, capture_dir)
    ours = CopenetRealDataset(capture_dir, frame_range=range(0, N))
    np.testing.assert_allclose(ours.intr[0], ref.intr0, atol=1e-6)
    np.testing.assert_allclose(ours.intr[1], ref.intr1, atol=1e-6)
    for idx in range(N):
        np.testing.assert_allclose(
            ours.extr[0, idx], ref.extr0[idx].numpy(), atol=1e-5,
            err_msg=f"extr machine_1 frame {idx}")
        np.testing.assert_allclose(
            ours.extr[1, idx], ref.extr1[idx].numpy(), atol=1e-5,
            err_msg=f"extr machine_2 frame {idx}")


def test_extrinsics_offset_range_divergence(ref_dataset_cls, capture_dir):
    """Documented divergence: on a frame_range NOT starting at 0 the
    reference pairs frame k with frame (k − start)'s extrinsics (positional
    indexing into arrays built over all marker frames, ref :125-142, :174);
    this framework indexes by frame number. Pin both behaviors."""
    from airpose_tpu.data.real import CopenetRealDataset

    start = 2
    ref = _ref_ds(ref_dataset_cls, capture_dir, drange=range(start, N))
    ours = CopenetRealDataset(capture_dir, frame_range=range(start, N))
    item0 = ref[0]  # frame `start`'s image/keypoints...
    ref_full = _ref_ds(ref_dataset_cls, capture_dir)
    # ...but the reference hands it frame 0's extrinsics
    np.testing.assert_allclose(item0["extr0"].numpy(),
                               ref_full.extr0[0].numpy(), atol=1e-6)
    # ours hands it frame `start`'s (frame-aligned — intentional fix)
    np.testing.assert_allclose(ours.extr[0, 0],
                               ref_full.extr0[start].numpy(), atol=1e-5)
    assert not np.allclose(ours.extr[0, 0], item0["extr0"].numpy(),
                           atol=1e-5), "fixture no longer distinguishes " \
        "frame 0 from frame 2 extrinsics — regenerate with varying rvec"


def test_getitem_oracle(ref_dataset_cls, capture_dir):
    """Full __getitem__ comparison: crop window, bb encoding, crop-frame
    keypoints, extr/intr routing through the first_cam ordering, images."""
    import jax

    from airpose_tpu.data.pipeline import finish_batch
    from airpose_tpu.data.real import CopenetRealDataset

    ref = _ref_ds(ref_dataset_cls, capture_dir)
    ours = CopenetRealDataset(capture_dir, frame_range=range(0, N))
    idxs = list(range(N))
    hb = ours.host_batch(idxs, np.random.default_rng(0))
    batch = finish_batch(hb, jax.random.PRNGKey(0), deterministic=True,
                         margin=0.0)
    batch = {k: np.asarray(v) for k, v in batch.items()}
    assert (hb["context_scale"] == 1).all()  # native-res comparison

    for b, idx in enumerate(idxs):
        item = ref[idx]
        for v in (0, 1):
            np.testing.assert_allclose(
                batch["intr"][b, v], item[f"intr{v}"].numpy(), atol=1e-6)
            np.testing.assert_allclose(
                batch["extr"][b, v], item[f"extr{v}"].numpy(), atol=1e-5)
            # crop window: ref crop_info is [[ymin, xmin], [ymax, xmax]]
            ci = item[f"crop_info{v}"].numpy()
            np.testing.assert_allclose(
                hb["context_origin"][b, v], ci[0, ::-1], atol=0,
                err_msg="crop origin")
            np.testing.assert_allclose(
                hb["context_extent"][b, v], (ci[1] - ci[0])[::-1], atol=0,
                err_msg="crop extent")
            np.testing.assert_allclose(
                batch["bb"][b, v], item[f"bb{v}"].numpy(), atol=1e-5,
                err_msg=f"bb encoding b={b} v={v}")
            # stacked (2=op/al, 24, 3) detector keypoints
            ref_kp = item[f"smpl_joints_2d{v}"].numpy()
            np.testing.assert_allclose(
                batch["gt_j2d_conf"][b, v], ref_kp[0], atol=1e-5)
            np.testing.assert_allclose(
                batch["gt_j2d_alpha"][b, v], ref_kp[1], atol=1e-5)
            # crop-frame keypoints: s·(uv − center), confidences carried
            ref_crop = item[f"smpl_joints_2d_crop{v}"].numpy()
            np.testing.assert_allclose(
                batch["gt_j2d_crop_conf"][b, v], ref_crop[0], atol=5e-3,
                err_msg="crop-frame openpose keypoints")
            # (the alphapose crop row follows the same formula; this
            # framework carries alphapose uncropped and crops at use)
            al = batch["gt_j2d_alpha"][b, v]
            center = (item[f"bb{v}"].numpy()[:2] + 1) \
                * item[f"intr{v}"].numpy()[:2, 2]
            s = item[f"bb{v}"].numpy()[2]
            np.testing.assert_allclose(
                s * (al[:, :2] - center), ref_crop[1, :, :2], atol=5e-3)

            # images: same crop geometry, different interpolation taps
            ref_im = item[f"im{v}"].numpy().transpose(1, 2, 0)
            our_im = batch["images"][b, v]
            assert ref_im.shape == our_im.shape == (224, 224, 3)
            d = np.abs(ref_im - our_im)
            assert d.mean() < 0.05, d.mean()
            assert (d > 0.5).mean() < 0.02, (d > 0.5).mean()


def test_first_cam_pinning(ref_dataset_cls, capture_dir):
    """first_cam=1 swaps the view order identically on both sides (the
    eval pinning hmr_real_res_compile.py relies on)."""
    import jax

    from airpose_tpu.data.pipeline import finish_batch
    from airpose_tpu.data.real import CopenetRealDataset

    ref = ref_dataset_cls(capture_dir, range(0, N), shuffle_cams=False,
                          first_cam=1, kp_agrmnt_threshold=100)
    ours = CopenetRealDataset(capture_dir, frame_range=range(0, N),
                              first_cam=1)
    hb = ours.host_batch([1], np.random.default_rng(0))
    batch = finish_batch(hb, jax.random.PRNGKey(0), deterministic=True,
                         margin=0.0)
    item = ref[1]
    for v in (0, 1):
        np.testing.assert_allclose(
            np.asarray(batch["intr"])[0, v], item[f"intr{v}"].numpy(),
            atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(batch["extr"])[0, v], item[f"extr{v}"].numpy(),
            atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(batch["bb"])[0, v], item[f"bb{v}"].numpy(),
            atol=1e-5)
