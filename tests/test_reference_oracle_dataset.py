"""AerialPeople dataset-pipeline oracle vs the reference's OWN reader.

Runs the reference's ``aerialpeople_crop`` dataset
(/root/reference/copenet/src/copenet/dsets/aerialpeople.py) on a dataset
written by THIS framework's ``tools/create_aerialpeople.py`` generator,
and compares every GT field of the reference's ``__getitem__`` against
our ``AerialPeopleDataset.host_batch`` + ``pipeline.finish_batch`` on the
same samples. Two claims at once:

  1. the generator's on-disk schema is genuinely reference-consumable
     (batched GT arrays for its torch.bmm transform_smpl, relative image
     paths under the pkl root, integral bb corners);
  2. our host-reader + device-pipeline composition reproduces the
     reference's per-sample math end-to-end: the bb conditioning encoding
     (center/principal − 1, 224/max-extent scale), the world→camera GT
     transform (transform_smpl), the full-frame 2D GT projection
     (global FOCAL_LENGTH convention), the crop-frame 2D GT
     (s·(uv − crop_center)), and the axis-angle→rotmat GT pose.

Determinism alignment: the reference draws per-side crop-jitter offsets
and a random camera swap with np.random.randint
(ref dsets/aerialpeople.py:103-127, 208) — patched to 0 here, which makes
its crop exactly the stored bb±200-clamped window; our side runs
``finish_batch(deterministic=True)`` + ``swap_cams=False``, whose
deterministic crop box is that same window (pipeline.jitter_crop_boxes).

Images are compared loosely: the reference resizes with cv2 bilinear
(utils/utils.py:214-235), we use jax scale_and_translate — same geometry,
different interpolation taps (documented in data/pipeline.py:19-20).

Stubs (external deps only, none touched by the compared math):
torchvision.transforms (functional ToTensor/Normalize replicas), imgaug,
torchgeometry (import-only), the smplx submodule (empty in the reference
checkout): its SMPLX classes are routed through THIS framework's
``smplx_forward`` on the fixture's synthetic body-model params — the SAME
body model both sides — so the reference's canonical gendered-forward
plumbing (betas/rotmat-pose composition, identity root) and its
``transform_smpl`` cam-frame GT verts/joints are compared against our
``precompute_canonical_gt`` cache + ``cam_frame_and_project`` composition
(what remains un-oracle-able in-image is only the true fork's SMPL-X
numerics, subsumed by the released-asset parity run).
lbs.batch_rodrigues is routed to the reference's OWN
utils.geometry.batch_rodrigues so the gt pose-rotmat comparison stays a
pure reference oracle.
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


class _ToTensor:
    """torchvision.transforms.ToTensor replica for the two uses the
    reference reader makes of it (float ndarray (H,W) → (1,H,W); it never
    feeds uint8 images through ToTensor)."""

    def __call__(self, a):
        t = torch.from_numpy(np.array(a, np.float32, copy=True))
        if t.ndim == 2:
            return t[None]
        if t.ndim == 3:
            return t.permute(2, 0, 1)
        return t


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
    tvt.ToTensor, tvt.Normalize = _ToTensor, _Normalize
    tv.transforms = tvt

    _mod("torchgeometry")
    ia = _mod("imgaug")
    ia.augmenters = _mod("imgaug.augmenters")

    for p in (f"{REF}/copenet/src",):
        if p not in sys.path:
            sys.path.insert(0, p)

    from copenet.utils.geometry import batch_rodrigues as ref_rodrigues

    class _FakeSMPLX:
        """The empty-submodule SMPLX routed through THIS framework's
        smplx_forward on the fixture's synthetic params — same body model
        both sides, so the reference's gendered canonical-forward plumbing
        is actually exercised (module doc)."""

        def __init__(self, *a, **k):
            from airpose_tpu.bodymodel import synthetic_smplx_params

            # must match the dataset_dir fixture's generator args
            self.params = synthetic_smplx_params(num_vertices=90, seed=3)

        def forward(self, betas=None, body_pose=None, global_orient=None,
                    transl=None, pose2rot=False):
            import jax.numpy as jnp

            from airpose_tpu.bodymodel import smplx_forward

            assert not pose2rot and float(transl.abs().max()) == 0.0
            out = smplx_forward(
                self.params,
                jnp.asarray(betas.numpy()),
                body_pose=jnp.asarray(body_pose.numpy()),
                global_orient=jnp.asarray(global_orient.numpy()),
            )
            return types.SimpleNamespace(
                vertices=torch.from_numpy(np.array(out.vertices, copy=True)),
                joints=torch.from_numpy(np.array(out.joints, copy=True)))

    sm = _mod("copenet.smplx")
    smm = _mod("copenet.smplx.smplx")
    smm.SMPLX = _FakeSMPLX
    smm.lbs = types.SimpleNamespace(batch_rodrigues=ref_rodrigues)
    sm.smplx = smm
    # make the (possibly stubbed) package traversable to the real submodule
    ds_pkg = _mod("copenet.dsets")
    if not hasattr(ds_pkg, "__path__"):
        ds_pkg.__path__ = [f"{REF}/copenet/src/copenet/dsets"]
    # test_reference_oracle_losses installs an EMPTY 'copenet.dsets.aerialpeople'
    # stub; if that test ran first in this process, the import below would hit
    # the stub instead of the reference module — evict any stale stub first.
    stale = sys.modules.get("copenet.dsets.aerialpeople")
    if stale is not None and not hasattr(stale, "aerialpeople_crop"):
        sys.modules.pop("copenet.dsets.aerialpeople")

    import copenet.dsets.aerialpeople as ref_ap
    return ref_ap.aerialpeople_crop


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    from airpose_tpu.tools.create_aerialpeople import main as create_main

    out = str(tmp_path_factory.mktemp("ap_oracle") / "ds")
    create_main(["--out", out, "--subjects", "2", "--poses-per-subject", "2",
                 "--num-vertices", "90", "--render-blobs", "--seed", "3"])
    return out


def test_dataset_oracle(ref_dataset_cls, dataset_dir, monkeypatch):
    import jax
    import jax.numpy as jnp  # noqa: F401  (jax initialized before use)

    from airpose_tpu.data.aerialpeople import AerialPeopleDataset
    from airpose_tpu.data.pipeline import finish_batch

    # zero jitter offsets + camera order (0, 1) — see module doc
    monkeypatch.setattr(np.random, "randint", lambda *a, **k: 0)
    ref_ds = ref_dataset_cls(
        datapath=os.path.join(dataset_dir, "dataset", "train_pkls.pkl"))
    idxs = list(range(len(ref_ds)))
    ref_items = [ref_ds[i] for i in idxs]

    from airpose_tpu.bodymodel import synthetic_smplx_params
    from airpose_tpu.train.losses import cam_frame_and_project

    params = synthetic_smplx_params(num_vertices=90, seed=3)
    ours = AerialPeopleDataset(dataset_dir, "train")
    cache = ours.precompute_canonical_gt(params)
    hb = ours.host_batch(idxs, np.random.default_rng(0), swap_cams=False)
    batch = finish_batch(hb, jax.random.PRNGKey(0), deterministic=True)
    batch = {k: np.asarray(v) for k, v in batch.items()}

    # cam-frame GT verts/joints: the reference transform_smpl's the pkl's
    # WORLD arrays per view (ref :160-164); ours composes gt_orient/
    # gt_trans with the canonical cache (cam_frame_and_project) — same
    # rigid transform, different factorization
    B = len(idxs)
    njoints = cache["joints"].shape[1]
    cam_j, _ = cam_frame_and_project(
        jnp.asarray(hb["gt_orient"]), jnp.asarray(hb["gt_trans"]),
        jnp.broadcast_to(jnp.asarray(cache["joints"])[:, None],
                         (B, 2, njoints, 3)),
        jnp.asarray(hb["intr"]), (1475.0, 1475.0))
    cam_v, _ = cam_frame_and_project(
        jnp.asarray(hb["gt_orient"]), jnp.asarray(hb["gt_trans"]),
        jnp.broadcast_to(jnp.asarray(cache["vertices"])[:, None],
                         (B, 2, 90, 3)),
        jnp.asarray(hb["intr"]), (1475.0, 1475.0))
    cam_j, cam_v = np.asarray(cam_j), np.asarray(cam_v)

    # fixture windows fit the context buffer at native resolution — the
    # image comparison below would be meaningless through a downsample
    assert (hb["context_scale"] == 1).all()

    for b, item in enumerate(ref_items):
        np.testing.assert_allclose(
            batch["gt_pose_rotmat"][b], item["smplpose_rotmat"].numpy(),
            atol=1e-5, err_msg="pose rotmat")
        np.testing.assert_allclose(
            batch["gt_betas"][b], item["smplbetas"].numpy(), atol=1e-6)
        # the reference's per-sample gendered canonical forward vs our
        # one-time cache (same synthetic body model both sides)
        np.testing.assert_allclose(
            cache["vertices"][b], item["smpl_vertices"].numpy()[0],
            atol=1e-5, err_msg="canonical GT vertices")
        np.testing.assert_allclose(
            cache["joints"][b], item["smpl_joints"].numpy()[0],
            atol=1e-5, err_msg="canonical GT joints")
        for v in (0, 1):
            np.testing.assert_allclose(
                cam_j[b, v], item[f"smpl_joints_rel{v}"].numpy()[0],
                atol=5e-4, err_msg="cam-frame GT joints")
            np.testing.assert_allclose(
                cam_v[b, v], item[f"smpl_vertices_rel{v}"].numpy()[0],
                atol=5e-4, err_msg="cam-frame GT vertices")
        for v in (0, 1):
            np.testing.assert_allclose(
                batch["bb"][b, v], item[f"bb{v}"].numpy(), atol=1e-4,
                err_msg=f"bb encoding b={b} v={v}")
            np.testing.assert_allclose(
                batch["gt_trans"][b, v],
                item[f"smpltrans_rel{v}"].numpy(), atol=1e-4,
                err_msg="gt trans")
            np.testing.assert_allclose(
                batch["gt_orient"][b, v],
                item[f"smplorient_rel{v}"].numpy()[0], atol=1e-5,
                err_msg="gt orient")
            np.testing.assert_allclose(
                batch["gt_j2d"][b, v],
                item[f"smpl_joints_2d{v}"].numpy()[0, :24], atol=2e-2,
                err_msg="full-frame 2D GT")
            np.testing.assert_allclose(
                batch["gt_j2d_crop"][b, v],
                item[f"smpl_joints_2d_crop{v}"].numpy()[:24], atol=2e-2,
                err_msg="crop-frame 2D GT")

            # images: same crop geometry, different interpolation taps —
            # loose bounds (normalized units; 1 uint8 step ≈ 0.017)
            ref_im = item[f"im{v}"].numpy().transpose(1, 2, 0)
            our_im = batch["images"][b, v]
            assert ref_im.shape == our_im.shape == (224, 224, 3)
            d = np.abs(ref_im - our_im)
            assert d.mean() < 0.05, d.mean()
            assert (d > 0.5).mean() < 0.02, (d > 0.5).mean()
