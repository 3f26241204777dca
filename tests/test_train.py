"""End-to-end training tests on synthetic fixtures: loss decreases, all
four model families take optimization steps, data-parallel step runs on an
8-device mesh with identical results to single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airpose_tpu.bodymodel import synthetic_smplx_params
from airpose_tpu.config import TrainConfig
from airpose_tpu.data import batch_slice, make_synthetic_dataset
from airpose_tpu.models import MODEL_REGISTRY
from airpose_tpu.parallel import make_mesh, shard_batch
from airpose_tpu.train import (
    create_train_state,
    make_singleview_step_fns,
    make_twoview_step_fns,
)

B = 4


@pytest.fixture(scope="module")
def smplx_small():
    return synthetic_smplx_params(num_vertices=222, seed=3)


@pytest.fixture(scope="module")
def dataset(smplx_small):
    # 64x64 images: the trunk's GAP is size-agnostic, and train-step tests
    # get ~12x cheaper than at the production 224 resolution.
    return make_synthetic_dataset(
        smplx_small, num_samples=8, seed=5, img_size=64, blob_sigma=3.0
    )


def _init(model_name, batch, cfg):
    model = MODEL_REGISTRY[model_name](iters=cfg.reg_iters)
    in_trans = jnp.full_like(batch["gt_trans"], 0.5)
    if model_name == "hmr":
        args = (batch["images"][:, 0],)
    elif model_name == "copenet_singleview":
        args = (batch["images"][:, 0], batch["bb"][:, 0], in_trans[:, 0])
    elif model_name == "muhmr":
        args = (batch["images"],)
    else:
        args = (batch["images"], batch["bb"], in_trans)
    from airpose_tpu.train.state import make_optimizer
    state, tx = create_train_state(
        model, args, jax.random.PRNGKey(0), lr=cfg.lr
    )
    return model, state, tx


@pytest.mark.slow
def test_twoview_loss_decreases(smplx_small, dataset):
    cfg = TrainConfig(lr=5e-5, batch_size=B)
    batch = batch_slice(dataset, 0, B)
    model, state, tx = _init("copenet_twoview", batch, cfg)
    train_step, eval_step = make_twoview_step_fns(model, smplx_small, cfg, tx)

    losses = []
    key = jax.random.PRNGKey(42)
    for i in range(25):
        key, sub = jax.random.split(key)
        state, metrics = train_step(state, batch, sub)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # Robust descent check: the tail must be clearly below the head (the
    # kp2d term has an early transient bump — seen against the reference
    # dynamics too).
    assert np.mean(losses[-5:]) < np.mean(losses[:3]), losses

    # eval step runs and produces rotmats/trans
    m, preds = eval_step(state, batch)
    assert preds["pred_rotmat"].shape == (B, 2, 22, 3, 3)
    assert preds["pred_trans"].shape == (B, 2, 3)


@pytest.mark.slow
@pytest.mark.parametrize("family", ["hmr", "copenet_singleview", "muhmr"])
def test_other_families_loss_decreases(smplx_small, dataset, family):
    """Descent, not just liveness, for the three non-flagship families —
    the same tail-below-head check the twoview family has (the kp2d term
    has an early transient, so compare means, not monotonicity)."""
    cfg = TrainConfig(lr=1e-4, batch_size=B, model=family)
    batch = batch_slice(dataset, 0, B)
    model, state, tx = _init(family, batch, cfg)
    train_step, eval_step = make_singleview_step_fns(model, smplx_small, cfg, tx, family)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(15):
        key, sub = jax.random.split(key)
        state, metrics = train_step(state, batch, sub)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:3]), (family, losses)


@pytest.mark.slow
def test_h36m_joints_loss_decreases(smplx_small, dataset):
    """The joints-only supervised loss (losses.joints_loss — the harness
    that makes the h36m:// loaders trainable) descends on a reachable
    target: H36M-style cam-frame/2D joint GT derived from the synthetic
    dataset's own SMPL-X GT."""
    from airpose_tpu.data.joints import SMPLX_TO_H36M17
    from airpose_tpu.train.losses import joints_loss

    cfg = TrainConfig(lr=1e-4, batch_size=B)
    base = batch_slice(dataset, 0, B)
    sel = list(SMPLX_TO_H36M17)
    canon = np.asarray(base["gt_joints"])[:, sel]   # canonical (B,17,3)
    orient = np.asarray(base["gt_orient"])          # (B,2,3,3)
    trans = np.asarray(base["gt_trans"])            # (B,2,3)
    cam_j = np.einsum("bvij,bkj->bvki", orient, canon) + trans[:, :, None]
    uv = cam_j / cam_j[..., 2:]
    j2d = np.einsum("bvij,bvkj->bvki", np.asarray(base["intr"]), uv)[..., :2]
    batch = {
        "images": base["images"], "bb": base["bb"], "intr": base["intr"],
        "gt_joints": jnp.asarray(cam_j.astype(np.float32)),
        "gt_j2d": jnp.asarray(j2d.astype(np.float32)),
    }

    model, state, tx = _init("copenet_twoview", base, cfg)
    train_step, eval_step = make_twoview_step_fns(
        model, smplx_small, cfg, tx, loss=joints_loss
    )
    key = jax.random.PRNGKey(21)
    losses = []
    for _ in range(15):
        key, sub = jax.random.split(key)
        state, metrics = train_step(state, batch, sub)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:3]), losses
    m, preds = eval_step(state, batch)
    assert preds["pred_rotmat"].shape == (B, 2, 22, 3, 3)


def test_totalcap_gt_matches_full_forward(smplx_small):
    """twoview_gt_from_smpl's pose/translation composition must agree with
    the REAL SMPL-X forward: composing its gt_orient/gt_trans with the
    canonical joints (exactly what twoview_loss does) equals running
    smplx_forward with the world root orient + transl and mapping through
    the extrinsics — this locks the root-pivot math (SMPL rotates about the
    canonical pelvis, not the origin)."""
    from airpose_tpu.bodymodel.smplx import smplx_forward
    from airpose_tpu.data.totalcap import twoview_gt_from_smpl
    from airpose_tpu.geometry.rotations import batch_rodrigues

    rng = np.random.default_rng(9)
    Bn = 3
    aa = rng.normal(0, 0.3, (Bn, 72)).astype(np.float32)
    betas = rng.normal(0, 1, (Bn, 10)).astype(np.float32)
    trans_w = (rng.normal(0, 1, (Bn, 3)) + [0, 0, 3]).astype(np.float32)
    extr = np.zeros((Bn, 2, 4, 4), np.float32)
    extr[..., 3, 3] = 1
    for b in range(Bn):
        for v in range(2):
            a = rng.uniform(0, 2 * np.pi)
            extr[b, v, :3, :3] = [[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                                  [-np.sin(a), 0, np.cos(a)]]
            extr[b, v, :3, 3] = rng.normal(0, 0.5, 3) + [0, 0, 5]
    intr = np.broadcast_to(
        np.asarray([[500.0, 0, 240], [0, 500.0, 135], [0, 0, 1]],
                   np.float32), (Bn, 2, 3, 3))
    hb = {"gt_pose_aa": aa, "gt_betas": betas, "gt_trans": trans_w,
          "extr": extr, "intr": intr}
    out = twoview_gt_from_smpl(hb, smplx_small)

    orient_w = np.asarray(batch_rodrigues(jnp.asarray(aa[:, :3])))
    body = np.asarray(batch_rodrigues(
        jnp.asarray(aa[:, 3:66].reshape(Bn * 21, 3)))).reshape(Bn, 21, 3, 3)
    full = smplx_forward(
        smplx_small, jnp.asarray(betas), body_pose=jnp.asarray(body),
        global_orient=jnp.asarray(orient_w)[:, None],
        transl=jnp.asarray(trans_w),
    )
    jw = np.asarray(full.joints)[:, :22]
    for v in range(2):
        jc = np.einsum("bij,bkj->bki", extr[:, v, :3, :3], jw) \
            + extr[:, v, :3, 3][:, None]
        composed = np.einsum(
            "bij,bkj->bki", out["gt_orient"][:, v], out["gt_joints"][:, :22]
        ) + out["gt_trans"][:, v][:, None]
        np.testing.assert_allclose(composed, jc, atol=2e-5)

    # gt_j2d must be the LOSS's own projection of the GT (global focal +
    # per-sample principal, cam_frame_and_project) — at the exact GT pose
    # loss_kp2d is then ~0; projecting GT with the dataset's own focal
    # instead would leave a systematic 2D gradient fighting the 3D terms
    from airpose_tpu import constants as C

    for v in range(2):
        jc = np.einsum("bij,bkj->bki", extr[:, v, :3, :3], jw) \
            + extr[:, v, :3, 3][:, None]
        expect = (jc[..., :2] / jc[..., 2:]) * np.asarray(C.FOCAL_LENGTH) \
            + intr[:, v, :2, 2][:, None]
        np.testing.assert_allclose(out["gt_j2d"][:, v], expect, atol=1e-2)

    # the precompute-cache path must agree with the direct computation
    class _FakeDS:
        db = [{"poses": aa[i], "betas": betas[i], "trans": trans_w[i]}
              for i in range(Bn)]

        def __len__(self):
            return Bn

    from airpose_tpu.data.totalcap import TotalCaptureDataset

    fake = _FakeDS()
    fake.precompute_canonical_gt = \
        TotalCaptureDataset.precompute_canonical_gt.__get__(fake)
    fake._canon_cache = None
    fake.precompute_canonical_gt(smplx_small)
    out_c = twoview_gt_from_smpl(hb, smplx_small, ds=fake,
                                 indices=list(range(Bn)))
    for k in ("gt_vertices", "gt_joints", "gt_orient", "gt_trans", "gt_j2d"):
        np.testing.assert_allclose(out_c[k], out[k], atol=1e-6)


@pytest.mark.slow
def test_data_parallel_step_on_mesh(smplx_small, dataset):
    """The same train step on a sharded batch over 8 virtual devices must
    run and produce finite metrics (GSPMD DP path)."""
    cfg = TrainConfig(lr=1e-4, batch_size=8)
    batch = batch_slice(dataset, 0, 8)
    model, state, tx = _init("copenet_twoview", batch, cfg)
    train_step, _ = make_twoview_step_fns(model, smplx_small, cfg, tx)

    mesh = make_mesh(8)
    sharded = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)
    state2, metrics = train_step(state, sharded, jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_data_parallel_step_numerically_equals_single_device(
    smplx_small, dataset
):
    """DP correctness, not just liveness: same batch + same key on 1 device
    vs sharded over 8 devices must give the same loss AND the same updated
    parameters (this is the test that catches a wrong psum / BatchNorm
    cross-shard interaction)."""
    cfg = TrainConfig(lr=1e-4, batch_size=8)
    batch = batch_slice(dataset, 0, 8)
    key = jax.random.PRNGKey(11)

    # two identical fresh states (train_step donates its input)
    model, state_a, tx = _init("copenet_twoview", batch, cfg)
    _, state_b, _ = _init("copenet_twoview", batch, cfg)
    train_step, _ = make_twoview_step_fns(model, smplx_small, cfg, tx)

    state_1dev, m1 = train_step(state_a, batch, key)

    mesh = make_mesh(8)
    sharded = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)
    state_8dev, m8 = train_step(state_b, sharded, key)

    # Bounds: cross-shard reduction order perturbs gradients at ~1e-7
    # relative, but the ×60 squared-error loss amplifies that to ~1e-3 and
    # amsgrad's sign-normalized updates flip by ±lr on near-zero-gradient
    # params — so loss within 1e-3 relative and params within ~3·lr
    # absolute. A wrong psum/BatchNorm interaction would be off by
    # O(param) ≈ 1e-2..1, far beyond these.
    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-3)
    leaves_1 = jax.tree.leaves(jax.device_get(state_1dev.params))
    leaves_8 = jax.tree.leaves(jax.device_get(state_8dev.params))
    for a, b in zip(leaves_1, leaves_8):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=3 * cfg.lr)
    # Stats bound note: the CPU backend (oneDNN) picks different conv
    # algorithms for the per-shard batch size, and that ~1e-6/conv drift
    # compounds through the trunk's 53 train-mode BN layers — a few 1e-4
    # absolute on O(0.1) stats. A local-instead-of-global BN mean (the bug
    # this test exists to catch) would be off by O(value) ≈ 0.1.
    stats_1 = jax.tree.leaves(jax.device_get(state_1dev.batch_stats))
    stats_8 = jax.tree.leaves(jax.device_get(state_8dev.batch_stats))
    for a, b in zip(stats_1, stats_8):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-3)


@pytest.mark.slow
def test_dp_x_tp_step_numerically_equals_single_device(smplx_small, dataset):
    """2-D ("data","model") mesh: batch sharded over data, wide fc/conv
    kernels sharded over model — same loss and parameters as one device
    (up to sharded-reduction order)."""
    from airpose_tpu.parallel import make_mesh_2d, param_spec, shard_params_tp
    from jax.sharding import PartitionSpec as P

    cfg = TrainConfig(lr=1e-4, batch_size=8)
    batch = batch_slice(dataset, 0, 8)
    key = jax.random.PRNGKey(13)

    model, state_a, tx = _init("copenet_twoview", batch, cfg)
    _, state_b, _ = _init("copenet_twoview", batch, cfg)
    train_step, _ = make_twoview_step_fns(model, smplx_small, cfg, tx)

    # the TP rule must actually shard the big regressor kernels
    fc1 = state_a.params["core"]["fc1"]["kernel"]
    assert param_spec(fc1, 2) == P(None, "model")
    assert param_spec(state_a.params["core"]["fc1"]["bias"], 2) == P()

    state_1dev, m1 = train_step(state_a, batch, key)

    mesh = make_mesh_2d(4, 2)
    state_b = state_b.replace(
        params=shard_params_tp(state_b.params, mesh),
        batch_stats=shard_params_tp(state_b.batch_stats, mesh),
        opt_state=shard_params_tp(state_b.opt_state, mesh),
    )
    sharded = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)
    state_tp, mtp = train_step(state_b, sharded, key)

    # The deterministic forward matches to ~6e-7 under this sharding (TP
    # logic is exact); the train step adds reduction-order noise through
    # the psum'd dec-head contractions, amplified (a) by the ×60
    # squared-error loss and (b) by amsgrad's sign-normalized updates,
    # which flip by ±lr on near-zero-gradient params. Hence: loss within
    # 3e-3 relative, params within ~3·lr absolute (a wrong collective
    # would be off by O(param) ≈ 1e-2..1, far beyond these bounds).
    assert float(m1["loss"]) == pytest.approx(float(mtp["loss"]), rel=3e-3)
    for a, b in zip(jax.tree.leaves(jax.device_get(state_1dev.params)),
                    jax.tree.leaves(jax.device_get(state_tp.params))):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=3 * cfg.lr)


@pytest.mark.slow
def test_train_reg_only_freezes_trunk(smplx_small, dataset):
    from airpose_tpu.train.state import make_optimizer

    cfg = TrainConfig(lr=1e-3, batch_size=B, train_reg_only=True)
    batch = batch_slice(dataset, 0, B)
    model = MODEL_REGISTRY["copenet_twoview"](iters=cfg.reg_iters)
    in_trans = jnp.full_like(batch["gt_trans"], 0.5)
    args = (batch["images"], batch["bb"], in_trans)
    state, tx = create_train_state(
        model, args, jax.random.PRNGKey(0), lr=cfg.lr, train_reg_only=True
    )
    train_step, _ = make_twoview_step_fns(model, smplx_small, cfg, tx)
    # materialize on host before the step: train_step donates its input
    # state, which invalidates the device buffers
    trunk_before = np.asarray(jax.tree.leaves(state.params["trunk"])[0])
    core_before = [np.asarray(a) for a in jax.tree.leaves(state.params["core"])]
    state, _ = train_step(state, batch, jax.random.PRNGKey(3))
    trunk_after = np.asarray(jax.tree.leaves(state.params["trunk"])[0])
    core_after = [np.asarray(a) for a in jax.tree.leaves(state.params["core"])]
    np.testing.assert_array_equal(trunk_before, trunk_after)
    changed = any(
        np.abs(a - b).max() > 0 for a, b in zip(core_after, core_before)
    )
    assert changed


@pytest.mark.slow
def test_real_twoview_finetune_step(smplx_small, dataset):
    """Self-supervised fine-tune: loss computes and a step runs with the
    VPoser prior in the graph."""
    from airpose_tpu.bodymodel import init_vposer_params
    from airpose_tpu.train.loop import make_real_twoview_step_fns

    cfg = TrainConfig(lr=1e-4, batch_size=B)
    batch = dict(batch_slice(dataset, 0, B))
    # fabricate confident keypoints from the GT projections
    j2d = np.asarray(batch["gt_j2d"])
    batch["gt_j2d_conf"] = jnp.asarray(
        np.concatenate([j2d, np.ones(j2d.shape[:-1] + (1,), np.float32)], -1)
    )
    model, state, tx = _init("copenet_twoview", batch, cfg)
    vp = init_vposer_params(0)
    train_step, eval_step = make_real_twoview_step_fns(model, smplx_small, vp, cfg, tx)
    state, m = train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    assert "loss_regul_vposer" in m
    m2, _ = eval_step(state, batch)
    assert np.isfinite(float(m2["loss"]))


@pytest.mark.slow
def test_real_singleview_variants(smplx_small, dataset):
    from airpose_tpu.bodymodel import init_vposer_params
    from airpose_tpu.train.loop import make_real_singleview_step_fns

    cfg = TrainConfig(lr=1e-4, batch_size=B, model="hmr")
    batch = dict(batch_slice(dataset, 0, B))
    j2d = np.asarray(batch["gt_j2d_crop"])
    batch["gt_j2d_crop_conf"] = jnp.asarray(
        np.concatenate([j2d, np.ones(j2d.shape[:-1] + (1,), np.float32)], -1)
    )
    vp = init_vposer_params(0)
    for family in ("hmr_camswap_difffl", "spin"):
        # fresh state per family: train_step donates (and so deletes) it
        model, state, tx = _init("hmr", batch, cfg)
        train_step, eval_step = make_real_singleview_step_fns(
            model, smplx_small, vp, cfg, tx, family
        )
        st, m = train_step(state, batch, jax.random.PRNGKey(0), 0)
        assert np.isfinite(float(m["loss"])), family


def test_body_only_vertex_mask(smplx_small, dataset, tmp_path):
    """--body_only_verts: hand/face vertices stop influencing the vertex
    loss (ref builds the mask at copenet_twoview.py:67-72 but never applies
    it; here it is the opt-in flag SURVEY §2.2 prescribes)."""
    import pickle

    from airpose_tpu.bodymodel.vertex_ids import load_body_vertex_mask
    from airpose_tpu.config import LossWeights
    from airpose_tpu.train import losses as L

    V = smplx_small.v_template.shape[0]
    hand_ids = np.arange(0, 10)
    face_ids = np.arange(20, 40)
    with open(tmp_path / "MANO_SMPLX_vertex_ids.pkl", "wb") as f:
        pickle.dump({"left_hand": hand_ids[:5], "right_hand": hand_ids[5:]}, f)
    np.save(tmp_path / "SMPL-X__FLAME_vertex_ids.npy", face_ids)

    mask = load_body_vertex_mask(str(tmp_path), V)
    assert mask.shape == (V,)
    assert (mask[hand_ids] == 0).all() and (mask[face_ids] == 0).all()
    assert mask.sum() == V - 30

    batch = batch_slice(dataset, 0, B)
    rng = jax.random.PRNGKey(7)
    pose = 0.1 * jax.random.normal(rng, (B, 2, 135))
    betas = 0.1 * jax.random.normal(rng, (B, 2, 10))
    w = LossWeights()

    # perturbing GT at a MASKED vertex: masked loss invariant, unmasked not
    batch_pert = dict(batch)
    gtv = np.array(batch["gt_vertices"])
    gtv[:, hand_ids[0]] += 5.0
    batch_pert["gt_vertices"] = jnp.asarray(gtv)

    m = jnp.asarray(mask)
    l_masked, _ = L.twoview_loss(pose, betas, batch, smplx_small, w,
                                 vertex_mask=m)
    l_masked_p, _ = L.twoview_loss(pose, betas, batch_pert, smplx_small, w,
                                   vertex_mask=m)
    l_plain, _ = L.twoview_loss(pose, betas, batch, smplx_small, w)
    l_plain_p, _ = L.twoview_loss(pose, betas, batch_pert, smplx_small, w)
    np.testing.assert_allclose(float(l_masked), float(l_masked_p), rtol=1e-6)
    assert abs(float(l_plain) - float(l_plain_p)) > 1e-3

    # the single-view/muhmr losses honor the same kwarg
    pose1 = pose[:, 0]
    cam = 0.1 * jax.random.normal(rng, (B, 2, 3))
    for fn, args in (
        (L.singleview_loss, (pose1, betas[:, 0])),
        (L.hmr_loss, (pose[:, 0, 3:], betas[:, 0], cam[:, 0])),
        (L.muhmr_loss, (pose[..., 3:], betas, cam)),
    ):
        la, _ = fn(*args, batch, smplx_small, w, vertex_mask=m)
        lb, _ = fn(*args, batch_pert, smplx_small, w, vertex_mask=m)
        np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
