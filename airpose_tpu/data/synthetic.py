"""Synthetic fixture dataset: geometrically consistent two-view samples
generated from a (synthetic or real) SMPL-X model.

Serves the role of the reference's AerialPeople pkls for tests/benchmarks
(the real dataset is external): a body with random shape/pose/world pose is
observed by two cameras; ground truth (canonical mesh, per-view root
orient/trans, full-image and crop-frame 2D joints, bb encodings) follows the
exact conventions of ref copenet/dsets/aerialpeople.py:81-226:

  * bb = (crop_center / principal_point − 1, crop_scale)     (:134-135,200)
  * crop 2D coords = scale · (full_coords − crop_center)     (:172)
  * GT canonical mesh at identity root / zero transl         (:180-197)
  * per-view GT via transform_smpl(extr, ...)                (:160-164)

Images are joint-blob renderings (one Gaussian per body joint in crop
coordinates): enough visual signal for overfit tests without a renderer.
Everything is computed with vectorized JAX on whatever backend is active.
"""

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..bodymodel.smplx import SMPLXParams, smplx_forward
from ..geometry.rotations import batch_rodrigues


def _rot_y(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    z = jnp.zeros_like(angle)
    o = jnp.ones_like(angle)
    return jnp.stack(
        [jnp.stack([c, z, s], -1), jnp.stack([z, o, z], -1), jnp.stack([-s, z, c], -1)],
        axis=-2,
    )


def make_synthetic_dataset(
    smplx_params: SMPLXParams,
    num_samples: int,
    seed: int = 0,
    img_size: int = C.CROP_SIZE,
    cam_distance: float = 8.0,
    blob_sigma: float = 4.0,
) -> Dict[str, np.ndarray]:
    """Returns a dict of host numpy arrays in the canonical batch layout."""
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 8)
    N = num_samples

    betas = jax.random.normal(ks[0], (N, 10)) * 0.5
    pose_aa = jax.random.normal(ks[1], (N, 21, 3)) * 0.2
    pose_rotmat = batch_rodrigues(pose_aa)
    orient_w = batch_rodrigues(jax.random.normal(ks[2], (N, 3)) * 0.5)
    trans_w = jax.random.normal(ks[3], (N, 3)) * jnp.asarray([1.0, 0.5, 1.0])

    # Canonical (identity-root) body — the GT frame of the 3D losses.
    canon = smplx_forward(
        smplx_params,
        betas,
        body_pose=pose_rotmat,
        global_orient=jnp.broadcast_to(jnp.eye(3), (N, 1, 3, 3)),
    )

    # Two cameras: distinct yaws, person ~cam_distance in front.
    angles = jnp.stack(
        [
            jax.random.uniform(ks[4], (N,), minval=-0.4, maxval=0.0),
            jax.random.uniform(ks[5], (N,), minval=0.3, maxval=0.7),
        ],
        axis=1,
    )  # (N, 2)
    R_cam = _rot_y(angles)  # (N, 2, 3, 3)
    t_cam = jnp.broadcast_to(jnp.asarray([0.0, 0.0, cam_distance]), (N, 2, 3))
    extr = jnp.concatenate([R_cam, t_cam[..., None]], axis=-1)  # (N, 2, 3, 4)

    fx, fy = C.FOCAL_LENGTH
    intr = jnp.broadcast_to(
        jnp.asarray([[fx, 0, C.CX], [0, fy, C.CY], [0, 0, 1.0]]), (N, 2, 3, 3)
    )

    # Per-view GT root pose.
    orient_rel = jnp.einsum("nvij,njk->nvik", R_cam, orient_w)
    trans_rel = jnp.einsum("nvij,nj->nvi", R_cam, trans_w) + t_cam

    # Per-view camera-frame joints and full-image 2D.
    joints22 = canon.joints[:, :22]
    cam_joints = (
        jnp.einsum("nvij,nkj->nvki", orient_rel, joints22)
        + trans_rel[:, :, None, :]
    )
    xy = cam_joints[..., :2] / cam_joints[..., 2:]
    j2d_full = xy * jnp.asarray([fx, fy]) + jnp.asarray([C.CX, C.CY])  # (N,2,22,2)

    # Crop window from the joint bbox ±50px margin (ref copenet_real.py:188-204
    # style), clamped to the frame.
    mins = j2d_full.min(axis=2) - 50.0
    maxs = j2d_full.max(axis=2) + 50.0
    mins = jnp.clip(mins, 0.0, jnp.asarray([C.IMG_SIZE[0], C.IMG_SIZE[1]], dtype=jnp.float32))
    maxs = jnp.clip(maxs, 0.0, jnp.asarray([C.IMG_SIZE[0], C.IMG_SIZE[1]], dtype=jnp.float32))
    center = (mins + maxs) / 2.0  # (N, 2, 2)
    extent = jnp.maximum(maxs - mins, 1.0)
    scale = img_size / jnp.max(extent, axis=-1)  # (N, 2)

    bb = jnp.concatenate(
        [center / jnp.asarray([C.CX, C.CY]) - 1.0, scale[..., None]], axis=-1
    )  # (N, 2, 3)
    j2d_crop = scale[..., None, None] * (j2d_full - center[:, :, None, :])

    # Blob images at crop coords (+img_size/2 to pixel space).
    blob_xy = j2d_crop + img_size / 2.0
    ii = jnp.arange(img_size, dtype=jnp.float32)
    gy = jnp.exp(
        -((ii[None, None, :, None] - blob_xy[..., 1][:, :, None, :]) ** 2)
        / (2 * blob_sigma ** 2)
    )  # (N, 2, H, 22)
    gx = jnp.exp(
        -((ii[None, None, :, None] - blob_xy[..., 0][:, :, None, :]) ** 2)
        / (2 * blob_sigma ** 2)
    )  # (N, 2, W, 22)
    img = jnp.einsum("nvhk,nvwk->nvhw", gy, gx)
    img = jnp.clip(img, 0.0, 1.0)
    # 3 channels, ImageNet-normalized like the real pipeline (:174).
    mean = jnp.asarray(C.IMG_NORM_MEAN)
    std = jnp.asarray(C.IMG_NORM_STD)
    images = (img[..., None] - mean) / std

    data = {
        "images": images,                                  # (N,2,H,W,3)
        "bb": bb,                                          # (N,2,3)
        "intr": intr,                                      # (N,2,3,3)
        "extr": extr,                                      # (N,2,3,4)
        "gt_trans": trans_rel,                             # (N,2,3)
        "gt_orient": orient_rel,                           # (N,2,3,3)
        "gt_pose_rotmat": pose_rotmat,                     # (N,21,3,3)
        "gt_betas": betas,                                 # (N,10)
        "gt_vertices": canon.vertices,                     # (N,V,3)
        "gt_joints": canon.joints,                         # (N,127,3)
        "gt_j2d": j2d_full,                                # (N,2,22,2)
        "gt_j2d_crop": j2d_crop,                           # (N,2,22,2)
    }
    return {k: np.asarray(v, dtype=np.float32) for k, v in data.items()}


def batch_slice(data: Dict[str, np.ndarray], start: int, size: int):
    return {k: jnp.asarray(v[start : start + size]) for k, v in data.items()}
