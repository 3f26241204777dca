"""Camera projection and rigid-transform utilities (pure JAX, batched).

Contracts mirror the reference:
  - ``perspective_projection``: ref copenet/utils/geometry.py:63-91.
  - ``transform_smpl``: ref copenet/utils/utils.py:237-256.
  - weak-perspective helpers: ref copenet/utils/utils.py:167-210.
  - ``lstsq_triangulation``: ref copenet/utils/geometry.py:160-191, rewritten
    as a closed-form batched normal-equation solve instead of a Python loop.
"""

from typing import Optional, Tuple

import jax.numpy as jnp


def perspective_projection(
    points: jnp.ndarray,
    rotation: jnp.ndarray,
    translation: jnp.ndarray,
    focal_length,
    camera_center: jnp.ndarray,
) -> jnp.ndarray:
    """Project 3D points to pixel coordinates.

    Args:
      points: (B, N, 3) camera- or world-frame points.
      rotation: (B, 3, 3) camera rotation.
      translation: (B, 3) camera translation.
      focal_length: length-2 (fx, fy) — the reference indexes
        ``focal_length[0]``/``[1]`` globally, not per sample
        (geometry.py:76-77), so a single (fx, fy) applies to the batch.
      camera_center: (B, 2) principal point. Leading singleton dims are
        squeezed, reproducing the reference call sites that pass an
        ``unsqueeze(0)``-ed center (copenet_twoview.py:311).

    Returns: (B, N, 2) pixel coordinates.
    """
    camera_center = jnp.asarray(camera_center)
    # Tolerate the reference's (1, B, 2) calling convention.
    while camera_center.ndim > 2:
        camera_center = camera_center.squeeze(0)
    if camera_center.ndim == 1:
        camera_center = camera_center[None]

    focal_length = jnp.asarray(focal_length, dtype=points.dtype)
    cam_pts = (
        jnp.einsum("bij,bkj->bki", rotation, points, precision="highest")
        + translation[:, None, :]
    )
    proj = cam_pts / cam_pts[..., -1:]
    xy = proj[..., :2] * focal_length[None, None, :2] + camera_center[:, None, :]
    return xy


def transform_points(trans_mat: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply (B, 3, 4)-or-(B, 4, 4) rigid transforms to (B, N, 3) points."""
    return (
        jnp.einsum("bij,bnj->bni", trans_mat[:, :3, :3], points, precision="highest")
        + trans_mat[:, None, :3, 3]
    )


def transform_smpl(
    trans_mat: jnp.ndarray,
    vertices: Optional[jnp.ndarray] = None,
    joints: Optional[jnp.ndarray] = None,
    orientation: Optional[jnp.ndarray] = None,
    trans: Optional[jnp.ndarray] = None,
) -> Tuple[
    Optional[jnp.ndarray], Optional[jnp.ndarray], Optional[jnp.ndarray], Optional[jnp.ndarray]
]:
    """Apply a batched rigid transform to any subset of SMPL quantities.

    Same contract as ref utils/utils.py:237-256: returns
    (vertices, joints, orientation, trans), each None if not given.
    ``orientation`` is (B, k, 3, 3) or (B, 3, 3) and is only rotated.
    """
    R, t = trans_mat[:, :3, :3], trans_mat[:, :3, 3]
    out_v = transform_points(trans_mat, vertices) if vertices is not None else None
    out_j = transform_points(trans_mat, joints) if joints is not None else None
    out_o = None
    if orientation is not None:
        if orientation.ndim == 4:
            out_o = jnp.einsum("bij,bkjl->bkil", R, orientation, precision="highest")
        else:
            out_o = jnp.einsum("bij,bjl->bil", R, orientation, precision="highest")
    out_t = (
        jnp.einsum("bij,bj->bi", R, trans, precision="highest") + t
        if trans is not None
        else None
    )
    return out_v, out_j, out_o, out_t


def weak_cam_from_position(intr: jnp.ndarray, position: jnp.ndarray) -> jnp.ndarray:
    """(B, 3, 3) intrinsics + (B, 3) camera-frame root position →
    (B, 3) weak-perspective camera (sz, sx, sy).

    Ref utils/utils.py:167-187 (get_weak_persp_cam_full_img_gt, batched).
    """
    fy = intr[:, 1, 1]
    cy = intr[:, 1, 2]
    z = jnp.abs(position[:, 2])
    sx = position[:, 0] / z
    sy = position[:, 1] / z
    sz = fy / (z * cy)
    return jnp.stack([sz, sx, sy], axis=1)


def weak_cam_to_trans(intr: jnp.ndarray, weak_cam: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ``weak_cam_from_position`` — ref utils/utils.py:189-196."""
    fy = intr[:, 1, 1]
    cy = intr[:, 1, 2]
    z = fy / (weak_cam[:, 0] * cy)
    x = weak_cam[:, 1] * z
    y = weak_cam[:, 2] * z
    return jnp.stack([x, y, z], axis=1)


def lstsq_triangulation(
    intrinsics: jnp.ndarray, extrinsics: jnp.ndarray, points_2d: jnp.ndarray
) -> jnp.ndarray:
    """DLT-style multi-view triangulation.

    Args:
      intrinsics: (C, 3, 3), extrinsics: (C, 3, 4) or (C, 4, 4)
        world→camera, points_2d: (C, 2).
    Returns: (3,) world point minimizing the normalized algebraic error —
      the same normal equations as ref geometry.py:160-191, solved with one
      batched einsum instead of a per-camera Python loop.
    """
    pts_h = jnp.concatenate([points_2d, jnp.ones_like(points_2d[..., :1])], axis=-1)
    norm_pts = jnp.einsum(
        "cij,cj->ci", jnp.linalg.inv(intrinsics), pts_h, precision="highest"
    )
    extr = extrinsics[:, :3, :]
    # Per camera: A_c = outer(n_xy, r3[:3]) - R[0:2,:3];  b_c = t[0:2] - t_z * n_xy
    A = (
        norm_pts[:, :2, None] * extr[:, 2:3, :3]
        - extr[:, 0:2, :3]
    ).reshape(-1, 3)
    b = (extr[:, 0:2, 3] - extr[:, 2:3, 3] * norm_pts[:, :2]).reshape(-1)
    AtA = jnp.matmul(A.T, A, precision="highest")
    Atb = jnp.matmul(A.T, b, precision="highest")
    return jnp.linalg.solve(AtA, Atb)


def estimate_translation(
    joints_3d: jnp.ndarray,   # (B, N, 3)
    joints_2d: jnp.ndarray,   # (B, N, 3) [u, v, conf]
    focal_length: float = 5000.0,
    img_size: float = 224.0,
) -> jnp.ndarray:
    """Weighted least-squares camera translation from 2D/3D correspondences.

    Batched closed-form version of ref geometry.py:94-157 (the reference
    loops per sample in numpy): solve min ||W(Q t − c)|| for t where each
    joint contributes two rows  f·t_x + (c_x − u)·t_z = (u − c_x)·Z − f·X
    (and the y analogue), weights √conf.
    """
    f = jnp.asarray([focal_length, focal_length], dtype=joints_3d.dtype)
    center = jnp.asarray([img_size / 2.0, img_size / 2.0], dtype=joints_3d.dtype)
    XY = joints_3d[..., :2]          # (B, N, 2)
    Z = joints_3d[..., 2:]           # (B, N, 1)
    uv = joints_2d[..., :2]
    w = jnp.sqrt(jnp.maximum(joints_2d[..., 2:], 0.0))  # (B, N, 1)

    B, N = XY.shape[:2]
    # Rows for x: [f, 0, c_x - u]; rows for y: [0, f, c_y - v].
    zeros = jnp.zeros((B, N), XY.dtype)
    fx = jnp.broadcast_to(f[0], (B, N))
    fy = jnp.broadcast_to(f[1], (B, N))
    rows_x = jnp.stack([fx, zeros, center[0] - uv[..., 0]], axis=-1)
    rows_y = jnp.stack([zeros, fy, center[1] - uv[..., 1]], axis=-1)
    Q = jnp.concatenate([rows_x, rows_y], axis=1)        # (B, 2N, 3)
    c = jnp.concatenate(
        [
            (uv[..., 0] - center[0]) * Z[..., 0] - f[0] * XY[..., 0],
            (uv[..., 1] - center[1]) * Z[..., 0] - f[1] * XY[..., 1],
        ],
        axis=1,
    )  # (B, 2N)
    ww = jnp.concatenate([w[..., 0], w[..., 0]], axis=1)  # (B, 2N)
    Qw = Q * ww[..., None]
    cw = c * ww
    A = jnp.einsum("bni,bnj->bij", Qw, Qw, precision="highest")
    b = jnp.einsum("bni,bn->bi", Qw, cw, precision="highest")
    return jnp.linalg.solve(A, b[..., None])[..., 0]


def weak_cam_crop_to_full_trans(
    weak_cam: jnp.ndarray,  # (B, 3) crop-frame (s, tx, ty)
    bb: jnp.ndarray,        # (B, 3) (center/principal - 1, crop scale)
    intr: jnp.ndarray,      # (B, 3, 3) full-image intrinsics
    focal,                  # (fx, fy) used by the weak camera
    img_res: int = 224,
) -> jnp.ndarray:
    """Convert an HMR-style crop-frame weak-perspective camera into a
    full-image camera-frame root translation.

    Replicates ref copenet/hmr.py:163-193 (the test-output path that turns
    (s, tx, ty) + the crop's bb encoding into pred_smpltrans): build the
    crop-modified intrinsics, reproject the weak translation through the
    full intrinsics, rescale depth by the crop scale.
    """
    f = jnp.asarray(focal, dtype=weak_cam.dtype)
    cam_t = jnp.stack(
        [weak_cam[:, 1], weak_cam[:, 2],
         2 * f[0] / (img_res * weak_cam[:, 0] + 1e-9)],
        axis=-1,
    )
    s = bb[:, 2]
    fx_full = intr[:, 0, 0]
    fy_full = intr[:, 1, 1]
    principal = intr[:, :2, 2]
    # modif_intr @ cam_t  (ref hmr.py:183-187)
    mx = (f[0] / s) * cam_t[:, 0] + bb[:, 0] * principal[:, 0] * cam_t[:, 2]
    my = (f[1] / s) * cam_t[:, 1] + bb[:, 1] * principal[:, 1] * cam_t[:, 2]
    mz = cam_t[:, 2]
    # inv(intr with zeroed principal point) @ m
    v = jnp.stack([mx / fx_full, my / fy_full, mz], axis=-1)
    z = cam_t[:, 2] * s
    return v * (z / v[:, 2])[:, None]
