from .rotations import (
    aa_to_rotmat,
    batch_rodrigues,
    quat_to_rotmat,
    rot6d_to_rotmat,
    rotmat_to_aa,
    rotmat_to_rot6d,
)
from .projection import (
    estimate_translation,
    perspective_projection,
    transform_points,
    transform_smpl,
    weak_cam_from_position,
    weak_cam_to_trans,
    lstsq_triangulation,
)
from .robust import geman_mcclure

__all__ = [
    "aa_to_rotmat",
    "batch_rodrigues",
    "quat_to_rotmat",
    "rot6d_to_rotmat",
    "rotmat_to_aa",
    "rotmat_to_rot6d",
    "estimate_translation",
    "perspective_projection",
    "transform_points",
    "transform_smpl",
    "weak_cam_from_position",
    "weak_cam_to_trans",
    "lstsq_triangulation",
    "geman_mcclure",
]
