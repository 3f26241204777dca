"""Framework-wide constants.

Mirrors the reference's `copenet/src/copenet/constants.py:1-20` and
`copenet_real/src/copenet_real/constants.py:12-18` (joint tables live in
`data/joints.py`). Values are plain Python so they are jit-static.
"""

# Synthetic (AerialPeople) camera model — ref copenet/constants.py:7-11.
FOCAL_LENGTH = (1475.0, 1475.0)
IMG_SIZE = (1920, 1080)  # (W, H)
CX = IMG_SIZE[0] / 2.0
CY = IMG_SIZE[1] / 2.0

# Real (DJI) per-camera intrinsics — ref copenet_real/constants.py:12-17.
# The CX/CY pairs are the reference's calibrated principal points, used
# there only by its visualization Renderer (copenet_twoview.py:89,93);
# the eval/loss paths take principal points from the calib yml.
REAL_FOCAL_LENGTH0 = (1537.0, 1517.0)
REAL_FOCAL_LENGTH1 = (1361.0, 1378.0)
REAL_CX0, REAL_CY0 = 1018.0, 577.0
REAL_CX1, REAL_CY1 = 978.0, 667.0

NUM_ITERS = 3           # IEF iterations — ref copenet/constants.py:8
CROP_SIZE = 224         # network input resolution
TRANS_SCALE = 0.05      # distance scaling applied to translations in the IEF
                        # state — ref copenet/copenet_twoview.py:199-203

NUM_BETAS = 10
NUM_BODY_JOINTS = 21    # articulated SMPL-X body joints (no root)
NUM_JOINTS = 22         # body joints incl. root/global orient
NUM_SMPLX_VERTS = 10475
NUM_SMPLX_JOINTS = 55   # J_regressor joints
NUM_OUTPUT_JOINTS = 127 # 55 + 21 vertex-selected + 51 face landmarks

# ImageNet normalization (the trunk is ImageNet-pretrained) —
# ref copenet/constants.py:19-20.
IMG_NORM_MEAN = (0.485, 0.456, 0.406)
IMG_NORM_STD = (0.229, 0.224, 0.225)

# 3D-joint / rotmat limb up-weighting index sets —
# ref copenet/copenet_twoview.py:114-115,133-134.
LIMB_JOINTS_3D_L1 = (4, 5, 18, 19)    # knees, elbows     (×w)
LIMB_JOINTS_3D_L2 = (7, 8, 20, 21)    # ankles, wrists    (×w²)
LIMB_ROTMAT_L1 = (3, 4, 17, 18)       # same, shifted by the missing root
LIMB_ROTMAT_L2 = (6, 7, 19, 20)

# Wire format of the 3-step drone sync protocol: 145 float32 =
# 10 betas + 3 trans (pre-scaled by TRANS_SCALE) + 22*6 pose —
# ref copenet_real/scripts/copenet_rosViz.py:83-85.
WIRE_NUM_FLOATS = 145
