"""airpose_tpu — TPU-native multi-view aerial 3D human pose & shape estimation.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of AirPose
(robot-perception-group/AirPose): two-view SMPL-X body regression with
iterative error feedback and cross-view conditioning, synthetic supervised
training, self-supervised real-data fine-tuning with a VPoser prior, the
AirPose+ bundle-adjustment refinement, MPJPE/PA-MPJPE evaluation, and a
3-step two-drone synchronization serving protocol.

Layer map (see SURVEY.md §1 for the reference equivalents):
  geometry/   rotation & projection math          (ref: copenet/utils/geometry.py)
  bodymodel/  SMPL-X + VPoser in JAX              (ref: smplx submodule call sites)
  models/     ResNet-50 trunk + IEF regressors    (ref: copenet/models/*)
  data/       dataset readers + device pipeline   (ref: copenet/dsets/*)
  train/      losses, optax state, pjit loop      (ref: copenet/*_twoview.py etc.)
  eval/       MPJPE / MPE / PA-MPJPE              (ref: scripts/*_res_compile.py)
  optim/      AirPose+ bundle adjustment          (ref: copenet_real_data/scripts/bundle_adj.py)
  parallel/   mesh + sharding rules               (new; ref has single-GPU only)
  serve/      staged 3-step protocol + TCP server (ref: aircap submodule, README)
"""

__version__ = "0.1.0"
