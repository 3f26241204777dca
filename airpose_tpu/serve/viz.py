"""Result visualization — the copenet_rosViz equivalent.

The reference subscribes to the step3 ROS topic, decodes the 145-float
message, runs SMPL-X, and shows the mesh in meshcat (ref
copenet_real/scripts/copenet_rosViz.py:82-104). Here: connect to a running
AirPose server as a client (sending a probe image) or decode recorded
145-float results, then render mesh overlays to PNGs with the software
rasterizer.

Usage:
  python -m airpose_tpu.serve.viz --wire results.npy --out viz/ \
      [--smplx_model_dir DIR] [--focal 1475 1475]
  (results.npy: (N, 145) float32 wire messages)
"""

import argparse
import os

import numpy as np

from .. import constants as C


def render_wire_messages(
    wire: np.ndarray, smplx_params, out_dir: str,
    focal=(1475.0, 1475.0), image_size=(960, 540), max_frames: int = 16,
):
    """(N, 145) wire floats → overlay PNGs. Returns written paths.

    ``focal`` is expressed at the capture's FULL resolution
    (constants.IMG_SIZE, 1920×1080 — the convention every focal constant
    in this codebase uses); it is rescaled per-axis to whatever
    ``image_size`` canvas is rendered, so a full-res canvas projects
    correctly too (not just the half-res default)."""
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..bodymodel.smplx import smplx_forward
    from ..geometry.rotations import rot6d_to_rotmat
    from ..serve.protocol import unpack_params
    from ..utils.render import overlay_mesh

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(min(len(wire), max_frames)):
        betas, trans, pose6d = unpack_params(wire[i])
        rotmat = np.asarray(rot6d_to_rotmat(jnp.asarray(pose6d.reshape(22, 6))))
        # identity-root forward, then root rotation composed ABOUT THE
        # ORIGIN — the reference rosViz's transform_smpl composition
        # (ref copenet_rosViz.py:87-96) and this framework's loss/eval/BA
        # convention. Passing rotmat[0] as global_orient instead would
        # pivot at the root JOINT (standard LBS semantics) and shift the
        # mesh by j0 − R·j0. (The reference rosViz also forgets to unscale
        # the wire's ×0.05 translation — res_compile.py:221 multiplies by
        # 20 to recover metres; unpack_params unscales, deliberately.)
        out = smplx_forward(
            smplx_params,
            jnp.asarray(betas)[None],
            body_pose=jnp.asarray(rotmat[1:])[None],
            global_orient=jnp.broadcast_to(jnp.eye(3), (1, 1, 3, 3)),
        )
        verts = np.asarray(out.vertices)[0] @ rotmat[0].T + trans

        canvas = np.full(image_size[::-1] + (3,), 0.15)
        img = overlay_mesh(
            canvas, verts, smplx_params.faces,
            (focal[0] * image_size[0] / C.IMG_SIZE[0],
             focal[1] * image_size[1] / C.IMG_SIZE[1]),
            center=(image_size[0] / 2, image_size[1] / 2),
        )
        path = os.path.join(out_dir, f"frame_{i:06d}.png")
        plt.imsave(path, np.clip(img, 0, 1))
        paths.append(path)
    return paths


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wire", required=True, help="(N,145) .npy of wire messages")
    p.add_argument("--out", required=True)
    p.add_argument("--smplx_model_dir", default=None)
    p.add_argument("--focal", type=float, nargs=2, default=(1475.0, 1475.0))
    p.add_argument("--max-frames", type=int, default=16)
    p.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    p.add_argument("--synthetic_verts", type=int, default=10475,
                   help="mesh size of the synthetic fallback body model")
    args = p.parse_args(argv)

    if args.platform == "cpu":
        # host-side rendering job; don't claim (or wait for) the TPU
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ..bodymodel import load_smplx_npz, synthetic_smplx_params

    params = (
        load_smplx_npz(args.smplx_model_dir)
        if args.smplx_model_dir
        else synthetic_smplx_params(num_vertices=args.synthetic_verts)
    )
    wire = np.load(args.wire)
    paths = render_wire_messages(
        wire, params, args.out, tuple(args.focal), max_frames=args.max_frames
    )
    print(f"wrote {len(paths)} overlays to {args.out}")


if __name__ == "__main__":
    main()
