"""CLI coverage for the two host-side result-visualization entry points:
serve.viz (the copenet_rosViz analog, ref
copenet_real/scripts/copenet_rosViz.py:82-104) and eval.figures (the
final_res_compile analog, ref scripts/final_res_compile.py +
bundle_adj.py:590-642 trajectory plots)."""

import json
import os
import pickle

import numpy as np


def _wire_messages(n=3, seed=0):
    from airpose_tpu import constants as C

    rng = np.random.default_rng(seed)
    wire = np.zeros((n, 145), np.float32)
    wire[:, :10] = rng.normal(0, 0.1, (n, 10))
    wire[:, 10:13] = np.array([0, 0, 8.0], np.float32) * C.TRANS_SCALE
    id6 = np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), 22)
    wire[:, 13:] = id6 + rng.normal(0, 0.05, (n, 132)).astype(np.float32)
    return wire


def test_viz_cli_renders_wire_messages(tmp_path):
    """The rosViz role end to end: 145-float wire records → SMPL-X →
    mesh-overlay PNGs, through the CLI main."""
    from airpose_tpu.serve.viz import main

    wire_path = str(tmp_path / "wire.npy")
    np.save(wire_path, _wire_messages(3))
    out_dir = str(tmp_path / "viz")
    main(["--wire", wire_path, "--out", out_dir,
          "--max-frames", "2", "--synthetic_verts", "200"])

    pngs = sorted(os.listdir(out_dir))
    assert pngs == ["frame_000000.png", "frame_000001.png"]
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = plt.imread(os.path.join(out_dir, pngs[0]))
    # the body must actually rasterize: mesh pixels are tinted blue
    # (color=(0.3,0.6,1.0)) against the gray canvas
    assert (np.abs(img[..., 2] - img[..., 0]) > 0.05).sum() > 100


def test_viz_renders_body_at_message_trans(tmp_path):
    """unpack_params must UNDO the wire's x0.05 trans scale before the
    SMPL-X forward — at the encoded z=8 m the body projects well inside
    the canvas; decoding the raw scaled value (z=0.4) would put the mesh
    behind/at the camera."""
    from airpose_tpu.bodymodel import synthetic_smplx_params
    from airpose_tpu.serve.viz import render_wire_messages

    paths = render_wire_messages(
        _wire_messages(1), synthetic_smplx_params(num_vertices=200),
        str(tmp_path), max_frames=1)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = plt.imread(paths[0])
    h, w = img.shape[:2]
    ys, xs = np.where(np.abs(img[..., 2] - img[..., 0]) > 0.05)
    assert len(ys) > 100
    # mesh centroid lands in the central half of the canvas
    assert h * 0.25 < ys.mean() < h * 0.75
    assert w * 0.25 < xs.mean() < w * 0.75


def test_figures_cli_table_and_trajectory(tmp_path):
    """figures CLI: outputs-pkl(s) + sidecar metrics → markdown metric
    table + cam1-wrt-cam0 trajectory plot (final_res_compile parity)."""
    from airpose_tpu.eval.figures import main

    rng = np.random.default_rng(0)
    n = 6
    outputs = [{
        "output": {
            "pred_angles0": rng.normal(0, 0.3, (n, 22, 3)).astype(np.float32),
            "pred_angles1": rng.normal(0, 0.3, (n, 22, 3)).astype(np.float32),
            "pred_smpltrans0": rng.normal(0, 1, (n, 3)).astype(np.float32),
            "pred_smpltrans1": rng.normal(0, 1, (n, 3)).astype(np.float32),
        }
    }]
    pkl = str(tmp_path / "res.pkl")
    with open(pkl, "wb") as f:
        pickle.dump([outputs], f)
    with open(pkl + ".metrics.json", "w") as f:
        json.dump({"test": {"mpjpe0": 0.05, "mpe0": 1.25}}, f)

    out_dir = str(tmp_path / "figs")
    main(["--results", f"run=={pkl}".replace("==", "="), "--out", out_dir])

    assert os.path.exists(os.path.join(out_dir, "cam_trajectory.png"))
    table = open(os.path.join(out_dir, "metrics.md")).read()
    assert "run/test" in table and "0.0500" in table and "1.2500" in table


def test_figures_relative_trajectory_math():
    """T_rel = T0 · T1⁻¹ against a hand-built rig: cam1 one meter to the
    right of cam0, same orientation → constant [-1, 0, 0]... in the
    convention of root poses expressed per view: x_cam = R x + t, so
    T_rel maps view1 coords into view0."""
    from airpose_tpu.eval.figures import relative_camera_trajectory

    n = 4
    a = np.zeros((n, 22, 3), np.float32)
    t0 = np.tile(np.array([0, 0, 5.0], np.float32), (n, 1))
    t1 = np.tile(np.array([1, 0, 5.0], np.float32), (n, 1))
    outputs = [{"output": {
        "pred_angles0": a, "pred_angles1": a,
        "pred_smpltrans0": t0, "pred_smpltrans1": t1,
    }}]
    rel = relative_camera_trajectory(outputs)
    np.testing.assert_allclose(rel, np.tile([-1, 0, 0], (n, 1)), atol=1e-6)
