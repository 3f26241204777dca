"""Software rasterizer smoke tests."""

import numpy as np

from airpose_tpu.utils.render import draw_keypoints, overlay_mesh, rasterize_mesh


def test_rasterize_triangle_depth_and_coverage():
    verts = np.asarray([[-0.5, -0.5, 2.0], [0.5, -0.5, 2.0], [0.0, 0.5, 2.0]])
    faces = np.asarray([[0, 1, 2]])
    depth, shade = rasterize_mesh(verts, faces, (100, 100), (50, 50), (100, 100))
    inside = np.isfinite(depth)
    assert inside.sum() > 100  # triangle covers pixels
    np.testing.assert_allclose(depth[inside], 2.0, atol=1e-6)
    assert (shade[inside] > 0).all()


def test_rasterize_culls_behind_camera():
    verts = np.asarray([[0, 0, -1.0], [1, 0, -1.0], [0, 1, -1.0]])
    depth, _ = rasterize_mesh(verts, np.asarray([[0, 1, 2]]), (100, 100), (50, 50), (100, 100))
    assert not np.isfinite(depth).any()


def test_overlay_and_keypoints():
    img = np.zeros((64, 64, 3))
    verts = np.asarray([[-0.2, -0.2, 2.0], [0.2, -0.2, 2.0], [0.0, 0.2, 2.0]])
    out = overlay_mesh(img, verts, np.asarray([[0, 1, 2]]), (80, 80))
    assert out.max() > 0
    kp = draw_keypoints(img, np.asarray([[32, 32]]))
    assert kp[32, 32, 0] == 1.0
