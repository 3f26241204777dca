"""End-to-end distributed test (the reference benchtest equivalent,
SURVEY.md §4.5): two AirPose servers + two native C++ clients on localhost
running the full 3-round synchronization at 4 FPS."""

import asyncio
import os
import socket
import subprocess
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "native")
CLIENT = os.path.join(NATIVE, "build", "airpose_client")
ROI_TOOL = os.path.join(NATIVE, "build", "roi_tool")


def _ensure_client_built():
    """Build via the product code's own helper (benchtest drives the same
    cmake recipe); this test additionally needs the roi_tool binary."""
    from airpose_tpu.serve.benchtest import ensure_client_built

    return ensure_client_built(targets=("airpose_client", "roi_tool"))


def _python_reference_crop(frame, box, principal, context_size):
    """The offline eval pipeline's crop/bb for a known box: the host stage
    of data/real.py (crop + integer decimation into the context buffer)
    followed by finish_batch with deterministic margin-0 boxes."""
    from airpose_tpu.data.pipeline import finish_batch
    from airpose_tpu.serve.benchtest import _denormalize_u8

    xmin, ymin, xmax, ymax = box
    w, h = xmax - xmin, ymax - ymin
    S = context_size
    f = max(-(-max(w, h) // S), 1)
    dec = frame[ymin:ymax:f, xmin:xmax:f]
    hh, ww = dec.shape[:2]
    ctx = np.zeros((1, 2, S, S, 3), np.uint8)
    ctx[0, :, :hh, :ww] = dec
    K = np.eye(3, dtype=np.float32)
    K[0, 2], K[1, 2] = principal
    host = {
        "context": ctx,
        "context_extent": np.broadcast_to(
            np.asarray([ww, hh], np.float32), (1, 2, 2)).copy(),
        "context_origin": np.broadcast_to(
            np.asarray([xmin, ymin], np.float32), (1, 2, 2)).copy(),
        "context_scale": np.full((1, 2), f, np.float32),
        "person_box": np.broadcast_to(
            np.asarray([0, 0, w / f, h / f], np.float32), (1, 2, 4)).copy(),
        "intr": np.broadcast_to(K, (1, 2, 3, 3)).copy(),
    }
    out = finish_batch(host, jax.random.PRNGKey(0), deterministic=True,
                       margin=0.0)
    return (_denormalize_u8(np.asarray(out["images"][0, 0])),
            np.asarray(out["bb"][0, 0]))


@pytest.mark.skipif(not _ensure_client_built(), reason="native client not buildable")
@pytest.mark.parametrize("box,context_size,frame_wh", [
    ((40, 30, 200, 107), 672, (320, 240)),  # direct path (f = 1), pad
    ((8, 5, 310, 233), 128, (320, 240)),    # oversized box → decimation f=3
    # decimated length within one pixel of the context budget (w=1023,
    # f=8 → bw=127.875, w_dec=128=S): a tap lands at buffer index S and
    # jax renormalizes the surviving weight — the right-edge case that
    # diverged by 22 uint8 steps before the buffer-exclusion fix
    ((1, 2, 1024, 202), 128, (1100, 260)),
])
def test_roi_crop_matches_python_pipeline(box, context_size, frame_wh):
    """The C++ client's ROI→crop→bb pipeline (native/client/airpose_roi.hpp)
    must match the offline eval pipeline (finish_batch) numerically, so
    frames served through the native client agree with compile_results on
    the same capture. Groundtruth-mode ROI carries the box explicitly
    (README field mapping {ymin, ymax, ycenter=xmin, xcenter=xmax})."""
    rng = np.random.default_rng(7)
    W, H = frame_wh
    principal = (150.0, 110.0)
    frame = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)

    xmin, ymin, xmax, ymax = box
    roi = np.asarray([ymin, ymax, xmax, xmin], np.float32)  # gt field abuse
    payload = roi.tobytes() + frame.tobytes()
    proc = subprocess.run(
        [ROI_TOOL, str(W), str(H), str(principal[0]), str(principal[1]),
         "1", str(context_size)],
        input=payload, capture_output=True, check=True,
    )
    out = proc.stdout
    bb_cpp = np.frombuffer(out[:12], np.float32)
    img_cpp = np.frombuffer(out[12:], np.uint8).reshape(224, 224, 3)

    img_ref, bb_ref = _python_reference_crop(frame, box, principal,
                                             context_size)
    np.testing.assert_allclose(bb_cpp, bb_ref, atol=1e-5)
    diff = np.abs(img_cpp.astype(np.int16) - img_ref.astype(np.int16))
    # float-order differences may flip the uint8 truncation by 1
    assert diff.max() <= 1, (diff.max(), (diff > 1).sum())
    assert (diff == 0).mean() > 0.9


def _reproject_frame_numpy(frame, src, dst, dst_w, dst_h):
    """Oracle for the client's intrinsic reprojection (airpose_roi.hpp
    crop_and_encode_reprojected): every target pixel bilinearly samples
    the source frame through the inverse affine, zero outside. float32
    arithmetic to mirror the C++."""
    sfx, sfy, scx, scy = (np.float32(v) for v in src)
    dfx, dfy, dcx, dcy = (np.float32(v) for v in dst)
    ys, xs = np.meshgrid(np.arange(dst_h, dtype=np.float32),
                         np.arange(dst_w, dtype=np.float32), indexing="ij")
    us = (xs + np.float32(0.5) - dcx) * (sfx / dfx) + scx - np.float32(0.5)
    vs = (ys + np.float32(0.5) - dcy) * (sfy / dfy) + scy - np.float32(0.5)
    x0 = np.floor(us).astype(np.int64)
    y0 = np.floor(vs).astype(np.int64)
    ax = (us - x0.astype(np.float32))[..., None]
    ay = (vs - y0.astype(np.float32))[..., None]
    H, W = frame.shape[:2]

    def at(yy, xx):
        valid = (xx >= 0) & (xx < W) & (yy >= 0) & (yy < H)
        out = np.zeros((*xx.shape, 3), np.float32)
        out[valid] = frame[yy[valid], xx[valid]].astype(np.float32)
        return out

    v = ((1 - ay) * ((1 - ax) * at(y0, x0) + ax * at(y0, x0 + 1))
         + ay * ((1 - ax) * at(y0 + 1, x0) + ax * at(y0 + 1, x0 + 1)))
    return np.clip(v, 0, 255).astype(np.uint8)  # truncation, as the C++ cast


def _map_box_numpy(box, src, dst, dst_w, dst_h):
    """roi_to_box_reprojected's affine + truncate/clamp, in float32."""
    xmin, ymin, xmax, ymax = (np.float32(v) for v in box)
    sfx, sfy, scx, scy = (np.float32(v) for v in src)
    dfx, dfy, dcx, dcy = (np.float32(v) for v in dst)
    x0 = (xmin - scx) * (dfx / sfx) + dcx
    x1 = (xmax - scx) * (dfx / sfx) + dcx
    y0 = (ymin - scy) * (dfy / sfy) + dcy
    y1 = (ymax - scy) * (dfy / sfy) + dcy
    return (max(int(x0), 0), max(int(y0), 0),
            min(int(x1), dst_w), min(int(y1), dst_h))


@pytest.mark.skipif(not _ensure_client_built(), reason="native client not buildable")
@pytest.mark.parametrize("dst_K,dst_wh,context_size", [
    # focal + principal-point change, different target frame size, f = 1
    ((320.0, 300.0, 140.0, 120.0), (352, 256), 672),
    # target focal upscale pushes the mapped box past the context budget
    # → the decimation path runs on the reprojected grid (f = 2)
    ((900.0, 880.0, 260.0, 200.0), (520, 400), 128),
])
def test_roi_reproject_matches_numpy_oracle(dst_K, dst_wh, context_size):
    """The client's --reproject path (reference one_robot.launch
    `reproject` option: resample to the canonical training intrinsics)
    must equal remap-then-standard-pipeline: a numpy bilinear remap of the
    frame to the target intrinsics, the ROI box mapped through the same
    affine, then the SAME offline crop/bb pipeline on the virtual frame
    with the TARGET principal point."""
    rng = np.random.default_rng(11)
    W, H = 320, 240
    src_K = (400.0, 410.0, 150.0, 110.0)
    frame = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    box_src = (40, 30, 200, 107)
    dst_w, dst_h = dst_wh

    xmin, ymin, xmax, ymax = box_src
    roi = np.asarray([ymin, ymax, xmax, xmin], np.float32)  # gt field abuse
    payload = roi.tobytes() + frame.tobytes()
    proc = subprocess.run(
        [ROI_TOOL, str(W), str(H), "0", "0", "1", str(context_size)]
        + [str(v) for v in src_K] + [str(v) for v in dst_K]
        + [str(dst_w), str(dst_h)],
        input=payload, capture_output=True, check=True,
    )
    out = proc.stdout
    bb_cpp = np.frombuffer(out[:12], np.float32)
    img_cpp = np.frombuffer(out[12:], np.uint8).reshape(224, 224, 3)

    virt = _reproject_frame_numpy(frame, src_K, dst_K, dst_w, dst_h)
    box_dst = _map_box_numpy(box_src, src_K, dst_K, dst_w, dst_h)
    assert box_dst[2] > box_dst[0] and box_dst[3] > box_dst[1]
    img_ref, bb_ref = _python_reference_crop(virt, box_dst,
                                             (dst_K[2], dst_K[3]),
                                             context_size)
    np.testing.assert_allclose(bb_cpp, bb_ref, atol=1e-5)
    diff = np.abs(img_cpp.astype(np.int16) - img_ref.astype(np.int16))
    # the extra bilinear stage can flip a dec-buffer uint8 by 1, which the
    # resize then carries — allow 2 steps, overwhelmingly exact
    assert diff.max() <= 2, (diff.max(), (diff > 2).sum())
    assert (diff <= 1).mean() > 0.99
    assert (diff == 0).mean() > 0.8


@pytest.mark.skipif(not _ensure_client_built(), reason="native client not buildable")
def test_benchtest_native_roi_replay(tmp_path):
    """The complete reference rosbag-replay analog: FULL frames + ROI
    messages stream through the native C++ clients (which crop/resize/
    bb-encode themselves), two live servers run the 3-round protocol, and
    step3 must match the fused offline forward on the eval pipeline's own
    crops. The residual includes the client-side image path — bounded by
    the ≤1-uint8-step crop parity, so the diffs stay tiny."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_data import _write_fake_real

    from airpose_tpu.data import CopenetRealDataset
    from airpose_tpu.eval.compile_results import real_batches
    from airpose_tpu.serve.benchtest import run_benchtest

    ds_dir = str(tmp_path / "real")
    os.makedirs(ds_dir)
    _write_fake_real(ds_dir, n=3)
    ds = CopenetRealDataset(ds_dir, frame_range=range(0, 3))

    from airpose_tpu.models import AirPoseTwoView

    model = AirPoseTwoView()
    x = jnp.zeros((1, 2, 64, 64, 3))
    variables = model.init(
        jax.random.PRNGKey(9), x, jnp.zeros((1, 2, 3)), jnp.full((1, 2, 3), 0.5)
    )
    batches = list(real_batches(ds, 3, out_size=64))
    diffs = run_benchtest(variables, batches, model=model, native_roi=ds)
    assert set(diffs) == {
        "beta_m1", "beta_m2", "trans_m1", "trans_m2", "pose_m1", "pose_m2"
    }
    for k, v in diffs.items():
        # crop parity is ≤1 uint8 step, so the network-amplified residual
        # stays far below any pose-meaningful scale
        assert v < 2e-2, (k, v)


@pytest.mark.skipif(not _ensure_client_built(), reason="native client not buildable")
def test_cpp_clients_two_server_sync():
    from airpose_tpu.models import AirPoseTwoView
    from airpose_tpu.serve.server import run_server
    from airpose_tpu.serve.staged import StagedRegressor

    model = AirPoseTwoView()
    x = jnp.zeros((1, 2, 224, 224, 3))
    variables = model.init(
        jax.random.PRNGKey(0), x, jnp.zeros((1, 2, 3)), jnp.full((1, 2, 3), 0.5)
    )

    socks = [socket.socket() for _ in range(2)]
    for s in socks:
        s.bind(("127.0.0.1", 0))
    ports = [s.getsockname()[1] for s in socks]
    for s in socks:
        s.close()

    loop = asyncio.new_event_loop()

    def run_loop():
        asyncio.set_event_loop(loop)
        loop.create_task(run_server(StagedRegressor(variables), 1, ports[0],
                                    peer_port=ports[1]))
        loop.create_task(run_server(StagedRegressor(variables), 2, ports[1],
                                    peer_port=ports[0]))
        loop.run_forever()

    t = threading.Thread(target=run_loop, daemon=True)
    t.start()
    time.sleep(1.0)

    # client 1 exercises the full ROI path (full frames + ROI on stdin,
    # the reference client's actual role) WITH --reproject — the live
    # regression net over the intrinsics-resample leg (numeric parity is
    # test_roi_reproject_matches_numpy_oracle); client 2 stays in fake mode
    n_frames = 3
    W, H = 96, 72
    rng = np.random.default_rng(3)
    roi = np.asarray([10, 60, 70, 12], np.float32)  # gt: box x[12,70] y[10,60]
    roi_stdin = b"".join(
        roi.tobytes() + rng.integers(0, 256, (H, W, 3), dtype=np.uint8).tobytes()
        for _ in range(n_frames)
    )
    procs = [
        subprocess.Popen(
            [CLIENT, "--host", "127.0.0.1", "--port", str(ports[v]),
             "--robot-id", str(v + 1), "--frames", str(n_frames), "--fps", "4"]
            + (["--mode", "roi", "--img-w", str(W), "--img-h", str(H),
                "--px", "48", "--py", "36", "--roi-groundtruth",
                "--reproject", "--src-fx", "80", "--src-fy", "80",
                "--dst-fx", "64", "--dst-fy", "64",
                "--dst-w", "80", "--dst-h", "60"]
               if v == 0 else []),
            stdin=subprocess.PIPE if v == 0 else None,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=False,
        )
        for v in (0, 1)
    ]
    outs = []
    for v, p in enumerate(procs):
        out, err = p.communicate(input=roi_stdin if v == 0 else None,
                                 timeout=180)
        out, err = out.decode(), err.decode()
        assert p.returncode == 0, (out, err)
        outs.append(out)
    from test_serve import _stop_loop
    _stop_loop(loop, t)

    for v, out in enumerate(outs):
        lines = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert len(lines) == n_frames, out
        for i, line in enumerate(lines):
            assert f"frame={i} " in line
        # parseable numeric fields
        assert "trans=" in lines[0] and "pose0=" in lines[0]
