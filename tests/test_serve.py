"""Serving tests: wire-format round trips, staged-vs-fused numeric parity
through the protocol layer, and the benchtest equivalent — two server
processes on localhost exchanging the 3-round protocol (SURVEY.md §4.5)."""

import asyncio
import socket
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airpose_tpu import constants as C
from airpose_tpu.models import AirPoseTwoView, mean_init_state
from airpose_tpu.serve import protocol as P
from airpose_tpu.serve.staged import StagedRegressor, state_to_wire, wire_to_peer


def test_params_wire_roundtrip(rng):
    betas = rng.normal(size=(10,)).astype(np.float32)
    trans = np.asarray([0.4, -0.2, 9.0], np.float32)
    pose = rng.normal(size=(132,)).astype(np.float32)
    data = P.pack_params(betas, trans, pose)
    assert data.shape == (145,)
    b2, t2, p2 = P.unpack_params(data)
    np.testing.assert_allclose(b2, betas)
    np.testing.assert_allclose(t2, trans, rtol=1e-6)
    np.testing.assert_allclose(p2, pose)
    # scaled translation on the wire (reference wire format)
    np.testing.assert_allclose(data[10:13], trans * C.TRANS_SCALE, rtol=1e-6)


def test_image_message_roundtrip(rng):
    img = (rng.random((224, 224, 3)) * 255).astype(np.uint8)
    raw = P.encode_image(1, 42, np.asarray([0.1, 0.2, 1.5]), np.asarray([0, 0, 10.0]), img)
    magic_len = 9
    robot, frame, bb, init_trans, img2 = P.decode_image(raw[magic_len:])
    assert (robot, frame) == (1, 42)
    np.testing.assert_allclose(bb, [0.1, 0.2, 1.5], rtol=1e-6)
    np.testing.assert_array_equal(img2, img)


@pytest.fixture(scope="module")
def served_model():
    model = AirPoseTwoView()
    x = jnp.zeros((1, 2, 224, 224, 3))
    variables = model.init(
        jax.random.PRNGKey(3), x, jnp.zeros((1, 2, 3)), jnp.full((1, 2, 3), 0.5)
    )
    return model, variables


def test_staged_protocol_matches_fused(served_model, rng):
    """Running the full 3-round message exchange in-process must equal the
    fused two-view forward."""
    model, variables = served_model
    B = 1
    x = jnp.asarray(rng.normal(size=(B, 2, 224, 224, 3)).astype(np.float32) * 0.1)
    bb = jnp.asarray(rng.normal(size=(B, 2, 3)).astype(np.float32) * 0.1)
    pos = jnp.full((B, 2, 3), 10.0)

    fused = model.apply(variables, x, bb, pos * C.TRANS_SCALE, iters=3)

    reg = StagedRegressor(variables)
    states = [
        reg.step1(np.asarray(x[:, v]), np.asarray(bb[:, v]), np.asarray(pos[:, v]))
        for v in (0, 1)
    ]
    for _ in range(2):  # rounds 2 and 3
        wires = [state_to_wire(s) for s in states]
        new = []
        for v in (0, 1):
            art, shape = wire_to_peer(wires[1 - v])
            new.append(
                reg.step23(states[v], np.asarray(bb[:, v]), art[None], shape[None])
            )
        states = new

    staged_pose = np.stack([s.pose[0] for s in states])
    np.testing.assert_allclose(
        staged_pose, np.asarray(fused.pose[0]), atol=1e-4
    )


@pytest.mark.slow
def test_staged_int8_close_to_bf16(served_model, rng):
    """`StagedRegressor(int8=True)` (the --int8 serving flag): lazy
    first-frame calibration, then int8 trunk features — step1 output must
    track the f32 path within the PTQ bound (ops/int8_trunk.py; random
    weights are the worst case)."""
    _, variables = served_model
    B = 2
    x = np.asarray(rng.normal(size=(B, 224, 224, 3)), np.float32) * 0.1
    bb = np.zeros((B, 3), np.float32)
    pos = np.full((B, 3), 10.0, np.float32)

    base = StagedRegressor(variables)
    q = StagedRegressor(variables, int8=True)
    assert q._act_scales is None
    s_base = base.step1(x, bb, pos)
    s_q = q.step1(x, bb, pos)
    assert q._act_scales is not None  # calibrated on the first batch
    rms = s_base.pose.std()
    assert np.abs(s_q.pose - s_base.pose).mean() < 0.2 * rms
    # second call reuses the calibration (jit cache hit, no recalibration)
    scales = q._act_scales
    q.step1(x, bb, pos)
    assert q._act_scales is scales


@pytest.mark.slow
def test_staged_int8_matches_fused_int8(served_model, rng):
    """The staged≡fused identity survives quantization: the 3-round
    message exchange over int8 features equals the fused int8 forward
    when both use the same quantized weights and calibration (small
    tolerance: conv reduction order may differ between the per-view and
    view-folded batch shapes)."""
    from airpose_tpu.ops import (calibrate_act_scales,
                                 quantize_trunk_params,
                                 twoview_int8_forward)

    model, variables = served_model
    B = 1
    x = jnp.asarray(rng.normal(size=(B, 2, 224, 224, 3)).astype(np.float32) * 0.1)
    bb = jnp.asarray(rng.normal(size=(B, 2, 3)).astype(np.float32) * 0.1)
    pos = jnp.full((B, 2, 3), 10.0)

    qp = quantize_trunk_params(variables)
    scales = calibrate_act_scales(qp, np.asarray(x).reshape(-1, 224, 224, 3))
    fused = twoview_int8_forward(model, variables, qp, scales, x, bb,
                                 pos * C.TRANS_SCALE, iters=3)

    reg = StagedRegressor(variables, int8=True)
    reg._act_scales = scales  # same calibration as the fused reference
    states = [
        reg.step1(np.asarray(x[:, v]), np.asarray(bb[:, v]),
                  np.asarray(pos[:, v]))
        for v in (0, 1)
    ]
    for _ in range(2):
        wires = [state_to_wire(s) for s in states]
        new = []
        for v in (0, 1):
            art, shape = wire_to_peer(wires[1 - v])
            new.append(reg.step23(states[v], np.asarray(bb[:, v]),
                                  art[None], shape[None]))
        states = new
    staged_pose = np.stack([s.pose[0] for s in states])
    np.testing.assert_allclose(staged_pose, np.asarray(fused.pose[0]),
                               atol=2e-3)


def test_peer_message_pruning(served_model):
    """Peer messages for frames the drop policy skipped (or whose wait
    timed out) must not accumulate: _note_peer prunes behind an 8-frame
    horizon, bounding both bookkeeping dicts in long degraded runs."""
    from airpose_tpu.serve import protocol as P
    from airpose_tpu.serve.server import AirPoseServer

    _, variables = served_model
    srv = AirPoseServer(StagedRegressor(variables), robot_id=1)
    data = np.zeros(145, np.float32)
    for fid in range(100):
        srv._note_peer(P.MSG_STEP1, fid, data)
        srv._note_peer(P.MSG_STEP2, fid, data)
    per_type = srv.PEER_PRUNE_HORIZON + 1
    assert len(srv._peer_msgs) <= 2 * per_type, len(srv._peer_msgs)
    assert len(srv._events) <= 2 * per_type, len(srv._events)
    # the freshest message per type survives
    assert (P.MSG_STEP1, 99) in srv._peer_msgs
    assert (P.MSG_STEP2, 99) in srv._peer_msgs


def _client_request(port, frame_id, img, bb, init_trans):
    sock = socket.create_connection(("127.0.0.1", port), timeout=30)
    sock.sendall(P.encode_image(0, frame_id, bb, init_trans, img))
    msg = P.read_message_sync(sock)
    sock.close()
    assert msg is not None and msg[0] == P.MSG_RESULT
    return P.decode_step(msg[1])


def test_two_server_localhost_sync(served_model, rng):
    """The benchtest equivalent: two servers, ports chosen by the OS,
    full 3-round exchange driven by two client threads."""
    from airpose_tpu.serve.server import run_server

    _, variables = served_model
    # pick two free ports
    socks = [socket.socket() for _ in range(2)]
    for s in socks:
        s.bind(("127.0.0.1", 0))
    ports = [s.getsockname()[1] for s in socks]
    for s in socks:
        s.close()

    loop = asyncio.new_event_loop()

    def run_loop():
        asyncio.set_event_loop(loop)
        reg0 = StagedRegressor(variables)
        reg1 = StagedRegressor(variables)
        loop.create_task(run_server(reg0, 1, ports[0], peer_port=ports[1]))
        loop.create_task(run_server(reg1, 2, ports[1], peer_port=ports[0]))
        loop.run_forever()

    t = threading.Thread(target=run_loop, daemon=True)
    t.start()

    import time

    time.sleep(1.0)

    img = (rng.random((224, 224, 3)) * 255).astype(np.uint8)
    bb = np.asarray([0.0, 0.0, 1.0], np.float32)
    init_trans = np.asarray([0.0, 0.0, 10.0], np.float32)

    results = [None, None]
    errors = []

    def client(v):
        try:
            results[v] = _client_request(ports[v], 7, img, bb, init_trans)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=client, args=(v,)) for v in (0, 1)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=120)
    _stop_loop(loop, t)

    assert not errors, errors
    assert results[0] is not None and results[1] is not None
    fid0, data0 = results[0]
    fid1, data1 = results[1]
    assert fid0 == 7 and fid1 == 7
    assert data0.shape == (145,) and np.isfinite(data0).all()
    # both served the same weights and the same image: step3 outputs agree
    np.testing.assert_allclose(data0, data1, atol=1e-4)


def _stop_loop(loop, thread=None):
    """Cancel every task, let the cancellations run their cleanup, then
    stop AND close the loop — a bare stop() abandons the server
    coroutines to be GC-destroyed mid-await (the unraisable warnings the
    suite used to print)."""

    async def _shutdown():
        tasks = [t for t in asyncio.all_tasks(loop)
                 if t is not asyncio.current_task()]
        for task in tasks:
            task.cancel()
        if tasks:
            await asyncio.wait(tasks, timeout=5)
        loop.stop()

    asyncio.run_coroutine_threadsafe(_shutdown(), loop)
    if thread is not None:
        thread.join(timeout=10)
    if not loop.is_running() and not loop.is_closed():
        loop.close()


def _start_loop_with_server(server_obj, port):
    from airpose_tpu.serve.server import run_server

    loop = asyncio.new_event_loop()

    def run_loop():
        asyncio.set_event_loop(loop)
        loop.create_task(run_server(None, server_obj.robot_id, port,
                                    server=server_obj))
        loop.run_forever()

    t = threading.Thread(target=run_loop, daemon=True)
    t.start()
    import time

    time.sleep(0.5)
    return loop, t


def test_degraded_single_server_serves_with_mean_peer(served_model, rng):
    """Peer-timeout recovery: with NO peer connected, the server must still
    answer (mean-parameter peer fallback) instead of stalling — the
    real-time flight semantics (a lost drone link degrades accuracy, never
    blocks the pipeline)."""
    from airpose_tpu.serve.server import AirPoseServer

    _, variables = served_model
    reg = StagedRegressor(variables)
    srv = AirPoseServer(reg, robot_id=1, peer_timeout=0.2)

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    loop, lt = _start_loop_with_server(srv, port)
    try:
        img = (rng.random((224, 224, 3)) * 255).astype(np.uint8)
        bb = np.asarray([0.0, 0.0, 1.0], np.float32)
        init_trans = np.asarray([0.0, 0.0, 10.0], np.float32)
        fid, data = _client_request(port, 3, img, bb, init_trans)
        assert fid == 3 and np.isfinite(data).all()
        assert srv.peer_timeouts == 2  # rounds 2 and 3 both degraded
    finally:
        _stop_loop(loop, lt)

    from airpose_tpu.serve.server import _normalize

    state = reg.step1(_normalize(img)[None], bb[None], init_trans[None])
    mean_art, mean_shape = reg._mean_art[0], reg._mean_shape[0]
    for _ in range(2):
        state = reg.step23(state, bb[None], mean_art[None], mean_shape[None])
    want = state_to_wire(state)
    np.testing.assert_allclose(data, want, atol=1e-4)


def test_malformed_clients_do_not_kill_server(served_model, rng):
    """Hostile/corrupt wire input: bad magic, a multi-GB length prefix, and
    an IMAGE whose declared dims disagree with its payload must each get
    their connection closed — not crash a handler task, hang its queue
    consumer, or buffer unbounded memory — and the server must still serve
    a well-formed client afterwards."""
    import struct

    from airpose_tpu.serve.server import AirPoseServer

    _, variables = served_model
    reg = StagedRegressor(variables)
    srv = AirPoseServer(reg, robot_id=1, peer_timeout=0.1)

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    loop, lt = _start_loop_with_server(srv, port)

    def expect_closed(raw):
        sock = socket.create_connection(("127.0.0.1", port), timeout=10)
        sock.sendall(raw)
        sock.settimeout(10)
        assert sock.recv(1) == b""  # server closed the connection
        sock.close()

    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    bb = np.asarray([0.0, 0.0, 1.0], np.float32)
    init_trans = np.asarray([0.0, 0.0, 10.0], np.float32)
    try:
        # garbage bytes: bad magic
        expect_closed(b"\xde\xad\xbe\xef" * 8)
        # oversized length prefix (would buffer ~4 GB without the cap)
        expect_closed(struct.pack("<IBI", P.MAGIC, P.MSG_IMAGE, 0xFFFFFFF0))
        # inconsistent IMAGE dims: header claims 512x512, payload has 64x64
        good = P.encode_image(0, 1, bb, init_trans, img)
        bad = bytearray(good)
        struct.pack_into("<II", bad, 9 + 32, 512, 512)
        expect_closed(bytes(bad))
        # mid-frame corruption: one valid frame, then garbage framing on
        # the same connection — the pump must enqueue the EOF sentinel
        # (not strand the consumer) and the result still arrives
        sock = socket.create_connection(("127.0.0.1", port), timeout=30)
        sock.sendall(P.encode_image(0, 5, bb, init_trans, img))
        msg = P.read_message_sync(sock)
        assert msg is not None and msg[0] == P.MSG_RESULT
        sock.sendall(b"\x00" * 16)
        sock.settimeout(10)
        assert sock.recv(1) == b""
        sock.close()
        # well-formed but absurd dims (beyond MAX_IMAGE_DIM): would force a
        # multi-GB device buffer; the decoder rejects it outright
        big = P.MAX_IMAGE_DIM + 1
        hdr = struct.pack("<II", 0, 7) + bb.tobytes() + init_trans.tobytes()
        hdr += struct.pack("<II", big, 1)
        expect_closed(P.frame(P.MSG_IMAGE, hdr + b"\x00" * (big * 3)))
        # shape-change after the pin: each distinct (h, w) costs a fresh
        # XLA compile under the serve lock, so the server pins the crop
        # shape to its first frame and drops clients that switch
        expect_closed(P.encode_image(
            0, 8, bb, init_trans, img[:32, :32]))
        # the server is still alive and serves a well-formed client
        fid, data = _client_request(port, 9, img, bb, init_trans)
        assert fid == 9 and np.isfinite(data).all()
    finally:
        _stop_loop(loop, lt)


def test_protocol_rejects_malformed_payloads():
    """Decoder-level validation: truncated/oversized payloads raise
    ProtocolError instead of tearing down with numpy/struct internals."""
    with pytest.raises(P.ProtocolError):
        P.decode_step(b"\x00" * 8)  # step needs 4 + 145*4 bytes
    with pytest.raises(P.ProtocolError):
        P.decode_image(b"\x00" * 12)  # shorter than the fixed header
    with pytest.raises(P.ProtocolError):  # dims beyond MAX_IMAGE_DIM
        import struct as _s
        big = P.MAX_IMAGE_DIM + 1
        P.decode_image(_s.pack("<II", 0, 0) + b"\x00" * 24
                       + _s.pack("<II", big, 1) + b"\x00" * (big * 3))
    ok = P.pack_params(np.zeros(10), np.zeros(3), np.zeros(132))
    raw = P.encode_step(P.MSG_STEP1, 3, ok)
    fid, data = P.decode_step(raw[9:])
    assert fid == 3 and data.shape == (145,)


def test_server_stats_logging(served_model, rng, capfd):
    """--log-every: the real-time health counters (served/dropped/
    peer-timeouts, recent rate) print every N served frames — the
    operational visibility the reference's ROS nodes provided via
    continuous status logging."""
    from airpose_tpu.serve.server import AirPoseServer

    _, variables = served_model
    srv = AirPoseServer(StagedRegressor(variables), robot_id=1,
                        peer_timeout=0.05, log_every=1)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    loop, lt = _start_loop_with_server(srv, port)
    try:
        img = (rng.random((224, 224, 3)) * 255).astype(np.uint8)
        bb = np.asarray([0.0, 0.0, 1.0], np.float32)
        init_trans = np.asarray([0.0, 0.0, 10.0], np.float32)
        for f in (0, 1):
            _client_request(port, f, img, bb, init_trans)
    finally:
        _stop_loop(loop, lt)

    out = capfd.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith("[robot 1]")]
    assert len(lines) == 2, out
    assert "served=1" in lines[0] and "rate=" not in lines[0]
    assert "served=2" in lines[1] and "rate=" in lines[1]
    assert "peer_timeouts=4" in lines[1]  # 2 degraded rounds per frame


def test_latest_frame_wins_drop_policy(served_model, rng):
    """Real-time semantics: a backlog of frames is dropped down to the
    newest (the reference's 4-FPS loop drops to stay real-time). A slowed
    regressor guarantees frames 1..n-2 queue up behind frame 0."""
    import time as _time

    from airpose_tpu.serve.server import AirPoseServer

    _, variables = served_model
    base = StagedRegressor(variables)

    class SlowReg:
        _mean_art = base._mean_art
        _mean_shape = base._mean_shape

        def step1(self, *a):
            _time.sleep(0.4)
            return base.step1(*a)

        def step23(self, *a):
            return base.step23(*a)

    srv = AirPoseServer(SlowReg(), robot_id=1, peer_timeout=0.05)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    loop, lt = _start_loop_with_server(srv, port)
    try:
        img = (rng.random((224, 224, 3)) * 255).astype(np.uint8)
        bb = np.asarray([0.0, 0.0, 1.0], np.float32)
        init_trans = np.asarray([0.0, 0.0, 10.0], np.float32)
        sock = socket.create_connection(("127.0.0.1", port), timeout=60)
        for f in range(4):  # burst: all queued while frame 0 processes
            sock.sendall(P.encode_image(0, f, bb, init_trans, img))
        got = []
        for _ in range(2):  # frame 0 + the newest (3); 1 and 2 dropped
            msg = P.read_message_sync(sock)
            assert msg is not None and msg[0] == P.MSG_RESULT
            got.append(P.decode_step(msg[1])[0])
        sock.close()
    finally:
        _stop_loop(loop, lt)

    assert got[0] == 0 and got[-1] == 3, got
    assert srv.frames_dropped == 2


def test_benchtest_served_matches_offline(tmp_path, rng):
    """The served-vs-offline benchtest tool: with the same checkpoint and
    the same uint8 crops, step3 over the live 3-round protocol must match
    the fused offline forward to float tolerance (the reference's rosbag
    comparison, copenet_real_res_compile.py:193-296, with the quantization
    made common so the diff isolates the protocol path)."""
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

    model = AirPoseTwoView()
    x = jnp.zeros((1, 2, 64, 64, 3))
    variables = model.init(
        jax.random.PRNGKey(9), x, jnp.zeros((1, 2, 3)), jnp.full((1, 2, 3), 0.5)
    )
    batches = list(real_batches(ds, 3, out_size=64))
    diffs = run_benchtest(variables, batches, model=model,
                          measure_rate=True, rate_warmup=1)
    fps = diffs.pop("served_fps")
    assert np.isfinite(fps) and fps > 0
    assert set(diffs) == {
        "beta_m1", "beta_m2", "trans_m1", "trans_m2", "pose_m1", "pose_m2"
    }
    for k, v in diffs.items():
        assert v < 1e-3, (k, v)


def test_sep_staged_matches_sep_fused(rng):
    """Per-drone-weights serving: staged steps through AirPoseTwoViewSepView
    (each robot using its own trunk/core) equal the fused _sep forward."""
    from airpose_tpu.models import AirPoseTwoViewSep

    model = AirPoseTwoViewSep()
    B = 1
    x = jnp.asarray(rng.normal(size=(B, 2, 224, 224, 3)).astype(np.float32) * 0.1)
    bb = jnp.asarray(rng.normal(size=(B, 2, 3)).astype(np.float32) * 0.1)
    pos = jnp.full((B, 2, 3), 10.0)
    variables = model.init(jax.random.PRNGKey(5), x, bb, pos * C.TRANS_SCALE)
    fused = model.apply(variables, x, bb, pos * C.TRANS_SCALE, iters=3)

    regs = [StagedRegressor(variables, sep_view=v) for v in (0, 1)]
    states = [
        regs[v].step1(np.asarray(x[:, v]), np.asarray(bb[:, v]), np.asarray(pos[:, v]))
        for v in (0, 1)
    ]
    for _ in range(2):
        wires = [state_to_wire(s) for s in states]
        new = []
        for v in (0, 1):
            art, shape = wire_to_peer(wires[1 - v])
            new.append(
                regs[v].step23(states[v], np.asarray(bb[:, v]), art[None], shape[None])
            )
        states = new
    staged_pose = np.stack([s.pose[0] for s in states])
    np.testing.assert_allclose(staged_pose, np.asarray(fused.pose[0]), atol=1e-4)


@pytest.mark.parametrize("family", [
    "copenet_twoview",
    # the _sep variant restores two per-drone weight copies (47 s); it
    # rides the full tier, the shared-weight variant keeps the fast tier
    pytest.param("copenet_twoview_sep", marks=pytest.mark.slow),
])
def test_server_cli_serves_saved_checkpoint(tmp_path, rng, family):
    """The deployment entry point end to end: save a TrainState checkpoint
    exactly as the trainer does (for the shared family, with the
    `train_reg_only` multi_transform optimizer — the opt_state variant a
    TrainState-template restore rejects), launch `server.main --ckpt`, send
    one frame over TCP, and check the step3 result equals the degraded
    (mean-peer) staged path computed directly from the ORIGINAL weights.
    This is the round-2 defect's regression test: the reference contract is
    `python server.py -p PORT -m file.ckpt` (ref README server
    instructions)."""
    import time

    from airpose_tpu.models import MODEL_REGISTRY, family_init_args
    from airpose_tpu.serve import server as S
    from airpose_tpu.serve.benchtest import _free_ports
    from airpose_tpu.train.checkpoint import CheckpointManager
    from airpose_tpu.train.state import create_train_state

    model = MODEL_REGISTRY[family]()
    state, _ = create_train_state(
        model, family_init_args(family, 1, 64), jax.random.PRNGKey(17),
        lr=5e-5, train_reg_only=family == "copenet_twoview",
    )
    ckpt_dir = str(tmp_path / "checkpoints")
    CheckpointManager(ckpt_dir).save(state, "best")

    (port,) = _free_ports(1)
    robot_id = 2  # robot 2 with a sep checkpoint must serve trunk1/core1
    t = threading.Thread(
        target=S.main,
        args=([
            "--port", str(port), "--robot-id", str(robot_id),
            "--model", family, "--ckpt", str(tmp_path / "checkpoints" / "best"),
            "--peer-timeout", "0.2", "--max-frames", "1",
        ],),
        daemon=True,
    )
    t.start()

    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    bb = np.asarray([0.05, -0.1, 1.2], np.float32)
    init_trans = np.asarray([0.0, 0.0, 10.0], np.float32)

    sock = None
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            sock = socket.create_connection(("127.0.0.1", port), timeout=240)
            break
        except OSError:
            time.sleep(0.1)
    assert sock is not None, "server CLI never opened its port"
    sock.settimeout(240)
    sock.sendall(P.encode_image(robot_id, 0, bb, init_trans, img))
    msg = P.read_message_sync(sock)
    sock.close()
    assert msg is not None and msg[0] == P.MSG_RESULT
    fid, served = P.decode_step(msg[1])
    assert fid == 0 and served.shape == (C.WIRE_NUM_FLOATS,)
    assert np.isfinite(served).all()
    # --max-frames 1: the CLI exits cleanly after the served frame
    t.join(timeout=30)
    assert not t.is_alive(), "--max-frames did not stop the server"

    # expected: the degraded 3-round path on the weights we saved
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    reg = StagedRegressor(
        variables,
        sep_view=(robot_id - 1) if family == "copenet_twoview_sep" else None,
    )
    st = reg.step1(S._normalize(img)[None], bb[None], init_trans[None])
    for _ in range(2):
        art, shape = reg._mean_art[0], reg._mean_shape[0]
        st = reg.step23(st, bb[None], art[None], shape[None])
    np.testing.assert_allclose(served, state_to_wire(st), atol=1e-5)


def test_lag_one_static_scene_equals_synchronized(rng):
    """The lag-one (degraded peer) regime on a STATIC subject is exactly
    the synchronized protocol: frame f-1's messages equal frame f's, so
    the fallback changes nothing. On a moving sequence it diverges, and
    the divergence must be bounded by the motion scale (the property the
    reference documents but never measures — SURVEY §7)."""
    from airpose_tpu.serve.lagone import lag_one_report

    model = AirPoseTwoView()
    variables = model.init(
        jax.random.PRNGKey(4), jnp.zeros((1, 2, 64, 64, 3)),
        jnp.zeros((1, 2, 3)), jnp.full((1, 2, 3), 0.5))
    init_trans = np.asarray([0, 0, 10.0], np.float32)

    static = np.asarray(rng.normal(size=(2, 64, 64, 3)), np.float32) * 0.1
    imgs = [static for _ in range(4)]
    bbs = [np.zeros((2, 3), np.float32) for _ in range(4)]
    rep = lag_one_report(variables, imgs, bbs, init_trans)
    assert rep["pose_absdiff"] < 1e-6, rep
    assert rep["beta_absdiff"] < 1e-6, rep

    # moving subject: divergence nonzero but same order as the per-frame
    # motion of the synchronized result (lag-one is one frame stale)
    drift = np.asarray(rng.normal(size=(2, 64, 64, 3)), np.float32) * 0.05
    imgs = [static + f * drift for f in range(4)]
    rep_m = lag_one_report(variables, imgs, bbs, init_trans)
    assert rep_m["pose_absdiff"] > 0
    assert rep_m["pose_absdiff"] < 5.0 * max(rep_m["frame_motion_pose"], 1e-9), rep_m


def test_peer_frame_id_restart_drops_stale_entries(served_model):
    """A peer CLIENT restart resets its frame counter mid-link; buffered
    entries from the old run ahead of the restarted counter must be
    dropped, or the new run's frame N would silently consume hours-old
    state (the horizon prune alone never reaches them: the horizon goes
    negative after the restart)."""
    from airpose_tpu.serve.server import AirPoseServer

    _, variables = served_model
    srv = AirPoseServer(StagedRegressor(variables), robot_id=1)
    data = np.zeros(145, np.float32)
    srv._note_peer(P.MSG_STEP1, 4999, data)
    srv._note_peer(P.MSG_STEP1, 5000, data)
    srv._note_peer(P.MSG_STEP1, 0, data)  # counter restarted
    assert (P.MSG_STEP1, 5000) not in srv._peer_msgs
    assert (P.MSG_STEP1, 4999) not in srv._peer_msgs
    assert (P.MSG_STEP1, 0) in srv._peer_msgs


def test_new_peer_link_clears_previous_runs_state(served_model):
    """(Re)establishing the peer link clears buffered messages AND the
    lag-one fallback: a reconnected peer is a fresh run whose frame ids
    may restart, and the old run's state must not condition its rounds."""
    from airpose_tpu.serve.server import AirPoseServer

    _, variables = served_model
    srv = AirPoseServer(StagedRegressor(variables), robot_id=1)
    srv._note_peer(P.MSG_STEP1, 123, np.zeros(145, np.float32))
    assert srv._latest_peer and srv._peer_msgs

    class _W:
        def close(self):
            pass

    async def drive():
        reader = asyncio.StreamReader()
        reader.feed_eof()  # link dies immediately after establishing
        await srv.peer_loop(reader, _W())

    asyncio.run(drive())
    assert not srv._peer_msgs and not srv._latest_peer and not srv._events
    assert srv.peer_writer is None and not srv._transports


def test_stray_connection_cannot_hijack_peer_link(served_model, rng):
    """Only a HELLO-first connection may open the peer link. Previously
    ANY non-IMAGE first message was routed to peer_loop, displacing a
    live peer link — a stray tool speaking the protocol silently degraded
    both drones to lag-one serving."""
    from airpose_tpu.serve.server import AirPoseServer

    _, variables = served_model
    srv = AirPoseServer(StagedRegressor(variables), robot_id=1,
                        peer_timeout=0.1)
    sentinel = object()
    srv.peer_writer = sentinel  # stands in for a live peer link

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    loop, lt = _start_loop_with_server(srv, port)
    try:
        sock = socket.create_connection(("127.0.0.1", port), timeout=5)
        sock.sendall(P.encode_step(
            P.MSG_RESULT, 0, np.zeros(145, np.float32)))
        sock.settimeout(5)
        assert sock.recv(1) == b""  # server closed the connection
        sock.close()
        assert srv.peer_writer is sentinel  # the live link survived
    finally:
        srv.peer_writer = None  # let shutdown not trip on the sentinel
        _stop_loop(loop, lt)


def test_max_frames_exits_with_live_peer_link(served_model, rng):
    """--max-frames must RETURN while the peer link is still alive:
    Server.wait_closed() (3.12.1+) waits for every accepted handler, and
    the higher-id server's inbound peer connection sits in read_message
    forever unless `done` closes it."""
    from airpose_tpu.serve.server import run_server

    _, variables = served_model
    socks = [socket.socket() for _ in range(2)]
    for s in socks:
        s.bind(("127.0.0.1", 0))
    ports = [s.getsockname()[1] for s in socks]
    for s in socks:
        s.close()

    loop = asyncio.new_event_loop()
    done2 = threading.Event()
    tasks = []

    def run_loop():
        asyncio.set_event_loop(loop)
        reg0 = StagedRegressor(variables)
        reg1 = StagedRegressor(variables)
        # robot 1 dials robot 2: the peer link is an ACCEPTED connection
        # of robot 2's server — exactly the handler that used to hang it
        tasks.append(loop.create_task(run_server(
            reg0, 1, ports[0], peer_port=ports[1], peer_timeout=0.3)))
        t2 = loop.create_task(run_server(
            reg1, 2, ports[1], peer_port=ports[0], peer_timeout=0.3,
            max_frames=1))
        tasks.append(t2)
        t2.add_done_callback(lambda _: done2.set())
        loop.run_forever()

    t = threading.Thread(target=run_loop, daemon=True)
    t.start()
    import time

    time.sleep(1.0)
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    fid, data = _client_request(
        ports[1], 1, img, np.asarray([0.0, 0.0, 1.0], np.float32),
        np.asarray([0.0, 0.0, 10.0], np.float32))
    assert fid == 1 and np.isfinite(data).all()
    try:
        assert done2.wait(timeout=30), \
            "run_server(max_frames=1) did not exit with a live peer link"
        assert tasks[1].exception() is None
    finally:
        _stop_loop(loop, t)


@pytest.mark.slow
def test_benchtest_rate_procs_separate_processes(tmp_path):
    """--rate-procs: the served-vs-offline replay with the servers in two
    SEPARATE OS processes (the reference's actual deployment topology, one
    server per drone machine — ref README.md:221-223) instead of two
    coroutines on one event loop. The wire results must still match the
    offline fused forward, and the rate probe must produce a number (the
    PERF.md separate-process FPS row comes from exactly this path)."""
    import contextlib
    import io

    from airpose_tpu.serve.benchtest import main as bench_main
    from airpose_tpu.tools.synth_real_capture import write_capture

    real = str(tmp_path / "cap")
    write_capture(real, n_frames=4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench_main([
            "--datapath", f"real://{real}", "--frames", "0", "4",
            "--random-init", "--batch_size", "4", "--img_res", "64",
            "--rate", "--rate-warmup", "1", "--rate-procs",
        ])
    out = buf.getvalue()
    vals = {
        line.split(": ")[0]: float(line.split(": ")[1])
        for line in out.splitlines() if line.startswith("benchtest_")
    }
    assert vals["benchtest_absdiff_pose_m1"] < 1e-3, out
    assert vals["benchtest_absdiff_pose_m2"] < 1e-3, out
    assert vals["benchtest_served_fps"] > 0, out
