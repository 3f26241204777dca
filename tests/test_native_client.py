"""End-to-end distributed test (the reference benchtest equivalent,
SURVEY.md §4.5): two AirPose servers + two native C++ clients on localhost
running the full 3-round synchronization at 4 FPS."""

import asyncio
import os
import shutil
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


def _ensure_client_built():
    if os.path.exists(CLIENT):
        return True
    if shutil.which("cmake") is None:
        return False
    gen = ["-G", "Ninja"] if shutil.which("ninja") else []
    try:
        subprocess.run(
            ["cmake", "-S", NATIVE, "-B", os.path.join(NATIVE, "build")] + gen,
            check=True, capture_output=True,
        )
        subprocess.run(
            ["cmake", "--build", os.path.join(NATIVE, "build")],
            check=True, capture_output=True,
        )
    except subprocess.CalledProcessError:
        return False
    return os.path.exists(CLIENT)


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

    n_frames = 3
    procs = [
        subprocess.Popen(
            [CLIENT, "--host", "127.0.0.1", "--port", str(ports[v]),
             "--robot-id", str(v + 1), "--frames", str(n_frames), "--fps", "4"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for v in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=180)
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
