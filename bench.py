#!/usr/bin/env python
"""Headline benchmark: two-view AirPose perception throughput on one chip.

Measures the full per-frame perception step a consumer of the framework
runs in the recommended serving configuration: two-view ResNet-50 with the
int8 PTQ trunk (per-channel weights + calibrated static activation scales,
ops/int8_trunk.py — measured 1.38× the bf16 trunk at feature correlation
0.9997 / IEF pose mean-abs-delta 1.7% of pose RMS, PERF.md) + 3-step IEF
regression + 6D→rotmat + full SMPL-X mesh forward + 2D projection, at
batch 64. Set AIRPOSE_BENCH_BF16=1 for the unquantized bf16 path.

Prints ONE JSON line:
  {"metric": "two_view_fps", "value": N, "unit": "frames/s",
   "vs_baseline": N / 1000.0}
vs_baseline is against the rebuild north star (≥1,000 two-view frames/s per
chip, BASELINE.md); the reference's own end-to-end figure is 4 FPS.

Timing notes (this environment): block_until_ready does not synchronize on
the axon relay backend, so the timed region ends with a device→host
transfer; the timing loop runs inside one jit with the image depending on
the scan carry so XLA cannot hoist the trunk. The relay adds a measured
~28 ms fixed dispatch+transfer cost PER JIT CALL (a trivial scan step costs
0.95 ms/iter at length 30 but ~0 at length 200), so the loop runs 200
iterations to report steady-state device throughput rather than relay
round-trip latency.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from airpose_tpu import constants as C
from airpose_tpu.bodymodel import smplx_forward, synthetic_smplx_params
from airpose_tpu.geometry.rotations import rot6d_to_rotmat
from airpose_tpu.models import AirPoseTwoView
from airpose_tpu.ops import (calibrate_act_scales, quantize_trunk_params,
                             twoview_int8_forward)
from airpose_tpu.train.losses import cam_frame_and_project

B = 64
N_ITERS = 200


def _wait_for_backend(deadline_s: float = 900.0, probe_timeout_s: float = 90.0):
    """The axon relay can go fully down: even jax.devices() then hangs
    forever. Probe backend init in a bounded subprocess (it exits and
    releases the chip before we init) and retry until the deadline, so a
    relay outage surfaces as a loud timely error instead of an eternal
    hang. AIRPOSE_BENCH_NO_PROBE=1 skips (e.g. CPU smoke runs)."""
    import subprocess
    import sys

    if os.environ.get("AIRPOSE_BENCH_NO_PROBE"):
        return
    t0 = time.monotonic()
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout_s, capture_output=True)
            if r.returncode == 0:
                return
            err = r.stderr.decode(errors="replace")[-300:]
        except subprocess.TimeoutExpired:
            err = f"backend init hung > {probe_timeout_s:.0f}s"
        waited = time.monotonic() - t0
        if waited > deadline_s:
            raise RuntimeError(
                f"TPU backend unreachable after {waited:.0f}s "
                f"({attempt} probes); last: {err}")
        print(f"bench: backend probe {attempt} failed ({err.strip()}); "
              "retrying in 30s", file=sys.stderr, flush=True)
        time.sleep(30)


def main():
    _wait_for_backend()
    model = AirPoseTwoView(dtype=jnp.bfloat16)
    smplx_params = synthetic_smplx_params()  # full-size 10475-vertex body
    use_bf16 = bool(os.environ.get("AIRPOSE_BENCH_BF16"))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 2, 224, 224, 3)).astype(np.float32))
    bb = jnp.zeros((B, 2, 3))
    pos = jnp.full((B, 2, 3), 10.0 * C.TRANS_SCALE)
    fx, fy = C.FOCAL_LENGTH
    intr = jnp.broadcast_to(
        jnp.asarray([[fx, 0, C.CX], [0, fy, C.CY], [0, 0, 1.0]]), (B, 2, 3, 3)
    )

    variables = model.init(jax.random.PRNGKey(0), x, bb, pos)
    if not use_bf16:
        qp = quantize_trunk_params(variables)
        # one-shot PTQ calibration pass (tiny batch: the scales are
        # per-tensor maxima; deployments calibrate on real data)
        scales = calibrate_act_scales(qp, x[:1].reshape(2, 224, 224, 3))

    def forward(v, images):
        if use_bf16:
            return model.apply(v, images, bb, pos)
        return twoview_int8_forward(model, v, qp, scales, images, bb, pos)

    def perceive(v, images):
        out = forward(v, images)
        trans = out.pose[..., :3] / C.TRANS_SCALE
        rotmat = rot6d_to_rotmat(out.pose[..., 3:].reshape(B, 2, 22, 6))
        eye = jnp.broadcast_to(jnp.eye(3), (B * 2, 1, 3, 3))
        body = smplx_forward(
            smplx_params,
            out.betas.reshape(B * 2, 10),
            body_pose=rotmat[:, :, 1:].reshape(B * 2, 21, 3, 3),
            global_orient=eye,
        )
        joints = body.joints.reshape(B, 2, -1, 3)
        verts = body.vertices.reshape(B, 2, -1, 3)
        _, j2d = cam_frame_and_project(
            rotmat[:, :, 0], trans, joints, intr, C.FOCAL_LENGTH
        )
        return verts, j2d

    @jax.jit
    def chain(v, images):
        def step(carry, _):
            verts, j2d = perceive(v, images + carry * 1e-6)
            return j2d.mean(), (verts.mean(), j2d.mean())
        _, outs = jax.lax.scan(step, jnp.float32(0.0), None, length=N_ITERS)
        return outs[0].sum() + outs[1].sum()

    def run_with_retry(fn, attempts=3):
        # the axon backend occasionally throws transient FAILED_PRECONDITION
        for i in range(attempts):
            try:
                return fn()
            except Exception:
                if i == attempts - 1:
                    raise
                time.sleep(30)

    import sys

    print("bench: compiling + warmup (remote compile of the full int8 "
          "perception chain has measured 3-15 min on this relay)",
          file=sys.stderr, flush=True)
    t_compile = time.monotonic()
    run_with_retry(lambda: float(chain(variables, x)))  # warmup/compile
    print(f"bench: warmup done in {time.monotonic() - t_compile:.0f}s; "
          f"timing repeats", file=sys.stderr, flush=True)
    # Median of N repeats with printed spread: single-shot runs through the
    # relay have shown −2% excursions (round-4 driver capture 8,973 vs the
    # builder's 9,113–9,139 triplet — PERF.md "bench stability"), so the
    # recorded value is the median and the JSON carries min/max.
    n_repeats = max(1, int(os.environ.get("AIRPOSE_BENCH_REPEATS", "5")))
    fps_runs = []

    def timed_repeat():
        t0 = time.perf_counter()
        result = float(chain(variables, x))  # transfer = sync barrier
        dt = (time.perf_counter() - t0) / N_ITERS
        assert np.isfinite(result)
        return B / dt

    for _ in range(n_repeats):
        # each repeat retried independently: a transient relay error mid-
        # sweep must not abort the bench after the expensive warmup compile
        fps_runs.append(run_with_retry(timed_repeat))

    fps = float(np.median(fps_runs))
    print(
        json.dumps(
            {
                "metric": "two_view_fps",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / 1000.0, 3),
                "repeats": n_repeats,
                "min": round(min(fps_runs), 1),
                "max": round(max(fps_runs), 1),
                "spread_pct": round(
                    100.0 * (max(fps_runs) - min(fps_runs)) / fps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
