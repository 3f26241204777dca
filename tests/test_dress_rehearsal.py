"""The one-command dress rehearsal (tools/dress_rehearsal.py) must run the
whole reference workflow — dataset creation → training → converter round
trip → on-disk eval (bf16+int8) → real-layout eval → AirPose+ → serve
benchtest — end to end on fixture scales and produce a coherent summary.
This is the regression net over all the CLI entry points at once."""

import json
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_dress_rehearsal_end_to_end(tmp_path):
    from airpose_tpu.tools.dress_rehearsal import run

    summary = run(
        str(tmp_path / "wd"), steps=2, frames=4, subjects=2,
        img_res=64, ba_iters=(2, 3), verts=60, batch_size=2,
        ft_steps=8,  # below the demonstration budget: stage 7's
        #              loss-improvement assert arms at >= 24 steps (the
        #              default CLI run); here it records, like BA stage 2
    )

    # every stage reported
    for key in ("train_best_val", "converter_roundtrip_max_err",
                "synth_bf16", "synth_int8", "real", "real_ft",
                "ba_stage1_first",
                "ba_stage1_final", "ba_loss_final",
                "benchtest_absdiff_pose_m1", "benchtest_served_fps",
                "h36m"):
        assert key in summary, key
    # stage 9: mixed:// train + H36M-protocol eval over generated dbs
    assert np.isfinite(summary["h36m"]["mpjpe0"])
    assert np.isfinite(summary["h36m"]["pa_mpjpe1"])

    assert summary["converter_roundtrip_max_err"] < 1e-6
    assert np.isfinite(summary["synth_bf16"]["mpjpe0"])
    assert np.isfinite(summary["synth_int8"]["mpjpe0"])
    assert np.isfinite(summary["real"]["crossview_consistency"])
    # stage 7 (synthetic→real fine-tune) ran and evaluated; the
    # improvement assert itself arms only at demonstration budget
    assert np.isfinite(summary["real_ft"]["loss"])
    assert np.isfinite(summary["real_ft"]["crossview_consistency"])
    # stage-1 (z frozen) is the prior-independent health signal; full
    # descent at real iteration counts is proven in test_bundle_adjust,
    # and stage 2 optimizes through the rehearsal's RANDOM VPoser
    # decoder, so only stage-1 sanity + overall liveness are asserted
    assert np.isfinite(summary["ba_stage1_first"])
    assert np.isfinite(summary["ba_stage1_final"])
    assert np.isfinite(summary["ba_loss_final"])
    assert summary["benchtest_absdiff_pose_m1"] < 1e-3
    assert summary["benchtest_served_fps"] > 0
    # stage 8b runs whenever a C++ toolchain is available (it is in this
    # image); the native client's own crop path bounds the residual
    if "native_benchtest_absdiff_pose_m1" in summary:
        assert summary["native_benchtest_absdiff_pose_m1"] < 2e-2

    with open(str(tmp_path / "wd" / "rehearsal_summary.json")) as f:
        on_disk = json.load(f)
    assert on_disk.keys() == summary.keys()
    assert os.path.exists(
        str(tmp_path / "wd" / "airpose_plus" / "cam_trajectory_test.png"))
