"""Trainer CLI smoke tests (tiny shapes, CPU): synthetic supervised run
with checkpoint + auto-resume, and the real:// self-supervised path."""

import os

import numpy as np
import pytest


def test_trainer_cli_synthetic_and_resume(tmp_path):
    from airpose_tpu.train.trainer import main

    log_dir = str(tmp_path / "logs")
    args = [
        "--name", "smoke", "--version", "0", "--model", "copenet_twoview",
        "--datapath", "synthetic://12", "--log_dir", log_dir,
        "--batch_size", "3", "--val_batch_size", "3",
        "--max_steps", "3", "--val_every", "3", "--img_res", "64",
    ]
    main(args)
    ckpt_dir = os.path.join(log_dir, "smoke", "version_0", "checkpoints")
    assert os.path.exists(os.path.join(ckpt_dir, "last"))
    assert os.path.exists(os.path.join(ckpt_dir, "best"))

    # resume: continue to step 5 from the saved step-3 state
    main(args[:-3] + ["5", "--val_every", "5", "--img_res", "64"])


def test_trainer_cli_real_finetune(tmp_path):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_data import _write_fake_real

    from airpose_tpu.train.trainer import main

    ds = str(tmp_path / "real")
    os.makedirs(ds)
    _write_fake_real(ds, n=6)
    main([
        "--name", "rsmoke", "--version", "0", "--model", "copenet_twoview",
        "--datapath", f"real://{ds}", "--train_frames", "0", "4",
        "--test_frames", "4", "6", "--log_dir", str(tmp_path / "logs"),
        "--batch_size", "2", "--val_batch_size", "2",
        "--max_steps", "2", "--val_every", "2",
    ])
