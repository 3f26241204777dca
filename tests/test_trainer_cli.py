"""Trainer CLI smoke tests (tiny shapes, CPU): synthetic supervised run
with checkpoint + auto-resume, and the real:// self-supervised path."""

import os

import numpy as np
import pytest


@pytest.mark.slow
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


@pytest.mark.slow
def test_trainer_cli_h36m_joints(tmp_path):
    """h36m:// datapath: the joints-only supervised path (the loaders the
    reference shipped legacy-broken and never wired into a loss) trains
    end to end through the CLI."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_data import _write_fake_h36m

    from airpose_tpu.train.trainer import main

    ds = str(tmp_path / "h36m")
    os.makedirs(ds)
    _write_fake_h36m(ds, n=3)
    main([
        "--name", "hsmoke", "--version", "0", "--model", "copenet_twoview",
        "--datapath", f"h36m://{ds}", "--log_dir", str(tmp_path / "logs"),
        "--batch_size", "2", "--val_batch_size", "2",
        "--max_steps", "2", "--val_every", "2",
    ])
    ckpt_dir = os.path.join(str(tmp_path / "logs"), "hsmoke", "version_0",
                            "checkpoints")
    assert os.path.exists(os.path.join(ckpt_dir, "last"))


@pytest.mark.slow
def test_trainer_cli_totalcap(tmp_path):
    """totalcap:// datapath: SMPL-parameter GT runs through the FULL
    supervised twoview loss via twoview_gt_from_smpl."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_data import _write_fake_totalcap

    from airpose_tpu.train.trainer import main

    ds = str(tmp_path / "totalcap")
    os.makedirs(ds)
    _write_fake_totalcap(ds, n=5)
    main([
        "--name", "tsmoke", "--version", "0", "--model", "copenet_twoview",
        "--datapath", f"totalcap://{ds}", "--log_dir", str(tmp_path / "logs"),
        "--batch_size", "2", "--val_batch_size", "1",
        "--max_steps", "2", "--val_every", "2",
    ])
    ckpt_dir = os.path.join(str(tmp_path / "logs"), "tsmoke", "version_0",
                            "checkpoints")
    assert os.path.exists(os.path.join(ckpt_dir, "last"))


@pytest.mark.slow
def test_trainer_cli_mixed_h36m_totalcap(tmp_path, capsys):
    """mixed:// datapath: heterogeneous 50/50 training — joints-GT (h36m)
    and SMPL-GT (totalcap) batches interleave, each dispatched to its own
    supervised loss over ONE TrainState (the behavior the reference's
    MixedDataset declared but never had — mixed_dataset.py:29 always
    returns dataset[0]). The val epoch always covers BOTH sources, so both
    loss programs execute regardless of the train draw sequence."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_data import _write_fake_h36m, _write_fake_totalcap

    from airpose_tpu.train.trainer import main

    h = str(tmp_path / "h36m")
    t = str(tmp_path / "tc")
    os.makedirs(h)
    os.makedirs(t)
    _write_fake_h36m(h, n=3)
    _write_fake_totalcap(t, n=5)
    main([
        "--name", "msmoke", "--version", "0", "--model", "copenet_twoview",
        "--datapath", f"mixed://h36m={h},totalcap={t}",
        "--log_dir", str(tmp_path / "logs"),
        "--batch_size", "2", "--val_batch_size", "1",
        "--max_steps", "4", "--val_every", "4", "--data_workers", "1",
    ])
    ckpt_dir = os.path.join(str(tmp_path / "logs"), "msmoke", "version_0",
                            "checkpoints")
    assert os.path.exists(os.path.join(ckpt_dir, "last"))
    # heterogeneous val reports each source's OWN loss mean next to the
    # combined one (different loss kinds don't hide behind one average)
    out = capsys.readouterr().out
    assert "val_loss" in out and "h36m " in out and "totalcap " in out


def test_trainer_cli_rejects_empty_val_split(tmp_path):
    """A source whose val split is empty must fail fast at startup with a
    clear message, not crash with range(step=0) at the first val epoch:
    a 1-frame totalcap db (80/20 -> 0 val frames) is rejected."""
    import sys

    import pytest

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_data import _write_fake_totalcap

    from airpose_tpu.train.trainer import main

    t = str(tmp_path / "tc1")
    os.makedirs(t)
    _write_fake_totalcap(t, n=1)
    with pytest.raises(SystemExit, match="at least 2"):
        main([
            "--name", "bad", "--version", "0", "--model", "copenet_twoview",
            "--datapath", f"totalcap://{t}", "--log_dir",
            str(tmp_path / "logs"), "--batch_size", "1", "--max_steps", "1",
        ])


@pytest.mark.slow
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


@pytest.mark.slow
def test_trainer_cli_pretrained_reg_only_finetune(tmp_path):
    """The reference README's synthetic→real chain (ref README.md:117-124:
    resume real training from the synthetic checkpoint;
    copenet_real/copenet_twoview.py:361-373 freezes all but the regressor
    heads): --pretrained_checkpoint warm-starts params ACROSS optimizer
    variants (amsgrad pretrain → train_reg_only multi_transform), the
    trunk stays bit-exact frozen, and the heads move."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    from test_data import _write_fake_real

    from airpose_tpu.train.checkpoint import load_model_variables
    from airpose_tpu.train.trainer import main

    logs = str(tmp_path / "logs")
    main([
        "--name", "pre", "--version", "0", "--model", "copenet_twoview",
        "--datapath", "synthetic://8", "--log_dir", logs,
        "--batch_size", "2", "--val_batch_size", "2", "--max_steps", "2",
        "--val_every", "2", "--img_res", "64",
    ])
    pre = os.path.join(logs, "pre", "version_0", "checkpoints", "last")

    ds = str(tmp_path / "real")
    os.makedirs(ds)
    _write_fake_real(ds, n=6)
    main([
        "--name", "ft", "--version", "0", "--model", "copenet_twoview",
        "--datapath", f"real://{ds}", "--train_frames", "0", "4",
        "--test_frames", "4", "6", "--log_dir", logs,
        "--pretrained_checkpoint", pre, "--train_reg_only",
        "--batch_size", "2", "--val_batch_size", "2", "--max_steps", "2",
        "--val_every", "2", "--img_res", "64",
    ])
    ft = os.path.join(logs, "ft", "version_0", "checkpoints", "last")

    _, a = load_model_variables("copenet_twoview", ckpt=pre)
    _, b = load_model_variables("copenet_twoview", ckpt=ft)
    # warm start took AND the freeze held: the fine-tuned trunk equals the
    # PRETRAINED trunk bit-exact (a fresh-init trunk would differ — the
    # pretrain moved it off the seeded init)
    for x, y in zip(jax.tree.leaves(a["params"]["trunk"]),
                    jax.tree.leaves(b["params"]["trunk"])):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # ... while the regressor heads moved
    moved = max(
        float(np.abs(np.asarray(x) - np.asarray(y)).max())
        for x, y in zip(jax.tree.leaves(a["params"]["core"]),
                        jax.tree.leaves(b["params"]["core"]))
    )
    assert moved > 0, "train_reg_only fine-tune did not move the heads"


@pytest.mark.slow
def test_trainer_cli_pretrained_checkpoint_wrong_family(tmp_path):
    """A pretrained checkpoint from a DIFFERENT model family fails fast
    with a diagnosis, not a tree error deep inside the train step."""
    from airpose_tpu.train.trainer import main

    logs = str(tmp_path / "logs")
    main([
        "--name", "pre", "--version", "0", "--model", "muhmr",
        "--datapath", "synthetic://6", "--log_dir", logs,
        "--batch_size", "2", "--val_batch_size", "2", "--max_steps", "1",
        "--val_every", "1", "--img_res", "64",
    ])
    pre = os.path.join(logs, "pre", "version_0", "checkpoints", "last")
    with pytest.raises(SystemExit, match="different param tree"):
        main([
            "--name", "bad", "--version", "0", "--model", "copenet_twoview",
            "--datapath", "synthetic://6", "--log_dir", logs,
            "--pretrained_checkpoint", pre,
            "--batch_size", "2", "--val_batch_size", "2", "--max_steps", "1",
            "--val_every", "1", "--img_res", "64",
        ])
