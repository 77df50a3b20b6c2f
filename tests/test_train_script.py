"""train.py end-to-end smoke: a few DP steps over a dummy dataset with
validation + checkpointing."""

import json
import sys
from pathlib import Path

import pytest
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ptlflow_tpu.data import dummy_datasets


def test_train_script_smoke(tmp_path, monkeypatch):
    import train as train_mod

    roots = {"flying_chairs": str(dummy_datasets.write_flying_chairs(
        tmp_path, n=3, size=(128, 128)))}
    cfg = tmp_path / "datasets.yaml"
    cfg.write_text(yaml.safe_dump(roots))

    ckpt_dir = tmp_path / "ckpts"
    monkeypatch.setattr(sys, "argv", [
        "train.py", "--model", "raft_small",
        "--set", f"data.dataset_config_path={cfg}",
        "model.init_args.iters=2", "data.train_num_workers=0",
        "--train_dataset", "chairs-trainval",
        "--val_dataset", "chairs-trainval",
        "--train_batch_size", "1",
        "--train_crop_size", "128", "128",
        "--max_steps", "2",
        "--val_every_n_steps", "2",
        "--log_every_n_steps", "1",
        "--n_devices", "1",
        "--ckpt_dir", str(ckpt_dir)])
    train_mod.main()

    out = ckpt_dir / "raft_small"
    assert (out / "last").exists()
    info = json.loads((out / "train_info.json").read_text())
    assert info["steps"] == 2
    assert (out / "index.json").exists()  # top-k index from validation


def test_train_script_max_epochs(tmp_path, monkeypatch):
    """--max_epochs converts to steps across the mesh
    (reference base_model.py:507-539)."""
    import train as train_mod

    roots = {"flying_chairs": str(dummy_datasets.write_flying_chairs(
        tmp_path, n=3, size=(128, 128)))}
    cfg = tmp_path / "datasets.yaml"
    cfg.write_text(yaml.safe_dump(roots))
    monkeypatch.setattr(sys, "argv", [
        "train.py", "--model", "raft_small",
        "--set", f"data.dataset_config_path={cfg}",
        "model.init_args.iters=2", "data.train_num_workers=0",
        "--train_dataset", "chairs-trainval",
        "--val_dataset", "chairs-trainval",
        "--train_batch_size", "2",
        "--train_crop_size", "128", "128",
        "--max_epochs", "1",
        "--val_every_n_steps", "100",
        "--log_every_n_steps", "1",
        "--n_devices", "1",
        "--ckpt_dir", str(tmp_path / "ckpts_ep")])
    train_mod.main()  # 3 samples, bs=2 -> 2 steps; finishes quickly


def test_train_script_accumulate_grad_batches(tmp_path, monkeypatch):
    """--accumulate_grad_batches wraps the optimizer in optax.MultiSteps
    (Lightning Trainer.accumulate_grad_batches, used by the reference
    dpflow-train3-sintel.yaml)."""
    import train as train_mod

    roots = {"flying_chairs": str(dummy_datasets.write_flying_chairs(
        tmp_path, n=3, size=(128, 128)))}
    cfg = tmp_path / "datasets.yaml"
    cfg.write_text(yaml.safe_dump(roots))
    ckpt_dir = tmp_path / "ckpts_acc"
    monkeypatch.setattr(sys, "argv", [
        "train.py", "--model", "raft_small",
        "--set", f"data.dataset_config_path={cfg}",
        "model.init_args.iters=2", "data.train_num_workers=0",
        "--train_dataset", "chairs-trainval",
        "--val_dataset", "chairs-trainval",
        "--train_batch_size", "1",
        "--train_crop_size", "128", "128",
        "--max_steps", "2",
        "--accumulate_grad_batches", "2",
        "--val_every_n_steps", "100",
        "--log_every_n_steps", "1",
        "--n_devices", "1",
        "--ckpt_dir", str(ckpt_dir)])
    train_mod.main()
    out = ckpt_dir / "raft_small"
    assert (out / "last").exists()


def test_train_script_resume(tmp_path, monkeypatch):
    """--resume restores the full training state (optimizer + step) from
    last_state — the reference connector's resume path
    (ptlflow_checkpoint_connector.py:41-196)."""
    import train as train_mod

    roots = {"flying_chairs": str(dummy_datasets.write_flying_chairs(
        tmp_path, n=3, size=(128, 128)))}
    cfg = tmp_path / "datasets.yaml"
    cfg.write_text(yaml.safe_dump(roots))
    ckpt_dir = tmp_path / "ckpts_resume"
    base_argv = [
        "train.py", "--model", "raft_small",
        "--set", f"data.dataset_config_path={cfg}",
        "model.init_args.iters=2", "data.train_num_workers=0",
        "--train_dataset", "chairs-trainval",
        "--val_dataset", "chairs-trainval",
        "--train_batch_size", "1",
        "--train_crop_size", "128", "128",
        "--val_every_n_steps", "2",
        "--log_every_n_steps", "1",
        "--n_devices", "1",
        "--ckpt_dir", str(ckpt_dir)]
    monkeypatch.setattr(sys, "argv", base_argv + ["--max_steps", "2"])
    train_mod.main()
    assert (ckpt_dir / "raft_small" / "last_state").exists()

    # resume for 2 more steps; must pick up at step 2, not 0
    monkeypatch.setattr(sys, "argv",
                        base_argv + ["--max_steps", "4", "--resume"])
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        train_mod.main()
    out = buf.getvalue()
    assert "resumed training state" in out and "at step 2" in out, out
    assert "step 3/4" in out, out
