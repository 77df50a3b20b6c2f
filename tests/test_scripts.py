"""End-to-end script tests over dummy datasets (reference strategy:
tests/test_validate.py, test_infer.py, test_test.py)."""

import argparse
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ptlflow_tpu.data import dummy_datasets


@pytest.fixture(scope="module")
def sintel_cfg(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("scripts")
    roots = {
        "mpi_sintel": str(dummy_datasets.write_sintel(
            tmp_path, n_seqs=1, n_frames=2, size=(128, 128))),
        "kitti_2015": str(dummy_datasets.write_kitti(
            tmp_path, n=1, size=(128, 128))),
    }
    cfg = tmp_path / "datasets.yaml"
    cfg.write_text(yaml.safe_dump(roots))
    return tmp_path, cfg


def test_validate_script(sintel_cfg):
    import validate as validate_mod

    tmp_path, cfg = sintel_cfg
    args = argparse.Namespace(
        model="raft_small", ckpt_path=None, config=None,
        set=[f"data.dataset_config_path={cfg}"],
        val_dataset="sintel-clean-trainval", warm_start=False,
        output_path=str(tmp_path / "out_validate"), write_outputs=True,
        scale_factor=None, max_forward_side=None, iters=None, max_samples=2,
        all=False, select=None, exclude=None)
    import ptlflow_tpu

    model = ptlflow_tpu.get_model("raft_small", args={"iters": 2})
    model.init_params()
    metrics = validate_mod.validate(args, model=model,
                                    model_name="raft_small")
    assert "sintel-clean-trainval" in metrics
    m = metrics["sintel-clean-trainval"]
    assert np.isfinite(m["epe"])
    out_dir = tmp_path / "out_validate" / "raft_small"
    assert (out_dir / "metrics.csv").exists()
    assert list((out_dir / "sintel-clean-trainval").glob("*.flo"))
    assert list((out_dir / "sintel-clean-trainval").glob("*_viz.png"))


def test_validate_script_scaled(sintel_cfg, tmp_path):
    """--scale_factor / --max_forward_side must actually rescale the forward
    pass and unscale predictions (reference validate.py:100-114)."""
    import validate as validate_mod

    tmp, cfg = sintel_cfg
    args = argparse.Namespace(
        model="raft_small", ckpt_path=None, config=None,
        set=[f"data.dataset_config_path={cfg}"],
        val_dataset="sintel-clean-trainval", warm_start=False,
        output_path=str(tmp_path / "out_validate_scaled"),
        write_outputs=False,
        scale_factor=0.5, max_forward_side=None, iters=2, max_samples=1,
        all=False, select=None, exclude=None)
    metrics = validate_mod.validate(args)
    m = metrics["sintel-clean-trainval"]
    assert np.isfinite(m["epe"])

    # max_forward_side smaller than the 128px input forces a downscale too
    args.scale_factor = None
    args.max_forward_side = 64
    metrics = validate_mod.validate(args)
    assert np.isfinite(metrics["sintel-clean-trainval"]["epe"])


def test_validate_script_bf16(sintel_cfg, tmp_path):
    """--bf16 runs raft through the guarded mixed_precision path."""
    import validate as validate_mod

    tmp, cfg = sintel_cfg
    args = argparse.Namespace(
        model="raft_small", ckpt_path=None, config=None,
        set=[f"data.dataset_config_path={cfg}"],
        val_dataset="sintel-clean-trainval", warm_start=False,
        output_path=str(tmp_path / "out_validate_bf16"),
        write_outputs=False, bf16=True,
        scale_factor=None, max_forward_side=None, iters=2, max_samples=1,
        all=False, select=None, exclude=None)
    metrics = validate_mod.validate(args)
    assert np.isfinite(metrics["sintel-clean-trainval"]["epe"])


def test_validate_script_bf16_allowlist_denies(sintel_cfg, tmp_path):
    """A model the bf16 sweep rejected (gma diverges under the blind cast,
    outputs/benchmark_tpu/bf16_sweep.csv) must fall back to fp32 instead of
    being cast — the allow-list consumption VERDICT round 2 asked for."""
    import json

    import validate as validate_mod
    from ptlflow_tpu import get_model

    allow_path = (Path(validate_mod.ptlflow_tpu.__file__).parent / "utils" /
                  "bf16_allowlist.json")
    if not allow_path.exists():
        pytest.skip("bf16_allowlist.json not generated")
    with open(allow_path) as f:
        allow = set(json.load(f)["allow"])
    assert "gma" not in allow, "sweep result changed; pick another denied model"

    tmp, cfg = sintel_cfg
    args = argparse.Namespace(
        model="gma", ckpt_path=None, config=None,
        set=[f"data.dataset_config_path={cfg}"],
        val_dataset="sintel-clean-trainval", warm_start=False,
        output_path=str(tmp_path / "out_validate_bf16_deny"),
        write_outputs=False, bf16=True,
        scale_factor=None, max_forward_side=None, iters=2, max_samples=1,
        all=False, select=None, exclude=None)
    model = get_model("gma", args={"iters": 2})
    model.init_params()
    metrics = validate_mod.validate(args, model=model, model_name="gma")
    assert np.isfinite(metrics["sintel-clean-trainval"]["epe"])
    # parameters must have stayed fp32 (the cast was refused)
    import jax

    leaf = jax.tree.leaves(model.params)[0]
    assert leaf.dtype == np.float32


def test_validate_script_spatial_shards(sintel_cfg, tmp_path):
    """--spatial_shards N runs RAFT with the corr volume sharded over the
    'spatial' mesh axis (SURVEY §5.7 path, 8 virtual CPU devices)."""
    import validate as validate_mod

    tmp, cfg = sintel_cfg
    args = argparse.Namespace(
        model="raft_small", ckpt_path=None, config=None,
        set=[f"data.dataset_config_path={cfg}"],
        val_dataset="sintel-clean-trainval", warm_start=False,
        output_path=str(tmp_path / "out_validate_shards"),
        write_outputs=False, bf16=False, spatial_shards=8,
        scale_factor=None, max_forward_side=None, iters=2, max_samples=1,
        all=False, select=None, exclude=None)
    metrics = validate_mod.validate(args)
    assert np.isfinite(metrics["sintel-clean-trainval"]["epe"])


def test_validate_script_seq_val_mode(tmp_path):
    """--seq_val_mode selects one GT frame of a multi-frame sequence
    (reference validate.py:423-438)."""
    import validate as validate_mod

    roots = {"mpi_sintel": str(dummy_datasets.write_sintel(
        tmp_path, n_seqs=1, n_frames=4, size=(128, 128)))}
    cfg = tmp_path / "datasets.yaml"
    cfg.write_text(yaml.safe_dump(roots))
    args = argparse.Namespace(
        model="raft_small", ckpt_path=None, config=None,
        set=[f"data.dataset_config_path={cfg}"],
        val_dataset="sintel-clean-trainval-seqlen_3", warm_start=False,
        output_path=str(tmp_path / "out_validate_seq"),
        write_outputs=False, bf16=False, seq_val_mode="last",
        scale_factor=None, max_forward_side=None, iters=2, max_samples=1,
        all=False, select=None, exclude=None)
    metrics = validate_mod.validate(args)
    assert np.isfinite(metrics["sintel-clean-trainval-seqlen_3"]["epe"])


def test_infer_script(sintel_cfg, tmp_path):
    import infer as infer_mod

    tmp, _ = sintel_cfg
    seq_dir = (Path(tmp) / "MPI-Sintel" / "training" / "clean").glob("*")
    seq_dir = sorted(seq_dir)[0]
    frames = sorted(seq_dir.glob("*.png"))[:2]
    args = argparse.Namespace(
        model="raft_small", ckpt_path=None, config=None,
        set=["model.init_args.iters=2"],
        input_path=[str(frames[0]), str(frames[1])],
        output_path=str(tmp_path / "out_infer"), flow_format="flo",
        gt_path=None, scale_factor=None, max_forward_side=None,
        write_viz=True)
    infer_mod.infer(args)
    out = tmp_path / "out_infer"
    assert list(out.glob("*.flo"))
    assert list(out.glob("*_viz.png"))


def test_test_script_sintel_submission(sintel_cfg, tmp_path, monkeypatch):
    import test as test_mod

    tmp, cfg = sintel_cfg
    monkeypatch.setattr(
        sys, "argv",
        ["test.py", "--model", "raft_small",
         "--set", f"data.dataset_config_path={cfg}",
         "model.init_args.iters=2",
         "--test_dataset", "sintel-clean-test",
         "--output_path", str(tmp_path / "out_test"),
         "--max_samples", "1"])
    test_mod.main()
    flos = list((tmp_path / "out_test").rglob("*.flo"))
    assert flos, "no sintel submission files written"


def test_summary_metrics_script(sintel_cfg, tmp_path):
    import csv

    import summary_metrics as sm

    out = tmp_path / "val" / "raft_small"
    out.mkdir(parents=True)
    with open(out / "metrics.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["model", "checkpoint", "dataset", "epe", "px1"])
        w.writerow(["raft_small", "things", "sintel-clean", "1.5", "0.9"])
        w.writerow(["raft_small", "things", "kitti-2015", "3.0", "0.7"])
    written = sm.summarize(str(tmp_path / "val"), str(tmp_path / "sum"),
                           ["epe", "px1"])
    assert "epe" in written and written["epe"].exists()


def test_validate_script_output_flags(sintel_cfg, tmp_path):
    """--flow_format original/png, --write_individual_metrics,
    --metric_exclude, and the EPE-map visualization (reference
    validate.py:90-99,149-165,186-199)."""
    import validate as validate_mod

    tmp, cfg = sintel_cfg
    args = argparse.Namespace(
        model="raft_small", ckpt_path=None, config=None,
        set=[f"data.dataset_config_path={cfg}"],
        val_dataset="kitti-2015-trainval", warm_start=False,
        output_path=str(tmp_path / "out_validate_fmt"), write_outputs=True,
        scale_factor=None, max_forward_side=None, iters=2, max_samples=1,
        all=False, select=None, exclude=None,
        flow_format="original", write_individual_metrics=True,
        metric_exclude=["wauc"], epe_clip=5.0)
    metrics = validate_mod.validate(args)
    m = metrics["kitti-2015-trainval"]
    assert np.isfinite(m["epe"])
    assert "wauc" not in m  # --metric_exclude
    out_dir = tmp_path / "out_validate_fmt" / "raft_small"
    sub = out_dir / "kitti-2015-trainval"
    # 'original' on a KITTI dataset -> 16-bit PNG flow files
    assert (sub / "000000.png").exists()
    assert not list(sub.glob("*.flo"))
    assert list(sub.glob("*_epe.png"))  # EPE-map viz
    ind = out_dir / "kitti-2015-trainval_individual_metrics.csv"
    assert ind.exists()
    import csv

    with open(ind) as f:
        rows = list(csv.DictReader(f))
    assert rows and "epe" in rows[0]
