"""Checkpoint manager: top-k, hpc auto-resume scan, resume priority."""

import numpy as np

import jax.numpy as jnp

from ptlflow_tpu.utils.checkpoint_manager import CheckpointManager


def _params(v):
    return {"layer": {"weight": jnp.full((4, 4), float(v))}}


def test_topk_and_last(tmp_path):
    cm = CheckpointManager(str(tmp_path), top_k=2, monitor="val/epe")
    cm.save_step(_params(1), 100, {"val/epe": 3.0})
    cm.save_step(_params(2), 200, {"val/epe": 1.0})
    cm.save_step(_params(3), 300, {"val/epe": 2.0})
    cm.save_step(_params(4), 400, {"val/epe": 5.0})  # worse: not kept
    assert (tmp_path / "last").exists()
    assert cm.best_path().endswith("step200")
    # only top-2 retained
    kept = {p.name for p in tmp_path.glob("step*")}
    assert kept == {"step200", "step300"}
    best = cm.load(cm.best_path())
    np.testing.assert_allclose(np.asarray(best["layer"]["weight"])[0, 0], 2.0)


def test_hpc_resume_priority(tmp_path):
    cm = CheckpointManager(str(tmp_path))
    assert cm.resolve_resume_path() is None
    cm.save_step(_params(1), 10)
    assert cm.resolve_resume_path().endswith("last")
    cm.hpc_save(_params(2), 20)
    cm.hpc_save(_params(3), 30)
    assert cm.max_hpc_version() == 2
    assert cm.resolve_resume_path().endswith("hpc_ckpt_2")
    # explicit path wins
    explicit = str(tmp_path / "hpc_ckpt_1")
    assert cm.resolve_resume_path(explicit) == explicit


def test_index_survives_restart(tmp_path):
    cm = CheckpointManager(str(tmp_path), top_k=1)
    cm.save_step(_params(1), 1, {"val/epe": 2.5})
    cm2 = CheckpointManager(str(tmp_path), top_k=1)
    assert cm2.best_path().endswith("step1")
