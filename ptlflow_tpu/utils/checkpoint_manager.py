"""Checkpoint lifecycle: last/top-k saving, HPC auto-resume, named resolve.

Replaces the reference's ModelCheckpoint stack (train.py:95-156: last /
train / top-k-train / top-k-val) and the custom checkpoint connector
(/root/reference/ptlflow/utils/lightning/ptlflow_checkpoint_connector.py:37-196):
- ``save_step`` keeps ``last`` plus the top-k checkpoints by a monitored
  metric (lower-is-better by default, like EPE);
- ``hpc_save``/``max_hpc_version`` implement the SLURM-style
  ``hpc_ckpt_N`` auto-resume scan (connector :148-196);
- ``resolve_resume_path`` implements the resume priority: explicit path >
  HPC checkpoint > last (connector :46-52), with named pretrained
  checkpoints resolved through ``ckpt.resolve_checkpoint_path``.
"""

from __future__ import annotations

import json
import re
import shutil
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

from .ckpt import load_orbax, resolve_checkpoint_path, save_orbax


class CheckpointManager:
    def __init__(self, ckpt_dir: str, top_k: int = 1,
                 monitor: str = "val/epe", mode: str = "min"):
        self.dir = Path(ckpt_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.top_k = top_k
        self.monitor = monitor
        self.mode = mode
        self._topk: List[Tuple[float, str]] = []
        self._load_index()

    # ------------------------------------------------------------- indexing
    def _index_path(self) -> Path:
        return self.dir / "index.json"

    def _load_index(self):
        if self._index_path().exists():
            data = json.loads(self._index_path().read_text())
            self._topk = [(float(s), n) for s, n in data.get("topk", [])]

    def _save_index(self):
        self._index_path().write_text(json.dumps({
            "topk": self._topk, "monitor": self.monitor, "mode": self.mode}))

    # --------------------------------------------------------------- saving
    def save_step(self, params: Dict[str, Any], step: int,
                  metrics: Optional[Dict[str, float]] = None):
        save_orbax(str(self.dir / "last"), params)
        (self.dir / "last_step.json").write_text(json.dumps({"step": step}))
        if metrics and self.monitor in metrics:
            score = float(metrics[self.monitor])
            better = (score < max((s for s, _ in self._topk),
                                  default=float("inf"))) \
                if self.mode == "min" else \
                (score > min((s for s, _ in self._topk),
                             default=-float("inf")))
            if len(self._topk) < self.top_k or better:
                name = f"step{step}"
                save_orbax(str(self.dir / name), params)
                self._topk.append((score, name))
                reverse = self.mode == "max"
                self._topk.sort(key=lambda t: t[0], reverse=reverse)
                while len(self._topk) > self.top_k:
                    _, evict = self._topk.pop()
                    shutil.rmtree(self.dir / evict, ignore_errors=True)
                self._save_index()

    def best_path(self) -> Optional[str]:
        if not self._topk:
            return None
        return str(self.dir / self._topk[0][1])

    # ------------------------------------------------------------------ hpc
    def hpc_save(self, params: Dict[str, Any], step: int) -> str:
        version = self.max_hpc_version() + 1
        name = f"hpc_ckpt_{version}"
        save_orbax(str(self.dir / name), params)
        (self.dir / f"{name}_step.json").write_text(
            json.dumps({"step": step}))
        return str(self.dir / name)

    def max_hpc_version(self) -> int:
        best = 0
        for p in self.dir.glob("hpc_ckpt_*"):
            m = re.match(r"hpc_ckpt_(\d+)$", p.name)
            if m:
                best = max(best, int(m.group(1)))
        return best

    # --------------------------------------------------------------- resume
    def resolve_resume_path(self, explicit: Optional[str] = None,
                            model=None) -> Optional[str]:
        """Resume priority: explicit path/name > hpc ckpt > last."""
        if explicit is not None:
            if Path(explicit).exists():
                return explicit
            if model is not None:
                return resolve_checkpoint_path(model, explicit)
            raise FileNotFoundError(explicit)
        v = self.max_hpc_version()
        if v > 0:
            return str(self.dir / f"hpc_ckpt_{v}")
        if (self.dir / "last").exists():
            return str(self.dir / "last")
        return None

    def load(self, path: str) -> Dict[str, Any]:
        return load_orbax(path)
