"""Checkpoint loading: PyTorch zoo conversion + native orbax save/load.

Replaces the reference's ``load_checkpoint``/``restore_model``
(/root/reference/ptlflow/__init__.py:201-285): a local path or a named
pretrained checkpoint (model's ``pretrained_checkpoints`` dict) is resolved,
downloaded through the torch-hub cache when it is a URL, and the torch
``state_dict`` is converted into the model's param pytree via the generic
tree-walk in ``Module.from_torch`` (conv OIHW->HWIO etc. are per-layer rules,
see ptlflow_tpu/nn/layers.py).

Native checkpoints are orbax (standard JAX ecosystem format).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np

# Checkpoint keys that belong to the Lightning harness, not the network.
_IGNORED_PREFIXES = ("loss_fn.", "train_metrics.", "val_metrics.",
                     "test_metrics.")


def load_torch_state_dict(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """Load a torch/lightning .ckpt/.pth file -> (flat numpy state_dict,
    hyper_parameters)."""
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        state = ckpt["state_dict"]
        hparams = ckpt.get("hyper_parameters", {})
    else:
        state = ckpt
        hparams = {}
    flat = {}
    for k, v in state.items():
        if any(k.startswith(p) for p in _IGNORED_PREFIXES):
            continue
        flat[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return flat, hparams


def resolve_checkpoint_path(model, ckpt_path: Optional[str]) -> Optional[str]:
    """Resolve a local path or a named pretrained checkpoint to a file path.

    Named checkpoints are downloaded into the torch-hub cache directory
    (matching the reference's storage location so existing caches are reused,
    ptlflow/__init__.py:243-250).
    """
    if ckpt_path is None:
        return None
    if Path(ckpt_path).exists():
        return ckpt_path
    names = getattr(model, "pretrained_checkpoints", {}) or {}
    if ckpt_path in names:
        url = names[ckpt_path]
        import re

        import torch.hub

        hub_dir = Path(torch.hub.get_dir()) / "checkpoints"
        fname = url.split("/")[-1]
        local = hub_dir / fname
        if local.exists():
            return str(local)
        hub_dir.mkdir(parents=True, exist_ok=True)
        # zoo filenames embed a sha256 prefix (raft-things-802bbcfd.ckpt);
        # torch.hub verifies the download against it, as the reference's
        # load_state_dict_from_url does (ptlflow/__init__.py:243-250)
        m = re.search(r"-([a-f0-9]{8,})\.\w+$", fname)
        torch.hub.download_url_to_file(
            url, str(local), hash_prefix=m.group(1) if m else None,
            progress=False)
        return str(local)
    raise ValueError(
        f"ckpt_path '{ckpt_path}' is neither an existing file nor one of the "
        f"named pretrained checkpoints {sorted(names)}")


def restore_model(model, ckpt_path: Optional[str] = None, strict: bool = True):
    """Load weights into ``model.params``.  Accepts torch .ckpt/.pth files,
    named pretrained checkpoints, or orbax checkpoint directories."""
    path = resolve_checkpoint_path(model, ckpt_path)
    if path is None:
        if model.params is None:
            model.init_params()
        return model
    if Path(path).is_dir():  # orbax
        model.params = load_orbax(path)
        return model
    flat, hparams = load_torch_state_dict(path)
    model.params = model.from_torch(flat, strict=strict)
    # hyperparameters some models need at inference (FlowFormer++/MemFlow)
    if hparams:
        if hparams.get("train_size") is not None:
            model.train_size = tuple(hparams["train_size"])
        if hparams.get("train_avg_length") is not None:
            model.train_avg_length = hparams["train_avg_length"]
        if hparams.get("extra_params") is not None:
            model.extra_params = dict(hparams["extra_params"])
    return model


# ---------------------------------------------------------------- orbax I/O

def save_orbax(path: str, params: Dict[str, Any]) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), params, force=True)


def load_orbax(path: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))
