"""ptlflow_tpu: a TPU-native (JAX/XLA/Pallas) optical-flow framework with the
capabilities of PTLFlow (see SURVEY.md).

Public API parity with the reference (/root/reference/ptlflow/__init__.py):
``get_model(name, ckpt_path)``, ``get_model_reference``, ``get_model_names``,
``get_trainable_model_names``, ``restore_model``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

__version__ = "0.1.0"

from . import nn  # noqa: F401
from . import ops  # noqa: F401
from .utils.registry import (_models_dict, _trainable_models,
                             _ptlflow_trained_models)
from .utils.ckpt import restore_model  # noqa: F401
from .utils.misc import download_scripts  # noqa: F401
from . import models as _models  # noqa: F401  (triggers registration)


def load_checkpoint(ckpt_path: str, model_ref) -> Dict[str, Any]:
    """Resolve + load a checkpoint without instantiating the model
    (reference ptlflow/__init__.py:201-251: local path | named pretrained
    entry -> cached download with hash check). Returns the raw state dict
    (torch ``state_dict`` layout for .ckpt files, params pytree for orbax
    directories)."""
    from .utils import ckpt as _ckpt

    path = _ckpt.resolve_checkpoint_path(model_ref, ckpt_path)
    if path is None:
        raise ValueError(f"cannot resolve checkpoint '{ckpt_path}'")
    from pathlib import Path as _Path

    if _Path(path).is_dir():
        return _ckpt.load_orbax(path)
    state, hparams = _ckpt.load_torch_state_dict(path)
    return {"state_dict": state, "hyper_parameters": hparams}


def get_model_reference(model_name: str):
    if model_name not in _models_dict:
        raise ValueError(
            f"unknown model '{model_name}'. Available: {sorted(_models_dict)}")
    return _models_dict[model_name]


def get_model(model_name: str, ckpt_path: Optional[str] = None,
              args: Optional[Dict[str, Any]] = None):
    """Instantiate a registered model and optionally load weights.

    ``args`` is a dict of constructor kwargs (the reference uses a
    jsonargparse Namespace; a plain dict is the idiomatic equivalent here).
    """
    ref = get_model_reference(model_name)
    model = ref(**(args or {}))
    return restore_model(model, ckpt_path)


def get_model_names():
    return sorted(_models_dict.keys())


def get_trainable_model_names():
    return sorted(m for m in _models_dict if m in _trainable_models)


def get_ptlflow_trained_model_names():
    return sorted(m for m in _models_dict if m in _ptlflow_trained_models)
