"""Small public utilities mirroring the reference's ``ptlflow/utils/utils.py``
odds and ends (release_gpu:309, tensor_dict_to_numpy:331,
forward_interpolate_batch:454) and ``ptlflow/__init__.py:39``
(download_scripts)."""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np


def release_device(tensors_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Move array values to host numpy, freeing their device (HBM) buffers;
    non-array entries are kept intact.  TPU analog of the reference
    ``release_gpu`` (utils.py:309-327)."""
    for k, v in tensors_dict.items():
        if hasattr(v, "__array__") and not isinstance(v, np.ndarray):
            arr = np.asarray(v)
            if hasattr(v, "delete"):
                try:
                    v.delete()
                except Exception:
                    pass
            tensors_dict[k] = arr
    return tensors_dict


release_gpu = release_device  # reference-compatible name


def tensor_dict_to_numpy(tensor_dict: Dict[str, Any],
                         padder: Optional[Any] = None) -> Dict[str, np.ndarray]:
    """Convert model inputs/outputs to numpy HWC maps (reference
    utils.py:331-393): squeeze leading batch/sequence dims, CHW -> HWC, unpad
    with ``padder`` (an ``ops.resize.InputPadder``) if given, and add a
    ``flows_viz`` color rendering when ``flows`` is present."""
    from .flow_viz import flow_to_rgb

    npy_dict = {}
    for k, v in tensor_dict.items():
        if k == "meta":
            npy_dict[k] = v
            continue
        if not hasattr(v, "__array__"):
            continue
        arr = np.asarray(v).astype(np.float32)
        while arr.ndim > 3:
            arr = arr[0]
        if arr.ndim == 3:
            arr = np.transpose(arr, (1, 2, 0))  # CHW -> HWC
        if padder is not None:
            import jax.numpy as jnp

            arr = np.asarray(padder.unfill(jnp.asarray(arr)))
        npy_dict[k] = arr
        if k == "flows":
            npy_dict["flows_viz"] = flow_to_rgb(arr)
    return npy_dict


def forward_interpolate_batch(prev_flow):
    """Forward-splat a batch of NCHW flows for warm start (reference
    utils.py:454-478).  Device-side (no scipy/host round trip): wraps
    ``ops.warp.forward_interpolate``, which is natively batched on NHWC."""
    import jax.numpy as jnp

    from ..ops.warp import forward_interpolate

    nhwc = jnp.moveaxis(jnp.asarray(prev_flow), -3, -1)
    return jnp.moveaxis(forward_interpolate(nhwc), -1, -3)


def download_scripts(destination_dir: Path = Path("ptlflow_scripts"),
                     github_url: str =
                     "https://raw.githubusercontent.com/hmorimitsu/ptlflow/main/"
                     ) -> None:
    """Download the starter scripts/configs (reference ptlflow/__init__.py:39).

    Kept for API parity; in an air-gapped environment each fetch fails with a
    warning, same as the reference's behavior on missing files.
    """
    import requests

    script_names = ["datasets.yaml", "infer.py", "model_benchmark.py",
                    "test.py", "train.py", "validate.py"]
    destination_dir = Path(destination_dir)
    destination_dir.mkdir(parents=True, exist_ok=True)
    for sname in script_names:
        try:
            data = requests.get(github_url + sname, timeout=30)
        except Exception as e:
            print(f"[download_scripts] {sname}: {e}")
            continue
        if data.status_code == 200:
            (destination_dir / sname).write_bytes(data.content)
        else:
            print(f"[download_scripts] {github_url + sname} not found.")


def config_logging(log_dir: Path = Path("ptlflow_logs")) -> None:
    """File + stream logging into ``ptlflow_logs/log_run.txt`` (reference
    utils.py:247-259)."""
    import logging

    log_dir = Path(log_dir)
    log_dir.mkdir(exist_ok=True)
    logging.basicConfig(
        format="%(asctime)s - %(levelname)s: %(message)s",
        datefmt="%m/%d/%Y %H:%M:%S",
        level=logging.INFO,
        handlers=[logging.FileHandler(log_dir / "log_run.txt"),
                  logging.StreamHandler()],
    )
