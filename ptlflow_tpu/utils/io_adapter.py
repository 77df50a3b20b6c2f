"""IOAdapter: numpy images -> model input dict, and inverse scaling.

Mirrors /root/reference/ptlflow/utils/io_adapter.py:29-205: stacks HWC
uint8/float images into the (B, N, 3, H, W) [0, 1] contract, optionally
rescales with InputScaler (target_size or scale_factor), and ``unscale``
restores predictions to the original resolution.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple, Union

import numpy as np

import jax.numpy as jnp

from ..ops.resize import InputScaler


class IOAdapter:
    def __init__(self, model=None, input_size: Optional[Tuple[int, int]] = None,
                 target_size: Optional[Tuple[int, int]] = None,
                 target_scale_factor: Optional[float] = None,
                 interpolation_mode: str = "bilinear",
                 interpolation_align_corners: bool = True,
                 output_stride: Optional[int] = None):
        self.output_stride = (output_stride if output_stride is not None
                              else getattr(model, "output_stride", 1))
        self.target_size = target_size
        self.target_scale_factor = target_scale_factor
        self.interpolation_mode = interpolation_mode
        self.interpolation_align_corners = interpolation_align_corners
        self.scaler: Optional[InputScaler] = None

    def prepare_inputs(self, images: Union[np.ndarray, Sequence[np.ndarray]],
                       flows: Optional[np.ndarray] = None,
                       inputs: Optional[Dict[str, Any]] = None,
                       image_only: bool = False, **kwargs) -> Dict[str, Any]:
        """images: HWC (or list of HWC / NHWC / BNHWC) uint8 or float."""
        if inputs is None:
            inputs = {}
        arr = np.stack([np.asarray(im) for im in images]) \
            if isinstance(images, (list, tuple)) else np.asarray(images)
        if arr.ndim == 3:
            arr = arr[None]
        if arr.ndim == 4:
            arr = arr[None]  # (B, N, H, W, C)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        arr = arr.astype(np.float32)
        arr = np.transpose(arr, (0, 1, 4, 2, 3))  # (B, N, 3, H, W)
        inputs["images"] = jnp.asarray(arr)

        if flows is not None and not image_only:
            f = np.asarray(flows, np.float32)
            while f.ndim < 5:
                f = f[None]
            inputs["flows"] = jnp.asarray(np.transpose(f, (0, 1, 4, 2, 3))
                                          if f.shape[-1] == 2 else f)
        for k, v in kwargs.items():
            if v is not None:
                inputs[k] = jnp.asarray(v)

        if self.target_size is not None or self.target_scale_factor not in (None, 1.0):
            # scale on NHWC layout
            x = jnp.moveaxis(inputs["images"], 2, -1)
            self.scaler = InputScaler(
                x.shape, size=self.target_size,
                scale_factor=self.target_scale_factor,
                interpolation_mode=self.interpolation_mode,
                interpolation_align_corners=self.interpolation_align_corners)
            x = self.scaler.fill(x)
            inputs["images"] = jnp.moveaxis(x, -1, 2)
        return inputs

    def unscale(self, outputs: Dict[str, Any],
                image_only: bool = False) -> Dict[str, Any]:
        """Rescale flow predictions back to original size."""
        if self.scaler is None:
            return outputs
        out = {}
        for k, v in outputs.items():
            if hasattr(v, "ndim") and v.ndim >= 4:
                x = jnp.moveaxis(v, -3, -1)
                x = self.scaler.unfill(x, is_flow="flow" in k)
                out[k] = jnp.moveaxis(x, -1, -3)
            else:
                out[k] = v
        return out
