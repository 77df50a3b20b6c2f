"""BaseModel: the shared model contract.

Mirrors the reference BaseModel's external contract
(/root/reference/ptlflow/models/base_model/base_model.py:62-319):
- input dict with ``images``: (B, N, 3, H, W), BGR in [0, 1];
- output dict with ``flows``: (B, N, 2, H, W) at input scale;
- ``preprocess_images`` (bgr shift/scale, BGR->RGB flip, pad or interpolate
  to a stride multiple, base_model.py:145-247) and
  ``postprocess_predictions`` (base_model.py:249-276).

TPU-native reshaping of that contract:
- Internally everything is NHWC; ``preprocess_images`` converts once at the
  boundary and ``postprocess`` converts back.
- ``forward(params, inputs, training=False)`` is a pure function of the
  param pytree — jit/scan/pjit compose around it.  The instance also carries
  ``self.params`` plus a cached ``jax.jit`` for the convenient stateful call
  ``model(inputs)`` used by infer/validate scripts.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn
from ...ops.resize import InputPadder, InputScaler


def bgr_val_as_array(val, ndim_ref: int, channel_axis: int = -1):
    """Broadcastable array from scalar/triple/tensor BGR values
    (reference bgr_val_as_tensor, utils.py:395-453)."""
    if isinstance(val, (int, float)):
        arr = jnp.full((3,), float(val), jnp.float32)
    else:
        arr = jnp.asarray(val, jnp.float32)
        if arr.ndim > 1:
            # already shaped compatibly with the images (e.g. per-image
            # channel means) — use as-is
            return arr
        assert arr.shape == (3,)
    shape = [1] * ndim_ref
    shape[channel_axis] = 3
    return arr.reshape(shape)


class BaseModel(nn.Module):
    pretrained_checkpoints: Dict[str, str] = {}
    # dotted param-subtree paths excluded from optimization (frozen
    # backbones, i.e. requires_grad=False in the reference)
    frozen_prefixes: Tuple[str, ...] = ()

    def __init__(self, output_stride: int = 1,
                 loss_fn: Optional[Callable] = None, **kwargs):
        super().__init__()
        self.output_stride = output_stride
        self.loss_fn = loss_fn
        self.params: Optional[Dict[str, Any]] = None
        self.train_size = None
        self.train_avg_length = None
        self.extra_params: Optional[Dict[str, Any]] = None
        self._jit_cache: Dict[Any, Callable] = {}

    # ------------------------------------------------------------------ api
    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        self.params = self.init(jax.random.PRNGKey(seed))
        return self.params

    def forward(self, params, inputs: Dict[str, Any], training: bool = False
                ) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    def __call__(self, *args, **kwargs):
        """``model(inputs)`` (stateful, jitted) or ``model(params, inputs)``."""
        if len(args) == 1 and "images" in args[0]:
            return self.infer(args[0], **kwargs)
        params, inputs = args[0], args[1]
        return self.forward(params, inputs, **kwargs)

    def infer(self, inputs: Dict[str, Any], training: bool = False
              ) -> Dict[str, jnp.ndarray]:
        assert self.params is not None, \
            "model has no params; call init_params() or load a checkpoint"
        key = training
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                lambda p, x: self.forward(p, x, training=training))
        inputs = {k: jnp.asarray(v) for k, v in inputs.items()
                  if isinstance(v, (np.ndarray, jnp.ndarray))} | {
            k: v for k, v in inputs.items()
            if not isinstance(v, (np.ndarray, jnp.ndarray))}
        return self._jit_cache[key](self.params, inputs)

    # ------------------------------------------------------------ preprocess
    def preprocess_images(
        self, images: jnp.ndarray,
        stride: Optional[int] = None,
        bgr_add: Union[float, Tuple[float, float, float]] = 0,
        bgr_mult: Union[float, Tuple[float, float, float]] = 1,
        bgr_to_rgb: bool = False,
        image_resizer=None,
        resize_mode: str = "pad",
        target_size: Optional[Tuple[int, int]] = None,
        pad_mode: str = "replicate",
        pad_value: float = 0.0,
        pad_two_side: bool = True,
        interpolation_mode: str = "bilinear",
        interpolation_align_corners: bool = True,
    ):
        """(B, N, 3, H, W) NCHW BGR -> (B, N, H, W, 3) NHWC, shifted/scaled,
        optionally RGB, padded/scaled to a stride multiple."""
        images = jnp.asarray(images)
        images = images + bgr_val_as_array(bgr_add, images.ndim, -3)
        images = images * bgr_val_as_array(bgr_mult, images.ndim, -3)
        if bgr_to_rgb:
            images = jnp.flip(images, axis=-3)
        images = jnp.moveaxis(images, -3, -1)  # NHWC

        stride = self.output_stride if stride is None else stride
        if target_size is not None:
            stride = None

        if image_resizer is None:
            if resize_mode == "pad":
                image_resizer = InputPadder(
                    images.shape, stride=stride, size=target_size,
                    pad_mode=pad_mode, two_side_pad=pad_two_side,
                    pad_value=pad_value)
            elif resize_mode == "interpolation":
                image_resizer = InputScaler(
                    images.shape, stride=stride, size=target_size,
                    interpolation_mode=interpolation_mode,
                    interpolation_align_corners=interpolation_align_corners)
            else:
                raise ValueError(
                    f"resize_mode must be one of (pad, interpolation). "
                    f"Found: {resize_mode}.")

        images = image_resizer.fill(images)
        return images, image_resizer

    def postprocess_predictions(self, prediction: jnp.ndarray, image_resizer,
                                is_flow: bool) -> jnp.ndarray:
        """Revert resizing on an NHWC prediction."""
        if image_resizer is None:
            return prediction
        if isinstance(image_resizer, InputScaler):
            return image_resizer.unfill(prediction, is_flow=is_flow)
        return image_resizer.unfill(prediction)

    # --------------------------------------------------------------- helpers
    @staticmethod
    def nhwc_flow_to_output(flow: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 2) -> public contract (B, 1, 2, H, W)."""
        return jnp.moveaxis(flow, -1, -3)[:, None]

    def describe_parameters(self) -> int:
        assert self.params is not None
        return nn.count_parameters(self.params)
