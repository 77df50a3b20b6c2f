"""Input padding/scaling to stride multiples, with exact unfill inverses.

Matches the reference InputPadder/InputScaler semantics
(/root/reference/ptlflow/utils/external/raft.py:43-86 and
/root/reference/ptlflow/utils/utils.py:34-213): two-side or bottom-right
padding to the next stride multiple, replicate/constant modes, and
interpolation-based scaling with flow-magnitude rescale on unfill.

These classes carry only static Python ints, so they are jit-safe: a model
compiled for one input shape bakes the pad amounts into the graph.
Tensors are NHWC here ( ..., H, W, C ).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

from .grid_sample import interpolate


class InputPadder:
    """Pads NHWC images so H, W are divisible by ``stride``."""

    def __init__(self, dims: Sequence[int], stride: Optional[int] = 8,
                 size: Optional[Tuple[int, int]] = None,
                 two_side_pad: bool = True, pad_mode: str = "replicate",
                 pad_value: float = 0.0):
        # dims: shape tuple of an NHWC (or ...HWC) tensor
        ht, wd = int(dims[-3]), int(dims[-2])
        self.ht, self.wd = ht, wd
        self.pad_mode = pad_mode
        self.pad_value = pad_value
        if size is None:
            pad_ht = (((ht // stride) + 1) * stride - ht) % stride
            pad_wd = (((wd // stride) + 1) * stride - wd) % stride
        else:
            pad_ht = size[0] - ht
            pad_wd = size[1] - wd
        if two_side_pad:
            self._pad = (pad_wd // 2, pad_wd - pad_wd // 2,
                         pad_ht // 2, pad_ht - pad_ht // 2)
        else:
            self._pad = (pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht)

    def fill(self, x: jnp.ndarray) -> jnp.ndarray:
        l, r, t, b = self._pad
        pad_width = [(0, 0)] * (x.ndim - 3) + [(t, b), (l, r), (0, 0)]
        if self.pad_mode == "replicate":
            return jnp.pad(x, pad_width, mode="edge")
        elif self.pad_mode == "reflect":
            return jnp.pad(x, pad_width, mode="reflect")
        return jnp.pad(x, pad_width, mode="constant",
                       constant_values=self.pad_value)

    pad = fill

    def unfill(self, x: jnp.ndarray) -> jnp.ndarray:
        l, r, t, b = self._pad
        ht, wd = x.shape[-3], x.shape[-2]
        return x[..., t:ht - b, l:wd - r, :]

    unpad = unfill


class InputScaler:
    """Bilinear-scales NHWC input to a target size and back."""

    def __init__(self, orig_shape: Sequence[int], stride: Optional[int] = None,
                 size: Optional[Tuple[int, int]] = None,
                 scale_factor: Optional[float] = 1.0,
                 interpolation_mode: str = "bilinear",
                 interpolation_align_corners: bool = False):
        self.orig_height, self.orig_width = int(orig_shape[-3]), int(orig_shape[-2])
        if stride is not None:
            assert size is None
            self.tgt_height = int(math.ceil(self.orig_height / stride)) * stride
            self.tgt_width = int(math.ceil(self.orig_width / stride)) * stride
        elif size is not None:
            self.tgt_height, self.tgt_width = size
        else:
            self.tgt_height = int(self.orig_height * scale_factor)
            self.tgt_width = int(self.orig_width * scale_factor)
        self.mode = interpolation_mode
        self.align_corners = interpolation_align_corners

    def fill(self, x: jnp.ndarray, is_flow: bool = False) -> jnp.ndarray:
        return self._scale(x, (self.tgt_height, self.tgt_width), is_flow)

    def unfill(self, x: jnp.ndarray, is_flow: bool = False) -> jnp.ndarray:
        return self._scale(x, (self.orig_height, self.orig_width), is_flow)

    def _scale(self, x: jnp.ndarray, size: Tuple[int, int],
               is_flow: bool) -> jnp.ndarray:
        shape = x.shape
        x4 = x.reshape((-1,) + shape[-3:])
        in_h, in_w = shape[-3], shape[-2]
        y = interpolate(x4, size, mode=self.mode,
                        align_corners=self.align_corners)
        if is_flow:
            sx = size[1] / in_w
            sy = size[0] / in_h
            y = y * jnp.asarray([sx, sy], dtype=y.dtype)
        return y.reshape(shape[:-3] + y.shape[-3:])
