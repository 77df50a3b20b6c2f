"""Deformable convolution (torchvision ``ops.DeformConv2d`` semantics).

Used by MaskFlowNet (maskflownet.py:72-77, offsets are the flow repeated per
tap) and other zoo models.  TPU formulation: one bilinear gather per kernel
tap (K^2 gathers, zero OOB like grid_sample) followed by per-tap 1x1
matmuls — all MXU/VPU friendly, no scatter.

Offsets follow torchvision's layout: (B, 2*K*K, H, W) channel-major over
taps with (dy, dx) pairs; here NHWC: (B, H, W, 2*K*K).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn
from .correlation import coords_grid
from .grid_sample import bilinear_sampler


def deform_conv2d(x: jnp.ndarray, offset: jnp.ndarray, weight: jnp.ndarray,
                  bias: Optional[jnp.ndarray] = None,
                  padding: int = 1) -> jnp.ndarray:
    """x: (B, H, W, C); offset: (B, H, W, 2*K*K) (dy, dx per tap);
    weight: (kh, kw, C, O).  Stride 1, dilation 1."""
    b, h, w, c = x.shape
    kh, kw = weight.shape[0], weight.shape[1]
    base = coords_grid(b, h, w, dtype=offset.dtype)
    out = None
    tap = 0
    for dy in range(kh):
        for dx in range(kw):
            off = offset[..., 2 * tap:2 * tap + 2]  # (dy, dx)
            coords = jnp.stack([
                base[..., 0] + (dx - padding) + off[..., 1],
                base[..., 1] + (dy - padding) + off[..., 0],
            ], axis=-1)
            sampled = bilinear_sampler(x, coords)  # (B, H, W, C)
            contrib = jnp.einsum(
                "bhwc,co->bhwo", sampled, weight[dy, dx],
                preferred_element_type=jnp.float32).astype(x.dtype)
            out = contrib if out is None else out + contrib
            tap += 1
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


class DeformConv2d(nn.Module):
    """Module with torchvision-compatible parameter layout."""

    def __init__(self, in_channels: int, out_channels: int,
                 kernel_size: int = 3, stride: int = 1, padding: int = 1,
                 bias: bool = True):
        super().__init__()
        assert stride == 1, "stride-1 deform conv is what the zoo uses"
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.padding = padding
        self.use_bias = bias

    def init(self, key):
        import math

        k = self.kernel_size
        fan_in = self.in_channels * k * k
        bound = 1.0 / math.sqrt(fan_in)
        wkey, bkey = jax.random.split(key)
        params = {"weight": jax.random.uniform(
            wkey, (k, k, self.in_channels, self.out_channels),
            minval=-bound, maxval=bound, dtype=jnp.float32)}
        if self.use_bias:
            params["bias"] = jax.random.uniform(
                bkey, (self.out_channels,), minval=-bound, maxval=bound,
                dtype=jnp.float32)
        return params

    def _torch_leaves(self):
        leaves = {"weight": lambda w: np.transpose(w, (2, 3, 1, 0))}
        if self.use_bias:
            leaves["bias"] = lambda b: b
        return leaves

    def __call__(self, params, x, offset, **kw):
        return deform_conv2d(x, offset, params["weight"],
                             params.get("bias"), padding=self.padding)
