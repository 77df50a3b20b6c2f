"""GMFlow CNN backbone (instance-norm residual encoder + trident conv).

Parity with /root/reference/ptlflow/models/gmflow/backbone.py:6-153 and
trident_conv.py:10-108.  NHWC.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn


class ResidualBlock(nn.Module):
    def __init__(self, in_planes: int, planes: int, stride: int = 1,
                 dilation: int = 1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, dilation=dilation,
                               padding=dilation, stride=stride, bias=False)
        self.conv2 = nn.Conv2d(planes, planes, 3, dilation=dilation,
                               padding=dilation, bias=False)
        self.norm1 = nn.InstanceNorm2d(planes)
        self.norm2 = nn.InstanceNorm2d(planes)
        if stride == 1 and in_planes == planes:
            self.downsample = None
        else:
            self.norm3 = nn.InstanceNorm2d(planes)
            self.downsample = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride=stride),
                nn.InstanceNorm2d(planes))

    def __call__(self, params, x, **kw):
        y = nn.relu(self.norm1({}, self.conv1(params["conv1"], x)))
        y = nn.relu(self.norm2({}, self.conv2(params["conv2"], y)))
        if self.downsample is not None:
            x = self.downsample(params["downsample"], x)
        return nn.relu(x + y)


class MultiScaleTridentConv(nn.Module):
    """One shared conv weight applied at multiple strides."""

    def __init__(self, in_channels: int, out_channels: int, kernel_size: int,
                 strides: Sequence[int] = (1,), paddings: int = 0,
                 num_branch: int = 1, bias: bool = False):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = (kernel_size, kernel_size)
        self.strides = [(s, s) for s in strides]
        if isinstance(paddings, int):
            paddings = [paddings] * num_branch
        self.paddings = [(p, p) for p in paddings]
        self.num_branch = num_branch
        self.use_bias = bias

    def init(self, key):
        kh, kw = self.kernel_size
        fan_in = self.in_channels * kh * kw
        gain = math.sqrt(2.0)
        bound = math.sqrt(3.0) * gain / math.sqrt(fan_in)
        params = {"weight": jax.random.uniform(
            key, (kh, kw, self.in_channels, self.out_channels),
            minval=-bound, maxval=bound, dtype=jnp.float32)}
        if self.use_bias:
            params["bias"] = jnp.zeros((self.out_channels,), jnp.float32)
        return params

    def _torch_leaves(self):
        leaves = {"weight": lambda w: np.transpose(w, (2, 3, 1, 0))}
        if self.use_bias:
            leaves["bias"] = lambda b: b
        return leaves

    def __call__(self, params, inputs, **kw):
        w = params["weight"]
        outs = []
        for x, stride, (ph, pw) in zip(inputs, self.strides, self.paddings):
            y = jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), window_strides=stride,
                padding=((ph, ph), (pw, pw)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if self.use_bias:
                y = y + params["bias"].astype(y.dtype)
            outs.append(y)
        return outs


class CNNEncoder(nn.Module):
    def __init__(self, output_dim: int = 128, num_output_scales: int = 1):
        super().__init__()
        self.num_branch = num_output_scales
        feature_dims = [64, 96, 128]
        self.conv1 = nn.Conv2d(3, feature_dims[0], 7, stride=2, padding=3,
                               bias=False)
        self.norm1 = nn.InstanceNorm2d(feature_dims[0])
        in_planes = feature_dims[0]
        self.layer1 = nn.Sequential(
            ResidualBlock(in_planes, feature_dims[0], stride=1),
            ResidualBlock(feature_dims[0], feature_dims[0], stride=1))
        self.layer2 = nn.Sequential(
            ResidualBlock(feature_dims[0], feature_dims[1], stride=2),
            ResidualBlock(feature_dims[1], feature_dims[1], stride=1))
        stride = 2 if num_output_scales == 1 else 1
        self.layer3 = nn.Sequential(
            ResidualBlock(feature_dims[1], feature_dims[2], stride=stride),
            ResidualBlock(feature_dims[2], feature_dims[2], stride=1))
        self.conv2 = nn.Conv2d(feature_dims[2], output_dim, 1, 1, 0)
        if self.num_branch > 1:
            strides = {2: (1, 2), 3: (1, 2, 4), 4: (1, 2, 4, 8)}[self.num_branch]
            self.trident_conv = MultiScaleTridentConv(
                output_dim, output_dim, kernel_size=3, strides=strides,
                paddings=1, num_branch=self.num_branch)

    def __call__(self, params, x, **kw):
        x = nn.relu(self.norm1({}, self.conv1(params["conv1"], x)))
        x = self.layer1(params["layer1"], x)
        x = self.layer2(params["layer2"], x)
        x = self.layer3(params["layer3"], x)
        x = self.conv2(params["conv2"], x)
        if self.num_branch > 1:
            return self.trident_conv(params["trident_conv"],
                                     [x] * self.num_branch)
        return [x]
