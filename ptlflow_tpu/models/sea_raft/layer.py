"""SEA-RAFT building blocks (ResNet FPN basic block, ConvNeXt block).

Parity with /root/reference/ptlflow/models/sea_raft/layer.py:40-150 and
extractor.py:6-116 (attribute names match for checkpoint conversion).
NHWC throughout — the ConvNeXt block's channels-last formulation is the
native layout here (no permutes needed, unlike the torch version).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ... import nn


def conv1x1(in_planes, out_planes, stride=1):
    return nn.Conv2d(in_planes, out_planes, 1, stride=stride, padding=0)


def conv3x3(in_planes, out_planes, stride=1):
    return nn.Conv2d(in_planes, out_planes, 3, stride=stride, padding=1)


@jax.custom_vjp
def grad_clip(x):
    """Identity with backward NaN-zeroing + clamp to [-0.01, 0.01]
    (reference GradClip, layer.py:10-28)."""
    return x


def _grad_clip_fwd(x):
    return x, None


def _grad_clip_bwd(_, g):
    g = jnp.where(jnp.isnan(g), 0.0, g)
    return (jnp.clip(g, -0.01, 0.01),)


grad_clip.defvjp(_grad_clip_fwd, _grad_clip_bwd)


class ConvNextBlock(nn.Module):
    def __init__(self, dim: int, output_dim: int,
                 layer_scale_init_value: float = 1e-6):
        super().__init__()
        self.dim = dim
        self.layer_scale_init_value = layer_scale_init_value
        self.dwconv = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, 4 * output_dim)
        self.pwconv2 = nn.Linear(4 * output_dim, dim)
        self.final = nn.Conv2d(dim, output_dim, 1, padding=0)

    def init(self, key):
        params = super().init(key)
        if self.layer_scale_init_value > 0:
            params["gamma"] = self.layer_scale_init_value * jnp.ones(
                (self.dim,), jnp.float32)
        return params

    def _torch_leaves(self):
        if self.layer_scale_init_value > 0:
            return {"gamma": lambda g: g}
        return {}

    def __call__(self, params, x, **kw):
        inp = x
        x = self.dwconv(params["dwconv"], x)
        x = self.norm(params["norm"], x)
        x = self.pwconv1(params["pwconv1"], x)
        x = nn.gelu(x)
        x = self.pwconv2(params["pwconv2"], x)
        if "gamma" in params:
            x = params["gamma"].astype(x.dtype) * x
        return self.final(params["final"], inp + x)


class BasicBlock(nn.Module):
    def __init__(self, in_planes: int, planes: int, stride: int = 1):
        super().__init__()
        self.conv1 = conv3x3(in_planes, planes, stride)
        self.conv2 = conv3x3(planes, planes)
        self.bn1 = nn.BatchNorm2d(planes)
        self.bn2 = nn.BatchNorm2d(planes)
        if stride == 1 and in_planes == planes:
            self.downsample = None
        else:
            # the reference registers bn3 AND reuses the same instance inside
            # the downsample Sequential (layer.py:139-142), so the params
            # exist once but the state_dict lists them under both names
            self.bn3 = nn.BatchNorm2d(planes)
            self.downsample = nn.Sequential(
                conv1x1(in_planes, planes, stride=stride))

    def from_torch(self, flat, strict=True, _path=""):
        flat = {k: v for k, v in flat.items()
                if not k.startswith("downsample.1.")}
        return super().from_torch(flat, strict=strict, _path=_path)

    def __call__(self, params, x, **kw):
        y = nn.relu(self.bn1(params["bn1"],
                             self.conv1(params["conv1"], x), **kw))
        y = nn.relu(self.bn2(params["bn2"],
                             self.conv2(params["conv2"], y), **kw))
        if self.downsample is not None:
            x = self.downsample(params["downsample"], x, **kw)
            x = self.bn3(params["bn3"], x, **kw)
        return nn.relu(x + y)


class ResNetFPN(nn.Module):
    """ResNet18/34-style encoder, output at 1/8 resolution."""

    def __init__(self, block_dims: Sequence[int], initial_dim: int,
                 pretrain: str = "resnet18", input_dim: int = 3,
                 output_dim: int = 256):
        super().__init__()
        block_dims = list(block_dims)
        self.conv1 = nn.Conv2d(input_dim, initial_dim, 7, stride=2, padding=3)
        self.bn1 = nn.BatchNorm2d(initial_dim)
        n_block = {"resnet18": [2, 2, 2], "resnet34": [3, 4, 6]}[pretrain]
        in_planes = initial_dim
        layers = []
        for li, (dim, num) in enumerate(zip(block_dims, n_block)):
            stride = 1 if li == 0 else 2
            blocks = [BasicBlock(in_planes, dim, stride=stride)]
            for _ in range(num - 1):
                blocks.append(BasicBlock(dim, dim, stride=1))
            layers.append(nn.Sequential(*blocks))
            in_planes = dim
        self.layer1, self.layer2, self.layer3 = layers
        self.final_conv = conv1x1(block_dims[2], output_dim)

    def __call__(self, params, x, **kw):
        x = nn.relu(self.bn1(params["bn1"],
                             self.conv1(params["conv1"], x), **kw))
        x = self.layer1(params["layer1"], x, **kw)
        x = self.layer2(params["layer2"], x, **kw)
        x = self.layer3(params["layer3"], x, **kw)
        return self.final_conv(params["final_conv"], x)
