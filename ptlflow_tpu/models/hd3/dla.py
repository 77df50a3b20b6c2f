"""DLA-34 encoder with iterative deep aggregation upsampling (HD3's
feature pyramid).

Behavioral parity with /root/reference/ptlflow/models/hd3/dla.py:14-372
(BasicBlock / Root / Tree / DLA-34) and dla_up.py:29-151 (IDAUp with
bilinear-initialized grouped deconvs, DLAUp, DLAUpEncoder).  NHWC.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ... import nn
from ...nn import Module


class DLABasicBlock(Module):
    """dla.py:14-54 — residual applied from outside (Tree passes it)."""

    def __init__(self, inplanes, planes, stride=1, dilation=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride=stride,
                               padding=dilation, dilation=dilation,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=dilation,
                               dilation=dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)

    def __call__(self, params, x, residual=None, **kw):
        if residual is None:
            residual = x
        out = nn.relu(self.bn1(params["bn1"],
                               self.conv1(params["conv1"], x), **kw))
        out = self.bn2(params["bn2"], self.conv2(params["conv2"], out),
                       **kw)
        return nn.relu(out + residual)


class Root(Module):
    """dla.py:151-174."""

    def __init__(self, in_channels, out_channels, kernel_size, residual):
        super().__init__()
        self.conv = nn.Conv2d(in_channels, out_channels, 1, bias=False,
                              padding=(kernel_size - 1) // 2)
        self.bn = nn.BatchNorm2d(out_channels)
        self.residual = residual

    def __call__(self, params, *x, **kw):
        children = x
        out = self.conv(params["conv"], jnp.concatenate(x, axis=-1))
        out = self.bn(params["bn"], out, **kw)
        if self.residual:
            out = out + children[0]
        return nn.relu(out)


class Tree(Module):
    """dla.py:177-251 — hierarchical aggregation tree."""

    def __init__(self, levels, block, in_channels, out_channels, stride=1,
                 level_root=False, root_dim=0, root_kernel_size=1,
                 dilation=1, root_residual=False):
        super().__init__()
        if root_dim == 0:
            root_dim = 2 * out_channels
        if level_root:
            root_dim += in_channels
        if levels == 1:
            self.tree1 = block(in_channels, out_channels, stride,
                               dilation=dilation)
            self.tree2 = block(out_channels, out_channels, 1,
                               dilation=dilation)
            self.root = Root(root_dim, out_channels, root_kernel_size,
                             root_residual)
        else:
            self.tree1 = Tree(levels - 1, block, in_channels, out_channels,
                              stride, root_dim=0,
                              root_kernel_size=root_kernel_size,
                              dilation=dilation,
                              root_residual=root_residual)
            self.tree2 = Tree(levels - 1, block, out_channels, out_channels,
                              root_dim=root_dim + out_channels,
                              root_kernel_size=root_kernel_size,
                              dilation=dilation,
                              root_residual=root_residual)
            self.root = None
        self.level_root = level_root
        self.levels = levels
        self.stride = stride
        if in_channels != out_channels:
            self.project = nn.Sequential(
                nn.Conv2d(in_channels, out_channels, 1, bias=False),
                nn.BatchNorm2d(out_channels))
        else:
            self.project = None

    def __call__(self, params, x, residual=None, children=None, **kw):
        children = [] if children is None else children
        if self.stride > 1:
            bottom = nn.max_pool2d(x, self.stride, self.stride)
        else:
            bottom = x
        if self.project is not None:
            residual = self.project(params["project"], bottom, **kw)
        else:
            residual = bottom
        if self.level_root:
            children.append(bottom)
        x1 = self.tree1(params["tree1"], x, residual=residual, **kw)
        if self.levels == 1:
            x2 = self.tree2(params["tree2"], x1, **kw)
            return self.root(params["root"], x2, x1, *children, **kw)
        children.append(x1)
        return self.tree2(params["tree2"], x1, children=children, **kw)


class DLA(Module):
    """dla.py:254-361 (dla34 config)."""

    def __init__(self, levels, channels, block=DLABasicBlock):
        super().__init__()
        self.base_layer = nn.Sequential(
            nn.Conv2d(3, channels[0], 7, padding=3, bias=False),
            nn.BatchNorm2d(channels[0]), nn.relu)
        self.level0 = self._conv_level(channels[0], channels[0], levels[0])
        self.level1 = self._conv_level(channels[0], channels[1], levels[1],
                                       stride=2)
        self.level2 = Tree(levels[2], block, channels[1], channels[2], 2,
                           level_root=False)
        self.level3 = Tree(levels[3], block, channels[2], channels[3], 2,
                           level_root=True)
        self.level4 = Tree(levels[4], block, channels[3], channels[4], 2,
                           level_root=True)
        self.level5 = Tree(levels[5], block, channels[4], channels[5], 2,
                           level_root=True)
        self.level6 = Tree(levels[6], block, channels[5], channels[6], 2,
                           level_root=True)

    @staticmethod
    def _conv_level(inplanes, planes, convs, stride=1):
        mods = []
        for i in range(convs):
            mods += [nn.Conv2d(inplanes, planes, 3,
                               stride=stride if i == 0 else 1, padding=1,
                               bias=False),
                     nn.BatchNorm2d(planes), nn.relu]
            inplanes = planes
        return nn.Sequential(*mods)

    def __call__(self, params, x, **kw):
        y = []
        x = self.base_layer(params["base_layer"], x, **kw)
        for i in range(7):
            name = f"level{i}"
            x = getattr(self, name)(params[name], x, **kw)
            y.append(x)
        return y


def dla34(planes):
    assert len(planes) == 7
    return DLA([1, 1, 1, 2, 2, 1, 1], planes, block=DLABasicBlock)


def _bilinear_up_weight(f, out_dim):
    """dla_up.py:18-26 — grouped deconv init (kept for init parity)."""
    k = 2 * f
    fe = math.ceil(k / 2)
    c = (2 * fe - 1 - fe % 2) / (2.0 * fe)
    w = np.zeros((k, k), np.float32)
    for i in range(k):
        for j in range(k):
            w[i, j] = (1 - abs(i / fe - c)) * (1 - abs(j / fe - c))
    # our grouped ConvTranspose2d weight layout: (kh, kw, O/groups, I)
    return jnp.asarray(np.tile(w[:, :, None, None], (1, 1, 1, out_dim)))


class IDAUp(Module):
    """dla_up.py:29-100."""

    def __init__(self, node_kernel, out_dim, channels, up_factors):
        super().__init__()
        self.channels = list(channels)
        self.out_dim = out_dim
        for i, c in enumerate(self.channels):
            if c == out_dim:
                proj = nn.Identity()
            else:
                proj = nn.Sequential(
                    nn.Conv2d(c, out_dim, 1, bias=False),
                    nn.BatchNorm2d(out_dim), nn.relu)
            f = int(up_factors[i])
            if f == 1:
                up = nn.Identity()
            else:
                up = nn.ConvTranspose2d(out_dim, out_dim, f * 2, stride=f,
                                        padding=f // 2, groups=out_dim,
                                        bias=False)
                up._bilinear_f = f
            setattr(self, f"proj_{i}", proj)
            setattr(self, f"up_{i}", up)
        for i in range(1, len(self.channels)):
            node = nn.Sequential(
                nn.Conv2d(out_dim * 2, out_dim, node_kernel,
                          padding=node_kernel // 2, bias=False),
                nn.BatchNorm2d(out_dim), nn.relu)
            setattr(self, f"node_{i}", node)

    def init(self, key):
        p = super().init(key)
        for i in range(len(self.channels)):
            up = getattr(self, f"up_{i}")
            if hasattr(up, "_bilinear_f"):
                p[f"up_{i}"]["weight"] = _bilinear_up_weight(
                    up._bilinear_f, self.out_dim)
        return p

    def __call__(self, params, layers, **kw):
        layers = list(layers)
        for i in range(len(layers)):
            proj = getattr(self, f"proj_{i}")
            up = getattr(self, f"up_{i}")
            v = proj(params.get(f"proj_{i}", {}), layers[i], **kw)
            layers[i] = up(params.get(f"up_{i}", {}), v)
        x = layers[0]
        y = []
        for i in range(1, len(layers)):
            node = getattr(self, f"node_{i}")
            x = node(params[f"node_{i}"],
                     jnp.concatenate([x, layers[i]], axis=-1), **kw)
            y.append(x)
        return x, y


class DLAUp(Module):
    """dla_up.py:102-126."""

    def __init__(self, channels, scales=(1, 2, 4, 8, 16),
                 in_channels=None):
        super().__init__()
        if in_channels is None:
            in_channels = list(channels)
        channels = list(channels)
        in_channels = list(in_channels)
        scales = np.array(scales, dtype=int)
        self.num = len(channels) - 1
        for i in range(len(channels) - 1):
            j = -i - 2
            setattr(self, f"ida_{i}",
                    IDAUp(3, channels[j], in_channels[j:],
                          scales[j:] // scales[j]))
            scales[j + 1:] = scales[j]
            in_channels[j + 1:] = [channels[j] for _ in channels[j + 1:]]

    def __call__(self, params, layers, **kw):
        layers = list(layers)
        ms_feat = [layers[-1]]
        for i in range(self.num):
            ida = getattr(self, f"ida_{i}")
            x, y = ida(params[f"ida_{i}"], layers[-i - 2:], **kw)
            layers[-i - 1:] = y
            ms_feat.append(x)
        return ms_feat


class DLAEncoder(Module):
    """dla_up.py:129-147 — DLA-34 base + DLAUp; returns fine-to-coarse."""

    def __init__(self, planes):
        super().__init__()
        self.first_level = 1
        self.base = dla34(planes)
        scales = [2 ** i for i in range(len(planes[self.first_level:]))]
        self.dla_up = DLAUp(planes[self.first_level:], scales=scales)

    def __call__(self, params, x, **kw):
        feats = self.base(params["base"], x, **kw)
        y = self.dla_up(params["dla_up"], feats[self.first_level:], **kw)
        return y[::-1]
