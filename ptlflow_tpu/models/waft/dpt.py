"""DPT feature-fusion heads used by WAFT's backbones.

Behavioral parity with /root/reference/ptlflow/models/waft/thirdparty/
DepthAnythingV2/depth_anything_v2/{dpt.py,util/blocks.py} (the a1-style
DPTHead with fixed resize layers) and waft/backbone/head.py (the a2-style
DPTHead parameterised by ``lvl``).  All resizes are bilinear
align_corners=True; all NHWC.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from ... import nn
from ...nn import Module
from ...ops.grid_sample import interpolate


class ResidualConvUnit(Module):
    """util/blocks.py:61-125 (no BN variant used throughout WAFT)."""

    def __init__(self, features):
        super().__init__()
        self.conv1 = nn.Conv2d(features, features, 3, padding=1)
        self.conv2 = nn.Conv2d(features, features, 3, padding=1)

    def __call__(self, params, x, **kw):
        out = self.conv1(params["conv1"], nn.relu(x))
        out = self.conv2(params["conv2"], nn.relu(out))
        return out + x


class FeatureFusionBlock(Module):
    """util/blocks.py:128-204."""

    def __init__(self, features):
        super().__init__()
        self.out_conv = nn.Conv2d(features, features, 1)
        self.resConfUnit1 = ResidualConvUnit(features)
        self.resConfUnit2 = ResidualConvUnit(features)

    def __call__(self, params, x, res=None, size=None, **kw):
        if res is not None:
            x = x + self.resConfUnit1(params["resConfUnit1"], res)
        x = self.resConfUnit2(params["resConfUnit2"], x)
        if size is None:
            size = (2 * x.shape[1], 2 * x.shape[2])
        x = interpolate(x, size, align_corners=True)
        return self.out_conv(params["out_conv"], x)


def tokens_to_map(tokens, patch_h, patch_w):
    """(B, N, D) -> (B, patch_h, patch_w, D)."""
    b, n, d = tokens.shape
    return tokens.reshape(b, patch_h, patch_w, d)


class DPTHeadA1(Module):
    """dpt.py:38-170 — the DepthAnythingV2 head (fixed resize layers:
    x4 deconv / x2 deconv / identity / stride-2 conv), run with
    return_intermediate=True by WAFT.  ``output_conv2`` exists in the
    torch state dict but is unused on this path; kept for key parity."""

    def __init__(self, in_channels, features=256,
                 out_channels=(256, 512, 1024, 1024), patch_size=14):
        super().__init__()
        self.patch_size = patch_size
        self.projects = nn.ModuleList(
            [nn.Conv2d(in_channels, oc, 1) for oc in out_channels])
        self.resize_layers = nn.ModuleList([
            nn.ConvTranspose2d(out_channels[0], out_channels[0], 4,
                               stride=4),
            nn.ConvTranspose2d(out_channels[1], out_channels[1], 2,
                               stride=2),
            nn.Identity(),
            nn.Conv2d(out_channels[3], out_channels[3], 3, stride=2,
                      padding=1),
        ])
        scratch = Module()
        scratch.layer1_rn = nn.Conv2d(out_channels[0], features, 3,
                                      padding=1, bias=False)
        scratch.layer2_rn = nn.Conv2d(out_channels[1], features, 3,
                                      padding=1, bias=False)
        scratch.layer3_rn = nn.Conv2d(out_channels[2], features, 3,
                                      padding=1, bias=False)
        scratch.layer4_rn = nn.Conv2d(out_channels[3], features, 3,
                                      padding=1, bias=False)
        scratch.refinenet1 = FeatureFusionBlock(features)
        scratch.refinenet2 = FeatureFusionBlock(features)
        scratch.refinenet3 = FeatureFusionBlock(features)
        scratch.refinenet4 = FeatureFusionBlock(features)
        scratch.output_conv1 = nn.Conv2d(features, features // 2, 3,
                                         padding=1)
        scratch.output_conv2 = nn.Sequential(
            nn.Conv2d(features // 2, 32, 3, padding=1), nn.relu,
            nn.Conv2d(32, 1, 1), nn.relu)
        self.scratch = scratch

    def __call__(self, params, features, patch_h, patch_w, **kw):
        """features: list of 4 (tokens, cls) pairs -> (out, paths 1-4)."""
        sp = params["scratch"]
        maps = []
        for i, (tokens, _cls) in enumerate(features):
            x = tokens_to_map(tokens, patch_h, patch_w)
            x = self.projects[i](params["projects"][str(i)], x)
            x = self.resize_layers[i](
                params["resize_layers"].get(str(i), {}), x)
            maps.append(x)
        l1 = self.scratch.layer1_rn(sp["layer1_rn"], maps[0])
        l2 = self.scratch.layer2_rn(sp["layer2_rn"], maps[1])
        l3 = self.scratch.layer3_rn(sp["layer3_rn"], maps[2])
        l4 = self.scratch.layer4_rn(sp["layer4_rn"], maps[3])
        path4 = self.scratch.refinenet4(sp["refinenet4"], l4,
                                        size=l3.shape[1:3])
        path3 = self.scratch.refinenet3(sp["refinenet3"], path4, l3,
                                        size=l2.shape[1:3])
        path2 = self.scratch.refinenet2(sp["refinenet2"], path3, l2,
                                        size=l1.shape[1:3])
        path1 = self.scratch.refinenet1(sp["refinenet1"], path2, l1)
        out = self.scratch.output_conv1(sp["output_conv1"], path1)
        out = interpolate(
            out, (patch_h * self.patch_size, patch_w * self.patch_size),
            align_corners=True)
        return out, path1, path2, path3, path4


class DPTHeadLvl(Module):
    """waft/backbone/head.py:171-266 — resize layers derived from ``lvl``
    (lvl=-3: deconvs k8/k4/k2 then conv k1), coarse-to-fine fusion that
    keeps each level's size."""

    def __init__(self, in_channels, features=64,
                 out_channels=(48, 96, 192, 384), lvl=-3):
        super().__init__()
        self.projects = nn.ModuleList(
            [nn.Conv2d(in_channels, oc, 1) for oc in out_channels])
        resize = []
        for i in range(len(out_channels)):
            if i + lvl < 0:
                k = 2 ** (-i - lvl)
                resize.append(nn.ConvTranspose2d(out_channels[i],
                                                 out_channels[i], k,
                                                 stride=k))
            else:
                k = 2 ** (i + lvl)
                resize.append(nn.Conv2d(out_channels[i], out_channels[i],
                                        k, stride=k))
        self.resize_layers = nn.ModuleList(resize)
        self.scratch = nn.ModuleList(
            [nn.Conv2d(oc, features, 3, padding=1, bias=False)
             for oc in out_channels])
        self.refine = nn.ModuleList(
            [FeatureFusionBlock(features) for _ in out_channels])

    def __call__(self, params, features, patch_h, patch_w, **kw):
        maps = []
        for i, (tokens, _cls) in enumerate(features):
            x = tokens_to_map(tokens, patch_h, patch_w)
            x = self.projects[i](params["projects"][str(i)], x)
            x = self.resize_layers[i](params["resize_layers"][str(i)], x)
            maps.append(x)
        return fuse_pyramid(self.scratch, params["scratch"], self.refine,
                            params["refine"], maps)


def fuse_pyramid(scratch, scratch_p, refine, refine_p, maps):
    """head.py:252-266 / twins.py:220-233: 3x3 scratch conv per level,
    then coarse-to-fine fusion (up-x2 the refined coarser level, fuse at
    constant size)."""
    n = len(maps)
    out_rn = [scratch[i](scratch_p[str(i)], maps[i]) for i in range(n)]
    for i in range(1, n + 1):
        if i == 1:
            out_rn[-1] = refine[n - 1](refine_p[str(n - 1)], out_rn[-1],
                                       size=out_rn[-1].shape[1:3])
        else:
            up = interpolate(out_rn[-i + 1],
                             (2 * out_rn[-i + 1].shape[1],
                              2 * out_rn[-i + 1].shape[2]),
                             align_corners=True)
            out_rn[-i] = refine[n - i](refine_p[str(n - i)], out_rn[-i],
                                       up, size=out_rn[-i].shape[1:3])
    return out_rn
