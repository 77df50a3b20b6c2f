"""VCN encoder submodules: conv-BN blocks, residual block, pyramid pooling,
and the PSPNet feature pyramids.

Parity with /root/reference/ptlflow/models/vcn/submodule.py (residualBlock
:12-59, conv :62-76, conv2DBatchNorm(Relu) :78-165, pyramidPooling :167-201,
pspnet :203-375, pspnet_s :375-535).  Attribute names match the torch
modules (cbr_unit/cb_unit Sequential indices included) so checkpoint
conversion is the generic tree walk.  NHWC on device.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ... import nn
from ...ops.grid_sample import interpolate


def _lrelu(x):
    return nn.leaky_relu(x, 0.1)


def conv(in_planes, out_planes, kernel_size=3, stride=1, padding=1,
         dilation=1):
    """Conv + BN + LeakyReLU(0.1) (submodule.py:62-76)."""
    return nn.Sequential(
        nn.Conv2d(in_planes, out_planes, kernel_size, stride=stride,
                  padding=padding, dilation=dilation, bias=True),
        nn.BatchNorm2d(out_planes), _lrelu)


class conv2DBatchNorm(nn.Module):
    def __init__(self, in_channels, n_filters, k_size, stride, padding,
                 dilation=1, with_bn=True):
        super().__init__()
        mods = [nn.Conv2d(in_channels, n_filters, k_size, stride=stride,
                          padding=padding, dilation=dilation,
                          bias=not with_bn)]
        if with_bn:
            mods.append(nn.BatchNorm2d(n_filters))
        self.cb_unit = nn.Sequential(*mods)

    def __call__(self, params, x, **kw):
        return self.cb_unit(params["cb_unit"], x, **kw)


class conv2DBatchNormRelu(nn.Module):
    def __init__(self, in_channels, n_filters, k_size, stride, padding,
                 dilation=1, with_bn=True):
        super().__init__()
        mods = [nn.Conv2d(in_channels, n_filters, k_size, stride=stride,
                          padding=padding, dilation=dilation,
                          bias=not with_bn)]
        if with_bn:
            mods.append(nn.BatchNorm2d(n_filters))
        mods.append(_lrelu)
        self.cbr_unit = nn.Sequential(*mods)

    def __call__(self, params, x, **kw):
        return self.cbr_unit(params["cbr_unit"], x, **kw)


class residualBlock(nn.Module):
    def __init__(self, in_channels, n_filters, stride=1, downsample=None,
                 dilation=1, with_bn=True):
        super().__init__()
        padding = dilation if dilation > 1 else 1
        self.convbnrelu1 = conv2DBatchNormRelu(
            in_channels, n_filters, 3, stride, padding, dilation=dilation,
            with_bn=with_bn)
        self.convbn2 = conv2DBatchNorm(n_filters, n_filters, 3, 1, 1,
                                       with_bn=with_bn)
        self.downsample = downsample

    def __call__(self, params, x, **kw):
        residual = x
        out = self.convbnrelu1(params["convbnrelu1"], x, **kw)
        out = self.convbn2(params["convbn2"], out, **kw)
        if self.downsample is not None:
            residual = self.downsample(params["downsample"], x, **kw)
        return _lrelu(out + residual)


class pyramidPooling(nn.Module):
    def __init__(self, in_channels, with_bn=True, levels=4):
        super().__init__()
        self.levels = levels
        self.path_module_list = nn.ModuleList([
            conv2DBatchNormRelu(in_channels, in_channels, 1, 1, 0,
                                with_bn=with_bn) for _ in range(levels)])

    def __call__(self, params, x, **kw):
        h, w = x.shape[1], x.shape[2]
        k_sizes = []
        for pool_size in np.linspace(1, min(h, w) // 2, self.levels,
                                     dtype=int):
            k_sizes.append((int(h / pool_size), int(w / pool_size)))
        k_sizes = k_sizes[::-1]
        pp_sum = x
        for i, mod in enumerate(self.path_module_list):
            out = nn.avg_pool2d(x, k_sizes[i], k_sizes[i])
            out = mod(params["path_module_list"][str(i)], out, **kw)
            out = interpolate(out, (h, w), mode="bilinear",
                              align_corners=False)
            pp_sum = pp_sum + 1.0 / self.levels * out
        return _lrelu(pp_sum / 2.0)


class _PSPBase(nn.Module):
    """Shared pspnet/pspnet_s structure (submodule.py:203-535)."""

    def __init__(self, is_proj=True, small=False):
        super().__init__()
        self.is_proj = is_proj
        self.small = small
        self.inplanes = 32

        self.convbnrelu1_1 = conv2DBatchNormRelu(3, 16, 3, 2, 1)
        self.convbnrelu1_2 = conv2DBatchNormRelu(16, 16, 3, 1, 1)
        self.convbnrelu1_3 = conv2DBatchNormRelu(16, 32, 3, 1, 1)
        self.res_block3 = self._make_layer(64, stride=2)
        self.res_block5 = self._make_layer(128, stride=2)
        self.res_block6 = self._make_layer(128, stride=2)
        self.res_block7 = self._make_layer(128, stride=2)
        self.pyramid_pooling = pyramidPooling(128, levels=3)

        self.upconv6 = nn.Sequential(
            nn.Identity(),
            conv2DBatchNormRelu(128, 64, 3, 1, 1))
        self.iconv5 = conv2DBatchNormRelu(192, 128, 3, 1, 1)
        self.upconv5 = nn.Sequential(
            nn.Identity(),
            conv2DBatchNormRelu(128, 64, 3, 1, 1))
        self.iconv4 = conv2DBatchNormRelu(192, 128, 3, 1, 1)
        self.upconv4 = nn.Sequential(
            nn.Identity(),
            conv2DBatchNormRelu(128, 64, 3, 1, 1))
        self.iconv3 = conv2DBatchNormRelu(128, 64, 3, 1, 1)
        if not small:
            self.upconv3 = nn.Sequential(
                nn.Identity(),
                conv2DBatchNormRelu(64, 32, 3, 1, 1))
            self.iconv2 = conv2DBatchNormRelu(64, 64, 3, 1, 1)

        if is_proj:
            self.proj6 = conv2DBatchNormRelu(128, 128, 1, 1, 0)
            self.proj5 = conv2DBatchNormRelu(128, 128, 1, 1, 0)
            self.proj4 = conv2DBatchNormRelu(128, 128, 1, 1, 0)
            self.proj3 = conv2DBatchNormRelu(64, 64, 1, 1, 0)
            if not small:
                self.proj2 = conv2DBatchNormRelu(64, 64, 1, 1, 0)

    def _make_layer(self, planes, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes))
        layer = nn.Sequential(
            residualBlock(self.inplanes, planes, stride, downsample))
        self.inplanes = planes
        return layer

    def __call__(self, params, x, training: bool = False, **kw):
        kw = dict(kw, training=training)
        conv1 = self.convbnrelu1_1(params["convbnrelu1_1"], x, **kw)
        conv1 = self.convbnrelu1_2(params["convbnrelu1_2"], conv1, **kw)
        conv1 = self.convbnrelu1_3(params["convbnrelu1_3"], conv1, **kw)
        pool1 = nn.max_pool2d(conv1, 3, 2, 1)

        rconv3 = self.res_block3(params["res_block3"], pool1, **kw)
        conv4 = self.res_block5(params["res_block5"], rconv3, **kw)
        conv5 = self.res_block6(params["res_block6"], conv4, **kw)
        conv6 = self.res_block7(params["res_block7"], conv5, **kw)
        conv6 = self.pyramid_pooling(params["pyramid_pooling"], conv6, **kw)

        def up(seq, seq_params, src, like):
            src = interpolate(src, (like.shape[1], like.shape[2]),
                              mode="bilinear", align_corners=False)
            return seq.mods[1](seq_params["1"], src, **kw)

        conv5 = self.iconv5(params["iconv5"], jnp.concatenate(
            [conv5, up(self.upconv6, params["upconv6"], conv6, conv5)], -1),
            **kw)
        conv4 = self.iconv4(params["iconv4"], jnp.concatenate(
            [conv4, up(self.upconv5, params["upconv5"], conv5, conv4)], -1),
            **kw)
        conv3 = self.iconv3(params["iconv3"], jnp.concatenate(
            [rconv3, up(self.upconv4, params["upconv4"], conv4, rconv3)],
            -1), **kw)

        outs = [conv6, conv5, conv4, conv3]
        if not self.small:
            conv2 = self.iconv2(params["iconv2"], jnp.concatenate(
                [pool1, up(self.upconv3, params["upconv3"], conv3, pool1)],
                -1), **kw)
            outs.append(conv2)
        if self.is_proj:
            projs = ["proj6", "proj5", "proj4", "proj3"]
            if not self.small:
                projs.append("proj2")
            outs = [getattr(self, p)(params[p], o, **kw)
                    for p, o in zip(projs, outs)]
        return tuple(outs)


class pspnet(_PSPBase):
    def __init__(self, is_proj=True):
        super().__init__(is_proj=is_proj, small=False)


class pspnet_s(_PSPBase):
    def __init__(self, is_proj=True):
        super().__init__(is_proj=is_proj, small=True)
