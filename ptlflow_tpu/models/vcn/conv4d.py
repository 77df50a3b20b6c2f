"""Separable 4D convolutions over (U, V, H, W) cost volumes for VCN.

Parity with /root/reference/ptlflow/models/vcn/conv4d.py (projfeat4d
:249-279, sepConv4d :281-398, sepConv4dBlock :400-443, butterfly4D
:170-247, all with full=False as VCN configures them).

TPU design: the cost volume is (B, U, V, H, W, C) channels-last.  The
reference's Conv3d tricks — a (k, k, 1) kernel over (u, v, h*w) and a
(1, k, k) kernel over (u*v, h, w) — become plain NHWC 2D convolutions with
the complementary axes folded into the batch dimension, which XLA maps
straight onto the MXU.  Torch Conv3d weights are squeezed to 2D kernels in
the converters.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ... import nn
from ...ops.grid_sample import interpolate


class _BN3d(nn.Module):
    """BatchNorm over the channel axis of a 6-D (B,U,V,H,W,C) volume, with
    torch BatchNorm3d-compatible leaves."""

    def __init__(self, num_features: int):
        super().__init__()
        self.bn = nn.BatchNorm2d(num_features)

    def init(self, key):
        return self.bn.init(key)

    def _torch_leaves(self):
        return self.bn._torch_leaves()

    def __call__(self, params, x, training: bool = False, **kw):
        shape = x.shape
        x4 = x.reshape(shape[0], -1, 1, shape[-1])
        y = self.bn(params, x4, training=training)
        return y.reshape(shape)


class _Conv3dAsConv2d(nn.Module):
    """A torch Conv3d whose kernel is degenerate along one axis, applied as
    a 2D NHWC conv with the complementary volume axes folded into batch.

    mode='uv': torch kernel (k, k, 1) convolving (u, v); stride on (u, v).
    mode='hw': torch kernel (1, k, k) convolving (h, w); stride 1 (VCN uses
    full=False, so the spatial conv is never strided).
    """

    def __init__(self, in_planes: int, out_planes: int, ksize: int,
                 stride: int = 1, bias: bool = True, mode: str = "uv"):
        super().__init__()
        assert mode in ("uv", "hw")
        self.mode = mode
        self.conv = nn.Conv2d(in_planes, out_planes, ksize, stride=stride,
                              padding=ksize // 2, bias=bias)

    def init(self, key):
        return self.conv.init(key)

    def _torch_leaves(self):
        leaves = {}
        if self.mode == "uv":
            # (O, I, k, k, 1) -> HWIO
            leaves["weight"] = lambda w: np.transpose(w[..., 0],
                                                      (2, 3, 1, 0))
        else:
            # (O, I, 1, k, k) -> HWIO
            leaves["weight"] = lambda w: np.transpose(w[:, :, 0],
                                                      (2, 3, 1, 0))
        if self.conv.use_bias:
            leaves["bias"] = lambda b: b
        return leaves

    def __call__(self, params, x, **kw):
        # x: (B, U, V, H, W, C)
        b, u, v, h, w, c = x.shape
        if self.mode == "uv":
            y = x.transpose(0, 3, 4, 1, 2, 5).reshape(b * h * w, u, v, c)
            y = self.conv(params, y)
            _, uo, vo, co = y.shape
            return y.reshape(b, h, w, uo, vo, co).transpose(0, 3, 4, 1, 2, 5)
        y = x.reshape(b * u * v, h, w, c)
        y = self.conv(params, y)
        _, ho, wo, co = y.shape
        return y.reshape(b, u, v, ho, wo, co)


class projfeat4d(nn.Module):
    """1x1 channel projection with (u, v) striding (conv4d.py:249-279)."""

    def __init__(self, in_planes: int, out_planes: int, stride: int,
                 with_bn: bool = True):
        super().__init__()
        self.stride = stride
        self.with_bn = with_bn
        self.conv1 = _Conv3dAsConv2d(in_planes, out_planes, 1,
                                     stride=stride, bias=not with_bn,
                                     mode="uv")
        self.bn = _BN3d(out_planes)

    def __call__(self, params, x, training: bool = False, **kw):
        x = self.conv1(params["conv1"], x)
        if self.with_bn:
            x = self.bn(params["bn"], x, training=training)
        return x


class sepConv4d(nn.Module):
    """(u,v) conv then (h,w) conv, each optionally BN'd
    (conv4d.py:281-398, full=False)."""

    def __init__(self, in_planes: int, out_planes: int, stride=(1, 1, 1),
                 with_bn: bool = True, ksize: int = 3):
        super().__init__()
        bias = not with_bn
        self.with_bn = with_bn
        self.isproj = in_planes != out_planes
        s = stride[0] if isinstance(stride, (tuple, list)) else stride
        if self.isproj:
            if with_bn:
                self.proj = nn.Sequential(
                    nn.Conv2d(in_planes, out_planes, 1, bias=bias,
                              padding=0),
                    nn.BatchNorm2d(out_planes))
            else:
                self.proj = nn.Conv2d(in_planes, out_planes, 1, bias=bias,
                                      padding=0)
        # torch wraps each conv (+BN) in a Sequential when with_bn
        conv1 = _Conv3dAsConv2d(in_planes, in_planes, ksize, stride=1,
                                bias=bias, mode="hw")
        conv2 = _Conv3dAsConv2d(in_planes, in_planes, ksize, stride=s,
                                bias=bias, mode="uv")
        if with_bn:
            self.conv1 = nn.Sequential(conv1, _BN3d(in_planes))
            self.conv2 = nn.Sequential(conv2, _BN3d(in_planes))
        else:
            self.conv1 = conv1
            self.conv2 = conv2

    def __call__(self, params, x, training: bool = False, **kw):
        x = self.conv2(params["conv2"], x, training=training)
        x = nn.relu(x)
        x = self.conv1(params["conv1"], x, training=training)
        if self.isproj:
            # 1x1 2D conv over channels: fold (u, v, h) into batch
            b, u, v, h, w, c = x.shape
            y = x.reshape(b, u * v * h, w, c)
            y = self.proj(params["proj"], y, training=training)
            x = y.reshape(b, u, v, h, w, -1)
        return x


class sepConv4dBlock(nn.Module):
    """Residual pair of sepConv4d (conv4d.py:400-443, full=False)."""

    def __init__(self, in_planes: int, out_planes: int, stride=(1, 1, 1),
                 with_bn: bool = True):
        super().__init__()
        if in_planes == out_planes and tuple(stride) == (1, 1, 1):
            self.downsample = None
        else:
            # full=False uses projfeat4d
            self.downsample = projfeat4d(in_planes, out_planes, stride[0],
                                         with_bn=with_bn)
        self.conv1 = sepConv4d(in_planes, out_planes, stride,
                               with_bn=with_bn)
        self.conv2 = sepConv4d(out_planes, out_planes, (1, 1, 1),
                               with_bn=with_bn)

    def __call__(self, params, x, training: bool = False, **kw):
        out = nn.relu(self.conv1(params["conv1"], x, training=training))
        if self.downsample is not None:
            x = self.downsample(params["downsample"], x, training=training)
        return nn.relu(x + self.conv2(params["conv2"], out,
                                      training=training))


def _resize_uv(x: jnp.ndarray, uo: int, vo: int) -> jnp.ndarray:
    """Bilinear resize over the (U, V) axes of (B, U, V, H, W, C).

    Equals the reference's trilinear interpolation (conv4d.py:213-243)
    because with full=False the (h, w) extent never changes, making the
    third trilinear axis an identity."""
    b, u, v, h, w, c = x.shape
    y = x.transpose(0, 3, 4, 1, 2, 5).reshape(b * h * w, u, v, c)
    y = interpolate(y, (uo, vo), mode="bilinear", align_corners=False)
    return y.reshape(b, h, w, uo, vo, c).transpose(0, 3, 4, 1, 2, 5)


class butterfly4D(nn.Module):
    """U-Net over the (u, v) displacement axes (conv4d.py:170-247)."""

    def __init__(self, fdima: int, fdimb: int, withbn: bool = True):
        super().__init__()
        self.proj = nn.Sequential(
            projfeat4d(fdima, fdimb, 1, with_bn=withbn), nn.relu)
        self.conva1 = sepConv4dBlock(fdimb, fdimb, with_bn=withbn,
                                     stride=(2, 1, 1))
        self.conva2 = sepConv4dBlock(fdimb, fdimb, with_bn=withbn,
                                     stride=(2, 1, 1))
        self.convb3 = sepConv4dBlock(fdimb, fdimb, with_bn=withbn,
                                     stride=(1, 1, 1))
        self.convb2 = sepConv4dBlock(fdimb, fdimb, with_bn=withbn,
                                     stride=(1, 1, 1))
        self.convb1 = sepConv4dBlock(fdimb, fdimb, with_bn=withbn,
                                     stride=(1, 1, 1))

    def __call__(self, params, x, training: bool = False, **kw):
        out = self.proj(params["proj"], x, training=training)
        b, u, v, h, w, c = out.shape
        out1 = self.conva1(params["conva1"], out, training=training)
        u1, v1 = out1.shape[1], out1.shape[2]
        out2 = self.conva2(params["conva2"], out1, training=training)
        out2 = self.convb3(params["convb3"], out2, training=training)
        out1 = _resize_uv(out2, u1, v1) + out1
        out1 = self.convb2(params["convb2"], out1, training=training)
        out = _resize_uv(out1, u, v) + out
        out = self.convb1(params["convb1"], out, training=training)
        return out
