"""SeparableFlow cost aggregation (3D U-Nets over separated 1-D volumes).

Parity with /root/reference/ptlflow/models/separableflow/cost_agg.py
(BasicConv :38-81, Conv2x :84-152, SGABlock :155-196, ShiftRegression
:207-230, ShiftEstimate2 :274-311, CostAggregation :313-466, Corr2Cost
:469-523).  Volumes are NDHWC on device; trilinear resizes are separable
1-D linear interpolations (exact).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ... import nn
from .ganet import _l1_normalize, sga


def linear_resize_axis(x: jnp.ndarray, axis: int, out_size: int,
                       align_corners: bool = True) -> jnp.ndarray:
    """1-D linear resize along ``axis`` (align_corners=True)."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if align_corners and out_size > 1:
        pos = jnp.arange(out_size, dtype=jnp.float32) * \
            ((in_size - 1) / (out_size - 1))
    else:
        pos = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * \
            (in_size / out_size) - 0.5
        pos = jnp.clip(pos, 0, in_size - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    frac = (pos - lo).astype(x.dtype)
    xl = jnp.take(x, lo, axis=axis)
    xh = jnp.take(x, hi, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    frac = frac.reshape(shape)
    return xl * (1 - frac) + xh * frac


def trilinear_resize(x: jnp.ndarray, size, align_corners: bool = True):
    """(B, D, H, W, C) -> size (D', H', W'); separable == torch trilinear."""
    d, h, w = size
    x = linear_resize_axis(x, 1, d, align_corners)
    x = linear_resize_axis(x, 2, h, align_corners)
    x = linear_resize_axis(x, 3, w, align_corners)
    return x


class _BN3d(nn.Module):
    """BatchNorm over channels of (B, D, H, W, C), torch BatchNorm3d."""

    def __init__(self, num_features: int):
        super().__init__()
        self.bn = nn.BatchNorm2d(num_features)

    def init(self, key):
        return self.bn.init(key)

    def _torch_leaves(self):
        return self.bn._torch_leaves()

    def __call__(self, params, x, training: bool = False, **kw):
        shape = x.shape
        y = self.bn(params, x.reshape(shape[0], -1, 1, shape[-1]),
                    training=training)
        return y.reshape(shape)


class BasicConv(nn.Module):
    """3D conv (or deconv) + BN3d + optional relu (cost_agg.py:38-81,
    is_3d=True as all CostAggregation uses are)."""

    def __init__(self, in_channels, out_channels, deconv=False, relu=True,
                 bn=True, kernel_size=3, stride=1, padding=1):
        super().__init__()
        self.do_relu = relu
        self.use_bn = bn
        if deconv:
            self.conv = nn.ConvTranspose3d(in_channels, out_channels,
                                           kernel_size, stride=stride,
                                           padding=padding, bias=False)
        else:
            self.conv = nn.Conv3d(in_channels, out_channels, kernel_size,
                                  stride=stride, padding=padding, bias=False)
        self.bn = _BN3d(out_channels)

    def __call__(self, params, x, training: bool = False, **kw):
        x = self.conv(params["conv"], x)
        if self.use_bn:
            x = self.bn(params["bn"], x, training=training)
        if self.do_relu:
            x = nn.relu(x)
        return x


class Conv2x(nn.Module):
    """Deconv upsample + concat + conv (cost_agg.py:84-152)."""

    def __init__(self, in_channels, out_channels, deconv=False, concat=True,
                 kernel=None):
        super().__init__()
        self.concat = concat
        if kernel is None:
            kernel = 4 if deconv else 3
        self.conv1 = BasicConv(in_channels, out_channels, deconv=deconv,
                               relu=True, kernel_size=kernel, stride=2,
                               padding=1)
        in2 = out_channels * 2 if concat else out_channels
        self.conv2 = BasicConv(in2, out_channels, relu=True, kernel_size=3,
                               stride=1, padding=1)

    def __call__(self, params, x, rem, training: bool = False, **kw):
        x = self.conv1(params["conv1"], x, training=training)
        if self.concat:
            x = jnp.concatenate([x, rem], axis=-1)
        else:
            x = x + rem
        return self.conv2(params["conv2"], x, training=training)


class SGABlock(nn.Module):
    """Residual semi-global aggregation (cost_agg.py:155-196)."""

    def __init__(self, channels=32, refine=False):
        super().__init__()
        self.refine = refine
        if refine:
            self.bn_relu = nn.Sequential(_BN3d(channels), nn.relu)
            self.conv_refine = BasicConv(channels, channels, relu=False,
                                         kernel_size=3, padding=1)
        else:
            self.bn = _BN3d(channels)

    def __call__(self, params, x, g, training: bool = False, **kw):
        rem = x
        k1, k2, k3, k4 = jnp.split(g, 4, axis=-1)
        gs = [_l1_normalize(jnp.moveaxis(k, -1, 1), axis=1)
              for k in (k1, k2, k3, k4)]
        # sga expects (B, C, D, H, W)
        xv = x.transpose(0, 4, 1, 2, 3)
        xv = sga(xv, *gs)
        x = xv.transpose(0, 2, 3, 4, 1)
        if self.refine:
            x = self.bn_relu(params["bn_relu"], x, training=training)
            x = self.conv_refine(params["conv_refine"], x,
                                 training=training)
        else:
            x = self.bn(params["bn"], x, training=training)
        return nn.relu(x + rem)


class ShiftRegression(nn.Module):
    """Soft-argmax over the shift axis (cost_agg.py:207-230)."""

    def __call__(self, params, x, max_shift: int, **kw):
        # x: (B, D=2*max_shift+1, H, W) softmaxed
        shift = jnp.arange(-max_shift, max_shift + 1,
                           dtype=x.dtype).reshape(1, -1, 1, 1)
        return jnp.sum(x * shift, axis=1, keepdims=True)


class ShiftEstimate2(nn.Module):
    """Cost volume -> subpixel shift map at 8x resolution
    (cost_agg.py:274-311)."""

    def __init__(self, max_shift=100, in_channel=24):
        super().__init__()
        self.max_shift = int(max_shift // 4)
        self.conv3d_2d = nn.Conv3d(in_channel, 1, 3, stride=1, padding=1,
                                   bias=True)
        self.regression = ShiftRegression()

    def __call__(self, params, x, max_shift: Optional[int] = None, **kw):
        # x: (B, D, H, W, C)
        if max_shift is not None:
            self.max_shift = max_shift // 4
        m = self.max_shift
        x = self.conv3d_2d(params["conv3d_2d"], x)  # (B, D, H, W, 1)
        x = trilinear_resize(x, (m * 2 + 1, x.shape[2] * 2, x.shape[3] * 2))
        x = x[..., 0]  # (B, D', H', W')
        x = nn.softmax(x.astype(jnp.float32), axis=1).astype(x.dtype)
        x = self.regression({}, x, m)  # (B, 1, H', W')
        # NHWC bilinear x4 with align_corners=True
        y = jnp.moveaxis(x, 1, -1)
        from ...ops.grid_sample import interpolate

        y = interpolate(y, (y.shape[1] * 4, y.shape[2] * 4), mode="bilinear",
                        align_corners=True)
        return jnp.moveaxis(y, -1, 1) * 4


class Corr2Cost(nn.Module):
    """Resample an aggregated volume to centered shift bins
    (cost_agg.py:469-523): per pixel, pick the D plane at (coord + dx) for
    dx in [-maxdisp, maxdisp], zero outside.

    coord is the integer pixel index along the shift direction and dx is an
    integer offset, so the reference's bilinear interpolation degenerates to
    integer indexing: ``out[b, j, h, w] = corr[b, base + j - m, h, w]``.
    That is a banded-diagonal extraction over (D, base), done here with the
    pad+reshape skew trick — zero gathers, a few dense copies (the gather
    formulation measured 133 ms on v5e for (1,128,64,128,8); this is ~2 ms).
    """

    def __call__(self, params, corr, maxdisp: int, is_ux: bool, **kw):
        b, d, h, w, c = corr.shape
        m = int(maxdisp)
        if is_ux:
            z = corr.transpose(0, 2, 4, 3, 1)  # (B, H, C, W, D)
            base_len = w
        else:
            z = corr.transpose(0, 3, 4, 2, 1)  # (B, W, C, H, D)
            base_len = h
        dp = base_len + 2 * m + 1
        z = jnp.pad(z, ((0, 0),) * 3 + ((0, 0), (m, max(0, dp - m - d))))
        z = z[..., :dp]
        lead = z.shape[:3]
        flat = z.reshape(lead + (base_len * dp,))
        flat = jnp.pad(flat, ((0, 0),) * 3 + ((0, base_len),))
        skew = flat.reshape(lead + (base_len, dp + 1))[..., :2 * m + 1]
        if is_ux:  # (B, H, C, W, 2m+1) -> (B, 2m+1, H, W, C)
            return skew.transpose(0, 4, 1, 3, 2)
        # (B, W, C, H, 2m+1) -> (B, 2m+1, H, W, C)
        return skew.transpose(0, 4, 3, 1, 2)

    def _gather_impl(self, params, corr, maxdisp: int, is_ux: bool, **kw):
        # corr: (B, D, H, W, C)
        b, d, h, w, c = corr.shape
        if is_ux:
            base = jnp.arange(w, dtype=jnp.float32)[None, None, :]  # x
            base = jnp.broadcast_to(base, (1, h, w))
        else:
            base = jnp.arange(h, dtype=jnp.float32)[None, :, None]  # y
            base = jnp.broadcast_to(base, (1, h, w))
        dx = jnp.arange(-maxdisp, maxdisp + 1, dtype=jnp.float32)
        pos = base[:, None] + dx[None, :, None, None]  # (1, D', H, W)
        lo = jnp.floor(pos)
        frac = (pos - lo).astype(corr.dtype)
        lo_i = lo.astype(jnp.int32)
        hi_i = lo_i + 1
        valid_lo = (lo_i >= 0) & (lo_i < d)
        valid_hi = (hi_i >= 0) & (hi_i < d)
        lo_c = jnp.clip(lo_i, 0, d - 1)
        hi_c = jnp.clip(hi_i, 0, d - 1)

        # gather along D per (H, W): corr (B, D, H, W, C), index (1,D',H,W)
        def gather(idx):
            idxb = jnp.broadcast_to(idx[..., None],
                                    (b,) + idx.shape[1:] + (c,))
            return jnp.take_along_axis(corr, idxb, axis=1)

        vlo = gather(lo_c) * valid_lo[..., None].astype(corr.dtype)
        vhi = gather(hi_c) * valid_hi[..., None].astype(corr.dtype)
        return vlo * (1 - frac[..., None]) + vhi * frac[..., None]


class CostAggregation(nn.Module):
    """Dual 3D U-Net with SGA blocks (cost_agg.py:313-466)."""

    def __init__(self, max_shift=400, in_channel=8):
        super().__init__()
        self.max_shift = max_shift
        ic = 8  # inner_channel
        self.conv0 = BasicConv(in_channel, ic, kernel_size=3, padding=1,
                               relu=True)
        self.conv1a = BasicConv(ic, ic * 2, kernel_size=3, stride=2,
                                padding=1)
        self.conv2a = BasicConv(ic * 2, ic * 4, kernel_size=3, stride=2,
                                padding=1)
        self.conv3a = BasicConv(ic * 4, ic * 6, kernel_size=3, stride=2,
                                padding=1)
        self.deconv1a = Conv2x(ic * 2, ic, deconv=True)
        self.deconv2a = Conv2x(ic * 4, ic * 2, deconv=True)
        self.deconv3a = Conv2x(ic * 6, ic * 4, deconv=True)
        self.conv1b = BasicConv(ic, ic * 2, kernel_size=3, stride=2,
                                padding=1)
        self.conv2b = BasicConv(ic * 2, ic * 4, kernel_size=3, stride=2,
                                padding=1)
        self.conv3b = BasicConv(ic * 4, ic * 6, kernel_size=3, stride=2,
                                padding=1)
        self.deconv1b = Conv2x(ic * 2, ic, deconv=True, kernel=(3, 4, 4))
        self.deconv2b = Conv2x(ic * 4, ic * 2, deconv=True, kernel=(3, 4, 4))
        self.deconv3b = Conv2x(ic * 6, ic * 4, deconv=True, kernel=(3, 4, 4))
        self.shift0 = ShiftEstimate2(max_shift, ic)
        self.shift1 = ShiftEstimate2(max_shift, ic)
        self.shift2 = ShiftEstimate2(max_shift, ic)
        self.sga1 = SGABlock(channels=ic, refine=True)
        self.sga2 = SGABlock(channels=ic, refine=True)
        self.sga3 = SGABlock(channels=ic, refine=True)
        self.sga11 = SGABlock(channels=ic * 2, refine=True)
        self.sga12 = SGABlock(channels=ic * 2, refine=True)
        self.corr_output = BasicConv(ic, 1, kernel_size=3, padding=1,
                                     relu=False)
        self.corr2cost = Corr2Cost()

    def __call__(self, params, x, g, max_shift: int = 400,
                 is_ux: bool = True, training: bool = False, **kw):
        # x: (B, D, H, W, C_in); guidance maps g[...] are NHWC (B, H, W, 20)
        x = self.conv0(params["conv0"], x, training=training)
        x = self.sga1(params["sga1"], x, g["sg1"], training=training)
        rem0 = x

        shift0 = None
        if training:
            cost = self.corr2cost({}, x, max_shift // 8, is_ux)
            shift0 = self.shift0(params["shift0"], cost, max_shift)

        x = self.conv1a(params["conv1a"], x, training=training)
        x = self.sga11(params["sga11"], x, g["sg11"], training=training)
        rem1 = x
        x = self.conv2a(params["conv2a"], x, training=training)
        rem2 = x
        x = self.conv3a(params["conv3a"], x, training=training)
        x = self.deconv3a(params["deconv3a"], x, rem2, training=training)
        rem2 = x
        x = self.deconv2a(params["deconv2a"], x, rem1, training=training)
        x = self.sga12(params["sga12"], x, g["sg12"], training=training)
        rem1 = x
        x = self.deconv1a(params["deconv1a"], x, rem0, training=training)
        x = self.sga2(params["sga2"], x, g["sg2"], training=training)
        rem0 = x
        cost = self.corr2cost({}, x, max_shift // 8, is_ux)
        shift1 = None
        if training:
            shift1 = self.shift1(params["shift1"], cost, max_shift)
        corr = self.corr_output(params["corr_output"], x, training=training)
        rem0 = cost
        x = self.conv1b(params["conv1b"], cost, training=training)
        rem1 = x
        x = self.conv2b(params["conv2b"], x, training=training)
        rem2 = x
        x = self.conv3b(params["conv3b"], x, training=training)
        x = self.deconv3b(params["deconv3b"], x, rem2, training=training)
        x = self.deconv2b(params["deconv2b"], x, rem1, training=training)
        x = self.deconv1b(params["deconv1b"], x, rem0, training=training)
        x = self.sga3(params["sga3"], x, g["sg3"], training=training)
        shift2 = self.shift2(params["shift2"], x, max_shift)
        if training:
            return shift0, shift1, shift2, corr
        return shift2, corr
