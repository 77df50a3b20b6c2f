"""Shared IRR-PWC modules
(reference: ptlflow/models/irr/pwc_modules.py, irr_modules.py).

All NHWC.  The IRR warp normalizes flow against the FULL-IMAGE size and
divides by div_flow (pwc_modules.py:141-163): pixel shift on a feature grid
of width w is flow_x * (w-1) / ((W_im-1) * div_flow).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ... import nn
from ...nn import Module
from ...ops.correlation import coords_grid, local_correlation
from ...ops.grid_sample import bilinear_sampler, interpolate


def lrelu(x):
    return nn.leaky_relu(x, 0.1)


def conv(in_planes, out_planes, kernel_size=3, stride=1, dilation=1,
         isReLU=True):
    pad = ((kernel_size - 1) * dilation) // 2
    layers = [nn.Conv2d(in_planes, out_planes, kernel_size, stride=stride,
                        dilation=dilation, padding=pad, bias=True)]
    if isReLU:
        layers.append(lrelu)
    return nn.Sequential(*layers)


def irr_warp(x, flow, height_im, width_im, div_flow):
    """WarpingLayer (pwc_modules.py:141-163)."""
    b, h, w, c = x.shape
    sx = (w - 1) / (max(width_im - 1, 1) * div_flow)
    sy = (h - 1) / (max(height_im - 1, 1) * div_flow)
    shift = flow * jnp.asarray([sx, sy], flow.dtype)
    coords = coords_grid(b, h, w, dtype=flow.dtype) + shift
    out = bilinear_sampler(x, coords)
    # analytic in-bounds mask == grid_sample-of-ones >= 1 without fp noise
    mask = ((coords[..., 0] >= 0) & (coords[..., 0] <= w - 1) &
            (coords[..., 1] >= 0) & (coords[..., 1] <= h - 1))
    return out * mask[..., None].astype(x.dtype)


def compute_cost_volume(feat1, feat2, max_disp):
    """Mean-over-channel shifted cost volume (pwc_modules.py:57-83) ==
    correlation-sampler sum / C."""
    return local_correlation(feat1, feat2, max_disp,
                             normalize=False) / feat1.shape[-1]


def upsample2d_as(x, target_hw, mode="bilinear"):
    return interpolate(x, target_hw, mode=mode, align_corners=True)


def rescale_flow(flow, div_flow, width_im, height_im, to_local=True):
    """pwc_modules.py:91-103."""
    h, w = flow.shape[1], flow.shape[2]
    if to_local:
        scale = (w / width_im / div_flow, h / height_im / div_flow)
    else:
        scale = (width_im * div_flow / w, height_im * div_flow / h)
    return flow * jnp.asarray(scale, flow.dtype)


class FeatureExtractor(Module):
    """pwc_modules.py:106-122."""

    def __init__(self, num_chs: Sequence[int]):
        super().__init__()
        self.convs = nn.ModuleList([
            nn.Sequential(conv(ch_in, ch_out, stride=2),
                          conv(ch_out, ch_out))
            for ch_in, ch_out in zip(num_chs[:-1], num_chs[1:])])

    def __call__(self, params, x, **kw):
        pyramid = []
        for i, c in enumerate(self.convs):
            x = c(params["convs"][str(i)], x)
            pyramid.append(x)
        return pyramid[::-1]


class FlowEstimatorDense(Module):
    """pwc_modules.py:179-197."""

    def __init__(self, ch_in, ch_out=2):
        super().__init__()
        self.conv1 = conv(ch_in, 128)
        self.conv2 = conv(ch_in + 128, 128)
        self.conv3 = conv(ch_in + 256, 96)
        self.conv4 = conv(ch_in + 352, 64)
        self.conv5 = conv(ch_in + 416, 32)
        self.conv_last = conv(ch_in + 448, ch_out, isReLU=False)

    def __call__(self, params, x, **kw):
        x1 = jnp.concatenate([self.conv1(params["conv1"], x), x], axis=-1)
        x2 = jnp.concatenate([self.conv2(params["conv2"], x1), x1], axis=-1)
        x3 = jnp.concatenate([self.conv3(params["conv3"], x2), x2], axis=-1)
        x4 = jnp.concatenate([self.conv4(params["conv4"], x3), x3], axis=-1)
        x5 = jnp.concatenate([self.conv5(params["conv5"], x4), x4], axis=-1)
        return x5, self.conv_last(params["conv_last"], x5)


# OccEstimatorDense == FlowEstimatorDense with 1 output channel
def OccEstimatorDense(ch_in):
    return FlowEstimatorDense(ch_in, ch_out=1)


class ContextNetwork(Module):
    """pwc_modules.py:232-248 (2-ch) / 251-264 (1-ch)."""

    def __init__(self, ch_in, ch_out=2):
        super().__init__()
        self.convs = nn.Sequential(
            conv(ch_in, 128, 3, 1, 1), conv(128, 128, 3, 1, 2),
            conv(128, 128, 3, 1, 4), conv(128, 96, 3, 1, 8),
            conv(96, 64, 3, 1, 16), conv(64, 32, 3, 1, 1),
            conv(32, ch_out, isReLU=False))

    def __call__(self, params, x, **kw):
        return self.convs(params["convs"], x)


def OccContextNetwork(ch_in):
    return ContextNetwork(ch_in, ch_out=1)


def _neighbors3x3(x):
    """(B, H, W, 1) -> (B, H, W, 9) replicate-padded 3x3 neighborhood in
    torch nn.Unfold channel order (row-major window)."""
    b, h, w, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    return jnp.concatenate(
        [xp[:, dy:dy + h, dx:dx + w] for dy in range(3) for dx in range(3)],
        axis=-1)


class RefineFlow(Module):
    """irr_modules.py:78-127."""

    def __init__(self, ch_in):
        super().__init__()
        self.convs = nn.Sequential(
            conv(ch_in, 128), conv(128, 128), conv(128, 64), conv(64, 64),
            conv(64, 32), conv(32, 32), conv(32, 9))

    def __call__(self, params, flow, diff_img, feature, **kw):
        flow_m = flow - jnp.mean(flow, axis=(1, 2), keepdims=True)
        norm2_img = jnp.linalg.norm(diff_img, axis=-1, keepdims=True)
        feat = self.convs(params["convs"],
                          jnp.concatenate([flow_m, norm2_img, feature],
                                          axis=-1))
        kernel = jax.nn.softmax(-(feat ** 2), axis=-1)
        fx = jnp.sum(_neighbors3x3(flow[..., :1]) * kernel, axis=-1,
                     keepdims=True)
        fy = jnp.sum(_neighbors3x3(flow[..., 1:2]) * kernel, axis=-1,
                     keepdims=True)
        return jnp.concatenate([fx, fy], axis=-1)


class RefineOcc(Module):
    """irr_modules.py:130-167."""

    def __init__(self, ch_in):
        super().__init__()
        self.convs = nn.Sequential(
            conv(ch_in, 128), conv(128, 128), conv(128, 64), conv(64, 64),
            conv(64, 32), conv(32, 32), conv(32, 9))

    def __call__(self, params, occ, feat1, feat2, **kw):
        feat = self.convs(params["convs"],
                          jnp.concatenate([occ, feat1, feat2], axis=-1))
        kernel = jax.nn.softmax(-(feat ** 2), axis=-1)
        return jnp.sum(_neighbors3x3(occ) * kernel, axis=-1, keepdims=True)


class OccUpsampleNetwork(Module):
    """irr_modules.py:45-71."""

    def __init__(self, ch_in, ch_out):
        super().__init__()
        self.init_conv = conv(ch_in, 32)
        self.res_convs = nn.Sequential(conv(32, 32),
                                       conv(32, 32, isReLU=False))
        self.res_end_conv = conv(32, 32)
        self.out_convs = conv(32, ch_out)

    def __call__(self, params, occ, x, **kw):
        h, w = x.shape[1], x.shape[2]
        occ2 = interpolate(occ, (occ.shape[1] * 2, occ.shape[2] * 2),
                           mode="nearest")
        if occ2.shape[1] != h or occ2.shape[2] != w:
            occ2 = interpolate(occ2, (h, w), mode="bilinear",
                               align_corners=False)
        x_in = jnp.concatenate([occ2, x], axis=-1)
        x_init = self.init_conv(params["init_conv"], x_in)
        x_res = x_init
        for _ in range(3):
            x_res = x_res + 0.1 * self.res_convs(params["res_convs"], x_res)
        x_init = x_init + self.res_end_conv(params["res_end_conv"], x_res)
        return self.out_convs(params["out_convs"], x_init) + occ2
