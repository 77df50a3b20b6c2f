"""Partial-Kernel convolutions and Sparse-Large-Kernel blocks for RPKNet
(reference: ptlflow/models/rpknet/pkconv.py:26-295, pkconv_slk.py:31-344).

A PKConv stores one full-size kernel and slices it to the caller's actual
in/out channel counts.  The reference does this with runtime tensor slicing
and a weight cache; under XLA the channel counts are Python ints at trace
time, so the slices are static and free — every distinct (in, out) pair
simply compiles its own conv.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn
from ...nn import Module


def group_norm(x, num_groups=8, eps=1e-6):
    """Channel-sliceable GroupNorm, affine=False (local_timm/norm.py:55-72);
    x is NHWC."""
    b, h, w, c = x.shape
    g = num_groups
    xg = x.reshape(b, h, w, g, c // g)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = xg.var(axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    return xg.reshape(b, h, w, c)


def layer_norm2d(x, eps=1e-6):
    """Channel LayerNorm, affine=False (local_timm/norm.py:24-37 with
    affine=False); x is NHWC."""
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def make_norm(norm_type: str, num_groups: int = 8):
    """get_norm_layer equivalent (reference utils.py:236-251), affine=False
    variants only (the published configs use use_norm_affine=False)."""
    if norm_type == "group":
        return lambda x: group_norm(x, num_groups)
    if norm_type == "layer":
        return layer_norm2d
    if norm_type == "none" or norm_type is None:
        return lambda x: x
    raise ValueError(f"unsupported norm '{norm_type}' (affine norms TBD)")


class PKConv2d(Module):
    """Partial-kernel conv (reference pkconv.py:111-261).

    Stores the full (max-channel) HWIO kernel; ``__call__`` slices it to the
    input's channel count and the requested ``out_ch``.  Supports groups==1
    and depthwise (groups == in_channels, where slicing keeps the leading
    ``out_ch`` single-channel kernels — reference pkconv.py:57-82).
    """

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, groups=1, bias=True):
        super().__init__()
        assert groups == 1 or groups == in_channels, \
            "PKConv2d supports groups==1 or depthwise only"
        self.in_channels = in_channels
        self.out_channels = out_channels
        if not isinstance(kernel_size, (tuple, list)):
            kernel_size = (kernel_size, kernel_size)
        self.kernel_size = tuple(kernel_size)
        self.stride = (stride, stride) if isinstance(stride, int) else stride
        if not isinstance(padding, (tuple, list)):
            padding = (padding, padding)
        self.padding = tuple(padding)
        self.depthwise = groups > 1
        self.use_bias = bias

    def init(self, key):
        kh, kw = self.kernel_size
        ig = 1 if self.depthwise else self.in_channels
        wkey, bkey = jax.random.split(key)
        # reference _init_weights: normal(0, sqrt(2/fan_out)) over full kernel
        fan_out = kh * kw * self.out_channels
        if self.depthwise:
            fan_out //= self.in_channels
        std = math.sqrt(2.0 / fan_out)
        params = {"weight": std * jax.random.normal(
            wkey, (kh, kw, ig, self.out_channels), dtype=jnp.float32)}
        if self.use_bias:
            params["bias"] = jnp.zeros((self.out_channels,))
        return params

    def _torch_leaves(self):
        leaves = {"weight": lambda w: np.transpose(w, (2, 3, 1, 0))}
        if self.use_bias:
            leaves["bias"] = lambda b: b
        return leaves

    def __call__(self, params, x, out_ch: Optional[int] = None, **kw):
        in_ch = x.shape[-1]
        if out_ch is None:
            out_ch = self.out_channels
        w = params["weight"]
        if self.depthwise:
            w = w[:, :, :, :out_ch]
            groups = in_ch
        else:
            w = w[:, :, :in_ch, :out_ch]
            groups = 1
        ph, pw = self.padding
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=self.stride,
            padding=((ph, ph), (pw, pw)), feature_group_count=groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            y = y + params["bias"][:out_ch].astype(y.dtype)
        return y


class DWConv(Module):
    """reference pkconv_slk.py:278-291."""

    def __init__(self, dim):
        super().__init__()
        self.dwconv = PKConv2d(dim, dim, 3, 1, 1, bias=True, groups=dim)

    def __call__(self, params, x, out_ch=None, **kw):
        return self.dwconv(params["dwconv"], x, out_ch=out_ch)


class Mlp(Module):
    """1x1-conv MLP with depthwise conv (reference pkconv_slk.py:31-91)."""

    def __init__(self, in_features, hidden_features, skip_dw=False):
        super().__init__()
        self.fc1 = PKConv2d(in_features, hidden_features, 1)
        self.dwconv = None if skip_dw else DWConv(hidden_features)
        self.fc2 = PKConv2d(hidden_features, in_features, 1)
        self.in_hid_factor = float(hidden_features) / in_features
        self.hid_out_factor = float(in_features) / hidden_features

    def __call__(self, params, x, **kw):
        out_ch = int(self.in_hid_factor * x.shape[-1])
        x = self.fc1(params["fc1"], x, out_ch=out_ch)
        if self.dwconv is not None:
            x = self.dwconv(params["dwconv"], x, out_ch=out_ch)
        x = nn.gelu(x)
        out_ch = int(self.hid_out_factor * x.shape[-1])
        return self.fc2(params["fc2"], x, out_ch=out_ch)


class SLKUnitCore(Module):
    """Separable large-kernel spatial gating (reference pkconv_slk.py:94-132)."""

    def __init__(self, dim, ksize=23):
        super().__init__()
        self.conv1_branches = nn.ModuleList([
            PKConv2d(dim, dim, (ksize, 1), padding=(ksize // 2, 0),
                     groups=dim)])
        self.conv2_branches = nn.ModuleList([
            PKConv2d(dim, dim, (1, ksize), padding=(0, ksize // 2),
                     groups=dim)])
        self.conv_out = PKConv2d(dim, dim, 1)

    def __call__(self, params, x, out_ch=None, **kw):
        y = x + self.conv1_branches[0](params["conv1_branches"]["0"], x,
                                       out_ch=out_ch)
        y = y + self.conv2_branches[0](params["conv2_branches"]["0"], y,
                                       out_ch=out_ch)
        y = self.conv_out(params["conv_out"], y, out_ch=out_ch)
        return y + x


class SLKUnit(Module):
    """reference pkconv_slk.py:135-159."""

    def __init__(self, dim):
        super().__init__()
        self.proj_1 = PKConv2d(dim, dim, 1)
        self.spatial_gating_unit = SLKUnitCore(dim)
        self.proj_2 = PKConv2d(dim, dim, 1)

    def __call__(self, params, x, **kw):
        out_ch = x.shape[-1]
        shortcut = x
        x = nn.gelu(self.proj_1(params["proj_1"], x, out_ch=out_ch))
        x = self.spatial_gating_unit(params["spatial_gating_unit"], x,
                                     out_ch=out_ch)
        x = self.proj_2(params["proj_2"], x, out_ch=out_ch)
        return x + shortcut


class SLK(Module):
    """VAN-style block with layer scale (reference pkconv_slk.py:162-226)."""

    def __init__(self, dim, mlp_ratio=4.0, norm=group_norm):
        super().__init__()
        self.dim = dim
        self.norm = norm
        self.attn = SLKUnit(dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def init(self, key):
        params = super().init(key)
        params["layer_scale_1"] = 1e-2 * jnp.ones((self.dim,))
        params["layer_scale_2"] = 1e-2 * jnp.ones((self.dim,))
        return params

    def _torch_leaves(self):
        return {"layer_scale_1": lambda g: g, "layer_scale_2": lambda g: g}

    def __call__(self, params, x, out_ch=None, **kw):
        c = x.shape[-1]
        x = x + params["layer_scale_1"][:c] * self.attn(
            params["attn"], self.norm(x))
        x = x + params["layer_scale_2"][:c] * self.mlp(
            params["mlp"], self.norm(x))
        return x


class LayerTransition(Module):
    """Patch-embed downsample (reference pkconv_slk.py:229-275)."""

    def __init__(self, patch_size, stride, in_chans, embed_dim,
                 norm=group_norm):
        super().__init__()
        self.proj = PKConv2d(in_chans, embed_dim, patch_size, stride=stride,
                             padding=patch_size // 2)
        self.norm_fn = norm

    def __call__(self, params, x, out_ch=None, **kw):
        return self.norm_fn(self.proj(params["proj"], x, out_ch=out_ch))


class PKConvSLK(Module):
    """Down + N SLK blocks + norm (reference pkconv_slk.py:294-344)."""

    def __init__(self, in_chs, out_chs, mlp_ratio=4.0, norm=group_norm,
                 stride=1, depth=2):
        super().__init__()
        self.down = None
        if stride > 1 or in_chs != out_chs:
            self.down = LayerTransition(3 if stride > 1 else 1, stride,
                                        in_chs, out_chs, norm=norm)
        self.blocks = nn.ModuleList([
            SLK(out_chs, mlp_ratio=mlp_ratio, norm=norm)
            for _ in range(depth)])
        self.norm_fn = norm

    def __call__(self, params, x, out_ch=None, **kw):
        if self.down is not None:
            x = self.down(params["down"], x, out_ch=out_ch)
        for i, blk in enumerate(self.blocks):
            x = blk(params["blocks"][str(i)], x, out_ch=out_ch)
        return self.norm_fn(x)
