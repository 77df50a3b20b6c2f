"""Core layers, NHWC layout, torch-compatible parameter naming/semantics.

All spatial tensors are NHWC (TPU conv layout); conv weights are stored HWIO.
Torch ``state_dict`` conversion rules are encoded per-layer in
``_torch_leaves`` (OIHW->HWIO transpose for convs, (O,I)->(I,O) for linear).

Semantics matched against the reference's torch modules (e.g.
``/root/reference/ptlflow/models/raft/extractor.py``): BatchNorm2d
(eps=1e-5, momentum=0.1, running stats), InstanceNorm2d (affine=False,
no running stats — normalizes over H,W per sample/channel), GroupNorm.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .module import Module, STATE_LEAVES

IntOr2 = Union[int, Tuple[int, int]]


def _pair(v: IntOr2) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


# ---------------------------------------------------------------------------
# Activations (plain functions)
# ---------------------------------------------------------------------------

relu = jax.nn.relu


def gelu(x):
    # exact erf formulation — torch nn.GELU's default
    return jax.nn.gelu(x, approximate=False)
sigmoid = jax.nn.sigmoid
tanh = jnp.tanh
silu = jax.nn.silu


def leaky_relu(x, negative_slope=0.01):
    return jax.nn.leaky_relu(x, negative_slope)


def softmax(x, axis=-1):
    return jax.nn.softmax(x, axis=axis)


# ---------------------------------------------------------------------------
# Conv layers
# ---------------------------------------------------------------------------

class Conv2d(Module):
    """2-D convolution on NHWC input with HWIO weights.

    ``padding`` accepts an int/pair (symmetric torch-style), or "same"/"valid".
    Matches torch ``nn.Conv2d`` (cross-correlation) semantics.
    """

    def __init__(self, in_channels: int, out_channels: int, kernel_size: IntOr2,
                 stride: IntOr2 = 1, padding: Union[IntOr2, str] = 0,
                 dilation: IntOr2 = 1, groups: int = 1, bias: bool = True,
                 padding_mode: str = "zeros"):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _pair(kernel_size)
        self.stride = _pair(stride)
        if isinstance(padding, str):
            self.padding = padding.upper()
        else:
            ph, pw = _pair(padding)
            self.padding = ((ph, ph), (pw, pw))
        self.dilation = _pair(dilation)
        self.groups = groups
        self.use_bias = bias
        self.padding_mode = padding_mode

    def init(self, key):
        kh, kw = self.kernel_size
        fan_out = self.out_channels * kh * kw
        fan_in = self.in_channels // self.groups * kh * kw
        wkey, bkey = jax.random.split(key)
        # torch kaiming_normal_(mode="fan_out", nonlinearity="relu"), the init
        # used across the reference model zoo.
        std = math.sqrt(2.0 / fan_out)
        w = std * jax.random.normal(
            wkey, (kh, kw, self.in_channels // self.groups, self.out_channels),
            dtype=jnp.float32)
        params = {"weight": w}
        if self.use_bias:
            bound = 1.0 / math.sqrt(fan_in)
            params["bias"] = jax.random.uniform(
                bkey, (self.out_channels,), minval=-bound, maxval=bound,
                dtype=jnp.float32)
        return params

    def _torch_leaves(self):
        leaves = {"weight": lambda w: np.transpose(w, (2, 3, 1, 0))}
        if self.use_bias:
            leaves["bias"] = lambda b: b
        return leaves

    def __call__(self, params, x, **kwargs):
        w = params["weight"]
        padding = self.padding
        if self.padding_mode != "zeros" and not isinstance(padding, str):
            (ph0, ph1), (pw0, pw1) = padding
            mode = {"replicate": "edge", "reflect": "reflect",
                    "circular": "wrap"}[self.padding_mode]
            x = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)), mode=mode)
            padding = ((0, 0), (0, 0))
        if (self.groups == self.in_channels == self.out_channels
                and self.groups > 1
                and ((self.kernel_size[0] >= 13 and self.kernel_size[1] >= 13)
                     or (self.kernel_size[0] >= 10
                         and self.kernel_size[1] >= 15))
                and self.stride == (1, 1) and self.dilation == (1, 1)
                and not isinstance(padding, str)):
            # Large-kernel depthwise (the super-kernel PCBlocks of
            # SKFlow/StreamFlow/MemFlow/VideoFlow use 15x15): XLA TPU's
            # grouped conv emitter has a sharp cliff when BOTH kernel dims
            # are large (v5e, (3,63,125,324) fp32: 15x15 131 ms, 13x15
            # 113 ms — yet 15x13 1.2 ms, 13x13 0.8 ms, 9x15 0.4 ms).
            # Splitting the kernel rows into <=8-row chunks (two 8x15/7x15
            # convs, statically row-shifted and summed) stays below the
            # cliff on both operands and is bit-equivalent up to fp32 sum
            # order: 0.96 ms on the same shape, 2.8x faster than the 1-row
            # decomposition this replaced.  Mid-size kernels (5x5..13x13)
            # take the plain emitter path below — it beats any row split
            # there (7x7@c640: single 0.62 ms vs rows 1.39 ms).  The gate
            # also covers kh in [10, 12] at kw>=15 (unmeasured gap between
            # the good 9x15 and the bad 13x15): the row split is at worst
            # ~2x the plain emitter there, never the 100x cliff.
            y = self._depthwise_rows(x, w.astype(x.dtype), padding)
        else:
            y = jax.lax.conv_general_dilated(
                x, w.astype(x.dtype),
                window_strides=self.stride,
                padding=padding,
                rhs_dilation=self.dilation,
                feature_group_count=self.groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            y = y + params["bias"].astype(y.dtype)
        return y

    def _depthwise_rows(self, x, w, padding, chunk: int = 8):
        kh_total = self.kernel_size[0]
        (ph0, ph1), pw = padding
        xp = jnp.pad(x, ((0, 0), (ph0, ph1), (0, 0), (0, 0)))
        out_h = xp.shape[1] - kh_total + 1
        acc = None
        for dy0 in range(0, kh_total, chunk):
            kh = min(chunk, kh_total - dy0)
            xs = jax.lax.slice_in_dim(xp, dy0, dy0 + out_h + kh - 1, axis=1)
            y = jax.lax.conv_general_dilated(
                xs, w[dy0:dy0 + kh], (1, 1), ((0, 0), pw),
                feature_group_count=self.groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            acc = y if acc is None else acc + y
        return acc


def _triple(v):
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v, v)


def _conv3d_blocked(x, w, stride, padding, rhs_dilation):
    """3-D conv lowered to one 2-D conv: block the D axis into channels.

    XLA TPU's 3-spatial-dim conv emitter is pathological at the small
    channel counts cost volumes use (C=8: ~100 GFLOP/s measured on v5e for
    SeparableFlow's aggregation U-Nets).  Instead, split D into blocks of S
    outputs, gather each block's input span (halo included) into channels,
    fold the block index into batch, and run a single NHWC conv whose
    weight is the D-banded block matrix.  ~(S+kd-1)/kd extra FLOPs, but the
    MXU runs at full lane width: ~10x faster at C=8 in practice.

    x: (B, D, H, W, C); w: (kd, kh, kw, I, O).  groups==1, D-dilation==1.
    """
    b, d, h, wd, c = x.shape
    kd, kh, kw, ci, co = w.shape
    sd, sh, sw = stride
    (pd, _), (ph, ph2), (pw, pw2) = padding
    _, dh_, dw_ = rhs_dilation
    dout = (d + 2 * pd - kd) // sd + 1
    S = min(max(1, 128 // co), dout)
    G = -(-dout // S)
    L = (S - 1) * sd + kd
    need = (G - 1) * S * sd + L
    xp = jnp.pad(x, ((0, 0), (pd, max(0, need - d - pd)), (0, 0), (0, 0),
                     (0, 0)))
    blocks = jnp.stack([xp[:, g * S * sd: g * S * sd + L] for g in range(G)],
                       axis=1)  # (B, G, L, H, W, C)
    xc = blocks.transpose(0, 1, 3, 4, 2, 5).reshape(b * G, h, wd, L * c)
    ind = np.zeros((kd, L, S), np.float32)
    for do_l in range(S):
        for t in range(kd):
            ind[t, do_l * sd + t, do_l] = 1.0
    wb = jnp.tensordot(jnp.asarray(ind, dtype=w.dtype), w,
                       axes=[[0], [0]])  # (L, S, kh, kw, I, O)
    wb = wb.transpose(2, 3, 0, 4, 1, 5).reshape(kh, kw, L * ci, S * co)
    y = jax.lax.conv_general_dilated(
        xc, wb, (sh, sw), ((ph, ph2), (pw, pw2)), rhs_dilation=(dh_, dw_),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ho, wo = y.shape[1], y.shape[2]
    y = y.reshape(b, G, ho, wo, S, co).transpose(0, 1, 4, 2, 3, 5)
    return y.reshape(b, G * S, ho, wo, co)[:, :dout]


def _conv_transpose3d_blocked(x, w, stride, padding, output_padding):
    """Transposed 3-D conv lowered to one lhs-dilated 2-D conv, same D-axis
    blocking idea as :func:`_conv3d_blocked`.

    x: (B, D, H, W, C); w: (kd, kh, kw, O, I) (torch orientation per
    ``ConvTranspose3d._torch_leaves``).  y[do] = sum over (t, di) with
    do = sd*di + t - pd of x[di] . w[t].
    """
    b, d, h, wd, c = x.shape
    kd, kh, kw, co, ci = w.shape
    sd, sh, sw = stride
    pd, ph, pw = padding
    od, oh, ow = output_padding
    dout = (d - 1) * sd - 2 * pd + kd + od
    S = min(max(1, 128 // co), dout)
    if S > sd:
        S -= S % sd
    G = -(-dout // S)
    if G > 1 and S % sd != 0:
        S, G = sd, -(-dout // sd)  # uniform blocks require sd | S
    # block g covers do in [gS, gS+S); contributing di: t = do + pd - sd*di
    di0 = (pd - kd + 1) // sd  # floor
    r = pd - sd * di0
    dl_min = -(-(r - kd + 1) // sd)  # ceil
    dl_max = (S - 1 + r) // sd
    di0 += dl_min
    r -= sd * dl_min
    L = dl_max - dl_min + 1
    step = S // sd if G > 1 else 0
    front = max(0, -di0)
    last_start = di0 + (G - 1) * step
    back = max(0, last_start + L - 1 - (d - 1))
    xp = jnp.pad(x, ((0, 0), (front, back), (0, 0), (0, 0), (0, 0)))
    blocks = jnp.stack(
        [xp[:, di0 + front + g * step: di0 + front + g * step + L]
         for g in range(G)], axis=1)  # (B, G, L, H, W, C)
    xc = blocks.transpose(0, 1, 3, 4, 2, 5).reshape(b * G, h, wd, L * c)
    ind = np.zeros((kd, L, S), np.float32)
    for o_l in range(S):
        for dl in range(L):
            t = o_l + r - sd * dl
            if 0 <= t < kd:
                ind[t, dl, o_l] = 1.0
    wf = jnp.transpose(w[:, ::-1, ::-1], (0, 1, 2, 4, 3))  # (kd,kh,kw,I,O)
    wb = jnp.tensordot(jnp.asarray(ind, dtype=w.dtype), wf, axes=[[0], [0]])
    wb = wb.transpose(2, 3, 0, 4, 1, 5).reshape(kh, kw, L * ci, S * co)
    pad_hw = ((kh - 1 - ph, kh - 1 - ph + oh), (kw - 1 - pw, kw - 1 - pw + ow))
    y = jax.lax.conv_general_dilated(
        xc, wb, (1, 1), pad_hw, lhs_dilation=(sh, sw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ho, wo = y.shape[1], y.shape[2]
    y = y.reshape(b, G, ho, wo, S, co).transpose(0, 1, 4, 2, 3, 5)
    return y.reshape(b, G * S, ho, wo, co)[:, :dout]


class Conv3d(Module):
    """3-D convolution on NDHWC input with DHWIO weights; torch
    ``nn.Conv3d`` (cross-correlation) semantics."""

    def __init__(self, in_channels: int, out_channels: int, kernel_size,
                 stride=1, padding=0, dilation=1, groups: int = 1,
                 bias: bool = True):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _triple(kernel_size)
        self.stride = _triple(stride)
        pd, ph, pw = _triple(padding)
        self.padding = ((pd, pd), (ph, ph), (pw, pw))
        self.dilation = _triple(dilation)
        self.groups = groups
        self.use_bias = bias

    def init(self, key):
        kd, kh, kw = self.kernel_size
        fan_out = self.out_channels * kd * kh * kw
        fan_in = self.in_channels // self.groups * kd * kh * kw
        wkey, bkey = jax.random.split(key)
        std = math.sqrt(2.0 / fan_out)
        w = std * jax.random.normal(
            wkey, (kd, kh, kw, self.in_channels // self.groups,
                   self.out_channels), dtype=jnp.float32)
        params = {"weight": w}
        if self.use_bias:
            bound = 1.0 / math.sqrt(fan_in)
            params["bias"] = jax.random.uniform(
                bkey, (self.out_channels,), minval=-bound, maxval=bound,
                dtype=jnp.float32)
        return params

    def _torch_leaves(self):
        # torch (O, I, kd, kh, kw) -> DHWIO
        leaves = {"weight": lambda w: np.transpose(w, (2, 3, 4, 1, 0))}
        if self.use_bias:
            leaves["bias"] = lambda b: b
        return leaves

    def __call__(self, params, x, **kwargs):
        w = params["weight"].astype(x.dtype)
        if self.groups == 1 and self.dilation[0] == 1:
            y = _conv3d_blocked(x, w, self.stride, self.padding,
                                (1,) + self.dilation[1:])
        else:
            y = jax.lax.conv_general_dilated(
                x, w,
                window_strides=self.stride,
                padding=self.padding,
                rhs_dilation=self.dilation,
                feature_group_count=self.groups,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
        if self.use_bias:
            y = y + params["bias"].astype(y.dtype)
        return y


class ConvTranspose3d(Module):
    """Transposed 3-D conv (NDHWC); torch ``nn.ConvTranspose3d``."""

    def __init__(self, in_channels: int, out_channels: int, kernel_size,
                 stride=1, padding=0, output_padding=0, bias: bool = True):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _triple(kernel_size)
        self.stride = _triple(stride)
        self.padding = _triple(padding)
        self.output_padding = _triple(output_padding)
        self.use_bias = bias

    def init(self, key):
        kd, kh, kw = self.kernel_size
        fan_in = self.in_channels * kd * kh * kw
        wkey, bkey = jax.random.split(key)
        bound = 1.0 / math.sqrt(fan_in)
        w = jax.random.uniform(
            wkey, (kd, kh, kw, self.out_channels, self.in_channels),
            minval=-bound, maxval=bound, dtype=jnp.float32)
        params = {"weight": w}
        if self.use_bias:
            params["bias"] = jax.random.uniform(
                bkey, (self.out_channels,), minval=-bound, maxval=bound,
                dtype=jnp.float32)
        return params

    def _torch_leaves(self):
        # torch (I, O, kd, kh, kw) -> DHW(O)I
        leaves = {"weight": lambda w: np.transpose(w, (2, 3, 4, 1, 0))}
        if self.use_bias:
            leaves["bias"] = lambda b: b
        return leaves

    def __call__(self, params, x, **kwargs):
        w = params["weight"].astype(x.dtype)
        y = _conv_transpose3d_blocked(x, w, self.stride, self.padding,
                                      self.output_padding)
        if self.use_bias:
            y = y + params["bias"].astype(y.dtype)
        return y


class ConvTranspose2d(Module):
    """Transposed conv (NHWC). Matches torch ``nn.ConvTranspose2d``."""

    def __init__(self, in_channels: int, out_channels: int, kernel_size: IntOr2,
                 stride: IntOr2 = 1, padding: IntOr2 = 0,
                 output_padding: IntOr2 = 0, groups: int = 1, bias: bool = True):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _pair(kernel_size)
        self.stride = _pair(stride)
        self.padding = _pair(padding)
        self.output_padding = _pair(output_padding)
        self.groups = groups
        self.use_bias = bias

    def init(self, key):
        kh, kw = self.kernel_size
        fan_in = self.in_channels // self.groups * kh * kw
        wkey, bkey = jax.random.split(key)
        bound = 1.0 / math.sqrt(fan_in)
        w = jax.random.uniform(
            wkey, (kh, kw, self.out_channels // self.groups, self.in_channels),
            minval=-bound, maxval=bound, dtype=jnp.float32)
        params = {"weight": w}
        if self.use_bias:
            params["bias"] = jax.random.uniform(
                bkey, (self.out_channels,), minval=-bound, maxval=bound,
                dtype=jnp.float32)
        return params

    def _torch_leaves(self):
        # torch stores (I, O/groups, kh, kw) -> HW(O/groups)I
        leaves = {"weight": lambda w: np.transpose(w, (2, 3, 1, 0))}
        if self.use_bias:
            leaves["bias"] = lambda b: b
        return leaves

    def __call__(self, params, x, **kwargs):
        kh, kw = self.kernel_size
        sh, sw = self.stride
        ph, pw = self.padding
        oph, opw = self.output_padding
        # Equivalent gradient-of-conv padding:
        pad_h = (kh - 1 - ph, kh - 1 - ph + oph)
        pad_w = (kw - 1 - pw, kw - 1 - pw + opw)
        w = params["weight"].astype(x.dtype)
        # flip spatial dims; weight layout HW(O/g)I -> use as HWIO with I=in
        w = w[::-1, ::-1]
        if self.groups != 1:
            # grouped transpose conv: split channels
            xs = jnp.split(x, self.groups, axis=-1)
            ws = jnp.split(w, self.groups, axis=3)
            ys = [jax.lax.conv_general_dilated(
                xi, jnp.swapaxes(wi, 2, 3), window_strides=(1, 1),
                padding=(pad_h, pad_w), lhs_dilation=(sh, sw),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) for xi, wi in zip(xs, ws)]
            y = jnp.concatenate(ys, axis=-1)
        else:
            y = jax.lax.conv_general_dilated(
                x, jnp.swapaxes(w, 2, 3), window_strides=(1, 1),
                padding=(pad_h, pad_w), lhs_dilation=(sh, sw),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            y = y + params["bias"].astype(y.dtype)
        return y


class Linear(Module):
    def __init__(self, in_features: int, out_features: int, bias: bool = True):
        super().__init__()
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = bias

    def init(self, key):
        wkey, bkey = jax.random.split(key)
        bound = 1.0 / math.sqrt(self.in_features)
        params = {"weight": jax.random.uniform(
            wkey, (self.in_features, self.out_features), minval=-bound,
            maxval=bound, dtype=jnp.float32)}
        if self.use_bias:
            params["bias"] = jax.random.uniform(
                bkey, (self.out_features,), minval=-bound, maxval=bound,
                dtype=jnp.float32)
        return params

    def _torch_leaves(self):
        leaves = {"weight": lambda w: np.transpose(w, (1, 0))}
        if self.use_bias:
            leaves["bias"] = lambda b: b
        return leaves

    def __call__(self, params, x, **kwargs):
        y = jnp.dot(x, params["weight"].astype(x.dtype),
                    preferred_element_type=x.dtype)
        if self.use_bias:
            y = y + params["bias"].astype(y.dtype)
        return y


# ---------------------------------------------------------------------------
# Normalization layers
# ---------------------------------------------------------------------------

class BatchNorm2d(Module):
    """Matches torch ``nn.BatchNorm2d``: training uses batch stats and updates
    running stats in the params tree (caller threads the tree functionally)."""

    def __init__(self, num_features: int, eps: float = 1e-5,
                 momentum: float = 0.1, affine: bool = True,
                 track_running_stats: bool = True):
        super().__init__()
        self.num_features = num_features
        self.eps = eps
        self.momentum = momentum
        self.affine = affine
        self.track_running_stats = track_running_stats

    def init(self, key):
        p = {}
        if self.affine:
            p["weight"] = jnp.ones((self.num_features,), jnp.float32)
            p["bias"] = jnp.zeros((self.num_features,), jnp.float32)
        if self.track_running_stats:
            p["running_mean"] = jnp.zeros((self.num_features,), jnp.float32)
            p["running_var"] = jnp.ones((self.num_features,), jnp.float32)
        return p

    def _torch_leaves(self):
        leaves = {}
        if self.affine:
            leaves["weight"] = lambda w: w
            leaves["bias"] = lambda b: b
        if self.track_running_stats:
            leaves["running_mean"] = lambda v: v
            leaves["running_var"] = lambda v: v
        return leaves

    def __call__(self, params, x, training: bool = False, **kwargs):
        if training or not self.track_running_stats:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.var(xf, axis=(0, 1, 2))
            if training and self.track_running_stats:
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbiased = var * n / max(n - 1, 1)
                m = self.momentum
                params["running_mean"] = (
                    (1 - m) * params["running_mean"] + m * mean)
                params["running_var"] = (
                    (1 - m) * params["running_var"] + m * unbiased)
        else:
            mean = params["running_mean"]
            var = params["running_var"]
        inv = jax.lax.rsqrt(var + self.eps)
        scale = inv
        shift = -mean * inv
        if self.affine:
            scale = scale * params["weight"]
            shift = shift * params["weight"] + params["bias"]
        return (x * scale.astype(x.dtype) + shift.astype(x.dtype))


class InstanceNorm2d(Module):
    """torch default: affine=False, no running stats."""

    def __init__(self, num_features: int, eps: float = 1e-5,
                 affine: bool = False):
        super().__init__()
        self.num_features = num_features
        self.eps = eps
        self.affine = affine

    def init(self, key):
        if not self.affine:
            return {}
        return {"weight": jnp.ones((self.num_features,), jnp.float32),
                "bias": jnp.zeros((self.num_features,), jnp.float32)}

    def _torch_leaves(self):
        if not self.affine:
            return {}
        return {"weight": lambda w: w, "bias": lambda b: b}

    def __call__(self, params, x, **kwargs):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.var(xf, axis=(1, 2), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            y = y * params["weight"] + params["bias"]
        return y.astype(x.dtype)


class GroupNorm(Module):
    def __init__(self, num_groups: int, num_channels: int, eps: float = 1e-5,
                 affine: bool = True):
        super().__init__()
        self.num_groups = num_groups
        self.num_channels = num_channels
        self.eps = eps
        self.affine = affine

    def init(self, key):
        if not self.affine:
            return {}
        return {"weight": jnp.ones((self.num_channels,), jnp.float32),
                "bias": jnp.zeros((self.num_channels,), jnp.float32)}

    def _torch_leaves(self):
        if not self.affine:
            return {}
        return {"weight": lambda w: w, "bias": lambda b: b}

    def __call__(self, params, x, **kwargs):
        n, h, w, c = x.shape
        g = self.num_groups
        xf = x.astype(jnp.float32).reshape(n, h, w, g, c // g)
        mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
        var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + self.eps)).reshape(n, h, w, c)
        if self.affine:
            y = y * params["weight"] + params["bias"]
        return y.astype(x.dtype)


class LayerNorm(Module):
    """Normalizes over the last dimension(s), torch ``nn.LayerNorm``."""

    def __init__(self, normalized_shape, eps: float = 1e-5,
                 elementwise_affine: bool = True):
        super().__init__()
        if isinstance(normalized_shape, int):
            normalized_shape = (normalized_shape,)
        self.normalized_shape = tuple(normalized_shape)
        self.eps = eps
        self.affine = elementwise_affine

    def init(self, key):
        if not self.affine:
            return {}
        return {"weight": jnp.ones(self.normalized_shape, jnp.float32),
                "bias": jnp.zeros(self.normalized_shape, jnp.float32)}

    def _torch_leaves(self):
        if not self.affine:
            return {}
        return {"weight": lambda w: w, "bias": lambda b: b}

    def __call__(self, params, x, **kwargs):
        axes = tuple(range(x.ndim - len(self.normalized_shape), x.ndim))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.var(xf, axis=axes, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            y = y * params["weight"] + params["bias"]
        return y.astype(x.dtype)


class Dropout(Module):
    """Inference no-op; training applies inverted dropout if rng provided."""

    def __init__(self, p: float = 0.5):
        super().__init__()
        self.p = p

    def __call__(self, params, x, training: bool = False,
                 rng: Optional[jax.Array] = None, **kwargs):
        if not training or self.p == 0.0 or rng is None:
            return x
        keep = jax.random.bernoulli(rng, 1.0 - self.p, x.shape)
        return jnp.where(keep, x / (1.0 - self.p), 0.0)


# ---------------------------------------------------------------------------
# Pooling / resize functions
# ---------------------------------------------------------------------------

def avg_pool2d(x: jnp.ndarray, kernel: IntOr2, stride: Optional[IntOr2] = None,
               padding: IntOr2 = 0) -> jnp.ndarray:
    """NHWC average pooling, torch ``F.avg_pool2d`` semantics (count includes
    padded zeros, as torch's default count_include_pad=True)."""
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride) if stride is not None else (kh, kw)
    ph, pw = _pair(padding)
    y = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, kh, kw, 1), (1, sh, sw, 1),
        padding=((0, 0), (ph, ph), (pw, pw), (0, 0)))
    return y / (kh * kw)


def max_pool2d(x: jnp.ndarray, kernel: IntOr2, stride: Optional[IntOr2] = None,
               padding: IntOr2 = 0) -> jnp.ndarray:
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride) if stride is not None else (kh, kw)
    ph, pw = _pair(padding)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, kh, kw, 1), (1, sh, sw, 1),
        padding=((0, 0), (ph, ph), (pw, pw), (0, 0)))
