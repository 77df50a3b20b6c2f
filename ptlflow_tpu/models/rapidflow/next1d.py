"""NeXt1D blocks — ConvNeXt-style stages with rank-1 separable depthwise
convolutions (reference: ptlflow/models/rapidflow/next1d.py:37-260).

TPU notes: the reference trains with two chained 1-D convs and fuses them
into a single k×k kernel at inference (FusedConv1d, next1d.py:109-144).
Here we always build the fused kernel as an outer product of the two 1-D
weights — a (k·k·C)-FLOP einsum that XLA folds into the conv — so one
depthwise conv runs on device in both modes while gradients still flow to
the separable factors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn
from ...nn import Module


class Next1dConv(Module):
    """Depthwise conv parameterized by rank-1 horizontal/vertical factors.

    Torch params ``weight_h`` (O, I/g, 1, k) and ``weight_v`` (O, I/g, k, 1)
    (FusedConv1d, reference next1d.py:60-107); stored HWIO here.  With
    ``fuse_weights`` the checkpoint instead holds a dense ``weight``.
    """

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, groups=1, bias=True, fuse_weights=False):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = (stride, stride) if isinstance(stride, int) else stride
        self.padding = padding
        self.groups = groups
        self.use_bias = bias
        self.fuse_weights = fuse_weights

    def init(self, key):
        k = self.kernel_size
        ig = self.in_channels // self.groups
        # reference registers zero-filled weights (next1d.py:61-101)
        if self.fuse_weights:
            params = {"weight": jnp.zeros((k, k, ig, self.out_channels))}
        else:
            params = {
                "weight_h": jnp.zeros((1, k, ig, self.out_channels)),
                "weight_v": jnp.zeros((k, 1, ig, self.out_channels)),
            }
        if self.use_bias:
            params["bias"] = jnp.zeros((self.out_channels,))
        return params

    def _torch_leaves(self):
        tr = lambda w: np.transpose(w, (2, 3, 1, 0))
        if self.fuse_weights:
            leaves = {"weight": tr}
        else:
            leaves = {"weight_h": tr, "weight_v": tr}
        if self.use_bias:
            leaves["bias"] = lambda b: b
        return leaves

    def __call__(self, params, x, **kw):
        if self.fuse_weights:
            w = params["weight"]
        else:
            # fused[kh, kw, i, o] = v[kh, 0, i, o] * h[0, kw, i, o]
            # (reference einsum "cijk,cimj->cimk", next1d.py:132-134)
            w = params["weight_v"] * params["weight_h"]
        p = self.padding
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=self.stride,
            padding=((p, p), (p, p)), feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            y = y + params["bias"].astype(y.dtype)
        return y


class ConvMlp(Module):
    """1x1-conv MLP (local_timm/mlp.py:44-75); act = exact-erf GELU."""

    def __init__(self, in_features, hidden_features):
        super().__init__()
        self.fc1 = nn.Conv2d(in_features, hidden_features, 1)
        self.fc2 = nn.Conv2d(hidden_features, in_features, 1)

    def __call__(self, params, x, **kw):
        return self.fc2(params["fc2"], nn.gelu(self.fc1(params["fc1"], x)))


class Next1dBlock(Module):
    """ConvNeXt block with separable depthwise conv
    (reference next1d.py:147-194)."""

    def __init__(self, in_chs, out_chs=None, kernel_size=7, stride=1,
                 mlp_ratio=4, ls_init_value=1e-6, fuse_next1d_weights=False):
        super().__init__()
        out_chs = out_chs or in_chs
        self.ls_init_value = ls_init_value
        self.out_chs = out_chs
        self.conv_dw = Next1dConv(in_chs, out_chs, kernel_size, stride=stride,
                                  padding=kernel_size // 2, groups=in_chs,
                                  bias=True, fuse_weights=fuse_next1d_weights)
        self.norm = nn.LayerNorm(out_chs, eps=1e-6)
        self.mlp = ConvMlp(out_chs, int(mlp_ratio * out_chs))

    def init(self, key):
        params = super().init(key)
        if self.ls_init_value > 0:
            params["gamma"] = self.ls_init_value * jnp.ones((self.out_chs,))
        return params

    def _torch_leaves(self):
        if self.ls_init_value > 0:
            return {"gamma": lambda g: g}
        return {}

    def __call__(self, params, x, **kw):
        shortcut = x
        x = self.conv_dw(params["conv_dw"], x)
        x = self.norm(params["norm"], x)
        x = self.mlp(params["mlp"], x)
        if self.ls_init_value > 0:
            x = x * params["gamma"].astype(x.dtype)
        return x + shortcut


class Next1dStage(Module):
    """Downsample + N blocks (reference next1d.py:197-260)."""

    def __init__(self, in_chs, out_chs, kernel_size=7, stride=2, depth=2,
                 ls_init_value=1.0, mlp_ratio=4, fuse_next1d_weights=False):
        super().__init__()
        if in_chs != out_chs or stride > 1:
            ds_ks = 2 if stride > 1 else 1
            self.downsample = nn.Sequential(
                nn.LayerNorm(in_chs, eps=1e-6),
                nn.Conv2d(in_chs, out_chs, ds_ks, stride=stride, padding=0,
                          bias=True))
            in_chs = out_chs
        else:
            self.downsample = nn.Identity()
        blocks = []
        for _ in range(depth):
            blocks.append(Next1dBlock(
                in_chs, out_chs, kernel_size=kernel_size,
                ls_init_value=ls_init_value, mlp_ratio=mlp_ratio,
                fuse_next1d_weights=fuse_next1d_weights))
            in_chs = out_chs
        self.blocks = nn.Sequential(*blocks)

    def __call__(self, params, x, **kw):
        x = self.downsample(params.get("downsample", {}), x)
        return self.blocks(params["blocks"], x)


class Next1dEncoder(Module):
    """Recurrent pyramid encoder (reference next1d_encoder.py:27-101): one
    shared stage is applied repeatedly, halving resolution each time; levels
    whose stride is inside ``max_pyr_range`` are emitted coarsest-first."""

    def __init__(self, max_pyr_range, stem_stride, num_recurrent_layers,
                 hidden_chs, out_chs, mlp_ratio=4.0, depth=2,
                 fuse_next1d_weights=False):
        super().__init__()
        self.max_pyr_range = max_pyr_range
        self.stem_stride = stem_stride
        self.num_recurrent_layers = num_recurrent_layers
        self.stem = nn.Sequential(
            nn.Conv2d(3, hidden_chs, 7, stride=stem_stride, padding=3),
            nn.LayerNorm(hidden_chs, eps=1e-6))
        self.rec_stage = Next1dStage(
            hidden_chs, hidden_chs, stride=2, depth=depth,
            mlp_ratio=mlp_ratio, fuse_next1d_weights=fuse_next1d_weights)
        self.out_layer = nn.Conv2d(hidden_chs, out_chs, 1)

    def __call__(self, params, x, **kw):
        pyramid = []
        stride = 1
        n_iters = self.num_recurrent_layers + 2 - int(
            np.log2(self.stem_stride))
        for i in range(n_iters):
            if i == 0:
                x = self.stem(params["stem"], x)
                stride *= self.stem_stride
            else:
                x = self.rec_stage(params["rec_stage"], x)
                stride *= 2
            if stride >= self.max_pyr_range[0]:
                pyramid.append(x)
        # the reference reverses the pyramid while applying out_layer
        # (next1d_encoder.py:97-99) → coarsest level first
        return [self.out_layer(params["out_layer"], f)
                for f in pyramid[::-1]]
