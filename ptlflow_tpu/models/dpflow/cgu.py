"""Cross-Gated Unit blocks for DPFlow
(reference: ptlflow/models/dpflow/cgu.py:33-412, conv.py:212-250).

All blocks are NHWC; norms are the affine-free group/layer norms shared with
RPKNet (channel-sliceable is unnecessary here — DPFlow convs are dense).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import nn
from ...nn import Module
from ..rpknet.pkconv_slk import group_norm, layer_norm2d  # noqa: F401


class DWConv(Module):
    def __init__(self, dim, kernel_size=3):
        super().__init__()
        self.dwconv = nn.Conv2d(dim, dim, kernel_size, 1, kernel_size // 2,
                                bias=True, groups=dim)

    def __call__(self, params, x, **kw):
        return self.dwconv(params["dwconv"], x)


class ActGLU(Module):
    """Gated-linear MLP (reference cgu.py:45-124); act = exact-erf GELU."""

    def __init__(self, in_features, hidden_features, mlp_use_dw_conv=True,
                 mlp_dw_kernel_size=3, mlp_in_kernel_size=1,
                 mlp_out_kernel_size=1):
        super().__init__()
        self.fc1_g = nn.Conv2d(in_features, hidden_features,
                               mlp_in_kernel_size,
                               padding=mlp_in_kernel_size // 2)
        self.fc1_x = nn.Conv2d(in_features, hidden_features,
                               mlp_in_kernel_size,
                               padding=mlp_in_kernel_size // 2)
        self.dwconv_g = self.dwconv_x = None
        if mlp_use_dw_conv:
            self.dwconv_g = DWConv(hidden_features, mlp_dw_kernel_size)
            self.dwconv_x = DWConv(hidden_features, mlp_dw_kernel_size)
        self.fc2 = nn.Conv2d(hidden_features, in_features,
                             mlp_out_kernel_size,
                             padding=mlp_out_kernel_size // 2)

    def __call__(self, params, x, **kw):
        x_gate = self.fc1_g(params["fc1_g"], x)
        x = self.fc1_x(params["fc1_x"], x)
        if self.dwconv_g is not None:
            x_gate = self.dwconv_g(params["dwconv_g"], x_gate)
            x = self.dwconv_x(params["dwconv_x"], x)
        return self.fc2(params["fc2"], nn.gelu(x_gate) * x)


class CrossActGLU(Module):
    """Cross-gated MLP (reference cgu.py:127-210)."""

    def __init__(self, in_features, hidden_features, mlp_use_dw_conv=True,
                 mlp_dw_kernel_size=3, mlp_in_kernel_size=1,
                 mlp_out_kernel_size=1):
        super().__init__()
        self.merge_fc_g = nn.Conv2d(2 * in_features, in_features, 1)
        self.fc1_g = nn.Conv2d(in_features, hidden_features,
                               mlp_in_kernel_size,
                               padding=mlp_in_kernel_size // 2)
        self.fc1_y = nn.Conv2d(in_features, hidden_features,
                               mlp_in_kernel_size,
                               padding=mlp_in_kernel_size // 2)
        self.dwconv_g = self.dwconv_y = None
        if mlp_use_dw_conv:
            self.dwconv_g = DWConv(hidden_features, mlp_dw_kernel_size)
            self.dwconv_y = DWConv(hidden_features, mlp_dw_kernel_size)
        self.fc2 = nn.Conv2d(hidden_features, in_features,
                             mlp_out_kernel_size,
                             padding=mlp_out_kernel_size // 2)

    def __call__(self, params, x, y, **kw):
        xy = self.merge_fc_g(params["merge_fc_g"],
                             jnp.concatenate([x, y], axis=-1))
        xy_gate = self.fc1_g(params["fc1_g"], xy)
        y = self.fc1_y(params["fc1_y"], y)
        if self.dwconv_g is not None:
            xy_gate = self.dwconv_g(params["dwconv_g"], xy_gate)
            y = self.dwconv_y(params["dwconv_y"], y)
        return self.fc2(params["fc2"], nn.gelu(xy_gate) * y)


class LayerTransition(Module):
    """Strided patch embed (reference cgu.py:213-248)."""

    def __init__(self, patch_size, stride, in_chans, embed_dim):
        super().__init__()
        self.proj = nn.Conv2d(in_chans, embed_dim, patch_size, stride=stride,
                              padding=patch_size // 2)

    def __call__(self, params, x, **kw):
        return self.proj(params["proj"], x)


class CGU(Module):
    """Cross-gated unit block (reference cgu.py:251-348)."""

    def __init__(self, dim, norm=group_norm, use_cross=False, mlp_ratio=4,
                 mlp_use_dw_conv=True, mlp_dw_kernel_size=7,
                 mlp_in_kernel_size=1, mlp_out_kernel_size=1,
                 layer_scale_init_value=1e-2):
        super().__init__()
        self.dim = dim
        self.use_cross = use_cross
        self.norm_fn = norm
        self.layer_scale_init_value = layer_scale_init_value
        kw = dict(mlp_use_dw_conv=mlp_use_dw_conv,
                  mlp_dw_kernel_size=mlp_dw_kernel_size,
                  mlp_in_kernel_size=mlp_in_kernel_size,
                  mlp_out_kernel_size=mlp_out_kernel_size)
        hidden = int(dim * mlp_ratio)
        self.conv_self = ActGLU(dim, hidden, **kw)
        if use_cross:
            self.conv_cross = CrossActGLU(dim, hidden, **kw)

    def init(self, key):
        params = super().init(key)
        if self.layer_scale_init_value >= 1e-4:
            params["layer_scale"] = self.layer_scale_init_value * jnp.ones(
                (self.dim,))
        return params

    def _torch_leaves(self):
        if self.layer_scale_init_value >= 1e-4:
            return {"layer_scale": lambda g: g}
        return {}

    def _scale(self, params, x):
        if self.layer_scale_init_value < 1e-4:
            return x
        return x * params["layer_scale"][:x.shape[-1]]

    def __call__(self, params, x, y=None, **kw):
        if self.use_cross:
            x_short, y_short = x, y
            x = self.conv_self(params["conv_self"], self.norm_fn(x))
            y = self.conv_self(params["conv_self"], self.norm_fn(y))
            # the second cross call uses the UPDATED x (cgu.py:330-340)
            x = x_short + self._scale(
                params, self.conv_cross(params["conv_cross"], x, y))
            y = y_short + self._scale(
                params, self.conv_cross(params["conv_cross"], y, x))
        else:
            x = x + self._scale(
                params, self.conv_self(params["conv_self"],
                                       self.norm_fn(x)))
        return x, y


class CGUStage(Module):
    """Transition + N CGU blocks + norm (reference cgu.py:351-412)."""

    def __init__(self, in_chs, out_chs, stride=2, norm=group_norm, depth=2,
                 use_cross=False, mlp_ratio=4, mlp_use_dw_conv=True,
                 mlp_dw_kernel_size=7, mlp_in_kernel_size=1,
                 mlp_out_kernel_size=1, layer_scale_init_value=1e-2):
        super().__init__()
        self.use_cross = use_cross
        self.norm_fn = norm
        self.conv_transition = None
        if stride > 1 or in_chs != out_chs:
            self.conv_transition = LayerTransition(
                3 if stride > 1 else 1, stride, in_chs, out_chs)
        self.blocks = nn.ModuleList([
            CGU(out_chs, norm=norm, use_cross=use_cross, mlp_ratio=mlp_ratio,
                mlp_use_dw_conv=mlp_use_dw_conv,
                mlp_dw_kernel_size=mlp_dw_kernel_size,
                mlp_in_kernel_size=mlp_in_kernel_size,
                mlp_out_kernel_size=mlp_out_kernel_size,
                layer_scale_init_value=layer_scale_init_value)
            for _ in range(depth)])

    def __call__(self, params, x, y=None, **kw):
        if self.conv_transition is not None:
            x = self.conv_transition(params["conv_transition"], x)
            if self.use_cross:
                y = self.conv_transition(params["conv_transition"], y)
        for i, blk in enumerate(self.blocks):
            x, y = blk(params["blocks"][str(i)], x, y)
        x = self.norm_fn(x)
        if self.use_cross:
            return x, self.norm_fn(y)
        return x
