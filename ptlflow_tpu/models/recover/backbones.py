"""MobileNetV3 / ConvNeXt extractors for ReCoVEr
(reference: ptlflow/models/recover/mobilenet.py:19-146, convnext.py:22-160;
both reproduce torchvision layouts, so parameter names follow
torchvision.models.{mobilenetv3,convnext}).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from ... import nn
from ...nn import Module


def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hardswish(x):
    return x * jax.nn.relu6(x + 3.0) / 6.0


def hardsigmoid(x):
    return jax.nn.relu6(x + 3.0) / 6.0


class ConvNormAct(Module):
    """torchvision Conv2dNormActivation: children "0" conv, "1" norm."""

    def __init__(self, in_ch, out_ch, kernel_size, stride=1, groups=1,
                 act="hs", bn_eps=1e-3, padding=None, bias=False,
                 norm="bn"):
        super().__init__()
        if padding is None:
            padding = (kernel_size - 1) // 2
        conv = nn.Conv2d(in_ch, out_ch, kernel_size, stride=stride,
                         padding=padding, groups=groups, bias=bias)
        if norm == "bn":
            normm = nn.BatchNorm2d(out_ch, eps=bn_eps, momentum=0.01)
        else:
            normm = nn.LayerNorm(out_ch, eps=1e-6)
        setattr(self, "0", conv)
        setattr(self, "1", normm)
        self.act = act

    def __call__(self, params, x, **kw):
        x = getattr(self, "0")(params["0"], x)
        x = getattr(self, "1")(params["1"], x, **kw)
        if self.act == "hs":
            x = hardswish(x)
        elif self.act == "re":
            x = nn.relu(x)
        return x


class SqueezeExcitation(Module):
    """torchvision SE block (fc1/fc2 1x1 convs, ReLU + Hardsigmoid)."""

    def __init__(self, input_ch, squeeze_ch):
        super().__init__()
        self.fc1 = nn.Conv2d(input_ch, squeeze_ch, 1)
        self.fc2 = nn.Conv2d(squeeze_ch, input_ch, 1)

    def __call__(self, params, x, **kw):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.relu(self.fc1(params["fc1"], s))
        s = hardsigmoid(self.fc2(params["fc2"], s))
        return x * s


class InvertedResidual(Module):
    """torchvision mobilenetv3 InvertedResidual; child "block" Sequential."""

    def __init__(self, inp, kernel, expanded, out, use_se, act, stride):
        super().__init__()
        self.use_res = stride == 1 and inp == out
        layers = []
        a = "hs" if act == "HS" else "re"
        if expanded != inp:
            layers.append(ConvNormAct(inp, expanded, 1, act=a))
        layers.append(ConvNormAct(expanded, expanded, kernel, stride=stride,
                                  groups=expanded, act=a))
        if use_se:
            layers.append(SqueezeExcitation(
                expanded, _make_divisible(expanded // 4, 8)))
        layers.append(ConvNormAct(expanded, out, 1, act=None))
        self.block = nn.Sequential(*layers)

    def __call__(self, params, x, **kw):
        y = self.block(params["block"], x, **kw)
        return x + y if self.use_res else y


_MNV3_L = [
    # (in, kernel, expanded, out, use_se, act, stride)
    (16, 3, 16, 16, False, "RE", 1),
    (16, 3, 64, 24, False, "RE", 2),
    (24, 3, 72, 24, False, "RE", 1),
    (24, 5, 72, 40, True, "RE", 2),
    (40, 5, 120, 40, True, "RE", 1),
    (40, 5, 120, 40, True, "RE", 1),
    (40, 3, 240, 80, False, "HS", 1),
    (80, 3, 200, 80, False, "HS", 1),
    (80, 3, 184, 80, False, "HS", 1),
    (80, 3, 184, 80, False, "HS", 1),
    (80, 3, 480, 112, True, "HS", 1),
    (112, 3, 672, 112, True, "HS", 1),
    (112, 5, 672, 160, True, "HS", 1),
    (160, 5, 960, 160, True, "HS", 1),
    (160, 5, 960, 160, True, "HS", 1),
]


class MobileNetV3Extractor(Module):
    """mobilenet.py:19-146 (size='l', stride 8 overall)."""

    def __init__(self, size="l", input_dim=3, output_dim=256):
        super().__init__()
        assert size == "l"
        layers: List[Module] = [
            ConvNormAct(input_dim, 16, 3, stride=2, act="hs")]
        for cfg in _MNV3_L:
            layers.append(InvertedResidual(*cfg))
        layers.append(ConvNormAct(160, 960, 1, act="hs"))
        self.features = nn.Sequential(*layers)
        self.final = nn.Conv2d(960, output_dim, 1)

    def __call__(self, params, x, **kw):
        return self.final(params["final"],
                          self.features(params["features"], x, **kw))


class CNBlock(Module):
    """torchvision convnext CNBlock; children block.0/.2/.3/.5 +
    layer_scale param of shape (dim, 1, 1) (kept as (dim,) here)."""

    def __init__(self, dim, layer_scale=1e-6):
        super().__init__()
        self.dim = dim
        self.layer_scale_init = layer_scale
        self.conv = nn.Conv2d(dim, dim, 7, padding=3, groups=dim, bias=True)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.fc1 = nn.Linear(dim, 4 * dim)
        self.fc2 = nn.Linear(4 * dim, dim)

    def init(self, key):
        params = super().init(key)
        params["layer_scale"] = self.layer_scale_init * jnp.ones(
            (self.dim,))
        return params

    def _torch_leaves(self):
        return {"layer_scale": lambda g: g.reshape(-1)}

    def from_torch(self, flat, strict=True, _path=""):
        # torchvision names: block.0 conv, block.2 norm, block.3/5 linears
        remap = {"block.0.": "conv.", "block.2.": "norm.",
                 "block.3.": "fc1.", "block.5.": "fc2."}
        out = {}
        for k, v in flat.items():
            for old, new in remap.items():
                if k.startswith(old):
                    k = new + k[len(old):]
                    break
            out[k] = v
        return super().from_torch(out, strict=strict, _path=_path)

    def __call__(self, params, x, **kw):
        y = self.conv(params["conv"], x)
        y = self.norm(params["norm"], y)
        y = self.fc1(params["fc1"], y)
        y = nn.gelu(y)
        y = self.fc2(params["fc2"], y)
        return x + params["layer_scale"].astype(x.dtype) * y


class _LNConvTransition(Module):
    """Sequential(LayerNorm2d, [ZeroPad], Conv k2) with torch names 0/1/2."""

    def __init__(self, in_ch, out_ch, stride):
        super().__init__()
        setattr(self, "0", nn.LayerNorm(in_ch, eps=1e-6))
        self.stride = stride
        conv = nn.Conv2d(in_ch, out_ch, 2, stride=stride, padding=0)
        setattr(self, "2" if stride == 1 else "1", conv)

    def __call__(self, params, x, **kw):
        x = getattr(self, "0")(params["0"], x)
        if self.stride == 1:
            # nn.ZeroPad2d((0, 1, 0, 1)) then conv k2 s1
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return getattr(self, "2")(params["2"], x)
        return getattr(self, "1")(params["1"], x)


class ConvNeXtExtractor(Module):
    """convnext.py:22-160 (size='t', stride 8: stem s4, one s2 transition,
    the rest stride-1 zero-padded k2 transitions)."""

    def __init__(self, size="t", input_dim=3, output_dim=256,
                 layer_scale=1e-6):
        super().__init__()
        assert size == "t"
        setting = [(96, 192, 3), (192, 384, 3), (384, 768, 9),
                   (768, output_dim, 3)]
        layers: List[Module] = [
            ConvNormAct(input_dim, 96, 4, stride=4, padding=0, bias=True,
                        norm="ln", act=None)]
        for i, (in_ch, out_ch, num) in enumerate(setting):
            layers.append(nn.Sequential(
                *[CNBlock(in_ch, layer_scale) for _ in range(num)]))
            layers.append(_LNConvTransition(in_ch, out_ch,
                                            stride=2 if i < 1 else 1))
        self.features = nn.Sequential(*layers)

    def __call__(self, params, x, **kw):
        return self.features(params["features"], x, **kw)
