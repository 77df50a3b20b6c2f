"""ReCoVEr / FlowAnything parity tests (torchvision stubbed with faithful
mobilenetv3/convnext block replicas)."""

import importlib.util
import sys
import types
from functools import partial

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.recover.backbones import (ConvNeXtExtractor,
                                                  MobileNetV3Extractor)

REF = "/root/reference/ptlflow/models/recover"


def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _install_torchvision_stub():
    if hasattr(getattr(sys.modules.get("torchvision"), "models", None),
               "mobilenetv3"):
        return

    class Conv2dNormActivation(torch.nn.Sequential):
        def __init__(self, in_ch, out_ch, kernel_size=3, stride=1,
                     padding=None, groups=1, norm_layer=torch.nn.BatchNorm2d,
                     activation_layer=torch.nn.ReLU, dilation=1, bias=None):
            if padding is None:
                padding = (kernel_size - 1) // 2 * dilation
            if bias is None:
                bias = norm_layer is None
            layers = [torch.nn.Conv2d(in_ch, out_ch, kernel_size, stride,
                                      padding, dilation=dilation,
                                      groups=groups, bias=bias)]
            if norm_layer is not None:
                layers.append(norm_layer(out_ch))
            if activation_layer is not None:
                layers.append(activation_layer(inplace=True))
            super().__init__(*layers)

    class SqueezeExcitation(torch.nn.Module):
        def __init__(self, input_ch, squeeze_ch):
            super().__init__()
            self.avgpool = torch.nn.AdaptiveAvgPool2d(1)
            self.fc1 = torch.nn.Conv2d(input_ch, squeeze_ch, 1)
            self.fc2 = torch.nn.Conv2d(squeeze_ch, input_ch, 1)
            self.activation = torch.nn.ReLU()
            self.scale_activation = torch.nn.Hardsigmoid()

        def forward(self, x):
            s = self.avgpool(x)
            s = self.activation(self.fc1(s))
            s = self.scale_activation(self.fc2(s))
            return x * s

    class InvertedResidualConfig:
        def __init__(self, input_channels, kernel, expanded_channels,
                     out_channels, use_se, activation, stride, dilation,
                     width_mult=1.0):
            self.input_channels = input_channels
            self.kernel = kernel
            self.expanded_channels = expanded_channels
            self.out_channels = out_channels
            self.use_se = use_se
            self.use_hs = activation == "HS"
            self.stride = stride
            self.dilation = dilation

    class InvertedResidual(torch.nn.Module):
        def __init__(self, cnf, norm_layer):
            super().__init__()
            self.use_res_connect = (cnf.stride == 1 and
                                    cnf.input_channels == cnf.out_channels)
            layers = []
            act = torch.nn.Hardswish if cnf.use_hs else torch.nn.ReLU
            if cnf.expanded_channels != cnf.input_channels:
                layers.append(Conv2dNormActivation(
                    cnf.input_channels, cnf.expanded_channels, 1,
                    norm_layer=norm_layer, activation_layer=act))
            layers.append(Conv2dNormActivation(
                cnf.expanded_channels, cnf.expanded_channels, cnf.kernel,
                cnf.stride, groups=cnf.expanded_channels,
                norm_layer=norm_layer, activation_layer=act,
                dilation=cnf.dilation))
            if cnf.use_se:
                layers.append(SqueezeExcitation(
                    cnf.expanded_channels,
                    _make_divisible(cnf.expanded_channels // 4, 8)))
            layers.append(Conv2dNormActivation(
                cnf.expanded_channels, cnf.out_channels, 1,
                norm_layer=norm_layer, activation_layer=None))
            self.block = torch.nn.Sequential(*layers)

        def forward(self, x):
            y = self.block(x)
            return x + y if self.use_res_connect else y

    class Permute(torch.nn.Module):
        def __init__(self, dims):
            super().__init__()
            self.dims = dims

        def forward(self, x):
            return x.permute(self.dims)

    class LayerNorm2d(torch.nn.LayerNorm):
        def forward(self, x):
            x = x.permute(0, 2, 3, 1)
            x = torch.nn.functional.layer_norm(
                x, self.normalized_shape, self.weight, self.bias, self.eps)
            return x.permute(0, 3, 1, 2)

    class CNBlock(torch.nn.Module):
        def __init__(self, dim, layer_scale, sd_prob=0.0):
            super().__init__()
            self.block = torch.nn.Sequential(
                torch.nn.Conv2d(dim, dim, 7, padding=3, groups=dim,
                                bias=True),
                Permute([0, 2, 3, 1]),
                torch.nn.LayerNorm(dim, eps=1e-6),
                torch.nn.Linear(dim, 4 * dim),
                torch.nn.GELU(),
                torch.nn.Linear(4 * dim, dim),
                Permute([0, 3, 1, 2]))
            self.layer_scale = torch.nn.Parameter(
                torch.ones(dim, 1, 1) * layer_scale)

        def forward(self, x):
            return x + self.layer_scale * self.block(x)

    class CNBlockConfig:
        def __init__(self, input_channels, out_channels, num_layers):
            self.input_channels = input_channels
            self.out_channels = out_channels
            self.num_layers = num_layers

    tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
    tvm = getattr(tv, "models", None) or types.ModuleType(
        "torchvision.models")
    mb = types.ModuleType("torchvision.models.mobilenetv3")
    mb.InvertedResidualConfig = InvertedResidualConfig
    mb.InvertedResidual = InvertedResidual
    mb.Conv2dNormActivation = Conv2dNormActivation
    cx = types.ModuleType("torchvision.models.convnext")
    cx.CNBlockConfig = CNBlockConfig
    cx.LayerNorm2d = LayerNorm2d
    cx.CNBlock = CNBlock
    cx.Conv2dNormActivation = Conv2dNormActivation
    for name in ["MobileNet_V3_Small_Weights", "MobileNet_V3_Large_Weights",
                 "mobilenet_v3_small", "mobilenet_v3_large",
                 "ConvNeXt_Tiny_Weights", "ConvNeXt_Small_Weights",
                 "convnext_tiny", "convnext_small", "ConvNeXt_Large_Weights",
                 "convnext_large"]:
        setattr(tvm, name, None)
    tvm.mobilenetv3 = mb
    tvm.convnext = cx
    tv.models = tvm
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tvm
    sys.modules["torchvision.models.mobilenetv3"] = mb
    sys.modules["torchvision.models.convnext"] = cx


@pytest.fixture(scope="module")
def ref():
    _install_torchvision_stub()
    pkg = types.ModuleType("refrec")
    pkg.__path__ = [REF]
    sys.modules["refrec"] = pkg
    mods = {}
    for name in ["mobilenet", "convnext"]:
        spec = importlib.util.spec_from_file_location(
            f"refrec.{name}", f"{REF}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refrec.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def test_mobilenet_extractor_parity(ref):
    torch.manual_seed(0)
    t_e = ref["mobilenet"].MobileNetV3Extractor(
        size="l", input_dim=6, output_dim=64, pretrain=False).eval()
    j_e = MobileNetV3Extractor(size="l", input_dim=6, output_dim=64)
    params = j_e.from_torch(_sd(t_e))
    rng = np.random.RandomState(0)
    x = rng.randn(1, 6, 64, 96).astype(np.float32)
    with torch.no_grad():
        refv = to_nhwc(t_e(torch.from_numpy(x)))
    out = j_e(params, nhwc(x))
    np.testing.assert_allclose(np.asarray(out), refv, atol=1e-3)


def test_convnext_extractor_parity(ref):
    torch.manual_seed(1)
    t_e = ref["convnext"].ConvNeXt_Extractor(
        size="t", input_dim=6, output_dim=64, pretrain=False).eval()
    j_e = ConvNeXtExtractor(size="t", input_dim=6, output_dim=64)
    params = j_e.from_torch(_sd(t_e))
    rng = np.random.RandomState(1)
    x = rng.randn(1, 6, 64, 96).astype(np.float32)
    with torch.no_grad():
        refv = to_nhwc(t_e(torch.from_numpy(x)))
    out = j_e(params, nhwc(x))
    np.testing.assert_allclose(np.asarray(out), refv, atol=1e-3)


@pytest.mark.parametrize("name", ["recover_mn", "recover_cx",
                                  "flow_anything"])
def test_recover_training_and_loss(name):
    model = ptlflow_tpu.get_model(name, args={"iters": 1})
    model.init_params()
    rng = np.random.RandomState(5)
    b, h, w = 1, 64, 64
    inputs = {
        "images": jnp.asarray(rng.rand(b, 2, 3, h, w).astype(np.float32)),
        "flows": jnp.asarray(rng.randn(b, 1, 2, h, w).astype(np.float32)),
        "valids": jnp.ones((b, 1, 1, h, w), jnp.float32),
    }
    out = model.forward(model.params, inputs, training=True)
    assert out["flow_preds"].shape[0] == 2
    assert np.isfinite(float(model.loss_fn(out, inputs)))


def test_recover_is_trainable_and_trains():
    """recover_cx/mn/rn are @trainable in the reference
    (recover.py:300-323); run a 2-step descent smoke on the smallest
    backbone to prove the Laplace loss differentiates end-to-end."""
    trainable = set(ptlflow_tpu.get_trainable_model_names())
    assert {"recover_cx", "recover_mn", "recover_rn"} <= trainable

    from ptlflow_tpu.parallel.train import (build_train_step,
                                            create_train_state,
                                            make_optimizer)

    model = ptlflow_tpu.get_model("recover_mn", args={"iters": 1})
    model.init_params()
    tx = make_optimizer(lr=1e-4)
    state = create_train_state(model, tx)
    step = build_train_step(model, tx)
    rng = np.random.RandomState(7)
    b, h, w = 1, 64, 64
    batch = {
        "images": jnp.asarray(rng.rand(b, 2, 3, h, w).astype(np.float32)),
        "flows": jnp.asarray(rng.randn(b, 1, 2, h, w).astype(np.float32)),
        "valids": jnp.ones((b, 1, 1, h, w), jnp.float32),
    }
    losses = []
    for _ in range(2):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses), losses
