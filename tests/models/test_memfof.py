"""MEMFOF parity tests vs reference torch modules (torchvision stubbed with
a faithful resnet trunk replica)."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.memfof.memfof import (GMAUpdateBlock,
                                              MemfofAttention,
                                              MemfofCorrBlock, ResNetFPN16x)
from ptlflow_tpu.ops.correlation import coords_grid

REF = "/root/reference/ptlflow/models/memfof"


def _install_torchvision_stub():
    tv_existing = sys.modules.get("torchvision")
    if getattr(getattr(tv_existing, "models", None), "get_model", None):
        return

    class TVBasicBlock(torch.nn.Module):
        def __init__(self, inp, planes, stride=1):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(inp, planes, 3, stride, 1,
                                         bias=False)
            self.bn1 = torch.nn.BatchNorm2d(planes)
            self.relu = torch.nn.ReLU(inplace=True)
            self.conv2 = torch.nn.Conv2d(planes, planes, 3, 1, 1,
                                         bias=False)
            self.bn2 = torch.nn.BatchNorm2d(planes)
            if stride != 1 or inp != planes:
                self.downsample = torch.nn.Sequential(
                    torch.nn.Conv2d(inp, planes, 1, stride, bias=False),
                    torch.nn.BatchNorm2d(planes))
            else:
                self.downsample = None

        def forward(self, x):
            idt = x
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            if self.downsample is not None:
                idt = self.downsample(x)
            return self.relu(y + idt)

    class ResNet(torch.nn.Module):
        def __init__(self, blocks):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(64)
            self.relu = torch.nn.ReLU(inplace=True)
            self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
            dims = (64, 128, 256, 512)
            inp = 64
            for li, (dim, num) in enumerate(zip(dims, blocks)):
                stride = 1 if li == 0 else 2
                layers = [TVBasicBlock(inp, dim, stride)]
                layers += [TVBasicBlock(dim, dim) for _ in range(num - 1)]
                setattr(self, f"layer{li + 1}",
                        torch.nn.Sequential(*layers))
                inp = dim
            self.avgpool = torch.nn.AdaptiveAvgPool2d(1)
            self.fc = torch.nn.Linear(512, 1000)

    tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
    tvm = getattr(tv, "models", None) or \
        types.ModuleType("torchvision.models")
    tvm.get_model = lambda name, weights=None: ResNet(
        {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3)}[name])
    tvm.WeightsEnum = object
    tvm.ResNet34_Weights = types.SimpleNamespace(IMAGENET1K_V1=None)
    tvm.ResNet18_Weights = types.SimpleNamespace(IMAGENET1K_V1=None)
    tv.models = tvm
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tvm


@pytest.fixture(scope="module")
def ref():
    _install_torchvision_stub()
    pkg = types.ModuleType("refmff")
    pkg.__path__ = [REF]
    sys.modules["refmff"] = pkg
    mods = {}
    for name in ["utils", "layer", "gma", "extractor", "corr", "update"]:
        spec = importlib.util.spec_from_file_location(
            f"refmff.{name}", f"{REF}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmff.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def test_extractor_parity(ref):
    torch.manual_seed(0)
    t_e = ref["extractor"].ResNetFPN16x(9, 256, "resnet18", None).eval()
    j_e = ResNetFPN16x(9, 256, "resnet18")
    params = j_e.from_torch(_sd(t_e))
    rng = np.random.RandomState(0)
    x = rng.randn(1, 9, 64, 96).astype(np.float32)
    with torch.no_grad():
        refv = to_nhwc(t_e(torch.from_numpy(x)))
    out = j_e(params, nhwc(x))
    np.testing.assert_allclose(np.asarray(out), refv, atol=1e-3)


def test_corr_block_parity(ref):
    rng = np.random.RandomState(1)
    b, c, h, w = 1, 64, 16, 24
    f1 = rng.randn(b, c, h, w).astype(np.float32)
    f2 = rng.randn(b, c, h, w).astype(np.float32)
    flow = 2 * rng.randn(b, 2, h, w).astype(np.float32)
    t_cb = ref["corr"].CorrBlock(torch.from_numpy(f1), torch.from_numpy(f2),
                                 4, 4)
    ys, xs = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    coords = torch.stack([xs, ys], 0)[None].float() + torch.from_numpy(flow)
    with torch.no_grad():
        refv = t_cb(coords).numpy()
    j_cb = MemfofCorrBlock(nhwc(f1), nhwc(f2), 4, 4)
    out = j_cb(coords_grid(b, h, w) + nhwc(flow))
    np.testing.assert_allclose(np.asarray(out),
                               np.transpose(refv, (0, 2, 3, 1)), atol=1e-4)


def test_attention_and_update_parity(ref):
    torch.manual_seed(2)
    dim = 64
    t_att = ref["gma"].Attention(dim=dim, heads=1, dim_head=dim).eval()
    t_blk = ref["update"].GMAUpdateBlock(2, 4 * 81, hdim=dim,
                                         cdim=dim).eval()
    j_att = MemfofAttention(dim=dim, heads=1, dim_head=dim)
    j_blk = GMAUpdateBlock(2, 4 * 81, hdim=dim, cdim=dim)
    att_params = j_att.from_torch(_sd(t_att))
    blk_params = j_blk.from_torch(_sd(t_blk))
    rng = np.random.RandomState(2)
    b, h, w = 1, 8, 10
    net = rng.randn(b, dim, h, w).astype(np.float32)
    inp = rng.randn(b, dim, h, w).astype(np.float32)
    corr = rng.randn(b, 2 * 4 * 81, h, w).astype(np.float32)
    flow = rng.randn(b, 4, h, w).astype(np.float32)
    with torch.no_grad():
        attention = t_att(torch.from_numpy(inp))
        t_net = t_blk(*(torch.from_numpy(v) for v in (net, inp, corr,
                                                      flow)), attention)
    j_attention = j_att(att_params, nhwc(inp))
    np.testing.assert_allclose(
        np.asarray(j_attention), attention.numpy(), atol=1e-4)
    j_net = j_blk(blk_params, *(nhwc(v) for v in (net, inp, corr, flow)),
                  j_attention)
    np.testing.assert_allclose(np.asarray(j_net), to_nhwc(t_net), atol=1e-4)


def test_memfof_forward_and_loss():
    model = ptlflow_tpu.get_model("memfof", args={"iters": 2, "dim": 128})
    model.init_params()
    rng = np.random.RandomState(5)
    images = rng.rand(1, 3, 3, 128, 160).astype(np.float32)
    out = model({"images": images})
    assert out["flows"].shape == (1, 1, 2, 128, 160)
    assert np.isfinite(np.asarray(out["flows"])).all()
    inputs = {
        "images": jnp.asarray(images),
        "flows": jnp.asarray(rng.randn(1, 1, 2, 128, 160).astype(
            np.float32)),
        "valids": jnp.ones((1, 1, 1, 128, 160), jnp.float32),
    }
    outt = model.forward(model.params, inputs, training=True)
    assert len(outt["flow_preds"]) == 3
    assert np.isfinite(float(model.loss_fn(outt, inputs)))
