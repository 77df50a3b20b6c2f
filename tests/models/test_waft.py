"""WAFT parity tests vs reference torch modules (timm/cv2 stubbed)."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.waft.backbones import (RefineViT, ResNet18DeconvA1,
                                               ResNet18DeconvA2,
                                               DepthAnythingFeatureA1,
                                               DepthAnythingFeatureA2)
from ptlflow_tpu.models.waft.dpt import DPTHeadLvl

REF = "/root/reference/ptlflow/models/waft"
DAV2 = f"{REF}/thirdparty/DepthAnythingV2/depth_anything_v2"


def _install_stubs():
    # ---- cv2 (imported by thirdparty dpt/transform, unused in tests)
    if "cv2" not in sys.modules:
        cv2 = types.ModuleType("cv2")
        for name in ["INTER_CUBIC", "INTER_AREA", "COLOR_BGR2RGB"]:
            setattr(cv2, name, 0)
        sys.modules["cv2"] = cv2
    # ---- torchvision.transforms Compose/Normalize
    tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
    if not hasattr(getattr(tv, "transforms", None), "Compose"):
        tr = getattr(tv, "transforms", None) or types.ModuleType(
            "torchvision.transforms")
        tr.Compose = lambda fns: fns
        tr.Normalize = lambda *a, **k: (lambda x: x)
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr

    # ---- timm: ViT blocks + resnet18 layers
    if getattr(sys.modules.get("timm"), "_waft_stub", False):
        return

    class TimmAttention(torch.nn.Module):
        def __init__(self, dim, num_heads):
            super().__init__()
            self.num_heads = num_heads
            self.scale = (dim // num_heads) ** -0.5
            self.qkv = torch.nn.Linear(dim, dim * 3, bias=True)
            self.proj = torch.nn.Linear(dim, dim)

        def forward(self, x):
            b, n, c = x.shape
            h = self.num_heads
            qkv = self.qkv(x).reshape(b, n, 3, h, c // h).permute(
                2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q * self.scale) @ k.transpose(-2, -1)
            attn = attn.softmax(dim=-1)
            x = (attn @ v).transpose(1, 2).reshape(b, n, c)
            return self.proj(x)

    class TimmMlp(torch.nn.Module):
        def __init__(self, dim, hidden):
            super().__init__()
            self.fc1 = torch.nn.Linear(dim, hidden)
            self.act = torch.nn.GELU()
            self.fc2 = torch.nn.Linear(hidden, dim)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    class TimmBlock(torch.nn.Module):
        def __init__(self, dim, num_heads):
            super().__init__()
            self.norm1 = torch.nn.LayerNorm(dim, eps=1e-6)
            self.attn = TimmAttention(dim, num_heads)
            self.norm2 = torch.nn.LayerNorm(dim, eps=1e-6)
            self.mlp = TimmMlp(dim, dim * 4)

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.mlp(self.norm2(x))

    class TimmViT(torch.nn.Module):
        def __init__(self, dim, depth, heads):
            super().__init__()
            self.embed_dim = dim
            self.blocks = torch.nn.ModuleList(
                [TimmBlock(dim, heads) for _ in range(depth)])

    class TVBasic(torch.nn.Module):
        def __init__(self, inp, out, stride=1):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(inp, out, 3, stride, 1, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(out)
            self.conv2 = torch.nn.Conv2d(out, out, 3, 1, 1, bias=False)
            self.bn2 = torch.nn.BatchNorm2d(out)
            if stride != 1 or inp != out:
                self.downsample = torch.nn.Sequential(
                    torch.nn.Conv2d(inp, out, 1, stride, bias=False),
                    torch.nn.BatchNorm2d(out))
            else:
                self.downsample = None

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + idt)

    class TimmResNet18(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.layer1 = torch.nn.Sequential(TVBasic(64, 64),
                                              TVBasic(64, 64))
            self.layer2 = torch.nn.Sequential(TVBasic(64, 128, 2),
                                              TVBasic(128, 128))
            self.layer3 = torch.nn.Sequential(TVBasic(128, 256, 2),
                                              TVBasic(256, 256))
            self.layer4 = torch.nn.Sequential(TVBasic(256, 512, 2),
                                              TVBasic(512, 512))

    vit_cfgs = {
        "vit_small_patch16_224": (384, 12, 6),
        "vit_base_patch16_224": (768, 12, 12),
        "vit_tiny_patch16_224": (192, 12, 3),
    }

    def create_model(name, pretrained=False, **kw):
        if name in vit_cfgs:
            return TimmViT(*vit_cfgs[name])
        if name.startswith("resnet18"):
            return TimmResNet18()
        raise ValueError(name)

    timm = sys.modules.get("timm") or types.ModuleType("timm")
    timm.create_model = create_model
    timm._waft_stub = True
    sys.modules["timm"] = timm


@pytest.fixture(scope="module")
def ref():
    _install_stubs()
    mods = {}
    # thirdparty DepthAnythingV2 package
    pkg = types.ModuleType("refdav2")
    pkg.__path__ = [DAV2]
    sys.modules["refdav2"] = pkg
    for name in ["dinov2_layers", "util"]:
        sub = types.ModuleType(f"refdav2.{name}")
        sub.__path__ = [f"{DAV2}/{name}"]
        if name == "dinov2_layers":
            spec = importlib.util.spec_from_file_location(
                "refdav2.dinov2_layers",
                f"{DAV2}/dinov2_layers/__init__.py",
                submodule_search_locations=[f"{DAV2}/dinov2_layers"])
            sub = importlib.util.module_from_spec(spec)
            sys.modules[f"refdav2.{name}"] = sub
            spec.loader.exec_module(sub)
        else:
            sys.modules[f"refdav2.{name}"] = sub
    for name in ["dinov2", "dpt"]:
        spec = importlib.util.spec_from_file_location(
            f"refdav2.{name}", f"{DAV2}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refdav2.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    # waft backbone package
    bpkg = types.ModuleType("refwaftb")
    bpkg.__path__ = [f"{REF}/backbone"]
    sys.modules["refwaftb"] = bpkg
    # its relative "..thirdparty..." imports resolve through a parent pkg
    parent = types.ModuleType("refwaft")
    parent.__path__ = [REF]
    sys.modules["refwaft"] = parent
    tp = types.ModuleType("refwaft.thirdparty")
    tp.__path__ = [f"{REF}/thirdparty"]
    sys.modules["refwaft.thirdparty"] = tp
    da = types.ModuleType("refwaft.thirdparty.DepthAnythingV2")
    da.__path__ = [f"{REF}/thirdparty/DepthAnythingV2"]
    sys.modules["refwaft.thirdparty.DepthAnythingV2"] = da
    dav = types.ModuleType(
        "refwaft.thirdparty.DepthAnythingV2.depth_anything_v2")
    dav.__path__ = [DAV2]
    dav.dpt = mods["dpt"]
    dav.dinov2 = mods["dinov2"]
    sys.modules[
        "refwaft.thirdparty.DepthAnythingV2.depth_anything_v2"] = dav
    sys.modules[
        "refwaft.thirdparty.DepthAnythingV2.depth_anything_v2.dpt"] = \
        mods["dpt"]
    bmods = {}
    for name in ["patch_embed", "head", "waft_a1_dav2", "waft_a2_dav2",
                 "vit"]:
        spec = importlib.util.spec_from_file_location(
            f"refwaft.backbone.{name}", f"{REF}/backbone/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        # rewrite package so relative imports (., ..) resolve
        mod.__package__ = "refwaft.backbone"
        sys.modules[f"refwaft.backbone.{name}"] = mod
        spec.loader.exec_module(mod)
        bmods[name] = mod
    bpkg2 = types.ModuleType("refwaft.backbone")
    bpkg2.__path__ = [f"{REF}/backbone"]
    sys.modules["refwaft.backbone"] = bpkg2
    mods.update(bmods)
    return mods


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def test_da_feature_a1_parity(ref):
    torch.manual_seed(0)
    t_m = ref["waft_a1_dav2"].DepthAnythingFeature(encoder="vits").eval()
    j_m = DepthAnythingFeatureA1("vits")
    params = j_m.from_torch(_sd(t_m))
    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 112, 140).astype(np.float32)
    with torch.no_grad():
        refv = t_m(torch.from_numpy(x))
    out = j_m(params, nhwc(x))
    for key in ["out", "path_1", "path_2", "path_3", "path_4"]:
        np.testing.assert_allclose(np.asarray(out[key]), to_nhwc(refv[key]),
                                   atol=5e-3, err_msg=key)


def test_da_feature_a2_parity(ref):
    torch.manual_seed(1)
    t_m = ref["waft_a2_dav2"].DepthAnythingFeature(
        model_name="vits", pretrained=False, lvl=-3).eval()
    j_m = DepthAnythingFeatureA2("vits", lvl=-3)
    params = j_m.from_torch(_sd(t_m))
    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, 112, 112).astype(np.float32)
    with torch.no_grad():
        refv = t_m(torch.from_numpy(x))
    out = j_m(params, nhwc(x))
    np.testing.assert_allclose(np.asarray(out), to_nhwc(refv), atol=5e-3)


def test_refine_vit_parity(ref):
    torch.manual_seed(2)
    t_m = ref["vit"].VisionTransformer("vits", 64, patch_size=8).eval()
    with torch.no_grad():
        t_m.pos_embed.normal_(std=0.02)
    j_m = RefineViT("vits", 64, patch_size=8)
    params = j_m.from_torch(_sd(t_m))
    rng = np.random.RandomState(2)
    # non-square to exercise the bicubic pos-embed path
    x = rng.randn(1, 64, 56, 72).astype(np.float32)
    with torch.no_grad():
        refv = t_m(torch.from_numpy(x))
    out = j_m(params, nhwc(x))
    np.testing.assert_allclose(np.asarray(out["out"]), to_nhwc(refv["out"]),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(out["path_2"]),
                               to_nhwc(refv["path_2"]), atol=5e-3)


def test_resnet18_deconv_parity(ref):
    import importlib.util as iu
    torch.manual_seed(3)
    # waft_a1.ResNet18Deconv needs the timm stub (already installed)
    spec = iu.spec_from_file_location("refwaft.waft_a1", f"{REF}/waft_a1.py")
    # importing the full model file pulls ptlflow; instead rebuild the two
    # small torch modules inline from their definitions
    class resconv(torch.nn.Module):
        def __init__(self, inp, oup, k=3, s=1):
            super().__init__()
            self.conv = torch.nn.Sequential(
                torch.nn.GELU(),
                torch.nn.Conv2d(inp, oup, k, s, k // 2),
                torch.nn.GELU(),
                torch.nn.Conv2d(oup, oup, 3, 1, 1))
            if inp != oup or s != 1:
                self.skip_conv = torch.nn.Conv2d(inp, oup, 1, s, 0)
            else:
                self.skip_conv = torch.nn.Identity()

        def forward(self, x):
            return self.conv(x) + self.skip_conv(x)

    import timm

    class TorchR18DeconvA1(torch.nn.Module):
        def __init__(self, inp, oup):
            super().__init__()
            self.ds1 = resconv(inp, 64, k=7, s=2)
            r18 = lambda: timm.create_model("resnet18.a3_in1k",
                                            features_only=True)
            self.conv1 = r18().layer1
            self.conv2 = r18().layer2
            self.conv3 = r18().layer3
            self.conv4 = r18().layer4
            self.up_4 = torch.nn.ConvTranspose2d(512, 256, 2, 2)
            self.proj_3 = resconv(256, 256)
            self.up_3 = torch.nn.ConvTranspose2d(256, 128, 2, 2)
            self.proj_2 = resconv(128, 128)
            self.up_2 = torch.nn.ConvTranspose2d(128, 64, 2, 2)
            self.proj_1 = resconv(64, oup)

        def forward(self, x):
            o1 = self.conv1(self.ds1(x))
            o2 = self.conv2(o1)
            o3 = self.conv3(o2)
            o4 = self.conv4(o3)
            o3 = self.proj_3(o3 + self.up_4(o4))
            o2 = self.proj_2(o2 + self.up_3(o3))
            o1 = self.proj_1(o1 + self.up_2(o2))
            return [o1, o2, o3, o4]

    t_m = TorchR18DeconvA1(35, 64).eval()
    j_m = ResNet18DeconvA1(35, 64)
    params = j_m.from_torch(_sd(t_m))
    rng = np.random.RandomState(3)
    x = rng.randn(1, 35, 64, 96).astype(np.float32)
    with torch.no_grad():
        refv = t_m(torch.from_numpy(x))
    out = j_m(params, nhwc(x))
    for lvl in range(4):
        np.testing.assert_allclose(np.asarray(out[lvl]), to_nhwc(refv[lvl]),
                                   atol=1e-3, err_msg=f"level {lvl}")


def test_dpt_head_lvl_parity(ref):
    torch.manual_seed(4)
    t_h = ref["head"].DPTHead(384, features=64,
                              out_channels=[48, 96, 192, 384],
                              lvl=-3).eval()
    j_h = DPTHeadLvl(384, features=64, out_channels=(48, 96, 192, 384),
                     lvl=-3)
    params = j_h.from_torch(_sd(t_h))
    rng = np.random.RandomState(4)
    ph, pw = 4, 6
    feats_t = []
    feats_j = []
    for _ in range(4):
        tok = rng.randn(1, ph * pw, 384).astype(np.float32)
        cls = rng.randn(1, 384).astype(np.float32)
        feats_t.append((torch.from_numpy(tok), torch.from_numpy(cls)))
        feats_j.append((jnp.asarray(tok), jnp.asarray(cls)))
    with torch.no_grad():
        refv = t_h(feats_t, ph, pw)
    out = j_h(params, feats_j, ph, pw)
    for lvl in range(4):
        np.testing.assert_allclose(np.asarray(out[lvl]), to_nhwc(refv[lvl]),
                                   atol=1e-4, err_msg=f"level {lvl}")


@pytest.mark.parametrize("name", ["waft_dav2_a1", "waft_dav2_a2",
                                  "waft_twins_a2"])
def test_waft_forward_and_loss(name):
    model = ptlflow_tpu.get_model(name, args={"iters": 1})
    model.init_params()
    rng = np.random.RandomState(5)
    b, h, w = 1, 64, 96
    inputs = {
        "images": jnp.asarray(rng.rand(b, 2, 3, h, w).astype(np.float32)),
        "flows": jnp.asarray(rng.randn(b, 1, 2, h, w).astype(np.float32)),
        "valids": jnp.ones((b, 1, 1, h, w), jnp.float32),
    }
    out = model.forward(model.params, inputs)
    assert out["flows"].shape == (b, 1, 2, h, w)
    assert np.isfinite(np.asarray(out["flows"])).all()
    outt = model.forward(model.params, inputs, training=True)
    assert outt["nf_preds"].shape[0] == 1
    assert np.isfinite(float(model.loss_fn(outt, inputs)))


def test_waft_frozen_prefixes_excluded():
    from ptlflow_tpu.nn import count_parameters, split_trainable
    model = ptlflow_tpu.get_model("waft_dav2_a1", args={"iters": 1})
    model.init_params()
    tr, _ = split_trainable(model.params, model.frozen_prefixes)
    assert "da_feature" not in tr
    full, _ = split_trainable(model.params)
    assert count_parameters(full) > count_parameters(tr)
