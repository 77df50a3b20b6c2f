"""CCMR parity tests vs reference torch modules (timm stubbed)."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.ccmr.ccmr import (CCMREncoder, CCMRUpdateBlock,
                                          XCiT)


REF = "/root/reference/ptlflow/models/ccmr"


def _install_stubs():
    timm = sys.modules.get("timm") or types.ModuleType("timm")
    models = getattr(timm, "models", None) or types.ModuleType("timm.models")
    vt = sys.modules.get("timm.models.vision_transformer") or \
        types.ModuleType("timm.models.vision_transformer")
    if not hasattr(vt, "Mlp"):
        vt.Mlp = None  # shadowed by the reference's own Mlp
    layers = sys.modules.get("timm.models.layers") or \
        types.ModuleType("timm.models.layers")
    if not hasattr(layers, "DropPath"):
        layers.DropPath = torch.nn.Identity
        layers.trunc_normal_ = lambda t, std=0.02: t
        layers.to_2tuple = lambda x: (x, x) if not isinstance(x, tuple) else x
    models.vision_transformer = vt
    models.layers = layers
    timm.models = models
    sys.modules.setdefault("timm", timm)
    sys.modules["timm.models"] = models
    sys.modules["timm.models.vision_transformer"] = vt
    sys.modules["timm.models.layers"] = layers

    if "torchvision.transforms.functional" not in sys.modules:
        def resize(img, size):
            return torch.nn.functional.interpolate(
                img, size=tuple(size), mode="bilinear", align_corners=False)
        tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
        tr = getattr(tv, "transforms", None) or \
            types.ModuleType("torchvision.transforms")
        fn = types.ModuleType("torchvision.transforms.functional")
        fn.resize = resize
        tr.functional = fn
        tv.transforms = tr
        sys.modules.setdefault("torchvision", tv)
        sys.modules["torchvision.transforms"] = tr
        sys.modules["torchvision.transforms.functional"] = fn


@pytest.fixture(scope="module")
def ref():
    _install_stubs()
    pkg = types.ModuleType("refccmr")
    pkg.__path__ = [REF]
    sys.modules["refccmr"] = pkg
    mods = {}
    for name in ["helpers", "xcit", "extractor", "update"]:
        spec = importlib.util.spec_from_file_location(
            f"refccmr.{name}", f"{REF}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        mod.__package__ = "refccmr"
        sys.modules[f"refccmr.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


@pytest.mark.parametrize("separate", [False, True])
def test_xcit_parity(ref, separate):
    torch.manual_seed(int(separate))
    t_m = ref["xcit"].XCiT(embed_dim=128, depth=1, num_heads=8, mlp_ratio=1,
                           separate=separate).eval()
    j_m = XCiT(embed_dim=128, depth=1, num_heads=8, mlp_ratio=1,
               separate=separate)
    params = j_m.from_torch(_sd(t_m))
    rng = np.random.RandomState(int(separate))
    x = rng.randn(2, 128, 8, 10).astype(np.float32)
    x_v = rng.randn(2, 128, 8, 10).astype(np.float32)
    with torch.no_grad():
        if separate:
            refv = t_m(torch.from_numpy(x), torch.from_numpy(x_v))
        else:
            refv = t_m(torch.from_numpy(x))
    out = j_m(params, nhwc(x), x_v=nhwc(x_v) if separate else None)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(refv), atol=1e-4)


@pytest.mark.parametrize("model_type,num_scales", [("CCMR", 3),
                                                   ("CCMR+", 4)])
def test_encoder_parity(ref, model_type, num_scales):
    torch.manual_seed(2)
    t_f = ref["extractor"].BasicEncoder_resconv(
        output_dim=256, norm_fn="group", model_type=model_type).eval()
    t_c = ref["extractor"].Basic_Context_Encoder_resconv(
        output_dim=256, norm_fn="group", model_type=model_type).eval()
    j_f = CCMREncoder(output_dim=256, norm_fn="group",
                      num_scales=num_scales)
    j_c = CCMREncoder(output_dim=256, norm_fn="group",
                      num_scales=num_scales, context_mode=True)
    pf = j_f.from_torch(_sd(t_f))
    pc = j_c.from_torch(_sd(t_c))
    rng = np.random.RandomState(2)
    x1 = rng.randn(1, 3, 64, 96).astype(np.float32)
    x2 = rng.randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        ref_f = t_f([torch.from_numpy(x1), torch.from_numpy(x2)])
        ref_c = t_c(torch.from_numpy(x1))
    both = jnp.concatenate([nhwc(x1), nhwc(x2)], axis=0)
    out_f = j_f(pf, both)
    out_c = j_c(pc, nhwc(x1))
    assert len(out_f) == num_scales
    for lvl in range(num_scales):
        t_cat = torch.cat(ref_f[lvl], dim=0)
        np.testing.assert_allclose(np.asarray(out_f[lvl]), to_nhwc(t_cat),
                                   atol=2e-3, err_msg=f"fnet level {lvl}")
        np.testing.assert_allclose(np.asarray(out_c[lvl]),
                                   to_nhwc(ref_c[lvl]), atol=2e-3,
                                   err_msg=f"cnet level {lvl}")


def test_update_block_parity(ref):
    torch.manual_seed(5)
    t_u = ref["update"].BasicUpdateBlock(
        correlation_depth=162, hidden_dim=128, scale=2, num_heads=8,
        depth=1, mlp_ratio=1, num_scales=3).eval()
    j_u = CCMRUpdateBlock(162, hidden_dim=128, scale=2, num_heads=8,
                          depth=1, mlp_ratio=1, num_scales=3)
    params = j_u.from_torch(_sd(t_u))
    rng = np.random.RandomState(5)
    b, h, w = 1, 8, 10
    net = rng.randn(b, 128, h, w).astype(np.float32)
    inp = rng.randn(b, 128, h, w).astype(np.float32)
    corr = rng.randn(b, 162, h, w).astype(np.float32)
    flow = rng.randn(b, 2, h, w).astype(np.float32)
    gc = rng.randn(b, 128, h, w).astype(np.float32)
    for level in [0, 2]:
        with torch.no_grad():
            t_net, t_mask, t_delta = t_u(
                *(torch.from_numpy(v) for v in (net, inp, corr, flow, gc)),
                level_index=level)
        j_net, j_mask, j_delta = j_u(
            params, *(nhwc(v) for v in (net, inp, corr, flow, gc)),
            level_index=level)
        np.testing.assert_allclose(np.asarray(j_net), to_nhwc(t_net),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(j_mask), to_nhwc(t_mask),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(j_delta), to_nhwc(t_delta),
                                   atol=1e-4)


@pytest.mark.parametrize("name,iters", [("ccmr", (1, 1, 1)),
                                        ("ccmr_p", (1, 1, 1, 1))])
def test_ccmr_forward_and_loss(name, iters):
    model = ptlflow_tpu.get_model(name, args={"iters": iters})
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
    assert outt["flow_preds"].shape[0] == len(iters)
    assert np.isfinite(float(model.loss_fn(outt, inputs)))
