"""VCN parity vs reference torch modules (read-only oracle imports)."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.vcn import conv4d as jc4d
from ptlflow_tpu.models.vcn import submodule as jsub
from ptlflow_tpu.models.vcn.vcn import (corrf as j_corrf,
    flow_reg as j_flow_reg, warp_with_mask as j_warp_with_mask)

REF = "/root/reference/ptlflow/models/vcn"


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    pkg = types.ModuleType("refvcn")
    pkg.__path__ = [REF]
    sys.modules["refvcn"] = pkg
    sub = _load("refvcn.submodule", f"{REF}/submodule.py")
    c4d = _load("refvcn.conv4d", f"{REF}/conv4d.py")

    # vcn.py imports the registry and BaseModel; stub them so the oracle
    # classes (flow_reg, WarpModule, corrf) load without lightning.
    reg = types.ModuleType("ptlflow.utils.registry")
    reg.register_model = lambda c: c
    reg.trainable = lambda c: c
    ptlflow_pkg = types.ModuleType("ptlflow")
    utils_pkg = types.ModuleType("ptlflow.utils")
    sys.modules.setdefault("ptlflow", ptlflow_pkg)
    sys.modules["ptlflow.utils"] = utils_pkg
    sys.modules["ptlflow.utils.registry"] = reg

    base_pkg = types.ModuleType("refvcn_parent.base_model.base_model")

    class _FakeBase(torch.nn.Module):
        def __init__(self, **kw):
            super().__init__()

    base_pkg.BaseModel = _FakeBase
    # emulate the relative import "..base_model.base_model"
    parent = types.ModuleType("refvcn_parent")
    parent.__path__ = []
    bm_pkg = types.ModuleType("refvcn_parent.base_model")
    bm_pkg.__path__ = []
    sys.modules["refvcn_parent"] = parent
    sys.modules["refvcn_parent.base_model"] = bm_pkg
    sys.modules["refvcn_parent.base_model.base_model"] = base_pkg

    # load vcn.py inside a fake package so relative imports resolve
    mpkg = types.ModuleType("refvcn_parent.vcn")
    mpkg.__path__ = [REF]
    sys.modules["refvcn_parent.vcn"] = mpkg
    sys.modules["refvcn_parent.vcn.submodule"] = sub
    sys.modules["refvcn_parent.vcn.conv4d"] = c4d
    spec = importlib.util.spec_from_file_location(
        "refvcn_parent.vcn.vcn", f"{REF}/vcn.py")
    vcn_mod = importlib.util.module_from_spec(spec)
    sys.modules["refvcn_parent.vcn.vcn"] = vcn_mod
    spec.loader.exec_module(vcn_mod)
    return types.SimpleNamespace(sub=sub, c4d=c4d, vcn=vcn_mod)


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def _vol_to_jax(t):
    # torch (B, C, U, V, H, W) -> jax (B, U, V, H, W, C)
    return jnp.asarray(t.permute(0, 2, 3, 4, 5, 1).numpy())


def _vol_from_jax(x):
    # jax (B, U, V, H, W, C) -> numpy (B, C, U, V, H, W)
    return np.transpose(np.asarray(x), (0, 5, 1, 2, 3, 4))


def test_corrf_parity(ref):
    m = ref.vcn.VCNSmall.__new__(ref.vcn.VCNSmall)  # corrf is self-free
    rng = np.random.RandomState(0)
    r = rng.randn(1, 8, 10, 12).astype(np.float32)
    t = rng.randn(1, 8, 10, 12).astype(np.float32)
    with torch.no_grad():
        ref_cost = ref.vcn.VCNSmall.corrf(
            m, torch.from_numpy(r), torch.from_numpy(t), 3, fac=2).numpy()
    out = j_corrf(jnp.asarray(np.transpose(r, (0, 2, 3, 1))),
                     jnp.asarray(np.transpose(t, (0, 2, 3, 1))), 3, fac=2)
    np.testing.assert_allclose(_vol_from_jax(out), ref_cost, atol=1e-5)


def test_flow_reg_parity(ref):
    t_reg = ref.vcn.flow_reg(ent=True, maxdisp=3, fac=2)
    j_reg = j_flow_reg(ent=True, maxdisp=3, fac=2)
    rng = np.random.RandomState(1)
    x = rng.randn(2, 7, 3, 6, 8).astype(np.float32)
    with torch.no_grad():
        ref_flow, ref_ent = t_reg(torch.from_numpy(x))
    flow, ent = j_reg({}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(flow), ref_flow.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ent), ref_ent.numpy(), atol=1e-5)


def test_warp_parity(ref):
    t_warp = ref.vcn.WarpModule()
    rng = np.random.RandomState(2)
    x = rng.randn(1, 4, 9, 11).astype(np.float32)
    flow = (rng.randn(1, 2, 9, 11) * 2).astype(np.float32)
    with torch.no_grad():
        ref_out, ref_mask = t_warp(torch.from_numpy(x),
                                   torch.from_numpy(flow))
    out, mask = j_warp_with_mask(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(flow, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref_out), atol=1e-5)


def test_sepconv4d_parity(ref):
    torch.manual_seed(3)
    t = ref.c4d.sepConv4d(6, 6, with_bn=False, full=False).eval()
    j = jc4d.sepConv4d(6, 6, with_bn=False)
    params = j.from_torch(_sd(t))
    rng = np.random.RandomState(3)
    x = rng.randn(1, 6, 5, 5, 6, 7).astype(np.float32)
    with torch.no_grad():
        ref_out = t(torch.from_numpy(x)).numpy()
    out = j(params, _vol_to_jax(torch.from_numpy(x)))
    np.testing.assert_allclose(_vol_from_jax(out), ref_out, atol=1e-4)


def test_butterfly4d_parity(ref):
    torch.manual_seed(4)
    t = ref.c4d.butterfly4D(8, 4, withbn=True, full=False).eval()
    j = jc4d.butterfly4D(8, 4, withbn=True)
    params = j.from_torch(_sd(t))
    rng = np.random.RandomState(4)
    x = rng.randn(1, 8, 9, 9, 6, 7).astype(np.float32)
    with torch.no_grad():
        ref_out = t(torch.from_numpy(x)).numpy()
    out = j(params, _vol_to_jax(torch.from_numpy(x)))
    np.testing.assert_allclose(_vol_from_jax(out), ref_out, atol=1e-4)


def test_pspnet_s_parity(ref):
    torch.manual_seed(5)
    t = ref.sub.pspnet_s(is_proj=False).eval()
    j = jsub.pspnet_s(is_proj=False)
    params = j.from_torch(_sd(t))
    rng = np.random.RandomState(5)
    x = rng.randn(2, 3, 128, 128).astype(np.float32)
    with torch.no_grad():
        ref_outs = t(torch.from_numpy(x))
    outs = j(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    assert len(outs) == len(ref_outs)
    for o, r in zip(outs, ref_outs):
        np.testing.assert_allclose(np.asarray(o), to_nhwc(r), atol=1e-4)


def test_vcn_forward_shapes():
    for name in ("vcn_small", "vcn"):
        model = ptlflow_tpu.get_model(name)
        model.init_params()
        rng = np.random.RandomState(6)
        images = rng.rand(1, 2, 3, 128, 128).astype(np.float32)
        out = model({"images": images})
        assert out["flows"].shape == (1, 1, 2, 128, 128)
        assert np.isfinite(np.asarray(out["flows"])).all()


def test_vcn_train_loss():
    model = ptlflow_tpu.get_model("vcn_small")
    model.init_params()
    rng = np.random.RandomState(7)
    inputs = {
        "images": jnp.asarray(rng.rand(1, 2, 3, 128, 128).astype(np.float32)),
        "flows": jnp.asarray(rng.randn(1, 1, 2, 128, 128).astype(np.float32)),
        "valids": jnp.ones((1, 1, 1, 128, 128), jnp.float32),
    }
    outputs = model.forward(model.params, inputs, training=True)
    assert len(outputs["flow_preds"]) == 5
    assert len(outputs["oors_preds"]) == 4
    loss = model.loss_fn(outputs, inputs)
    assert np.isfinite(float(loss))
