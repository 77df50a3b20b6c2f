"""DICL parity tests vs reference torch modules."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.dicl.dicl import (DAP, DICLMatch, FeatureGA,
                                          flow_entropy, flow_regression)


@pytest.fixture(scope="module")
def ref():
    stub = types.ModuleType("ptlflow.utils.registry")
    stub.register_model = lambda c: c
    stub.trainable = lambda c: c
    stub_base = types.ModuleType("ptlflow.models.base_model.base_model")

    class _FakeBase(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    stub_base.BaseModel = _FakeBase
    spec = importlib.util.spec_from_file_location(
        "refcorr2", "/root/reference/ptlflow/utils/correlation.py")
    refcorr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(refcorr)
    stub_corr = types.ModuleType("ptlflow.utils.correlation")
    stub_corr.IterSpatialCorrelationSampler = \
        refcorr.IterSpatialCorrelationSampler
    pk = types.ModuleType("ptlflow")
    pk.utils = types.ModuleType("ptlflow.utils")
    pk.models = types.ModuleType("ptlflow.models")
    pk.models.base_model = types.ModuleType("ptlflow.models.base_model")
    dicl_pkg = types.ModuleType("ptlflow.models.dicl")
    dicl_pkg.__path__ = ["/root/reference/ptlflow/models/dicl"]
    for name, mod in [
        ("ptlflow", pk), ("ptlflow.utils", pk.utils),
        ("ptlflow.utils.registry", stub),
        ("ptlflow.utils.correlation", stub_corr),
        ("ptlflow.models", pk.models),
        ("ptlflow.models.base_model", pk.models.base_model),
        ("ptlflow.models.base_model.base_model", stub_base),
        ("ptlflow.models.dicl", dicl_pkg),
    ]:
        sys.modules[name] = mod
    mods = {}
    for name in ["loss_functions", "dicl"]:
        spec = importlib.util.spec_from_file_location(
            f"ptlflow.models.dicl.{name}",
            f"/root/reference/ptlflow/models/dicl/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ptlflow.models.dicl.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    yield mods
    for name in list(sys.modules):
        if (name == "ptlflow" or name.startswith("ptlflow.")) and \
                not name.startswith("ptlflow_tpu"):
            del sys.modules[name]


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def test_feature_ga_parity(ref):
    torch.manual_seed(0)
    t_f = ref["dicl"].FeatureGA().eval()
    j_f = FeatureGA()
    params = j_f.from_torch(_sd(t_f))
    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 128, 128).astype(np.float32)
    with torch.no_grad():
        _, t2, t3, t4, t5, t6 = t_f(torch.from_numpy(x))
    j2, j3, j4, j5, j6 = j_f(params, nhwc(x))
    for jv, tv in zip((j2, j3, j4, j5, j6), (t2, t3, t4, t5, t6)):
        np.testing.assert_allclose(np.asarray(jv), to_nhwc(tv), atol=1e-3)


def test_flow_regression_and_entropy_parity(ref):
    rng = np.random.RandomState(1)
    cost = rng.randn(1, 7, 7, 8, 10).astype(np.float32)
    t_cost = torch.from_numpy(cost)[:, None]
    with torch.no_grad():
        t_flow = ref["dicl"].FlowRegression(3, 3, True)(t_cost.contiguous())
        t_ent = ref["dicl"].FlowEntropy()(t_cost)
    j_flow = flow_regression(jnp.asarray(cost), 3, 3, True)
    j_ent = flow_entropy(jnp.asarray(cost))
    np.testing.assert_allclose(np.asarray(j_flow), to_nhwc(t_flow),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_ent), to_nhwc(t_ent), atol=1e-5)


def test_dap_parity(ref):
    torch.manual_seed(2)
    t_dap = ref["dicl"].DAP(md=3).eval()
    with torch.no_grad():
        torch.nn.init.normal_(t_dap.dap_layer.conv.weight, 0, 0.1)
    j_dap = DAP(md=3)
    params = j_dap.from_torch(_sd(t_dap))
    rng = np.random.RandomState(2)
    cost = rng.randn(1, 7, 7, 8, 10).astype(np.float32)
    with torch.no_grad():
        refv = t_dap(torch.from_numpy(cost)[:, None]).squeeze(1).numpy()
    out = j_dap(params, jnp.asarray(cost))
    np.testing.assert_allclose(np.asarray(out), refv, atol=1e-5)


def test_compute_cost_parity(ref):
    """The shifted-concat cost volume + shared matching net vs reference
    DICL.compute_cost (dicl.py:553-620) on a mock self."""
    torch.manual_seed(3)
    t_match = ref["dicl"].DICL_MODULE().eval()
    j_match = DICLMatch()
    params = j_match.from_torch(_sd(t_match))

    mock = types.SimpleNamespace(cuda_cost=False, remove_warp_hole=True)
    rng = np.random.RandomState(3)
    x = rng.randn(1, 32, 8, 10).astype(np.float32)
    y = rng.randn(1, 32, 8, 10).astype(np.float32)
    with torch.no_grad():
        t_cost = ref["dicl"].DICL.compute_cost(
            mock, torch.from_numpy(x), torch.from_numpy(y), t_match, 3, 3)
        t_cost = t_cost.squeeze(1).numpy()

    model = ptlflow_tpu.get_model("dicl")
    out = model.compute_cost(params, nhwc(x), nhwc(y), j_match, 3, 3)
    np.testing.assert_allclose(np.asarray(out), t_cost, atol=1e-4)


def test_dicl_forward_and_loss():
    model = ptlflow_tpu.get_model("dicl")
    model.init_params()
    rng = np.random.RandomState(5)
    b, h, w = 1, 256, 256
    images = rng.rand(b, 2, 3, h, w).astype(np.float32)
    out = model({"images": images})
    assert out["flows"].shape == (b, 1, 2, h, w)
    assert np.isfinite(np.asarray(out["flows"])).all()
    inputs = {
        "images": jnp.asarray(images),
        "flows": jnp.asarray(rng.randn(b, 1, 2, h, w).astype(np.float32)),
        "valids": jnp.ones((b, 1, 1, h, w), jnp.float32),
    }
    outt = model.forward(model.params, inputs, training=True)
    assert len(outt["flow_preds"]) == 5
    assert np.isfinite(float(model.loss_fn(outt, inputs)))
