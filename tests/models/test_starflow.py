"""StarFlow parity tests vs reference torch modules."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.starflow.starflow import (FlowAndOccContextNetwork,
                                                  FlowAndOccEstimatorDense)

REF = "/root/reference/ptlflow/models/starflow"


@pytest.fixture(scope="module")
def ref():
    pkg = types.ModuleType("refstar")
    pkg.__path__ = [REF]
    sys.modules["refstar"] = pkg
    mods = {}
    for name in ["pwc_modules", "irr_modules"]:
        spec = importlib.util.spec_from_file_location(
            f"refstar.{name}", f"{REF}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refstar.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def test_flow_and_occ_estimator_parity(ref):
    torch.manual_seed(0)
    t_e = ref["pwc_modules"].FlowAndOccEstimatorDense(232).eval()
    j_e = FlowAndOccEstimatorDense(232)
    params = j_e.from_torch(_sd(t_e))
    rng = np.random.RandomState(0)
    x = rng.randn(1, 232, 8, 10).astype(np.float32)
    with torch.no_grad():
        t_int, t_flow, t_occ = t_e(torch.from_numpy(x))
    j_int, j_flow, j_occ = j_e(params, nhwc(x))
    np.testing.assert_allclose(np.asarray(j_int), to_nhwc(t_int), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_flow), to_nhwc(t_flow),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_occ), to_nhwc(t_occ), atol=1e-4)


def test_flow_and_occ_context_parity(ref):
    torch.manual_seed(1)
    t_c = ref["pwc_modules"].FlowAndOccContextNetwork(683).eval()
    j_c = FlowAndOccContextNetwork(683)
    params = j_c.from_torch(_sd(t_c))
    rng = np.random.RandomState(1)
    x = rng.randn(1, 683, 8, 10).astype(np.float32)
    with torch.no_grad():
        t_flow, t_occ = t_c(torch.from_numpy(x))
    j_flow, j_occ = j_c(params, nhwc(x))
    np.testing.assert_allclose(np.asarray(j_flow), to_nhwc(t_flow),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_occ), to_nhwc(t_occ), atol=1e-4)


def test_starflow_multiframe_forward():
    model = ptlflow_tpu.get_model("starflow")
    model.init_params()
    rng = np.random.RandomState(5)
    images = rng.rand(1, 3, 3, 128, 128).astype(np.float32)
    out = model({"images": images})
    assert out["flows"].shape == (1, 2, 2, 128, 128)
    assert out["occs"].shape == (1, 2, 1, 128, 128)
    assert np.isfinite(np.asarray(out["flows"])).all()
