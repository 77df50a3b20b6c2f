"""IRR parity tests vs reference torch modules."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.irr.pwc_modules import (FeatureExtractor,
                                                FlowEstimatorDense,
                                                OccUpsampleNetwork,
                                                RefineFlow, RefineOcc,
                                                compute_cost_volume,
                                                irr_warp)

REF = "/root/reference/ptlflow/models/irr"


@pytest.fixture(scope="module")
def ref():
    pkg = types.ModuleType("refirr")
    pkg.__path__ = [REF]
    sys.modules["refirr"] = pkg
    mods = {}
    for name in ["pwc_modules", "irr_modules"]:
        spec = importlib.util.spec_from_file_location(
            f"refirr.{name}", f"{REF}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refirr.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def test_cost_volume_parity(ref):
    rng = np.random.RandomState(0)
    f1 = rng.randn(1, 32, 8, 10).astype(np.float32)
    f2 = rng.randn(1, 32, 8, 10).astype(np.float32)
    with torch.no_grad():
        refv = ref["pwc_modules"].compute_cost_volume(
            torch.from_numpy(f1), torch.from_numpy(f2), {"max_disp": 4})
    out = compute_cost_volume(nhwc(f1), nhwc(f2), 4)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(refv), atol=1e-5)


def test_warp_parity(ref):
    rng = np.random.RandomState(1)
    x = rng.randn(1, 16, 8, 12).astype(np.float32)
    flow = rng.randn(1, 2, 8, 12).astype(np.float32)
    wl = ref["pwc_modules"].WarpingLayer()
    with torch.no_grad():
        refv = wl(torch.from_numpy(x), torch.from_numpy(flow), 64, 96,
                  0.05)
    out = irr_warp(nhwc(x), nhwc(flow), 64, 96, 0.05)
    diff = np.abs(np.asarray(out) - to_nhwc(refv))
    assert np.median(diff) < 1e-5 and (diff > 1e-3).mean() < 0.01


def test_flow_estimator_dense_parity(ref):
    torch.manual_seed(2)
    t_e = ref["pwc_modules"].FlowEstimatorDense(115).eval()
    j_e = FlowEstimatorDense(115)
    params = j_e.from_torch(_sd(t_e))
    rng = np.random.RandomState(2)
    x = rng.randn(1, 115, 8, 10).astype(np.float32)
    with torch.no_grad():
        t_int, t_flow = t_e(torch.from_numpy(x))
    j_int, j_flow = j_e(params, nhwc(x))
    np.testing.assert_allclose(np.asarray(j_int), to_nhwc(t_int), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_flow), to_nhwc(t_flow),
                               atol=1e-4)


def test_refine_flow_parity(ref):
    torch.manual_seed(3)
    t_r = ref["irr_modules"].RefineFlow(35).eval()
    j_r = RefineFlow(35)
    params = j_r.from_torch(_sd(t_r))
    rng = np.random.RandomState(3)
    flow = rng.randn(1, 2, 8, 10).astype(np.float32)
    diff_img = rng.randn(1, 3, 8, 10).astype(np.float32)
    feat = rng.randn(1, 32, 8, 10).astype(np.float32)
    with torch.no_grad():
        refv = t_r(torch.from_numpy(flow), torch.from_numpy(diff_img),
                   torch.from_numpy(feat))
    out = j_r(params, nhwc(flow), nhwc(diff_img), nhwc(feat))
    np.testing.assert_allclose(np.asarray(out), to_nhwc(refv), atol=1e-4)


def test_refine_occ_parity(ref):
    torch.manual_seed(4)
    t_r = ref["irr_modules"].RefineOcc(65).eval()
    j_r = RefineOcc(65)
    params = j_r.from_torch(_sd(t_r))
    rng = np.random.RandomState(4)
    occ = rng.randn(1, 1, 8, 10).astype(np.float32)
    f1 = rng.randn(1, 32, 8, 10).astype(np.float32)
    f2 = rng.randn(1, 32, 8, 10).astype(np.float32)
    with torch.no_grad():
        refv = t_r(torch.from_numpy(occ), torch.from_numpy(f1),
                   torch.from_numpy(f2))
    out = j_r(params, nhwc(occ), nhwc(f1), nhwc(f2))
    np.testing.assert_allclose(np.asarray(out), to_nhwc(refv), atol=1e-4)


def test_occ_upsample_parity(ref):
    torch.manual_seed(5)
    t_u = ref["irr_modules"].OccUpsampleNetwork(11, 1).eval()
    j_u = OccUpsampleNetwork(11, 1)
    params = j_u.from_torch(_sd(t_u))
    rng = np.random.RandomState(5)
    occ = rng.randn(1, 1, 8, 10).astype(np.float32)
    x = rng.randn(1, 10, 16, 20).astype(np.float32)
    with torch.no_grad():
        refv = t_u(torch.from_numpy(occ), torch.from_numpy(x))
    out = j_u(params, nhwc(occ), nhwc(x))
    np.testing.assert_allclose(np.asarray(out), to_nhwc(refv), atol=1e-4)


def test_feature_extractor_parity(ref):
    torch.manual_seed(6)
    chs = (3, 16, 32, 64, 96, 128, 196)
    t_f = ref["pwc_modules"].FeatureExtractor(chs).eval()
    j_f = FeatureExtractor(chs)
    params = j_f.from_torch(_sd(t_f))
    rng = np.random.RandomState(6)
    x = rng.randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        t_pyr = t_f(torch.from_numpy(x))
    j_pyr = j_f(params, nhwc(x))
    assert len(j_pyr) == len(t_pyr) == 6
    for jv, tv in zip(j_pyr, t_pyr):
        np.testing.assert_allclose(np.asarray(jv), to_nhwc(tv), atol=1e-4)


@pytest.mark.parametrize("name", ["irr_pwc", "irr_pwcnet",
                                  "irr_pwcnet_irr"])
def test_irr_training_and_loss(name):
    model = ptlflow_tpu.get_model(name)
    model.init_params()
    rng = np.random.RandomState(7)
    b, h, w = 1, 128, 128
    inputs = {
        "images": jnp.asarray(rng.rand(b, 2, 3, h, w).astype(np.float32)),
        "flows": jnp.asarray(rng.randn(b, 1, 2, h, w).astype(np.float32)),
        "valids": jnp.ones((b, 1, 1, h, w), jnp.float32),
    }
    if name == "irr_pwc":
        inputs["occs"] = jnp.asarray(
            (rng.rand(b, 1, 1, h, w) > 0.5).astype(np.float32))
    out = model.forward(model.params, inputs, training=True)
    assert np.isfinite(float(model.loss_fn(out, inputs)))
