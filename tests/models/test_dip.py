"""DIP parity tests vs reference torch modules."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.dip.dip import (BasicEncoderQuarter,
                                        DIPBasicUpdateBlock, PathMatch,
                                        SmallUpdateBlock)

REF = "/root/reference/ptlflow/models/dip"


@pytest.fixture(scope="module")
def ref():
    pkg = types.ModuleType("refdip")
    pkg.__path__ = [REF]
    sys.modules["refdip"] = pkg
    mods = {}
    for name in ["utils", "extractor", "update", "path_match"]:
        spec = importlib.util.spec_from_file_location(
            f"refdip.{name}", f"{REF}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refdip.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def test_encoder_quarter_parity(ref):
    torch.manual_seed(0)
    t_e = ref["extractor"].BasicEncoderQuarter(
        output_dim=256, norm_fn="instance").eval()
    j_e = BasicEncoderQuarter(output_dim=256, norm_fn="instance")
    params = j_e.from_torch(_sd(t_e))
    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        refv = to_nhwc(t_e(torch.from_numpy(x)))
    out = j_e(params, nhwc(x))
    np.testing.assert_allclose(np.asarray(out), refv, atol=1e-3)


def test_path_match_parity(ref):
    rng = np.random.RandomState(1)
    b, c, h, w = 1, 32, 10, 12
    f1 = rng.randn(b, c, h, w).astype(np.float32)
    f2 = rng.randn(b, c, h, w).astype(np.float32)
    flow = 1.5 * rng.randn(b, 2, h, w).astype(np.float32)
    t_pm = ref["path_match"].PathMatch(torch.from_numpy(f1),
                                       torch.from_numpy(f2))
    with torch.no_grad():
        t_search = t_pm(torch.from_numpy(flow).clone(), is_search=True)
        t_inv = t_pm(torch.from_numpy(flow).clone(), is_search=False)
    j_pm = PathMatch(nhwc(f1), nhwc(f2))
    j_search = j_pm(nhwc(flow), is_search=True)
    j_inv = j_pm(nhwc(flow), is_search=False)
    np.testing.assert_allclose(np.asarray(j_search), to_nhwc(t_search),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_inv), to_nhwc(t_inv), atol=1e-4)


def test_update_blocks_parity(ref):
    torch.manual_seed(2)
    t_s = ref["update"].SmallUpdateBlock(hidden_dim=128).eval()
    t_b = ref["update"].BasicUpdateBlock(hidden_dim=128).eval()
    j_s = SmallUpdateBlock(hidden_dim=128)
    j_b = DIPBasicUpdateBlock(hidden_dim=128)
    ps = j_s.from_torch(_sd(t_s))
    pb = j_b.from_torch(_sd(t_b))
    rng = np.random.RandomState(2)
    b, h, w = 1, 8, 10
    net = rng.randn(b, 128, h, w).astype(np.float32)
    inp = rng.randn(b, 128, h, w).astype(np.float32)
    corr10 = rng.randn(b, 10, h, w).astype(np.float32)
    corr25 = rng.randn(b, 25, h, w).astype(np.float32)
    flow = rng.randn(b, 2, h, w).astype(np.float32)
    with torch.no_grad():
        ts_net, ts_mask, ts_delta = t_s(
            *(torch.from_numpy(v) for v in (net, inp, corr10, flow)))
        tb_net, tb_mask, tb_delta = t_b(
            *(torch.from_numpy(v) for v in (net, inp, corr25, flow)))
    js_net, js_mask, js_delta = j_s(
        ps, *(nhwc(v) for v in (net, inp, corr10, flow)))
    jb_net, jb_mask, jb_delta = j_b(
        pb, *(nhwc(v) for v in (net, inp, corr25, flow)))
    np.testing.assert_allclose(np.asarray(js_net), to_nhwc(ts_net),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(js_delta), to_nhwc(ts_delta),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(jb_net), to_nhwc(tb_net),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(jb_delta), to_nhwc(tb_delta),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(js_mask), to_nhwc(ts_mask),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(jb_mask), to_nhwc(tb_mask),
                               atol=1e-4)


def test_dip_forward_and_loss():
    model = ptlflow_tpu.get_model("dip", args={"iters": 2})
    model.init_params()
    rng = np.random.RandomState(5)
    b, h, w = 1, 64, 96
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
    assert outt["flow_preds"].shape[0] == 8
    assert np.isfinite(float(model.loss_fn(outt, inputs)))
