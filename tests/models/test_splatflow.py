"""SplatFlow parity tests vs reference torch modules."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.splatflow.splatflow import SplatUpdate
from ptlflow_tpu.ops.warp import softsplat_average

REF = "/root/reference/ptlflow/models/splatflow"


@pytest.fixture(scope="module")
def ref():
    pkg = types.ModuleType("refsp")
    pkg.__path__ = [REF]
    sys.modules["refsp"] = pkg
    mods = {}
    for name in ["attention", "update"]:
        spec = importlib.util.spec_from_file_location(
            f"refsp.{name}", f"{REF}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refsp.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def test_softsplat_average():
    """Numpy oracle of average-mode forward splatting."""
    rng = np.random.RandomState(0)
    b, h, w, c = 1, 6, 8, 3
    x = rng.randn(b, h, w, c).astype(np.float32)
    flow = 1.5 * rng.randn(b, h, w, 2).astype(np.float32)
    num = np.zeros((h, w, c), np.float64)
    den = np.zeros((h, w, 1), np.float64)
    for y in range(h):
        for xx in range(w):
            tx = xx + flow[0, y, xx, 0]
            ty = y + flow[0, y, xx, 1]
            x0, y0 = int(np.floor(tx)), int(np.floor(ty))
            fx, fy = tx - x0, ty - y0
            for dx, dy, wgt in ((0, 0, (1 - fx) * (1 - fy)),
                                (1, 0, fx * (1 - fy)),
                                (0, 1, (1 - fx) * fy),
                                (1, 1, fx * fy)):
                px, py = x0 + dx, y0 + dy
                if 0 <= px < w and 0 <= py < h:
                    num[py, px] += wgt * x[0, y, xx]
                    den[py, px] += wgt
    den[den == 0] = 1.0
    expect = (num / den).astype(np.float32)
    out = np.asarray(softsplat_average(jnp.asarray(x), jnp.asarray(flow)))
    np.testing.assert_allclose(out[0], expect, atol=1e-4)


@pytest.mark.parametrize("use_mf_t", [False, True])
def test_splat_update_parity(ref, use_mf_t):
    torch.manual_seed(0)
    t_u = ref["update"].Update(128).eval()
    t_att = ref["attention"].Attention(dim=128, heads=1, dim_head=128).eval()
    j_u = SplatUpdate(128)
    params = j_u.from_torch(_sd(t_u))
    from ptlflow_tpu.models.llaflow.llaflow import GlobalAttention
    j_att = GlobalAttention(dim=128, heads=1, dim_head=128)
    att_params = j_att.from_torch(_sd(t_att))
    rng = np.random.RandomState(1)
    b, h, w = 1, 8, 10
    net = rng.randn(b, 128, h, w).astype(np.float32)
    inp = rng.randn(b, 128, h, w).astype(np.float32)
    corr = rng.randn(b, 324, h, w).astype(np.float32)
    flow = rng.randn(b, 2, h, w).astype(np.float32)
    mf_t = rng.randn(b, 128, h, w).astype(np.float32) if use_mf_t else None
    with torch.no_grad():
        atte = t_att(torch.from_numpy(inp))
        t_net, t_mask, t_delta, t_mf = t_u(
            *(torch.from_numpy(v) for v in (net, inp, corr, flow)), atte,
            None if mf_t is None else torch.from_numpy(mf_t))
    j_atte = j_att(att_params, nhwc(inp))
    j_net, j_mask, j_delta, j_mf = j_u(
        params, *(nhwc(v) for v in (net, inp, corr, flow)), j_atte,
        None if mf_t is None else nhwc(mf_t))
    np.testing.assert_allclose(np.asarray(j_net), to_nhwc(t_net), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_mask), to_nhwc(t_mask),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_delta), to_nhwc(t_delta),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_mf), to_nhwc(t_mf), atol=1e-4)


def test_splatflow_three_frame_forward():
    model = ptlflow_tpu.get_model("splatflow", args={"iters": 2})
    model.init_params()
    rng = np.random.RandomState(5)
    images = rng.rand(1, 3, 3, 64, 96).astype(np.float32)
    out = model({"images": images})
    assert out["flows"].shape == (1, 1, 2, 64, 96)
    assert np.isfinite(np.asarray(out["flows"])).all()
