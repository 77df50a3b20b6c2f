"""SeparableFlow parity vs reference torch modules.

The compiled GANet extension is stubbed with torch wrappers around the same
numpy oracles used in test_separableflow_ganet.py, so the reference
CostAggregation/Guidance run on CPU as oracles.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.separableflow import cost_agg as jca
from ptlflow_tpu.models.separableflow.separableflow import (
    BasicUpdateBlock as JBasicUpdateBlock)

from .test_separableflow_ganet import (np_nlf_down, np_nlf_left,
                                       np_nlf_right, np_nlf_up, np_sga_down,
                                       np_sga_up)

REF = "/root/reference/ptlflow/models/separableflow"


def _torch_sga(x, k1, k2, k3, k4):
    xn = x.detach().numpy()
    gs = [k.detach().numpy() for k in (k1, k2, k3, k4)]
    down = np_sga_down(xn, gs[0])
    up = np_sga_up(xn, gs[1])
    xt = xn.transpose(0, 1, 2, 4, 3)
    gt = [g.transpose(0, 1, 3, 2) for g in gs]
    right = np_sga_down(xt, gt[2]).transpose(0, 1, 2, 4, 3)
    left = np_sga_up(xt, gt[3]).transpose(0, 1, 2, 4, 3)
    out = np.maximum(np.maximum(down, up), np.maximum(right, left))
    return torch.from_numpy(out)


class _SGAStub(torch.nn.Module):
    def forward(self, x, k1, k2, k3, k4):
        return _torch_sga(x, k1, k2, k3, k4)


class _NLFIterStub(torch.nn.Module):
    def forward(self, x, g0, g1, g2, g3):
        xn = x.detach().numpy()
        gs = [g.detach().numpy() for g in (g0, g1, g2, g3)]
        out = np_nlf_left(np_nlf_right(np_nlf_up(np_nlf_down(
            xn, gs[0]), gs[1]), gs[2]), gs[3])
        return torch.from_numpy(out)


@pytest.fixture(scope="module")
def ref():
    # stub the GANet module tree
    gm = types.ModuleType("refsf_ganet_modules")
    gm.SGA = _SGAStub
    gm.NLFIter = _NLFIterStub
    for name in ["refsf", "refsf.libs", "refsf.libs.GANet",
                 "refsf.libs.GANet.modules"]:
        m = types.ModuleType(name)
        m.__path__ = []
        sys.modules[name] = m
    sys.modules["refsf.libs.GANet.modules.GANet"] = gm

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    # cost_agg imports the GANet module inside SGABlock.__init__ via
    # "from .libs.GANet.modules.GANet import SGA" — load it as refsf.cost_agg
    spec = importlib.util.spec_from_file_location("refsf.cost_agg",
                                                  f"{REF}/cost_agg.py")
    ca = importlib.util.module_from_spec(spec)
    sys.modules["refsf.cost_agg"] = ca
    spec.loader.exec_module(ca)

    # the reference ShiftRegression hardcodes .cuda(); run it on CPU
    def _cpu_shift_forward(self, x, max_shift=None):
        if max_shift is not None:
            self.max_shift = max_shift
        shift = torch.arange(-self.max_shift, self.max_shift + 1,
                             dtype=x.dtype).view(1, -1, 1, 1)
        return torch.sum(x * shift, dim=1, keepdim=True)

    ca.ShiftRegression.forward = _cpu_shift_forward
    upd = load("refsf_update", f"{REF}/update.py")
    return types.SimpleNamespace(ca=ca, upd=upd)


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def _vol_to_jax(x):
    # torch (B, C, D, H, W) -> jax (B, D, H, W, C)
    return jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))


def _vol_from_jax(x):
    return np.transpose(np.asarray(x), (0, 4, 1, 2, 3))


def _rand_g(rng, b, h, w, ch=20):
    return rng.randn(b, ch, h, w).astype(np.float32)


def test_sga_block_parity(ref):
    torch.manual_seed(0)
    t = ref.ca.SGABlock(channels=4, refine=True).eval()
    j = jca.SGABlock(channels=4, refine=True)
    params = j.from_torch(_sd(t))
    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 5, 6, 7).astype(np.float32)
    g = _rand_g(rng, 1, 6, 7)
    with torch.no_grad():
        want = t(torch.from_numpy(x), torch.from_numpy(g)).numpy()
    got = j(params, _vol_to_jax(x), jnp.asarray(np.transpose(g, (0, 2, 3, 1))))
    np.testing.assert_allclose(_vol_from_jax(got), want, atol=1e-3)


def test_shift_estimate_parity(ref):
    torch.manual_seed(1)
    t = ref.ca.ShiftEstimate2(max_shift=96, InChannel=8).eval()
    j = jca.ShiftEstimate2(max_shift=96, in_channel=8)
    params = j.from_torch(_sd(t))
    rng = np.random.RandomState(1)
    # D must equal max_shift//8*2+1 = 25 for max_shift=96
    x = rng.randn(1, 8, 25, 4, 5).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x), 96).numpy()
    got = np.asarray(j(params, _vol_to_jax(x), max_shift=96))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_corr2cost_parity(ref):
    t = ref.ca.Corr2Cost()
    j = jca.Corr2Cost()
    rng = np.random.RandomState(2)
    x = rng.randn(1, 3, 9, 4, 6).astype(np.float32)
    for is_ux in (True, False):
        with torch.no_grad():
            want = t(torch.from_numpy(x), maxdisp=4, is_ux=is_ux).numpy()
        got = j({}, _vol_to_jax(x), maxdisp=4, is_ux=is_ux)
        np.testing.assert_allclose(_vol_from_jax(got), want, atol=1e-4,
                                   err_msg=f"is_ux={is_ux}")


def test_cost_aggregation_parity(ref):
    torch.manual_seed(3)
    t = ref.ca.CostAggregation(in_channel=8).eval()
    j = jca.CostAggregation(in_channel=8)
    params = j.from_torch(_sd(t))
    t_count = sum(p.numel() for p in t.parameters())
    from ptlflow_tpu.nn import count_parameters, split_trainable

    tr, _ = split_trainable(params, ())
    assert count_parameters(tr) == t_count
    rng = np.random.RandomState(3)
    # the 'a' branch U-Net needs an even D (the W2 axis of the separated
    # volume); corr2cost produces the odd 2*(max_shift//8)+1 bins for 'b'
    x = rng.randn(1, 8, 16, 8, 8).astype(np.float32)
    g = {k: torch.from_numpy(_rand_g(rng, 1, 8 // s, 8 // s))
         for k, s in (("sg1", 1), ("sg2", 1), ("sg3", 1), ("sg11", 2),
                      ("sg12", 2))}
    with torch.no_grad():
        want_shift, want_corr = t(torch.from_numpy(x), g, max_shift=64,
                                  is_ux=True)
    gj = {k: jnp.asarray(v.numpy().transpose(0, 2, 3, 1))
          for k, v in g.items()}
    got_shift, got_corr = j(params, _vol_to_jax(x), gj, max_shift=64,
                            is_ux=True)
    np.testing.assert_allclose(np.asarray(got_shift), want_shift.numpy(),
                               atol=5e-3)
    np.testing.assert_allclose(_vol_from_jax(got_corr), want_corr.numpy(),
                               atol=5e-3)


def test_update_block_parity(ref):
    torch.manual_seed(4)
    t = ref.upd.BasicUpdateBlock(corr_levels=4, corr_radius=4,
                                 hidden_dim=128).eval()
    j = JBasicUpdateBlock(corr_levels=4, corr_radius=4, hidden_dim=128)
    params = j.from_torch(_sd(t))
    rng = np.random.RandomState(4)
    b, h, w = 1, 6, 8
    net = rng.randn(b, 128, h, w).astype(np.float32)
    inp = rng.randn(b, 128, h, w).astype(np.float32)
    corr = rng.randn(b, 4 * 81, h, w).astype(np.float32)
    c1 = rng.randn(b, 36, h, w).astype(np.float32)
    c2 = rng.randn(b, 36, h, w).astype(np.float32)
    flow = rng.randn(b, 2, h, w).astype(np.float32)
    with torch.no_grad():
        tn, tm, td = t(*(torch.from_numpy(v) for v in
                         (net, inp, corr, c1, c2, flow)))
    jn, jm, jd = j(params, *(jnp.asarray(np.transpose(v, (0, 2, 3, 1)))
                             for v in (net, inp, corr, c1, c2, flow)))
    np.testing.assert_allclose(np.asarray(jn),
                               tn.permute(0, 2, 3, 1).numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(jd),
                               td.permute(0, 2, 3, 1).numpy(), atol=1e-4)


def test_separableflow_forward_shapes():
    model = ptlflow_tpu.get_model("separableflow", args={"iters": 2})
    model.init_params()
    rng = np.random.RandomState(5)
    images = rng.rand(1, 2, 3, 128, 128).astype(np.float32)
    out = model({"images": images})
    assert out["flows"].shape == (1, 1, 2, 128, 128)
    assert np.isfinite(np.asarray(out["flows"])).all()
