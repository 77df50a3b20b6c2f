"""LLA-Flow parity tests vs reference torch modules."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.llaflow.llaflow import (LLACorrBlock, LSA,
                                                LocalSimilar, ShiftLSA)
from ptlflow_tpu.ops.correlation import coords_grid

REF = "/root/reference/ptlflow/models/llaflow"


@pytest.fixture(scope="module")
def ref():
    pkg = types.ModuleType("reflla")
    pkg.__path__ = [REF]
    sys.modules["reflla"] = pkg
    mods = {}
    for name in ["utils", "aggregate", "corr"]:
        spec = importlib.util.spec_from_file_location(
            f"reflla.{name}", f"{REF}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"reflla.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def test_local_similar_and_lsa_parity(ref):
    torch.manual_seed(0)
    t_ls = ref["aggregate"].LocalSimilar(dim=32, heads=1, size=5).eval()
    t_lsa = ref["aggregate"].LSA(dim=32, heads=1, size=5).eval()
    with torch.no_grad():
        t_lsa.gamma.fill_(0.3)
    j_ls = LocalSimilar(dim=32, heads=1, size=5)
    j_lsa = LSA(dim=32, heads=1, size=5)
    ls_params = j_ls.from_torch(_sd(t_ls))
    lsa_params = j_lsa.from_torch(_sd(t_lsa))
    rng = np.random.RandomState(0)
    x = rng.randn(1, 32, 8, 10).astype(np.float32)
    with torch.no_grad():
        t_attn = t_ls(torch.from_numpy(x))
        t_out = t_lsa(t_attn, torch.from_numpy(x))
    j_attn = j_ls(ls_params, nhwc(x))
    # reference attn is (B, heads, HW, L); mine (B, H, W, L)
    np.testing.assert_allclose(
        np.asarray(j_attn).reshape(1, 80, 25), t_attn[:, 0].numpy(),
        atol=1e-5)
    j_out = j_lsa(lsa_params, j_attn, nhwc(x))
    np.testing.assert_allclose(np.asarray(j_out), to_nhwc(t_out), atol=1e-5)


def test_shift_lsa_parity(ref):
    torch.manual_seed(1)
    t_s = ref["aggregate"].ShiftLSA(dim=32, heads=1, size=5).eval()
    j_s = ShiftLSA(dim=32, heads=1, size=5)
    params = j_s.from_torch(_sd(t_s))
    rng = np.random.RandomState(1)
    f1 = rng.randn(1, 32, 6, 8).astype(np.float32)
    f2 = rng.randn(1, 32, 6, 8).astype(np.float32)
    attn = rng.rand(1, 1, 48, 25).astype(np.float32)
    with torch.no_grad():
        refv = t_s(torch.from_numpy(attn), torch.from_numpy(f1),
                   torch.from_numpy(f2))
    j_attn = jnp.asarray(attn[:, 0].reshape(1, 6, 8, 25))
    out = j_s(params, j_attn, nhwc(f1), nhwc(f2))
    # reference returns (b, h, w, heads, h, w); mine (b, hw, h, w)
    refv = refv.numpy().reshape(1, 48, 1, 6, 8)[:, :, 0]
    np.testing.assert_allclose(np.asarray(out), refv, atol=1e-4)


def test_lla_corr_block_parity(ref):
    rng = np.random.RandomState(2)
    b, c, h, w = 1, 32, 8, 10
    f1 = rng.randn(b, c, h, w).astype(np.float32)
    f2 = rng.randn(b, c, h, w).astype(np.float32)
    corr2 = rng.randn(b, h * w, h, w).astype(np.float32)
    gamma = torch.tensor([0.5])
    t_cb = ref["corr"].CorrBlock(
        torch.from_numpy(f1), torch.from_numpy(f2), gamma,
        torch.from_numpy(corr2).view(b, h, w, 1, h, w), num_levels=2,
        radius=3)
    flow = rng.randn(b, 2, h, w).astype(np.float32)
    ys, xs = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    coords = torch.stack([xs, ys], 0)[None].float() + torch.from_numpy(flow)
    with torch.no_grad():
        refv = t_cb(coords).numpy()
    j_cb = LLACorrBlock(nhwc(f1), nhwc(f2), jnp.asarray([0.5]),
                        jnp.asarray(corr2), num_levels=2, radius=3)
    out = j_cb(coords_grid(b, h, w) + nhwc(flow))
    np.testing.assert_allclose(np.asarray(out),
                               np.transpose(refv, (0, 2, 3, 1)), atol=1e-4)


def test_llaflow_training_and_loss():
    model = ptlflow_tpu.get_model("llaflow", args={"iters": 2})
    model.init_params()
    rng = np.random.RandomState(5)
    b, h, w = 1, 64, 64
    inputs = {
        "images": jnp.asarray(rng.rand(b, 2, 3, h, w).astype(np.float32)),
        "flows": jnp.asarray(rng.randn(b, 1, 2, h, w).astype(np.float32)),
        "valids": jnp.ones((b, 1, 1, h, w), jnp.float32),
    }
    out = model.forward(model.params, inputs, training=True)
    assert out["flow_preds"].shape[0] == 2
    assert np.isfinite(float(model.loss_fn(out, inputs)))
