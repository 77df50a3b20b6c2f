"""SKFlow parity (PCBlock/update vs reference) + forward smoke."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.skflow.skflow import (
    PCBlock4_Deep_nopool_res, SKUpdateBlock6_Deep_nopoolres_AllDecoder)

REF = "/root/reference/ptlflow/models/skflow"


@pytest.fixture(scope="module")
def ref_update():
    pkg = types.ModuleType("refsk")
    pkg.__path__ = [REF]
    sys.modules["refsk"] = pkg
    for name in ["gma", "update"]:
        spec = importlib.util.spec_from_file_location(
            f"refsk.{name}", f"{REF}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refsk.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["refsk.update"]


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def test_pcblock_parity(ref_update):
    torch.manual_seed(0)
    t_blk = ref_update.PCBlock4_Deep_nopool_res(32, 16, k_conv=(1, 7)).eval()
    j_blk = PCBlock4_Deep_nopool_res(32, 16, k_conv=(1, 7))
    params = j_blk.from_torch(_sd(t_blk))
    rng = np.random.RandomState(0)
    x = rng.randn(1, 32, 10, 12).astype(np.float32)
    with torch.no_grad():
        ref = to_nhwc(t_blk(torch.from_numpy(x)))
    out = j_blk(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_sk_update_block_parity(ref_update):
    torch.manual_seed(1)
    t_blk = ref_update.SKUpdateBlock6_Deep_nopoolres_AllDecoder(
        4, 4, k_conv=(1, 7), PCUpdater_conv=(1, 5), num_heads=1,
        hidden_dim=128).eval()
    j_blk = SKUpdateBlock6_Deep_nopoolres_AllDecoder(
        4, 4, k_conv=(1, 7), PCUpdater_conv=(1, 5), num_heads=1,
        hidden_dim=128)
    params = j_blk.from_torch(_sd(t_blk))
    rng = np.random.RandomState(1)
    b, h, w = 1, 6, 8
    net = rng.randn(b, 128, h, w).astype(np.float32)
    inp = rng.randn(b, 128, h, w).astype(np.float32)
    corr = rng.randn(b, 4 * 81, h, w).astype(np.float32)
    flow = rng.randn(b, 2, h, w).astype(np.float32)
    attn = np.abs(rng.rand(b, 1, h * w, h * w)).astype(np.float32)
    attn = attn / attn.sum(-1, keepdims=True)
    with torch.no_grad():
        t_net, t_mask, t_delta = t_blk(
            *(torch.from_numpy(v) for v in (net, inp, corr, flow)),
            torch.from_numpy(attn))
    j_net, j_mask, j_delta = j_blk(
        params,
        *(jnp.asarray(np.transpose(v, (0, 2, 3, 1))) for v in
          (net, inp, corr, flow)), jnp.asarray(attn))
    np.testing.assert_allclose(np.asarray(j_net), to_nhwc(t_net), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_delta), to_nhwc(t_delta),
                               atol=1e-4)


def test_skflow_forward():
    model = ptlflow_tpu.get_model("skflow", args={"iters": 2})
    model.init_params()
    rng = np.random.RandomState(2)
    images = rng.rand(1, 2, 3, 128, 128).astype(np.float32)
    out = model({"images": images})
    assert out["flows"].shape == (1, 1, 2, 128, 128)
    assert np.isfinite(np.asarray(out["flows"])).all()
