"""MemFlow parity tests vs reference torch modules."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.memflow.memflow import (SKUpdateBlockMem,
                                                add_memory, empty_memory,
                                                match_memory)

REF = "/root/reference/ptlflow/models/memflow"


@pytest.fixture(scope="module")
def ref():
    pkg = types.ModuleType("refmem")
    pkg.__path__ = [REF]
    sys.modules["refmem"] = pkg
    sub = types.ModuleType("refmem.MemFlowNet")
    sub.__path__ = [f"{REF}/MemFlowNet"]
    sys.modules["refmem.MemFlowNet"] = sub
    mods = {}
    for name in ["MemFlowNet.gma", "MemFlowNet.memory_util",
                 "MemFlowNet.sk2", "kv_memory_store",
                 "memory_manager_skflow"]:
        spec = importlib.util.spec_from_file_location(
            f"refmem.{name}", f"{REF}/{name.replace('.', '/')}.py")
        mod = importlib.util.module_from_spec(spec)
        mod.__package__ = "refmem." + name.rsplit(".", 1)[0] \
            if "." in name else "refmem"
        sys.modules[f"refmem.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name.split(".")[-1]] = mod
    return mods


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def test_update_block_parity(ref):
    torch.manual_seed(0)
    t_u = ref["sk2"].SKUpdateBlock6_Deep_nopoolres_AllDecoder2_Mem_skflow(
        corr_radius=4, corr_levels=4, cost_heads_num=1,
        hidden_dim=128).eval()
    j_u = SKUpdateBlockMem(4, 4, hidden_dim=128)
    params = j_u.from_torch(_sd(t_u))
    rng = np.random.RandomState(0)
    b, h, w = 1, 8, 10
    flow = rng.randn(b, 2, h, w).astype(np.float32)
    corr = rng.randn(b, 324, h, w).astype(np.float32)
    net = rng.randn(b, 128, h, w).astype(np.float32)
    inp = rng.randn(b, 128, h, w).astype(np.float32)
    mf_g = rng.randn(b, 128, h, w).astype(np.float32)
    with torch.no_grad():
        t_mf, t_val = t_u.get_motion_and_value(torch.from_numpy(flow),
                                               torch.from_numpy(corr))
        t_net, t_mask, t_delta = t_u(
            torch.from_numpy(net), torch.from_numpy(inp), t_mf,
            torch.from_numpy(mf_g))
    j_mf, j_val = j_u.get_motion_and_value(params, nhwc(flow), nhwc(corr))
    j_net, j_mask, j_delta = j_u(params, nhwc(net), nhwc(inp), j_mf,
                                 nhwc(mf_g))
    np.testing.assert_allclose(np.asarray(j_mf), to_nhwc(t_mf), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_val), to_nhwc(t_val), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_net), to_nhwc(t_net), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_mask), to_nhwc(t_mask),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_delta), to_nhwc(t_delta),
                               atol=1e-4)


@pytest.mark.parametrize("n_stored", [0, 1, 2, 3])
def test_match_memory_parity(ref, n_stored):
    """Ring-buffer masked attention == the reference's growing K/V store
    (stored frames capped at 2, as with mem_every=1, max=min=2)."""
    rng = np.random.RandomState(10 + n_stored)
    b, c, h, w = 1, 128, 6, 8
    hw = h * w
    train_avg_length = 6750
    scale = 128 ** -0.5

    t_mm = ref["memory_manager_skflow"].MemoryManager(
        train_avg_length=train_avg_length, enable_long_term=False,
        enable_long_term_count_usage=False, top_k=None,
        max_mid_term_frames=2, min_mid_term_frames=2)
    j_mem = empty_memory(b, hw, 2, c, c)
    for _ in range(n_stored):
        k = rng.randn(b, c, h, w).astype(np.float32)
        v = rng.randn(b, c, h, w).astype(np.float32)
        t_mm.add_memory(torch.from_numpy(k), torch.from_numpy(v))
        j_mem = add_memory(j_mem, nhwc(k), nhwc(v))

    query = rng.randn(b, c, h, w).astype(np.float32)
    cur_k = rng.randn(b, c, h, w).astype(np.float32)
    cur_v = rng.randn(b, c, h, w).astype(np.float32)
    with torch.no_grad():
        t_out = t_mm.match_memory(torch.from_numpy(query),
                                  torch.from_numpy(cur_k),
                                  torch.from_numpy(cur_v), scale=scale)
    j_out = match_memory(nhwc(query), nhwc(cur_k), nhwc(cur_v), j_mem,
                         scale, train_avg_length)
    np.testing.assert_allclose(np.asarray(j_out), to_nhwc(t_out), atol=1e-3)


@pytest.mark.parametrize("name", ["memflow", "memflow_t"])
def test_memflow_forward_and_loss(name):
    model = ptlflow_tpu.get_model(name, args={"decoder_depth": 2})
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
    assert outt["flow_preds"].shape[0] == 2
    assert np.isfinite(float(model.loss_fn(outt, inputs)))


def test_memflow_streaming_memory():
    """Memory accumulates across frames and resets on is_seq_start."""
    model = ptlflow_tpu.get_model("memflow", args={"decoder_depth": 1})
    model.init_params()
    rng = np.random.RandomState(6)
    images = rng.rand(1, 2, 3, 32, 48).astype(np.float32)
    for t in range(3):
        meta = {"is_seq_start": t == 0, "is_seq_end": t == 2}
        out = model.infer({"images": images, "meta": meta})
        assert np.isfinite(np.asarray(out["flows"])).all()
        expect = min(t + 1, 2) if t < 2 else 2
        assert int(model._memory["count"]) == expect, \
            f"frame {t}: count {int(model._memory['count'])} != {expect}"
    # restart
    out = model.infer({"images": images,
                       "meta": {"is_seq_start": True, "is_seq_end": False}})
    assert int(model._memory["count"]) == 1
