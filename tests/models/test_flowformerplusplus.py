"""FlowFormer++ parity vs the reference PerCostFormer3 decoder (timm/ptlflow
stubbed so the oracle runs standalone on CPU)."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.flowformerplusplus.flowformerplusplus import (
    CrossAttentionLayerDecPP, MemoryDecoderPP)

REF = "/root/reference/ptlflow/models/flowformerplusplus/FlowFormer/" \
    "PerCostFormer3"


@pytest.fixture(scope="module")
def ref():
    from tests.models.test_flowformer import _install_timm_stub

    _install_timm_stub()
    pu = types.ModuleType("ptlflow.utils.utils")
    pu.forward_interpolate_batch = lambda x: x
    sys.modules.setdefault("ptlflow", types.ModuleType("ptlflow"))
    sys.modules["ptlflow.utils"] = types.ModuleType("ptlflow.utils")
    sys.modules["ptlflow.utils.utils"] = pu

    base = "/root/reference/ptlflow/models/flowformerplusplus"
    for name, path in (("refpp", base), ("refpp.FlowFormer",
                                         f"{base}/FlowFormer"),
                       ("refpp.FlowFormer.PerCostFormer3", REF)):
        m = types.ModuleType(name)
        m.__path__ = [path]
        sys.modules[name] = m

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("refpp.utils", f"{base}/utils.py")
    load("refpp.FlowFormer.PerCostFormer3.attention", f"{REF}/attention.py")
    load("refpp.FlowFormer.PerCostFormer3.gma", f"{REF}/gma.py")
    load("refpp.FlowFormer.PerCostFormer3.gru", f"{REF}/gru.py")
    load("refpp.FlowFormer.PerCostFormer3.sk", f"{REF}/sk.py")
    dec = load("refpp.FlowFormer.PerCostFormer3.decoder", f"{REF}/decoder.py")
    return types.SimpleNamespace(dec=dec)


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def test_cross_attention_dec_pp_parity(ref):
    torch.manual_seed(0)
    t = ref.dec.CrossAttentionLayer(64, 64, 64, 128, flow_or_pe="and",
                                    pe="linear").eval()
    j = CrossAttentionLayerDecPP(64, 64, 64, 128, add_flow_token=True)
    params = j.from_torch(_sd(t))
    rng = np.random.RandomState(0)
    b, h1, w1, k = 1, 3, 4, 8
    query = rng.randn(b * h1 * w1, 1, 64).astype(np.float32)
    memory = rng.randn(b * h1 * w1, k, 128).astype(np.float32)
    coord = rng.rand(b, 2, h1, w1).astype(np.float32) * 4
    with torch.no_grad():
        want, tk, tv = t(torch.from_numpy(query), None, None,
                         torch.from_numpy(memory), torch.from_numpy(coord),
                         8, (2, 2))
    key = j.k(params["k"], jnp.asarray(memory))
    value = j.v(params["v"], jnp.asarray(memory))
    got = j(params, jnp.asarray(query), key, value,
            jnp.asarray(np.transpose(coord, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4)


def test_decoder_param_count(ref):
    torch.manual_seed(1)
    t = ref.dec.MemoryDecoder(
        gma="GMA", use_patch=False, detach_local=False, use_rpe=False,
        r_16=-1, quater_refine=False, fix_pe=False, gt_r=15, query_num=0,
        no_border=False, W_offset=0, H_offset=0, query_latent_dim=64,
        cost_latent_input_dim=64, cost_heads_num=1, encoder_latent_dim=256,
        decoder_depth=2, cost_latent_dim=128, patch_size=8,
        flow_or_pe="and", dropout=0.0, pe="linear", no_sc=False)
    j = MemoryDecoderPP(query_latent_dim=64, cost_heads_num=1,
                        decoder_depth=2, patch_size=8, cost_latent_dim=128,
                        encoder_latent_dim=256, dropout=0.0)
    params = j.from_torch(_sd(t))
    from ptlflow_tpu.nn import count_parameters, split_trainable

    tr, _ = split_trainable(params, ())
    t_count = sum(p.numel() for p in t.parameters())
    assert count_parameters(tr) == t_count


def test_flowformer_pp_forward_shapes():
    model = ptlflow_tpu.get_model(
        "flowformer_pp", args={"decoder_depth": 2, "use_tile_input": False})
    model.init_params()
    rng = np.random.RandomState(2)
    images = rng.rand(1, 2, 3, 128, 128).astype(np.float32)
    out = model({"images": images})
    assert out["flows"].shape == (1, 1, 2, 128, 128)
    assert np.isfinite(np.asarray(out["flows"])).all()
