"""GMFlow parity vs reference torch modules (read-only oracle imports)."""

import importlib
import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.gmflow import backbone as jbackbone
from ptlflow_tpu.models.gmflow import transformer as jtransformer

jgmflow = importlib.import_module("ptlflow_tpu.models.gmflow.gmflow")

REF = "/root/reference/ptlflow/models/gmflow"


@pytest.fixture(scope="module")
def ref():
    pkg = types.ModuleType("refgmf")
    pkg.__path__ = [REF]
    sys.modules["refgmf"] = pkg
    mods = {}
    for name in ["trident_conv", "position", "geometry", "utils",
                 "backbone", "matching", "transformer"]:
        spec = importlib.util.spec_from_file_location(
            f"refgmf.{name}", f"{REF}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refgmf.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def test_cnn_encoder_parity(ref):
    torch.manual_seed(0)
    t_enc = ref["backbone"].CNNEncoder(output_dim=64,
                                       num_output_scales=1).eval()
    j_enc = jbackbone.CNNEncoder(output_dim=64, num_output_scales=1)
    params = j_enc.from_torch(_sd(t_enc))
    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_out = t_enc(torch.from_numpy(x))[0]
    out = j_enc(params, nhwc(x))[0]
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref_out), atol=1e-4)


def test_cnn_encoder_trident_parity(ref):
    torch.manual_seed(1)
    t_enc = ref["backbone"].CNNEncoder(output_dim=32,
                                       num_output_scales=2).eval()
    j_enc = jbackbone.CNNEncoder(output_dim=32, num_output_scales=2)
    params = j_enc.from_torch(_sd(t_enc))
    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_outs = t_enc(torch.from_numpy(x))
    outs = j_enc(params, nhwc(x))
    assert len(outs) == 2
    for o, r in zip(outs, ref_outs):
        np.testing.assert_allclose(np.asarray(o), to_nhwc(r), atol=1e-4)


def test_position_embedding_parity(ref):
    pos_t = ref["position"].PositionEmbeddingSine(num_pos_feats=16)
    x = torch.zeros(1, 32, 6, 8)
    ref_pos = pos_t(x).permute(0, 2, 3, 1)[0].numpy()
    pos = jtransformer.position_embedding_sine(6, 8, 16)
    np.testing.assert_allclose(np.asarray(pos), ref_pos, atol=1e-5)


def test_feature_transformer_parity(ref):
    torch.manual_seed(2)
    t_tr = ref["transformer"].FeatureTransformer(
        num_layers=2, d_model=32, nhead=1, attention_type="swin",
        ffn_dim_expansion=2).eval()
    j_tr = jtransformer.FeatureTransformer(
        num_layers=2, d_model=32, nhead=1, attention_type="swin",
        ffn_dim_expansion=2)
    params = j_tr.from_torch(_sd(t_tr))
    rng = np.random.RandomState(2)
    f0 = rng.randn(1, 32, 8, 12).astype(np.float32)
    f1 = rng.randn(1, 32, 8, 12).astype(np.float32)
    with torch.no_grad():
        r0, r1 = t_tr(torch.from_numpy(f0), torch.from_numpy(f1),
                      attn_num_splits=2)
    o0, o1 = j_tr(params, nhwc(f0), nhwc(f1), attn_num_splits=2)
    np.testing.assert_allclose(np.asarray(o0), to_nhwc(r0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(o1), to_nhwc(r1), atol=1e-4)


def test_global_correlation_softmax_parity(ref):
    rng = np.random.RandomState(3)
    f0 = rng.randn(2, 16, 6, 8).astype(np.float32)
    f1 = rng.randn(2, 16, 6, 8).astype(np.float32)
    with torch.no_grad():
        ref_flow, _ = ref["matching"].global_correlation_softmax(
            torch.from_numpy(f0), torch.from_numpy(f1))
    flow, _ = jgmflow.global_correlation_softmax(nhwc(f0), nhwc(f1))
    np.testing.assert_allclose(np.asarray(flow), to_nhwc(ref_flow),
                               atol=1e-4)


def test_local_correlation_softmax_parity(ref):
    rng = np.random.RandomState(4)
    f0 = rng.randn(1, 16, 8, 10).astype(np.float32)
    f1 = rng.randn(1, 16, 8, 10).astype(np.float32)
    with torch.no_grad():
        ref_flow, _ = ref["matching"].local_correlation_softmax(
            torch.from_numpy(f0), torch.from_numpy(f1), 2)
    flow, _ = jgmflow.local_correlation_softmax(nhwc(f0), nhwc(f1), 2)
    np.testing.assert_allclose(np.asarray(flow), to_nhwc(ref_flow),
                               atol=1e-4)


def test_flow_attention_parity(ref):
    torch.manual_seed(5)
    t_attn = ref["transformer"].FeatureFlowAttention(in_channels=32).eval()
    j_attn = jtransformer.FeatureFlowAttention(in_channels=32)
    params = j_attn.from_torch(_sd(t_attn))
    rng = np.random.RandomState(5)
    feat = rng.randn(1, 32, 6, 8).astype(np.float32)
    flow = rng.randn(1, 2, 6, 8).astype(np.float32)
    with torch.no_grad():
        ref_g = t_attn(torch.from_numpy(feat), torch.from_numpy(flow))
        ref_l = t_attn(torch.from_numpy(feat), torch.from_numpy(flow),
                       local_window_attn=True, local_window_radius=1)
    out_g = j_attn(params, nhwc(feat), nhwc(flow))
    out_l = j_attn(params, nhwc(feat), nhwc(flow), local_window_attn=True,
                   local_window_radius=1)
    np.testing.assert_allclose(np.asarray(out_g), to_nhwc(ref_g), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_l), to_nhwc(ref_l), atol=1e-4)


@pytest.mark.parametrize("name", ["gmflow", "gmflow_refine"])
def test_gmflow_forward_shapes(name):
    model = ptlflow_tpu.get_model(name)
    model.init_params()
    rng = np.random.RandomState(6)
    images = rng.rand(1, 2, 3, 128, 128).astype(np.float32)
    out = model({"images": images})
    assert out["flows"].shape == (1, 1, 2, 128, 128)
    assert np.isfinite(np.asarray(out["flows"])).all()
