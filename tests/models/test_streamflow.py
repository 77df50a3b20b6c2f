"""StreamFlow parity vs reference torch modules (timm stubbed with faithful
minimal implementations of Attention/Mlp/DropPath)."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.streamflow.streamflow import (
    ContentAttention, PCBlock4_Deep_nopool_res as JPCBlock,
    SKMotionEncoder6_Deep_nopool_res as JSKEncoder,
    SKUpdateBlock_TAM_v3 as JSKUpdate, TransformerBlock as JTransformerBlock)

REF = "/root/reference/ptlflow/models/streamflow"


class _TimmAttention(torch.nn.Module):
    """timm vision_transformer.Attention (modern signature)."""

    def __init__(self, dim, num_heads=8, qkv_bias=False, qk_norm=False,
                 attn_drop=0.0, proj_drop=0.0, norm_layer=None):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = torch.nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = torch.nn.Linear(dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        h = self.num_heads
        qkv = self.qkv(x).reshape(b, n, 3, h, c // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(x)


class _TimmMlp(torch.nn.Module):
    def __init__(self, in_features, hidden_features=None, act_layer=None,
                 drop=0.0):
        super().__init__()
        hidden_features = hidden_features or in_features
        self.fc1 = torch.nn.Linear(in_features, hidden_features)
        self.act = torch.nn.GELU()
        self.fc2 = torch.nn.Linear(hidden_features, in_features)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class _DropPath(torch.nn.Module):
    def __init__(self, p=0.0):
        super().__init__()

    def forward(self, x):
        return x


@pytest.fixture(scope="module")
def ref():
    from tests.models.test_flowformer import _install_timm_stub

    _install_timm_stub()

    pkg = types.ModuleType("refst")
    pkg.__path__ = [REF]
    sys.modules["refst"] = pkg

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    gma = load("refst.gma", f"{REF}/gma.py")
    upd = load("refst.update", f"{REF}/update.py")
    return types.SimpleNamespace(gma=gma, upd=upd)


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def test_pcblock_parity(ref):
    torch.manual_seed(0)
    t = ref.upd.PCBlock4_Deep_nopool_res(16, 8, k_conv=[1, 7]).eval()
    j = JPCBlock(16, 8, k_conv=[1, 7])
    params = j.from_torch(_sd(t))
    rng = np.random.RandomState(0)
    x = rng.randn(1, 16, 10, 12).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x)).numpy()
    got = j(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(got),
                               np.transpose(want, (0, 2, 3, 1)), atol=1e-4)


def test_sk_motion_encoder_parity(ref):
    torch.manual_seed(1)
    t = ref.upd.SKMotionEncoder6_Deep_nopool_res(
        decoder_dim=256, corr_levels=4, corr_radius=4,
        k_conv=[1, 15]).eval()
    j = JSKEncoder(decoder_dim=256, corr_levels=4, corr_radius=4,
                   k_conv=[1, 15])
    params = j.from_torch(_sd(t))
    rng = np.random.RandomState(1)
    flow = rng.randn(1, 2, 6, 8).astype(np.float32)
    corr = rng.randn(1, 324, 6, 8).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(flow), torch.from_numpy(corr)).numpy()
    got = j(params, jnp.asarray(np.transpose(flow, (0, 2, 3, 1))),
            jnp.asarray(np.transpose(corr, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(got),
                               np.transpose(want, (0, 2, 3, 1)), atol=1e-3)


def test_sk_update_block_parity(ref):
    torch.manual_seed(2)
    t = ref.upd.SKUpdateBlock_TAM_v3(
        decoder_dim=256, num_heads=1, use_gma=True, pcupdater_conv=[1, 7],
        corr_levels=4, corr_radius=4, T=4, k_conv=[1, 15]).eval()
    j = JSKUpdate(decoder_dim=256, num_heads=1, use_gma=True,
                  pcupdater_conv=[1, 7], corr_levels=4, corr_radius=4, T=4,
                  k_conv=[1, 15])
    params = j.from_torch(_sd(t))
    from ptlflow_tpu.nn import count_parameters, split_trainable

    tr, _ = split_trainable(params, ())
    t_count = sum(p.numel() for p in t.parameters())
    assert count_parameters(tr) == t_count

    rng = np.random.RandomState(2)
    b, tp, h, w = 1, 3, 4, 5
    bt = b * tp
    hw = h * w
    nets = rng.randn(bt, 128, h, w).astype(np.float32)
    inps = rng.randn(bt, 128, h, w).astype(np.float32)
    corrs = rng.randn(bt, 324, h, w).astype(np.float32)
    flows = rng.randn(bt, 2, h, w).astype(np.float32)
    attn = np.abs(rng.rand(bt, 1, hw, hw)).astype(np.float32)
    attn = attn / attn.sum(-1, keepdims=True)
    with torch.no_grad():
        tn, tm, td = t(*(torch.from_numpy(v) for v in
                         (nets, inps, corrs, flows, attn)), T=tp)
    jn, jm, jd = j(params,
                   *(jnp.asarray(np.transpose(v, (0, 2, 3, 1))) for v in
                     (nets, inps, corrs, flows)),
                   jnp.asarray(attn), t_pairs=tp)
    np.testing.assert_allclose(np.asarray(jn), to_nhwc(tn), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(jd), td.permute(0, 1, 3, 4, 2).numpy(), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(jm), tm.permute(0, 1, 3, 4, 2).numpy(), atol=1e-3)


def test_content_attention_parity(ref):
    torch.manual_seed(3)
    t = ref.gma.Attention(dim=32, heads=1, dim_head=32).eval()
    j = ContentAttention(dim=32, heads=1, dim_head=32)
    params = j.from_torch(_sd(t))
    rng = np.random.RandomState(3)
    x = rng.randn(2, 32, 5, 6).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x)).numpy()
    got = j(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_streamflow_forward_shapes():
    model = ptlflow_tpu.get_model("streamflow", args={"iters": 2})
    model.init_params()
    rng = np.random.RandomState(4)
    images = rng.rand(1, 4, 3, 64, 64).astype(np.float32)
    out = model({"images": images})
    assert out["flows"].shape == (1, 3, 2, 64, 64)
    assert np.isfinite(np.asarray(out["flows"])).all()
