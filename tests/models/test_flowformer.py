"""FlowFormer parity tests against reference modules (timm stubbed)."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.flowformer import flowformer as jff_pkg
from ptlflow_tpu.models.flowformer.flowformer import (
    CostPatchEmbed, CrossAttentionLayerDec, LocallyGroupedAttnRPEContext,
    GlobalSubSampleAttnRPEContext, SelfAttentionLayer,
    linear_position_embedding_sine)
from ptlflow_tpu.models.flowformer.twins_tpu import (Block as JTwinsBlock)

REF = "/root/reference/ptlflow/models/flowformer"


def _install_timm_stub():
    """Install (or enrich) a comprehensive fake ``timm`` covering every
    reference oracle in this test suite.  Merging + idempotent: safe to call
    from any fixture in any order."""
    timm = sys.modules.get("timm")
    if getattr(timm, "_ptlflow_rich", False):
        return
    timm = timm or types.ModuleType("timm")
    timm._ptlflow_rich = True
    layers = types.ModuleType("timm.layers")

    class Mlp(torch.nn.Module):
        def __init__(self, in_features, hidden_features=None,
                     out_features=None, act_layer=torch.nn.GELU, drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = torch.nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = torch.nn.Linear(hidden_features, out_features)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    class DropPath(torch.nn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    def trunc_normal_(t, std=1.0):
        with torch.no_grad():
            t.normal_(0, std)
        return t

    layers.Mlp = Mlp
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    data = types.ModuleType("timm.data")
    data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    models = types.ModuleType("timm.models")
    vt = types.ModuleType("timm.models.vision_transformer")

    class Attention(torch.nn.Module):
        """Functioning modern-timm ViT attention (fused qkv)."""

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
            qkv = self.qkv(x).reshape(b, n, 3, h, c // h).permute(
                2, 0, 3, 1, 4)
            q, k, v = qkv.unbind(0)
            attn = (q * self.scale) @ k.transpose(-2, -1)
            attn = attn.softmax(dim=-1)
            x = (attn @ v).transpose(1, 2).reshape(b, n, c)
            return self.proj(x)

    vt.Attention = Attention
    vt.Mlp = Mlp
    models.vision_transformer = vt
    fx = types.ModuleType("timm.models.fx_features")
    fx.register_notrace_module = lambda cls: cls
    registry = types.ModuleType("timm.models.registry")
    registry.register_model = lambda fn: fn
    helpers = types.ModuleType("timm.models.helpers")
    helpers.build_model_with_cfg = lambda *a, **k: None
    models.fx_features = fx
    models.registry = registry
    models.helpers = helpers
    mlayers = types.ModuleType("timm.models.layers")
    for sym in ("Mlp", "DropPath", "to_2tuple", "trunc_normal_"):
        setattr(mlayers, sym, getattr(layers, sym))
    models.layers = mlayers
    timm.layers = layers
    timm.data = data
    timm.models = models
    sys.modules.update({
        "timm": timm, "timm.layers": layers, "timm.data": data,
        "timm.models": models, "timm.models.vision_transformer": vt,
        "timm.models.layers": mlayers,
        "timm.models.fx_features": fx, "timm.models.registry": registry,
        "timm.models.helpers": helpers})


@pytest.fixture(scope="module")
def ref():
    _install_timm_stub()
    pkg = types.ModuleType("refff")
    pkg.__path__ = [REF]
    sys.modules["refff"] = pkg
    mods = {}
    for name in ["utils", "attention", "twins"]:
        spec = importlib.util.spec_from_file_location(
            f"refff.{name}", f"{REF}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refff.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def test_linear_position_embedding(ref):
    rng = np.random.RandomState(0)
    x = rng.randn(3, 5, 2).astype(np.float32) * 50
    refv = ref["attention"].LinearPositionEmbeddingSine(
        torch.from_numpy(x), dim=64).numpy()
    out = linear_position_embedding_sine(jnp.asarray(x), dim=64)
    np.testing.assert_allclose(np.asarray(out), refv, atol=1e-5)


def test_locally_grouped_rpe_context_parity(ref):
    torch.manual_seed(0)
    t_attn = ref["twins"].LocallyGroupedAttnRPEContext(
        64, num_heads=8, ws=4, vert_c_dim=32).eval()
    j_attn = LocallyGroupedAttnRPEContext(64, num_heads=8, ws=4,
                                          vert_c_dim=32)
    params = j_attn.from_torch(_sd(t_attn))
    rng = np.random.RandomState(1)
    b0, h, w = 1, 8, 12
    K = 2  # latent tokens folded into batch
    x = rng.randn(b0 * K, h * w, 64).astype(np.float32)
    ctx = rng.randn(b0, 256, h, w).astype(np.float32)
    with torch.no_grad():
        refv = t_attn(torch.from_numpy(x), (h, w),
                      torch.from_numpy(ctx)).numpy()
    out = j_attn(params, jnp.asarray(x), (h, w),
                 jnp.asarray(np.transpose(ctx, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), refv, atol=1e-4)


def test_global_subsample_rpe_context_parity(ref):
    torch.manual_seed(1)
    t_attn = ref["twins"].GlobalSubSampleAttnRPEContext(
        64, num_heads=8, sr_ratio=4, vert_c_dim=32).eval()
    j_attn = GlobalSubSampleAttnRPEContext(64, num_heads=8, sr_ratio=4,
                                           vert_c_dim=32)
    params = j_attn.from_torch(_sd(t_attn))
    rng = np.random.RandomState(2)
    b0, h, w = 1, 8, 12
    x = rng.randn(b0 * 2, h * w, 64).astype(np.float32)
    ctx = rng.randn(b0, 256, h, w).astype(np.float32)
    with torch.no_grad():
        refv = t_attn(torch.from_numpy(x), (h, w),
                      torch.from_numpy(ctx)).numpy()
    out = j_attn(params, jnp.asarray(x), (h, w),
                 jnp.asarray(np.transpose(ctx, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), refv, atol=1e-4)


def test_twins_backbone_block_parity(ref):
    """timm-style fused-qkv blocks vs the vendored timm copy (twins_ft)."""
    _install_timm_stub()
    spec = importlib.util.spec_from_file_location(
        "refff.twins_ft",
        "/root/reference/ptlflow/models/flowformerplusplus/FlowFormer/twins_ft.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refff.twins_ft"] = mod
    try:
        spec.loader.exec_module(mod)
    except Exception as e:
        pytest.skip(f"cannot import vendored twins_ft: {e}")

    torch.manual_seed(3)
    for ws, sr in ((7, 1), (1, 4)):
        t_blk = mod.Block(dim=64, num_heads=4, mlp_ratio=4, sr_ratio=sr,
                          ws=ws).eval()
        j_blk = JTwinsBlock(64, 4, 4.0, sr_ratio=sr, ws=ws)
        params = j_blk.from_torch(_sd(t_blk))
        rng = np.random.RandomState(4)
        h, w = 14, 21
        x = rng.randn(1, h * w, 64).astype(np.float32)
        with torch.no_grad():
            refv = t_blk(torch.from_numpy(x), (h, w)).numpy()
        out = j_blk(params, jnp.asarray(x), (h, w))
        np.testing.assert_allclose(np.asarray(out), refv, atol=1e-4,
                                   err_msg=f"ws={ws}")


def test_flowformer_forward():
    model = ptlflow_tpu.get_model(
        "flowformer", args={"decoder_depth": 2, "use_tile_input": False})
    model.init_params()
    rng = np.random.RandomState(5)
    images = rng.rand(1, 2, 3, 128, 128).astype(np.float32)
    out = model({"images": images})
    assert out["flows"].shape == (1, 1, 2, 128, 128)
    assert np.isfinite(np.asarray(out["flows"])).all()


def test_flowformer_tiled_inference():
    model = ptlflow_tpu.get_model(
        "flowformer", args={"decoder_depth": 1, "use_tile_input": True,
                            "tile_height": 64,
                            "train_size": (64, 96)})
    model.init_params()
    rng = np.random.RandomState(6)
    images = rng.rand(1, 2, 3, 84, 116).astype(np.float32)
    out = model.forward(model.params, {"images": jnp.asarray(images)})
    assert out["flows"].shape == (1, 1, 2, 84, 116)
    assert np.isfinite(np.asarray(out["flows"])).all()


def test_flowformer_training_and_loss():
    model = ptlflow_tpu.get_model(
        "flowformer", args={"decoder_depth": 2, "use_tile_input": False})
    model.init_params()
    rng = np.random.RandomState(7)
    b, h, w = 1, 64, 64
    inputs = {
        "images": jnp.asarray(rng.rand(b, 2, 3, h, w).astype(np.float32)),
        "flows": jnp.asarray(rng.randn(b, 1, 2, h, w).astype(np.float32)),
        "valids": jnp.ones((b, 1, 1, h, w), jnp.float32),
    }
    out = model.forward(model.params, inputs, training=True)
    assert out["flow_preds"].shape[0] == 2
    assert np.isfinite(float(model.loss_fn(out, inputs)))
