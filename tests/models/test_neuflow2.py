"""NeuFlow2 parity tests vs reference torch modules."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.neuflow2.neuflow2 import (CNNEncoder2,
                                                  FeatureAttention2, Refine,
                                                  UpSample)

REF = "/root/reference/ptlflow/models/neuflow2"


@pytest.fixture(scope="module")
def ref():
    pkg = types.ModuleType("refnf2")
    pkg.__path__ = [REF]
    sys.modules["refnf2"] = pkg
    mods = {}
    for name in ["utils", "backbone_v7", "transformer", "matching", "corr",
                 "refine", "upsample"]:
        spec = importlib.util.spec_from_file_location(
            f"refnf2.{name}", f"{REF}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refnf2.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def test_backbone_parity(ref):
    torch.manual_seed(0)
    t_bb = ref["backbone_v7"].CNNEncoder(64, 32, 64, 32).eval()
    t_bb.init_bhwd(2, 64 // 16, 96 // 16, "cpu", False)
    j_bb = CNNEncoder2(64, 32, 64, 32)
    params = j_bb.from_torch(_sd(t_bb))
    rng = np.random.RandomState(0)
    img = rng.rand(2, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        t16, t8 = t_bb(torch.from_numpy(img))
    j16, j8 = j_bb(params, nhwc(img))
    np.testing.assert_allclose(np.asarray(j16), to_nhwc(t16), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j8), to_nhwc(t8), atol=1e-4)


def test_feature_attention_parity(ref):
    torch.manual_seed(1)
    t_attn = ref["transformer"].FeatureAttention(
        96, num_layers=2, ffn=True, ffn_dim_expansion=1,
        post_norm=True).eval()
    j_attn = FeatureAttention2(96, num_layers=2, ffn=True,
                               ffn_dim_expansion=1, post_norm=True)
    params = j_attn.from_torch(_sd(t_attn))
    rng = np.random.RandomState(1)
    x = rng.randn(2, 96, 8, 12).astype(np.float32)
    with torch.no_grad():
        refv = to_nhwc(t_attn(torch.from_numpy(x)))
    out = j_attn(params, nhwc(x))
    np.testing.assert_allclose(np.asarray(out), refv, atol=1e-4)


def test_refine_parity(ref):
    torch.manual_seed(2)
    t_ref = ref["refine"].Refine(64, 64, num_layers=5, levels=1, radius=4,
                                 inter_dim=96).eval()
    t_ref.init_bhwd(1, 8, 10, "cpu", False)
    j_ref = Refine(64, 64, num_layers=5, levels=1, radius=4, inter_dim=96)
    params = j_ref.from_torch(_sd(t_ref))
    rng = np.random.RandomState(2)
    b, h, w = 1, 8, 10
    corrs = rng.randn(b, 81, h, w).astype(np.float32)
    ctx = rng.randn(b, 64, h, w).astype(np.float32)
    ictx = rng.randn(b, 64, h, w).astype(np.float32)
    flow = rng.randn(b, 2, h, w).astype(np.float32)
    with torch.no_grad():
        t_ictx, t_delta = t_ref(*(torch.from_numpy(v) for v in
                                  (corrs, ctx, ictx, flow)))
    j_ictx, j_delta = j_ref(params, *(nhwc(v) for v in
                                      (corrs, ctx, ictx, flow)))
    np.testing.assert_allclose(np.asarray(j_ictx), to_nhwc(t_ictx),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_delta), to_nhwc(t_delta),
                               atol=1e-4)


def test_corr_block_parity(ref):
    torch.manual_seed(3)
    rng = np.random.RandomState(3)
    b, c, h, w = 1, 64, 8, 10
    f0 = rng.randn(b, c, h, w).astype(np.float32)
    f1 = rng.randn(b, c, h, w).astype(np.float32)
    flow = 2 * rng.randn(b, 2, h, w).astype(np.float32)
    t_cb = ref["corr"].CorrBlock(radius=4, levels=1)
    t_cb.init_bhwd(b, h, w, "cpu", False)
    with torch.no_grad():
        pyr = t_cb.init_corr_pyr(torch.from_numpy(f0), torch.from_numpy(f1))
        refv = t_cb(pyr, torch.from_numpy(flow)).numpy()
    from ptlflow_tpu.ops.correlation import CorrBlock, coords_grid
    j_cb = CorrBlock(nhwc(f0), nhwc(f1), num_levels=1, radius=4)
    coords = coords_grid(b, h, w) + nhwc(flow)
    out = j_cb(coords)
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(refv, (0, 2, 3, 1)), atol=1e-4)


def test_upsample_parity(ref):
    torch.manual_seed(4)
    t_up = ref["upsample"].UpSample(32, upsample_factor=8).eval()
    j_up = UpSample(32, upsample_factor=8)
    params = j_up.from_torch(_sd(t_up))
    rng = np.random.RandomState(4)
    feat = rng.randn(1, 32, 8, 10).astype(np.float32)
    flow = rng.randn(1, 2, 8, 10).astype(np.float32)
    with torch.no_grad():
        refv = to_nhwc(t_up(torch.from_numpy(feat),
                            torch.from_numpy(flow)) * 8)
    out = j_up(params, nhwc(feat), nhwc(flow))
    np.testing.assert_allclose(np.asarray(out), refv, atol=1e-4)


def test_neuflow2_training_and_loss():
    model = ptlflow_tpu.get_model("neuflow2", args={"iters_s8": 2})
    model.init_params()
    rng = np.random.RandomState(5)
    b, h, w = 1, 64, 64
    inputs = {
        "images": jnp.asarray(rng.rand(b, 2, 3, h, w).astype(np.float32)),
        "flows": jnp.asarray(rng.randn(b, 1, 2, h, w).astype(np.float32)),
        "valids": jnp.ones((b, 1, 1, h, w), jnp.float32),
    }
    out = model.forward(model.params, inputs, training=True)
    assert len(out["flow_preds"]) == 3
    assert np.isfinite(float(model.loss_fn(out, inputs)))
