"""UniMatch parity tests vs reference torch modules."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.gmflow.transformer import FeatureTransformer
from ptlflow_tpu.models.unimatch.unimatch import (BasicUpdateBlock,
                                                  local_correlation_with_flow)

REF = "/root/reference/ptlflow/models/unimatch"


@pytest.fixture(scope="module")
def ref():
    pkg = types.ModuleType("refuni")
    pkg.__path__ = [REF]
    sys.modules["refuni"] = pkg
    mods = {}
    for name in ["trident_conv", "position", "geometry", "utils",
                 "backbone", "attention", "matching", "transformer",
                 "reg_refine"]:
        spec = importlib.util.spec_from_file_location(
            f"refuni.{name}", f"{REF}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refuni.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def test_unimatch_transformer_parity(ref):
    """unimatch's transformer (swin path) == gmflow's implementation."""
    torch.manual_seed(0)
    t_tf = ref["transformer"].FeatureTransformer(
        num_layers=2, d_model=64, nhead=1, ffn_dim_expansion=2).eval()
    j_tf = FeatureTransformer(num_layers=2, d_model=64, nhead=1,
                              attention_type="swin", ffn_dim_expansion=2)
    params = j_tf.from_torch(_sd(t_tf))
    rng = np.random.RandomState(0)
    f0 = rng.randn(1, 64, 16, 24).astype(np.float32)
    f1 = rng.randn(1, 64, 16, 24).astype(np.float32)
    with torch.no_grad():
        t0, t1 = t_tf(torch.from_numpy(f0), torch.from_numpy(f1),
                      attn_type="swin", attn_num_splits=2)
    j0, j1 = j_tf(params, nhwc(f0), nhwc(f1), attn_num_splits=2)
    np.testing.assert_allclose(np.asarray(j0), to_nhwc(t0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j1), to_nhwc(t1), atol=1e-4)


def test_local_correlation_with_flow_parity(ref):
    rng = np.random.RandomState(1)
    f0 = rng.randn(1, 32, 12, 16).astype(np.float32)
    f1 = rng.randn(1, 32, 12, 16).astype(np.float32)
    flow = 2 * rng.randn(1, 2, 12, 16).astype(np.float32)
    with torch.no_grad():
        refv = ref["matching"].local_correlation_with_flow(
            torch.from_numpy(f0), torch.from_numpy(f1),
            torch.from_numpy(flow), local_radius=4).numpy()
    out = local_correlation_with_flow(nhwc(f0), nhwc(f1), nhwc(flow),
                                      local_radius=4)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(torch.from_numpy(refv)),
                               atol=1e-4)


def test_basic_update_block_parity(ref):
    torch.manual_seed(2)
    t_blk = ref["reg_refine"].BasicUpdateBlock(
        corr_channels=81, downsample_factor=4, flow_dim=2,
        bilinear_up=False).eval()
    j_blk = BasicUpdateBlock(corr_channels=81, downsample_factor=4,
                             flow_dim=2, bilinear_up=False)
    params = j_blk.from_torch(_sd(t_blk))
    rng = np.random.RandomState(2)
    b, h, w = 1, 8, 10
    net = rng.randn(b, 128, h, w).astype(np.float32)
    inp = rng.randn(b, 128, h, w).astype(np.float32)
    corr = rng.randn(b, 81, h, w).astype(np.float32)
    flow = rng.randn(b, 2, h, w).astype(np.float32)
    with torch.no_grad():
        t_net, t_mask, t_delta = t_blk(
            *(torch.from_numpy(v) for v in (net, inp, corr, flow)))
    j_net, j_mask, j_delta = j_blk(
        params, *(nhwc(v) for v in (net, inp, corr, flow)))
    np.testing.assert_allclose(np.asarray(j_net), to_nhwc(t_net), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_mask), to_nhwc(t_mask),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_delta), to_nhwc(t_delta),
                               atol=1e-4)


def test_unimatch_ref6_full_forward_parity(ref):
    """Torch oracle replicating reference unimatch.py:176-363 (eval,
    num_scales=2 with regression refinement) vs our model."""
    torch.manual_seed(3)
    t_backbone = ref["backbone"].CNNEncoder(output_dim=128,
                                            num_output_scales=2).eval()
    t_tf = ref["transformer"].FeatureTransformer(
        num_layers=6, d_model=128, nhead=1, ffn_dim_expansion=4).eval()
    t_attn = ref["attention"].SelfAttnPropagation(in_channels=128).eval()
    t_proj = torch.nn.Conv2d(128, 256, 1).eval()
    t_refine = ref["reg_refine"].BasicUpdateBlock(
        corr_channels=81, downsample_factor=4, flow_dim=2,
        bilinear_up=False).eval()

    n_refine = 2
    model = ptlflow_tpu.get_model("unimatch_sc2_ref6",
                                  args={"num_reg_refine": n_refine})
    sd = {}
    for prefix, mod in (("backbone", t_backbone), ("transformer", t_tf),
                        ("feature_flow_attn", t_attn),
                        ("refine_proj", t_proj), ("refine", t_refine)):
        sd.update({f"{prefix}.{k}": v for k, v in _sd(mod).items()})
    model.params = model.from_torch(sd)

    rng = np.random.RandomState(3)
    images = rng.rand(1, 2, 3, 128, 160).astype(np.float32)

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    with torch.no_grad():
        ims = torch.from_numpy(images)
        ims = torch.flip(ims, [2])  # BGR -> RGB
        ims = (ims - mean) / std
        img0, img1 = ims[:, 0], ims[:, 1]
        features = t_backbone(torch.cat((img0, img1), 0))[::-1]
        f0_list = [torch.chunk(f, 2, 0)[0] for f in features]
        f1_list = [torch.chunk(f, 2, 0)[1] for f in features]
        flow = None
        attn_splits_list, corr_radius_list, prop_radius_list = \
            (2, 8), (-1, 4), (-1, 1)
        for scale_idx in range(2):
            feature0, feature1 = f0_list[scale_idx], f1_list[scale_idx]
            feature0_ori, feature1_ori = feature0, feature1
            if scale_idx > 0:
                flow = F.interpolate(flow, scale_factor=2, mode="bilinear",
                                     align_corners=True) * 2
            if flow is not None:
                flow = flow.detach()
                feature1 = ref["geometry"].flow_warp(feature1, flow)
            attn_splits = attn_splits_list[scale_idx]
            corr_radius = corr_radius_list[scale_idx]
            prop_radius = prop_radius_list[scale_idx]
            feature0, feature1 = ref["utils"].feature_add_position(
                feature0, feature1, attn_splits, 128)
            feature0, feature1 = t_tf(feature0, feature1, attn_type="swin",
                                      attn_num_splits=attn_splits)
            if corr_radius == -1:
                flow_pred = ref["matching"].global_correlation_softmax(
                    feature0, feature1, False)[0]
            else:
                flow_pred = ref["matching"].local_correlation_softmax(
                    feature0, feature1, corr_radius)[0]
            flow = flow + flow_pred if flow is not None else flow_pred
            flow = t_attn(feature0, flow.detach(),
                          local_window_attn=prop_radius > 0,
                          local_window_radius=prop_radius)
            if scale_idx == 1:
                for _ in range(n_refine):
                    flow = flow.detach()
                    correlation = ref["matching"].local_correlation_with_flow(
                        feature0_ori, feature1_ori, flow=flow,
                        local_radius=4)
                    proj = t_proj(feature0)
                    net, inp = torch.chunk(proj, chunks=2, dim=1)
                    net = torch.tanh(net)
                    inp = torch.relu(inp)
                    net, up_mask, residual_flow = t_refine(
                        net, inp, correlation, flow.clone())
                    flow = flow + residual_flow
                ref_flow = ref["utils"].upsample_flow_with_mask(
                    flow, up_mask, upsample_factor=4)

    out = model({"images": images})
    got = np.asarray(out["flows"][:, 0])
    # fp noise amplifies measurably through the 12 attention layers and the
    # softmax-argmax correspondence (backbone 2.5e-5 -> transformer 5e-4 ->
    # flow 3e-3 -> x4 convex upsample ~1e-2); check EPE-style statistics
    # instead of elementwise tolerance (components are tested to 1e-4 above)
    diff = np.abs(got - ref_flow.numpy())
    assert diff.mean() < 5e-2, diff.mean()
    assert diff.max() < 1.0, diff.max()


def test_unimatch_training_and_loss():
    model = ptlflow_tpu.get_model("unimatch")
    model.init_params()
    rng = np.random.RandomState(8)
    b, h, w = 1, 64, 64
    inputs = {
        "images": jnp.asarray(rng.rand(b, 2, 3, h, w).astype(np.float32)),
        "flows": jnp.asarray(rng.randn(b, 1, 2, h, w).astype(np.float32)),
        "valids": jnp.ones((b, 1, 1, h, w), jnp.float32),
    }
    out = model.forward(model.params, inputs, training=True)
    assert out["flow_preds"].shape[0] == 2
    assert np.isfinite(float(model.loss_fn(out, inputs)))
