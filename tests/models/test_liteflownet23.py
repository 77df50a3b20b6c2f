"""LiteFlowNet2/3 parity tests vs reference torch modules."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.liteflownet.liteflownet2 import (
    FeatureExtractor2, Matching2, Regularization2, SubPixel2)
from ptlflow_tpu.models.liteflownet.liteflownet3 import (
    CostVolumeModulation, FlowFieldDeformation, Matching3, Regularization3)


@pytest.fixture(scope="module")
def refmods():
    stub = types.ModuleType("ptlflow.utils.registry")
    stub.register_model = lambda c: c
    stub_base = types.ModuleType("ptlflow.models.base_model.base_model")

    class _FakeBase(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    stub_base.BaseModel = _FakeBase

    # real torch sampler fallback from the reference utils
    spec = importlib.util.spec_from_file_location(
        "refcorr", "/root/reference/ptlflow/utils/correlation.py")
    refcorr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(refcorr)
    stub_corr = types.ModuleType("ptlflow.utils.correlation")
    stub_corr.IterSpatialCorrelationSampler = \
        refcorr.IterSpatialCorrelationSampler

    pk = types.ModuleType("ptlflow")
    pk.utils = types.ModuleType("ptlflow.utils")
    pk.models = types.ModuleType("ptlflow.models")
    pk.models.base_model = types.ModuleType("ptlflow.models.base_model")
    lfn_pkg = types.ModuleType("ptlflow.models.liteflownet")
    lfn_pkg.__path__ = ["/root/reference/ptlflow/models/liteflownet"]
    for name, mod in [
        ("ptlflow", pk), ("ptlflow.utils", pk.utils),
        ("ptlflow.utils.registry", stub),
        ("ptlflow.utils.correlation", stub_corr),
        ("ptlflow.models", pk.models),
        ("ptlflow.models.base_model", pk.models.base_model),
        ("ptlflow.models.base_model.base_model", stub_base),
        ("ptlflow.models.liteflownet", lfn_pkg),
    ]:
        sys.modules[name] = mod
    mods = {}
    for name in ["warp", "liteflownet2", "liteflownet3"]:
        spec = importlib.util.spec_from_file_location(
            f"ptlflow.models.liteflownet.{name}",
            f"/root/reference/ptlflow/models/liteflownet/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ptlflow.models.liteflownet.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    yield mods
    for name in list(sys.modules):
        if (name == "ptlflow" or name.startswith("ptlflow.")) and \
                not name.startswith("ptlflow_tpu"):
            del sys.modules[name]


def assert_close_robust(a, b, atol=5e-4, outlier_frac=0.005):
    """The reference warp's validity mask is fp-noise-sensitive (torch
    grid_sample of ones can be 0.9999999 at interior points, zeroing random
    single pixels); allow a small fraction of masked-pixel outliers."""
    diff = np.abs(np.asarray(a) - np.asarray(b))
    ok = diff <= atol
    assert ok.mean() >= 1 - outlier_frac, \
        f"{(~ok).mean():.4%} outliers, max {diff.max()}"
    assert np.median(diff) <= atol


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def feats5(rng, c, h, w):
    return rng.randn(1, 2, c, h, w).astype(np.float32)


def nhwc5(x):
    return jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))


@pytest.mark.parametrize("level,c,stride", [(0, 192, 1), (2, 96, 1),
                                            (3, 64, 2)])
def test_lfn2_matching_parity(refmods, level, c, stride):
    torch.manual_seed(level)
    t_m = refmods["liteflownet2"].Matching(level).eval()
    j_m = Matching2(level)
    params = j_m.from_torch(_sd(t_m))
    rng = np.random.RandomState(level)
    h, w = (8, 10) if level < 3 else (8, 12)
    feats = feats5(rng, c, h, w)
    flow = None if level == 0 else \
        rng.randn(1, 2, h // 2, w // 2).astype(np.float32)
    with torch.no_grad():
        tf = torch.from_numpy(feats)
        refv = t_m(tf, None if flow is None else torch.from_numpy(flow))
    out = j_m(params, nhwc5(feats),
              None if flow is None else
              jnp.asarray(np.transpose(flow, (0, 2, 3, 1))))
    assert_close_robust(out, to_nhwc(refv))


def test_lfn2_regularization_parity(refmods):
    torch.manual_seed(5)
    level = 2
    t_r = refmods["liteflownet2"].Regularization(level).eval()
    j_r = Regularization2(level)
    params = j_r.from_torch(_sd(t_r))
    rng = np.random.RandomState(5)
    h, w = 8, 10
    images = rng.rand(1, 2, 3, h, w).astype(np.float32)
    feats = feats5(rng, 96, h, w)
    flow = rng.randn(1, 2, h, w).astype(np.float32)
    with torch.no_grad():
        t_flow, t_x = t_r(torch.from_numpy(images), torch.from_numpy(feats),
                          torch.from_numpy(flow))
    j_flow, j_x = j_r(params, nhwc5(images), nhwc5(feats),
                      jnp.asarray(np.transpose(flow, (0, 2, 3, 1))))
    assert_close_robust(j_flow, to_nhwc(t_flow))
    assert_close_robust(j_x, to_nhwc(t_x))


@pytest.mark.parametrize("level", [1, 2, 3])
def test_lfn3_deformation_parity(refmods, level):
    torch.manual_seed(6 + level)
    t_d = refmods["liteflownet3"].FlowFieldDeformation(level).eval()
    j_d = FlowFieldDeformation(level)
    params = j_d.from_torch(_sd(t_d))
    rng = np.random.RandomState(6 + level)
    c = [None, 128, 96, 64][level]
    h, w = 12, 14
    feats = feats5(rng, c, h, w)
    flow = rng.randn(1, 2, h // 2, w // 2).astype(np.float32)
    conf = rng.rand(1, 1, h // 2, w // 2).astype(np.float32)
    with torch.no_grad():
        t_flow, t_conf = t_d(torch.from_numpy(feats),
                             torch.from_numpy(flow),
                             torch.from_numpy(conf))
    j_flow, j_conf = j_d(params, nhwc5(feats),
                         jnp.asarray(np.transpose(flow, (0, 2, 3, 1))),
                         jnp.asarray(np.transpose(conf, (0, 2, 3, 1))))
    # the warped-flow output inherits the reference mask's fp noise at
    # interior points (see assert_close_robust); allow sparse outliers
    assert_close_robust(j_flow, to_nhwc(t_flow), atol=1e-4,
                        outlier_frac=0.05)
    np.testing.assert_allclose(np.asarray(j_conf), to_nhwc(t_conf),
                               atol=1e-4)


def test_lfn3_modulation_parity(refmods):
    torch.manual_seed(10)
    level = 2
    t_m = refmods["liteflownet3"].CostVolumeModulation(level).eval()
    j_m = CostVolumeModulation(level)
    params = j_m.from_torch(_sd(t_m))
    rng = np.random.RandomState(10)
    h, w = 10, 12
    feats = feats5(rng, 96, h, w)
    flow = rng.randn(1, 2, h, w).astype(np.float32)
    conf = rng.rand(1, 1, h, w).astype(np.float32)
    with torch.no_grad():
        refv = t_m(torch.from_numpy(feats), torch.from_numpy(flow),
                   torch.from_numpy(conf))
    out = j_m(params, nhwc5(feats),
              jnp.asarray(np.transpose(flow, (0, 2, 3, 1))),
              jnp.asarray(np.transpose(conf, (0, 2, 3, 1))))
    assert_close_robust(out, to_nhwc(refv), outlier_frac=0.03)


def test_lfn3_regularization_conf_parity(refmods):
    torch.manual_seed(11)
    level = 1
    t_r = refmods["liteflownet3"].Regularization(level).eval()
    j_r = Regularization3(level)
    params = j_r.from_torch(_sd(t_r))
    rng = np.random.RandomState(11)
    h, w = 8, 10
    images = rng.rand(1, 2, 3, h, w).astype(np.float32)
    feats = feats5(rng, 128, h, w)
    flow = rng.randn(1, 2, h, w).astype(np.float32)
    with torch.no_grad():
        t_flow, t_conf, t_x = t_r(
            torch.from_numpy(images), torch.from_numpy(feats),
            torch.from_numpy(flow))
    j_flow, j_conf, j_x = j_r(params, nhwc5(images), nhwc5(feats),
                              jnp.asarray(np.transpose(flow, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(j_flow), to_nhwc(t_flow),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_conf), to_nhwc(t_conf),
                               atol=1e-4)


@pytest.mark.parametrize("jname,tcls,pseudo", [
    ("liteflownet2", "LiteFlowNet2", False),
    ("liteflownet2_pseudoreg", "LiteFlowNet2", True),
])
def test_lfn2_full_forward_parity(refmods, jname, tcls, pseudo):
    """Assemble the reference components into the full eval pipeline
    (liteflownet2.py:365-407) and compare with our model end-to-end."""
    torch.manual_seed(20)
    r = refmods["liteflownet2"]
    t_feat = r.FeatureExtractor().eval()
    t_match = torch.nn.ModuleList([r.Matching(i) for i in range(4)]).eval()
    t_sub = torch.nn.ModuleList([r.SubPixel(i) for i in range(4)]).eval()
    t_reg = torch.nn.ModuleList(
        [r.Regularization(i) for i in range(4)]).eval()
    if pseudo:
        t_psub = r.PseudoSubpixel().eval()
        t_preg = r.PseudoRegularization().eval()
        t_up = torch.nn.ConvTranspose2d(2, 2, 4, 2, 1, bias=False, groups=2)
    else:
        t_up = torch.nn.ConvTranspose2d(2, 2, 8, 4, 2, bias=False, groups=2)
    torch.nn.init.normal_(t_up.weight, 0, 0.1)

    model = ptlflow_tpu.get_model(jname)
    sd = {}
    sd.update({f"feature_net.{k}": v for k, v in _sd(t_feat).items()})
    sd.update({f"matching_nets.{k}": v for k, v in _sd(t_match).items()})
    sd.update({f"subpixel_nets.{k}": v for k, v in _sd(t_sub).items()})
    sd.update({f"regularization_nets.{k}": v
               for k, v in _sd(t_reg).items()})
    if pseudo:
        sd.update({f"pseudo_subpixel.{k}": v for k, v in _sd(t_psub).items()})
        sd.update({f"pseudo_regularization.{k}": v
                   for k, v in _sd(t_preg).items()})
    sd.update({f"up_flow.{k}": v for k, v in _sd(t_up).items()})
    model.params = model.from_torch(sd)

    rng = np.random.RandomState(20)
    images = rng.rand(1, 2, 3, 128, 160).astype(np.float32)

    with torch.no_grad():
        ims = torch.from_numpy(images)
        mean = torch.tensor([0.454253, 0.434631, 0.411618]).view(1, 1, 3,
                                                                 1, 1)
        ims = ims - mean
        ims = torch.flip(ims, [2])
        feats_pyr = t_feat(ims)
        b = ims.shape[0]
        flat = ims.view(-1, *ims.shape[2:])
        images_pyr = [
            F.interpolate(flat, size=f.shape[-2:], mode="bilinear",
                          align_corners=False).view(b, 2, 3, *f.shape[-2:])
            for f in feats_pyr]
        flow = None
        for i in range(4):
            flow = t_match[i](feats_pyr[i], flow)
            flow, sub_feat = t_sub[i](feats_pyr[i], flow)
            flow, reg_feat = t_reg[i](images_pyr[i], feats_pyr[i], flow)
        if pseudo:
            flow = t_psub(sub_feat, flow)
            flow = t_preg(reg_feat, flow)
        ref_flow = t_up(flow) * 20.0

    out = model({"images": images})
    got = np.asarray(out["flows"][:, 0])
    np.testing.assert_allclose(got, ref_flow.numpy(), atol=5e-3)


def test_lfn3_forward_smoke():
    for name in ("liteflownet3", "liteflownet3s"):
        model = ptlflow_tpu.get_model(name)
        model.init_params()
        rng = np.random.RandomState(30)
        images = rng.rand(1, 2, 3, 96, 128).astype(np.float32)
        out = model({"images": images})
        assert out["flows"].shape == (1, 1, 2, 96, 128)
        assert out["confs"].shape[2] == 1
        assert np.isfinite(np.asarray(out["flows"])).all()
