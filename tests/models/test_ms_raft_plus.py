"""MS-RAFT+ parity tests vs reference torch modules."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.ms_raft_plus.ms_raft_plus import (MSBasicEncoder,
                                                          MSUpdateBlock,
                                                          _downflow)

REF = "/root/reference/ptlflow/models/ms_raft_plus"


def _install_tv_functional_stub():
    if "torchvision.transforms.functional" in sys.modules:
        return

    def resize(img, size):
        # all call sites upscale, where antialias is inert; torchvision
        # bilinear == F.interpolate(align_corners=False)
        return torch.nn.functional.interpolate(
            img, size=tuple(size), mode="bilinear", align_corners=False)

    tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    fn = types.ModuleType("torchvision.transforms.functional")
    fn.resize = resize
    tr.functional = fn
    tv.transforms = tr
    sys.modules.setdefault("torchvision", tv)
    sys.modules["torchvision.transforms"] = tr
    sys.modules["torchvision.transforms.functional"] = fn


@pytest.fixture(scope="module")
def ref():
    _install_tv_functional_stub()
    pkg = types.ModuleType("refmsr")
    pkg.__path__ = [REF]
    sys.modules["refmsr"] = pkg
    mods = {}
    for name in ["extractor", "update"]:
        spec = importlib.util.spec_from_file_location(
            f"refmsr.{name}", f"{REF}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmsr.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def test_basic_encoder_pyramid_parity(ref):
    torch.manual_seed(0)
    t_e = ref["extractor"].BasicEncoder(output_dim=256,
                                        norm_fn="group").eval()
    j_e = MSBasicEncoder(output_dim=256, norm_fn="group")
    params = j_e.from_torch(_sd(t_e))
    rng = np.random.RandomState(0)
    x1 = rng.randn(1, 3, 64, 96).astype(np.float32)
    x2 = rng.randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        ref_pyr = t_e([torch.from_numpy(x1), torch.from_numpy(x2)])
    both = jnp.concatenate([nhwc(x1), nhwc(x2)], axis=0)
    out_pyr = j_e(params, both)
    assert len(out_pyr) == 4
    for lvl, (t_pair, j_lvl) in enumerate(zip(ref_pyr, out_pyr)):
        t_cat = torch.cat(t_pair, dim=0)
        np.testing.assert_allclose(np.asarray(j_lvl), to_nhwc(t_cat),
                                   atol=2e-3,
                                   err_msg=f"fnet pyramid level {lvl}")


def test_context_encoder_pyramid_parity(ref):
    torch.manual_seed(1)
    t_e = ref["extractor"].Basic_Context_Encoder(output_dim=256,
                                                 norm_fn="group").eval()
    j_e = MSBasicEncoder(output_dim=256, norm_fn="group", context_mode=True)
    params = j_e.from_torch(_sd(t_e))
    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        ref_pyr = t_e(torch.from_numpy(x))
    out_pyr = j_e(params, nhwc(x))
    for lvl, (t_lvl, j_lvl) in enumerate(zip(ref_pyr, out_pyr)):
        assert j_lvl.shape[-1] == 256
        np.testing.assert_allclose(np.asarray(j_lvl), to_nhwc(t_lvl),
                                   atol=2e-3,
                                   err_msg=f"cnet pyramid level {lvl}")


def test_update_block_parity(ref):
    torch.manual_seed(2)
    t_u = ref["update"].BasicUpdateBlock(162, hidden_dim=128,
                                         scale=2).eval()
    j_u = MSUpdateBlock(2, 4, hidden_dim=128, scale=2)
    params = j_u.from_torch(_sd(t_u))
    rng = np.random.RandomState(2)
    b, h, w = 1, 8, 10
    net = rng.randn(b, 128, h, w).astype(np.float32)
    inp = rng.randn(b, 128, h, w).astype(np.float32)
    corr = rng.randn(b, 162, h, w).astype(np.float32)
    flow = rng.randn(b, 2, h, w).astype(np.float32)
    with torch.no_grad():
        t_net, t_mask, t_delta = t_u(
            *(torch.from_numpy(v) for v in (net, inp, corr, flow)))
    j_net, j_mask, j_delta = j_u(
        params, *(nhwc(v) for v in (net, inp, corr, flow)))
    assert j_mask.shape[-1] == 36
    np.testing.assert_allclose(np.asarray(j_net), to_nhwc(t_net), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_mask), to_nhwc(t_mask),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_delta), to_nhwc(t_delta),
                               atol=1e-4)


def test_downflow_parity():
    import torch.nn.functional as F
    rng = np.random.RandomState(3)
    flow = rng.randn(2, 2, 32, 48).astype(np.float32)
    t = torch.from_numpy(flow)
    new_size = (2, 3)
    resized = F.interpolate(t, size=new_size, mode="bilinear",
                            align_corners=True)
    expect = torch.cat([resized[:, :1] * (3 / 48), resized[:, 1:] * (2 / 32)],
                       dim=1)
    out = _downflow(nhwc(flow), 0.0625)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(expect), atol=1e-5)


def test_ms_raft_p_forward_and_loss():
    model = ptlflow_tpu.get_model("ms_raft_p", args={"iters": (1, 1, 1, 1)})
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
    assert out["flow_small"].shape == (b, 2, h // 16, w // 16)
    outt = model.forward(model.params, inputs, training=True)
    assert outt["flow_preds"].shape == (4, b, h, w, 2)
    assert np.isfinite(float(model.loss_fn(outt, inputs)))
