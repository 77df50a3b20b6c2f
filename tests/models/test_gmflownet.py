"""GMFlowNet parity vs reference torch modules (read-only oracle imports)."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.gmflownet import pola as jp

REF = "/root/reference/ptlflow/models/gmflownet"


@pytest.fixture(scope="module")
def ref():
    pkg = types.ModuleType("refgmfn")
    pkg.__path__ = [REF]
    sys.modules["refgmfn"] = pkg

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    upkg = types.ModuleType("refgmfn.utils")
    upkg.__path__ = [f"{REF}/utils"]
    sys.modules["refgmfn.utils"] = upkg
    load("refgmfn.utils.helpers", f"{REF}/utils/helpers.py")
    load("refgmfn.utils.drop", f"{REF}/utils/drop.py")
    load("refgmfn.utils.weight_init", f"{REF}/utils/weight_init.py")
    uinit = load("refgmfn.utils.__init__", f"{REF}/utils/__init__.py")
    for k in ("DropPath", "to_2tuple", "trunc_normal_"):
        setattr(upkg, k, getattr(uinit, k))
    swin = load("refgmfn.swin_transformer", f"{REF}/swin_transformer.py")
    extr = load("refgmfn.extractor", f"{REF}/extractor.py")
    return types.SimpleNamespace(swin=swin, extr=extr)


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def test_neighbor_window_attention_parity(ref):
    torch.manual_seed(0)
    t = ref.swin.NeighborWindowAttention(
        64, (7, 7), num_heads=4, neig_win_num=1).eval()
    j = jp.NeighborWindowAttention(64, 7, 4, neig_win_num=1)
    params = j.from_torch(_sd(t))
    rng = np.random.RandomState(0)
    q = rng.randn(2, 49, 64).astype(np.float32)
    kv = rng.randn(2, 441, 64).astype(np.float32)
    with torch.no_grad():
        ref_out = t(torch.from_numpy(q), torch.from_numpy(kv),
                    torch.from_numpy(kv)).numpy()
    out = j(params, jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-5)


def test_pola_block_parity(ref):
    torch.manual_seed(1)
    t = ref.swin.POLATransBlock(32, num_heads=4, window_size=4,
                                neig_win_num=1).eval()
    j = jp.POLATransBlock(32, 4, window_size=4, neig_win_num=1)
    params = j.from_torch(_sd(t))
    rng = np.random.RandomState(1)
    # H, W deliberately not multiples of the window size
    b, h, w, c = 1, 10, 9, 32
    x = rng.randn(b, h * w, c).astype(np.float32)
    with torch.no_grad():
        ref_out = t(torch.from_numpy(x), h, w).numpy()
    out = j(params, jnp.asarray(x.reshape(b, h, w, c)))
    np.testing.assert_allclose(np.asarray(out).reshape(b, h * w, c),
                               ref_out, atol=1e-4)


def test_mix_axial_pola_block_parity(ref):
    torch.manual_seed(2)
    t = ref.swin.MixAxialPOLABlock(32, num_heads=8, window_size=4).eval()
    j = jp.MixAxialPOLABlock(32, num_heads=8, window_size=4)
    params = j.from_torch(_sd(t))
    rng = np.random.RandomState(2)
    b, h, w, c = 1, 8, 12, 32
    x = rng.randn(b, h * w, c).astype(np.float32)
    with torch.no_grad():
        ref_out = t(torch.from_numpy(x), h, w).numpy()
    out = j(params, jnp.asarray(x.reshape(b, h, w, c)))
    np.testing.assert_allclose(np.asarray(out).reshape(b, h * w, c),
                               ref_out, atol=1e-4)


def test_pola_update_parity(ref):
    torch.manual_seed(3)
    t = ref.swin.POLAUpdate(embed_dim=32, depth=2, num_head=4,
                            window_size=4, neig_win_num=1).eval()
    j = jp.POLAUpdate(embed_dim=32, depth=2, num_head=4, window_size=4,
                      neig_win_num=1)
    params = j.from_torch(_sd(t))
    rng = np.random.RandomState(3)
    x = rng.randn(1, 32, 10, 9).astype(np.float32)
    with torch.no_grad():
        ref_out = t(torch.from_numpy(x)).numpy()
    out = j(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out),
                               np.transpose(ref_out, (0, 2, 3, 1)),
                               atol=1e-4)


def test_basic_conv_encoder_parity(ref):
    torch.manual_seed(4)
    t = ref.extr.BasicConvEncoder(output_dim=64, norm_fn="instance").eval()
    j = jp.BasicConvEncoder(output_dim=64, norm_fn="instance")
    params = j.from_torch(_sd(t))
    rng = np.random.RandomState(4)
    x = rng.randn(1, 3, 32, 40).astype(np.float32)
    with torch.no_grad():
        ref_out = t(torch.from_numpy(x)).numpy()
    out = j(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out),
                               np.transpose(ref_out, (0, 2, 3, 1)),
                               atol=1e-4)


def test_gmflownet_forward_shapes():
    model = ptlflow_tpu.get_model("gmflownet", args={"iters": 2})
    model.init_params()
    rng = np.random.RandomState(5)
    images = rng.rand(1, 2, 3, 128, 128).astype(np.float32)
    out = model({"images": images})
    assert out["flows"].shape == (1, 1, 2, 128, 128)
    assert np.isfinite(np.asarray(out["flows"])).all()


def test_gmflownet_matching_loss():
    import jax

    model = ptlflow_tpu.get_model(
        "gmflownet", args={"iters": 2, "use_matching_loss": True})
    model.init_params()
    rng = np.random.RandomState(6)
    inputs = {
        "images": jnp.asarray(rng.rand(1, 2, 3, 64, 64).astype(np.float32)),
        "flows": jnp.asarray(rng.randn(1, 1, 2, 64, 64).astype(np.float32)),
        "valids": jnp.ones((1, 1, 1, 64, 64), jnp.float32),
    }
    outputs = model.forward(model.params, inputs, training=True)
    loss = model.loss_fn(outputs, inputs)
    assert np.isfinite(float(loss))
