"""GMA parity vs reference torch modules (read-only oracle imports)."""

import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.gma import gma_utils as jgu
from ptlflow_tpu.models.gma.gma import GMAUpdateBlock

REF = "/root/reference/ptlflow/models/gma"


def load_ref(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_gma_utils():
    return load_ref("ref_gma_utils", f"{REF}/gma_utils.py")


@pytest.fixture(scope="module")
def ref_gma_update(ref_gma_utils):
    sys.modules["ptlflow.models.gma.gma_utils"] = ref_gma_utils
    # reference update.py does "from .gma_utils import Aggregate" — emulate
    import types
    pkg = types.ModuleType("refgma")
    pkg.__path__ = [REF]
    sys.modules["refgma"] = pkg
    spec = importlib.util.spec_from_file_location(
        "refgma.update", f"{REF}/update.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refgma.update"] = mod
    sys.modules["refgma.gma_utils"] = ref_gma_utils
    spec.loader.exec_module(mod)
    return mod


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def test_attention_parity(ref_gma_utils):
    torch.manual_seed(0)
    t_att = ref_gma_utils.Attention(dim=32, position_only=False,
                                    position_and_content=False, heads=1,
                                    max_pos_size=40, dim_head=32).eval()
    j_att = jgu.Attention(dim=32, heads=1, max_pos_size=40, dim_head=32)
    params = j_att.from_torch(_sd(t_att), strict=False)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 32, 8, 10).astype(np.float32)
    with torch.no_grad():
        ref = t_att(torch.from_numpy(x)).numpy()
    out = j_att(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_attention_position_and_content_parity(ref_gma_utils):
    torch.manual_seed(1)
    t_att = ref_gma_utils.Attention(dim=16, position_only=False,
                                    position_and_content=True, heads=1,
                                    max_pos_size=20, dim_head=16).eval()
    j_att = jgu.Attention(dim=16, position_and_content=True, heads=1,
                          max_pos_size=20, dim_head=16)
    params = j_att.from_torch(_sd(t_att), strict=False)
    rng = np.random.RandomState(1)
    x = rng.randn(1, 16, 6, 7).astype(np.float32)
    with torch.no_grad():
        ref = t_att(torch.from_numpy(x)).numpy()
    out = j_att(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_gma_update_block_parity(ref_gma_update):
    torch.manual_seed(2)
    t_blk = ref_gma_update.GMAUpdateBlock(4, 4, num_heads=1,
                                          hidden_dim=128).eval()
    j_blk = GMAUpdateBlock(4, 4, num_heads=1, hidden_dim=128)
    params = j_blk.from_torch(_sd(t_blk))
    rng = np.random.RandomState(2)
    b, h, w = 1, 6, 8
    hw = h * w
    net = rng.randn(b, 128, h, w).astype(np.float32)
    inp = rng.randn(b, 128, h, w).astype(np.float32)
    corr = rng.randn(b, 4 * 81, h, w).astype(np.float32)
    flow = rng.randn(b, 2, h, w).astype(np.float32)
    attn = np.abs(rng.rand(b, 1, hw, hw)).astype(np.float32)
    attn = attn / attn.sum(-1, keepdims=True)
    with torch.no_grad():
        t_net, t_mask, t_delta = t_blk(
            *(torch.from_numpy(v) for v in (net, inp, corr, flow)),
            torch.from_numpy(attn))
    j_net, j_mask, j_delta = j_blk(
        params,
        *(jnp.asarray(np.transpose(v, (0, 2, 3, 1))) for v in
          (net, inp, corr, flow)),
        jnp.asarray(attn))
    np.testing.assert_allclose(np.asarray(j_net), to_nhwc(t_net), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_delta), to_nhwc(t_delta),
                               atol=1e-4)


def test_gma_forward_shapes():
    model = ptlflow_tpu.get_model("gma", args={"iters": 2})
    model.init_params()
    rng = np.random.RandomState(3)
    images = rng.rand(1, 2, 3, 128, 128).astype(np.float32)
    out = model({"images": images})
    assert out["flows"].shape == (1, 1, 2, 128, 128)
    assert np.isfinite(np.asarray(out["flows"])).all()
