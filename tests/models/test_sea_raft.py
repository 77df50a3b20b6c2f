"""SEA-RAFT parity vs reference torch modules + forward/loss smoke."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import importlib

import ptlflow_tpu
from ptlflow_tpu.models.sea_raft import layer as jlayer

# the package re-exports the registered class `sea_raft`, shadowing the
# submodule attribute — import the module via its dotted path instead
jsea = importlib.import_module("ptlflow_tpu.models.sea_raft.sea_raft")

REF = "/root/reference/ptlflow/models/sea_raft"


@pytest.fixture(scope="module")
def ref_mods():
    pkg = types.ModuleType("refsea")
    pkg.__path__ = [REF]
    sys.modules["refsea"] = pkg
    mods = {}
    for name in ["layer", "extractor", "update"]:
        spec = importlib.util.spec_from_file_location(
            f"refsea.{name}", f"{REF}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refsea.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def test_convnext_block_parity(ref_mods):
    torch.manual_seed(0)
    t_blk = ref_mods["layer"].ConvNextBlock(32, 16).eval()
    j_blk = jlayer.ConvNextBlock(32, 16)
    params = j_blk.from_torch(_sd(t_blk))
    rng = np.random.RandomState(0)
    x = rng.randn(2, 32, 8, 10).astype(np.float32)
    with torch.no_grad():
        ref = to_nhwc(t_blk(torch.from_numpy(x)))
    out = j_blk(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_resnet_fpn_parity(ref_mods):
    torch.manual_seed(1)
    t_enc = ref_mods["extractor"].ResNetFPN(
        block_dims=[32, 48, 64], initial_dim=32, pretrain="resnet18",
        input_dim=3, output_dim=96).eval()
    j_enc = jlayer.ResNetFPN(block_dims=[32, 48, 64], initial_dim=32,
                             pretrain="resnet18", input_dim=3, output_dim=96)
    params = j_enc.from_torch(_sd(t_enc))
    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = to_nhwc(t_enc(torch.from_numpy(x)))
    out = j_enc(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_update_block_parity(ref_mods):
    torch.manual_seed(2)
    corr_channel = 4 * 81
    t_blk = ref_mods["update"].BasicUpdateBlock(
        corr_channel, num_blocks=2, hdim=64, cdim=64).eval()
    j_blk = jsea.BasicUpdateBlock(corr_channel, num_blocks=2, hdim=64,
                                  cdim=64)
    params = j_blk.from_torch(_sd(t_blk))
    rng = np.random.RandomState(2)
    b, h, w = 1, 6, 8
    net = rng.randn(b, 64, h, w).astype(np.float32)
    inp = rng.randn(b, 64, h, w).astype(np.float32)
    corr = rng.randn(b, corr_channel, h, w).astype(np.float32)
    flow = rng.randn(b, 2, h, w).astype(np.float32)
    with torch.no_grad():
        ref = to_nhwc(t_blk(*(torch.from_numpy(v) for v in
                              (net, inp, corr, flow))))
    out = j_blk(params, *(jnp.asarray(np.transpose(v, (0, 2, 3, 1)))
                          for v in (net, inp, corr, flow)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_sea_raft_forward_and_loss():
    model = ptlflow_tpu.get_model("sea_raft", args={"iters": 2})
    model.init_params()
    rng = np.random.RandomState(3)
    b, h, w = 1, 128, 128
    images = rng.rand(b, 2, 3, h, w).astype(np.float32)
    out = model({"images": images})
    assert out["flows"].shape == (b, 1, 2, h, w)
    assert np.isfinite(np.asarray(out["flows"])).all()

    inputs = {
        "images": jnp.asarray(images),
        "flows": jnp.asarray(rng.randn(b, 1, 2, h, w).astype(np.float32)),
        "valids": jnp.ones((b, 1, 1, h, w), jnp.float32),
    }
    train_out = model.forward(model.params, inputs, training=True)
    assert train_out["nf_preds"].shape[0] == 3  # init + 2 iters
    loss = model.loss_fn(train_out, inputs)
    assert np.isfinite(float(loss))


def test_sea_raft_nf_loss_matches_reference_formula():
    """Check the Laplace-mixture NLL against a direct torch transcription of
    the published formula (sea_raft.py:238-265)."""
    import math

    model = ptlflow_tpu.get_model("sea_raft", args={"iters": 0})
    rng = np.random.RandomState(4)
    b, h, w = 2, 6, 7
    flow_pred = rng.randn(b, h, w, 2).astype(np.float32)
    info_pred = rng.randn(b, h, w, 4).astype(np.float32)
    flow_gt = rng.randn(b, h, w, 2).astype(np.float32)

    nf = model._nf_loss(jnp.asarray(flow_pred), jnp.asarray(info_pred),
                        jnp.asarray(flow_gt))

    # torch oracle (NCHW)
    fp = torch.from_numpy(np.transpose(flow_pred, (0, 3, 1, 2)))
    ip = torch.from_numpy(np.transpose(info_pred, (0, 3, 1, 2)))
    gt = torch.from_numpy(np.transpose(flow_gt, (0, 3, 1, 2)))
    raw_b = ip[:, 2:]
    log_b = torch.zeros_like(raw_b)
    weight = ip[:, :2]
    log_b[:, 0] = torch.clamp(raw_b[:, 0], min=0, max=10)
    log_b[:, 1] = torch.clamp(raw_b[:, 1], min=0, max=0)
    term2 = ((gt - fp).abs().unsqueeze(2)) * (torch.exp(-log_b).unsqueeze(1))
    term1 = weight - math.log(2) - log_b
    ref = torch.logsumexp(weight, dim=1, keepdim=True) - \
        torch.logsumexp(term1.unsqueeze(1) - term2, dim=2)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(nf), ref, atol=1e-5)
