"""MatchFlow parity vs reference torch modules.

The reference's QuadtreeAttention CUDA ops are replaced by faithful pure
torch stubs (gather + einsum; semantics transcribed from
score_computation_kernal.cu:25-60 / value_aggregation_kernel.cu) so the
reference QTAttB control flow runs on CPU as the oracle.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.matchflow import quadtree as jq

REF = "/root/reference/ptlflow/models/matchflow"


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _torch_score_op(query, key, index):
    # query (B, N, 4, H, D), key (B, S, H, D), index (B, N, J, H)
    gathered = []
    b, n, j, h = index.shape
    kk = key.permute(0, 2, 1, 3)  # (B, H, S, D)
    ii = index.permute(0, 3, 1, 2)  # (B, H, N, J)
    g = torch.stack([torch.stack([kk[bb, hh][ii[bb, hh]]
                                  for hh in range(h)]) for bb in range(b)])
    # g: (B, H, N, J, D) -> (B, N, J, H, D)
    g = g.permute(0, 2, 3, 1, 4)
    return torch.einsum("bnfhd,bnjhd->bnfjh", query, g)


def _torch_value_op(score, value, index):
    # score (B, N, 4, J, H), value (B, S, H, D), index (B, N, 4, J, H)
    b, n, f, j, h = score.shape
    idx2 = index[:, :, 0]  # identical across the f axis
    kk = value.permute(0, 2, 1, 3)
    ii = idx2.permute(0, 3, 1, 2)
    g = torch.stack([torch.stack([kk[bb, hh][ii[bb, hh]]
                                  for hh in range(h)]) for bb in range(b)])
    g = g.permute(0, 2, 3, 1, 4)  # (B, N, J, H, D)
    return torch.einsum("bnfjh,bnjhd->bnfhd", score, g)


@pytest.fixture(scope="module")
def ref():
    # stub the compiled ops before loading the reference module tree
    fstub = types.ModuleType(
        "refmf.QuadtreeAttention.QuadtreeAttention.functions.quadtree_attention")
    fstub.score_computation_op = _torch_score_op
    fstub.value_aggregation_op = _torch_value_op
    for name in [
        "refmf", "refmf.QuadtreeAttention",
        "refmf.QuadtreeAttention.QuadtreeAttention",
        "refmf.QuadtreeAttention.QuadtreeAttention.functions",
        "refmf.QuadtreeAttention.QuadtreeAttention.modules",
    ]:
        m = types.ModuleType(name)
        m.__path__ = []
        sys.modules[name] = m
    sys.modules["refmf.QuadtreeAttention.QuadtreeAttention.functions."
                "quadtree_attention"] = fstub
    spec = importlib.util.spec_from_file_location(
        "refmf.QuadtreeAttention.QuadtreeAttention.modules."
        "quadtree_attention",
        f"{REF}/QuadtreeAttention/QuadtreeAttention/modules/"
        "quadtree_attention.py")
    qtmod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = qtmod
    spec.loader.exec_module(qtmod)

    fpn = _load("refmf_fpn", f"{REF}/resnet_fpn.py")
    return types.SimpleNamespace(qt=qtmod, fpn=fpn)


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


@pytest.mark.parametrize("h,w", [(8, 8), (48, 64)])
def test_qtattb_parity(ref, h, w):
    # (48, 64) puts >256 parent blocks at the finest level (24*32 = 768),
    # the regime where parent ids stop being exactly representable in
    # bfloat16 — guards the integer-only id plumbing in QTAttB._fine.
    torch.manual_seed(0)
    nhead, d = 2, 8
    c = nhead * d
    t = ref.qt.QTAttB(nhead, d, scale=3, topks=[4, 3, 3]).eval()
    j = jq.QTAttB(nhead, d, scale=3, topks=[4, 3, 3])
    params = {"weight": jnp.asarray(t.weight.detach().numpy())}
    rng = np.random.RandomState(0)
    qs, ks, vs = [], [], []
    jqs, jks, jvs = [], [], []
    for i in range(3):
        hh, ww = h // 2 ** i, w // 2 ** i
        q = rng.randn(1, c, hh, ww).astype(np.float32)
        k = rng.randn(1, c, hh, ww).astype(np.float32)
        v = rng.randn(1, c, hh, ww).astype(np.float32)
        qs.append(torch.from_numpy(q))
        ks.append(torch.from_numpy(k))
        vs.append(torch.from_numpy(v))
        jqs.append(jnp.asarray(np.transpose(q, (0, 2, 3, 1))))
        jks.append(jnp.asarray(np.transpose(k, (0, 2, 3, 1))))
        jvs.append(jnp.asarray(np.transpose(v, (0, 2, 3, 1))))
    with torch.no_grad():
        ref_out = t(qs, ks, vs).numpy()  # (B, N, H, D)
    out = np.asarray(j(params, jqs, jks, jvs))
    np.testing.assert_allclose(out, ref_out, atol=1e-4)


def test_resnet_fpn_parity(ref):
    torch.manual_seed(1)
    t = ref.fpn.ResNetFPN_8_2().eval()
    j = jq.ResNetFPN_8_2()
    params = j.from_torch(_sd(t))
    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, 32, 40).astype(np.float32)
    with torch.no_grad():
        ref_out = t(torch.from_numpy(x)).numpy()
    out = j(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out),
                               np.transpose(ref_out, (0, 2, 3, 1)),
                               atol=1e-4)


def test_sine_pos_encoding_parity():
    """Against the reference formula (matching_encoder.py:198-231)."""
    d_model, h, w = 16, 6, 7
    pe = torch.zeros((d_model, 256, 256))
    y_position = torch.ones((256, 256)).cumsum(0).float().unsqueeze(0)
    x_position = torch.ones((256, 256)).cumsum(1).float().unsqueeze(0)
    import math

    div_term = torch.exp(
        torch.arange(0, d_model // 2, 2).float()
        * (-math.log(10000.0) / (d_model // 2)))[:, None, None]
    pe[0::4] = torch.sin(x_position * div_term)
    pe[1::4] = torch.cos(x_position * div_term)
    pe[2::4] = torch.sin(y_position * div_term)
    pe[3::4] = torch.cos(y_position * div_term)
    ref_pe = pe[:, :h, :w].permute(1, 2, 0).numpy()
    got = jq.sine_pos_encoding(d_model, h, w)[0]
    np.testing.assert_allclose(got, ref_pe, atol=1e-5)


def test_matchflow_forward_shapes():
    for name in ("matchflow", "matchflow_raft"):
        model = ptlflow_tpu.get_model(
            name, args={"iters": 2, "use_tile_input": False})
        model.init_params()
        rng = np.random.RandomState(2)
        images = rng.rand(1, 2, 3, 128, 128).astype(np.float32)
        out = model({"images": images})
        assert out["flows"].shape == (1, 1, 2, 128, 128)
        assert np.isfinite(np.asarray(out["flows"])).all()


def test_matchflow_tile_forward():
    model = ptlflow_tpu.get_model(
        "matchflow", args={"iters": 2, "use_tile_input": True,
                           "tile_height": 64, "train_size": (64, 96)})
    model.init_params()
    rng = np.random.RandomState(3)
    images = rng.rand(1, 2, 3, 96, 128).astype(np.float32)
    out = model({"images": images})
    assert out["flows"].shape == (1, 1, 2, 96, 128)
    assert np.isfinite(np.asarray(out["flows"])).all()
