"""RAFT parity tests.

The torch oracle modules are imported read-only from the reference tree
(/root/reference/ptlflow/models/raft/{extractor,update}.py — torch-only
imports) and random-initialized; their state_dicts are converted through the
generic ``from_torch`` walk and outputs compared.  This validates the whole
compute path (encoders, update block, GRU) plus the checkpoint converter —
the same mechanism that will load the real pretrained zoo.
"""

import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.raft import extractor as jext
from ptlflow_tpu.models.raft import update as jupd

REF = "/root/reference/ptlflow/models/raft"


def load_ref(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_extractor():
    return load_ref("ref_raft_extractor", f"{REF}/extractor.py")


@pytest.fixture(scope="module")
def ref_update():
    return load_ref("ref_raft_update", f"{REF}/update.py")


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


@pytest.mark.parametrize("norm_fn", ["instance", "batch", "none"])
def test_basic_encoder_parity(ref_extractor, norm_fn):
    torch.manual_seed(0)
    t_enc = ref_extractor.BasicEncoder(output_dim=64, norm_fn=norm_fn).eval()
    j_enc = jext.BasicEncoder(output_dim=64, norm_fn=norm_fn)
    params = j_enc.from_torch(_sd(t_enc))
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        ref = to_nhwc(t_enc(torch.from_numpy(x)))
    out = j_enc(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3)


def test_small_encoder_parity(ref_extractor):
    torch.manual_seed(1)
    t_enc = ref_extractor.SmallEncoder(output_dim=128, norm_fn="instance").eval()
    j_enc = jext.SmallEncoder(output_dim=128, norm_fn="instance")
    params = j_enc.from_torch(_sd(t_enc))
    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = to_nhwc(t_enc(torch.from_numpy(x)))
    out = j_enc(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3)


def test_basic_update_block_parity(ref_update):
    torch.manual_seed(2)
    corr_levels, corr_radius = 4, 4
    t_blk = ref_update.BasicUpdateBlock(corr_levels, corr_radius,
                                        hidden_dim=128).eval()
    j_blk = jupd.BasicUpdateBlock(corr_levels, corr_radius, hidden_dim=128)
    params = j_blk.from_torch(_sd(t_blk))

    rng = np.random.RandomState(2)
    b, h, w = 2, 8, 12
    cor_planes = corr_levels * (2 * corr_radius + 1) ** 2
    net = rng.randn(b, 128, h, w).astype(np.float32)
    inp = rng.randn(b, 128, h, w).astype(np.float32)
    corr = rng.randn(b, cor_planes, h, w).astype(np.float32)
    flow = rng.randn(b, 2, h, w).astype(np.float32)
    with torch.no_grad():
        t_net, t_mask, t_delta = t_blk(*(torch.from_numpy(v) for v in
                                         (net, inp, corr, flow)))
    j_net, j_mask, j_delta = j_blk(
        params, *(jnp.asarray(np.transpose(v, (0, 2, 3, 1))) for v in
                  (net, inp, corr, flow)))
    np.testing.assert_allclose(np.asarray(j_net), to_nhwc(t_net), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_mask), to_nhwc(t_mask), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_delta), to_nhwc(t_delta), atol=1e-4)


def test_small_update_block_parity(ref_update):
    torch.manual_seed(3)
    corr_levels, corr_radius = 4, 3
    t_blk = ref_update.SmallUpdateBlock(corr_levels, corr_radius,
                                        hidden_dim=96).eval()
    j_blk = jupd.SmallUpdateBlock(corr_levels, corr_radius, hidden_dim=96)
    params = j_blk.from_torch(_sd(t_blk))
    rng = np.random.RandomState(3)
    b, h, w = 1, 6, 9
    cor_planes = corr_levels * (2 * corr_radius + 1) ** 2
    net = rng.randn(b, 96, h, w).astype(np.float32)
    inp = rng.randn(b, 64, h, w).astype(np.float32)
    corr = rng.randn(b, cor_planes, h, w).astype(np.float32)
    flow = rng.randn(b, 2, h, w).astype(np.float32)
    with torch.no_grad():
        t_net, _, t_delta = t_blk(*(torch.from_numpy(v) for v in
                                    (net, inp, corr, flow)))
    j_net, j_mask, j_delta = j_blk(
        params, *(jnp.asarray(np.transpose(v, (0, 2, 3, 1))) for v in
                  (net, inp, corr, flow)))
    assert j_mask is None
    np.testing.assert_allclose(np.asarray(j_net), to_nhwc(t_net), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_delta), to_nhwc(t_delta), atol=1e-4)


def test_raft_full_forward_parity(ref_extractor, ref_update):
    """End-to-end: torch oracle assembled from reference modules vs our RAFT
    with converted weights, identical random input images."""
    import torch.nn.functional as F
    from tests.ops.test_correlation import torch_corr_block, torch_upsample_flow

    torch.manual_seed(4)
    iters = 4
    t_fnet = ref_extractor.BasicEncoder(output_dim=256, norm_fn="instance").eval()
    t_cnet = ref_extractor.BasicEncoder(output_dim=256, norm_fn="batch").eval()
    t_update = ref_update.BasicUpdateBlock(4, 4, hidden_dim=128).eval()

    model = ptlflow_tpu.get_model("raft", args={"iters": iters})
    sd = {}
    sd.update({f"fnet.{k}": v for k, v in _sd(t_fnet).items()})
    sd.update({f"cnet.{k}": v for k, v in _sd(t_cnet).items()})
    sd.update({f"update_block.{k}": v for k, v in _sd(t_update).items()})
    model.params = model.from_torch(sd)

    rng = np.random.RandomState(4)
    images = rng.rand(1, 2, 3, 128, 128).astype(np.float32)

    # --- torch oracle forward (reference raft.py:125-194 semantics)
    with torch.no_grad():
        ims = torch.from_numpy(images)
        ims = (ims - 0.5) * 2.0
        ims = torch.flip(ims, [2])  # BGR -> RGB
        im1, im2 = ims[:, 0], ims[:, 1]
        fmap1, fmap2 = t_fnet([im1, im2])
        cnet = t_cnet(im1)
        net, inp = torch.split(cnet, [128, 128], dim=1)
        net, inp = torch.tanh(net), torch.relu(inp)
        b, _, h, w = fmap1.shape
        ys, xs = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
        coords0 = torch.stack([xs, ys], dim=0)[None].float().repeat(b, 1, 1, 1)
        coords1 = coords0.clone()
        for _ in range(iters):
            corr = torch_corr_block(fmap1, fmap2, coords1, 4, 4)
            flow = coords1 - coords0
            net, up_mask, delta = t_update(net, inp, corr, flow)
            coords1 = coords1 + delta
        ref_flow = torch_upsample_flow(coords1 - coords0, up_mask)

    out = model({"images": images})
    got = np.asarray(out["flows"])[:, 0]  # (B, 2, H, W)
    np.testing.assert_allclose(got, ref_flow.numpy(), atol=5e-3)


def test_raft_small_forward_shapes():
    model = ptlflow_tpu.get_model("raft_small", args={"iters": 3})
    model.init_params()
    rng = np.random.RandomState(5)
    images = rng.rand(1, 2, 3, 129, 159).astype(np.float32)  # non-multiple of 8
    out = model({"images": images})
    assert out["flows"].shape == (1, 1, 2, 129, 159)
    assert np.isfinite(np.asarray(out["flows"])).all()


def test_raft_training_outputs_and_loss():
    model = ptlflow_tpu.get_model("raft_small", args={"iters": 3})
    model.init_params()
    rng = np.random.RandomState(6)
    b, h, w = 1, 128, 160
    inputs = {
        "images": jnp.asarray(rng.rand(b, 2, 3, h, w).astype(np.float32)),
        "flows": jnp.asarray(rng.randn(b, 1, 2, h, w).astype(np.float32)),
        "valids": jnp.ones((b, 1, 1, h, w), jnp.float32),
    }
    out = model.forward(model.params, inputs, training=True)
    assert out["flow_preds"].shape == (3, b, h, w, 2)
    loss = model.loss_fn(out, inputs)
    assert np.isfinite(float(loss))


def test_registry_api():
    names = ptlflow_tpu.get_model_names()
    assert "raft" in names and "raft_small" in names
    assert "raft" in ptlflow_tpu.get_trainable_model_names()
    ref = ptlflow_tpu.get_model_reference("raft")
    assert ref.__name__ == "raft"


def test_raft_mixed_precision_smoke():
    """The inference-only bf16 path emits finite fp32 flow of the right
    shape, and training mode ignores the flag (per-dtype closeness of the
    corr path is covered in tests/ops/test_correlation.py; end-to-end flow
    with random weights is chaotic, so no numeric bound here)."""
    model = ptlflow_tpu.get_model("raft",
                                  args={"iters": 4,
                                        "mixed_precision": True})
    model.init_params()
    rng = np.random.RandomState(7)
    b, h, w = 1, 64, 96
    inputs = {
        "images": jnp.asarray(rng.rand(b, 2, 3, h, w).astype(np.float32)),
        "flows": jnp.asarray(rng.randn(b, 1, 2, h, w).astype(np.float32)),
        "valids": jnp.ones((b, 1, 1, h, w), jnp.float32),
    }
    got = np.asarray(model.forward(model.params, inputs,
                                   training=False)["flows"])
    assert got.shape == (b, 1, 2, h, w)
    assert got.dtype == np.float32
    assert np.isfinite(got).all()
    out_tr = model.forward(model.params, inputs, training=True)
    assert out_tr["flow_preds"].dtype == jnp.float32  # flag inert in training
    assert np.isfinite(float(model.loss_fn(out_tr, inputs)))
