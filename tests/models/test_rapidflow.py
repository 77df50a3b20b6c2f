"""RAPIDFlow parity tests vs reference torch modules (lightning stubbed)."""

import importlib.util
import math
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.rapidflow.next1d import (Next1dBlock, Next1dEncoder,
                                                 Next1dStage)
from ptlflow_tpu.models.rapidflow.rapidflow import UpdateBlock

REF = "/root/reference/ptlflow/models/rapidflow"


def _install_stubs():
    if "lightning" not in sys.modules:
        lightning = types.ModuleType("lightning")
        pl = types.ModuleType("lightning.pytorch")
        pl.LightningModule = torch.nn.Module
        lightning.pytorch = pl
        sys.modules["lightning"] = lightning
        sys.modules["lightning.pytorch"] = pl
    if "loguru" not in sys.modules:
        loguru = types.ModuleType("loguru")

        class _L:
            def __getattr__(self, k):
                return lambda *a, **kw: None

        loguru.logger = _L()
        sys.modules["loguru"] = loguru


@pytest.fixture(scope="module")
def ref():
    _install_stubs()
    pkg = types.ModuleType("refrapid")
    pkg.__path__ = [REF]
    sys.modules["refrapid"] = pkg
    lt = types.ModuleType("refrapid.local_timm")
    lt.__path__ = [f"{REF}/local_timm"]
    sys.modules["refrapid.local_timm"] = lt
    mods = {}
    for name in ["local_timm.norm", "local_timm.layer_helpers",
                 "local_timm.drop", "local_timm.gelu", "local_timm.mlp",
                 "local_timm.padding", "local_timm.conv2d_same",
                 "local_timm.create_conv2d", "local_timm.weight_init",
                 "next1d", "next1d_encoder", "update"]:
        spec = importlib.util.spec_from_file_location(
            f"refrapid.{name}", f"{REF}/{name.replace('.', '/')}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refrapid.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def _randomize(mod, seed):
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in mod.parameters():
            p.normal_(0, 0.05)
    return mod


def test_next1d_block_parity(ref):
    norm = ref["local_timm.norm"].LayerNorm2d
    t_blk = _randomize(
        ref["next1d"].NeXt1DBlock(32, 32, kernel_size=7, mlp_ratio=4,
                                  norm_layer=norm), 0).eval()
    j_blk = Next1dBlock(32, 32, kernel_size=7, mlp_ratio=4)
    params = j_blk.from_torch(_sd(t_blk))
    rng = np.random.RandomState(0)
    x = rng.randn(2, 32, 12, 15).astype(np.float32)
    with torch.no_grad():
        refv = to_nhwc(t_blk(torch.from_numpy(x)))
    out = j_blk(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), refv, atol=1e-5)


def test_next1d_stage_parity(ref):
    norm = ref["local_timm.norm"].LayerNorm2d
    t_stage = _randomize(
        ref["next1d"].NeXt1DStage(32, 48, stride=2, depth=2, mlp_ratio=4,
                                  norm_layer=norm), 1).eval()
    j_stage = Next1dStage(32, 48, stride=2, depth=2, mlp_ratio=4)
    params = j_stage.from_torch(_sd(t_stage))
    rng = np.random.RandomState(1)
    x = rng.randn(1, 32, 16, 20).astype(np.float32)
    with torch.no_grad():
        refv = to_nhwc(t_stage(torch.from_numpy(x)))
    out = j_stage(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), refv, atol=1e-5)


def test_next1d_encoder_parity(ref):
    norm = ref["local_timm.norm"].LayerNorm2d
    t_enc = _randomize(
        ref["next1d_encoder"].NeXt1DEncoder(
            max_pyr_range=(8, 32), stem_stride=4, num_recurrent_layers=4,
            hidden_chs=32, out_chs=48, norm_layer=norm, mlp_ratio=4,
            depth=2), 2).eval()
    j_enc = Next1dEncoder(max_pyr_range=(8, 32), stem_stride=4,
                          num_recurrent_layers=4, hidden_chs=32, out_chs=48,
                          mlp_ratio=4, depth=2)
    params = j_enc.from_torch(_sd(t_enc))
    rng = np.random.RandomState(2)
    x = rng.randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        ref_pyr = t_enc(torch.from_numpy(x))
    out_pyr = j_enc(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    assert len(out_pyr) == len(ref_pyr) == 3
    for o, r in zip(out_pyr, ref_pyr):
        np.testing.assert_allclose(np.asarray(o), to_nhwc(r), atol=1e-5)


def test_update_block_parity(ref):
    t_blk = _randomize(
        ref["update"].UpdateBlock(
            pyramid_ranges=(32, 8), corr_levels=1, corr_range=4,
            dec_net_chs=64, dec_inp_chs=64, dec_motion_chs=128, dec_depth=2,
            dec_mlp_ratio=4.0, fuse_next1d_weights=False,
            use_upsample_mask=True), 3).eval()
    j_blk = UpdateBlock(pyramid_ranges=(32, 8), corr_levels=1, corr_range=4,
                        dec_net_chs=64, dec_inp_chs=64, dec_motion_chs=128,
                        dec_depth=2, dec_mlp_ratio=4.0,
                        fuse_next1d_weights=False, use_upsample_mask=True)
    params = j_blk.from_torch(_sd(t_blk))
    rng = np.random.RandomState(3)
    b, h, w = 1, 8, 10
    net = rng.randn(b, 64, h, w).astype(np.float32)
    inp = rng.randn(b, 64, h, w).astype(np.float32)
    corr = rng.randn(b, 81, h, w).astype(np.float32)
    flow = rng.randn(b, 2, h, w).astype(np.float32)
    with torch.no_grad():
        t_delta, t_net, t_mask = t_blk(
            *(torch.from_numpy(v) for v in (net, inp, corr, flow)),
            get_mask=True)
    j_delta, j_net, j_mask = j_blk(
        params, *(jnp.asarray(np.transpose(v, (0, 2, 3, 1))) for v in
                  (net, inp, corr, flow)), get_mask=True)
    np.testing.assert_allclose(np.asarray(j_delta), to_nhwc(t_delta),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_net), to_nhwc(t_net), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_mask), to_nhwc(t_mask),
                               atol=1e-4)


def test_rapidflow_full_forward_parity(ref):
    """Torch oracle assembled from reference modules, forward per
    reference rapidflow.py:226-421 (eval path), vs our model with the
    same converted weights."""
    from tests.ops.test_correlation import torch_corr_block

    norm = ref["local_timm.norm"].LayerNorm2d
    iters = 6
    enc_kw = dict(max_pyr_range=(8, 32), stem_stride=4,
                  num_recurrent_layers=4, hidden_chs=64, out_chs=128,
                  mlp_ratio=4, depth=4)
    t_fnet = _randomize(ref["next1d_encoder"].NeXt1DEncoder(
        norm_layer=norm, **enc_kw), 10).eval()
    t_cnet = _randomize(ref["next1d_encoder"].NeXt1DEncoder(
        norm_layer=norm, **enc_kw), 11).eval()
    t_update = _randomize(ref["update"].UpdateBlock(
        pyramid_ranges=(32, 8), corr_levels=1, corr_range=4, dec_net_chs=64,
        dec_inp_chs=64, dec_motion_chs=128, dec_depth=2, dec_mlp_ratio=4.0,
        fuse_next1d_weights=False, use_upsample_mask=True), 12).eval()
    t_upnet = _randomize(torch.nn.Sequential(
        torch.nn.Conv2d(128, 64, 1),
        torch.nn.ReLU(inplace=True),
        ref["next1d"].NeXt1DStage(64, 64, stride=1, depth=2, mlp_ratio=4.0,
                                  norm_layer=norm)), 13).eval()

    model = ptlflow_tpu.get_model("rapidflow", args={"iters": iters})
    sd = {}
    for prefix, mod in (("fnet", t_fnet), ("cnet", t_cnet),
                        ("update_block", t_update), ("upnet_layer", t_upnet)):
        sd.update({f"{prefix}.{k}": v for k, v in _sd(mod).items()})
    model.params = model.from_torch(sd)

    rng = np.random.RandomState(20)
    images = rng.rand(1, 2, 3, 128, 160).astype(np.float32)

    def rescale(flow, w_to, h_to):
        u, v = flow.chunk(2, dim=1)
        return torch.cat([u * (w_to / flow.shape[3]),
                          v * (h_to / flow.shape[2])], dim=1)

    with torch.no_grad():
        ims = (torch.from_numpy(images) - 0.5) * 2.0
        x1_raw, x2_raw = ims[:, 0], ims[:, 1]
        hi, wi = x1_raw.shape[-2:]
        x_pyr = t_fnet(torch.cat([x1_raw, x2_raw], 0))
        cnet_pyr = t_cnet(x1_raw)
        n_lvls = 3
        ipl = int(math.ceil(iters / n_lvls))
        flow = torch.zeros(1, 2, x_pyr[0].shape[-2], x_pyr[0].shape[-1])
        net = None
        for l in range(n_lvls):
            x1, x2 = x_pyr[l][:1], x_pyr[l][1:]
            cnet = cnet_pyr[l]
            h, w = x1.shape[-2:]
            ys, xs = torch.meshgrid(torch.arange(h), torch.arange(w),
                                    indexing="ij")
            coords0 = torch.stack([xs, ys], 0)[None].float()
            net_tmp, inp = torch.split(cnet, [64, 64], dim=1)
            inp = torch.relu(inp)
            if net is None:
                net = torch.tanh(net_tmp)
            else:
                net = F.interpolate(net, [h, w], mode="bilinear",
                                    align_corners=True)
                net_skip = torch.tanh(net_tmp)
                gate = torch.sigmoid(t_upnet(torch.cat([net, net_skip], 1)))
                net = gate * net + (1.0 - gate) * net_skip
            if l > 0:
                flow = rescale(flow, w, h)
                flow = F.interpolate(flow, [h, w], mode="bilinear",
                                     align_corners=True)
            for k in range(ipl):
                corr = torch_corr_block(x1, x2, coords0 + flow,
                                        num_levels=1, radius=4)
                delta, net, mask = t_update(
                    net, inp, corr, flow,
                    get_mask=(l == n_lvls - 1 and k == ipl - 1))
                flow = flow + delta
        out_flow = rescale(flow, wi, hi)
        # reference upsample_flow (rapidflow.py:213-224)
        N, _, H, W = out_flow.shape
        m = mask.view(N, 1, 9, 8, 8, H, W).softmax(dim=2)
        uf = F.unfold(out_flow, [3, 3], padding=1).view(N, 2, 9, 1, 1, H, W)
        uf = torch.sum(m * uf, dim=2).permute(0, 1, 4, 2, 5, 3)
        ref_flow = uf.reshape(N, 2, 8 * H, 8 * W)

    out = model({"images": images})
    got = np.asarray(out["flows"][:, 0])
    np.testing.assert_allclose(got, ref_flow.numpy(), atol=5e-3)


def test_rapidflow_variants_forward():
    for name, iters in (("rapidflow_it1", 1), ("rapidflow_it2", 2)):
        model = ptlflow_tpu.get_model(name)
        model.init_params()
        rng = np.random.RandomState(7)
        images = rng.rand(1, 2, 3, 96, 128).astype(np.float32)
        out = model({"images": images})
        assert out["flows"].shape == (1, 1, 2, 96, 128)
        assert np.isfinite(np.asarray(out["flows"])).all()


def test_rapidflow_training_and_loss():
    model = ptlflow_tpu.get_model("rapidflow", args={"iters": 3})
    model.init_params()
    rng = np.random.RandomState(8)
    b, h, w = 1, 64, 64
    inputs = {
        "images": jnp.asarray(rng.rand(b, 2, 3, h, w).astype(np.float32)),
        "flows": jnp.asarray(rng.randn(b, 1, 2, h, w).astype(np.float32)),
        "valids": jnp.ones((b, 1, 1, h, w), jnp.float32),
    }
    out = model.forward(model.params, inputs, training=True)
    assert out["flow_preds"].shape[0] == 3
    assert np.isfinite(float(model.loss_fn(out, inputs)))
