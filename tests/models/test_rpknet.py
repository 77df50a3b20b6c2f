"""RPKNet parity tests vs reference torch modules."""

import importlib.util
import math
import sys
import types
from functools import partial

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.rpknet.pkconv_slk import (PKConv2d, PKConvSLK, SLK,
                                                  group_norm, layer_norm2d)
from ptlflow_tpu.models.rpknet.rpknet import (PKConvSLKEncoder,
                                              UpdatePartialBlock)

REF = "/root/reference/ptlflow/models/rpknet"


@pytest.fixture(scope="module")
def ref():
    pkg = types.ModuleType("refrpk")
    pkg.__path__ = [REF]
    sys.modules["refrpk"] = pkg
    lt = types.ModuleType("refrpk.local_timm")
    lt.__path__ = [f"{REF}/local_timm"]
    sys.modules["refrpk.local_timm"] = lt
    mods = {}
    for name in ["local_timm.norm", "local_timm.layer_helpers",
                 "local_timm.drop", "local_timm.gelu",
                 "local_timm.weight_init", "pkconv", "pkconv_slk",
                 "update_partial", "pkconv_slk_encoder", "utils"]:
        spec = importlib.util.spec_from_file_location(
            f"refrpk.{name}", f"{REF}/{name.replace('.', '/')}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refrpk.{name}"] = mod
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


def test_pkconv_slicing_parity(ref):
    t_conv = _randomize(ref["pkconv"].PKConv2d(64, 96, 3, padding=1), 0)
    j_conv = PKConv2d(64, 96, 3, padding=1)
    params = j_conv.from_torch(_sd(t_conv))
    rng = np.random.RandomState(0)
    x = rng.randn(1, 48, 8, 10).astype(np.float32)
    with torch.no_grad():
        refv = to_nhwc(t_conv(torch.from_numpy(x), out_ch=40))
    out = j_conv(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                 out_ch=40)
    np.testing.assert_allclose(np.asarray(out), refv, atol=1e-5)


def test_pkconv_depthwise_slicing_parity(ref):
    t_conv = _randomize(
        ref["pkconv"].PKConv2d(96, 96, (23, 1), padding=(11, 0), groups=96),
        1)
    j_conv = PKConv2d(96, 96, (23, 1), padding=(11, 0), groups=96)
    params = j_conv.from_torch(_sd(t_conv))
    rng = np.random.RandomState(1)
    x = rng.randn(1, 64, 8, 10).astype(np.float32)
    with torch.no_grad():
        refv = to_nhwc(t_conv(torch.from_numpy(x), out_ch=64))
    out = j_conv(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                 out_ch=64)
    np.testing.assert_allclose(np.asarray(out), refv, atol=1e-5)


def test_slk_block_parity(ref):
    norm = partial(ref["local_timm.norm"].GroupNorm, affine=False,
                   num_groups=8)
    t_blk = _randomize(ref["pkconv_slk"].SLK(96, mlp_ratio=4,
                                             norm_layer=norm), 2).eval()
    j_blk = SLK(96, mlp_ratio=4, norm=group_norm)
    params = j_blk.from_torch(_sd(t_blk))
    rng = np.random.RandomState(2)
    x = rng.randn(1, 64, 10, 12).astype(np.float32)
    with torch.no_grad():
        refv = to_nhwc(t_blk(torch.from_numpy(x)))
    out = j_blk(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), refv, atol=1e-4)


def test_pkconv_slk_stage_parity(ref):
    norm = partial(ref["local_timm.norm"].GroupNorm, affine=False,
                   num_groups=8)
    t_stage = _randomize(
        ref["pkconv_slk"].PKConvSLK(96, 96, mlp_ratio=4, norm_layer=norm,
                                    stride=2, depth=2), 3).eval()
    j_stage = PKConvSLK(96, 96, mlp_ratio=4, norm=group_norm, stride=2,
                        depth=2)
    params = j_stage.from_torch(_sd(t_stage))
    rng = np.random.RandomState(3)
    x = rng.randn(1, 32, 16, 20).astype(np.float32)
    with torch.no_grad():
        refv = to_nhwc(t_stage(torch.from_numpy(x), out_ch=64))
    out = j_stage(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                  out_ch=64)
    np.testing.assert_allclose(np.asarray(out), refv, atol=1e-4)


def test_encoder_parity(ref):
    norm = partial(ref["local_timm.norm"].GroupNorm, affine=False,
                   num_groups=8)
    t_enc = _randomize(ref["pkconv_slk_encoder"].PKConvSLKEncoder(
        pyr_range=[8, 32], hidden_chs=[32, 64, 96], out_1x1_abs_chs=192,
        out_1x1_factor=2.0, stem_stride=2, norm_layer=norm, mlp_ratio=4,
        depth=2), 4).eval()
    j_enc = PKConvSLKEncoder(pyr_range=[8, 32], hidden_chs=[32, 64, 96],
                             out_1x1_abs_chs=192, out_1x1_factor=2.0,
                             stem_stride=2, norm=group_norm, mlp_ratio=4,
                             depth=2)
    params = j_enc.from_torch(_sd(t_enc))
    rng = np.random.RandomState(4)
    x = rng.randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        ref_pyr = t_enc(torch.from_numpy(x))
    out_pyr = j_enc(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    assert len(out_pyr) == len(ref_pyr) == 3
    for o, r in zip(out_pyr, ref_pyr):
        np.testing.assert_allclose(np.asarray(o), to_nhwc(r), atol=1e-4)


def test_update_partial_block_parity(ref):
    t_blk = _randomize(ref["update_partial"].UpdatePartialBlock(
        pyramid_ranges=(32, 8), corr_levels=1, corr_range=4,
        net_chs_fixed=64, inp_chs_fixed=64, group_norm_num_groups=8,
        use_norm_affine=False, dec_motion_chs=128, dec_gru_depth=2,
        dec_gru_iters=2, dec_gru_mlp_ratio=4.0, use_upsample_mask=True,
        upmask_gradient_scale=1.0, cache_pkconv_weights=False), 5).eval()
    j_blk = UpdatePartialBlock(
        pyramid_ranges=(32, 8), corr_levels=1, corr_range=4,
        net_chs_fixed=64, inp_chs_fixed=64, dec_motion_chs=128,
        dec_gru_depth=2, dec_gru_iters=2, dec_gru_mlp_ratio=4.0,
        use_upsample_mask=True, upmask_gradient_scale=1.0)
    params = j_blk.from_torch(_sd(t_blk))
    rng = np.random.RandomState(5)
    b, h, w = 1, 8, 10
    net = rng.randn(b, 64, h, w).astype(np.float32)
    inp = rng.randn(b, 64, h, w).astype(np.float32)
    corr = rng.randn(b, 81, h, w).astype(np.float32)
    flow = rng.randn(b, 2, h, w).astype(np.float32)
    with torch.no_grad():
        t_delta, t_net, t_mask = t_blk(
            *(torch.from_numpy(v) for v in (net, inp, corr, flow)))
    j_delta, j_net, j_mask = j_blk(
        params, *(jnp.asarray(np.transpose(v, (0, 2, 3, 1))) for v in
                  (net, inp, corr, flow)), get_mask=True)
    np.testing.assert_allclose(np.asarray(j_delta), to_nhwc(t_delta),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_net), to_nhwc(t_net), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_mask), to_nhwc(t_mask),
                               atol=1e-4)


def test_rpknet_full_forward_parity(ref):
    """Torch oracle replicating reference rpknet.py:342-457 (eval path)
    vs our model with converted weights."""
    from tests.ops.test_correlation import torch_corr_block

    norm = partial(ref["local_timm.norm"].GroupNorm, affine=False,
                   num_groups=8)
    iters = 6
    t_fnet = _randomize(ref["pkconv_slk_encoder"].PKConvSLKEncoder(
        pyr_range=[8, 32], hidden_chs=[32, 64, 96], out_1x1_abs_chs=192,
        out_1x1_factor=2.0, stem_stride=2, norm_layer=norm, mlp_ratio=4,
        depth=2), 10).eval()
    t_update = _randomize(ref["update_partial"].UpdatePartialBlock(
        pyramid_ranges=(32, 8), corr_levels=1, corr_range=4,
        net_chs_fixed=64, inp_chs_fixed=64, group_norm_num_groups=8,
        use_norm_affine=False, dec_motion_chs=128, dec_gru_depth=2,
        dec_gru_iters=2, dec_gru_mlp_ratio=4.0, use_upsample_mask=True,
        upmask_gradient_scale=1.0, cache_pkconv_weights=False), 11).eval()

    class TUpNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = ref["pkconv"].PKConv2d(128, 64, 1)
            self.res = ref["utils"].ResidualPartialBlock(
                64, 64, norm_layer=norm, use_out_activation=False)

        def forward(self, x):
            x = torch.relu(self.conv(x, x.shape[1] // 2))
            return self.res(x, x.shape[1])

    t_upnet = _randomize(TUpNet(), 12).eval()

    model = ptlflow_tpu.get_model("rpknet", args={"iters": iters})
    sd = {}
    for prefix, mod in (("fnet", t_fnet), ("update_block", t_update),
                        ("upnet_gate_layer", t_upnet)):
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
        p1 = t_fnet(x1_raw)
        p2 = t_fnet(x2_raw)
        n_lvls = 3
        ipl = int(math.ceil(iters / n_lvls))
        flow = torch.zeros(1, 2, p1[0].shape[-2], p1[0].shape[-1])
        net = None
        for l in range(n_lvls):
            x1f, x2f = p1[l], p2[l]
            xh = x1f.shape[1]
            ch = xh // 3
            halfch = ch // 2
            x1, cn1 = torch.split(x1f, [xh - ch, ch], dim=1)
            x2, cn2 = torch.split(x2f, [xh - ch, ch], dim=1)
            i1, n1 = torch.split(cn1, [ch - halfch, halfch], dim=1)
            i2, n2 = torch.split(cn2, [ch - halfch, halfch], dim=1)
            inp = torch.relu(torch.cat([i1, i2], 1))
            net_tmp = torch.cat([n1, n2], 1)
            h, w = x1.shape[-2:]
            ys, xs = torch.meshgrid(torch.arange(h), torch.arange(w),
                                    indexing="ij")
            coords0 = torch.stack([xs, ys], 0)[None].float()
            if net is None:
                net = torch.tanh(net_tmp)
            else:
                net = F.interpolate(net, [h, w], mode="bilinear",
                                    align_corners=True)
                net = torch.tanh(net)
                net_skip = torch.tanh(net_tmp)
                gate = torch.sigmoid(t_upnet(torch.cat([net, net_skip], 1)))
                net = gate * net + (1.0 - gate) * net_skip
            if l > 0:
                flow = rescale(flow, w, h)
                flow = F.interpolate(flow, [h, w], mode="bilinear",
                                     align_corners=True)
            for _ in range(ipl):
                corr = torch_corr_block(x1, x2, coords0 + flow,
                                        num_levels=1, radius=4)
                delta, net, mask = t_update(net, inp, corr, flow)
                flow = flow + delta
        out_flow = rescale(flow, wi, hi)
        N, _, H, W = out_flow.shape
        m = mask.view(N, 1, 9, 8, 8, H, W).softmax(dim=2)
        uf = F.unfold(out_flow, [3, 3], padding=1).view(N, 2, 9, 1, 1, H, W)
        uf = torch.sum(m * uf, dim=2).permute(0, 1, 4, 2, 5, 3)
        ref_flow = uf.reshape(N, 2, 8 * H, 8 * W)

    out = model({"images": images})
    got = np.asarray(out["flows"][:, 0])
    np.testing.assert_allclose(got, ref_flow.numpy(), atol=5e-3)


def test_rpknet_training_and_loss():
    model = ptlflow_tpu.get_model("rpknet", args={"iters": 3})
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
