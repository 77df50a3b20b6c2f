"""DPFlow parity tests vs reference torch modules."""

import importlib.util
import sys
import types
from functools import partial

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.dpflow.cgu import CGU, CGUStage, group_norm
from ptlflow_tpu.models.dpflow.dpflow import (CGUBidirDualEncoder, ResStem,
                                              UpdateBlock, layer_norm2d)

REF = "/root/reference/ptlflow/models/dpflow"


@pytest.fixture(scope="module")
def ref():
    pkg = types.ModuleType("refdp")
    pkg.__path__ = [REF]
    sys.modules["refdp"] = pkg
    lt = types.ModuleType("refdp.local_timm")
    lt.__path__ = [f"{REF}/local_timm"]
    sys.modules["refdp.local_timm"] = lt
    mods = {}
    for name in ["local_timm.norm", "local_timm.layer_helpers",
                 "local_timm.drop", "local_timm.gelu",
                 "local_timm.weight_init", "norm", "conv", "utils", "cgu",
                 "res_stem", "update", "cgu_bidir_dual_encoder"]:
        spec = importlib.util.spec_from_file_location(
            f"refdp.{name}", f"{REF}/{name.replace('.', '/')}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refdp.{name}"] = mod
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


def _tnorm(ref):
    return partial(ref["norm"].GroupNorm2d, affine=False, num_groups=8)


def test_cgu_cross_block_parity(ref):
    t_blk = _randomize(ref["cgu"].CGU(
        dim=64, norm_layer=_tnorm(ref), use_cross=True, mlp_ratio=2,
        mlp_use_dw_conv=True, mlp_dw_kernel_size=7,
        layer_scale_init_value=0.01), 0).eval()
    j_blk = CGU(64, norm=group_norm, use_cross=True, mlp_ratio=2,
                mlp_use_dw_conv=True, mlp_dw_kernel_size=7,
                layer_scale_init_value=0.01)
    params = j_blk.from_torch(_sd(t_blk))
    rng = np.random.RandomState(0)
    x = rng.randn(1, 64, 10, 12).astype(np.float32)
    y = rng.randn(1, 64, 10, 12).astype(np.float32)
    with torch.no_grad():
        tx, ty = t_blk(torch.from_numpy(x), torch.from_numpy(y))
    jx, jy = j_blk(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                   jnp.asarray(np.transpose(y, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(jx), to_nhwc(tx), atol=1e-4)
    np.testing.assert_allclose(np.asarray(jy), to_nhwc(ty), atol=1e-4)


def test_cgu_stage_parity(ref):
    t_stage = _randomize(ref["cgu"].CGUStage(
        64, 96, stride=2, norm_layer=_tnorm(ref), depth=2, use_cross=True,
        mlp_ratio=2, mlp_dw_kernel_size=7,
        layer_scale_init_value=0.01), 1).eval()
    j_stage = CGUStage(64, 96, stride=2, norm=group_norm, depth=2,
                       use_cross=True, mlp_ratio=2, mlp_dw_kernel_size=7,
                       layer_scale_init_value=0.01)
    params = j_stage.from_torch(_sd(t_stage))
    rng = np.random.RandomState(1)
    x = rng.randn(1, 64, 16, 20).astype(np.float32)
    y = rng.randn(1, 64, 16, 20).astype(np.float32)
    with torch.no_grad():
        tx, ty = t_stage(torch.from_numpy(x), torch.from_numpy(y))
    jx, jy = j_stage(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                     jnp.asarray(np.transpose(y, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(jx), to_nhwc(tx), atol=1e-4)
    np.testing.assert_allclose(np.asarray(jy), to_nhwc(ty), atol=1e-4)


def test_res_stem_parity(ref):
    t_stem = _randomize(ref["res_stem"].ResStem([64, 96, 256], _tnorm(ref)),
                        2).eval()
    j_stem = ResStem([64, 96, 256], norm=group_norm)
    params = j_stem.from_torch(_sd(t_stem))
    rng = np.random.RandomState(2)
    x = rng.randn(1, 3, 32, 48).astype(np.float32)
    with torch.no_grad():
        refv = to_nhwc(t_stem(torch.from_numpy(x)))
    out = j_stem(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), refv, atol=1e-4)


def test_dual_encoder_parity(ref):
    t_enc = _randomize(ref["cgu_bidir_dual_encoder"].CGUBidirDualEncoder(
        pyramid_levels=None, hidden_chs=[32, 48, 64], out_1x1_abs_chs=192,
        out_1x1_factor=None, num_out_stages=1, activation_function=None,
        norm_layer=_tnorm(ref), depth=2, mlp_ratio=2, mlp_use_dw_conv=True,
        mlp_dw_kernel_size=7, cgu_layer_scale_init_value=0.01), 3).eval()
    j_enc = CGUBidirDualEncoder(
        hidden_chs=[32, 48, 64], out_1x1_abs_chs=192, out_1x1_factor=None,
        num_out_stages=1, norm=group_norm, depth=2, mlp_ratio=2,
        mlp_dw_kernel_size=7, layer_scale_init_value=0.01)
    params = j_enc.from_torch(_sd(t_enc))
    rng = np.random.RandomState(3)
    x = rng.randn(1, 3, 64, 96).astype(np.float32)
    y = rng.randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        tx_pyr, ty_pyr = t_enc(torch.from_numpy(x), torch.from_numpy(y),
                               pyr_levels=2)
    jx_pyr, jy_pyr = j_enc(params,
                           jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                           jnp.asarray(np.transpose(y, (0, 2, 3, 1))),
                           pyr_levels=2)
    assert len(jx_pyr) == len(tx_pyr) == 2
    for jp, tp in zip(jx_pyr + jy_pyr, tx_pyr + ty_pyr):
        np.testing.assert_allclose(np.asarray(jp), to_nhwc(tp), atol=1e-4)


def test_update_block_parity(ref):
    t_blk = _randomize(ref["update"].UpdateBlock(
        dec_motenc_corr_hidden_chs=256, dec_motenc_corr_out_chs=192,
        dec_motenc_flow_hidden_chs=128, dec_motenc_flow_out_chs=64,
        corr_levels=1, corr_range=4, dec_flow_kernel_size=7,
        dec_motion_chs=128, activation_function=None, net_chs_fixed=128,
        inp_chs_fixed=128,
        dec_gru_norm_layer=partial(ref["norm"].LayerNorm2d, affine=False),
        dec_gru_depth=2, dec_gru_iters=1, dec_gru_mlp_ratio=2.0,
        cgu_mlp_use_dw_conv=True, cgu_mlp_dw_kernel_size=7,
        dec_gru_mlp_in_kernel_size=1, dec_gru_mlp_out_kernel_size=1,
        cgu_layer_scale_init_value=0.01, dec_flow_head_chs=256,
        loss="laplace", use_upsample_mask=True,
        upmask_gradient_scale=1.0), 4).eval()
    j_blk = UpdateBlock(
        corr_levels=1, corr_range=4, net_chs_fixed=128, inp_chs_fixed=128,
        dec_motion_chs=128, dec_flow_kernel_size=7, dec_flow_head_chs=256,
        dec_gru_norm=layer_norm2d, dec_gru_depth=2, dec_gru_iters=1,
        dec_gru_mlp_ratio=2.0, mlp_dw_kernel_size=7,
        layer_scale_init_value=0.01, loss="laplace",
        use_upsample_mask=True, upmask_gradient_scale=1.0)
    params = j_blk.from_torch(_sd(t_blk))
    rng = np.random.RandomState(4)
    b, h, w = 1, 8, 10
    net = rng.randn(b, 128, h, w).astype(np.float32)
    inp = rng.randn(b, 128, h, w).astype(np.float32)
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


def test_dpflow_full_forward_parity(ref):
    """Torch oracle replicating reference dpflow.py:443-547 (eval path)."""
    from tests.ops.test_correlation import torch_corr_block

    t_fnet = _randomize(ref["cgu_bidir_dual_encoder"].CGUBidirDualEncoder(
        pyramid_levels=None, hidden_chs=[64, 96, 128], out_1x1_abs_chs=384,
        out_1x1_factor=None, num_out_stages=1, activation_function=None,
        norm_layer=_tnorm(ref), depth=2, mlp_ratio=2, mlp_use_dw_conv=True,
        mlp_dw_kernel_size=7, cgu_layer_scale_init_value=0.01), 10).eval()
    t_update = _randomize(ref["update"].UpdateBlock(
        dec_motenc_corr_hidden_chs=256, dec_motenc_corr_out_chs=192,
        dec_motenc_flow_hidden_chs=128, dec_motenc_flow_out_chs=64,
        corr_levels=1, corr_range=4, dec_flow_kernel_size=7,
        dec_motion_chs=128, activation_function=None, net_chs_fixed=128,
        inp_chs_fixed=128,
        dec_gru_norm_layer=partial(ref["norm"].LayerNorm2d, affine=False),
        dec_gru_depth=2, dec_gru_iters=1, dec_gru_mlp_ratio=2.0,
        cgu_mlp_use_dw_conv=True, cgu_mlp_dw_kernel_size=7,
        dec_gru_mlp_in_kernel_size=1, dec_gru_mlp_out_kernel_size=1,
        cgu_layer_scale_init_value=0.01, dec_flow_head_chs=256,
        loss="laplace", use_upsample_mask=True,
        upmask_gradient_scale=1.0), 11).eval()

    model = ptlflow_tpu.get_model(
        "dpflow", args={"iters_per_level": 2, "enc_depth": 2,
                        "dec_gru_depth": 2})
    sd = {}
    for prefix, mod in (("fnet", t_fnet), ("update_block", t_update)):
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
        ims = torch.flip(ims, [2])  # BGR -> RGB
        x1_raw, x2_raw = ims[:, 0], ims[:, 1]
        hi, wi = x1_raw.shape[-2:]
        p1, p2 = t_fnet(x1_raw, x2_raw, pyr_levels=3)
        flow = torch.zeros(1, 2, p1[0].shape[-2], p1[0].shape[-1])
        for l in range(len(p1)):
            x1f, x2f = p1[l], p2[l]
            xh = x1f.shape[1]
            ch = xh // 3
            halfch = ch // 2
            x1, cn1 = torch.split(x1f, [xh - ch, ch], dim=1)
            x2, cn2 = torch.split(x2f, [xh - ch, ch], dim=1)
            i1, n1 = torch.split(cn1, [ch - halfch, halfch], dim=1)
            i2, n2 = torch.split(cn2, [ch - halfch, halfch], dim=1)
            inp = torch.relu(torch.cat([i1, i2], 1))
            net = torch.tanh(torch.cat([n1, n2], 1))
            h, w = x1.shape[-2:]
            ys, xs = torch.meshgrid(torch.arange(h), torch.arange(w),
                                    indexing="ij")
            coords0 = torch.stack([xs, ys], 0)[None].float()
            if l > 0:
                flow = rescale(flow, w, h)
                flow = F.interpolate(flow, [h, w], mode="bilinear",
                                     align_corners=True)
            for _ in range(2):
                corr = torch_corr_block(x1, x2, coords0 + flow,
                                        num_levels=1, radius=4)
                delta, net, mask = t_update(net, inp, corr, flow)
                delta = delta[:, :2]
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


def test_dpflow_training_and_loss():
    model = ptlflow_tpu.get_model(
        "dpflow", args={"iters_per_level": 1, "enc_depth": 2,
                        "dec_gru_depth": 2})
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
    assert out["nf_preds"].shape == (3, b, h, w, 2)
    assert np.isfinite(float(model.loss_fn(out, inputs)))
