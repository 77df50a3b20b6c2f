"""VideoFlow parity tests vs reference torch modules (timm stubbed)."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.videoflow.videoflow import (SKUpdateBlockBOF,
                                                    SKUpdateBlockMOF)
from tests.models.test_flowformer import _install_timm_stub

REF = "/root/reference/ptlflow/models/videoflow"


@pytest.fixture(scope="module")
def ref():
    _install_timm_stub()
    if not hasattr(np, "float"):
        np.float = float  # vendored twins_ft uses the removed np.float alias
    pkg = types.ModuleType("refvf")
    pkg.__path__ = [REF]
    sys.modules["refvf"] = pkg
    nets = types.ModuleType("refvf.Networks")
    nets.__path__ = [f"{REF}/Networks"]
    sys.modules["refvf.Networks"] = nets
    bof = types.ModuleType("refvf.Networks.BOFNet")
    bof.__path__ = [f"{REF}/Networks/BOFNet"]
    sys.modules["refvf.Networks.BOFNet"] = bof
    mof = types.ModuleType("refvf.Networks.MOFNetStack")
    mof.__path__ = [f"{REF}/Networks/MOFNetStack"]
    sys.modules["refvf.Networks.MOFNetStack"] = mof
    mods = {}
    for name in ["utils", "Networks.twins_ft", "Networks.encoders",
                 "Networks.BOFNet.gma", "Networks.BOFNet.sk2",
                 "Networks.MOFNetStack.gma", "Networks.MOFNetStack.stack"]:
        if name == "Networks.encoders":
            # encoders.py calls timm.create_model("twins_svt_large");
            # route it to a faithful torch replica of timm's Twins built
            # from the vendored (block-level parity-tested) twins_ft Block
            sys.modules["timm"].create_model = \
                lambda n, pretrained=False: _make_torch_twins(
                    mods["Networks.twins_ft"])
        spec = importlib.util.spec_from_file_location(
            f"refvf.{name}", f"{REF}/{name.replace('.', '/')}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refvf.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def _make_torch_twins(twins_ft):
    """timm twins_svt_large truncated to 2 stages, with timm's module/param
    naming (patch_embeds/blocks/pos_block/norm + deletable extras)."""

    class PatchEmbed(torch.nn.Module):
        def __init__(self, patch_size, in_chans, embed_dim):
            super().__init__()
            self.proj = torch.nn.Conv2d(in_chans, embed_dim, patch_size,
                                        stride=patch_size)
            self.norm = torch.nn.LayerNorm(embed_dim)

        def forward(self, x):
            x = self.proj(x)
            b, c, h, w = x.shape
            return self.norm(x.flatten(2).transpose(1, 2)), (h, w)

    class PosConv(torch.nn.Module):
        def __init__(self, ch):
            super().__init__()
            self.proj = torch.nn.Sequential(
                torch.nn.Conv2d(ch, ch, 3, 1, 1, groups=ch))

        def forward(self, x, size):
            b, n, c = x.shape
            feat = x.transpose(1, 2).view(b, c, *size)
            out = self.proj(feat) + feat
            return out.flatten(2).transpose(1, 2)

    class Twins(torch.nn.Module):
        def __init__(self):
            super().__init__()
            dims, heads, srs = (128, 256), (4, 8), (8, 4)
            self.depths = [2, 2, 18, 2]
            # stages 2-3 are dummies: encoders.twins_svt_large deletes them
            self.patch_embeds = torch.nn.ModuleList(
                [PatchEmbed(4, 3, dims[0]), PatchEmbed(2, dims[0], dims[1]),
                 torch.nn.Identity(), torch.nn.Identity()])
            self.pos_drops = torch.nn.ModuleList(
                [torch.nn.Dropout(0.0) for _ in range(4)])
            self.blocks = torch.nn.ModuleList([
                torch.nn.ModuleList([
                    twins_ft.Block(dim=dims[k], num_heads=heads[k],
                                   mlp_ratio=4, sr_ratio=srs[k],
                                   ws=7 if i % 2 == 0 else 1)
                    for i in range(2)])
                for k in range(2)] + [torch.nn.ModuleList(),
                                      torch.nn.ModuleList()])
            self.pos_block = torch.nn.ModuleList(
                [PosConv(d) for d in dims] + [torch.nn.Identity(),
                                              torch.nn.Identity()])
            self.norm = torch.nn.LayerNorm(1024, eps=1e-6)
            self.head = torch.nn.Identity()

    return Twins()


def _sd(mod):
    # drop the rel_ind index buffer (recomputed on the fly in our RelPosEmb)
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()
            if not k.endswith("rel_ind")}


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def test_bof_update_block_parity(ref):
    torch.manual_seed(0)
    t_blk = ref["Networks.BOFNet.sk2"].\
        SKUpdateBlock6_Deep_nopoolres_AllDecoder2(
            corr_radius=4, corr_levels=4, cost_heads_num=1,
            hidden_dim=128).eval()
    t_att = ref["Networks.BOFNet.gma"].Attention(
        dim=128, heads=1, max_pos_size=160, dim_head=128).eval()
    j_blk = SKUpdateBlockBOF(corr_radius=4, corr_levels=4, cost_heads_num=1,
                             hidden_dim=128)
    params = j_blk.from_torch(_sd(t_blk))
    from ptlflow_tpu.models.gma.gma_utils import Attention as JAttention
    j_att = JAttention(dim=128, heads=1, max_pos_size=160, dim_head=128)
    att_params = j_att.from_torch(_sd(t_att))
    rng = np.random.RandomState(0)
    b, h, w = 1, 8, 10
    net = rng.randn(b, 128, h, w).astype(np.float32)
    inp = rng.randn(b, 128, h, w).astype(np.float32)
    corr = rng.randn(b, 2 * 4 * 81, h, w).astype(np.float32)
    flow = rng.randn(b, 4, h, w).astype(np.float32)
    with torch.no_grad():
        attention = t_att(torch.from_numpy(inp))
        t_net, t_mask, t_delta = t_blk(
            *(torch.from_numpy(v) for v in (net, inp, corr, flow)),
            attention)
    j_attention = j_att(att_params, nhwc(inp))
    j_net, j_mask, j_delta = j_blk(
        params, *(nhwc(v) for v in (net, inp, corr, flow)), j_attention)
    np.testing.assert_allclose(np.asarray(j_net), to_nhwc(t_net), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_mask), to_nhwc(t_mask),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_delta), to_nhwc(t_delta),
                               atol=1e-4)


def test_mof_update_block_parity(ref):
    torch.manual_seed(1)
    t_blk = ref["Networks.MOFNetStack.stack"].\
        SKUpdateBlock6_Deep_nopoolres_AllDecoder2(
            feat_dim=256, down_ratio=8, corr_radius=4, corr_levels=4,
            cost_heads_num=1, hidden_dim=128).eval()
    t_att = ref["Networks.MOFNetStack.gma"].Attention(
        dim=128, heads=1, max_pos_size=160, dim_head=128).eval()
    j_blk = SKUpdateBlockMOF(feat_dim=256, down_ratio=8, corr_radius=4,
                             corr_levels=4, cost_heads_num=1, hidden_dim=128)
    params = j_blk.from_torch(_sd(t_blk))
    from ptlflow_tpu.models.gma.gma_utils import Attention as JAttention
    j_att = JAttention(dim=128, heads=1, max_pos_size=160, dim_head=128)
    att_params = j_att.from_torch(_sd(t_att))
    rng = np.random.RandomState(1)
    bs, n, h, w = 1, 3, 8, 10
    bn = bs * n
    net = rng.randn(bn, 128, h, w).astype(np.float32)
    inp = rng.randn(bn, 128, h, w).astype(np.float32)
    fcorr = rng.randn(bn, 4 * 81, h, w).astype(np.float32)
    bcorr = rng.randn(bn, 4 * 81, h, w).astype(np.float32)
    fflow = 2 * rng.randn(bn, 2, h, w).astype(np.float32)
    bflow = 2 * rng.randn(bn, 2, h, w).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    coords0 = np.stack([xs, ys], 0)[None].repeat(bn, 0).astype(np.float32)
    with torch.no_grad():
        attention = t_att(torch.from_numpy(inp))
        t_net, t_mhs, t_mask, t_delta = t_blk(
            torch.from_numpy(net), None, torch.from_numpy(inp),
            torch.from_numpy(fcorr), torch.from_numpy(bcorr),
            torch.from_numpy(fflow), torch.from_numpy(bflow),
            torch.from_numpy(coords0), attention, bs=bs)
    j_attention = j_att(att_params, nhwc(inp))
    j_net, j_mhs, j_mask, j_delta = j_blk(
        params, nhwc(net), None, nhwc(inp), nhwc(fcorr), nhwc(bcorr),
        nhwc(fflow), nhwc(bflow), nhwc(coords0), j_attention, bs=bs)
    np.testing.assert_allclose(np.asarray(j_net), to_nhwc(t_net), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_mhs), to_nhwc(t_mhs), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_mask), to_nhwc(t_mask),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(j_delta), to_nhwc(t_delta),
                               atol=1e-4)


def test_videoflow_bof_full_forward_parity(ref):
    """Torch oracle replicating reference videoflow_bof.py:116-215 (eval)."""
    from tests.ops.test_correlation import torch_corr_block

    torch.manual_seed(2)
    t_fnet = ref["Networks.encoders"].twins_svt_large(pretrained=False).eval()
    t_cnet = ref["Networks.encoders"].twins_svt_large(pretrained=False).eval()
    t_update = ref["Networks.BOFNet.sk2"].\
        SKUpdateBlock6_Deep_nopoolres_AllDecoder2(
            corr_radius=4, corr_levels=4, cost_heads_num=1,
            hidden_dim=128).eval()
    t_att = ref["Networks.BOFNet.gma"].Attention(
        dim=128, heads=1, max_pos_size=160, dim_head=128).eval()

    iters = 2
    model = ptlflow_tpu.get_model("videoflow_bof",
                                  args={"decoder_depth": iters})
    sd = {}
    for prefix, mod in (("fnet", t_fnet), ("cnet", t_cnet),
                        ("update_block", t_update), ("att", t_att)):
        sd.update({f"{prefix}.{k}": v for k, v in _sd(mod).items()})
    model.params = model.from_torch(sd)

    rng = np.random.RandomState(2)
    # >=128px: the 4-level corr pyramid needs >1px at the coarsest level
    images = rng.rand(1, 3, 3, 128, 160).astype(np.float32)

    with torch.no_grad():
        ims = (torch.from_numpy(images) - 0.5) * 2.0
        ims = torch.flip(ims, [2])  # BGR -> RGB
        B, N, _, H, W = ims.shape
        fmaps = t_fnet(ims.reshape(B * N, 3, H, W)).reshape(
            B, N, -1, H // 8, W // 8)
        fmap1, fmap2, fmap3 = fmaps[:, 0], fmaps[:, 1], fmaps[:, 2]
        cnet = t_cnet(ims[:, 1])
        net, inp = torch.split(cnet, [128, 128], dim=1)
        net = torch.tanh(net)
        inp = torch.relu(inp)
        attention = t_att(inp)
        h8, w8 = H // 8, W // 8
        ys2, xs2 = torch.meshgrid(torch.arange(h8), torch.arange(w8),
                                  indexing="ij")
        coords0 = torch.stack([xs2, ys2], 0)[None].float()
        c21 = coords0.clone()
        c23 = coords0.clone()
        for _ in range(iters):
            corr21 = torch_corr_block(fmap2, fmap1, c21, 4, 4)
            corr23 = torch_corr_block(fmap2, fmap3, c23, 4, 4)
            corr = torch.cat([corr23, corr21], dim=1)
            flow = torch.cat([c23 - coords0, c21 - coords0], dim=1)
            net, up_mask, delta = t_update(net, inp, corr, flow, attention)
            m21, m23 = torch.split(up_mask, [64 * 9, 64 * 9], dim=1)
            c23 = c23 + delta[:, 0:2]
            c21 = c21 + delta[:, 2:4]

        def up(flow, mask):
            n_, _, hh, ww = flow.shape
            m = mask.view(n_, 1, 9, 8, 8, hh, ww).softmax(dim=2)
            uf = F.unfold(8 * flow, [3, 3], padding=1).view(
                n_, 2, 9, 1, 1, hh, ww)
            uf = torch.sum(m * uf, dim=2).permute(0, 1, 4, 2, 5, 3)
            return uf.reshape(n_, 2, 8 * hh, 8 * ww)

        ref23 = up(c23 - coords0, m23)

    out = model({"images": images})
    got = np.asarray(out["flows"][:, 0])
    diff = np.abs(got - ref23.numpy())
    assert diff.mean() < 2e-3, diff.mean()
    assert diff.max() < 0.2, diff.max()


def test_videoflow_mof_forward_smoke():
    model = ptlflow_tpu.get_model("videoflow_mof", args={"decoder_depth": 2})
    model.init_params()
    rng = np.random.RandomState(5)
    images = rng.rand(1, 5, 3, 64, 96).astype(np.float32)
    out = model({"images": images})
    assert out["flows"].shape == (1, 1, 2, 64, 96)
    assert out["flows_bw"].shape == (1, 1, 2, 64, 96)
    assert np.isfinite(np.asarray(out["flows"])).all()
    outt = model.forward(model.params, {"images": jnp.asarray(images)},
                         training=True)
    assert outt["flow_preds"].shape[0] == 2
