"""WAFT backbones: frozen DepthAnythingV2 features, the trainable ViT
refine network, the Twins feature encoder, and the ResNet18 deconv nets.

Behavioral parity:
- DepthAnythingFeature (a1): waft/backbone/waft_a1_dav2.py:8-62
- DepthAnythingFeature (a2): waft/backbone/waft_a2_dav2.py:20-91
- VisionTransformer refine net: waft/backbone/vit.py:34-113
- TwinsFeatureEncoder: waft/backbone/twins.py:170-234
- ResNet18Deconv: waft_a1.py:36-75 (timm resnet18 layers) and
  waft_a2.py:42-73 (resconv stages)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ... import nn
from ...nn import Module
from ...ops.grid_sample import interpolate, interpolate_bicubic
from ..flowformer.twins_tpu import (Block as TwinsBlock,
                                    PatchEmbed as TwinsPatchEmbed, PosConv)
from ..memfof.memfof import TVBasicBlock
from .dinov2 import DinoVisionTransformer, VitBlock, VitPatchEmbed
from .dpt import DPTHeadA1, DPTHeadLvl, FeatureFusionBlock, fuse_pyramid

VIT_CONFIGS = {
    "vitl": dict(features=256, out_channels=(256, 512, 1024, 1024),
                 embed_dim=1024, depth=24, num_heads=16,
                 idx=(4, 11, 17, 23)),
    "vitb": dict(features=128, out_channels=(96, 192, 384, 768),
                 embed_dim=768, depth=12, num_heads=12, idx=(2, 5, 8, 11)),
    "vits": dict(features=64, out_channels=(48, 96, 192, 384),
                 embed_dim=384, depth=12, num_heads=6, idx=(2, 5, 8, 11)),
    "vitt": dict(features=32, out_channels=(24, 48, 96, 192),
                 embed_dim=192, depth=12, num_heads=3, idx=(2, 5, 8, 11)),
}


class _DepthAnythingV2(Module):
    """thirdparty dpt.py:174-211 — frozen DINOv2 + DPT depth head."""

    def __init__(self, encoder="vits"):
        super().__init__()
        cfg = VIT_CONFIGS[encoder]
        self.idx = cfg["idx"]
        self.pretrained = DinoVisionTransformer(encoder)
        self.depth_head = DPTHeadA1(self.pretrained.embed_dim,
                                    cfg["features"], cfg["out_channels"],
                                    patch_size=14)


class DepthAnythingFeatureA1(Module):
    """waft_a1_dav2.py:8-62: full DA head run with
    return_intermediate=True; frozen wholesale by WAFTa1."""

    def __init__(self, encoder="vits"):
        super().__init__()
        self.output_dim = VIT_CONFIGS[encoder]["features"]
        self.depth_anything = _DepthAnythingV2(encoder)

    def __call__(self, params, x, **kw):
        da = self.depth_anything
        p = params["depth_anything"]
        h, w = x.shape[1:3]
        feats = da.pretrained.get_intermediate_layers(p["pretrained"], x,
                                                      da.idx)
        ph, pw = h // 14, w // 14
        out, p1, p2, p3, p4 = da.depth_head(p["depth_head"], feats, ph, pw)
        return {"out": out, "path_1": p1, "path_2": p2, "path_3": p3,
                "path_4": p4}


class DepthAnythingFeatureA2(Module):
    """waft_a2_dav2.py:20-91: frozen DINOv2 encoder + TRAINABLE lvl=-3
    DPT head; returns one map at 1/2 resolution."""

    def __init__(self, model_name="vits", lvl=-3):
        super().__init__()
        cfg = VIT_CONFIGS[model_name]
        self.idx = cfg["idx"]
        self.output_dim = cfg["features"]
        self.encoder = DinoVisionTransformer(model_name)
        self.dpt_head = DPTHeadLvl(self.encoder.embed_dim,
                                   features=cfg["features"],
                                   out_channels=cfg["out_channels"],
                                   lvl=lvl)

    def __call__(self, params, x, **kw):
        h, w = x.shape[1:3]
        feats = self.encoder.get_intermediate_layers(params["encoder"], x,
                                                     self.idx)
        ph, pw = h // 14, w // 14
        outs = self.dpt_head(params["dpt_head"], feats, ph, pw)
        return interpolate(outs[0], (h // 2, w // 2), align_corners=True)


class Twins4Stage(Module):
    """timm ``twins_svt_large`` (features_only): 4 stages at strides
    4/8/16/32, dims (128, 256, 512, 1024)."""

    def __init__(self):
        super().__init__()
        dims = (128, 256, 512, 1024)
        heads = (4, 8, 16, 32)
        depths = (2, 2, 18, 2)
        srs = (8, 4, 2, 1)
        wss = (7, 7, 7, 7)
        self.depths = depths
        self.patch_embeds = nn.ModuleList([
            TwinsPatchEmbed(4 if i == 0 else 2,
                            3 if i == 0 else dims[i - 1], dims[i])
            for i in range(4)])
        self.blocks = nn.ModuleList([
            nn.ModuleList([
                TwinsBlock(dims[k], heads[k], 4.0, sr_ratio=srs[k],
                           ws=1 if i % 2 == 1 else wss[k])
                for i in range(depths[k])])
            for k in range(4)])
        self.pos_block = nn.ModuleList([PosConv(d, d) for d in dims])

    def from_torch(self, flat, strict=True, _path=""):
        # timm's state dict retains the classifier-era final norm/head;
        # the features_only forward never uses them
        flat = {k: v for k, v in flat.items()
                if not (k.startswith("norm.") or k.startswith("head.")
                        or k.startswith("head_drop."))}
        return super().from_torch(flat, strict=strict, _path=_path)

    def __call__(self, params, x, **kw):
        b = x.shape[0]
        outs = []
        for i in range(4):
            x, size = self.patch_embeds[i](params["patch_embeds"][str(i)],
                                           x)
            for j, blk in enumerate(self.blocks[i]):
                x = blk(params["blocks"][str(i)][str(j)], x, size)
                if j == 0:
                    x = self.pos_block[i](params["pos_block"][str(i)], x,
                                          size)
            x = x.reshape(b, size[0], size[1], -1)
            outs.append(x)
        return outs


class TwinsFeatureEncoder(Module):
    """waft/backbone/twins.py:170-234: frozen Twins backbone, trainable
    DPT-style fusion producing a 1/2-resolution 64-channel map."""

    def __init__(self):
        super().__init__()
        self.backbone = Twins4Stage()
        self.out_channels = (128, 256, 512, 1024)
        self.features = 128
        self.output_dim = self.features // 2
        self.scratch = nn.ModuleList(
            [nn.Conv2d(oc, self.features, 3, padding=1, bias=False)
             for oc in self.out_channels])
        self.refine = nn.ModuleList(
            [FeatureFusionBlock(self.features) for _ in range(4)])
        self.final = nn.ConvTranspose2d(self.features, self.features // 2,
                                        4, stride=2, padding=1)

    def __call__(self, params, x, **kw):
        maps = self.backbone(params["backbone"], x, **kw)
        out_rn = fuse_pyramid(self.scratch, params["scratch"], self.refine,
                              params["refine"], maps)
        return self.final(params["final"], out_rn[0])


class RefineViT(Module):
    """waft/backbone/vit.py:34-113: patch-8 ViT over the refine input,
    learned 8x8 pos embed (bicubic-resized), taps 4 blocks into an
    a1-style DPT head; 'out' is bilinearly resized back to input size."""

    def __init__(self, model_name, input_dim, patch_size=8):
        super().__init__()
        cfg = VIT_CONFIGS[model_name]
        self.embed_dim = cfg["embed_dim"]
        self.idx = cfg["idx"]
        self.patch_size = patch_size
        self.output_dim = cfg["features"]
        self.patch_embed = VitPatchEmbed(patch_size, input_dim,
                                         self.embed_dim)
        self.blks = nn.ModuleList([
            VitBlock(self.embed_dim, cfg["num_heads"], 4.0, qkv_bias=True,
                     init_values=None) for _ in range(cfg["depth"])])
        self.dpt_head = DPTHeadA1(self.embed_dim, cfg["features"],
                                  cfg["out_channels"], patch_size=14)

    def _torch_leaves(self):
        return {"pos_embed": lambda v: v}

    def init(self, key):
        p = super().init(key)
        p["pos_embed"] = jnp.zeros((1, 64, self.embed_dim), jnp.float32)
        return p

    def _pos_encoding(self, params, npatch, h, w):
        """vit.py:66-89 — plain bicubic (no cls token, no offset)."""
        pos_embed = params["pos_embed"]
        n = pos_embed.shape[1]
        if npatch == n and w == h:
            return pos_embed
        dim = pos_embed.shape[-1]
        h0 = h // self.patch_size
        w0 = w // self.patch_size
        sqrt_n = int(math.sqrt(n))
        grid = pos_embed.astype(jnp.float32).reshape(1, sqrt_n, sqrt_n, dim)
        grid = interpolate_bicubic(
            grid, (h0 / sqrt_n, w0 / sqrt_n), size=(h0, w0))
        return grid.reshape(1, h0 * w0, dim).astype(pos_embed.dtype)

    def __call__(self, params, x, **kw):
        b, h, w, _ = x.shape
        tokens = self.patch_embed(params["patch_embed"], x)
        tokens = tokens + self._pos_encoding(
            params, tokens.shape[1], h, w).astype(tokens.dtype)
        feats = []
        for i in range(len(self.blks)):
            tokens = self.blks[i](params["blks"][str(i)], tokens)
            if i in self.idx:
                feats.append((tokens, None))
        ph, pw = h // self.patch_size, w // self.patch_size
        out, p1, p2, p3, p4 = self.dpt_head(params["dpt_head"], feats, ph,
                                            pw)
        out = interpolate(out, (h, w), align_corners=True)
        return {"out": out, "path_1": p1, "path_2": p2, "path_3": p3,
                "path_4": p4}


class ResConvGELU(Module):
    """waft_a1.py:16-33 resconv: GELU-conv-GELU-conv + 1x1 skip."""

    def __init__(self, inp, oup, k=3, s=1):
        super().__init__()
        self.conv = nn.Sequential(
            nn.gelu, nn.Conv2d(inp, oup, k, stride=s, padding=k // 2),
            nn.gelu, nn.Conv2d(oup, oup, 3, padding=1))
        if inp != oup or s != 1:
            self.skip_conv = nn.Conv2d(inp, oup, 1, stride=s)
        else:
            self.skip_conv = None

    def __call__(self, params, x, **kw):
        y = self.conv(params["conv"], x)
        skip = x if self.skip_conv is None else self.skip_conv(
            params["skip_conv"], x)
        return y + skip


def _tv_layer(in_p, dim, stride):
    return nn.Sequential(TVBasicBlock(in_p, dim, stride),
                         TVBasicBlock(dim, dim))


class ResNet18DeconvA1(Module):
    """waft_a1.py:36-75: resconv stem, timm-resnet18 layers 1-4, deconv
    top-down fusion; returns the 4-level pyramid (finest first, 1/2)."""

    def __init__(self, inp, oup):
        super().__init__()
        self.ds1 = ResConvGELU(inp, 64, k=7, s=2)
        self.conv1 = _tv_layer(64, 64, 1)
        self.conv2 = _tv_layer(64, 128, 2)
        self.conv3 = _tv_layer(128, 256, 2)
        self.conv4 = _tv_layer(256, 512, 2)
        self.up_4 = nn.ConvTranspose2d(512, 256, 2, stride=2)
        self.proj_3 = ResConvGELU(256, 256)
        self.up_3 = nn.ConvTranspose2d(256, 128, 2, stride=2)
        self.proj_2 = ResConvGELU(128, 128)
        self.up_2 = nn.ConvTranspose2d(128, 64, 2, stride=2)
        self.proj_1 = ResConvGELU(64, oup)

    def __call__(self, params, x, **kw):
        o1 = self.conv1(params["conv1"], self.ds1(params["ds1"], x), **kw)
        o2 = self.conv2(params["conv2"], o1, **kw)
        o3 = self.conv3(params["conv3"], o2, **kw)
        o4 = self.conv4(params["conv4"], o3, **kw)
        o3 = self.proj_3(params["proj_3"],
                         o3 + self.up_4(params["up_4"], o4))
        o2 = self.proj_2(params["proj_2"],
                         o2 + self.up_3(params["up_3"], o3))
        o1 = self.proj_1(params["proj_1"],
                         o1 + self.up_2(params["up_2"], o2))
        return [o1, o2, o3, o4]


class ResNet18DeconvA2(Module):
    """waft_a2.py:42-73: all-resconv variant."""

    def __init__(self, inp, oup):
        super().__init__()
        self.ds1 = ResConvGELU(inp, 64, k=7, s=2)
        self.conv1 = ResConvGELU(64, 64)
        self.conv2 = ResConvGELU(64, 128, s=2)
        self.conv3 = ResConvGELU(128, 256, s=2)
        self.conv4 = ResConvGELU(256, 512, s=2)
        self.up_4 = nn.ConvTranspose2d(512, 256, 2, stride=2)
        self.proj_3 = ResConvGELU(256, 256)
        self.up_3 = nn.ConvTranspose2d(256, 128, 2, stride=2)
        self.proj_2 = ResConvGELU(128, 128)
        self.up_2 = nn.ConvTranspose2d(128, 64, 2, stride=2)
        self.proj_1 = ResConvGELU(64, oup)

    def __call__(self, params, x, **kw):
        o1 = self.conv1(params["conv1"], self.ds1(params["ds1"], x))
        o2 = self.conv2(params["conv2"], o1)
        o3 = self.conv3(params["conv3"], o2)
        o4 = self.conv4(params["conv4"], o3)
        o3 = self.proj_3(params["proj_3"],
                         o3 + self.up_4(params["up_4"], o4))
        o2 = self.proj_2(params["proj_2"],
                         o2 + self.up_3(params["up_3"], o3))
        o1 = self.proj_1(params["proj_1"],
                         o1 + self.up_2(params["up_2"], o2))
        return [o1, o2, o3, o4]
