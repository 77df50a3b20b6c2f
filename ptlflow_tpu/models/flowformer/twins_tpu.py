"""Twins-SVT backbone (first two stages), timm-compatible parameter naming.

The reference loads ``timm.create_model("twins_svt_large")`` and keeps
stages 0-1 (/root/reference/ptlflow/models/flowformer/encoders.py:7-42), so
checkpoints store parameters under ``svt.patch_embeds/...``, with timm's
fused-qkv locally-grouped attention and q+kv global subsampled attention
(vendored copy: flowformerplusplus/FlowFormer/twins_ft.py:251-360).
This native implementation reproduces those modules in NHWC/token form.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ... import nn


class Mlp(nn.Module):
    def __init__(self, in_features, hidden_features, out_features=None):
        super().__init__()
        out_features = out_features or in_features
        self.fc1 = nn.Linear(in_features, hidden_features)
        self.fc2 = nn.Linear(hidden_features, out_features)

    def __call__(self, params, x, **kw):
        return self.fc2(params["fc2"], nn.gelu(self.fc1(params["fc1"], x)))


def _mha(q, k, v, num_heads, scale):
    """(B, N, C) multi-head attention."""
    b, n, c = q.shape
    m = k.shape[1]
    hd = c // num_heads
    q = q.reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, m, num_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, m, num_heads, hd).transpose(0, 2, 1, 3)
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, n, c)


class LocallyGroupedAttn(nn.Module):
    """timm LSA with fused qkv (twins_ft.py:251-305)."""

    def __init__(self, dim, num_heads=8, ws=1):
        super().__init__()
        self.dim = dim
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.ws = ws
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def __call__(self, params, x, size, **kw):
        b, n, c = x.shape
        h, w = size
        ws = self.ws
        x = x.reshape(b, h, w, c)
        pad_r = (ws - w % ws) % ws
        pad_b = (ws - h % ws) % ws
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = x.shape[1], x.shape[2]
        nh, nw = hp // ws, wp // ws
        x = x.reshape(b, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b * nh * nw, ws * ws, c)
        qkv = self.qkv(params["qkv"], x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = _mha(q, k, v, self.num_heads, self.scale)
        out = out.reshape(b, nh, nw, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(b, hp, wp, c)[:, :h, :w]
        return self.proj(params["proj"], out.reshape(b, n, c))


class GlobalSubSampleAttn(nn.Module):
    """timm GSA with q + fused kv and sr conv (twins_ft.py:308-360)."""

    def __init__(self, dim, num_heads=8, sr_ratio=1):
        super().__init__()
        self.dim = dim
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.q = nn.Linear(dim, dim, bias=True)
        self.kv = nn.Linear(dim, dim * 2, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.sr_ratio = sr_ratio
        if sr_ratio > 1:
            self.sr = nn.Conv2d(dim, dim, sr_ratio, stride=sr_ratio)
            self.norm = nn.LayerNorm(dim)

    def __call__(self, params, x, size, **kw):
        b, n, c = x.shape
        h, w = size
        q = self.q(params["q"], x)
        kv_in = x
        if self.sr_ratio > 1:
            xi = x.reshape(b, h, w, c)
            xi = self.sr(params["sr"], xi)
            kv_in = self.norm(params["norm"],
                              xi.reshape(b, -1, c))
        kv = self.kv(params["kv"], kv_in)
        k, v = jnp.split(kv, 2, axis=-1)
        out = _mha(q, k, v, self.num_heads, self.scale)
        return self.proj(params["proj"], out)


class Block(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=4.0, sr_ratio=1, ws=1):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        if ws == 1:
            self.attn = GlobalSubSampleAttn(dim, num_heads, sr_ratio)
        else:
            self.attn = LocallyGroupedAttn(dim, num_heads, ws)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def __call__(self, params, x, size, **kw):
        x = x + self.attn(params["attn"],
                          self.norm1(params["norm1"], x), size)
        x = x + self.mlp(params["mlp"], self.norm2(params["norm2"], x))
        return x


class PosConv(nn.Module):
    def __init__(self, in_chans, embed_dim):
        super().__init__()
        self.proj = nn.Sequential(
            nn.Conv2d(in_chans, embed_dim, 3, 1, 1, groups=embed_dim,
                      bias=True))

    def __call__(self, params, x, size, **kw):
        b, n, c = x.shape
        h, w = size
        feat = x.reshape(b, h, w, c)
        out = self.proj(params["proj"], feat) + feat
        return out.reshape(b, n, c)


class PatchEmbed(nn.Module):
    def __init__(self, patch_size, in_chans, embed_dim):
        super().__init__()
        self.patch_size = patch_size
        self.proj = nn.Conv2d(in_chans, embed_dim, patch_size,
                              stride=patch_size)
        self.norm = nn.LayerNorm(embed_dim)

    def __call__(self, params, x, **kw):
        # x: (B, H, W, C_in)
        y = self.proj(params["proj"], x)
        b, h, w, c = y.shape
        y = self.norm(params["norm"], y.reshape(b, h * w, c))
        return y, (h, w)


class TwinsSVT(nn.Module):
    """twins_svt_large truncated to 2 stages (dims 128/256)."""

    def __init__(self, embed_dims=(128, 256), num_heads=(4, 8),
                 mlp_ratios=(4, 4), depths=(2, 2), sr_ratios=(8, 4),
                 wss=(7, 7), in_chans=3, patch_size=4):
        super().__init__()
        self.depths = depths
        self.patch_embeds = nn.ModuleList([
            PatchEmbed(patch_size if i == 0 else 2,
                       in_chans if i == 0 else embed_dims[i - 1],
                       embed_dims[i])
            for i in range(len(depths))])
        self.blocks = nn.ModuleList([
            nn.ModuleList([
                Block(embed_dims[k], num_heads[k], mlp_ratios[k],
                      sr_ratio=sr_ratios[k],
                      ws=1 if i % 2 == 1 else wss[k])
                for i in range(depths[k])])
            for k in range(len(depths))])
        self.pos_block = nn.ModuleList(
            [PosConv(d, d) for d in embed_dims])
        # timm keeps the final norm of the full model even though the
        # truncated 2-stage forward never uses it; kept for checkpoint parity
        self.norm = nn.LayerNorm(1024, eps=1e-6)

    def __call__(self, params, x, **kw):
        """x: (B, H, W, 3) -> (B, H/8, W/8, C_last)."""
        b = x.shape[0]
        for i in range(len(self.depths)):
            x, size = self.patch_embeds[i](
                params["patch_embeds"][str(i)], x)
            for j, blk in enumerate(self.blocks[i]):
                x = blk(params["blocks"][str(i)][str(j)], x, size)
                if j == 0:
                    x = self.pos_block[i](
                        params["pos_block"][str(i)], x, size)
            x = x.reshape(b, size[0], size[1], -1)
        return x


class twins_svt_large(nn.Module):
    """Wrapper matching the checkpoint's ``svt.`` prefix."""

    def __init__(self, pretrained: bool = False):
        super().__init__()
        self.svt = TwinsSVT()

    def __call__(self, params, x, **kw):
        return self.svt(params["svt"], x)
