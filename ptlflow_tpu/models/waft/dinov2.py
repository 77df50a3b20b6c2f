"""DINOv2 vision transformer (frozen DepthAnythingV2 backbone of WAFT).

Behavioral parity with /root/reference/ptlflow/models/waft/thirdparty/
DepthAnythingV2/depth_anything_v2/dinov2.py:56-461 and dinov2_layers/*:
patch-14 embedding, cls token, bicubic pos-embed interpolation with the
0.1 offset quirk (dinov2.py:206-241), pre-norm blocks with LayerScale
(init_values=1.0), final LayerNorm applied to each tapped layer in
``get_intermediate_layers``.

TPU-first: attention is one fused batched matmul pair per block (MXU);
the block stack runs as a Python loop over static depth (12) so XLA sees
a flat graph; everything stays (B, N, D).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp

from ... import nn
from ...nn import Module
from ...ops.grid_sample import interpolate_bicubic


class VitAttention(Module):
    """dinov2_layers/attention.py: fused qkv projection."""

    def __init__(self, dim, num_heads, qkv_bias=True, proj_bias=True):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim, bias=proj_bias)

    def __call__(self, params, x, **kw):
        b, n, c = x.shape
        h = self.num_heads
        qkv = self.qkv(params["qkv"], x).reshape(b, n, 3, h, c // h)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * self.scale, k,
                          preferred_element_type=jnp.float32)
        attn = nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return self.proj(params["proj"], out)


class VitMlp(Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def __call__(self, params, x, **kw):
        return self.fc2(params["fc2"], nn.gelu(self.fc1(params["fc1"], x)))


class LayerScale(Module):
    """dinov2_layers/layer_scale.py — learnable per-channel gamma."""

    def __init__(self, dim, init_values=1.0):
        super().__init__()
        self.dim = dim
        self.init_values = init_values

    def _torch_leaves(self):
        return {"gamma": lambda v: v}

    def init(self, key):
        return {"gamma": jnp.full((self.dim,), self.init_values,
                                  jnp.float32)}

    def __call__(self, params, x, **kw):
        return x * params["gamma"]


class VitBlock(Module):
    """Pre-norm transformer block; optional LayerScale
    (dinov2_layers/block.py:25-105; also matches timm's vit Block when
    init_values is None)."""

    def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=True,
                 init_values=None):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = VitAttention(dim, num_heads, qkv_bias=qkv_bias)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = VitMlp(dim, int(dim * mlp_ratio))
        if init_values:
            self.ls1 = LayerScale(dim, init_values)
            self.ls2 = LayerScale(dim, init_values)
        else:
            self.ls1 = self.ls2 = None

    def __call__(self, params, x, **kw):
        a = self.attn(params["attn"], self.norm1(params["norm1"], x))
        if self.ls1 is not None:
            a = self.ls1(params["ls1"], a)
        x = x + a
        m = self.mlp(params["mlp"], self.norm2(params["norm2"], x))
        if self.ls2 is not None:
            m = self.ls2(params["ls2"], m)
        return x + m


class VitPatchEmbed(Module):
    """waft/backbone/patch_embed.py:26-91 / dinov2_layers/patch_embed.py:
    conv patchify -> (B, N, D)."""

    def __init__(self, patch_size, in_chans, embed_dim):
        super().__init__()
        self.patch_size = patch_size
        self.proj = nn.Conv2d(in_chans, embed_dim, patch_size,
                              stride=patch_size)

    def __call__(self, params, x, **kw):
        x = self.proj(params["proj"], x)  # (B, h, w, D) NHWC
        b, h, w, d = x.shape
        return x.reshape(b, h * w, d)


class DinoVisionTransformer(Module):
    """dinov2.py:56-369 (DepthAnythingV2 config: patch 14, img 518,
    init_values=1.0, no register tokens, interpolate_offset=0.1)."""

    CONFIGS = {
        "vits": dict(embed_dim=384, depth=12, num_heads=6),
        "vitb": dict(embed_dim=768, depth=12, num_heads=12),
        "vitl": dict(embed_dim=1024, depth=24, num_heads=16),
    }

    def __init__(self, model_name="vits", img_size=518, patch_size=14,
                 init_values=1.0, interpolate_offset=0.1):
        super().__init__()
        cfg = self.CONFIGS[model_name]
        self.embed_dim = cfg["embed_dim"]
        self.depth = cfg["depth"]
        self.patch_size = patch_size
        self.interpolate_offset = interpolate_offset
        self.num_patches = (img_size // patch_size) ** 2
        self.patch_embed = VitPatchEmbed(patch_size, 3, self.embed_dim)
        self.blocks = nn.ModuleList([
            VitBlock(self.embed_dim, cfg["num_heads"], 4.0, qkv_bias=True,
                     init_values=init_values)
            for _ in range(self.depth)])
        self.norm = nn.LayerNorm(self.embed_dim, eps=1e-6)

    def _torch_leaves(self):
        return {
            "cls_token": lambda v: v,
            "pos_embed": lambda v: v,
            "mask_token": lambda v: v,
        }

    def init(self, key):
        import jax
        k1, k2 = jax.random.split(key)
        p = super().init(k1)
        p["cls_token"] = jnp.zeros((1, 1, self.embed_dim), jnp.float32)
        p["pos_embed"] = 0.02 * jax.random.truncated_normal(
            k2, -2.0, 2.0, (1, self.num_patches + 1, self.embed_dim),
            jnp.float32)
        p["mask_token"] = jnp.zeros((1, self.embed_dim), jnp.float32)
        return p

    def _pos_encoding(self, params, npatch, h, w):
        """dinov2.py:206-241 — bicubic with explicit (dim0+0.1)/sqrt(N)
        scale factors per axis (the reference's w/h swap cancels out)."""
        pos_embed = params["pos_embed"]
        n = pos_embed.shape[1] - 1
        if npatch == n and w == h:
            return pos_embed
        cls_pos = pos_embed[:, :1]
        patch_pos = pos_embed[:, 1:].astype(jnp.float32)
        dim = pos_embed.shape[-1]
        h0 = h // self.patch_size
        w0 = w // self.patch_size
        sqrt_n = int(math.sqrt(n))
        sy = (h0 + self.interpolate_offset) / sqrt_n
        sx = (w0 + self.interpolate_offset) / sqrt_n
        grid = patch_pos.reshape(1, sqrt_n, sqrt_n, dim)
        grid = interpolate_bicubic(grid, (sy, sx), size=(h0, w0))
        patch_pos = grid.reshape(1, h0 * w0, dim).astype(pos_embed.dtype)
        return jnp.concatenate([cls_pos, patch_pos], axis=1)

    def get_intermediate_layers(self, params, x, idx: Sequence[int]):
        """x NHWC image -> [(patch_tokens, cls_token)] at block indices
        (dinov2.py:307-364; norm applied to every tap)."""
        b, h, w, _ = x.shape
        tokens = self.patch_embed(params["patch_embed"], x)
        cls = jnp.broadcast_to(params["cls_token"],
                               (b, 1, self.embed_dim)).astype(tokens.dtype)
        tokens = jnp.concatenate([cls, tokens], axis=1)
        tokens = tokens + self._pos_encoding(
            params, tokens.shape[1] - 1, h, w).astype(tokens.dtype)
        outs = []
        for i in range(self.depth):
            tokens = self.blocks[i](params["blocks"][str(i)], tokens)
            if i in idx:
                outs.append(tokens)
        outs = [self.norm(params["norm"], t) for t in outs]
        return [(t[:, 1:], t[:, 0]) for t in outs]
