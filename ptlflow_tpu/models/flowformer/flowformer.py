"""FlowFormer: transformer cost-volume encoder + recurrent cross-attention
decoder.

Parity with /root/reference/ptlflow/models/flowformer/{flowformer.py,
encoder.py, decoder.py, gru.py, attention.py, twins.py, utils.py} at the
default configuration (twins backbone, linear PE, vertical self-attention
with context, GMA decoder):
- cost volume from twins features (no sqrt normalization, encoder.py:544-561);
- cost-map patch embedding with coordinate FFN (encoder.py:26-95);
- perceiver-style latent cost tokens: 8 latent tokens cross-attend the cost
  patches, then alternate self-attention (token axis) and RPE+context
  vertical attention (spatial axis) (encoder.py:343-489);
- decoder: per-pixel flow token from a 9x9 cost window, cross-attention to
  the latent memory with linear positional queries, GMA update block
  (decoder.py:200-342);
- tiled inference with Gaussian blending (flowformer.py:219-268,
  utils.py:128-168).

The 32 decoder iterations run under ``lax.scan`` (key/value projected from
the memory once, outside the loop).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn
from ...ops.correlation import coords_grid, corr_pyramid_lookup
from ...ops.upsample import convex_upsample
from ...ops.warp import forward_interpolate
from ...utils.registry import register_model, trainable
from ..base import BaseModel
from ..gma.gma_utils import Aggregate, Attention
from ..raft.raft import SequenceLoss
from ..raft.update import FlowHead, SepConvGRU
from .twins_tpu import Mlp, twins_svt_large


# ------------------------------------------------------------ position enc

def linear_position_embedding_sine(x: jnp.ndarray, dim: int = 128,
                                   normalize_factor: float = 1 / 200):
    """attention.py:128-143; x: (..., 2) with (x, y) order."""
    freq = jnp.arange(dim // 4, dtype=jnp.float32)
    fx = 3.14 * x[..., -2:-1] * freq * normalize_factor
    fy = 3.14 * x[..., -1:] * freq * normalize_factor
    return jnp.concatenate(
        [jnp.sin(fx), jnp.cos(fx), jnp.sin(fy), jnp.cos(fy)],
        axis=-1).astype(x.dtype)


def _mha(q, k, v, num_heads, scale):
    b, n, c = q.shape
    m = k.shape[1]
    cv = v.shape[2]
    q = q.reshape(b, n, num_heads, c // num_heads).transpose(0, 2, 1, 3)
    k = k.reshape(b, m, num_heads, c // num_heads).transpose(0, 2, 1, 3)
    v = v.reshape(b, m, num_heads, cv // num_heads).transpose(0, 2, 1, 3)
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, n, cv)


# ----------------------------------------------------------- cost embedding

class CostPatchEmbed(nn.Module):
    """encoder.py PatchEmbed (patch_size=8)."""

    def __init__(self, patch_size=8, in_chans=1, embed_dim=64, pe="linear"):
        super().__init__()
        assert patch_size == 8 and pe == "linear"
        self.patch_size = patch_size
        self.dim = embed_dim
        self.proj = nn.Sequential(
            nn.Conv2d(in_chans, embed_dim // 4, 6, stride=2, padding=2),
            nn.relu,
            nn.Conv2d(embed_dim // 4, embed_dim // 2, 6, stride=2, padding=2),
            nn.relu,
            nn.Conv2d(embed_dim // 2, embed_dim, 6, stride=2, padding=2))
        self.ffn_with_coord = nn.Sequential(
            nn.Conv2d(embed_dim * 2, embed_dim * 2, 1), nn.relu,
            nn.Conv2d(embed_dim * 2, embed_dim * 2, 1))
        self.norm = nn.LayerNorm(embed_dim * 2)

    def __call__(self, params, x, **kw):
        # x: (B', H2, W2, C_in)
        b, h, w, _ = x.shape
        pad_r = (self.patch_size - w % self.patch_size) % self.patch_size
        pad_b = (self.patch_size - h % self.patch_size) % self.patch_size
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x = self.proj(params["proj"], x)
        oh, ow = x.shape[1], x.shape[2]
        patch_coord = coords_grid(b, oh, ow, dtype=x.dtype) * \
            self.patch_size + self.patch_size / 2
        enc = linear_position_embedding_sine(patch_coord, dim=self.dim)
        x_pe = jnp.concatenate([x, enc], axis=-1)
        x = self.ffn_with_coord(params["ffn_with_coord"], x_pe)
        x = self.norm(params["norm"], x.reshape(b, oh * ow, -1))
        return x, (oh, ow)


# --------------------------------------------------- perceiver cost encoder

class SelfAttentionLayer(nn.Module):
    def __init__(self, dim, num_heads=8, dropout=0.0):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim / num_heads) ** -0.5
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.q = nn.Linear(dim, dim, bias=True)
        self.k = nn.Linear(dim, dim, bias=True)
        self.v = nn.Linear(dim, dim, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.ffn = nn.Sequential(nn.Linear(dim, dim), nn.gelu,
                                 nn.Linear(dim, dim))

    def _torch_leaves(self):
        return {}

    def from_torch(self, flat, strict=True, _path=""):
        # ffn Sequential has Dropout at idx 2/4 in torch: remap 3 -> 2
        remapped = {}
        for k, v in flat.items():
            if k.startswith("ffn.3."):
                remapped["ffn.2." + k[len("ffn.3."):]] = v
            else:
                remapped[k] = v
        return super().from_torch(remapped, strict=strict, _path=_path)

    def __call__(self, params, x, **kw):
        short_cut = x
        x = self.norm1(params["norm1"], x)
        out = _mha(self.q(params["q"], x), self.k(params["k"], x),
                   self.v(params["v"], x), self.num_heads, self.scale)
        x = short_cut + self.proj(params["proj"], out)
        return x + self.ffn(params["ffn"], self.norm2(params["norm2"], x))


class CrossAttentionLayerEnc(nn.Module):
    """encoder.py CrossAttentionLayer: broadcast latent query tokens."""

    def __init__(self, qk_dim, v_dim, query_token_dim, tgt_token_dim,
                 num_heads=8, dropout=0.0):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (qk_dim / num_heads) ** -0.5
        self.norm1 = nn.LayerNorm(query_token_dim)
        self.norm2 = nn.LayerNorm(query_token_dim)
        self.q = nn.Linear(query_token_dim, qk_dim, bias=True)
        self.k = nn.Linear(tgt_token_dim, qk_dim, bias=True)
        self.v = nn.Linear(tgt_token_dim, v_dim, bias=True)
        self.proj = nn.Linear(v_dim, query_token_dim)
        self.ffn = nn.Sequential(nn.Linear(query_token_dim, query_token_dim),
                                 nn.gelu,
                                 nn.Linear(query_token_dim, query_token_dim))

    def from_torch(self, flat, strict=True, _path=""):
        remapped = {}
        for k, v in flat.items():
            if k.startswith("ffn.3."):
                remapped["ffn.2." + k[len("ffn.3."):]] = v
            else:
                remapped[k] = v
        return super().from_torch(remapped, strict=strict, _path=_path)

    def __call__(self, params, query, tgt_token, **kw):
        # query: (1, K, Cq) shared; tgt: (B', M, Ct)
        short_cut = jnp.broadcast_to(
            query, (tgt_token.shape[0],) + query.shape[1:])
        qn = self.norm1(params["norm1"], query)
        q = self.q(params["q"], qn)
        q = jnp.broadcast_to(q, (tgt_token.shape[0],) + q.shape[1:])
        k = self.k(params["k"], tgt_token)
        v = self.v(params["v"], tgt_token)
        x = _mha(q, k, v, self.num_heads, self.scale)
        x = short_cut + self.proj(params["proj"], x)
        return x + self.ffn(params["ffn"], self.norm2(params["norm2"], x))


class LocallyGroupedAttnRPEContext(nn.Module):
    """twins.py:329-427."""

    def __init__(self, dim, num_heads=8, ws=7, vert_c_dim=64):
        super().__init__()
        self.dim = dim
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.ws = ws
        self.vert_c_dim = vert_c_dim
        self.context_proj = nn.Linear(256, vert_c_dim)
        self.q = nn.Linear(dim + vert_c_dim, dim, bias=True)
        self.k = nn.Linear(dim + vert_c_dim, dim, bias=True)
        self.v = nn.Linear(dim, dim, bias=True)
        self.proj = nn.Linear(dim, dim)

    def __call__(self, params, x, size, context, **kw):
        b, n, c = x.shape
        h, w = size
        c_qk = c + self.vert_c_dim
        ws = self.ws
        # context: (B0, H, W, 256) -> tiled to B
        ctx = jnp.tile(context, (b // context.shape[0], 1, 1, 1))
        ctx = self.context_proj(params["context_proj"],
                                ctx.reshape(b, h * w, 256))
        ctx = ctx.reshape(b, h, w, self.vert_c_dim)
        x = x.reshape(b, h, w, c)
        x_qk = jnp.concatenate([x, ctx], axis=-1)
        pad_r = (ws - w % ws) % ws
        pad_b = (ws - h % ws) % ws
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x_qk = jnp.pad(x_qk, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = x.shape[1], x.shape[2]
        nh, nw = hp // ws, wp // ws

        coords = coords_grid(1, ws, ws, dtype=x.dtype)[0]  # (ws, ws, 2)
        enc = linear_position_embedding_sine(coords, dim=c_qk)

        def window(t, ch):
            t = t.reshape(b, nh, ws, nw, ws, ch).transpose(0, 1, 3, 2, 4, 5)
            return t.reshape(b * nh * nw, ws * ws, ch)

        v = self.v(params["v"], window(x, c))
        x_qk = window(x_qk, c_qk) + enc.reshape(1, ws * ws, c_qk)
        q = self.q(params["q"], x_qk)
        k = self.k(params["k"], x_qk)
        out = _mha(q, k, v, self.num_heads, self.scale)
        out = out.reshape(b, nh, nw, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(b, hp, wp, c)[:, :h, :w]
        return self.proj(params["proj"], out.reshape(b, n, c))


class GlobalSubSampleAttnRPEContext(nn.Module):
    """twins.py:428-550."""

    def __init__(self, dim, num_heads=8, sr_ratio=4, vert_c_dim=64):
        super().__init__()
        self.dim = dim
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.sr_ratio = sr_ratio
        self.vert_c_dim = vert_c_dim
        self.context_proj = nn.Linear(256, vert_c_dim)
        self.q = nn.Linear(dim + vert_c_dim, dim, bias=True)
        self.k = nn.Linear(dim, dim, bias=True)
        self.v = nn.Linear(dim, dim, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.sr_key = nn.Conv2d(dim + vert_c_dim, dim, sr_ratio,
                                stride=sr_ratio)
        self.sr_value = nn.Conv2d(dim, dim, sr_ratio, stride=sr_ratio)
        self.norm = nn.LayerNorm(dim)

    def __call__(self, params, x, size, context, **kw):
        b, n, c = x.shape
        h, w = size
        c_qk = c + self.vert_c_dim
        sr = self.sr_ratio
        ctx = jnp.tile(context, (b // context.shape[0], 1, 1, 1))
        ctx = self.context_proj(params["context_proj"],
                                ctx.reshape(b, h * w, 256))
        ctx = ctx.reshape(b, h, w, self.vert_c_dim)
        x = x.reshape(b, h, w, c)
        x_qk = jnp.concatenate([x, ctx], axis=-1)
        pad_r = (sr - w % sr) % sr
        pad_b = (sr - h % sr) % sr
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x_qk = jnp.pad(x_qk, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = x.shape[1], x.shape[2]

        coords = coords_grid(1, hp, wp, dtype=x.dtype)[0]
        enc = linear_position_embedding_sine(
            coords.reshape(hp * wp, 2), dim=c_qk)
        q = self.q(params["q"], x_qk.reshape(b, hp * wp, c_qk) + enc)

        xv = self.sr_value(params["sr_value"], x)
        xk = self.sr_key(params["sr_key"], x_qk)
        hs, ws_ = xv.shape[1], xv.shape[2]
        xv = self.norm(params["norm"], xv.reshape(b, hs * ws_, c))
        xk = self.norm(params["norm"], xk.reshape(b, hs * ws_, c))

        coords2 = coords_grid(1, hs, ws_, dtype=x.dtype)[0] * sr
        enc2 = linear_position_embedding_sine(
            coords2.reshape(hs * ws_, 2), dim=c)
        k = self.k(params["k"], xk + enc2)
        v = self.v(params["v"], xv)
        out = _mha(q, k, v, self.num_heads, self.scale)
        out = out.reshape(b, hp, wp, c)[:, :h, :w]
        return self.proj(params["proj"], out.reshape(b, n, c))


class RPEBlock(nn.Module):
    """twins.py Block with with_rpe=True and vert_c_dim>0."""

    def __init__(self, dim, num_heads, mlp_ratio=4, sr_ratio=4, ws=7,
                 vert_c_dim=64):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        if ws == 1:
            self.attn = GlobalSubSampleAttnRPEContext(dim, num_heads,
                                                      sr_ratio, vert_c_dim)
        else:
            self.attn = LocallyGroupedAttnRPEContext(dim, num_heads, ws,
                                                     vert_c_dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def __call__(self, params, x, size, context, **kw):
        x = x + self.attn(params["attn"], self.norm1(params["norm1"], x),
                          size, context)
        return x + self.mlp(params["mlp"], self.norm2(params["norm2"], x))


class VerticalSelfAttentionLayer(nn.Module):
    def __init__(self, dim, vert_c_dim, num_heads=8, dropout=0.0):
        super().__init__()
        self.local_block = RPEBlock(dim, num_heads, 4, sr_ratio=4, ws=7,
                                    vert_c_dim=vert_c_dim)
        self.global_block = RPEBlock(dim, num_heads, 4, sr_ratio=4, ws=1,
                                     vert_c_dim=vert_c_dim)

    def __call__(self, params, x, size, context, **kw):
        x = self.local_block(params["local_block"], x, size, context)
        return self.global_block(params["global_block"], x, size, context)


class CostPerceiverEncoder(nn.Module):
    def __init__(self, patch_size, cost_latent_input_dim, pe, encoder_depth,
                 cost_latent_dim, dropout, vert_c_dim, cost_heads_num,
                 cost_latent_token_num, cost_encoder_res):
        super().__init__()
        self.cost_heads_num = cost_heads_num
        self.cost_latent_token_num = cost_latent_token_num
        self.cost_encoder_res = cost_encoder_res
        self.patch_size = patch_size
        self.depth = encoder_depth
        self.patch_embed = CostPatchEmbed(
            in_chans=cost_heads_num, patch_size=patch_size,
            embed_dim=cost_latent_input_dim, pe=pe)
        self.input_layer = CrossAttentionLayerEnc(
            cost_latent_dim, cost_latent_dim, cost_latent_dim,
            cost_latent_input_dim * 2, dropout=dropout)
        self.encoder_layers = nn.ModuleList([
            SelfAttentionLayer(cost_latent_dim, dropout=dropout)
            for _ in range(encoder_depth)])
        self.vertical_encoder_layers = nn.ModuleList([
            VerticalSelfAttentionLayer(cost_latent_dim, vert_c_dim,
                                       dropout=dropout)
            for _ in range(encoder_depth)])
        self.cost_latent_dim = cost_latent_dim

    def init(self, key):
        params = super().init(key)
        k2, _ = jax.random.split(key)
        params["latent_tokens"] = jax.random.normal(
            k2, (1, self.cost_latent_token_num, self.cost_latent_dim),
            jnp.float32)
        return params

    def _torch_leaves(self):
        return {"latent_tokens": lambda t: t}

    def __call__(self, params, cost_volume, data, context, **kw):
        # cost_volume: (B, heads, H1, W1, H2, W2)
        b, heads, h1, w1, h2, w2 = cost_volume.shape
        cost_maps = cost_volume.transpose(0, 2, 3, 1, 4, 5).reshape(
            b * h1 * w1, heads, h2, w2)
        # NHWC for our ops: (B', H2, W2, heads)
        cost_maps_nhwc = jnp.moveaxis(cost_maps, 1, -1)
        data["cost_maps"] = cost_maps_nhwc

        x, size = self.patch_embed(params["patch_embed"], cost_maps_nhwc)
        data["H3W3"] = size

        x = self.input_layer(params["input_layer"], params["latent_tokens"],
                             x)
        short_cut = x
        K = self.cost_latent_token_num
        for idx in range(self.depth):
            x = self.encoder_layers[idx](
                params["encoder_layers"][str(idx)], x)
            x = x.reshape(b, h1 * w1, K, -1).transpose(0, 2, 1, 3)
            x = x.reshape(b * K, h1 * w1, -1)
            x = self.vertical_encoder_layers[idx](
                params["vertical_encoder_layers"][str(idx)], x, (h1, w1),
                context)
            x = x.reshape(b, K, h1 * w1, -1).transpose(0, 2, 1, 3)
            x = x.reshape(b * h1 * w1, K, -1)
        if self.cost_encoder_res:
            x = x + short_cut
        return x


class MemoryEncoder(nn.Module):
    def __init__(self, fnet, encoder_latent_dim, cost_heads_num, **cfg):
        super().__init__()
        assert fnet == "twins"
        self.cost_heads_num = cost_heads_num
        self.feat_encoder = twins_svt_large()
        self.channel_convertor = nn.Conv2d(encoder_latent_dim,
                                           encoder_latent_dim, 1, padding=0,
                                           bias=False)
        self.cost_perceiver_encoder = CostPerceiverEncoder(
            cost_heads_num=cost_heads_num, **cfg)

    def corr(self, fmap1, fmap2):
        # NHWC features -> (B, heads, H, W, H, W); no sqrt norm
        b, h, w, c = fmap1.shape
        heads = self.cost_heads_num
        d = c // heads
        f1 = fmap1.reshape(b, h * w, heads, d).transpose(0, 2, 1, 3)
        f2 = fmap2.reshape(b, h * w, heads, d).transpose(0, 2, 1, 3)
        corr = jnp.einsum("bhid,bhjd->bhij", f1, f2,
                          preferred_element_type=jnp.float32)
        return corr.reshape(b, heads, h, w, h, w).astype(fmap1.dtype)

    def __call__(self, params, img1, img2, data, context, **kw):
        imgs = jnp.concatenate([img1, img2], axis=0)
        feats = self.feat_encoder(params["feat_encoder"], imgs)
        feats = self.channel_convertor(params["channel_convertor"], feats)
        feat_s, feat_t = jnp.split(feats, 2, axis=0)
        cost_volume = self.corr(feat_s, feat_t)
        return self.cost_perceiver_encoder(
            params["cost_perceiver_encoder"], cost_volume, data, context)


# ----------------------------------------------------------------- decoder

class CrossAttentionLayerDec(nn.Module):
    """decoder.py CrossAttentionLayer."""

    def __init__(self, qk_dim, v_dim, query_token_dim, tgt_token_dim,
                 add_flow_token=True, num_heads=8, dropout=0.0, pe="linear"):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (qk_dim / num_heads) ** -0.5
        self.dim = qk_dim
        self.add_flow_token = add_flow_token
        self.norm1 = nn.LayerNorm(query_token_dim)
        self.norm2 = nn.LayerNorm(query_token_dim)
        self.q = nn.Linear(query_token_dim, qk_dim, bias=True)
        self.k = nn.Linear(tgt_token_dim, qk_dim, bias=True)
        self.v = nn.Linear(tgt_token_dim, v_dim, bias=True)
        self.proj = nn.Linear(v_dim * 2, query_token_dim)
        self.ffn = nn.Sequential(nn.Linear(query_token_dim, query_token_dim),
                                 nn.gelu,
                                 nn.Linear(query_token_dim, query_token_dim))

    def from_torch(self, flat, strict=True, _path=""):
        remapped = {}
        for k, v in flat.items():
            if k.startswith("ffn.3."):
                remapped["ffn.2." + k[len("ffn.3."):]] = v
            else:
                remapped[k] = v
        return super().from_torch(remapped, strict=strict, _path=_path)

    def __call__(self, params, query, key, value, query_coord, **kw):
        """query: (B*H1*W1, 1, C); query_coord: (B, H1, W1, 2) NHWC."""
        b, h1, w1, _ = query_coord.shape
        qc = query_coord.reshape(b * h1 * w1, 1, 2)
        qc_enc = linear_position_embedding_sine(qc, dim=self.dim)
        short_cut = query
        query = self.norm1(params["norm1"], query)
        if self.add_flow_token:
            q = self.q(params["q"], query + qc_enc)
        else:
            q = self.q(params["q"], qc_enc)
        x = _mha(q, key, value, self.num_heads, self.scale)
        x = self.proj(params["proj"],
                      jnp.concatenate([x, short_cut], axis=2))
        x = short_cut + x
        return x + self.ffn(params["ffn"], self.norm2(params["norm2"], x))


class GMAUpdateBlock(nn.Module):
    """gru.py GMAUpdateBlock (cor_planes = 81 + query_latent_dim)."""

    def __init__(self, only_global, query_latent_dim, hidden_dim=128):
        super().__init__()
        cor_planes = query_latent_dim if only_global else 81 + query_latent_dim

        class _Enc(nn.Module):
            def __init__(self):
                super().__init__()
                self.convc1 = nn.Conv2d(cor_planes, 256, 1, padding=0)
                self.convc2 = nn.Conv2d(256, 192, 3, padding=1)
                self.convf1 = nn.Conv2d(2, 128, 7, padding=3)
                self.convf2 = nn.Conv2d(128, 64, 3, padding=1)
                self.conv = nn.Conv2d(64 + 192, 128 - 2, 3, padding=1)

            def __call__(self, params, flow, corr, **kw):
                cor = nn.relu(self.convc1(params["convc1"], corr))
                cor = nn.relu(self.convc2(params["convc2"], cor))
                flo = nn.relu(self.convf1(params["convf1"], flow))
                flo = nn.relu(self.convf2(params["convf2"], flo))
                out = nn.relu(self.conv(
                    params["conv"], jnp.concatenate([cor, flo], axis=-1)))
                return jnp.concatenate([out, flow], axis=-1)

        self.encoder = _Enc()
        self.gru = SepConvGRU(hidden_dim=hidden_dim,
                              input_dim=128 + hidden_dim + hidden_dim)
        self.flow_head = FlowHead(hidden_dim, hidden_dim=256)
        self.mask = nn.Sequential(
            nn.Conv2d(128, 256, 3, padding=1), nn.relu,
            nn.Conv2d(256, 64 * 9, 1, padding=0))
        self.aggregator = Aggregate(dim=128, dim_head=128, heads=1)

    def __call__(self, params, net, inp, corr, flow, attention, **kw):
        motion_features = self.encoder(params["encoder"], flow, corr)
        motion_global = self.aggregator(params["aggregator"], attention,
                                        motion_features)
        inp_cat = jnp.concatenate([inp, motion_features, motion_global],
                                  axis=-1)
        net = self.gru(params["gru"], net, inp_cat)
        delta_flow = self.flow_head(params["flow_head"], net)
        mask = 0.25 * self.mask(params["mask"], net)
        return net, mask, delta_flow


class MemoryDecoder(nn.Module):
    def __init__(self, query_latent_dim, cost_heads_num, decoder_depth, gma,
                 only_global, patch_size, cost_latent_dim, add_flow_token,
                 dropout):
        super().__init__()
        assert gma, "only the default GMA decoder is implemented"
        self.dim = query_latent_dim
        self.depth = decoder_depth
        self.flow_token_encoder = nn.Sequential(
            nn.Conv2d(81 * cost_heads_num, query_latent_dim, 1, 1), nn.gelu,
            nn.Conv2d(query_latent_dim, query_latent_dim, 1, 1))
        self.proj = nn.Conv2d(256, 256, 1)
        self.decoder_layer_cross_attend = CrossAttentionLayerDec(
            query_latent_dim, query_latent_dim, query_latent_dim,
            cost_latent_dim, add_flow_token=add_flow_token, dropout=dropout)
        self.update_block = GMAUpdateBlock(only_global=only_global,
                                           query_latent_dim=query_latent_dim,
                                           hidden_dim=128)
        self.att = Attention(dim=128, heads=1, max_pos_size=160,
                             dim_head=128)

    def from_torch(self, flat, strict=True, _path=""):
        # reference nests the cross-attend under decoder_layer.cross_attend
        remapped = {}
        pref = "decoder_layer.cross_attend."
        for k, v in flat.items():
            if k.startswith(pref):
                remapped["decoder_layer_cross_attend." + k[len(pref):]] = v
            else:
                remapped[k] = v
        return super().from_torch(remapped, strict=strict, _path=_path)

    def encode_flow_token(self, cost_maps, coords):
        """cost_maps: (B*H1*W1, H2, W2, heads); coords: (B, H1, W1, 2)."""
        return corr_pyramid_lookup([cost_maps], coords, radius=4)

    def __call__(self, params, cost_memory, context, data, prev_flow=None,
                 training=False):
        """cost_memory: (B*H1*W1, K, C); context: (B, H1, W1, 256)."""
        cost_maps = data["cost_maps"]
        b, h1, w1, _ = context.shape
        coords0 = coords_grid(b, h1, w1, dtype=context.dtype)
        coords1 = coords0
        if prev_flow is not None:
            coords1 = coords1 + forward_interpolate(prev_flow)

        context = self.proj(params["proj"], context)
        net = jnp.tanh(context[..., :128])
        inp = nn.relu(context[..., 128:])
        attention = self.att(params["att"], inp)

        ca = params["decoder_layer_cross_attend"]
        key = self.decoder_layer_cross_attend.k(ca["k"], cost_memory)
        value = self.decoder_layer_cross_attend.v(ca["v"], cost_memory)

        up_params = params["update_block"]

        def step(carry, _):
            net, coords1, last_mask = carry
            coords1 = jax.lax.stop_gradient(coords1)
            cost_forward = self.encode_flow_token(cost_maps, coords1)
            query = self.flow_token_encoder(params["flow_token_encoder"],
                                            cost_forward)
            query = query.reshape(b * h1 * w1, 1, self.dim)
            cost_global = self.decoder_layer_cross_attend(
                ca, query, key, value, coords1)
            cost_global = cost_global.reshape(b, h1, w1, self.dim)
            corr = jnp.concatenate([cost_global, cost_forward], axis=-1)
            flow = coords1 - coords0
            net, up_mask, delta_flow = self.update_block(
                up_params, net, inp, corr, flow, attention)
            coords1 = coords1 + delta_flow
            ys = (coords1 - coords0, up_mask) if training else None
            return (net, coords1, up_mask), ys

        mask0 = jnp.zeros((b, h1, w1, 64 * 9), context.dtype)
        (net, coords1, last_mask), ys = jax.lax.scan(
            step, (net, coords1, mask0), None, length=self.depth)

        if training:
            flows_lr, masks = ys
            it = flows_lr.shape[0]
            ups = convex_upsample(
                flows_lr.reshape(it * b, h1, w1, 2),
                masks.reshape(it * b, h1, w1, masks.shape[-1]))
            flow_predictions = ups.reshape(it, b, 8 * h1, 8 * w1, 2)
        else:
            flow_predictions = convex_upsample(
                coords1 - coords0, last_mask)[None]
        return flow_predictions, coords1 - coords0


# ------------------------------------------------------------------- model

def compute_grid_indices(image_shape, patch_size, min_overlap=20):
    hs = list(range(0, image_shape[0], patch_size[0] - min_overlap))
    ws = list(range(0, image_shape[1], patch_size[1] - min_overlap))
    hs[-1] = image_shape[0] - patch_size[0]
    ws[-1] = image_shape[1] - patch_size[1]
    # clamp middle origins so every tile fits (the reference only ever uses
    # step-aligned configurations; unaligned ones would crash it), dedupe
    # while preserving order
    hs = list(dict.fromkeys(min(h, image_shape[0] - patch_size[0])
                            for h in hs))
    ws = list(dict.fromkeys(min(w, image_shape[1] - patch_size[1])
                            for w in ws))
    return [(h, w) for h in hs for w in ws]


def compute_weight(hws, image_shape, patch_size, sigma=1.0):
    h, w = np.meshgrid(np.arange(patch_size[0], dtype=np.float64),
                       np.arange(patch_size[1], dtype=np.float64),
                       indexing="ij")
    h, w = h / patch_size[0] - 0.5, w / patch_size[1] - 0.5
    weights_hw = (h ** 2 + w ** 2) ** 0.5 / sigma
    denorm = 1 / (sigma * math.sqrt(2 * math.pi))
    weights_hw = denorm * np.exp(-0.5 * weights_hw ** 2)
    weights = np.zeros((len(hws),) + tuple(image_shape), np.float64)
    for i, (hh, ww) in enumerate(hws):
        # tiles may overrun the image bottom/right when the image size is
        # not step-aligned; the reference crops them with negative F.pad
        eh = min(hh + patch_size[0], image_shape[0])
        ew = min(ww + patch_size[1], image_shape[1])
        weights[i, hh:eh, ww:ew] = weights_hw[:eh - hh, :ew - ww]
    # The reference accumulates raw Gaussian weights and divides by their
    # per-pixel sum at the end (flowformer.py:253-266).  With small sigma
    # (0.05 default) the raw weights underflow float32 into subnormals that
    # XLA flushes to zero, so we pre-normalize in float64 — the blend ratios
    # (and hence the output) are mathematically identical.
    weights /= weights.sum(0, keepdims=True)
    return weights.astype(np.float32)


class FlowFormer(BaseModel):
    pretrained_checkpoints = {
        "chairs": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/flowformer-chairs-84881320.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/flowformer-things-dbe62dd3.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/flowformer-sintel-cce498f8.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/flowformer-kitti-d4225180.ckpt",
    }

    def __init__(self, add_flow_token: bool = True, cnet: str = "twins",
                 cost_encoder_res: bool = True, cost_heads_num: int = 1,
                 cost_latent_dim: int = 128,
                 cost_latent_input_dim: int = 64,
                 cost_latent_token_num: int = 8, decoder_depth: int = 32,
                 dropout: float = 0.0, encoder_depth: int = 3,
                 encoder_latent_dim: int = 256, fnet: str = "twins",
                 gamma: float = 0.8, max_flow: float = 400.0,
                 gma: bool = True, only_global: bool = False,
                 patch_size: int = 8, pe: str = "linear",
                 query_latent_dim: int = 64, vert_c_dim: int = 64,
                 use_tile_input: bool = True, tile_height: int = 432,
                 tile_sigma: float = 0.05,
                 train_size: Optional[Tuple[int, int]] = None, **kwargs):
        super().__init__(output_stride=8,
                         loss_fn=SequenceLoss(gamma, max_flow), **kwargs)
        self.use_tile_input = use_tile_input
        self.tile_height = tile_height
        self.tile_sigma = tile_sigma
        self.train_size = train_size

        self.memory_encoder = MemoryEncoder(
            fnet, encoder_latent_dim=encoder_latent_dim,
            cost_heads_num=cost_heads_num, patch_size=patch_size,
            cost_latent_input_dim=cost_latent_input_dim, pe=pe,
            encoder_depth=encoder_depth, cost_latent_dim=cost_latent_dim,
            dropout=dropout, vert_c_dim=vert_c_dim,
            cost_latent_token_num=cost_latent_token_num,
            cost_encoder_res=cost_encoder_res)
        self.memory_decoder = MemoryDecoder(
            query_latent_dim=query_latent_dim,
            cost_heads_num=cost_heads_num, decoder_depth=decoder_depth,
            gma=gma, only_global=only_global, patch_size=patch_size,
            cost_latent_dim=cost_latent_dim, add_flow_token=add_flow_token,
            dropout=dropout)
        assert cnet == "twins"
        self.context_encoder = twins_svt_large()

    def _predict(self, params, image1, image2, prev_flow=None,
                 training=False):
        data = {}
        context = self.context_encoder(params["context_encoder"], image1)
        cost_memory = self.memory_encoder(params["memory_encoder"], image1,
                                          image2, data, context)
        return self.memory_decoder(params["memory_decoder"], cost_memory,
                                   context, data, prev_flow=prev_flow,
                                   training=training)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        if self.use_tile_input and self.train_size is not None \
                and not training:
            return self.forward_tile(params, inputs)
        return self.forward_pad(params, inputs, training)

    def forward_pad(self, params, inputs, training=False):
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=True,
            resize_mode="pad", pad_mode="replicate", pad_two_side=True)
        prev_flow = None
        prev = inputs.get("prev_preds")
        if prev is not None and prev.get("flow_small") is not None:
            fs = prev["flow_small"]
            if fs.ndim == 4 and fs.shape[-1] != 2:
                fs = jnp.moveaxis(fs, -3, -1)
            prev_flow = fs
        flow_predictions, flow_small = self._predict(
            params, images[:, 0], images[:, 1], prev_flow, training)
        flow_predictions = self.postprocess_predictions(
            flow_predictions, image_resizer, is_flow=True)
        out = {"flows": self.nhwc_flow_to_output(flow_predictions[-1])}
        if training:
            out["flow_preds"] = flow_predictions
        else:
            out["flow_small"] = jnp.moveaxis(flow_small, -1, -3)
        return out

    def forward_tile(self, params, inputs):
        """Tiled inference with Gaussian blending (flowformer.py:219-268)."""
        train_size = tuple(self.train_size)
        input_size = inputs["images"].shape[-2:]
        image_size = (max(self.tile_height, input_size[-2]), input_size[-1])
        hws = compute_grid_indices(image_size, train_size)
        weights_np = compute_weight(hws, image_size, train_size,
                                    self.tile_sigma)

        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=True,
            resize_mode="pad", target_size=image_size, pad_two_side=False,
            pad_mode="constant", pad_value=-1)
        image1 = images[:, 0]
        image2 = images[:, 1]

        flows = jnp.zeros(image1.shape[:1] + image_size + (2,),
                          image1.dtype)
        flow_count = jnp.zeros((1,) + image_size + (1,), image1.dtype)
        for idx, (h, w) in enumerate(hws):
            t1 = image1[:, h:h + train_size[0], w:w + train_size[1]]
            t2 = image2[:, h:h + train_size[0], w:w + train_size[1]]
            preds, _ = self._predict(params, t1, t2)
            # crop tiles overrunning the image edge (the reference's
            # negative F.pad, flowformer.py:258-266)
            eh = min(h + train_size[0], image_size[0])
            ew = min(w + train_size[1], image_size[1])
            wt = jnp.asarray(weights_np[idx, h:eh, w:ew],
                             image1.dtype)[None, :, :, None]
            flows = flows.at[:, h:eh, w:ew].add(
                preds[-1][:, :eh - h, :ew - w] * wt)
            flow_count = flow_count.at[:, h:eh, w:ew].add(wt)
        output_flow = flows / flow_count
        output_flow = self.postprocess_predictions(output_flow,
                                                   image_resizer,
                                                   is_flow=True)
        return {"flows": self.nhwc_flow_to_output(output_flow)}


@register_model
@trainable
class flowformer(FlowFormer):
    pass
