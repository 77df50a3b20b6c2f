"""GMFlow feature transformer: swin-style split-window self/cross attention
and flow propagation attention.

Parity with /root/reference/ptlflow/models/gmflow/transformer.py:8-496,
utils.py:5-100, position.py:10-50.  NHWC/token layout; the shifted-window
attention mask is computed with numpy at trace time (static shapes), and all
attention runs as batched MXU matmuls.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn


# --------------------------------------------------------------- positional

def position_embedding_sine(h: int, w: int, num_pos_feats: int = 64,
                            temperature: float = 10000.0,
                            dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 2*num_pos_feats) sine embedding, channels ordered (y, x)."""
    y_embed = np.arange(1, h + 1, dtype=np.float32)[:, None].repeat(w, 1)
    x_embed = np.arange(1, w + 1, dtype=np.float32)[None, :].repeat(h, 0)
    eps = 1e-6
    scale = 2 * math.pi
    y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])],
                     axis=3).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])],
                     axis=3).reshape(h, w, -1)
    return jnp.asarray(np.concatenate([pos_y, pos_x], axis=2), dtype)


def split_feature(x: jnp.ndarray, num_splits: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*K*K, H/K, W/K, C)."""
    b, h, w, c = x.shape
    k = num_splits
    x = x.reshape(b, k, h // k, k, w // k, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * k * k, h // k, w // k, c)


def merge_splits(x: jnp.ndarray, num_splits: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    k = num_splits
    nb = b // (k * k)
    x = x.reshape(nb, k, k, h, w, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(nb, k * h, k * w, c)


def feature_add_position(feature0, feature1, attn_splits: int, channels: int):
    b, h, w, c = feature0.shape
    if attn_splits > 1:
        f0 = split_feature(feature0, attn_splits)
        f1 = split_feature(feature1, attn_splits)
        pos = position_embedding_sine(f0.shape[1], f0.shape[2], channels // 2,
                                      dtype=f0.dtype)
        f0 = f0 + pos
        f1 = f1 + pos
        return merge_splits(f0, attn_splits), merge_splits(f1, attn_splits)
    pos = position_embedding_sine(h, w, channels // 2, dtype=feature0.dtype)
    return feature0 + pos, feature1 + pos


def generate_shift_window_attn_mask(h: int, w: int, window_h: int,
                                    window_w: int, shift_h: int,
                                    shift_w: int) -> jnp.ndarray:
    """Swin SW-MSA mask, computed in numpy at trace time (static shapes)."""
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, h - window_h), slice(h - window_h, h - shift_h),
               slice(h - shift_h, h)):
        for ws in (slice(0, w - window_w), slice(w - window_w, w - shift_w),
                   slice(w - shift_w, w)):
            img_mask[:, hs, ws, :] = cnt
            cnt += 1
    k = w // window_w
    kh = h // window_h
    m = img_mask.reshape(1, kh, window_h, k, window_w, 1)
    m = m.transpose(0, 1, 3, 2, 4, 5).reshape(kh * k, window_h * window_w)
    attn_mask = m[:, None, :] - m[:, :, None]
    attn_mask = np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)
    return jnp.asarray(attn_mask)


# --------------------------------------------------------------- attentions

def single_head_full_attention(q, k, v):
    # (B, L, C)
    scores = jnp.einsum("blc,bmc->blm", q, k,
                        preferred_element_type=jnp.float32) / (q.shape[2] ** 0.5)
    attn = jax.nn.softmax(scores, axis=2).astype(v.dtype)
    return jnp.einsum("blm,bmc->blc", attn, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def single_head_split_window_attention(q, k, v, num_splits: int,
                                       with_shift: bool, h: int, w: int,
                                       attn_mask: Optional[jnp.ndarray]):
    b, _, c = q.shape
    wh, ww = h // num_splits, w // num_splits
    q = q.reshape(b, h, w, c)
    k = k.reshape(b, h, w, c)
    v = v.reshape(b, h, w, c)
    if with_shift:
        sh, sw = wh // 2, ww // 2
        q = jnp.roll(q, (-sh, -sw), axis=(1, 2))
        k = jnp.roll(k, (-sh, -sw), axis=(1, 2))
        v = jnp.roll(v, (-sh, -sw), axis=(1, 2))
    qs = split_feature(q, num_splits).reshape(-1, wh * ww, c)
    ks = split_feature(k, num_splits).reshape(-1, wh * ww, c)
    vs = split_feature(v, num_splits).reshape(-1, wh * ww, c)
    scores = jnp.einsum("blc,bmc->blm", qs, ks,
                        preferred_element_type=jnp.float32) / (c ** 0.5)
    if with_shift:
        scores = scores + jnp.tile(attn_mask, (b, 1, 1))
    attn = jax.nn.softmax(scores, axis=-1).astype(vs.dtype)
    out = jnp.einsum("blm,bmc->blc", attn, vs,
                     preferred_element_type=jnp.float32).astype(vs.dtype)
    out = merge_splits(out.reshape(-1, wh, ww, c), num_splits)
    if with_shift:
        out = jnp.roll(out, (sh, sw), axis=(1, 2))
    return out.reshape(b, h * w, c)


# ------------------------------------------------------------------- layers

class TransformerLayer(nn.Module):
    def __init__(self, d_model: int = 256, nhead: int = 1,
                 attention_type: str = "swin", no_ffn: bool = False,
                 ffn_dim_expansion: int = 4, with_shift: bool = False):
        super().__init__()
        self.dim = d_model
        self.attention_type = attention_type
        self.no_ffn = no_ffn
        self.with_shift = with_shift
        self.q_proj = nn.Linear(d_model, d_model, bias=False)
        self.k_proj = nn.Linear(d_model, d_model, bias=False)
        self.v_proj = nn.Linear(d_model, d_model, bias=False)
        self.merge = nn.Linear(d_model, d_model, bias=False)
        self.norm1 = nn.LayerNorm(d_model)
        if not no_ffn:
            in_ch = d_model * 2
            self.mlp = nn.Sequential(
                nn.Linear(in_ch, in_ch * ffn_dim_expansion, bias=False),
                nn.gelu,
                nn.Linear(in_ch * ffn_dim_expansion, d_model, bias=False))
            self.norm2 = nn.LayerNorm(d_model)

    def __call__(self, params, source, target, height=None, width=None,
                 shifted_window_attn_mask=None, attn_num_splits=None, **kw):
        query = self.q_proj(params["q_proj"], source)
        key = self.k_proj(params["k_proj"], target)
        value = self.v_proj(params["v_proj"], target)
        if self.attention_type == "swin" and attn_num_splits > 1:
            message = single_head_split_window_attention(
                query, key, value, attn_num_splits, self.with_shift,
                height, width, shifted_window_attn_mask)
        else:
            message = single_head_full_attention(query, key, value)
        message = self.merge(params["merge"], message)
        message = self.norm1(params["norm1"], message)
        if not self.no_ffn:
            message = self.mlp(params["mlp"],
                               jnp.concatenate([source, message], axis=-1))
            message = self.norm2(params["norm2"], message)
        return source + message


class TransformerBlock(nn.Module):
    def __init__(self, d_model=256, nhead=1, attention_type="swin",
                 ffn_dim_expansion=4, with_shift=False):
        super().__init__()
        self.self_attn = TransformerLayer(
            d_model=d_model, nhead=nhead, attention_type=attention_type,
            no_ffn=True, ffn_dim_expansion=ffn_dim_expansion,
            with_shift=with_shift)
        self.cross_attn_ffn = TransformerLayer(
            d_model=d_model, nhead=nhead, attention_type=attention_type,
            ffn_dim_expansion=ffn_dim_expansion, with_shift=with_shift)

    def __call__(self, params, source, target, **kw):
        source = self.self_attn(params["self_attn"], source, source, **kw)
        source = self.cross_attn_ffn(params["cross_attn_ffn"], source,
                                     target, **kw)
        return source


class FeatureTransformer(nn.Module):
    def __init__(self, num_layers=6, d_model=128, nhead=1,
                 attention_type="swin", ffn_dim_expansion=4):
        super().__init__()
        self.attention_type = attention_type
        self.d_model = d_model
        self.layers = nn.ModuleList([
            TransformerBlock(
                d_model=d_model, nhead=nhead, attention_type=attention_type,
                ffn_dim_expansion=ffn_dim_expansion,
                with_shift=(attention_type == "swin" and i % 2 == 1))
            for i in range(num_layers)])

    def __call__(self, params, feature0, feature1, attn_num_splits=None,
                 **kw):
        b, h, w, c = feature0.shape
        f0 = feature0.reshape(b, h * w, c)
        f1 = feature1.reshape(b, h * w, c)
        if self.attention_type == "swin" and attn_num_splits > 1:
            wh, ww = h // attn_num_splits, w // attn_num_splits
            attn_mask = generate_shift_window_attn_mask(
                h, w, wh, ww, wh // 2, ww // 2)
        else:
            attn_mask = None
        concat0 = jnp.concatenate([f0, f1], axis=0)
        concat1 = jnp.concatenate([f1, f0], axis=0)
        for i, layer in enumerate(self.layers):
            concat0 = layer(params["layers"][str(i)], concat0, concat1,
                            height=h, width=w,
                            shifted_window_attn_mask=attn_mask,
                            attn_num_splits=attn_num_splits)
            c0, c1 = jnp.split(concat0, 2, axis=0)
            concat1 = jnp.concatenate([c1, c0], axis=0)
        f0, f1 = jnp.split(concat0, 2, axis=0)
        return f0.reshape(b, h, w, c), f1.reshape(b, h, w, c)


class FeatureFlowAttention(nn.Module):
    """Flow propagation: q/k from features, value = flow
    (transformer.py:382-496)."""

    def __init__(self, in_channels: int):
        super().__init__()
        self.q_proj = nn.Linear(in_channels, in_channels)
        self.k_proj = nn.Linear(in_channels, in_channels)

    def __call__(self, params, feature0, flow, local_window_attn=False,
                 local_window_radius=1, **kw):
        if local_window_attn:
            return self.forward_local_window_attn(params, feature0, flow,
                                                  local_window_radius)
        b, h, w, c = feature0.shape
        query = feature0.reshape(b, h * w, c)
        # the reference chains q_proj then k_proj on the same tensor
        query = self.q_proj(params["q_proj"], query)
        key = self.k_proj(params["k_proj"], query)
        value = flow.reshape(b, h * w, flow.shape[-1])
        scores = jnp.einsum("blc,bmc->blm", query, key,
                            preferred_element_type=jnp.float32) / (c ** 0.5)
        prob = jax.nn.softmax(scores, axis=-1).astype(value.dtype)
        out = jnp.einsum("blm,bmc->blc", prob, value,
                         preferred_element_type=jnp.float32).astype(value.dtype)
        return out.reshape(b, h, w, value.shape[-1])

    def forward_local_window_attn(self, params, feature0, flow,
                                  local_window_radius=1):
        b, h, w, c = feature0.shape
        k = 2 * local_window_radius + 1
        q = self.q_proj(params["q_proj"],
                        feature0.reshape(b, h * w, c))  # (B, HW, C)
        f_proj = self.k_proj(params["k_proj"], feature0.reshape(b, h * w, c))
        f_proj = f_proj.reshape(b, h, w, c)
        r = local_window_radius

        def unfold(x):
            # (B, H, W, C) -> (B, H, W, k*k, C) zero-padded neighbors
            xp = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)))
            return jnp.stack(
                [xp[:, dy:dy + h, dx:dx + w, :]
                 for dy in range(k) for dx in range(k)], axis=3)

        feat_win = unfold(f_proj)  # (B, H, W, k2, C)
        flow_win = unfold(flow)  # (B, H, W, k2, 2)
        q = q.reshape(b, h, w, 1, c)
        scores = jnp.einsum("bhwoc,bhwkc->bhwok", q, feat_win,
                            preferred_element_type=jnp.float32) / (c ** 0.5)
        prob = jax.nn.softmax(scores, axis=-1).astype(flow.dtype)
        out = jnp.einsum("bhwok,bhwkc->bhwoc", prob, flow_win,
                         preferred_element_type=jnp.float32)
        return out[:, :, :, 0, :].astype(flow.dtype)
