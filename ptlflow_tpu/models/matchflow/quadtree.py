"""Quadtree attention matching encoder for MatchFlow.

Parity with /root/reference/ptlflow/models/matchflow/
(QuadtreeAttention/.../modules/quadtree_attention.py QTAttB :175-360,
quadtree_attention.py wrapper :15-105, matching_encoder.py DWConv/Mlp/
QuadtreeBlock/LocalFeatureTransformer/PositionEncodingSineNorm/MatchingModel
:12-387, resnet_fpn.py ResNetFPN_8_2 :46-101).

TPU design: the reference's two CUDA kernels
(score_computation_kernal.cu, value_aggregation_kernel.cu) are gather +
einsum here, shaped for the TPU memory system (measured on v5e, where XLA
gathers cost ~40 ns per gathered row regardless of row width):
- the 4K fine-level candidates per query group are the 2x2 children of K
  top-k *parents*, so key and value are laid out as parent-block tables
  (one row = the 4 children x D of one parent, key and value concatenated)
  and fetched with ONE `take_along_axis` of K wide rows instead of two
  gathers of 4K narrow rows — 8x fewer gathered rows for the same bytes;
- the candidate axis is kept last everywhere, so softmax and lax.top_k
  run on the lane dimension with no transposes;
- parent indices flow between levels as raw row-major block ids (the
  previous level's token index IS the next level's parent-block id), so
  no coordinate decomposition/re-encoding happens in the loop.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ... import nn


class QTAttB(nn.Module):
    """Quadtree attention type B (quadtree_attention.py:175-360)."""

    def __init__(self, nhead: int, dim: int, scale: int,
                 topks: List[int] = (32, 32, 32, 32)):
        super().__init__()
        self.nhead = nhead
        self.dim = dim
        self.scale = scale
        self.topks = list(topks)

    def init(self, key):
        return {"weight": jax.random.normal(key, (self.scale,),
                                            jnp.float32)}

    def _torch_leaves(self):
        return {"weight": lambda w: w}

    def _coarse(self, query, key, value, topk):
        # NHWC maps: (B, h, w, C)
        b, h, w, c = key.shape
        d = c // self.nhead
        q = query.reshape(b, h * w, self.nhead, d)
        k = key.reshape(b, h * w, self.nhead, d)
        v = value.reshape(b, h * w, self.nhead, d)
        # candidate axis (s) last: softmax and top_k run lane-wise; top_k
        # selects on the RAW scores — softmax is strictly monotone over the
        # candidate axis, so indices (incl. tie order) are identical and
        # the sort does not force a relayout of the softmax output
        qk = jnp.einsum("nlhd,nshd->nlhs", q, k,
                        preferred_element_type=jnp.float32)
        a = nn.softmax(qk / math.sqrt(d), axis=-1).astype(query.dtype)
        _, topk_idx = jax.lax.top_k(qk, min(topk, qk.shape[-1]))
        message = jnp.einsum("nlhs,nshd->nlhd", a, v,
                             preferred_element_type=jnp.float32).astype(
            query.dtype)
        # (B, L, H, K) -> (B, H, L, K): coarse token index == row-major
        # parent-block id on the next (2x finer) level
        return message, topk_idx.transpose(0, 2, 1, 3)

    def _fine(self, query, key, value, topk_pidx, topk):
        """One refinement level.

        topk_pidx: (B, H, Lp, K) row-major parent-block ids selected at the
        previous level (Lp = number of parent pixels = h/2 * w/2 here).
        """
        b, h, w, c = key.shape
        nh = self.nhead
        d = c // nh
        hp, wp = h // 2, w // 2
        npar = hp * wp
        lp, kk = topk_pidx.shape[2], topk_pidx.shape[3]

        # parent-block tables: row p = the 2x2 children of parent p, child
        # order (x, y) row-major; key and value concatenated so the top-k
        # candidates arrive in ONE wide-row gather
        def block(t):
            t = t.reshape(b, hp, 2, wp, 2, nh, d)
            t = t.transpose(0, 5, 1, 3, 2, 4, 6)  # (B, H, hp, wp, x, y, D)
            return t.reshape(b * nh, npar, 4 * d)

        kv = jnp.concatenate([block(key), block(value)], axis=-1)
        g = jnp.take_along_axis(
            kv, topk_pidx.reshape(b * nh, lp * kk, 1), axis=1)
        g = g.reshape(b, nh, lp, kk, 2, 4, d)
        gk = g[:, :, :, :, 0].reshape(b, nh, lp, kk * 4, d)
        gv = g[:, :, :, :, 1].reshape(b, nh, lp, kk * 4, d)

        # query grouped into 4 children per parent pixel
        q = query.reshape(b, hp, 2, wp, 2, c)
        q = q.transpose(0, 1, 3, 2, 4, 5).reshape(b, npar, 4, nh, d)

        # candidate axis (j = k-major, child-minor, matching the gathered
        # row layout) last: softmax/top_k lane-wise, no transposes
        qk = jnp.einsum("blthd,bhljd->blthj", q, gk,
                        preferred_element_type=jnp.float32)
        a = nn.softmax(qk / math.sqrt(d), axis=-1).astype(query.dtype)
        message = jnp.einsum("blthj,bhljd->blthd", a, gv,
                             preferred_element_type=jnp.float32).astype(
            query.dtype)  # (B, Lp, 4, H, D)

        # top_k on the RAW scores (same selection: softmax is monotone);
        # candidate j = (parent slot k, child c) decodes ARITHMETICALLY to
        # an absolute map position (== next level's parent-block id). The
        # parent-slot pick stays integer end-to-end: a float one-hot einsum
        # at Precision.DEFAULT runs bf16 operand passes on TPU, which only
        # represents integers exactly up to 256 — block ids above that
        # would silently round to a wrong parent. The gather is tiny
        # (K ints per query group), so there is no MXU win to chase here.
        _, sel = jax.lax.top_k(qk, min(topk, qk.shape[-1]))
        ksel, csel = sel // 4, sel % 4  # (B, Lp, 4, H, Kn)
        pidx = jnp.broadcast_to(
            topk_pidx.transpose(0, 2, 1, 3)[:, :, None],
            (b, lp, 4, nh, kk))  # (B, Lp, 4, H, K) parent ids per group
        pid = jnp.take_along_axis(pidx, ksel, axis=-1)
        pr, pc = pid // wp, pid % wp
        topk_idx = (pr * 2 + csel // 2) * w + pc * 2 + csel % 2

        # reshape (Lp, 4) child blocks back to the fine pixel enumeration
        def unblock(t):  # (B, Lp, 4, H, K) -> (B, h*w, H, K)
            bb, _, _, hh, ko = t.shape
            t = t.reshape(bb, hp, wp, 2, 2, hh, ko)
            return t.transpose(0, 1, 3, 2, 4, 5, 6).reshape(
                bb, h * w, hh, ko)

        return message, unblock(topk_idx).transpose(0, 2, 1, 3)

    def __call__(self, params, queries, keys, values, **kw):
        """queries/keys/values: list of NHWC maps, finest first."""
        messages = []
        topk = self.topks[0]
        topk_idx = None
        n_lvl = len(queries)
        for i, (query, key, value) in enumerate(
                zip(reversed(queries), reversed(keys), reversed(values))):
            if i == 0:
                message, topk_idx = self._coarse(query, key, value, topk)
            else:
                topk = self.topks[i]
                message, topk_idx = self._fine(query, key, value,
                                               topk_idx, topk)
            messages.append(message)

        weight = nn.softmax(params["weight"].astype(jnp.float32), axis=0)
        weight = weight.astype(messages[0].dtype)
        final = None
        for i, m in enumerate(messages):
            if i == 0:
                final = m * weight[i]
            else:
                final = final[:, :, None] + m * weight[i]
                hq = queries[n_lvl - i].shape[1]
                b, l, _, nh, d = final.shape
                wq = l // hq
                final = final.reshape(b, hq, wq, 2, 2, nh, d)
                final = final.transpose(0, 1, 3, 2, 4, 5, 6).reshape(
                    b, l * 4, nh, d)
        return final


class QuadtreeAttention(nn.Module):
    """q/k/v pyramid projection + QTAttB + output proj
    (matchflow/quadtree_attention.py:15-105)."""

    def __init__(self, dim: int, num_heads: int, topks: List[int],
                 scale: int = 1, qkv_bias: bool = False):
        super().__init__()
        self.dim = dim
        self.num_heads = num_heads
        self.scale = scale
        self.q_proj = nn.Conv2d(dim, dim, 1, bias=qkv_bias)
        self.k_proj = nn.Conv2d(dim, dim, 1, bias=qkv_bias)
        self.v_proj = nn.Conv2d(dim, dim, 1, bias=qkv_bias)
        self.py_att = QTAttB(num_heads, dim // num_heads, scale=scale,
                             topks=topks)
        self.proj = nn.Linear(dim, dim)

    def __call__(self, params, x, target, h, w, **kw):
        # x, target: (B, N, C) token maps
        b, n, c = x.shape
        xm = x.reshape(b, h, w, c)
        tm = target.reshape(b, h, w, c)
        q = self.q_proj(params["q_proj"], xm)
        k = self.k_proj(params["k_proj"], tm)
        v = self.v_proj(params["v_proj"], tm)
        queries, keys, values = [], [], []
        for i in range(self.scale):
            queries.append(q)
            keys.append(k)
            values.append(v)
            if i != self.scale - 1:
                q = nn.avg_pool2d(q, 2, 2)
                k = nn.avg_pool2d(k, 2, 2)
                v = nn.avg_pool2d(v, 2, 2)
        msg = self.py_att(params["py_att"], queries, keys, values)
        msg = msg.reshape(b, n, c)
        return self.proj(params["proj"], msg)


class DWConv(nn.Module):
    def __init__(self, dim: int = 768):
        super().__init__()
        self.dwconv = nn.Conv2d(dim, dim, 3, stride=1, padding=1, bias=True,
                                groups=dim)

    def __call__(self, params, x, h, w, **kw):
        b, n, c = x.shape
        y = self.dwconv(params["dwconv"], x.reshape(b, h, w, c))
        return y.reshape(b, n, c)


class Mlp(nn.Module):
    def __init__(self, in_features: int, hidden_features: int):
        super().__init__()
        self.fc1 = nn.Linear(in_features, hidden_features)
        self.dwconv = DWConv(hidden_features)
        self.fc2 = nn.Linear(hidden_features, in_features)

    def __call__(self, params, x, h, w, **kw):
        x = nn.relu(self.fc1(params["fc1"], x))
        x = self.dwconv(params["dwconv"], x, h, w)
        x = nn.gelu(x)
        return self.fc2(params["fc2"], x)


class QuadtreeBlock(nn.Module):
    def __init__(self, dim: int, num_heads: int, topks: List[int],
                 mlp_ratio: float = 4.0, scale: int = 1):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = QuadtreeAttention(dim, num_heads, topks, scale=scale)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def __call__(self, params, x, target, h, w, **kw):
        x = x + self.attn(params["attn"], self.norm1(params["norm1"], x),
                          self.norm1(params["norm1"], target), h, w)
        x = x + self.mlp(params["mlp"], self.norm2(params["norm2"], x),
                         h, w)
        return x


class LocalFeatureTransformer(nn.Module):
    """LoFTR-style alternating self/cross quadtree attention
    (matching_encoder.py:146-196)."""

    def __init__(self, layer_names, topks=(16, 8, 8), d_model: int = 256):
        super().__init__()
        self.layer_names = list(layer_names)
        self.layers = nn.ModuleList([
            QuadtreeBlock(d_model, 8, topks=list(topks), scale=3)
            for _ in self.layer_names])

    def __call__(self, params, feat0, feat1, h, w, **kw):
        for i, name in enumerate(self.layer_names):
            lp = params["layers"][str(i)]
            layer = self.layers[i]
            if name == "self":
                feat0 = layer(lp, feat0, feat0, h, w)
                feat1 = layer(lp, feat1, feat1, h, w)
            else:
                feat0, feat1 = (layer(lp, feat0, feat1, h, w),
                                layer(lp, feat1, feat0, h, w))
        return feat0, feat1


def sine_pos_encoding(d_model: int, h: int, w: int, scale_y: float = 1.0,
                      scale_x: float = 1.0) -> np.ndarray:
    """(1, H, W, C) sinusoidal encoding (matching_encoder.py:198-290).
    scale_* implement the train/eval resolution renormalization."""
    pe = np.zeros((d_model, h, w), np.float32)
    y_pos = np.cumsum(np.ones((h, w)), axis=0)[None] * scale_y
    x_pos = np.cumsum(np.ones((h, w)), axis=1)[None] * scale_x
    div = np.exp(np.arange(0, d_model // 2, 2)
                 * (-math.log(10000.0) / (d_model // 2)))[:, None, None]
    pe[0::4] = np.sin(x_pos * div)
    pe[1::4] = np.cos(x_pos * div)
    pe[2::4] = np.sin(y_pos * div)
    pe[3::4] = np.cos(y_pos * div)
    return np.transpose(pe, (1, 2, 0))[None]


class _FPNBasicBlock(nn.Module):
    def __init__(self, in_planes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, stride=stride,
                               padding=1, bias=False)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.bn2 = nn.BatchNorm2d(planes)
        if stride == 1:
            self.downsample = None
        else:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes))

    def __call__(self, params, x, training: bool = False, **kw):
        y = nn.relu(self.bn1(params["bn1"], self.conv1(params["conv1"], x),
                             training=training))
        y = self.bn2(params["bn2"], self.conv2(params["conv2"], y),
                     training=training)
        if self.downsample is not None:
            x = self.downsample(params["downsample"], x, training=training)
        return nn.relu(x + y)


class ResNetFPN_8_2(nn.Module):
    """ResNet backbone to 1/8 (resnet_fpn.py:46-101)."""

    def __init__(self):
        super().__init__()
        dims = [128, 196, 256]
        self.conv1 = nn.Conv2d(3, 128, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(128)
        self.layer1 = nn.Sequential(_FPNBasicBlock(128, dims[0], 1),
                                    _FPNBasicBlock(dims[0], dims[0], 1))
        self.layer2 = nn.Sequential(_FPNBasicBlock(dims[0], dims[1], 2),
                                    _FPNBasicBlock(dims[1], dims[1], 1))
        self.layer3 = nn.Sequential(_FPNBasicBlock(dims[1], dims[2], 2),
                                    _FPNBasicBlock(dims[2], dims[2], 1))
        self.layer3_outconv = nn.Conv2d(dims[2], dims[2], 1, bias=False)

    def __call__(self, params, x, training: bool = False, **kw):
        x = nn.relu(self.bn1(params["bn1"], self.conv1(params["conv1"], x),
                             training=training))
        x = self.layer1(params["layer1"], x, training=training)
        x = self.layer2(params["layer2"], x, training=training)
        x = self.layer3(params["layer3"], x, training=training)
        return self.layer3_outconv(params["layer3_outconv"], x)


class MatchingModel(nn.Module):
    """ResNet-FPN + LoFTR quadtree matcher (matching_encoder.py:292-387)."""

    def __init__(self, train_size: Optional[Tuple[int, int]] = None):
        super().__init__()
        self.image_size = train_size
        self.backbone = ResNetFPN_8_2()
        self.loftr_coarse = LocalFeatureTransformer(
            layer_names=["self", "cross"] * 4, topks=[16, 8, 8])

    def __call__(self, params, image1, image2, training: bool = False,
                 **kw):
        # inputs in [-1, 1] -> [0, 1] (matching_encoder.py:312-315)
        x = jnp.concatenate([image1, image2], axis=0)
        x = (x + 1) / 2.0
        feats = self.backbone(params["backbone"], x, training=training)
        b2, h, w, c = feats.shape
        b = b2 // 2

        if training or self.image_size is None:
            pe = sine_pos_encoding(c, h, w)
        else:
            # image1 is the full-resolution frame; renormalize positions by
            # train/eval resolution (matching_encoder.py:244-276)
            eval_h, eval_w = image1.shape[1], image1.shape[2]
            pe = sine_pos_encoding(c, h, w,
                                   scale_y=self.image_size[0] / eval_h,
                                   scale_x=self.image_size[1] / eval_w)
        feats = feats + jnp.asarray(pe, feats.dtype)

        feat0 = feats[:b].reshape(b, h * w, c)
        feat1 = feats[b:].reshape(b, h * w, c)
        feat0, feat1 = self.loftr_coarse(params["loftr_coarse"], feat0,
                                         feat1, h, w)
        return (feat0.reshape(b, h, w, c), feat1.reshape(b, h, w, c))
