"""GMA attention: relative-position attention over the context features and
global motion aggregation.

Parity with /root/reference/ptlflow/models/gma/gma_utils.py:6-113
(RelPosEmb / Attention / Aggregate; attribute names match for checkpoint
conversion).  NHWC; the attention matmuls run on the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp

from ... import nn


class Embedding(nn.Module):
    """torch ``nn.Embedding``-compatible lookup table."""

    def __init__(self, num_embeddings: int, embedding_dim: int):
        super().__init__()
        self.num_embeddings = num_embeddings
        self.embedding_dim = embedding_dim

    def init(self, key):
        import jax

        return {"weight": jax.random.normal(
            key, (self.num_embeddings, self.embedding_dim), jnp.float32)}

    def _torch_leaves(self):
        return {"weight": lambda w: w}

    def __call__(self, params, idx, **kw):
        return jnp.take(params["weight"], idx, axis=0)


class RelPosEmb(nn.Module):
    def __init__(self, max_pos_size: int, dim_head: int):
        super().__init__()
        self.max_pos_size = max_pos_size
        self.rel_height = Embedding(2 * max_pos_size - 1, dim_head)
        self.rel_width = Embedding(2 * max_pos_size - 1, dim_head)

    def from_torch(self, flat, strict=True, _path=""):
        # rel_ind is a persistent torch buffer we rebuild statically
        flat = {k: v for k, v in flat.items() if k != "rel_ind"}
        return super().from_torch(flat, strict=strict, _path=_path)

    def __call__(self, params, q, **kw):
        # q: (B, heads, H, W, d)
        b, heads, h, w, d = q.shape
        deltas_h = (jnp.arange(h)[None, :] - jnp.arange(h)[:, None]
                    + self.max_pos_size - 1)
        deltas_w = (jnp.arange(w)[None, :] - jnp.arange(w)[:, None]
                    + self.max_pos_size - 1)
        height_emb = self.rel_height(params["rel_height"], deltas_h)  # (h,h,d)
        width_emb = self.rel_width(params["rel_width"], deltas_w)  # (w,w,d)
        height_score = jnp.einsum("bhxyd,xud->bhxyu", q,
                                  height_emb.astype(q.dtype))
        width_score = jnp.einsum("bhxyd,yvd->bhxyv", q,
                                 width_emb.astype(q.dtype))
        # (b, heads, x, y, u, v)
        return height_score[..., :, None] + width_score[..., None, :]


class Attention(nn.Module):
    def __init__(self, dim: int, position_only: bool = False,
                 position_and_content: bool = False, max_pos_size: int = 100,
                 heads: int = 4, dim_head: int = 128):
        super().__init__()
        self.position_only = position_only
        self.position_and_content = position_and_content
        self.heads = heads
        self.dim_head = dim_head
        self.scale = dim_head ** -0.5
        inner = heads * dim_head
        self.to_qk = nn.Conv2d(dim, inner * 2, 1, bias=False)
        self.pos_emb = RelPosEmb(max_pos_size, dim_head)

    def __call__(self, params, fmap, **kw):
        # fmap: (B, H, W, C) -> attention (B, heads, HW, HW)
        b, h, w, c = fmap.shape
        qk = self.to_qk(params["to_qk"], fmap)
        q, k = jnp.split(qk, 2, axis=-1)
        q = q.reshape(b, h, w, self.heads, self.dim_head).transpose(
            0, 3, 1, 2, 4)
        k = k.reshape(b, h, w, self.heads, self.dim_head).transpose(
            0, 3, 1, 2, 4)
        q = self.scale * q
        if self.position_only:
            sim = self.pos_emb(params["pos_emb"], q)
        elif self.position_and_content:
            sim = jnp.einsum("bhxyd,bhuvd->bhxyuv", q, k) + \
                self.pos_emb(params["pos_emb"], q)
        else:
            sim = jnp.einsum("bhxyd,bhuvd->bhxyuv", q, k,
                             preferred_element_type=jnp.float32)
        sim = sim.reshape(b, self.heads, h * w, h * w)
        return nn.softmax(sim.astype(jnp.float32), axis=-1).astype(fmap.dtype)


class Aggregate(nn.Module):
    def __init__(self, dim: int, heads: int = 4, dim_head: int = 128):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        inner = heads * dim_head
        self.to_v = nn.Conv2d(dim, inner, 1, bias=False)
        self.dim = dim
        self.inner = inner
        if dim != inner:
            self.project = nn.Conv2d(inner, dim, 1, bias=False)
        else:
            self.project = None

    def init(self, key):
        params = super().init(key)
        params["gamma"] = jnp.zeros((1,), jnp.float32)
        return params

    def _torch_leaves(self):
        return {"gamma": lambda g: g}

    def __call__(self, params, attn, fmap, **kw):
        # attn: (B, heads, HW, HW); fmap: (B, H, W, C)
        b, h, w, c = fmap.shape
        v = self.to_v(params["to_v"], fmap)
        v = v.reshape(b, h * w, self.heads, self.dim_head).transpose(
            0, 2, 1, 3)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v,
                         preferred_element_type=jnp.float32).astype(fmap.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.inner)
        if self.project is not None:
            out = self.project(params["project"], out)
        return fmap + params["gamma"].astype(fmap.dtype) * out
