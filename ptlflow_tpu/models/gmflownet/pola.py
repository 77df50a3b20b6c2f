"""POLA (Patch-based OverLapping Attention) blocks for GMFlowNet.

Parity with /root/reference/ptlflow/models/gmflownet/swin_transformer.py
(NeighborWindowAttention :739-889, MultiHeadAttention :889-974,
POLATransBlock :974-1105, MixAxialPOLABlock :1105-1284, POLAUpdate
:1423-1557, MixAxialPOLAUpdate :1672-1776) and extractor.py
(BasicConvEncoder :251-311).

TPU design: the reference's F.unfold(21x21, stride 7) key extraction — a
9x-duplicating gather — is reassembled from nine shifted window partitions
(pure reshapes/transposes, no gather); per-window attention is batched
(49 x 441) matmuls on the MXU; padded key positions are masked with the
reference's -100 logits.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax.numpy as jnp

from ... import nn


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nH*nW, ws*ws, C); H, W multiples of ws."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(wins: jnp.ndarray, ws: int, b: int, h: int,
                   w: int) -> jnp.ndarray:
    """Inverse of window_partition."""
    c = wins.shape[-1]
    x = wins.reshape(b, h // ws, w // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def gather_neighbor_windows(x: jnp.ndarray, ws: int,
                            n_win: int) -> jnp.ndarray:
    """For each ws x ws window of x, the surrounding (n_win*ws)^2 patch.

    x: (B, Hp, Wp, C) with Hp, Wp multiples of ws.  Returns
    (B*nH*nW, (n_win*ws)^2, C) in the reference's F.unfold row-major patch
    order.  Built from n_win^2 shifted window partitions: zero reshape
    cost instead of an unfold gather.
    """
    b, hp, wp, c = x.shape
    neig = (n_win - 1) // 2
    pad = neig * ws
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    nh, nw = hp // ws, wp // ws
    rows = []
    for a in range(n_win):
        cols = []
        for bb in range(n_win):
            v = xp[:, a * ws:a * ws + hp, bb * ws:bb * ws + wp, :]
            v = v.reshape(b, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
            cols.append(v)  # (B, nH, nW, ws, ws, C)
        rows.append(jnp.stack(cols, axis=3))  # (B, nH, nW, n_win_b, ws, ws, C)
    pat = jnp.stack(rows, axis=3)  # (B, nH, nW, a, bb, u, v, C)
    pat = pat.transpose(0, 1, 2, 3, 5, 4, 6, 7)  # (B, nH, nW, a, u, bb, v, C)
    return pat.reshape(b * nh * nw, (n_win * ws) ** 2, c)


class Mlp(nn.Module):
    def __init__(self, in_features: int, hidden_features: int):
        super().__init__()
        self.fc1 = nn.Linear(in_features, hidden_features)
        self.fc2 = nn.Linear(hidden_features, in_features)

    def __call__(self, params, x, **kw):
        return self.fc2(params["fc2"], nn.gelu(self.fc1(params["fc1"], x)))


class NeighborWindowAttention(nn.Module):
    """POLA attention with relative position bias over a n_win x n_win
    neighborhood (swin_transformer.py:739-889)."""

    def __init__(self, dim: int, window_size: int, num_heads: int,
                 neig_win_num: int = 1, qkv_bias: bool = True,
                 use_proj: bool = True):
        super().__init__()
        self.dim = dim
        self.ws = window_size
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.n_win = 2 * neig_win_num + 1
        self.use_proj = use_proj
        self.table_len = (((self.n_win + 1) * window_size - 1)
                          * ((self.n_win + 1) * window_size - 1))
        self.Wq = nn.Linear(dim, dim, bias=qkv_bias)
        self.Wk = nn.Linear(dim, dim, bias=qkv_bias)
        self.Wv = nn.Linear(dim, dim, bias=qkv_bias)
        if use_proj:
            self.proj = nn.Linear(dim, dim)
        # static relative-position index (reference :783-811)
        ws_, nw_ = window_size, self.n_win
        ci = np.stack(np.meshgrid(np.arange(ws_), np.arange(ws_),
                                  indexing="ij")).reshape(2, -1)
        cn = np.stack(np.meshgrid(np.arange(nw_ * ws_), np.arange(nw_ * ws_),
                                  indexing="ij")).reshape(2, -1)
        rel = ci[:, :, None] - cn[:, None, :]
        rel = rel.transpose(1, 2, 0)
        rel[:, :, 0] += nw_ * ws_ - 1
        rel[:, :, 1] += nw_ * ws_ - 1
        rel[:, :, 0] *= (nw_ + 1) * ws_ - 1
        self.rel_index = jnp.asarray(rel.sum(-1), jnp.int32)

    def init(self, key):
        import jax

        params = super().init(key)
        params["relative_position_bias_table"] = 0.02 * jax.random.truncated_normal(
            key, -2.0, 2.0, (self.table_len, self.num_heads), jnp.float32)
        return params

    def _torch_leaves(self):
        return {"relative_position_bias_table": lambda t: t}

    def from_torch(self, flat, strict=True, _path=""):
        # relative_position_index is a persistent torch buffer we rebuild
        # statically; drop it from the incoming state_dict.
        flat = {k: v for k, v in flat.items()
                if k != "relative_position_index"}
        return super().from_torch(flat, strict=strict, _path=_path)

    def __call__(self, params, q, k, v, mask: Optional[jnp.ndarray] = None,
                 **kw):
        # q: (B_, Nq, C); k, v: (B_, Nk, C)
        b_, nq, c = q.shape
        nk = k.shape[1]
        h = self.num_heads
        d = c // h
        q = self.Wq(params["Wq"], q).reshape(b_, nq, h, d).transpose(
            0, 2, 1, 3) * self.scale
        k = self.Wk(params["Wk"], k).reshape(b_, nk, h, d).transpose(
            0, 2, 1, 3)
        v = self.Wv(params["Wv"], v).reshape(b_, nk, h, d).transpose(
            0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32)
        bias = params["relative_position_bias_table"][
            self.rel_index.reshape(-1)].reshape(nq, nk, h)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)
        if mask is not None:
            nwin = mask.shape[0]
            attn = attn.reshape(b_ // nwin, nwin, h, nq, nk) + \
                mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(b_, h, nq, nk)
        attn = nn.softmax(attn, axis=-1).astype(q.dtype)
        x = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                       preferred_element_type=jnp.float32).astype(q.dtype)
        x = x.transpose(0, 2, 1, 3).reshape(b_, nq, c)
        if self.use_proj:
            x = self.proj(params["proj"], x)
        return x


class MultiHeadAttention(nn.Module):
    """Plain MHA (swin_transformer.py:889-974)."""

    def __init__(self, dim: int, num_heads: int, qkv_bias: bool = True,
                 use_proj: bool = True):
        super().__init__()
        self.dim = dim
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.use_proj = use_proj
        self.Wq = nn.Linear(dim, dim, bias=qkv_bias)
        self.Wk = nn.Linear(dim, dim, bias=qkv_bias)
        self.Wv = nn.Linear(dim, dim, bias=qkv_bias)
        if use_proj:
            self.proj = nn.Linear(dim, dim)

    def __call__(self, params, q, k, v, **kw):
        b, nq, c = q.shape
        nk = k.shape[1]
        h = self.num_heads
        d = c // h
        q = self.Wq(params["Wq"], q).reshape(b, nq, h, d).transpose(
            0, 2, 1, 3) * self.scale
        k = self.Wk(params["Wk"], k).reshape(b, nk, h, d).transpose(
            0, 2, 1, 3)
        v = self.Wv(params["Wv"], v).reshape(b, nk, h, d).transpose(
            0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32)
        attn = nn.softmax(attn, axis=-1).astype(q.dtype)
        x = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                       preferred_element_type=jnp.float32).astype(q.dtype)
        x = x.transpose(0, 2, 1, 3).reshape(b, nq, c)
        if self.use_proj:
            x = self.proj(params["proj"], x)
        return x


def _pad_to_multiple(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    pad_b = (ws - h % ws) % ws
    pad_r = (ws - w % ws) % ws
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    return x


class POLATransBlock(nn.Module):
    """Pre-norm POLA attention + MLP block (swin_transformer.py:974-1105)."""

    def __init__(self, dim: int, num_heads: int, window_size: int = 7,
                 neig_win_num: int = 1, mlp_ratio: float = 4.0):
        super().__init__()
        self.dim = dim
        self.ws = window_size
        self.n_win = 2 * neig_win_num + 1
        self.norm1 = nn.LayerNorm(dim)
        self.attn = NeighborWindowAttention(dim, window_size, num_heads,
                                            neig_win_num)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def __call__(self, params, x, attn_mask=None, **kw):
        # x: (B, H, W, C)
        b, h, w, c = x.shape
        shortcut = x
        x = self.norm1(params["norm1"], x)
        xp = _pad_to_multiple(x, self.ws)
        hp, wp = xp.shape[1], xp.shape[2]
        q_win = window_partition(xp, self.ws)
        kv = gather_neighbor_windows(xp, self.ws, self.n_win)
        out = self.attn(params["attn"], q_win, kv, kv, mask=attn_mask)
        x = window_reverse(out, self.ws, b, hp, wp)[:, :h, :w]
        x = shortcut + x
        x = x + self.mlp(params["mlp"], self.norm2(params["norm2"], x))
        return x


class MixAxialPOLABlock(nn.Module):
    """POLA on part of the channels + horizontal/vertical axial attention on
    the rest (swin_transformer.py:1105-1284)."""

    def __init__(self, dim: int, num_heads: int = 8, window_size: int = 7,
                 mlp_ratio: float = 4.0):
        super().__init__()
        self.dim = dim
        self.ws = window_size
        self.dim_per_head = dim // num_heads
        self.axis_head = 2
        self.local_head = num_heads - 2 * self.axis_head
        self.local_chl = self.local_head * self.dim_per_head
        self.axis_chl = self.axis_head * self.dim_per_head
        self.n_win = 3
        self.norm1 = nn.LayerNorm(dim)
        self.localAttn = NeighborWindowAttention(
            self.local_chl, window_size, self.local_head, neig_win_num=1)
        self.vertiAttn = MultiHeadAttention(self.axis_chl, self.axis_head,
                                            use_proj=False)
        self.horizAttn = MultiHeadAttention(self.axis_chl, self.axis_head,
                                            use_proj=False)
        self.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def __call__(self, params, x, attn_mask=None, **kw):
        b, h, w, c = x.shape
        shortcut = x
        x = self.norm1(params["norm1"], x)
        x_local = x[..., :self.local_chl]
        x_horiz = x[..., self.local_chl:self.local_chl + self.axis_chl]
        x_verti = x[..., self.local_chl + self.axis_chl:]

        xp = _pad_to_multiple(x_local, self.ws)
        hp, wp = xp.shape[1], xp.shape[2]
        q_win = window_partition(xp, self.ws)
        kv = gather_neighbor_windows(xp, self.ws, self.n_win)
        out = self.localAttn(params["localAttn"], q_win, kv, kv,
                             mask=attn_mask)
        x_local = window_reverse(out, self.ws, b, hp, wp)[:, :h, :w]

        xh = x_horiz.reshape(b * h, w, self.axis_chl)
        xh = self.horizAttn(params["horizAttn"], xh, xh, xh)
        x_horiz = xh.reshape(b, h, w, self.axis_chl)

        xv = x_verti.transpose(0, 2, 1, 3).reshape(b * w, h, self.axis_chl)
        xv = self.vertiAttn(params["vertiAttn"], xv, xv, xv)
        x_verti = xv.reshape(b, w, h, self.axis_chl).transpose(0, 2, 1, 3)

        x = jnp.concatenate([x_local, x_horiz, x_verti], axis=-1)
        x = self.proj(params["proj"], x)
        x = shortcut + x
        x = x + self.mlp(params["mlp"], self.norm2(params["norm2"], x))
        return x


def _pola_attn_mask(h: int, w: int, ws: int, neig: int) -> jnp.ndarray:
    """(n_windows, ws*ws, (3ws)^2) additive mask: -100 at padded key
    positions (reference POLAUpdate.forward :1516-1543)."""
    n_win = 2 * neig + 1
    valid = jnp.ones((1, h, w, 1), jnp.float32)
    valid = _pad_to_multiple(valid, ws)
    kv = gather_neighbor_windows(valid, ws, n_win)  # (nWin, (3ws)^2, 1)
    mask = (kv[..., 0] - 1.0) * 100.0  # 0 valid, -100 padded
    return jnp.broadcast_to(mask[:, None, :],
                            (mask.shape[0], ws * ws, mask.shape[1]))


class POLAUpdate(nn.Module):
    """Stack of POLA blocks (swin_transformer.py:1423-1557)."""

    def __init__(self, embed_dim: int = 256, depth: int = 6,
                 num_head: int = 8, window_size: int = 7,
                 neig_win_num: int = 1, mlp_ratio: float = 4.0):
        super().__init__()
        self.ws = window_size
        self.neig = neig_win_num
        self.blocks = nn.ModuleList([
            POLATransBlock(embed_dim, num_head, window_size, neig_win_num,
                           mlp_ratio) for _ in range(depth)])
        self.norm = nn.LayerNorm(embed_dim)

    def __call__(self, params, x, **kw):
        # x: (B, H, W, C)
        h, w = x.shape[1], x.shape[2]
        attn_mask = _pola_attn_mask(h, w, self.ws, self.neig)
        for i, blk in enumerate(self.blocks):
            x = blk(params["blocks"][str(i)], x, attn_mask=attn_mask)
        return self.norm(params["norm"], x)


class MixAxialPOLAUpdate(nn.Module):
    """Stack of mixed POLA/axial blocks (swin_transformer.py:1672-1776).
    The reference passes no attention mask here."""

    def __init__(self, embed_dim: int = 256, depth: int = 6,
                 num_head: int = 8, window_size: int = 7,
                 mlp_ratio: float = 4.0):
        super().__init__()
        self.blocks = nn.ModuleList([
            MixAxialPOLABlock(embed_dim, num_head, window_size, mlp_ratio)
            for _ in range(depth)])
        self.norm = nn.LayerNorm(embed_dim)

    def __call__(self, params, x, **kw):
        for i, blk in enumerate(self.blocks):
            x = blk(params["blocks"][str(i)], x)
        return self.norm(params["norm"], x)


class BasicConvEncoder(nn.Module):
    """3-conv stride-8 encoder (extractor.py:251-311)."""

    def __init__(self, output_dim: int = 128, norm_fn: str = "instance",
                 dropout: float = 0.0):
        super().__init__()
        half = max(output_dim // 2, 64)
        if norm_fn == "instance":
            mk = lambda c: nn.InstanceNorm2d(c)  # noqa: E731
        elif norm_fn == "batch":
            mk = lambda c: nn.BatchNorm2d(c)  # noqa: E731
        elif norm_fn == "none":
            mk = lambda c: nn.Identity()  # noqa: E731
        else:
            raise ValueError(norm_fn)
        self.norm1 = mk(64)
        self.norm2 = mk(half)
        self.norm3 = mk(output_dim)
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3)
        self.conv2 = nn.Conv2d(64, half, 3, stride=2, padding=1)
        self.conv3 = nn.Conv2d(half, output_dim, 3, stride=2, padding=1)

    def __call__(self, params, x, training: bool = False, **kw):
        x = nn.relu(self.norm1(params.get("norm1", {}), self.conv1(
            params["conv1"], x), training=training))
        x = nn.relu(self.norm2(params.get("norm2", {}), self.conv2(
            params["conv2"], x), training=training))
        x = nn.relu(self.norm3(params.get("norm3", {}), self.conv3(
            params["conv3"], x), training=training))
        return x
