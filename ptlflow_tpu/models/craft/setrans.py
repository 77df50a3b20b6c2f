"""Squeeze-Expanded Transformer (SETrans) blocks for CRAFT.

Parity with /root/reference/ptlflow/models/craft/setrans.py (config defaults
:81-131, CrossAttFeatTrans :473-650, ExpandedFeatTrans :340-471,
SlidingPosBiases2D :742-814, SETransInputFeatEncoder :817-925,
SelfAttVisPosTrans :652-711).  Attribute names match the torch modules so
checkpoint conversion is the generic tree walk.

TPU design notes: all attention matmuls are batched einsums on the MXU; the
sliding positional bias table is materialized with two broadcasted index
maps + one gather from a zero-padded table instead of the reference's
host-side meshgrid index lists; the reference's data-dependent attention
clamping (clamp only when max > attn_clip) is replaced by an unconditional
clamp, which is mathematically identical.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ... import nn


class SETransConfig:
    """Mutable config bag (reference setrans.py:81-131 defaults)."""

    def __init__(self, **overrides):
        self.feat_dim = -1
        self.in_feat_dim = -1
        self.pos_dim = 2
        self.pos_code_weight = 1.0
        self.num_modes = 4
        self.tie_qk_scheme = "shared"
        self.trans_output_type = "private"
        self.attn_clip = 100.0
        self.base_initializer_range = 0.02
        self.qk_have_bias = False
        self.v_has_bias = False
        self.query_idbias_scale = 10
        self.feattrans_lin1_idbias_scale = 10
        self.pool_modes_feat = "softmax"
        self.pos_code_type = "bias"
        self.pos_bias_radius = 7
        self.out_attn_probs_only = False
        self.out_attn_scores_only = False
        self.attn_mask_radius = -1
        self.has_FFN = True
        self.has_input_skip = False
        for k, v in overrides.items():
            setattr(self, k, v)


class LearnedSoftAggregate(nn.Module):
    """Softmax-weighted aggregation across the modes axis
    (setrans.py:319-337)."""

    def __init__(self, num_feat: int, group_dim: int, keepdim: bool = False):
        super().__init__()
        self.num_feat = num_feat
        self.group_dim = group_dim
        self.keepdim = keepdim
        self.feat2score = nn.Linear(num_feat, 1)

    def __call__(self, params, x, score_basis=None, **kw):
        if score_basis is None:
            score_basis = x
        if self.num_feat == 1:
            scores = self.feat2score(params["feat2score"],
                                     score_basis[..., None])[..., 0]
        else:
            scores = self.feat2score(params["feat2score"], score_basis)
        probs = nn.softmax(scores.astype(jnp.float32),
                           axis=self.group_dim).astype(x.dtype)
        return jnp.sum(x * probs, axis=self.group_dim, keepdims=self.keepdim)


class ExpandedFeatTrans(nn.Module):
    """Multi-mode value expansion + attention fusion + soft mode pooling
    (setrans.py:340-471).  CRAFT always uses has_FFN=False configs, so the
    FFN branch (MMSharedMid/MM*Output) is not implemented."""

    def __init__(self, config: SETransConfig, name: str = ""):
        super().__init__()
        if getattr(config, "has_FFN", True):
            raise NotImplementedError(
                "ExpandedFeatTrans FFN branch is unused by CRAFT configs")
        self.name = name
        self.in_feat_dim = config.in_feat_dim
        self.feat_dim = config.feat_dim
        self.num_modes = config.num_modes
        self.has_input_skip = getattr(config, "has_input_skip", False)
        self.base_initializer_range = config.base_initializer_range
        self.idbias_scale = config.feattrans_lin1_idbias_scale
        self.first_linear = nn.Linear(self.in_feat_dim,
                                      self.feat_dim * self.num_modes,
                                      bias=config.v_has_bias)
        self.feat_softaggr = LearnedSoftAggregate(self.feat_dim, group_dim=1)
        if self.has_input_skip:
            self.skip_layer_norm = nn.LayerNorm(self.feat_dim, eps=1e-12,
                                                elementwise_affine=False)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        params = super().init(k2)
        # reference init: N(0, 0.02) + identity bias on the first mode
        # (setrans.py:185-205, 397-417); our Linear weights are (in, out)
        w = self.base_initializer_range * jax.random.normal(
            k1, (self.in_feat_dim, self.feat_dim * self.num_modes))
        ident = (jnp.eye(self.in_feat_dim, self.feat_dim)
                 * self.base_initializer_range * self.idbias_scale)
        w = w.at[:, :self.feat_dim].set(w[:, :self.feat_dim] * 0.5 + ident)
        params["first_linear"]["weight"] = w
        if self.has_input_skip:
            params["input_skip_coeff"] = jnp.ones((1,), jnp.float32)
        return params

    def _torch_leaves(self):
        if self.has_input_skip:
            return {"input_skip_coeff": lambda g: g}
        return {}

    def __call__(self, params, input_feat, attention_probs, **kw):
        # input_feat: (B, U2, IF); attention_probs: (B, M, U1, U2)
        b, u2, _ = input_feat.shape
        m, f = self.num_modes, self.feat_dim
        v = self.first_linear(params["first_linear"], input_feat)
        v = v.reshape(b, u2, m, f).transpose(0, 2, 1, 3)  # (B, M, U2, F)
        fusion = jnp.einsum("bmuv,bmvf->bmuf", attention_probs, v,
                            preferred_element_type=jnp.float32)
        fusion = fusion.astype(input_feat.dtype)
        trans = self.feat_softaggr(params["feat_softaggr"], fusion)
        if self.has_input_skip:
            trans = params["input_skip_coeff"].astype(trans.dtype) * \
                input_feat + trans
            trans = self.skip_layer_norm({}, trans)
        return trans


class CrossAttFeatTrans(nn.Module):
    """Multi-mode cross attention (setrans.py:473-650)."""

    def __init__(self, config: SETransConfig, name: str = ""):
        super().__init__()
        self.name = name
        self.num_modes = config.num_modes
        self.in_feat_dim = config.in_feat_dim
        self.feat_dim = config.feat_dim
        self.mode_dim = self.in_feat_dim // self.num_modes
        self.attn_clip = config.attn_clip
        self.tie_qk_scheme = config.tie_qk_scheme
        self.out_attn_scores_only = config.out_attn_scores_only
        self.out_attn_probs_only = config.out_attn_probs_only
        self.pos_code_weight = (config.pos_code_weight
                                if config.pos_code_type == "bias" else 1.0)
        self.base_initializer_range = config.base_initializer_range
        self.query_idbias_scale = config.query_idbias_scale
        att_all = self.num_modes * self.mode_dim
        # torch shares one Parameter between query and key when tied
        # (setrans.py:545-551); we store it once under "query" so parameter
        # counts and optimizer state match.
        self.tied_qk = self.tie_qk_scheme == "shared"
        self.query = nn.Linear(self.in_feat_dim, att_all,
                               bias=config.qk_have_bias)
        if not self.tied_qk:
            self.key = nn.Linear(self.in_feat_dim, att_all,
                                 bias=config.qk_have_bias)
        if self.out_attn_scores_only or self.out_attn_probs_only:
            self.out_trans = None
            if self.num_modes > 1:
                self.attn_softaggr = LearnedSoftAggregate(1, group_dim=1,
                                                          keepdim=True)
        else:
            self.out_trans = ExpandedFeatTrans(config, name + "-out_trans")

    def init(self, key):
        kq, kk, key = jax.random.split(key, 3)
        params = super().init(key)
        # N(0, 0.02) init + identity bias on the key weight's first mode
        # (setrans.py:560-575).  Our Linear weights are (in, out): torch's
        # first mode_dim output rows are our first mode_dim output columns.
        names = ["query"] if self.tied_qk else ["query", "key"]
        for pname, k1 in zip(names, (kq, kk)):
            params[pname]["weight"] = self.base_initializer_range * \
                jax.random.normal(k1, params[pname]["weight"].shape)
        ident = jnp.tile(jnp.eye(self.mode_dim),
                         (self.in_feat_dim // self.mode_dim, 1)) \
            * self.base_initializer_range * self.query_idbias_scale
        kname = "query" if self.tied_qk else "key"
        kw = params[kname]["weight"]
        params[kname]["weight"] = kw.at[:, :self.mode_dim].set(
            kw[:, :self.mode_dim] * 0.5 + ident)
        return params

    def from_torch(self, flat, strict=True, _path=""):
        if self.tied_qk:
            # key.* duplicates the shared query Parameter; drop it.
            flat = {k: v for k, v in flat.items()
                    if not k.startswith("key.")}
        return super().from_torch(flat, strict=strict, _path=_path)

    def _split_modes(self, x):
        b, u, _ = x.shape
        return x.reshape(b, u, self.num_modes, self.mode_dim).transpose(
            0, 2, 1, 3)

    def __call__(self, params, query_feat, key_feat=None, pos_biases=None,
                 attention_mask=None, **kw):
        if key_feat is None:
            key_feat = query_feat
        q = self._split_modes(self.query(params["query"], query_feat))
        if self.tied_qk:
            k = self._split_modes(self.query(params["query"], key_feat))
        else:
            k = self._split_modes(self.key(params["key"], key_feat))
        scores = jnp.einsum("bmud,bmvd->bmuv", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(self.mode_dim, jnp.float32))
        # unconditional clamp == reference's clamp-when-exceeded
        scores = jnp.clip(scores, -self.attn_clip, self.attn_clip)
        if pos_biases is not None:
            scores = scores + self.pos_code_weight * pos_biases
        if attention_mask is not None:
            scores = scores + attention_mask
        scores = scores.astype(query_feat.dtype)
        if self.out_attn_scores_only:
            if self.num_modes > 1:
                scores = self.attn_softaggr(params["attn_softaggr"], scores)
            return scores
        probs = nn.softmax(scores.astype(jnp.float32),
                           axis=-1).astype(query_feat.dtype)
        if self.out_attn_probs_only:
            return probs
        return self.out_trans(params["out_trans"], key_feat, probs)


class SlidingPosBiases2D(nn.Module):
    """Learnable relative-position bias within a (2R+1)^2 window
    (setrans.py:742-814): pos[i,j,u,v] = biases[u-i+R, v-j+R] when both
    offsets are within R, else 0."""

    def __init__(self, pos_dim: int = 2, pos_bias_radius: int = 7):
        super().__init__()
        assert pos_dim == 2
        self.R = pos_bias_radius

    def init(self, key):
        n = 2 * self.R + 1
        return {"biases": jnp.zeros((n, n), jnp.float32)}

    def _torch_leaves(self):
        return {"biases": lambda b: b}

    def __call__(self, params, h: int, w: int, **kw):
        R = self.R
        n = 2 * R + 1
        # pos[i,j,u,v] = biases[u-i+R, v-j+R] (zero outside the window) as
        # two banded-matrix contractions instead of a (HW)^2 gather: the
        # gather + 4-D transpose is a quarter-GB random shuffle at Sintel
        # resolution, while this contraction is two small matmuls feeding
        # one fused broadcast.
        du = (jnp.arange(h)[None, :] - jnp.arange(h)[:, None] + R)  # (i, u)
        dv = (jnp.arange(w)[None, :] - jnp.arange(w)[:, None] + R)  # (j, v)
        a = (du[None] == jnp.arange(n)[:, None, None]).astype(jnp.float32)
        b = (dv[None] == jnp.arange(n)[:, None, None]).astype(jnp.float32)
        t = jnp.einsum("ab,aiu->biu", params["biases"], a)  # (n, h, h)
        pos = jnp.einsum("biu,bjv->ijuv", t, b)  # (i, j, u, v)
        return pos.reshape(1, 1, h * w, h * w)


class SETransInputFeatEncoder(nn.Module):
    """NHWC features -> normalized tokens (+ sliding pos biases)
    (setrans.py:817-925, pos_code_type='bias' path: pos embeddings are
    disabled and replaced by attention-score biases)."""

    def __init__(self, config: SETransConfig):
        super().__init__()
        assert config.pos_code_type == "bias", \
            "only the 'bias' positional code (CRAFT default) is implemented"
        self.feat_dim = config.in_feat_dim
        self.comb_norm_layer = nn.LayerNorm(self.feat_dim, eps=1e-12,
                                            elementwise_affine=False)
        self.pos_coder = SlidingPosBiases2D(config.pos_dim,
                                            config.pos_bias_radius)

    def __call__(self, params, vis_feat, return_pos_biases: bool = False,
                 **kw):
        # vis_feat: (B, H, W, C)
        b, h, w, c = vis_feat.shape
        tokens = vis_feat.reshape(b, h * w, c)
        feat = self.comb_norm_layer({}, tokens)
        if return_pos_biases:
            return feat, self.pos_coder(params["pos_coder"], h, w)
        return feat


class SelfAttVisPosTrans(nn.Module):
    """Self-attention transform of a feature map (setrans.py:652-711)."""

    def __init__(self, config: SETransConfig, name: str = ""):
        super().__init__()
        self.name = name
        self.out_attn_only = (config.out_attn_scores_only
                              or config.out_attn_probs_only)
        self.attn_mask_radius = config.attn_mask_radius
        self.setrans = CrossAttFeatTrans(config, name)
        self.vispos_encoder = SETransInputFeatEncoder(config)

    def __call__(self, params, x, **kw):
        b, h, w, c = x.shape
        attn_mask = None
        if self.attn_mask_radius > 0:
            ii, jj = jnp.meshgrid(jnp.arange(h), jnp.arange(w),
                                  indexing="ij")
            coords = jnp.stack([ii.reshape(-1), jj.reshape(-1)], -1)
            diff = jnp.abs(coords[None] - coords[:, None]).max(-1)
            attn_mask = jnp.where(diff > self.attn_mask_radius, -1e9, 0.0)
            attn_mask = attn_mask[None, None].astype(jnp.float32)
        tokens, pos_biases = self.vispos_encoder(
            params["vispos_encoder"], x, return_pos_biases=True)
        out = self.setrans(params["setrans"], tokens, pos_biases=pos_biases,
                           attention_mask=attn_mask)
        if not self.out_attn_only:
            out = out.reshape(b, h, w, c)
        return out
