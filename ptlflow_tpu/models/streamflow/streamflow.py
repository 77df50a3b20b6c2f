"""StreamFlow: multi-frame (4-frame) batch-parallel flow with temporal
attention modules.

Parity with /root/reference/ptlflow/models/streamflow/streamflow.py:45-229,
update.py (PCBlock4_Deep_nopool_res :19-50, SKMotionEncoder6_Deep_nopool_res
:433-459, TransformerBlock :605-634, TemporalLayer2 :649-663,
SKUpdateBlock_TAM_v3 :918-1004), gma.py (Attention :33-62 content-only,
Aggregate :64-99), twins_csc.py (Twins_CSC :33-93).

TPU design: the reference's temporally-joint Twins encoder flattens T frames
into one token sequence over a (T*H/4, W/4) grid — equivalent to running our
Twins-SVT backbone on the frames stacked vertically, which is what we do
(one conv/attention pass instead of T).  All T-1 frame pairs run batched
through one scan; the tiny per-pixel temporal attention (T-1 tokens) is a
batched MHA.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ... import nn
from ...ops.correlation import build_corr_pyramid, coords_grid, \
    corr_pyramid_lookup
from ...ops.upsample import convex_upsample
from ...utils.registry import register_model, trainable
from ..base import BaseModel
from ..flowformer.twins_tpu import TwinsSVT
from ..gma.gma_utils import Aggregate


class SequenceLoss:
    """Multi-frame sequence loss (streamflow.py:17-42): flow_preds is a
    list over frame pairs of per-iteration stacks."""

    def __init__(self, gamma: float, max_flow: float):
        self.gamma = gamma
        self.max_flow = max_flow

    def __call__(self, outputs: Dict[str, Any], inputs: Dict[str, Any]):
        total = 0.0
        preds_list = outputs["flow_preds"]
        n_pairs = len(preds_list)
        for i in range(n_pairs):
            flow_preds = preds_list[i]  # (iters, B, H, W, 2)
            flow_gt = jnp.moveaxis(inputs["flows"][:, i], -3, -1)
            valid = jnp.moveaxis(inputs["valids"][:, i], -3, -1)
            mag = jnp.sqrt(jnp.sum(flow_gt ** 2, axis=-1, keepdims=True))
            valid = ((valid >= 0.5) & (mag < self.max_flow)).astype(
                flow_gt.dtype)
            n = flow_preds.shape[0]
            w = self.gamma ** (n - jnp.arange(n) - 1).astype(jnp.float32)
            i_loss = jnp.abs(flow_preds - flow_gt[None])
            per_iter = jnp.mean(valid[None] * i_loss, axis=(1, 2, 3, 4))
            total = total + jnp.sum(w * per_iter)
        return total


class Twins_CSC(nn.Module):
    """Temporally-joint Twins encoder (twins_csc.py:33-93): frames are
    stacked vertically and run through the 2-stage Twins-SVT."""

    def __init__(self):
        super().__init__()
        self.svt = TwinsSVT()

    def __call__(self, params, x, training: bool = False, **kw):
        # x: (B, T, H, W, 3) -> (B, T, H/8, W/8, 256)
        b, t, h, w, c = x.shape
        tall = x.reshape(b, t * h, w, c)
        out = self.svt(params["svt"], tall)
        ho, wo = out.shape[1] // t, out.shape[2]
        return out.reshape(b, t, ho, wo, out.shape[-1])


class PCBlock4_Deep_nopool_res(nn.Module):
    """Super-kernel depthwise conv block (update.py:19-50)."""

    def __init__(self, c_in: int, c_out: int, k_conv):
        super().__init__()
        self.conv_list = nn.ModuleList([
            nn.Conv2d(c_in, c_in, k, stride=1, padding=k // 2, groups=c_in)
            for k in k_conv])
        self.ffn1 = nn.Sequential(
            nn.Conv2d(c_in, int(1.5 * c_in), 1, padding=0), nn.gelu,
            nn.Conv2d(int(1.5 * c_in), c_in, 1, padding=0))
        self.pw = nn.Conv2d(c_in, c_in, 1, padding=0)
        self.ffn2 = nn.Sequential(
            nn.Conv2d(c_in, int(1.5 * c_in), 1, padding=0), nn.gelu,
            nn.Conv2d(int(1.5 * c_in), c_out, 1, padding=0))

    def __call__(self, params, x, **kw):
        x = nn.gelu(x + self.ffn1(params["ffn1"], x))
        for i, conv in enumerate(self.conv_list):
            x = nn.gelu(x + conv(params["conv_list"][str(i)], x))
        x = nn.gelu(x + self.pw(params["pw"], x))
        return self.ffn2(params["ffn2"], x)


class SKMotionEncoder6_Deep_nopool_res(nn.Module):
    def __init__(self, decoder_dim, corr_levels, corr_radius, k_conv):
        super().__init__()
        out_dim = decoder_dim // 2
        cor_planes = corr_levels * (2 * corr_radius + 1) ** 2
        self.convc1 = PCBlock4_Deep_nopool_res(cor_planes, 256, k_conv)
        self.convc2 = PCBlock4_Deep_nopool_res(256, 192, k_conv)
        self.convf1 = nn.Conv2d(2, 128, 1, stride=1, padding=0)
        self.convf2 = PCBlock4_Deep_nopool_res(128, 64, k_conv)
        self.conv = PCBlock4_Deep_nopool_res(64 + 192, out_dim - 2, k_conv)

    def __call__(self, params, flow, corr, **kw):
        cor = nn.gelu(self.convc1(params["convc1"], corr))
        cor = self.convc2(params["convc2"], cor)
        flo = self.convf1(params["convf1"], flow)
        flo = self.convf2(params["convf2"], flo)
        out = self.conv(params["conv"],
                        jnp.concatenate([cor, flo], axis=-1))
        return jnp.concatenate([out, flow], axis=-1)


class ContentAttention(nn.Module):
    """Content-only GMA attention (streamflow gma.py:33-62; the positional
    embedding is commented out in the reference)."""

    def __init__(self, dim: int, heads: int = 1, dim_head: int = 128):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        self.scale = dim_head ** -0.5
        self.to_qk = nn.Conv2d(dim, heads * dim_head * 2, 1, bias=False)

    def __call__(self, params, fmap, **kw):
        b, h, w, c = fmap.shape
        qk = self.to_qk(params["to_qk"], fmap)
        q, k = jnp.split(qk, 2, axis=-1)
        q = q.reshape(b, h * w, self.heads, self.dim_head).transpose(
            0, 2, 1, 3) * self.scale
        k = k.reshape(b, h * w, self.heads, self.dim_head).transpose(
            0, 2, 1, 3)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                         preferred_element_type=jnp.float32)
        return nn.softmax(sim, axis=-1).astype(fmap.dtype)


class TimmAttention(nn.Module):
    """timm ViT attention with fused qkv (used by TransformerBlock)."""

    def __init__(self, dim: int, num_heads: int = 1, qkv_bias: bool = False):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)

    def __call__(self, params, x, **kw):
        b, n, c = x.shape
        h = self.num_heads
        d = c // h
        qkv = self.qkv(params["qkv"], x).reshape(b, n, 3, h, d)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
        attn = jnp.einsum("bhid,bhjd->bhij", q * self.scale, k,
                          preferred_element_type=jnp.float32)
        attn = nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return self.proj(params["proj"], out)


class TimmMlp(nn.Module):
    def __init__(self, in_features, hidden_features):
        super().__init__()
        self.fc1 = nn.Linear(in_features, hidden_features)
        self.fc2 = nn.Linear(hidden_features, in_features)

    def __call__(self, params, x, **kw):
        return self.fc2(params["fc2"], nn.gelu(self.fc1(params["fc1"], x)))


class TransformerBlock(nn.Module):
    """Pre-norm attention + MLP over temporal tokens (update.py:605-634).
    The reference zero-initializes all parameters (zero_module)."""

    def __init__(self, dim: int, num_heads: int = 1, mlp_ratio: int = 2):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.attn = TimmAttention(dim, num_heads=num_heads, qkv_bias=False)
        self.mlp = TimmMlp(dim, int(dim * mlp_ratio))

    def init(self, key):
        params = super().init(key)
        return jax.tree_util.tree_map(jnp.zeros_like, params)

    def __call__(self, params, x, **kw):
        x = x + self.attn(params["attn"], self.norm1(params["norm1"], x))
        x = x + self.mlp(params["mlp"], self.norm2(params["norm2"], x))
        return x


class TemporalLayer2(nn.Module):
    def __init__(self, dim: int):
        super().__init__()
        self.transformer_block = TransformerBlock(dim)

    def __call__(self, params, x, **kw):
        # x: (B*H*W, T, C) -> same
        return self.transformer_block(params["transformer_block"], x)


class SKUpdateBlock_TAM_v3(nn.Module):
    """Temporal-attention super-kernel update block (update.py:918-1004)."""

    def __init__(self, decoder_dim, num_heads, use_gma, pcupdater_conv,
                 corr_levels, corr_radius, T, k_conv):
        super().__init__()
        self.encoder = SKMotionEncoder6_Deep_nopool_res(
            decoder_dim=decoder_dim, corr_levels=corr_levels,
            corr_radius=corr_radius, k_conv=k_conv)
        embed_dim = decoder_dim // 2
        self.gma = use_gma
        if use_gma:
            self.aggregator = Aggregate(dim=embed_dim, dim_head=embed_dim,
                                        heads=num_heads)
        self.gru = PCBlock4_Deep_nopool_res(embed_dim * 5, embed_dim,
                                            k_conv=pcupdater_conv)
        self.mask = nn.Sequential(
            nn.Conv2d(embed_dim, embed_dim * 2, 3, padding=1), nn.relu,
            nn.Conv2d(embed_dim * 2, 8 * 8 * 9, 1, padding=0))
        self.transformer_block = TemporalLayer2(dim=embed_dim)
        self.flow_head = PCBlock4_Deep_nopool_res(embed_dim * (T - 1),
                                                  2 * (T - 1), k_conv)

    def __call__(self, params, nets, inps, corrs, flows, attentions,
                 t_pairs: int, **kw):
        # nets/inps/corrs/flows: (B*T', H, W, C) with T' = t_pairs
        bt, h, w, _ = nets.shape
        b = bt // t_pairs
        motion = self.encoder(params["encoder"], flows, corrs)
        c = motion.shape[-1]
        tokens = motion.reshape(b, t_pairs, h, w, c).transpose(
            0, 2, 3, 1, 4).reshape(b * h * w, t_pairs, c)
        mft = self.transformer_block(params["transformer_block"], tokens)
        mft = mft.reshape(b, h, w, t_pairs, c).transpose(
            0, 3, 1, 2, 4).reshape(bt, h, w, c)
        if self.gma:
            mfg = self.aggregator(params["aggregator"], attentions, motion)
            inp_cats = jnp.concatenate([inps, motion, mfg, mft], axis=-1)
        else:
            inp_cats = jnp.concatenate([inps, motion, mft], axis=-1)
        nets = self.gru(params["gru"],
                        jnp.concatenate([nets, inp_cats], axis=-1))
        # flow head over frame-concatenated channels
        nets_b = nets.reshape(b, t_pairs, h, w, -1).transpose(
            0, 2, 3, 1, 4).reshape(b, h, w, -1)
        delta = self.flow_head(params["flow_head"], nets_b)
        delta = delta.reshape(b, h, w, t_pairs, 2).transpose(0, 3, 1, 2, 4)
        masks = 0.25 * self.mask(params["mask"], nets)
        masks = masks.reshape(b, t_pairs, h, w, -1)
        return nets, masks, delta


class StreamFlow(BaseModel):
    required_images = 4  # 4-frame pipeline (T frames -> T-1 flows)
    pretrained_checkpoints = {
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/streamflow-kitti-eaafa6ed.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/streamflow-sintel-af557e5e.ckpt",
        "spring": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/streamflow-spring-092f8a17.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/streamflow-things-c640255a.ckpt",
    }

    def __init__(self, decoder_dim: int = 256, corr_levels: int = 4,
                 corr_radius: int = 4, num_heads: int = 1,
                 pcupdater_conv=(1, 7), T: int = 4, k_conv=(1, 15),
                 use_gma: bool = True, iters: int = 15,
                 gamma: float = 0.8, max_flow: float = 400, **kwargs):
        super().__init__(output_stride=8,
                         loss_fn=SequenceLoss(gamma, max_flow), **kwargs)
        self.corr_levels = corr_levels
        self.corr_radius = corr_radius
        self.iters = iters
        self.hidden_dim = decoder_dim // 2
        self.context_dim = cdim = decoder_dim // 2
        self.fnet = Twins_CSC()
        self.cnet = Twins_CSC()
        self.update_block = SKUpdateBlock_TAM_v3(
            decoder_dim=decoder_dim, num_heads=num_heads, use_gma=use_gma,
            pcupdater_conv=list(pcupdater_conv), corr_levels=corr_levels,
            corr_radius=corr_radius, T=T, k_conv=list(k_conv))
        self.att = ContentAttention(dim=cdim, heads=num_heads,
                                    dim_head=cdim) if use_gma else None

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=True,
            resize_mode="pad", pad_mode="replicate", pad_two_side=True)

        b, t = images.shape[0], images.shape[1]
        tp = t - 1  # frame pairs
        fmaps = self.fnet(params["fnet"], images, training=training)
        cnets = self.cnet(params["cnet"], images[:, :-1], training=training)

        bt = b * tp
        _, _, h, w, _ = fmaps.shape
        f1 = fmaps[:, :-1].reshape(bt, h, w, -1)
        f2 = fmaps[:, 1:].reshape(bt, h, w, -1)
        pyramid = build_corr_pyramid(f1, f2, self.corr_levels)

        hdim = self.hidden_dim
        cn = cnets.reshape(bt, h, w, -1)
        nets = jnp.tanh(cn[..., :hdim])
        inps = nn.relu(cn[..., hdim:])
        attentions = self.att(params["att"], inps) \
            if self.att is not None else None

        coords0 = coords_grid(bt, h, w, dtype=f1.dtype)
        up_params = params["update_block"]

        def step(carry, _):
            nets, coords1, _ = carry
            coords1 = jax.lax.stop_gradient(coords1)
            corrs = corr_pyramid_lookup(pyramid, coords1, self.corr_radius)
            flows = coords1 - coords0
            nets, masks, delta = self.update_block(
                up_params, nets, inps, corrs, flows, attentions,
                t_pairs=tp)
            # delta: (B, T', H, W, 2) -> (B*T', H, W, 2)
            coords1 = coords1 + delta.reshape(bt, h, w, 2)
            masks_bt = masks.reshape(bt, h, w, -1)
            ys = (coords1 - coords0, masks_bt) if training else None
            return (nets, coords1, masks_bt), ys

        mask0 = jnp.zeros((bt, h, w, 64 * 9), f1.dtype)
        (nets, coords1, last_mask), ys = jax.lax.scan(
            step, (nets, coords0, mask0), None, length=self.iters)

        if training:
            flows_lr, masks = ys
            it = flows_lr.shape[0]
            flow_ups = convex_upsample(
                flows_lr.reshape(it * bt, h, w, 2),
                masks.reshape(it * bt, h, w, masks.shape[-1]))
            flow_ups = flow_ups.reshape(it, b, tp, 8 * h, 8 * w, 2)
            flow_ups = self.postprocess_predictions(flow_ups, image_resizer,
                                                    is_flow=True)
            preds_list = [flow_ups[:, :, i] for i in range(tp)]
            final = jnp.stack([p[-1] for p in preds_list], axis=1)
            return {"flows": jnp.moveaxis(final, -1, -3),
                    "flow_preds": preds_list}
        flow_up = convex_upsample(coords1 - coords0, last_mask)
        flow_up = self.postprocess_predictions(flow_up, image_resizer,
                                               is_flow=True)
        flow_up = flow_up.reshape(b, tp, *flow_up.shape[1:])
        flow_small = (coords1 - coords0).reshape(b, tp, h, w, 2)
        return {"flows": jnp.moveaxis(flow_up, -1, -3),
                "flow_small": jnp.moveaxis(flow_small, -1, -3)}


@register_model
@trainable
class streamflow(StreamFlow):
    pass
