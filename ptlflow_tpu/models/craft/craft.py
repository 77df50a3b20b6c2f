"""CRAFT: Cross-Attentional Flow Transformer (RAFT + SETrans attention).

Parity with /root/reference/ptlflow/models/craft/craft.py:51-382,
corr.py:143-220 (TransCorrBlock), update.py:131-196 (GMAUpdateBlock with the
ExpandedFeatTrans aggregator).  Reuses the shared RAFT encoder/GRU blocks;
the inter-frame correlation volume is produced by multi-mode cross attention
(scores only) instead of a plain dot product, then consumed through the
standard 4-level pyramid lookup.  The GRU loop is a lax.scan.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ... import nn
from ...ops.correlation import coords_grid, corr_pyramid_lookup
from ...ops.upsample import convex_upsample
from ...ops.warp import forward_interpolate
from ...utils.registry import register_model, trainable
from ..base import BaseModel
from ..raft.extractor import BasicEncoder
from ..raft.raft import SequenceLoss
from ..raft.update import BasicMotionEncoder, FlowHead, SepConvGRU
from .setrans import (CrossAttFeatTrans, ExpandedFeatTrans, SETransConfig,
                      SETransInputFeatEncoder, SelfAttVisPosTrans)


class TransCorrBlock(nn.Module):
    """Correlation volume from inter-frame cross attention scores
    (reference corr.py:143-220)."""

    def __init__(self, config: SETransConfig, radius: int = 4,
                 num_levels: int = 4, do_corr_global_norm: bool = True):
        super().__init__()
        self.radius = radius
        self.num_levels = num_levels
        self.do_corr_global_norm = do_corr_global_norm
        self.setrans = CrossAttFeatTrans(config, "inter-frame corr")
        self.vispos_encoder = SETransInputFeatEncoder(config)

    def build_pyramid(self, params, fmap1, fmap2):
        """fmap1/2: (B, H, W, C) -> list of (B*H*W, H/2^i, W/2^i, 1)."""
        b, h, w, c = fmap1.shape
        vispos1, pos_biases = self.vispos_encoder(
            params["vispos_encoder"], fmap1, return_pos_biases=True)
        vispos2 = self.vispos_encoder(params["vispos_encoder"], fmap2)
        corr = self.setrans(params["setrans"], vispos1, vispos2, pos_biases)
        # corr: (B, 1, U1, U2) aggregated attention scores
        if self.do_corr_global_norm:
            cf = corr.astype(jnp.float32)
            mean = cf.mean(axis=(2, 3), keepdims=True)
            var = cf.var(axis=(2, 3), keepdims=True)
            corr = ((cf - mean) * jax.lax.rsqrt(var + 1e-12)).astype(
                corr.dtype)
        corr = corr.reshape(b, h, w, h, w).reshape(b * h * w, h, w, 1)
        pyramid = [corr]
        for _ in range(self.num_levels - 1):
            corr = nn.avg_pool2d(corr, 2, 2)
            pyramid.append(corr)
        return pyramid


class GMAUpdateBlock(nn.Module):
    """RAFT update block with the SETrans motion aggregator
    (reference update.py:131-196)."""

    def __init__(self, corr_levels: int, corr_multiplier: int,
                 corr_radius: int, intra_trans_config: SETransConfig,
                 hidden_dim: int = 128):
        super().__init__()
        self.encoder = BasicMotionEncoder(corr_levels * corr_multiplier,
                                          corr_radius)
        self.gru = SepConvGRU(hidden_dim=hidden_dim,
                              input_dim=128 + hidden_dim + hidden_dim)
        self.flow_head = FlowHead(hidden_dim, hidden_dim=256)
        self.mask = nn.Sequential(
            nn.Conv2d(128, 256, 3, padding=1), nn.relu,
            nn.Conv2d(256, 64 * 9, 1, padding=0))
        self.aggregator = ExpandedFeatTrans(intra_trans_config,
                                            "Motion Aggregator")

    def __call__(self, params, net, inp, corr, flow, attention, **kw):
        motion_features = self.encoder(params["encoder"], flow, corr)
        b, h, w, c = motion_features.shape
        tokens = motion_features.reshape(b, h * w, c)
        motion_global = self.aggregator(params["aggregator"], tokens,
                                        attention).reshape(b, h, w, c)
        inp_cat = jnp.concatenate([inp, motion_features, motion_global],
                                  axis=-1)
        net = self.gru(params["gru"], net, inp_cat)
        delta_flow = self.flow_head(params["flow_head"], net)
        mask = 0.25 * self.mask(params["mask"], net)
        return net, mask, delta_flow


class CRAFT(BaseModel):
    pretrained_checkpoints = {
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/craft-things-5a41930c.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/craft-sintel-ff8e6563.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/craft-kitti-4d99b0c1.ckpt",
    }

    def __init__(self, corr_levels: int = 4, corr_radius: int = 4,
                 dropout: float = 0.0, gamma: float = 0.8,
                 max_flow: float = 400, iters: int = 32,
                 f2_attn_mask_radius: int = -1, f2_num_modes: int = 4,
                 f2_pos_code_weight: float = 0.5, inter_num_modes: int = 4,
                 inter_pos_code_weight: float = 0.5,
                 intra_pos_code_weight: float = 1.0,
                 intra_num_modes: int = 4, inter_qk_have_bias: bool = True,
                 pos_bias_radius: int = 7, **kwargs):
        super().__init__(output_stride=8,
                         loss_fn=SequenceLoss(gamma, max_flow), **kwargs)
        self.corr_levels = corr_levels
        self.corr_radius = corr_radius
        self.iters = iters
        self.hidden_dim = hdim = 128
        self.context_dim = cdim = 128

        # inter-frame correlation transformer (craft.py:119-144)
        inter_cfg = SETransConfig(
            in_feat_dim=256, feat_dim=256, num_modes=inter_num_modes,
            tie_qk_scheme="shared", qk_have_bias=inter_qk_have_bias,
            pos_code_weight=inter_pos_code_weight,
            pos_bias_radius=pos_bias_radius, out_attn_scores_only=True,
            has_FFN=False)
        self.corr_fn = TransCorrBlock(inter_cfg, radius=corr_radius,
                                      num_levels=corr_levels,
                                      do_corr_global_norm=True)

        self.fnet = BasicEncoder(output_dim=256, norm_fn="instance",
                                 dropout=dropout)
        self.cnet = BasicEncoder(output_dim=hdim + cdim, norm_fn="batch",
                                 dropout=dropout)

        # f2 feature self-attention (craft.py:152-177)
        f2_cfg = SETransConfig(
            in_feat_dim=256, feat_dim=256, num_modes=f2_num_modes,
            tie_qk_scheme=None, qk_have_bias=False,
            pos_code_weight=f2_pos_code_weight,
            pos_bias_radius=pos_bias_radius,
            attn_mask_radius=f2_attn_mask_radius,
            has_FFN=False, has_input_skip=True)
        self.f2_trans = SelfAttVisPosTrans(f2_cfg, "F2 transformer")

        # intra-frame attention for motion aggregation (craft.py:197-228)
        intra_cfg = SETransConfig(
            in_feat_dim=128, feat_dim=128, num_modes=intra_num_modes,
            tie_qk_scheme=None, qk_have_bias=False,
            pos_code_weight=intra_pos_code_weight,
            pos_bias_radius=pos_bias_radius, out_attn_probs_only=True,
            has_FFN=False)
        self.att = SelfAttVisPosTrans(intra_cfg, "Intra-frame attention")

        agg_cfg = SETransConfig(
            in_feat_dim=128, feat_dim=128, num_modes=intra_num_modes,
            has_FFN=False, has_input_skip=True)
        self.update_block = GMAUpdateBlock(
            corr_levels=corr_levels, corr_multiplier=1,
            corr_radius=corr_radius, intra_trans_config=agg_cfg,
            hidden_dim=hdim)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=True,
            resize_mode="pad", pad_mode="replicate", pad_two_side=True)

        image1 = images[:, 0]
        image2 = images[:, 1]
        # two per-frame fnet passes, NOT one batched concat pass: the
        # batched variant was measured slower on v5e (the concat/split HBM
        # relayout costs more than the second launch; see raft.py)
        fmap1 = self.fnet(params["fnet"], image1, training=training)
        fmap2 = self.fnet(params["fnet"], image2, training=training)
        fmap2 = self.f2_trans(params["f2_trans"], fmap2)

        pyramid = self.corr_fn.build_pyramid(params["corr_fn"], fmap1, fmap2)

        cnet = self.cnet(params["cnet"], image1, training=training)
        net = jnp.tanh(cnet[..., :self.hidden_dim])
        inp = nn.relu(cnet[..., self.hidden_dim:])
        attention = self.att(params["att"], inp)

        b, h, w, _ = fmap1.shape
        coords0 = coords_grid(b, h, w, dtype=fmap1.dtype)
        coords1 = coords0

        prev = inputs.get("prev_preds")
        if prev is not None and prev.get("flow_small") is not None:
            flow_small = prev["flow_small"]
            if flow_small.ndim == 4 and flow_small.shape[-1] != 2:
                flow_small = jnp.moveaxis(flow_small, -3, -1)
            coords1 = coords1 + forward_interpolate(flow_small)

        up_params = params["update_block"]

        def step(carry, _):
            net, coords1, _ = carry
            coords1 = jax.lax.stop_gradient(coords1)
            corr = corr_pyramid_lookup(pyramid, coords1, self.corr_radius)
            flow = coords1 - coords0
            net, up_mask, delta_flow = self.update_block(
                up_params, net, inp, corr, flow, attention)
            coords1 = coords1 + delta_flow
            ys = (coords1 - coords0, up_mask) if training else None
            return (net, coords1, up_mask), ys

        mask0 = jnp.zeros((b, h, w, 64 * 9), fmap1.dtype)
        (net, coords1, last_mask), ys = jax.lax.scan(
            step, (net, coords1, mask0), None, length=self.iters)

        if training:
            flows_lr, masks = ys
            it, bb = flows_lr.shape[0], flows_lr.shape[1]
            flow_ups = convex_upsample(
                flows_lr.reshape(it * bb, h, w, 2),
                masks.reshape(it * bb, h, w, masks.shape[-1]))
            flow_ups = flow_ups.reshape(it, bb, 8 * h, 8 * w, 2)
            flow_ups = self.postprocess_predictions(flow_ups, image_resizer,
                                                    is_flow=True)
            return {"flows": self.nhwc_flow_to_output(flow_ups[-1]),
                    "flow_preds": flow_ups}
        flow_up = convex_upsample(coords1 - coords0, last_mask)
        flow_up = self.postprocess_predictions(flow_up, image_resizer,
                                               is_flow=True)
        return {"flows": self.nhwc_flow_to_output(flow_up),
                "flow_small": jnp.moveaxis(coords1 - coords0, -1, -3)}


@register_model
@trainable
class craft(CRAFT):
    pass
