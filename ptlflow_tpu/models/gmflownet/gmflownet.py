"""GMFlowNet: global matching + overlapping attention (POLA) on RAFT.

Parity with /root/reference/ptlflow/models/gmflownet/gmflownet.py:75-309
(model + global-matching flow init), loss.py:94-147 (coarse matching
supervision + cross-entropy loss).  The fnet is a conv encoder followed by a
6-deep POLA (or mixed axial-POLA) transformer; flow is initialized from
mutual-argmax matches of the softmax correlation map; iterations are the
standard RAFT scan reusing our ops.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ... import nn
from ...ops.correlation import (all_pairs_correlation, coords_grid,
                                corr_pyramid_lookup)
from ...ops.grid_sample import bilinear_sampler
from ...ops.warp import forward_interpolate
from ...utils.registry import register_model, trainable
from ..base import BaseModel
from ..raft.extractor import BasicEncoder
from ..raft.update import BasicUpdateBlock
from .pola import BasicConvEncoder, MixAxialPOLAUpdate, POLAUpdate


def compute_supervision_coarse(flow, occlusions, scale: int):
    """GT coarse match matrix (reference loss.py:94-122).

    flow: (B, 2, H, W); occlusions: (B, 1, H, W).  Returns (B, L, L) with
    one-hot matches for non-occluded, in-bounds pixels.
    """
    b, _, h, w = flow.shape
    hc, wc = -(-h // scale), -(-w // scale)
    occ_c = occlusions[:, 0, ::scale, ::scale].reshape(b, hc * wc)
    flow_c = flow[:, :, ::scale, ::scale] / scale

    xs = jnp.arange(wc, dtype=flow.dtype)
    ys = jnp.arange(hc, dtype=flow.dtype)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    warp_x = jnp.round(gx[None] + flow_c[:, 0]).astype(jnp.int32)
    warp_y = jnp.round(gy[None] + flow_c[:, 1]).astype(jnp.int32)
    oob = (warp_x < 0) | (warp_x >= wc) | (warp_y < 0) | (warp_y >= hc)
    occ_c = jnp.maximum(occ_c, oob.reshape(b, hc * wc).astype(occ_c.dtype))
    j_ids = (warp_x + warp_y * wc).reshape(b, hc * wc)
    j_ids = jnp.clip(j_ids, 0, hc * wc - 1)
    valid = (occ_c == 0).astype(flow.dtype)
    one_hot = jax.nn.one_hot(j_ids, hc * wc, dtype=flow.dtype)
    return one_hot * valid[..., None]


def compute_coarse_loss(conf, conf_gt):
    """Balanced cross-entropy over the match matrix (loss.py:125-134,
    POS_WEIGHT = NEG_WEIGHT = 1, COARSE_TYPE = cross_entropy)."""
    conf = jnp.clip(conf, 1e-6, 1 - 1e-6)
    pos = (conf_gt == 1).astype(conf.dtype)
    neg = (conf_gt == 0).astype(conf.dtype)
    loss_pos = -(jnp.log(conf) * pos).sum() / jnp.maximum(pos.sum(), 1.0)
    loss_neg = -(jnp.log(1 - conf) * neg).sum() / jnp.maximum(neg.sum(), 1.0)
    return loss_pos + loss_neg


class SequenceLoss:
    """RAFT sequence loss + optional global matching loss
    (gmflownet.py:18-72)."""

    def __init__(self, gamma: float, max_flow: float,
                 use_matching_loss: bool):
        self.gamma = gamma
        self.max_flow = max_flow
        self.use_matching_loss = use_matching_loss

    def __call__(self, outputs: Dict[str, Any], inputs: Dict[str, Any]):
        flow_preds = outputs["flow_preds"]  # (iters, B, H, W, 2)
        flow_gt = jnp.moveaxis(inputs["flows"][:, 0], -3, -1)
        valid = jnp.moveaxis(inputs["valids"][:, 0], -3, -1)

        n_predictions = flow_preds.shape[0]
        mag = jnp.sqrt(jnp.sum(flow_gt ** 2, axis=-1, keepdims=True))
        valid = ((valid >= 0.5) & (mag < self.max_flow)).astype(
            flow_gt.dtype)
        i = jnp.arange(n_predictions)
        weights = self.gamma ** (n_predictions - i - 1).astype(jnp.float32)
        i_loss = jnp.abs(flow_preds - flow_gt[None])
        per_iter = jnp.mean(valid[None] * i_loss, axis=(1, 2, 3, 4))
        flow_loss = jnp.sum(weights * per_iter)

        if self.use_matching_loss:
            image1 = inputs["images"][:, 0]
            image2 = inputs["images"][:, 1]
            flow_gt_c = inputs["flows"][:, 0]  # (B, 2, H, W)
            # backwarp with the reference's align_corners=False grid
            # normalization (loss.py:65-91): a half-pixel shift
            img2_nhwc = jnp.moveaxis(image2, -3, -1)
            b, h, w, _ = img2_nhwc.shape
            coords = coords_grid(b, h, w, dtype=flow_gt_c.dtype) + \
                jnp.moveaxis(flow_gt_c, -3, -1) - 0.5
            img_2back1 = bilinear_sampler(img2_nhwc, coords)
            occ = jnp.abs(jnp.mean(
                jnp.moveaxis(image1, -3, -1) - img_2back1, axis=-1,
                keepdims=True)) > 20
            occ = jnp.moveaxis(occ.astype(flow_gt_c.dtype), -1, -3)
            conf_gt = compute_supervision_coarse(flow_gt_c, occ, 8)
            match_loss = compute_coarse_loss(outputs["soft_corr_map"],
                                             conf_gt)
            flow_loss = flow_loss + 0.01 * match_loss
        return flow_loss


class GMFlowNet(BaseModel):
    pretrained_checkpoints = {
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/gmflownet-things-9f061ac7.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/gmflownet-kitti-712b4660.ckpt",
    }

    def __init__(self, corr_levels: int = 4, corr_radius: int = 4,
                 dropout: float = 0.0, gamma: float = 0.8,
                 max_flow: float = 400, iters: int = 32,
                 use_matching_loss: bool = False,
                 use_mix_attn: bool = False, **kwargs):
        super().__init__(
            output_stride=8,
            loss_fn=SequenceLoss(gamma, max_flow, use_matching_loss),
            **kwargs)
        self.corr_levels = corr_levels
        self.corr_radius = corr_radius
        self.iters = iters
        self.hidden_dim = hdim = 128
        self.context_dim = cdim = 128

        if use_mix_attn:
            self.fnet = nn.Sequential(
                BasicConvEncoder(output_dim=256, norm_fn="instance",
                                 dropout=dropout),
                MixAxialPOLAUpdate(embed_dim=256, depth=6, num_head=8,
                                   window_size=7))
        else:
            self.fnet = nn.Sequential(
                BasicConvEncoder(output_dim=256, norm_fn="instance",
                                 dropout=dropout),
                POLAUpdate(embed_dim=256, depth=6, num_head=8,
                           window_size=7, neig_win_num=1))
        self.cnet = BasicEncoder(output_dim=hdim + cdim, norm_fn="batch",
                                 dropout=dropout)
        self.update_block = BasicUpdateBlock(corr_levels=corr_levels,
                                             corr_radius=corr_radius,
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

        b, h, w, _ = fmap1.shape
        hw = h * w
        # full correlation map, kept for the matching init + pyramid
        corr_map = all_pairs_correlation(fmap1, fmap2)  # (B, HW, H, W)
        corr = corr_map.reshape(b * hw, h, w, 1)
        pyramid = [corr]
        for _ in range(self.corr_levels - 1):
            corr = nn.avg_pool2d(corr, 2, 2)
            pyramid.append(corr)

        cnet = self.cnet(params["cnet"], image1, training=training)
        net = jnp.tanh(cnet[..., :self.hidden_dim])
        inp = nn.relu(cnet[..., self.hidden_dim:])

        coords0 = coords_grid(b, h, w, dtype=fmap1.dtype)

        corr_flat = corr_map.reshape(b, hw, hw).astype(jnp.float32)
        soft_corr_map = nn.softmax(corr_flat, axis=2) * \
            nn.softmax(corr_flat, axis=1)

        prev = inputs.get("prev_preds")
        if prev is not None and prev.get("flow_small") is not None:
            flow_small = prev["flow_small"]
            if flow_small.ndim == 4 and flow_small.shape[-1] != 2:
                flow_small = jnp.moveaxis(flow_small, -3, -1)
            coords1 = coords0 + forward_interpolate(flow_small)
        else:
            # mutual-argmax matching init (gmflownet.py:212-235)
            match12 = soft_corr_map.max(axis=2)
            match_idx12 = soft_corr_map.argmax(axis=2)
            match21 = soft_corr_map.max(axis=1)
            match21_g = jnp.take_along_axis(match21, match_idx12, axis=1)
            matched = (match12 - match21_g) == 0
            base_idx = jnp.broadcast_to(jnp.arange(hw)[None], (b, hw))
            coords_index = jnp.where(matched, match_idx12, base_idx)
            coords_x = (coords_index % w).astype(fmap1.dtype)
            coords_y = (coords_index // w).astype(fmap1.dtype)
            coords1 = jnp.stack([coords_x, coords_y],
                                axis=-1).reshape(b, h, w, 2)

        up_params = params["update_block"]

        def step(carry, _):
            net, coords1, _ = carry
            coords1 = jax.lax.stop_gradient(coords1)
            corr = corr_pyramid_lookup(pyramid, coords1, self.corr_radius)
            flow = coords1 - coords0
            net, up_mask, delta_flow = self.update_block(
                up_params, net, inp, corr, flow)
            coords1 = coords1 + delta_flow
            ys = (coords1 - coords0, up_mask) if training else None
            return (net, coords1, up_mask), ys

        from ...ops.upsample import convex_upsample

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
                    "flow_preds": flow_ups,
                    "soft_corr_map": soft_corr_map}
        flow_up = convex_upsample(coords1 - coords0, last_mask)
        flow_up = self.postprocess_predictions(flow_up, image_resizer,
                                               is_flow=True)
        return {"flows": self.nhwc_flow_to_output(flow_up),
                "flow_small": jnp.moveaxis(coords1 - coords0, -1, -3)}


class GMFlowNetMix(GMFlowNet):
    pretrained_checkpoints = {
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/gmflownet_mix-things-8396f0a1.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/gmflownet_mix-sintel-33492618.ckpt",
    }

    def __init__(self, use_mix_attn: bool = True, **kwargs):
        super().__init__(use_mix_attn=use_mix_attn, **kwargs)


@register_model
@trainable
class gmflownet(GMFlowNet):
    pass


@register_model
@trainable
class gmflownet_mix(GMFlowNetMix):
    pass
