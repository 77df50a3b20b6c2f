"""MatchFlow: GMA/RAFT on quadtree-attention matching features.

Parity with /root/reference/ptlflow/models/matchflow/matchflow.py:52-399.
The fnet is the LoFTR-style quadtree matching encoder (see quadtree.py);
the rest is the standard GMA (or RAFT) iteration reusing our shared blocks;
tiled inference with Gaussian blending mirrors FlowFormer's.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ... import nn
from ...ops.correlation import build_corr_pyramid, coords_grid, \
    corr_pyramid_lookup
from ...ops.upsample import convex_upsample
from ...ops.warp import forward_interpolate
from ...utils.registry import register_model, trainable
from ..base import BaseModel
from ..flowformer.flowformer import compute_grid_indices, compute_weight
from ..gma.gma import GMAUpdateBlock
from ..gma.gma_utils import Attention
from ..raft.extractor import BasicEncoder
from ..raft.raft import SequenceLoss
from ..raft.update import BasicUpdateBlock
from .quadtree import MatchingModel


class MatchFlow(BaseModel):
    pretrained_checkpoints = {
        "chairs": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/matchflow_gma-chairs-02519b53.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/matchflow_gma-kitti-bc72ce81.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/matchflow_gma-sintel-683422f4.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/matchflow_gma-things-49295bd8.ckpt",
    }

    def __init__(self, corr_levels: int = 4, corr_radius: int = 4,
                 dropout: float = 0.0, gamma: float = 0.8,
                 max_flow: float = 400, iters: int = 32,
                 num_heads: int = 1, raft: bool = False,
                 use_tile_input: bool = True, tile_height: int = 416,
                 tile_sigma: float = 0.05, position_only: bool = False,
                 position_and_content: bool = False,
                 train_size: Optional[Tuple[int, int]] = None, **kwargs):
        super().__init__(output_stride=32,
                         loss_fn=SequenceLoss(gamma, max_flow), **kwargs)
        self.corr_levels = corr_levels
        self.corr_radius = corr_radius
        self.iters = iters
        self.raft = raft
        self.use_tile_input = use_tile_input
        self.tile_height = tile_height
        self.tile_sigma = tile_sigma
        self.train_size = train_size
        self.hidden_dim = hdim = 128
        self.context_dim = cdim = 128

        self.fnet = MatchingModel(train_size=train_size)
        self.cnet = BasicEncoder(output_dim=hdim + cdim, norm_fn="batch",
                                 dropout=dropout)
        if not raft:
            self.update_block = GMAUpdateBlock(
                corr_levels=corr_levels, corr_radius=corr_radius,
                num_heads=num_heads, hidden_dim=hdim)
            self.att = Attention(position_only=position_only,
                                 position_and_content=position_and_content,
                                 dim=cdim, heads=num_heads,
                                 max_pos_size=160, dim_head=cdim)
        else:
            self.update_block = BasicUpdateBlock(
                corr_levels=corr_levels, corr_radius=corr_radius,
                hidden_dim=hdim)

    # ----------------------------------------------------------------- core
    def predict(self, params, image1, image2, flow_prev=None,
                training: bool = False):
        fmap1, fmap2 = self.fnet(params["fnet"], image1, image2,
                                 training=training)
        pyramid = build_corr_pyramid(fmap1, fmap2, self.corr_levels)

        cnet = self.cnet(params["cnet"], image1, training=training)
        net = jnp.tanh(cnet[..., :self.hidden_dim])
        inp = nn.relu(cnet[..., self.hidden_dim:])
        attention = None
        if not self.raft:
            attention = self.att(params["att"], inp)

        b, h, w, _ = fmap1.shape
        coords0 = coords_grid(b, h, w, dtype=fmap1.dtype)
        coords1 = coords0
        if flow_prev is not None:
            if flow_prev.ndim == 4 and flow_prev.shape[-1] != 2:
                flow_prev = jnp.moveaxis(flow_prev, -3, -1)
            coords1 = coords1 + forward_interpolate(flow_prev)

        up_params = params["update_block"]

        def step(carry, _):
            net, coords1, _ = carry
            coords1 = jax.lax.stop_gradient(coords1)
            corr = corr_pyramid_lookup(pyramid, coords1, self.corr_radius)
            flow = coords1 - coords0
            if self.raft:
                net, up_mask, delta_flow = self.update_block(
                    up_params, net, inp, corr, flow)
            else:
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
            return flow_ups.reshape(it, bb, 8 * h, 8 * w, 2), None
        flow_up = convex_upsample(coords1 - coords0, last_mask)
        return flow_up[None], jnp.moveaxis(coords1 - coords0, -1, -3)

    # -------------------------------------------------------------- forward
    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        if self.use_tile_input and self.train_size is not None \
                and not training:
            return self.forward_tile(params, inputs)
        return self.forward_resize(params, inputs, training)

    def forward_resize(self, params, inputs, training):
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=True,
            resize_mode="interpolation", interpolation_mode="bilinear",
            interpolation_align_corners=True)

        flow_prev = None
        prev = inputs.get("prev_preds")
        if prev is not None and prev.get("flow_small") is not None:
            flow_prev = prev["flow_small"]

        flow_preds, flow_small = self.predict(
            params, images[:, 0], images[:, 1], flow_prev,
            training=training)
        flow_preds = self.postprocess_predictions(flow_preds, image_resizer,
                                                  is_flow=True)
        if training:
            return {"flows": self.nhwc_flow_to_output(flow_preds[-1]),
                    "flow_preds": flow_preds}
        return {"flows": self.nhwc_flow_to_output(flow_preds[-1]),
                "flow_small": flow_small}

    def forward_tile(self, params, inputs):
        """Gaussian-blended tiled inference (matchflow.py:234-283)."""
        train_size = self.train_size
        input_size = inputs["images"].shape[-2:]
        image_size = (max(self.tile_height, input_size[-2]), input_size[-1])
        hws = compute_grid_indices(image_size, train_size)
        weights_np = compute_weight(hws, image_size, train_size,
                                    self.tile_sigma)

        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=True,
            resize_mode="interpolation", target_size=image_size,
            interpolation_mode="bilinear",
            interpolation_align_corners=True)

        image1 = images[:, 0]
        image2 = images[:, 1]
        flows = 0.0
        flow_count = 0.0
        for idx, (h, w) in enumerate(hws):
            tile1 = image1[:, h:h + train_size[0], w:w + train_size[1]]
            tile2 = image2[:, h:h + train_size[0], w:w + train_size[1]]
            flow_preds, _ = self.predict(params, tile1, tile2)
            # crop tiles overrunning the image edge (the reference's
            # negative F.pad, matchflow.py:266-276)
            eh = min(h + train_size[0], image_size[0])
            ew = min(w + train_size[1], image_size[1])
            flow_pre = flow_preds[-1][:, :eh - h, :ew - w]
            wgt = jnp.asarray(weights_np[idx], flow_pre.dtype)[
                h:eh, w:ew, None]
            pad = ((0, 0), (h, image_size[0] - eh),
                   (w, image_size[1] - ew), (0, 0))
            flows = flows + jnp.pad(flow_pre * wgt, pad)
            flow_count = flow_count + jnp.pad(
                jnp.broadcast_to(wgt, flow_pre.shape), pad)
        output_flow = flows / flow_count
        output_flow = self.postprocess_predictions(
            output_flow, image_resizer, is_flow=True)
        return {"flows": self.nhwc_flow_to_output(output_flow)}


class MatchFlowRAFT(MatchFlow):
    pretrained_checkpoints = {
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/matchflow_raft-things-bf560032.ckpt"
    }

    def __init__(self, raft: bool = True, **kwargs):
        super().__init__(raft=raft, **kwargs)


@register_model
@trainable
class matchflow(MatchFlow):
    pass


@register_model
@trainable
class matchflow_raft(MatchFlowRAFT):
    pass
