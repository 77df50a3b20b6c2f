"""GMA: RAFT + global motion aggregation attention.

Parity with /root/reference/ptlflow/models/gma/gma.py:52-260 and
update.py:127-160.  Reuses the shared RAFT blocks; the GRU loop is a
lax.scan; attention is computed once outside the loop (as in the
reference).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ... import nn
from ...ops.correlation import build_corr_pyramid, corr_pyramid_lookup, coords_grid
from ...ops.upsample import convex_upsample
from ...ops.warp import forward_interpolate
from ...utils.registry import register_model, trainable, ptlflow_trained
from ..base import BaseModel
from ..raft.extractor import BasicEncoder
from ..raft.raft import SequenceLoss
from ..raft.update import BasicMotionEncoder, FlowHead, SepConvGRU
from .gma_utils import Aggregate, Attention


class GMAUpdateBlock(nn.Module):
    def __init__(self, corr_levels: int, corr_radius: int, num_heads: int,
                 hidden_dim: int = 128):
        super().__init__()
        self.encoder = BasicMotionEncoder(corr_levels, corr_radius)
        self.gru = SepConvGRU(hidden_dim=hidden_dim,
                              input_dim=128 + hidden_dim + hidden_dim)
        self.flow_head = FlowHead(hidden_dim, hidden_dim=256)
        self.mask = nn.Sequential(
            nn.Conv2d(128, 256, 3, padding=1), nn.relu,
            nn.Conv2d(256, 64 * 9, 1, padding=0))
        self.aggregator = Aggregate(dim=128, dim_head=128, heads=num_heads)

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


class GMA(BaseModel):
    pretrained_checkpoints = {
        "chairs": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/gma-chairs-d4ec321d.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/gma-things-90aafb63.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/gma-sintel-98d6f3d0.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/gma-kitti-8ca3ec80.ckpt",
    }

    def __init__(self, corr_levels: int = 4, corr_radius: int = 4,
                 dropout: float = 0.0, gamma: float = 0.8,
                 max_flow: float = 400, iters: int = 32, num_heads: int = 1,
                 position_only: bool = False,
                 position_and_content: bool = False,
                 alternate_corr: bool = False, **kwargs):
        super().__init__(output_stride=8,
                         loss_fn=SequenceLoss(gamma, max_flow), **kwargs)
        self.corr_levels = corr_levels
        self.corr_radius = corr_radius
        self.iters = iters
        self.num_heads = num_heads

        self.hidden_dim = hdim = 128
        self.context_dim = cdim = 128
        self.fnet = BasicEncoder(output_dim=256, norm_fn="instance",
                                 dropout=dropout)
        self.cnet = BasicEncoder(output_dim=hdim + cdim, norm_fn="batch",
                                 dropout=dropout)
        self.update_block = GMAUpdateBlock(corr_levels, corr_radius,
                                           num_heads, hidden_dim=hdim)
        self.att = Attention(dim=cdim, position_only=position_only,
                             position_and_content=position_and_content,
                             heads=num_heads, max_pos_size=160,
                             dim_head=cdim)

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
        pyramid = build_corr_pyramid(fmap1, fmap2, self.corr_levels)

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
            net, coords1, last_mask = carry
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
@ptlflow_trained
class gma(GMA):
    pass
