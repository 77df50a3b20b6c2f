"""SplatFlow — three-frame RAFT with softmax-splatted temporal motion
features (reference: ptlflow/models/splatflow/splatflow.py:17-159,
update.py:84-124, softsplat.py:435-467).

The motion features of the first pair are forward-splatted (average-mode
soft splatting, a CUDA kernel in the reference, a batched scatter-add
here) into the second frame and concatenated into a dedicated GRU branch.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ... import nn
from ...nn import Module
from ...ops.correlation import CorrBlock, coords_grid
from ...ops.upsample import convex_upsample
from ...ops.warp import softsplat_average
from ...utils.registry import register_model
from ..base.base_model import BaseModel
from ..llaflow.llaflow import GlobalAttention
from ..memfof.memfof import MemfofAggregate
from ..raft.extractor import BasicEncoder
from ..raft.update import BasicMotionEncoder, FlowHead, SepConvGRU


class SplatUpdate(Module):
    """update.py:84-124: two GRU branches — with and without splatted
    temporal motion features."""

    def __init__(self, hidden_dim=128):
        super().__init__()
        self.encoder = BasicMotionEncoder(4, 4)
        self.gru = SepConvGRU(hidden_dim=hidden_dim,
                              input_dim=128 + hidden_dim + hidden_dim)
        self.flow_head = FlowHead(hidden_dim, hidden_dim=256)
        self.mask = nn.Sequential(
            nn.Conv2d(128, 256, 3, padding=1), nn.relu,
            nn.Conv2d(256, 64 * 9, 1, padding=0))
        self.aggregator = MemfofAggregate(dim=128, heads=1, dim_head=128)
        self.gru_sp = SepConvGRU(hidden_dim=hidden_dim,
                                 input_dim=128 + hidden_dim + hidden_dim * 2)
        self.flow_head_sp = FlowHead(hidden_dim, hidden_dim=256)
        self.mask_sp = nn.Sequential(
            nn.Conv2d(128, 256, 3, padding=1), nn.relu,
            nn.Conv2d(256, 64 * 9, 1, padding=0))

    def __call__(self, params, net, inp, corr, flow, atte_s, mf_t=None,
                 **kw):
        mf = self.encoder(params["encoder"], flow, corr)
        mf_s = self.aggregator(params["aggregator"], atte_s, mf)
        if mf_t is not None:
            inp_cat = jnp.concatenate([inp, mf, mf_s, mf_t], axis=-1)
            net = self.gru_sp(params["gru_sp"], net, inp_cat)
            delta = self.flow_head_sp(params["flow_head_sp"], net)
            mask = 0.25 * self.mask_sp(params["mask_sp"], net)
        else:
            inp_cat = jnp.concatenate([inp, mf, mf_s], axis=-1)
            net = self.gru(params["gru"], net, inp_cat)
            delta = self.flow_head(params["flow_head"], net)
            mask = 0.25 * self.mask(params["mask"], net)
        return net, mask, delta, mf


class SplatFlow(BaseModel):
    pretrained_checkpoints = {
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/splatflow-kitti-2aa8e145.ckpt",
    }

    def __init__(self, corr_levels: int = 4, corr_radius: int = 4,
                 dropout: float = 0.0, gamma: float = 0.8,
                 max_flow: float = 400, iters: int = 32, **kwargs):
        super().__init__(output_stride=8, loss_fn=None, **kwargs)
        self.corr_levels = corr_levels
        self.corr_radius = corr_radius
        self.iters = iters
        self.hdim = self.cdim = 128
        self.fnet = BasicEncoder(output_dim=256, norm_fn="instance",
                                 dropout=dropout)
        self.cnet = BasicEncoder(output_dim=256, norm_fn="batch",
                                 dropout=dropout)
        self.att = GlobalAttention(dim=self.cdim, heads=1,
                                   dim_head=self.cdim)
        self.update = SplatUpdate(hidden_dim=self.hdim)

    def _forward_one_pair(self, params, image1, image2, mf_t=None,
                          training=False):
        kw = dict(training=training)
        both = self.fnet(params["fnet"],
                         jnp.concatenate([image1, image2], axis=0), **kw)
        fmap1, fmap2 = jnp.split(both, 2, axis=0)
        corr_fn = CorrBlock(fmap1, fmap2, num_levels=self.corr_levels,
                            radius=self.corr_radius)
        b, h, w, _ = fmap1.shape
        coords0 = coords_grid(b, h, w, dtype=image1.dtype)
        coords1 = coords_grid(b, h, w, dtype=image1.dtype)
        cnet = self.cnet(params["cnet"], image1, **kw)
        net = jnp.tanh(cnet[..., :self.hdim])
        inp = nn.relu(cnet[..., self.hdim:])
        atte_s = self.att(params["att"], inp)

        def step(carry, _):
            coords1, net = carry
            coords1 = jax.lax.stop_gradient(coords1)
            corr = corr_fn(coords1)
            flow = coords1 - coords0
            net, up_mask, delta, mf = self.update(
                params["update"], net, inp, corr, flow, atte_s, mf_t)
            coords1 = coords1 + delta
            return (coords1, net), (up_mask, mf)

        (coords1, net), (masks, mfs) = jax.lax.scan(
            step, (coords1, net), None, length=self.iters)
        low = coords1 - coords0
        # cvx_upsample(8 * flow, mask): our convex_upsample scales by the
        # factor, so pass the raw flow (splatflow.py:149)
        flow_up = convex_upsample(low, masks[-1], 8)
        return flow_up, mfs[-1], low

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=True,
            resize_mode="pad", pad_mode="replicate", pad_two_side=True)
        flow_01, mf_01, low_01 = self._forward_one_pair(
            params, images[:, 0], images[:, 1], training=training)
        if images.shape[1] > 2:
            mf_t = softsplat_average(mf_01, low_01)
            flow_12, _, low_12 = self._forward_one_pair(
                params, images[:, 1], images[:, 2], mf_t=mf_t,
                training=training)
            out_flow, flow_small = flow_12, low_12
        else:
            out_flow, flow_small = flow_01, low_01
        out_flow = self.postprocess_predictions(out_flow, image_resizer,
                                                is_flow=True)
        return {"flows": self.nhwc_flow_to_output(out_flow),
                "flow_small": flow_small}


@register_model
class splatflow(SplatFlow):
    pass
